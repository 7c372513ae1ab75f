package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Redact

/** Round-8 witnesses: the PII-scrubbing cascade (F18 `text_redact`). */
class Round8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def redactOne(text: String): (Map[String, Int], String) = {
    val df = Seq(text).toDF("t")
    val (counts, red) = Redact.redactCols(col("t"))
    val row = df.select(
      counts.map { case (n, c) => c.as(n) } :+ red.as("r"): _*).head()
    (Redact.patterns.map(_._1).zipWithIndex
      .map { case (n, i) => n -> row.getInt(i) }.toMap,
      row.getString(Redact.patterns.length))
  }

  test("planted PII is scrubbed: every class, multiple instances, mid-text") {
    val (counts, red) = redactOne(
      "mail alice.smith+work@sub.example.org or bob@ex.co, " +
        "phone +44 (0)20-7946 0958 today, card 4111111111111111 " +
        "and ssn run 123456789 done")
    assert(counts("email") == 2, s"emails: $counts")
    assert(counts("phone") == 1, s"phones: $counts")
    assert(counts("id") == 2, s"ids: $counts")
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>") &&
      red.contains("<ID>"))
    // nothing PII-shaped survives the cascade
    assert(!red.matches(".*[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}.*"))
    assert(!red.matches(".*\\+[0-9][0-9()\\s.-]{6,}[0-9].*"))
    assert(!red.matches(".*[0-9]{9,}.*"))
  }

  test("clean text passes through byte-identical with zero counts") {
    val clean = "the quick brown fox jumps over 42 lazy dogs at 5pm."
    val (counts, red) = redactOne(clean)
    assert(counts.values.forall(_ == 0), s"spurious counts: $counts")
    assert(red == clean, "clean text was modified")
  }

  test("cascade order is sequential: a phone's digits are not double-counted as ids") {
    // '+123456789012' matches BOTH the phone pattern and the 9+-digit id
    // pattern; the declared class order (email -> phone -> id) must
    // claim it for phone ONLY — the id count sees the already-redacted
    // '<PHONE>' placeholder, which contains no digits
    val (counts, _) = redactOne("dial +123456789012 now")
    assert(counts("phone") == 1 && counts("id") == 0,
      s"phone digits leaked into the id class: $counts")
  }

  test("contract round trip: injected class matches doc_id % 4 and clean docs pass through") {
    val out = Redact.textRedact(spark, TestSpark.sf)
    val docs = graft.tables.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text"))
    val joined = out.join(docs, "doc_id")
    // class-by-class: exactly one instance of the injected class
    assert(joined.filter($"doc_id" % 4 === 0 &&
      ($"n_email" =!= 1 || $"n_phone" =!= 0 || $"n_id" =!= 0)).count() == 0)
    assert(joined.filter($"doc_id" % 4 === 1 &&
      ($"n_email" =!= 0 || $"n_phone" =!= 1 || $"n_id" =!= 0)).count() == 0)
    assert(joined.filter($"doc_id" % 4 === 2 &&
      ($"n_email" =!= 0 || $"n_phone" =!= 0 || $"n_id" =!= 1)).count() == 0)
    // clean docs: zero counts AND byte-identical pass-through
    assert(joined.filter($"doc_id" % 4 === 3 &&
      ($"n_redacted" =!= 0 || $"redacted" =!= $"text")).count() == 0)
    // scrubbed docs carry the placeholder, never the raw instance
    assert(joined.filter($"doc_id" % 4 === 0 &&
      !$"redacted".contains("<EMAIL>")).count() == 0)
    assert(joined.filter($"redacted".rlike("@example\\.com")).count() == 0)
  }

  test("text_redact is a pure projection — no shuffle in the plan") {
    val plan = Redact.textRedact(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the oracle harness's global sort
    val exchanges = "Exchange".r.findAllIn(plan).size
    val rangeParts = "rangepartitioning".r.findAllIn(plan.toLowerCase).size
    assert(exchanges == rangeParts,
      s"redact plan has a non-sort exchange:\n$plan")
  }

  // ---- F19/F20: BPE token accounting ----

  test("greedy BPE fold agrees with the plain-Scala reference on corpus words and adversarial strings") {
    val words = Seq("spark", "window", "merge", "table", "column", "vector",
      "stream", "value", "data", "small", "join", "filter", "big", "group",
      "hash", "customer", "sort", "order", "slow", "line", "part", "fast",
      "the", "row", "agg", "key", "query", "a", "scan", "batch", "dup",
      // adversarial: piece boundaries, unknown chars, repeats, empties
      "", "z", "zz", "thethe", "sparkspark", "customercustomer",
      "xcustx", "ordata", "parthe", "windowindow", "qqqqqqqqqq",
      "a1b2c3", "datadatadata", "ersort")
    val df = words.toDF("w")
    val got = df.select($"w", graft.ops.Bpe.bpeCountCol("w").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (w <- words) {
      val expected = w.split("\\s+").filter(_ => true)
        .map(graft.ops.Bpe.bpeCountRef).sum
      assert(got(w) == expected,
        s"'$w': fold=${got(w)} ref=$expected")
    }
  }

  test("BPE and whitespace counts genuinely diverge on the contract corpus (non-vacuity)") {
    val out = graft.ops.Bpe.textTokenCountBpe(spark, TestSpark.sf)
    val agg = out.agg(
      sum("n_tokens").as("ws"), sum("n_bpe_tokens").as("bpe"),
      count(when($"n_bpe_tokens" > $"n_tokens", 1)).as("n_diverging")).head()
    val (ws, bpe, nDiv) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    assert(bpe > ws, s"BPE total ($bpe) does not exceed whitespace total ($ws)")
    // the mis-sizing the operator exists to fix is material, not epsilon
    assert(bpe.toDouble / ws > 1.2, s"compression ratio ${bpe.toDouble / ws} too close to 1")
    assert(nDiv > 0, "no single document diverges")
  }

  test("corpus_pack_bpe: bins conserve BPE tokens, bin count is the ceil, LPT balance holds") {
    val docsBpe = graft.ops.Bpe.textTokenCountBpe(spark, TestSpark.sf)
      .agg(sum("n_bpe_tokens"), max("n_bpe_tokens")).head()
    val (total, largest) = (docsBpe.getLong(0), docsBpe.getLong(1))
    val bins = graft.ops.Bpe.corpusPackBpe(spark, TestSpark.sf).collect()
    assert(bins.map(_.getAs[Long]("bin_tokens")).sum == total,
      "pack bins lose or duplicate BPE tokens")
    assert(bins.length == ((total + 2047) / 2048).toInt,
      s"bin count ${bins.length} != ceil($total/2048)")
    val loads = bins.map(_.getAs[Long]("bin_tokens"))
    assert(loads.max - loads.min <= largest,
      s"LPT balance bound violated: spread ${loads.max - loads.min} > largest doc $largest")
  }

  test("text_token_count_bpe is a pure projection — no shuffle beyond the harness sort") {
    val plan = graft.ops.Bpe.textTokenCountBpe(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    val rangeParts = "rangepartitioning".r.findAllIn(plan.toLowerCase).size
    assert(exchanges == rangeParts,
      s"BPE count plan has a non-sort exchange:\n$plan")
  }
}
