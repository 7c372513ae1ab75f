package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Round-7: `ann_index_append` — daily-delta maintenance of the
  * persisted PQ index. The production contract under test: the delta is
  * encoded against the FROZEN reloaded codebook and APPENDED; the base
  * artifact is never rewritten; the widened index serves exactly the
  * full-corpus search; and the E11-style recall gate still passes over
  * the widened index (codebook-staleness monitoring).
  */
class Round7bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def fileState(dir: String): Map[String, (Long, Long)] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        f.getName -> (f.length(), java.util.Arrays.hashCode(bytes).toLong)
      }.toMap
  }

  test("append writes ONLY delta rows and leaves base code files byte-identical") {
    val base = graft.Scratch.dir("r7_pqappend_spec")
    Similarity.buildPqBase(spark, sf, base, subs = 8, k = 16)
    val before = fileState(s"$base/codes")
    val nBase = spark.read.parquet(s"$base/codes").count()
    Similarity.appendPqDelta(spark, sf, base, subs = 8)
    val after = fileState(s"$base/codes")
    // every pre-append file survives with identical bytes
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig),
        s"base code file $name was rewritten by the append")
    }
    assert(after.size > before.size, "append added no new code files")
    // row accounting: exactly the held-out delta was written
    val nAll = spark.read.parquet(s"$base/codes").count()
    val nDelta = graft.tables.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 10 === 0).count()
    val nEmb = graft.tables.Tables.embeddings(spark, sf).count()
    assert(nBase == nEmb - nDelta)
    assert(nAll - nBase == nDelta,
      s"append wrote ${nAll - nBase} rows, expected the $nDelta-row delta")
  }

  test("search over base∪delta equals the in-session full-corpus PQ search") {
    val append = SparkEntry.queries("ann_index_append")(spark, sf)
    val e5 = SparkEntry.queries("ann_pq_search")(spark, sf)
    assert(append.collect().toSeq == e5.collect().toSeq,
      "the widened artifact's search diverged from the full-corpus encoding")
  }

  test("frozen-codebook encoding: delta codes equal the full-corpus build's codes") {
    val base = Similarity.pqAppendIndexPath(spark, sf)
    val fromArtifact = spark.read.parquet(s"$base/codes")
      .filter(col("vec_id") % 10 === 0)
      .selectExpr("vec_id", "ords")
    val full = Similarity.pqIndexPath(spark, sf)
    val fromFull = spark.read.parquet(s"$full/codes")
      .filter(col("vec_id") % 10 === 0)
      .selectExpr("vec_id", "ords")
    assert(fromArtifact.exceptAll(fromFull).count() == 0 &&
      fromFull.exceptAll(fromArtifact).count() == 0,
      "delta encoded against the reloaded codebook differs from the " +
        "build-time encoding — the artifact round-trip is lossy")
  }

  test("E11-style recall gate holds over the widened index") {
    // ADC top-5 vs the exact integer-L2 top-5 per probe — the
    // acceptance gate a production deployment re-runs after every
    // append to catch codebook staleness. The synthetic corpus is
    // drift-free, so recall must match the in-session PQ search's
    // recall EXACTLY (same codes ⇒ same neighbors ⇒ same recall).
    def recall(of: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val exact = Similarity.annBruteforce(spark, sf, 5)
        .select("query_id", "neighbor_id")
      of.select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val widened = recall(SparkEntry.queries("ann_index_append")(spark, sf))
    val inSession = recall(SparkEntry.queries("ann_pq_search")(spark, sf))
    assert(widened == inSession,
      "recall over the widened index drifted from the in-session index")
  }

  // ---- dedup_passage_spans: plan-shape audit ----

  test("dedup_passage_spans plan: equi-join on the hash, per-doc window, no cross product") {
    val df = SparkEntry.queries("dedup_passage_spans")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in the repeat join:\n$plan")
    // the islands window is per-doc, never a global single-partition sort
    assert(plan.contains("windowspecdefinition(doc_id"),
      s"islands window not partitioned by doc_id in:\n$plan")
    // frequency aggregate partial-combines map-side before its exchange
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"no map-side partial aggregation for the hash frequencies in:\n$plan")
  }

  // ---- corpus-admit sink idempotence under at-least-once redelivery ----

  test("corpus-admit: a redelivered micro-batch replaces, never duplicates") {
    val sink = graft.Scratch.dir("r7_admit_redelivery")
    val docs = graft.tables.Tables.documents(spark, sf)
    graft.streaming.CorpusAdmit.admitBatch(docs, sf, sink, batchId = 0L)
    val once = spark.read.parquet(sink).drop("batch")
      .orderBy("doc_id").collect().toSeq
    assert(once.nonEmpty)
    // foreachBatch is at-least-once: simulate the retry of a batch that
    // already committed its write — the batchId-keyed overwrite must
    // leave the sink byte-identical
    graft.streaming.CorpusAdmit.admitBatch(docs, sf, sink, batchId = 0L)
    val twice = spark.read.parquet(sink).drop("batch")
      .orderBy("doc_id").collect().toSeq
    assert(twice == once, "redelivered batch duplicated verdict rows")
  }

  // ---- ml_logreg_step2: monotone likelihood + C28 prefix ----

  test("ml_logreg_step2: log-likelihood strictly improves each round") {
    val out = SparkEntry.queries("ml_logreg_step2")(spark, sf).head()
    val (b01, b11) = (out.getLong(1) / 1e6, out.getLong(2) / 1e10)
    val (b02, b12) = (out.getLong(3) / 1e6, out.getLong(4) / 1e10)
    val rows = graft.tables.Tables.orders(spark, sf).selectExpr(
      "CAST(o_orderpriority < '3' AS INT) AS y",
      "CAST(floor(o_totalprice * 0.01 + 0.5) AS BIGINT) AS q")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    def ll(b0: Double, b1: Double): Double = rows.map { case (y, q) =>
      val z = b0 + b1 * q
      y * z - math.log1p(StrictMath.exp(z))
    }.sum
    val (l0, l1, l2) = (ll(0, 0), ll(b01, b11), ll(b02, b12))
    assert(l0 < l1 && l1 < l2,
      s"likelihood not monotone across rounds: $l0, $l1, $l2")
  }

  test("ml_logreg_step2 round 1 is C28's step (re-verified as the prefix)") {
    val two = SparkEntry.queries("ml_logreg_step2")(spark, sf).head()
    val one = SparkEntry.queries("ml_logreg_step")(spark, sf).head()
    val beta0 = one.getDouble(one.fieldIndex("beta0"))
    val beta1e4 = one.getDouble(one.fieldIndex("beta1_e4"))
    assert(math.abs(two.getLong(1) / 1e6 - beta0) < 1e-4,
      s"round-1 intercept ${two.getLong(1) / 1e6} != C28 $beta0")
    assert(math.abs(two.getLong(2) / 1e10 * 1e4 - beta1e4) < 1e-4,
      s"round-1 slope ${two.getLong(2) / 1e10 * 1e4} != C28 $beta1e4")
  }

  // ---- irlsRounds: property test vs an independent Scala trainer ----

  test("irlsRounds property: an independent Scala IRLS agrees tick for tick on random frames") {
    import spark.implicits._
    // the independent implementation, written from the quantization
    // CONTRACT (not from Irls' code): round-half-away trunc division,
    // sigma(i/100)*1e6 lookup over [-800, 800], 1e-6/1e-10 beta ticks,
    // 1e-6 working weights
    def rd(num: BigInt, den: BigInt): BigInt = {
      val s = num.signum * den.signum
      s * ((num.abs * 2 + den.abs) / (den.abs * 2))
    }
    val sig = (-800 to 800).map(i =>
      BigInt(math.round(1.0 / (1.0 + StrictMath.exp(-i / 100.0)) * 1e6)))
    def scalaIrls(rows: Seq[(Int, Long)], rounds: Int): Seq[(BigInt, BigInt)] = {
      val n = BigInt(rows.size)
      val p = BigInt(rows.map(_._1.toLong).sum)
      val sq = rows.map(r => BigInt(r._2)).sum
      val sqq = rows.map(r => BigInt(r._2) * r._2).sum
      val sqy = rows.map(r => BigInt(r._2) * (2 * r._1 - 1)).sum
      val den = n * sqq - sq * sq
      val first = (rd(2 * (sqq * (2 * p - n) - sq * sqy) * BigInt(10).pow(6), den),
        rd(2 * (n * sqy - sq * (2 * p - n)) * BigInt(10).pow(10), den))
      (2 to rounds).scanLeft(first) { case ((b0, b1), _) =>
        var (sw, swq, swqq, sr, srq) =
          (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))
        rows.foreach { case (y, q) =>
          val zt = b0 * 10000 + b1 * q
          val idx = rd(zt, BigInt(100000000)).max(-800).min(800)
          val pq = sig(idx.toInt + 800)
          val w = (pq * (1000000 - pq)) / 1000000
          val r = BigInt(y) * 1000000 - pq
          sw += w; swq += w * q; swqq += w * q * q; sr += r; srq += r * q
        }
        val det = sw * swqq - swq * swq
        (b0 + rd((swqq * sr - swq * srq) * BigInt(10).pow(6), det),
          b1 + rd((sw * srq - swq * sr) * BigInt(10).pow(10), det))
      }.toSeq
    }
    Seq(19, 47, 101).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 400).map { _ =>
        val q = rnd.nextInt(5000).toLong
        // label correlated with q so the fit has real signal
        val y = if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-(q - 2500) / 1500.0))) 1 else 0
        (y, q)
      }
      val got = graft.ml.Irls.irlsRounds(rows.toDF("y", "q"), 3)
      val want = scalaIrls(rows, 3)
      assert(got == want, s"seed $seed: Spark IRLS diverged from the " +
        s"independent trainer — got $got, want $want")
      // monotone likelihood across ALL rounds on this random frame
      def ll(b0: Double, b1: Double) = rows.map { case (y, q) =>
        val z = b0 + b1 * q
        y * z - math.log1p(StrictMath.exp(z))
      }.sum
      val lls = ll(0, 0) +: want.map { case (b0, b1) =>
        ll(b0.toDouble / 1e6, b1.toDouble / 1e10)
      }
      lls.sliding(2).foreach { case Seq(a, b) =>
        assert(a < b, s"seed $seed: likelihood not monotone: $lls")
      }
    }
  }

  // ---- dedup_passage_spans: planted passages with known spans ----

  test("passage spans: planted cross-doc and within-doc passages found exactly") {
    import spark.implicits._
    def toks(prefix: String, n: Int) = (0 until n).map(i => s"$prefix$i")
    val passage = toks("p", 15) // 15 tokens → 6 repeated 10-windows
    val block = toks("m", 10)   // 10 tokens → 1 repeated 10-window
    val docs = Seq(
      // P at token positions 5..19
      (10L, (toks("x", 5) ++ passage ++ toks("y", 5)).mkString(" ")),
      // P at token positions 10..24
      (20L, (toks("z", 10) ++ passage ++ toks("w", 3)).mkString(" ")),
      // M repeated WITHIN one doc at 10..19 and 30..39
      (30L, (toks("q", 10) ++ block ++ toks("r", 10) ++ block ++ toks("s", 10)).mkString(" ")),
      // all-unique control
      (40L, toks("u", 30).mkString(" "))
    ).toDF("doc_id", "text")
    val spans = graft.ops.Dedup2.passageSpansOf(docs, win = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(spans == Seq(
      (10L, 5L, 19L, 6L),
      (20L, 10L, 24L, 6L),
      (30L, 10L, 19L, 1L),
      (30L, 30L, 39L, 1L)),
      s"planted spans not recovered exactly: ${spans.mkString(", ")}")
  }

  test("passage clean: planted passages surgically removed, rest untouched") {
    import spark.implicits._
    def toks(prefix: String, n: Int) = (0 until n).map(i => s"$prefix$i")
    val passage = toks("p", 15)
    val docs = Seq(
      (10L, (toks("x", 5) ++ passage ++ toks("y", 5)).mkString(" ")),
      (20L, (toks("z", 10) ++ passage ++ toks("w", 3)).mkString(" ")),
      (40L, toks("u", 30).mkString(" "))
    ).toDF("doc_id", "text")
    val out = graft.ops.Dedup2.passageCleanOf(docs, win = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(10L) == (25L, 15L,
      (toks("x", 5) ++ toks("y", 5)).mkString(" ")),
      s"doc 10 not surgically cleaned: ${out(10L)}")
    assert(out(20L) == (28L, 15L,
      (toks("z", 10) ++ toks("w", 3)).mkString(" ")))
    assert(out(40L) == (30L, 0L, toks("u", 30).mkString(" ")),
      "span-free doc must pass through byte-identical")
    // conservation on the contract corpus: removal never exceeds doc
    // length and span-free docs are untouched
    val contract = SparkEntry.queries("corpus_passage_clean")(spark, sf)
      .collect()
    assert(contract.forall(r => r.getLong(2) <= r.getLong(1)))
    val spanDocs = SparkEntry.queries("dedup_passage_spans")(spark, sf)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    contract.filterNot(r => spanDocs(r.getLong(0))).foreach { r =>
      assert(r.getLong(2) == 0, s"doc ${r.getLong(0)} lost tokens without a span")
    }
  }

  test("passage spans on the contract corpus: valid maximal runs, ≥10 tokens each") {
    val out = SparkEntry.queries("dedup_passage_spans")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (doc, s, e, w) =>
      assert(e - s + 1 >= 10, s"span ($doc,$s,$e) shorter than one window")
      assert(w == e - s + 1 - 9, s"span ($doc,$s,$e) window count $w inconsistent")
    }
    // maximality: spans within a doc never touch or overlap (a gap of
    // ≥1 non-repeated window separates islands)
    out.groupBy(_._1).foreach { case (_, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1 - 9 + 1, "adjacent islands should have merged")
        case _ =>
      }
    }
  }
}
