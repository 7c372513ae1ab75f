package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** Round-9 directive #1 witnesses: the production-vocab subword
  * encoder — a broadcast code-point trie ([[graft.functions.PieceTrie]]
  * / [[graft.functions.SubwordCount]]) replacing the literal-CASE fold
  * on every engine path, with the literal kept as the oracle-exact
  * twin. Pins: trie ≡ literal on the shared contract vocabulary over
  * the WHOLE corpus, trie ≡ an independent quadratic reference under
  * the ≥1k-piece production vocabulary (corpus words + adversarial
  * strings + supplementary-plane code points), vocabulary sanity, and
  * codegen sanity (the expression compiles — no interpreted fallback).
  */
class Round9bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent greedy longest-match reference: at each CODE POINT
    * position try the longest piece first via a plain Set — no trie,
    * no shared code with the implementation under test.
    */
  private def refCount(vocab: Seq[String], text: String): Long = {
    val pieces = vocab.toSet
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
    def isWs(cp: Int) = cp == ' ' || cp == '\t' || cp == '\n' ||
      cp == 0x0B || cp == '\f' || cp == '\r'
    var i = 0; var cnt = 0L
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (isWs(cp)) i += Character.charCount(cp)
      else {
        // word end = next whitespace (pieces never contain whitespace)
        var end = i
        while (end < text.length && !isWs(text.codePointAt(end)))
          end += Character.charCount(text.codePointAt(end))
        var step = Character.charCount(cp)
        var l = math.min(maxLen, end - i)
        var found = false
        while (!found && l >= 2) {
          if (i + l <= end && pieces.contains(text.substring(i, i + l))) {
            step = l; found = true
          }
          l -= 1
        }
        // NOTE substring lengths here are UTF-16 units; the adversarial
        // strings below keep multi-unit code points OUT of piece range
        // (vocab is ASCII), so the unit/codepoint distinction only
        // matters for the fallback — handled by charCount above
        cnt += 1; i += step
      }
    }
    cnt
  }

  test("production vocabulary is honest: >= 1k distinct pieces, realistic shape") {
    val v = Bpe.prodVocab
    assert(v.size >= 1000, s"prod vocab has only ${v.size} pieces")
    assert(v.distinct.size == v.size)
    assert(v.forall(p => p.length >= 2 && p.length <= 6))
    assert(v.forall(_.forall(c => c >= 'a' && c <= 'z')))
  }

  test("trie == literal fold on the shared contract vocab over the WHOLE corpus") {
    val docs = graft.tables.Tables.documents(spark, TestSpark.sf)
    val mismatches = docs.select(
        col("doc_id"),
        Bpe.bpeCountCol("text").as("trie_n"),
        Bpe.bpeCountColLiteral("text").as("lit_n"))
      .filter(col("trie_n") =!= col("lit_n"))
      .count()
    assert(mismatches == 0, s"$mismatches docs count differently under trie vs literal")
  }

  test("prod-vocab trie == independent reference on corpus texts") {
    val texts = graft.tables.Tables.documents(spark, TestSpark.sf)
      .select("text").as[String].collect()
    val got = texts.toSeq.toDF("t")
      .select(Bpe.subwordCount(col("t"), "prod", Bpe.prodVocab).as("n"))
      .as[Long].collect()
    texts.zip(got).foreach { case (t, n) =>
      val want = refCount(Bpe.prodVocab, t)
      assert(n == want, s"text '${t.take(60)}...' trie=$n ref=$want")
    }
  }

  test("prod-vocab trie == reference on adversarial strings (boundaries, unicode, overlaps)") {
    val cases = Seq(
      "", " ", "   ", "a", "z9", "shoot", "shooshoo", "string",
      "strength", "aaaaaaa", "chou", "chouk", "choukth",
      "prefixpre", "sheed sheet shee", "th ch sh", "xsheex",
      "tab\there\nnewline", "trailing  spaces  ",
      "中文文档 没有 词汇表", "mixed 中en文 tokens",
      "emoji 😀😀 pair", "😀",
      "boooondoggle", "scoundrel", "thoustst")
    val got = cases.toDF("t")
      .select(col("t"), Bpe.subwordCount(col("t"), "prod", Bpe.prodVocab).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cases.foreach { t =>
      val want = refCount(Bpe.prodVocab, t)
      assert(got(t) == want, s"'$t': trie=${got(t)} ref=$want")
    }
  }

  test("supplementary-plane fallback counts CODE POINTS, not UTF-16 units") {
    // one emoji = 2 UTF-16 units but ONE token — the unit a DuckDB
    // character-based replay would count
    val got = Seq("😀", "😀😁", "a😀b")
      .toDF("t")
      .select(Bpe.subwordCount(col("t"), "prod", Bpe.prodVocab).as("n"))
      .as[Long].collect()
    assert(got.sameElements(Array(1L, 2L, 3L)), got.mkString(","))
  }

  test("subword projection compiles under codegen with fallback disabled") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // a parquet-backed scan (a local Seq would be constant-folded into
      // a LocalTableScan and never reach the codegen stage at all)
      val df = graft.tables.Tables.documents(spark, TestSpark.sf)
        .select(Bpe.subwordCount(col("text"), "prod", Bpe.prodVocab).as("n"))
      assert(df.as[Long].collect().forall(_ >= 0))
      // the `*(n)` prefix marks a whole-stage-codegen'd operator in the
      // executed plan's string form — the Project carrying the subword
      // count must have it (an interpreted fallback would print a bare
      // `Project`, and with spark.sql.codegen.fallback=false a compile
      // failure would have thrown above)
      val plan = df.queryExecution.executedPlan.toString
      val projLine = plan.linesIterator
        .find(_.contains("graft_subword_count")).getOrElse("")
      assert(projLine.trim.startsWith("*("),
        s"subword projection fell out of whole-stage codegen:\n$plan")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("one broadcast trie per (app, vocab): expressions share the memoized broadcast") {
    val a = Bpe.trieFor("prod", Bpe.prodVocab)
    val b = Bpe.trieFor("prod", Bpe.prodVocab)
    assert(a eq b, "same released vocab must share one broadcast")
    assert(a.value.pieceCount == Bpe.prodVocab.size)
  }
}
