package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Bpe, VocabTrain}

/** Round-9 capstone witnesses: the BPE merge trainer (`vocab_train`) —
  * hand-checked merge arithmetic, contract-table shape, graceful
  * exhaustion, and the full train→freeze→serve loop into the broadcast
  * trie encoder.
  */
class Round9hSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-checkable training run: 'abab' merges (a,b) at count 2 then (ab,ab)") {
    val wf = Seq(("abab", 1L)).toDF("word", "cnt")
    val merges = VocabTrain.trainOn(wf, 5)
    // round 1: adjacent pairs (a,b)x2 overlapping-counted, (b,a)x1 —
    // argmax (a,b); the left-to-right non-overlapping merge yields
    // [ab, ab]; round 2 merges (ab, ab); then no pairs remain — the
    // loop exhausts at 2 rows, not 5
    assert(merges == Seq(
      (1L, "a", "b", "ab", 2L),
      (2L, "ab", "ab", "abab", 1L)), merges.toString)
  }

  test("tie-breaks are lexicographic at equal counts") {
    // "ba" and "ca": pairs (b,a) and (c,a), both count 1 — (b,a) wins
    val wf = Seq(("ba", 1L), ("ca", 1L)).toDF("word", "cnt")
    val first = VocabTrain.trainOn(wf, 1).head
    assert((first._2, first._3) == ("b", "a"), first.toString)
  }

  test("single-symbol corpus trains to the EMPTY merge table, loudlessly") {
    val wf = Seq(("a", 3L), ("b", 2L)).toDF("word", "cnt")
    assert(VocabTrain.trainOn(wf, 4).isEmpty)
  }

  test("contract merge table: dense steps, merged = lhs+rhs, multi-char distinct pieces") {
    val rows = VocabTrain.vocabTrain(spark, TestSpark.sf).collect()
    assert(rows.length == VocabTrain.rounds, s"expected a full run, got ${rows.length}")
    assert(rows.map(_.getAs[Long]("step")).toSeq == (1L to VocabTrain.rounds.toLong))
    rows.foreach { r =>
      val (l, rr, m) = (r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[String]("merged"))
      assert(m == l + rr, s"merged piece drifted: $r")
      assert(m.length >= 2 && !m.exists(_.isWhitespace))
      assert(r.getAs[Long]("pair_count") >= 1L)
    }
    assert(rows.map(_.getAs[String]("merged")).distinct.length == rows.length,
      "a merge step re-learned an existing piece")
  }

  test("merge-order encoding: token counts sandwich between words and characters") {
    val out = VocabTrain.textTokenCountTrained(spark, TestSpark.sf)
    val chars = graft.tables.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"),
        length(regexp_replace(col("text"), "[ \\t\\n\\x0B\\f\\r]", ""))
          .cast("long").as("n_chars"))
    val joined = out.join(chars, "doc_id").collect()
    joined.foreach { r =>
      val (w, m, c) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_bpe_merged"), r.getAs[Long]("n_chars"))
      assert(w <= m && m <= c,
        s"doc ${r.getAs[Long]("doc_id")}: words=$w merged=$m chars=$c")
    }
    // the 12 learned merges genuinely fire on the corpus
    val (tm, tc) = joined.map(r => (r.getAs[Long]("n_bpe_merged"),
      r.getAs[Long]("n_chars"))).reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(tm * 5 <= tc * 4, s"merge-order encoding barely compressed: $tm/$tc")
  }

  test("train -> freeze -> serve: the trained pieces compress the corpus through the trie encoder") {
    val pieces = VocabTrain.vocabTrain(spark, TestSpark.sf)
      .select("merged").as[String].collect().toSeq
    val stats = graft.tables.Tables.documents(spark, TestSpark.sf)
      .select(
        Bpe.subwordCount(col("text"), "trained12", pieces).as("n_sub"),
        length(regexp_replace(col("text"), "[ \\t\\n\\x0B\\f\\r]", ""))
          .cast("long").as("n_chars"))
      .agg(sum("n_sub").as("subwords"), sum("n_chars").as("chars")).head()
    val (sub, chars) = (stats.getLong(0), stats.getLong(1))
    info(s"trained vocab: $chars chars -> $sub subword tokens")
    assert(sub > 0 && sub < chars,
      s"a trained vocabulary must compress its own corpus: $sub vs $chars")
    // non-trivial compression: the 12 learned pieces cover enough mass
    // to cut at least 20% of the character count
    assert(sub * 5 <= chars * 4, s"compression too weak: $sub/$chars")
  }
}
