package graft

import org.apache.spark.sql.functions._
import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corpus2, Dedup}

/** Round-9 witnesses for the degenerate-input guards the round-8
  * advisor flagged: each site where Spark and DuckDB would diverge
  * silently on a legal-but-degenerate input (zero-truth recall panel,
  * zero-token language, undeclared interleave language, empty pack
  * frame) now fails identically — or returns the same sentinel — on
  * both sides.
  */
class Round9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("D15 recall guard: zero-truth panel yields the -1 sentinel, not NULL") {
    val row = Seq((0L, 0L), (4L, 3L)).toDF("n_truth", "n_hits")
      .select(col("n_truth"), Dedup.recallPctCol.as("recall_pct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(row(0L) == -1L, "degenerate panel must yield the -1 sentinel")
    assert(row(4L) == 75L, "normal panel arithmetic unchanged")
  }

  test("F22 rate guard: a zero-token language gets rate 0, not NULL") {
    val rates = Seq((0L, 7L), (100L, 30L), (100L, 900L))
      .toDF("avail_tokens", "quota_tokens")
      .select(col("avail_tokens"), col("quota_tokens"),
        Corpus2.tokenRatePpmCol.as("rate_ppm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rates((0L, 7L)) == 0L, "zero token mass must rate 0")
    assert(rates((100L, 30L)) == 300000L, "normal rate arithmetic unchanged")
    assert(rates((100L, 900L)) == 1000000L, "rate stays capped at 10^6 ppm")
  }

  test("F26 interleave fails loudly on a language outside the declared table") {
    val docs = Seq((1L, "en", "a"), (2L, "xx", "b")).toDF("doc_id", "lang", "text")
    val e = intercept[Exception] {
      Corpus2.interleaveOf(docs).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage).exists(
        _.contains("not in declared targetPpm"))),
      s"expected the undeclared-lang raise, got: ${e.getMessage}")
    // the declared corpus still interleaves fine through the same core
    val ok = Seq((1L, "en", "a"), (2L, "de", "b"), (3L, "en", "c"))
      .toDF("doc_id", "lang", "text")
    assert(Corpus2.interleaveOf(ok).count() == 3)
  }
}
