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
}
