package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources
import graft.tables.Tables

/** Round-11 directive #6 witnesses: the file-stats manifest for the
  * batch log. The claims:
  *
  *  1. a selective merge-key read opens ≥2× FEWER FILES (read off the
  *     executed plan's inputFiles) and its result equals the unpruned
  *     latest-wins read filtered to the range;
  *  2. a batch WITHOUT a manifest (crash between claim and manifest
  *     write) is unprunable but fully served — skipping is never
  *     load-bearing;
  *  3. pruning on a non-merge-key column is rejected loudly (it could
  *     resurrect stale rows);
  *  4. the dot-prefixed manifest is invisible to plain log readers.
  */
class Round11eSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def buildLog(): (String, Long) = {
    val path = graft.Scratch.dir("r11e_log")
    val orders = Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_orderstatus")
    Sources.commitBatchWithStats(
      orders.withColumn("o_orderstatus", lit("PENDING"))
        .repartitionByRange(8, col("o_orderkey")),
      path, "base_job", "o_orderkey")
    Sources.commitBatchWithStats(
      orders.filter(col("o_orderkey") % 5 === 0)
        .repartitionByRange(4, col("o_orderkey")),
      path, "update_job", "o_orderkey")
    val hi = orders.agg(max("o_orderkey")).head().getLong(0) / 4
    (path, hi)
  }

  private def committedFiles(path: String): Int =
    Sources.committedIds(path).map { id =>
      new java.io.File(path, s"_batch_id=$id").listFiles
        .count(_.getName.endsWith(".parquet"))
    }.sum

  test("selective key read opens >=2x fewer files and matches the unpruned read") {
    val (path, hi) = buildLog()
    val total = committedFiles(path)
    val pruned = Sources.readLatestRange(spark, path, Seq("o_orderkey"),
      "o_orderkey", 1L, hi)
    val scanned = pruned.inputFiles.length
    info(s"selective read [1,$hi]: $scanned of $total committed files scanned")
    assert(scanned * 2 <= total,
      s"pruned read scanned $scanned of $total files — less than 2x reduction")
    val expect = Sources.readLatest(spark, path, Seq("o_orderkey"))
      .filter(col("o_orderkey").between(1L, hi))
      .orderBy("o_orderkey").collect().toSeq
    val got = pruned.orderBy("o_orderkey").collect().toSeq
    assert(got == expect, "pruned read diverged from the unpruned latest-wins")
    // an out-of-range read is a legitimate empty result, zero files
    assert(Sources.readLatestRange(spark, path, Seq("o_orderkey"),
      "o_orderkey", Long.MaxValue - 1, Long.MaxValue).isEmpty)
  }

  test("a batch without a manifest is unprunable but fully served") {
    val (path, hi) = buildLog()
    // simulate a crash between claim and manifest publish for batch 1
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(Sources.manifestDir(path), "batch=1"))
    val pruned = Sources.readLatestRange(spark, path, Seq("o_orderkey"),
      "o_orderkey", 1L, hi)
    val b1Files = new java.io.File(path, "_batch_id=1").listFiles
      .count(_.getName.endsWith(".parquet"))
    // every batch-1 file is read (unprunable), batch-2 still prunes
    assert(pruned.inputFiles.count(_.contains("_batch_id=1")) == b1Files)
    val expect = Sources.readLatest(spark, path, Seq("o_orderkey"))
      .filter(col("o_orderkey").between(1L, hi))
      .orderBy("o_orderkey").collect().toSeq
    assert(pruned.orderBy("o_orderkey").collect().toSeq == expect)
  }

  test("pruning on a non-merge-key column fails loudly; manifest is invisible to plain reads") {
    val (path, hi) = buildLog()
    val e = intercept[IllegalArgumentException] {
      Sources.readLatestRange(spark, path, Seq("o_orderkey"),
        "o_totalprice", 1L, hi)
    }
    assert(e.getMessage.contains("merge key"))
    // the dot-prefixed .manifest sidecar never leaks into a log scan
    assert(Sources.readLatest(spark, path, Seq("o_orderkey"))
      .columns.toSeq == Seq("o_orderkey", "o_orderstatus"))
    assert(spark.read.parquet(path).inputFiles.forall(!_.contains(".manifest")))
  }
}
