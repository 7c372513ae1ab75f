package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ArtifactGen, PartGen}

/** Round-14 directive #1 (r13 verdict): vacuum reclaim must not delete
  * files under a reader that resolved the generation pointer BEFORE
  * the flip — the multi-hour 100 TB scan shape. Two guards:
  * [[ArtifactGen.acquireLease]] (a live lease defers reclaim of its
  * pinned generation) and the retention age (`minAgeMs` defers
  * reclaim of freshly retired generations even without a lease).
  * Plus the PartGen partition-layering discipline that replaced the
  * in-place shard overwrite (r13 ADVICE, medium).
  */
class Round14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** A tiny two-generation artifact: gen-0 member written, gen-1
    * member written, pointer NOT yet flipped.
    */
  private def freshRoot(tag: String): String = {
    val root = Scratch.dir(s"r14_$tag")
    import spark.implicits._
    (1L to 100L).toDF("id").withColumn("v", col("id") * 7L)
      .repartition(2).write.mode("overwrite")
      .parquet(s"$root/member")
    (1L to 90L).toDF("id").withColumn("v", col("id") * 7L)
      .repartition(2).write.mode("overwrite")
      .parquet(s"${ArtifactGen.dir(root, 1)}/member")
    root
  }

  test("a leased serve survives a concurrent vacuum+reclaim and still completes") {
    val root = freshRoot("lease")
    // the long-running reader: resolves the pointer (gen 0), takes a
    // lease, and builds — but does not yet execute — its scan
    val lease = ArtifactGen.acquireLease(root)
    assert(lease.gen == 0)
    val served = spark.read.parquet(
      s"${ArtifactGen.dir(root, lease.gen)}/member")
    // the vacuum races past: flip + reclaim while the reader is mid-scan
    ArtifactGen.bump(root, 1)
    val deferred = ArtifactGen.reclaim(root, 1, Seq("member"))
    assert(deferred == Seq(0), s"lease did not defer reclaim: $deferred")
    assert(new java.io.File(root, "member").isDirectory,
      "reclaim deleted a leased generation's files")
    // the pre-flip reader completes, correct and complete
    assert(served.count() == 100L)
    assert(served.agg(sum("v")).head.getLong(0) == 7L * 100 * 101 / 2)
    // lease closed -> the deferred sweep reclaims the bytes
    lease.close()
    val after = graft.ops.Vacuum.reclaimDeferred(root, Seq("member"))
    assert(after.isEmpty, s"post-lease sweep still deferred: $after")
    assert(!new java.io.File(root, "member").exists,
      "closed lease left generation-0 files behind")
    // the current generation is untouched throughout
    assert(spark.read.parquet(
      s"${ArtifactGen.dir(root, 1)}/member").count() == 90L)
  }

  test("the retention age defers reclaim of freshly retired generations") {
    val root = freshRoot("retention")
    ArtifactGen.bump(root, 1)
    // retired moments ago: a 1-hour retention window must defer
    val deferred = ArtifactGen.reclaim(root, 1, Seq("member"),
      minAgeMs = 3600L * 1000)
    assert(deferred == Seq(0), "retention window did not defer reclaim")
    assert(new java.io.File(root, "member").isDirectory)
    // age-0 retention reclaims immediately (the single-session default)
    assert(ArtifactGen.reclaim(root, 1, Seq("member")).isEmpty)
    assert(!new java.io.File(root, "member").exists)
  }

  test("an unreadable lease pins every generation (loud-vs-silent GC)") {
    val root = freshRoot("badlease")
    ArtifactGen.bump(root, 1)
    java.nio.file.Files.write(
      new java.io.File(root, ".lease_torn").toPath,
      "not-a-generation".getBytes("UTF-8"))
    val deferred = ArtifactGen.reclaim(root, 1, Seq("member"))
    assert(deferred == Seq(0),
      "an unparseable lease failed to pin generation 0")
    assert(new java.io.File(root, "member").isDirectory)
    new java.io.File(root, ".lease_torn").delete()
    assert(ArtifactGen.reclaim(root, 1, Seq("member")).isEmpty)
  }

  test("acquireLease lands on the post-flip generation if the pointer moves") {
    val root = freshRoot("relock")
    ArtifactGen.bump(root, 1)
    val lease = ArtifactGen.acquireLease(root)
    assert(lease.gen == 1, "lease pinned a generation the pointer left")
    lease.close()
  }

  test("PartGen layered read resolves each partition from its highest layer") {
    import spark.implicits._
    val root = Scratch.dir("r14_partgen")
    // gen 0: partitions p=0,1,2 with 10 rows each
    (0L until 30L).map(i => (i, i % 3)).toDF("id", "p")
      .write.mode("overwrite").partitionBy("p").parquet(root)
    // layer: rewrite ONLY p=1, dropping half its rows
    val rewritten = spark.read.parquet(root)
      .filter(col("p") === 1 && col("id") < 15)
    val g = PartGen.overrideLayer(root, "p", rewritten)
    assert(g == 1)
    val layered = PartGen.read(spark, root, "p")
    // p=0 and p=2 from gen 0 (10 each), p=1 from the layer (5 rows)
    assert(layered.filter(col("p") === 0).count() == 10)
    assert(layered.filter(col("p") === 2).count() == 10)
    assert(layered.filter(col("p") === 1).count() == 5)
    // a plain read of the root never sees the layer (dot-prefixed
    // dirs are invisible) — the layered reader is the contract
    assert(spark.read.parquet(root).filter(col("p") === 1).count() == 10)
    // the shadowed-partition exclusion is PRUNED, not scanned: it
    // reaches the gen-0 scan as a PartitionFilter (pruned at listing),
    // never as a data filter over p=1's rows
    val plan = layered.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*NOT".r.findFirstIn(plan).nonEmpty,
      s"shadowed-partition NOT IN did not reach PartitionFilters:\n$plan")
    // reclaim the shadowed gen-0 partition; layered read unchanged
    PartGen.reclaimShadowed(root, "p")
    assert(!new java.io.File(root, "p=1").exists)
    assert(PartGen.read(spark, root, "p").count() == 25)
  }
}
