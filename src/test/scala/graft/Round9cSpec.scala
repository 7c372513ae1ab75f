package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

/** Round-9 directive #2 witnesses: optimistic concurrency for the
  * batch-partitioned upsert log — stage-then-atomic-claim commits where
  * conflicting claims retry instead of silently replacing a committed
  * partition (the lost-write the reference's overlapping INSERT and
  * UPDATE cron jobs can hit today).
  */
class Round9cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("genuinely concurrent writers: dense ids, no lost batches, no duplicates") {
    val log = Scratch.dir("cc_many")
    val writers = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      // every writer stages FIRST (so all claims start from the same
      // empty log), then all commit concurrently
      val staged = (0 until writers).map { w =>
        w -> Sources.stageBatch(
          Seq((w.toLong, s"writer_$w")).toDF("k", "v"), log, s"w$w")
      }
      val futures = staged.map { case (w, s) =>
        pool.submit(new java.util.concurrent.Callable[(Int, Long)] {
          def call(): (Int, Long) = w -> Sources.commitStaged(log, s)
        })
      }
      val claimed = futures.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      // ids are exactly 1..writers: dense (no skips), unique (no two
      // writers share one), and every writer got one
      assert(claimed.map(_._2).sorted == (1L to writers.toLong),
        s"claimed ids: ${claimed.sortBy(_._1)}")
      assert(Sources.committedIds(log) == (1L to writers.toLong))
      // no batch was lost: every writer's row is in the log, each under
      // the id its commit returned
      val rows = spark.read.parquet(log)
        .select(col("v"), col("_batch_id").cast("long"))
        .as[(String, Long)].collect().toMap
      assert(rows.size == writers)
      claimed.foreach { case (w, id) =>
        assert(rows(s"writer_$w") == id, s"writer $w landed under ${rows(s"writer_$w")}, claimed $id")
      }
    } finally pool.shutdownNow()
  }

  test("a stale claim candidate retries past committed ids instead of replacing them") {
    val log = Scratch.dir("cc_stale")
    Sources.commitBatch(Seq((1L, "first")).toDF("k", "v"), log, "a")
    Sources.commitBatch(Seq((1L, "second")).toDF("k", "v"), log, "b")
    // a writer whose view of the log is two commits stale
    val s = Sources.stageBatch(Seq((1L, "third")).toDF("k", "v"), log, "c")
    val id = Sources.commitStagedFrom(log, s, 1L)
    assert(id == 3L, s"stale writer must walk to the next free id, got $id")
    // nothing replaced: latest-wins sees the HIGHEST batch, and all
    // three batches are still on disk
    assert(Sources.committedIds(log) == Seq(1L, 2L, 3L))
    val latest = Sources.readLatest(spark, log, Seq("k")).as[(Long, String)].collect()
    assert(latest.toSeq == Seq((1L, "third")))
  }

  test("a crashed writer (staged, never committed) is invisible and leaves ids dense") {
    val log = Scratch.dir("cc_crash")
    Sources.commitBatch(Seq((1L, "live")).toDF("k", "v"), log, "a")
    Sources.stageBatch(Seq((1L, "orphan")).toDF("k", "v"), log, "dead")
    // the dot-prefixed staging dir never surfaces in a read…
    val seen = Sources.readLatest(spark, log, Seq("k")).as[(Long, String)].collect()
    assert(seen.toSeq == Seq((1L, "live")))
    // …and the next commit claims the next dense id (no skip for the orphan)
    assert(Sources.commitBatch(Seq((2L, "next")).toDF("k", "v"), log, "b") == 2L)
  }

  test("compaction and time travel read the concurrently-built log unchanged") {
    val log = Scratch.dir("cc_compat")
    Sources.commitBatch(Seq((1L, "v1"), (2L, "v1")).toDF("k", "v"), log, "a")
    Sources.commitBatch(Seq((1L, "v2")).toDF("k", "v"), log, "b")
    // as-of 1 sees only the first batch; latest sees the overlay
    val asOf1 = Sources.readAsOf(spark, log, Seq("k"), 1L)
      .as[(Long, String)].collect().toMap
    assert(asOf1 == Map(1L -> "v1", 2L -> "v1"))
    val base = Scratch.dir("cc_compat_base")
    Sources.compactLog(spark, log, Seq("k"), base)
    val compacted = Sources.readCompacted(spark, base, log, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(compacted == Map(1L -> "v2", 2L -> "v1"))
  }
}
