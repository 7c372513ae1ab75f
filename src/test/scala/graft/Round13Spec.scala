package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

/** Round-13 regressions for the r12 ADVICE items on the claim floor
  * (the vacuum/commit interaction the multi-day soak first exposed):
  * the floor must bind on EVERY claim path — including the explicit
  * stale-candidate path `commitStagedFrom` that specs and the
  * concurrent-commit contract query use — and the floor sidecar itself
  * must survive crashes (atomic replace) and fail loudly when
  * unreadable rather than silently default to 0.
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stale-candidate commits (commitStagedFrom) respect the vacuum claim floor") {
    import spark.implicits._
    val root = Scratch.dir("claim_floor_stale")
    val (log, base) = (s"$root/log", s"$root/base")
    Sources.commitBatch(Seq((1L, "v1")).toDF("k", "v"), log, "a")
    Sources.commitBatch(Seq((2L, "v1")).toDF("k", "v"), log, "b")
    Sources.compactLog(spark, log, Seq("k"), base)
    assert(Sources.vacuumLog(spark, log, base) == 2)
    // pre-fix, a caller holding a STALE candidate (id 1 — the
    // documented conflict-retry path) claimed the vacuumed id directly:
    // commitStaged derived its candidate above the floor but
    // commitStagedFrom's loop started wherever the caller said, so the
    // batch landed at or below the watermark and readCompacted's
    // strictly-above delta filter silently dropped it
    val staged = Sources.stageBatch(Seq((3L, "v2")).toDF("k", "v"), log, "c")
    val id = Sources.commitStagedFrom(log, staged, 1L)
    assert(id == 3L, s"stale-candidate commit claimed vacuumed id $id")
    val state = Sources.readCompacted(spark, base, log, Seq("k"))
      .select("k", "v").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(state.toSeq == Seq((1L, "v1"), (2L, "v1"), (3L, "v2")),
      s"stale-candidate commit lost from the compacted read: ${state.toSeq}")
  }

  test("an unreadable claim-floor sidecar fails loudly, never defaults to 0") {
    import spark.implicits._
    val root = Scratch.dir("claim_floor_torn")
    val log = s"$root/log"
    Sources.commitBatch(Seq((1L, "v1")).toDF("k", "v"), log, "a")
    // simulate a torn write / manual edit: the sidecar exists but holds
    // garbage — the vacuumed watermark is UNKNOWN, so committing (which
    // could silently reuse a vacuumed id) must refuse with a message
    // naming the file, not NumberFormatException and not floor=0
    java.nio.file.Files.write(
      new java.io.File(log, ".claim_floor").toPath,
      "garbage".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalStateException] {
      Sources.commitBatch(Seq((2L, "v2")).toDF("k", "v"), log, "b")
    }
    assert(e.getMessage.contains(".claim_floor"),
      s"error does not name the sidecar: ${e.getMessage}")
  }

  test("writeClaimFloor replaces atomically and stays monotone") {
    val root = Scratch.dir("claim_floor_atomic")
    val log = s"$root/log"
    java.nio.file.Files.createDirectories(new java.io.File(log).toPath)
    Sources.writeClaimFloor(log, 5L)
    assert(Sources.claimFloor(log) == 5L)
    // a lower watermark never lowers the floor (monotone), and the
    // replace path (REPLACE_EXISTING + ATOMIC_MOVE) leaves no temp
    // files behind
    Sources.writeClaimFloor(log, 3L)
    assert(Sources.claimFloor(log) == 5L)
    Sources.writeClaimFloor(log, 9L)
    assert(Sources.claimFloor(log) == 9L)
    val leftovers = Option(new java.io.File(log).listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".claim_floor_"))
    assert(leftovers.isEmpty,
      s"temp floor files left behind: ${leftovers.map(_.getName).toSeq}")
  }
}
