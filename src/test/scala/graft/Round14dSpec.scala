package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ArtifactGen, Dedup, Vacuum}
import graft.tables.Tables

/** Round-14 stretch (r13 verdict #7): the GENERATION-POINTER SOAK.
  * Round12c's multi-day soak interleaved admits/appends/commits but
  * predates the vacuum generations — the state machine that found the
  * batch-id reuse bug never walked the `.generation` pointer. Here one
  * artifact (band-signature member + tombstone sidecar, D18's shape)
  * runs append → delete → serve → VACUUM → append → delete → serve →
  * VACUUM across three generations, with the serve checked against a
  * from-first-principles model after EVERY step, and the second
  * vacuum raced by a leased pre-flip reader (Round14Spec's guard
  * exercised through the real vacuumMember path).
  */
class Round14dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def sf = TestSpark.sf

  test("append/delete/vacuum interleaving across generations serves the model state") {
    val root = Scratch.dir("gen_soak")
    val docs = Tables.documents(spark, sf)
    val sigs = Dedup.bandSignatures(spark, sf).localCheckpoint()

    def sigsOf(pred: org.apache.spark.sql.Column): DataFrame = sigs.filter(pred)
    def gd() = ArtifactGen.dir(root, ArtifactGen.current(root))
    def serve(): DataFrame = {
      val m = spark.read.parquet(s"${gd()}/member")
      val t = spark.read.parquet(s"${gd()}/tombstones")
      m.join(F.broadcast(t), Seq("doc_id"), "left_anti")
    }
    // the running model: added doc predicate minus every delete ever
    def expect(added: org.apache.spark.sql.Column,
               deleted: org.apache.spark.sql.Column): DataFrame =
      sigsOf(added && !deleted)
    def checkServe(step: String, added: org.apache.spark.sql.Column,
                   deleted: org.apache.spark.sql.Column): Unit = {
      val s = serve()
      val e = expect(added, deleted)
      assert(s.exceptAll(e).isEmpty && e.exceptAll(s).isEmpty,
        s"serve diverged from the model after $step")
    }

    val half1 = col("doc_id") % 2 === 0
    val half2 = col("doc_id") % 2 === 1
    val del1 = col("doc_id") % 10 === 4
    val del2 = col("doc_id") % 10 === 7
    val none = lit(false)

    // dawn: half the corpus, empty sidecar
    sigsOf(half1).write.parquet(s"$root/member")
    docs.filter(none).select("doc_id").write.parquet(s"$root/tombstones")
    checkServe("initial build", half1, none)

    // delete batch 1 (sidecar append, merge-on-read)
    Vacuum.addTombstones(root, docs.filter(del1).select("doc_id"))
    checkServe("delete-1", half1, del1)

    // append the other half into the CURRENT generation's member
    sigsOf(half2).write.mode("append").parquet(s"${gd()}/member")
    checkServe("append-1", half1 || half2, del1)

    // VACUUM 1: rewrite survivors as generation 1, reset sidecar,
    // flip, reclaim generation 0
    def runVacuum(stats: String): Unit = {
      val m = spark.read.parquet(s"${gd()}/member")
      val t = spark.read.parquet(s"${gd()}/tombstones")
      Vacuum.vacuumMember(spark, root, "member",
        m.join(F.broadcast(t), Seq("doc_id"), "left_anti"), t,
        s"${gd()}/member", reclaimGen0Member = true, statsKey = stats)
    }
    runVacuum("soak:v1")
    assert(ArtifactGen.current(root) == 1, "vacuum 1 did not flip the pointer")
    checkServe("vacuum-1 (result-invisible)", half1 || half2, del1)
    // the tombstoned rows are physically gone from the member
    assert(spark.read.parquet(s"${gd()}/member")
      .filter(del1).count() == 0, "vacuum 1 left tombstoned member rows")

    // post-vacuum delete batch 2 — the sidecar mechanism must be
    // exactly as alive at generation 1 as it was at generation 0
    Vacuum.addTombstones(root, docs.filter(del2).select("doc_id"))
    checkServe("delete-2 (post-vacuum)", half1 || half2, del1 || del2)

    // VACUUM 2, raced by a leased pre-flip reader
    val lease = ArtifactGen.acquireLease(root)
    assert(lease.gen == 1)
    val preFlip = spark.read.parquet(s"${ArtifactGen.dir(root, 1)}/member")
    val preFlipCount = preFlip.count()
    runVacuum("soak:v2")
    assert(ArtifactGen.current(root) == 2, "vacuum 2 did not flip the pointer")
    checkServe("vacuum-2 (result-invisible)", half1 || half2, del1 || del2)
    // the leased reader still completes, identical to its pre-flip read
    assert(preFlip.count() == preFlipCount,
      "the leased pre-flip reader lost rows across vacuum 2")
    assert(new java.io.File(ArtifactGen.dir(root, 1), "member").isDirectory,
      "reclaim deleted a leased generation mid-soak")
    // lease closed -> the deferred sweep returns the bytes
    lease.close()
    assert(Vacuum.reclaimDeferred(root, Seq("member", "tombstones")).isEmpty)
    assert(!new java.io.File(ArtifactGen.dir(root, 1), "member").exists,
      "the post-lease sweep left generation-1 files behind")
    checkServe("post-sweep", half1 || half2, del1 || del2)

    // a THIRD delete on generation 2 still lands in the live sidecar
    Vacuum.addTombstones(root,
      docs.filter(col("doc_id") % 10 === 1).select("doc_id"))
    checkServe("delete-3 (generation 2)",
      half1 || half2, del1 || del2 || (col("doc_id") % 10 === 1))
  }
}
