package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup2
import graft.streaming.TombstoneAdmit
import graft.tables.Tables

/** Round-13 directive #5: takedowns as a streaming drain (G19
  * `stream_tombstone_admit`). The contract row shares D18's oracle
  * verbatim — the driver hash-proves stream ≡ batch deletes; this spec
  * pins the drain mechanics the oracle can't see: in-JVM serve
  * equality, per-batch idempotent redelivery, and that any SPLIT of
  * the request stream into micro-batches lands the identical sidecar.
  */
class Round13cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def sf = TestSpark.sf

  test("streamed takedowns serve identically to the batch tombstone write") {
    val streamed = TombstoneAdmit.streamTombstoneAdmit(spark, sf).collect()
    val batch = Dedup2.dedupTombstone(spark, sf).collect()
    assert(streamed.sameElements(batch),
      "the drained takedown serve diverged from D18's batch serve")
  }

  test("redelivered micro-batches replace their own sidecar partition byte-for-byte") {
    val docs = Tables.documents(spark, sf)
    val sink = Scratch.dir("tomb_redelivery")
    val slice = docs.filter(col("doc_id") < 250)
    TombstoneAdmit.tombstoneBatch(slice, sink, 0L)
    val first = spark.read.parquet(sink).drop("batch")
      .collect().map(_.getLong(0)).sorted.toSeq
    // at-least-once redelivery of the SAME batch id: overwrite, not append
    TombstoneAdmit.tombstoneBatch(slice, sink, 0L)
    val second = spark.read.parquet(sink).drop("batch")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(first == second, "a redelivered batch doubled the tombstone set")
    assert(first.nonEmpty && first.forall(_ % 10 == 3))
  }

  test("any micro-batch split of the request stream lands the one-shot tombstone set") {
    val docs = Tables.documents(spark, sf)
    val sink = Scratch.dir("tomb_split")
    // three arbitrary slices (by thirds of the id space), one batch each
    (0 to 2).foreach { b =>
      TombstoneAdmit.tombstoneBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), sink, b.toLong)
    }
    val drained = spark.read.parquet(sink).drop("batch")
      .collect().map(_.getLong(0)).sorted.toSeq
    val oneShot = docs.filter(col("doc_id") % 10 === 3).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(drained == oneShot,
      "the split drain's sidecar diverged from the one-shot takedown set")
  }
}
