package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter build/probe over Spark's native codegen'd expressions
  * (the same machinery Catalyst's runtime row-level filtering injects,
  * surfaced as explicit operators for mid-pipeline use where the
  * optimizer can't see the opportunity).
  *
  * Keys are hashed with the public `xxhash64` on both build and probe —
  * bloom bit-sets are OR-combined, so the build aggregate is
  * merge-order-independent and deterministic for a given key set.
  */
object Bloom {

  /** Aggregate a key column into a serialized bloom filter (binary). */
  def bloomAgg(key: Column, expectedItems: Long = 1000000L): Column =
    GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(xxhash64(key)), expectedItems)
        .toAggregateExpression())

  /** Probe: may the key be in the serialized filter? `bloom` must be
    * foldable (a literal) — collect the 1-row build aggregate first.
    * False positives possible, false negatives never — callers follow
    * with an exact join on the survivors.
    */
  def mightContain(bloom: Column, key: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(
        GraftColumnBridge.expression(bloom),
        GraftColumnBridge.expression(xxhash64(key))))
}
