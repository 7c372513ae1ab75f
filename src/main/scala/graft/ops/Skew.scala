package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation — SURVEY.md §5.
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); this is the explicit salting
  * fallback for keys so hot that even split partitions overwhelm a task
  * (the classic null-key / celebrity-key problem on a 100 TB join).
  *
  * Left side gets a deterministic salt in [0, n) derived from a
  * distributor column (NOT rand() — re-runs and retried tasks must land
  * rows identically); the right side is replicated n times. The join key
  * becomes (key, salt): the hot key's rows spread over n tasks at the
  * cost of an n× blow-up of the (small) right side.
  */
object Skew {

  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     distributor: Column, numSalts: Int): DataFrame = {
    val salted = left.withColumn("_salt", pmod(xxhash64(distributor), lit(numSalts)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until numSalts).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
