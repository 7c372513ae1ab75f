package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 stretch #9 witnesses: `q_skew_join_aqe` — A27's join with
  * AQE's runtime skew-split instead of the manual salt. The claims:
  *
  *  1. on a constructed hot-key corpus with demo-sized thresholds, the
  *     adaptive plan GENUINELY fires the skew split (`skew=true` in the
  *     executed sort-merge join) and the result equals the plain join;
  *  2. the contract query serves the identical result as the manual
  *     salt (they also share one oracle, hash-proven by the driver);
  *  3. the boundary: a BROADCAST join of the same shape shows no skew
  *     split — there is no shuffle to re-plan, which is exactly when
  *     the manual salt (or HotBucket) is still required.
  */
class Round11fSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a genuinely skewed sort-merge partition (skew=true) with the plain join's result") {
    // one hot key carrying ~500k rows vs a 1-row-per-key tail
    val left = spark.range(501000)
      .select(when(col("id") < 500000, lit(0L)).otherwise(col("id") - 499999L).as("k"),
        col("id").as("v"))
    val right = spark.range(0L, 1001L).select(col("id").as("k"), (col("id") * 10).as("w"))
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB") {
      // a GLOBAL aggregate downstream: a per-key aggregate would consume
      // the join's hash partitioning and OptimizeSkewedJoin declines to
      // break a required distribution (the documented boundary — with a
      // keyed consumer the manual salt is still the lever, or
      // forceOptimizeSkewedJoin buys the extra shuffle)
      val joined = left.hint("merge").join(right, Seq("k"))
        .agg(count(lit(1)).as("n"), sum("w").as("sw"))
      // collect(), not head(): head wraps a Limit into a SEPARATE
      // QueryExecution, leaving this one un-executed (isFinalPlan=false)
      val row = joined.collect().head
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"),
        s"AQE did not split the skewed join; plan:\n${planStr.take(2000)}")
      assert(row.getLong(0) == 501000L, s"row count ${row.getLong(0)}")
      // keys 1..1000 carry w = 10k each; the hot key carries w = 0
      assert(row.getLong(1) == 10L * 1000L * 1001L / 2L, s"sum ${row.getLong(1)}")
    }
  }

  test("the contract AQE twin equals the manual salt row-for-row") {
    val dir = TestSpark.sf
    val aqe = graft.ops.Relational3.qSkewJoinAqe(spark, dir).collect().toSeq
    val salt = graft.ops.Relational3.qSkewSaltJoin(spark, dir).collect().toSeq
    assert(aqe == salt)
    assert(SparkEntry.oracleSql("q_skew_join_aqe") ==
      SparkEntry.oracleSql("q_skew_salt_join"),
      "A27b must share A27's oracle verbatim")
  }

  test("the boundary: a broadcast join has no shuffle for AQE to split") {
    // non-constant key (a literal key constant-folds the equi-join into
    // a nested loop), still heavily hot on one value
    val left = spark.range(50000)
      .select(when(col("id") % 50 === 0, col("id") % 10).otherwise(lit(0L)).as("k"),
        col("id").as("v"))
    val right = spark.range(0L, 10L).select(col("id").as("k"))
    withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB") {
      val joined = left.join(broadcast(right), Seq("k"))
        .agg(count(lit(1)).as("n"))
      assert(joined.head().getLong(0) == 50000L)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("BroadcastHashJoin"))
      assert(!planStr.contains("skew=true"),
        "a broadcast join cannot carry a skew split — the manual salt " +
          "(A27) or HotBucket is the only lever there")
    }
  }
}
