package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.StatsPlan

/** Round-9 directive #4 witnesses: stats-driven join planning — the
  * physical join shape flips SortMergeJoin ↔ BroadcastHashJoin on
  * nothing but catalog statistics, and the result is bit-identical
  * under both shapes.
  */
class Round9eSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("column stats shrink the filtered dimension's estimate; the join flips on it; the answer doesn't") {
    val dir = TestSpark.sf
    val (cust, _) = StatsPlan.analyzedTables(spark, dir)
    // estimate the join's ACTUAL build side — filtered AND pruned to
    // the join key (the size-only visitor scales by column width, so an
    // unpruned estimate would overstate what the planner compares
    // against the broadcast threshold)
    def filteredEstimate(): BigInt = {
      val df = spark.table(cust).filter(col("c_nationkey") === 1)
        .select("c_custkey")
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    }
    var estNoCbo: BigInt = -1
    var estCbo: BigInt = -1
    withConfs("spark.sql.cbo.enabled" -> "false") { estNoCbo = filteredEstimate() }
    withConfs("spark.sql.cbo.enabled" -> "true") { estCbo = filteredEstimate() }
    info(s"filtered dimension estimate: $estNoCbo B (size-only) vs $estCbo B (CBO column stats)")
    assert(estCbo * 4 < estNoCbo,
      s"column stats should shrink the c_nationkey=1 estimate substantially " +
        s"(~1/25 selectivity), got $estNoCbo -> $estCbo")
    // a threshold BETWEEN the two estimates: the size-only planner must
    // sort-merge (estimate too big to broadcast), the stats-fed planner
    // must broadcast — same query, same data, same threshold
    val threshold = ((estNoCbo + estCbo) / 2).toString
    def planOf(): String = StatsPlan.qStatsJoin(spark, dir)
      .queryExecution.executedPlan.toString
    var smjPlan = ""
    var bhjPlan = ""
    var smjRows: Array[org.apache.spark.sql.Row] = Array.empty
    var bhjRows: Array[org.apache.spark.sql.Row] = Array.empty
    withConfs(
      "spark.sql.cbo.enabled" -> "false",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> threshold) {
      smjPlan = planOf()
      smjRows = StatsPlan.qStatsJoin(spark, dir).collect()
    }
    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> threshold) {
      bhjPlan = planOf()
      bhjRows = StatsPlan.qStatsJoin(spark, dir).collect()
    }
    assert(smjPlan.contains("SortMergeJoin") && !smjPlan.contains("BroadcastHashJoin"),
      s"size-only planning should sort-merge at threshold $threshold:\n$smjPlan")
    assert(bhjPlan.contains("BroadcastHashJoin"),
      s"stats-fed planning should broadcast at threshold $threshold:\n$bhjPlan")
    assert(smjRows.sameElements(bhjRows),
      "the physical shape changed the answer — stats must be result-invisible")
    assert(smjRows.nonEmpty)
  }

  test("ANALYZE recorded real column stats (row count + distinct keys) in the catalog") {
    val dir = TestSpark.sf
    val (cust, ord) = StatsPlan.analyzedTables(spark, dir)
    val described = spark.sql(s"DESCRIBE EXTENDED $cust c_nationkey")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(described.get("distinct_count").exists(_.toLong > 1),
      s"no ndv recorded for c_nationkey: $described")
    val rows = spark.sql(s"DESCRIBE EXTENDED $ord")
      .collect().map(_.getString(1)).mkString(" ")
    assert(rows.contains("rows"), s"no table row stats recorded: $rows")
  }
}
