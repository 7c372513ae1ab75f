package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A32b — `q_stats_join`: STATS-DRIVEN join planning (round-9
  * directive #4). Every other plan in this engine is hand-shaped; at
  * 100 TB with many consumers, cost-based-optimizer statistics are how
  * the right plan survives contact with tables the author didn't
  * hand-tune. This module demonstrates the full CBO loop the way a
  * production deployment runs it:
  *
  *  1. the corpus tables are registered in the catalog and ANALYZEd
  *     (table stats + column stats on the join/filter keys) — a
  *     one-time metadata pass, once per JVM per sf dir;
  *  2. the contract query joins a FILTERED dimension to the fact:
  *     exactly the shape where file-size estimation fails — without
  *     column stats the Filter's size estimate is its child's, so the
  *     planner must assume the whole dimension flows into the join;
  *     with stats, the equality predicate's selectivity (1/ndv)
  *     shrinks the estimate ~25× and the planner can broadcast.
  *
  * The DEMONSTRATION is spec-pinned, not config-smuggled: Round9eSpec
  * reads the optimizer's own estimates under CBO off/on, picks a
  * broadcast threshold BETWEEN them, and proves the physical shape
  * flips SortMergeJoin ↔ BroadcastHashJoin on nothing but statistics —
  * while the collected result (and the contract row's driver hash) is
  * bit-identical under both shapes. The contract row itself runs under
  * session defaults; its oracle is the plain relational answer, so the
  * driver proves result-invariance of whatever shape the planner
  * picked.
  */
object StatsPlan {

  /** Catalog-register + ANALYZE once per JVM per sf dir; returns the
    * (customer, orders) table names. External tables over the source
    * parquet — ANALYZE writes stats into the session catalog only.
    */
  private[graft] def analyzedTables(spark: SparkSession, dir: String): (String, String) =
    // applicationId is part of the key (trieFor's discipline): the
    // CREATE TABLE/ANALYZE registrations live in one SparkContext's
    // catalog, so a dir-only memo would hand a later context in the
    // same JVM table names that no longer resolve
    graft.QueryCaches.memo(
      s"statsplan.tables:$dir:${spark.sparkContext.applicationId}") {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val cust = s"g_stats_customer$tag"
      val ord = s"g_stats_orders$tag"
      spark.sql(s"CREATE TABLE IF NOT EXISTS $cust USING parquet LOCATION '$dir/customer.parquet'")
      spark.sql(s"CREATE TABLE IF NOT EXISTS $ord USING parquet LOCATION '$dir/orders.parquet'")
      spark.sql(s"ANALYZE TABLE $cust COMPUTE STATISTICS FOR COLUMNS c_custkey, c_nationkey")
      spark.sql(s"ANALYZE TABLE $ord COMPUTE STATISTICS FOR COLUMNS o_custkey, o_orderpriority")
      (cust, ord)
    }

  /** The demo join over the ANALYZED catalog tables: a selective
    * dimension filter (c_nationkey = 1, ~1/25 of customers) into the
    * fact join — integer-exact aggregates so the oracle replays
    * bit-for-bit regardless of which physical join shape ran.
    */
  def qStatsJoin(spark: SparkSession, dir: String): DataFrame = {
    val (cust, ord) = analyzedTables(spark, dir)
    spark.table(cust).filter(col("c_nationkey") === 1)
      .join(spark.table(ord), col("c_custkey") === col("o_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), sum("o_orderkey").as("sum_key"))
      .orderBy("o_orderpriority")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stats_join" -> (qStatsJoin _))

  val oracles: Map[String, String] = Map(
    "q_stats_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE c_nationkey = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
