package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Data-quality and repair operators (round 3) — SURVEY.md §2.A (A33-A34).
  *
  * The reference pipeline trusts its API pulls; a production engine needs
  * the ingest gate (constraint violations as a queryable summary) and the
  * canonical repair (forward-fill over gaps) as first-class operators.
  */
object Quality {

  /** A33 — data-quality gate: one summary row per constraint with its
    * violation count. Null checks and range checks fold into ONE
    * conditional-aggregation pass over each table; referential orphans
    * are a left-anti join; duplicate-key detection is a group-having.
    * The duplicate (l_orderkey, l_linenumber) count is intentionally
    * nonzero — the driver's generator plants dupes (SURVEY §4).
    */
  def qDqChecks(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    // single-pass conditional aggregation over each table
    val liAgg = li.agg(
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_shipdate"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)).as("qty_out_of_range"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L)).as("discount_out_of_range"))
    val oAgg = o.agg(
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpositive_total"))
    val orphans = li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("lineitem_orphan_orderkey").as("check_name"), col("n"))
    val dupes = li.groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n"))
      .select(lit("lineitem_duplicate_line").as("check_name"), col("n"))
    val liRows = liAgg.select(
      explode(map(
        lit("lineitem_null_shipdate"), col("null_shipdate"),
        lit("lineitem_qty_out_of_range"), col("qty_out_of_range"),
        lit("lineitem_discount_out_of_range"), col("discount_out_of_range"))))
      .select(col("key").as("check_name"), col("value").as("n"))
    val oRows = oAgg.select(lit("orders_nonpositive_total").as("check_name"),
      col("nonpositive_total").as("n"))
    liRows.unionByName(oRows).unionByName(orphans).unionByName(dupes)
      .orderBy("check_name")
  }

  /** A34 — forward fill: carry the last valid reading forward per key
    * (sensor-gap repair; `error` events are treated as missing readings).
    * `last(..., ignoreNulls)` over a running frame — one shuffle on the
    * key, the running frame is incremental (no per-row rescan). Leading
    * gaps before any valid reading stay null.
    */
  def qForwardFill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        when(col("event_type") =!= "error", col("value")).as("reading"))
      .withColumn("reading_filled", last("reading", ignoreNulls = true).over(w))
      .orderBy("user_id", "us", "event_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_checks" -> (qDqChecks _),
    "q_forward_fill" -> (qForwardFill _))

  val oracles: Map[String, String] = Map(
    "q_dq_checks" ->
      """SELECT * FROM (
        | SELECT 'lineitem_null_shipdate' AS check_name, count(*) FILTER (l_shipdate IS NULL) AS n FROM lineitem
        | UNION ALL
        | SELECT 'lineitem_qty_out_of_range', count(*) FILTER (l_quantity < 1 OR l_quantity > 50) FROM lineitem
        | UNION ALL
        | SELECT 'lineitem_discount_out_of_range', count(*) FILTER (l_discount < 0 OR l_discount > 1) FROM lineitem
        | UNION ALL
        | SELECT 'orders_nonpositive_total', count(*) FILTER (o_totalprice <= 0) FROM orders
        | UNION ALL
        | SELECT 'lineitem_orphan_orderkey', count(*) FROM lineitem
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        | UNION ALL
        | SELECT 'lineitem_duplicate_line', coalesce(CAST(sum(c - 1) AS BIGINT), 0) FROM (
        |  SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1))
        |ORDER BY check_name""".stripMargin,
    "q_forward_fill" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us,
        |  CASE WHEN event_type <> 'error' THEN value END AS reading
        | FROM events)
        |SELECT user_id, event_id, us, reading,
        | last_value(reading IGNORE NULLS) OVER (
        |  PARTITION BY user_id ORDER BY us, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS reading_filled
        |FROM e ORDER BY user_id, us, event_id""".stripMargin)
}
