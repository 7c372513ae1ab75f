package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Feature-engineering extensions (round 3) — SURVEY.md §2.B (B13-B14).
  *
  * Robust (median/IQR) scaling — the outlier-insensitive sibling of B5's
  * z-score (modeling.ipynb uses StandardScaler; RobustScaler is the same
  * API family) — and count/frequency encoding, the simplest categorical
  * encoder after B12's target encoding.
  */
object Features2 {

  /** B13 — robust scale: (x − median) / IQR per event_type. Quantiles are
    * EXACT DISCRETE (value at integer rank ceil(q·n), as A21): outputs are
    * raw input values, so the final subtract/divide is a fixed two-op
    * double sequence — bit-identical on any IEEE engine, then r4b-rounded.
    * One shuffle for the window rank + a tiny 5-row broadcast back; the
    * 100 TB path swaps the exact window for approx_percentile cutpoints.
    */
  def fRobustScale(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("event_type", "event_id", "value")
    val wOrd = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val wAll = Window.partitionBy("event_type")
    val cuts = e.withColumn("r", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy("event_type")
      .agg(
        max(when(col("r") === expr("(n * 25 + 99) div 100"), col("value"))).as("p25"),
        max(when(col("r") === expr("(n * 50 + 99) div 100"), col("value"))).as("p50"),
        max(when(col("r") === expr("(n * 75 + 99) div 100"), col("value"))).as("p75"))
    e.join(broadcast(cuts), Seq("event_type"))
      .select(col("event_id"), col("event_type"),
        OracleRound.r4b((col("value") - col("p50")) / (col("p75") - col("p25"))).as("value_robust"))
      .orderBy("event_id")
  }

  /** B14 — count (frequency) encoding: category → its global row count, a
    * tiny aggregate broadcast back onto the facts (same shuffle shape as
    * B12 target encoding; no label needed, so it's leakage-free).
    */
  def fCountEncode(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val freq = c.groupBy("c_mktsegment").agg(count(lit(1)).as("seg_n"))
    c.select("c_custkey", "c_mktsegment")
      .join(broadcast(freq), Seq("c_mktsegment"))
      .select("c_custkey", "c_mktsegment", "seg_n")
      .orderBy("c_custkey")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f_robust_scale" -> (fRobustScale _),
    "f_count_encode" -> (fCountEncode _))

  val oracles: Map[String, String] = Map(
    "f_robust_scale" ->
      """WITH ranked AS (
        | SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS r,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events),
        |cuts AS (
        | SELECT event_type,
        |  max(CASE WHEN r = (n * 25 + 99) // 100 THEN value END) AS p25,
        |  max(CASE WHEN r = (n * 50 + 99) // 100 THEN value END) AS p50,
        |  max(CASE WHEN r = (n * 75 + 99) // 100 THEN value END) AS p75
        | FROM ranked GROUP BY 1)
        |SELECT e.event_id, e.event_type,
        | floor(((e.value - c.p50) / (c.p75 - c.p25)) * 10000 + 0.5) / 10000 AS value_robust
        |FROM events e JOIN cuts c USING (event_type)
        |ORDER BY e.event_id""".stripMargin,
    "f_count_encode" ->
      """WITH freq AS (
        | SELECT c_mktsegment, count(*) AS seg_n FROM customer GROUP BY 1)
        |SELECT c_custkey, c.c_mktsegment, freq.seg_n
        |FROM customer c JOIN freq USING (c_mktsegment)
        |ORDER BY c_custkey""".stripMargin)
}
