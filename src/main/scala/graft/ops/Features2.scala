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

  /** B15 — deterministic stratified sample: the k=20 docs per language
    * with the smallest multiplicative key hash (Knuth 2654435761 mod
    * 2³²). Balanced class subsampling for training data that is (a)
    * reproducible across engines/runs — no RNG, the "random" order is a
    * pure function of the key — and (b) scalable: per-group top-k by
    * hash, the same bounded-buffer shape as A17 (window here; the TopK
    * aggregator at 100 TB). Integer arithmetic end to end.
    */
  def fStratifiedSample(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val h = expr("(doc_id * 2654435761) % 4294967296")
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), h.as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("doc_id", "lang", "h")
      .orderBy("lang", "h", "doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f_robust_scale" -> (fRobustScale _),
    "f_count_encode" -> (fCountEncode _),
    "f_stratified_sample" -> ((s: SparkSession, d: String) => fStratifiedSample(s, d)))

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
    "f_stratified_sample" ->
      """WITH h AS (
        | SELECT doc_id, lang, (doc_id * 2654435761) % 4294967296 AS h
        | FROM documents),
        |ranked AS (
        | SELECT *, row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
        | FROM h)
        |SELECT doc_id, lang, CAST(h AS BIGINT) AS h FROM ranked
        |WHERE rn <= 20 ORDER BY lang, h, doc_id""".stripMargin,
    "f_count_encode" ->
      """WITH freq AS (
        | SELECT c_mktsegment, count(*) AS seg_n FROM customer GROUP BY 1)
        |SELECT c_custkey, c.c_mktsegment, freq.seg_n
        |FROM customer c JOIN freq USING (c_mktsegment)
        |ORDER BY c_custkey""".stripMargin)
}
