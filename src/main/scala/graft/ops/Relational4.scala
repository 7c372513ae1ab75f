package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Relational extensions, wave 3 (round 3) — SURVEY.md §2.A (A35-A38).
  *
  * Collection aggregation, the remaining ANSI window rank family,
  * fixed-width histogramming, and regex extraction — each expressed as a
  * single declarative plan (one shuffle where one is inherent, none
  * where it isn't).
  */
object Relational4 {

  /** A35 — collection aggregation: per-user set/list rollup of event
    * types. `collect_set` merges order-independently map-side (it's an
    * AggregateFunction like any other — one shuffle on user_id);
    * `sort_array` + `array_join` canonicalize the set into an
    * engine-portable CSV so the result is deterministic. At 100 TB the
    * per-group set is bounded by the type-domain cardinality (5), not by
    * row count — the aggregation state stays O(domain).
    */
  def qArrayAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        array_join(sort_array(collect_set(col("event_type"))), ",").as("types_csv"),
        size(collect_set(col("event_type"))).as("n_types"),
        max(when(col("event_type") === "error", 1).otherwise(0)).as("has_error"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** A36 — the ANSI window-rank family: percent_rank / cume_dist /
    * ntile per priority group. The ORDER BY is total (price then unique
    * key), so every rank is deterministic and each output double is ONE
    * IEEE division of exact integers — bit-identical on any engine, no
    * rounding needed. One shuffle on the partition key.
    */
  def qRankFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** A37 — fixed-width histogram of order totals: bucket index is pure
    * integer arithmetic on exact cents ($20k buckets), so bucketing is
    * exact at any scale. One aggregation pass, map-side partials; the
    * output is O(buckets), never O(rows).
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select((round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .select((col("cents") / 2000000L).cast("long").as("bucket"), col("cents"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("cents").as("min_cents"), max("cents").as("max_cents"))
      .withColumn("lo_dollars", col("bucket") * 20000L)
      .orderBy("bucket")

  /** A38 — regex extraction in-projection: first match + non-overlapping
    * match count per document. Both are codegen'd string expressions —
    * no UDF, no shuffle at all (a pure map stage that scales linearly
    * with input splits).
    */
  def qRegexExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_extract(col("text"), "sp[a-z]+", 0).as("first_sp_word"),
        regexp_count(col("text"), lit("sp[a-z]+")).as("n_sp_matches"))
      .orderBy("doc_id")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_array_agg" -> (qArrayAgg _),
    "q_rank_funcs" -> (qRankFuncs _),
    "q_histogram" -> (qHistogram _),
    "q_regex_extract" -> (qRegexExtract _))

  val oracles: Map[String, String] = Map(
    "q_array_agg" ->
      """SELECT user_id,
        | string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
        | CAST(count(DISTINCT event_type) AS INT) AS n_types,
        | CAST(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS INT) AS has_error,
        | count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_rank_funcs" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume,
        | CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_histogram" ->
      """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT cents // 2000000 AS bucket, count(*) AS n,
        | min(cents) AS min_cents, max(cents) AS max_cents,
        | (cents // 2000000) * 20000 AS lo_dollars
        |FROM c GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_regex_extract" ->
      """SELECT doc_id,
        | regexp_extract(text, 'sp[a-z]+', 0) AS first_sp_word,
        | CAST(len(regexp_extract_all(text, 'sp[a-z]+')) AS INT) AS n_sp_matches
        |FROM documents ORDER BY doc_id""".stripMargin)
}
