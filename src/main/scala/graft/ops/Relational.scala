package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Relational / query core — SURVEY.md §2.A.
  *
  * Re-expresses the reference's SQL surface (the `games` table workload in
  * straslerj/mlb-win-predictor `src/function.py`: daily INSERT batches,
  * next-day UPDATE of winners, per-entity season-to-date accumulation)
  * as declarative Spark plans over the TPC-H-ish test tables.
  *
  * Oracle discipline (SURVEY.md §4): every double output is `round(x, 4)`
  * on both the Spark and DuckDB side; longs stay longs (DuckDB side casts
  * where its type widens, e.g. sum(int) -> HUGEINT); every query ends with
  * a deterministic total ORDER BY mirrored in the oracle SQL.
  */
object Relational {

  private def r4(c: Column): Column = round(c, 4)
  private def r4b(c: Column): Column = OracleRound.r4b(c)

  /** A1 — groupBy aggregate (TPC-H Q1 shape). Reference analog: season-
    * to-date stat accumulation per pitcher (function.py:83-87). Map-side
    * partial aggregation + single shuffle on the (tiny) group key space.
    */
  def qAggPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // money flows as exact integer cents: double summation order
        // differs between engines/partitionings, integer sums don't
        r4(sum("l_quantity")).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("sum_base_price"),
        (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")) / 10000.0).as("sum_disc_price"),
        r4b(avg("l_quantity")).as("avg_qty"),
        r4b(sum(round(col("l_discount") * 100).cast("long")) / (lit(100.0) * count(lit(1)))).as("avg_disc"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A2 — filter + projection (pushed to the parquet scan). Reference
    * analog: the daily `statsapi.schedule(date=...)` slice (function.py:552).
    */
  def qFilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") > lit(0.05))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
        r4b(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("l_orderkey", "l_linenumber", "revenue")

  /** A3 — star join with explicitly broadcast dimensions. Reference
    * analog: `lookup_team`/`lookup_player` id->name joins (function.py:58-69).
    */
  def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"), r4(sum("c_acctbal")).as("sum_bal"))
      .orderBy("r_name", "n_name")
  }

  /** A4 — large-large shuffle join on the fact keys (games ⋈ outcomes).
    * Plain equi-join keys so the same plan is bucketing-compatible at scale.
    */
  def qJoinShuffle(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    // r14 (guide §2.3 aggregate-before-shuffle): revenue ticks pre-sum
    // per order BEFORE the join, so the one data exchange carries a
    // (orderkey, long) row per order instead of every joined line
    // feeding a two-phase countDistinct. With exactly one row per
    // matched order after the pre-aggregate, n_orders = count(*) ≡
    // countDistinct(o_orderkey) (o_orderkey is the orders key), and the
    // long tick total regroups the same addends — values unchanged,
    // oracle SQL unchanged, one whole aggregate phase dropped.
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
        .cast("long")).as("_rev"))
    perOrder.join(o, perOrder("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(col("_rev")) / 10000.0).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** A5 — left-semi / left-anti (games with vs without a recorded winner,
    * function.py:485-494 "no winning team" branch).
    */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir).select("l_orderkey")
    val withItems = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .agg(count(lit(1)).as("n_orders")).select(lit("with_items").as("kind"), col("n_orders"))
    val noItems = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orders")).select(lit("no_items").as("kind"), col("n_orders"))
    withItems.unionByName(noItems).orderBy("kind")
  }

  /** A6 — point-in-time window: per-entity cumulative stat strictly BEFORE
    * the current row (the reference's core semantic — "stats going into
    * the game", README "Collect Data to Train a Model"). One shuffle
    * (partition by key), in-partition sort, running frame.
    */
  def qWindowPit(spark: SparkSession, dir: String): DataFrame = {
    // lineitem intentionally contains duplicate (orderkey, linenumber)
    // rows (re-inserted games in the reference); l_quantity joins the sort
    // key so tied rows are value-interchangeable on both engines
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.lineitem(spark, dir)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        r4(coalesce(sum("l_quantity").over(w), lit(0.0))).as("qty_before"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "qty_before")
  }

  /** A7 — late-arriving-label upsert, latest-record-wins (the reference's
    * next-day `UPDATE games SET winning_team=...` function.py:480). Dedup
    * via row_number over (key ORDER BY ts DESC) — single shuffle, no
    * driver-side state.
    */
  def qUpsertLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"), r4b(col("value")).as("last_value"))
      .orderBy("user_id")
  }

  /** A8 — top-k by measure (leaderboard reporting). TakeOrderedAndProject:
    * per-partition top-k then merge — no global sort of the full table.
    */
  def qTopK(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), r4(col("c_acctbal")).as("acctbal"))
      .orderBy(col("acctbal").desc, col("c_custkey"))
      .limit(10)

  /** A9 — exact distinct counting per group. */
  def qDistinctCount(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n_cust"), count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** A10 — hierarchical rollup (league -> team style reporting). */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    // Exercises the SQL front end (spark.sql) — same Catalyst plan as the
    // DataFrame API. Dims broadcast via hint.
    Tables.customer(spark, dir).createOrReplaceTempView("g_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("g_nation")
    Tables.region(spark, dir).createOrReplaceTempView("g_region")
    spark.sql(
      """SELECT /*+ BROADCAST(g_nation), BROADCAST(g_region) */
        | coalesce(r_name, 'ALL') AS region_name,
        | coalesce(n_name, 'ALL') AS nation_name,
        | count(1) AS n_cust,
        | round(sum(c_acctbal), 4) AS sum_bal
        |FROM g_customer
        |JOIN g_nation ON c_nationkey = n_nationkey
        |JOIN g_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin)
  }

  /** A11 — union of two overlapping extracts + dedup (idempotent re-runs;
    * the reference re-inserts rescheduled games, function.py:624-629).
    */
  def qUnionDedup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus")
    val e1 = o.filter(col("o_orderkey") % 3 =!= 0)
    val e2 = o.filter(col("o_orderkey") % 2 === 0)
    e1.unionByName(e2).distinct()
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** A12 — conditional aggregation (wins vs losses counting,
    * function.py get_wins/get_losses).
    */
  def qCaseAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = broadcast(Tables.customer(spark, dir))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(when(col("o_totalprice") > lit(200000.0), lit(1))).as("n_big"),
        count(lit(1)).as("n_orders"),
        r4b(sum(round(col("o_totalprice") * 100).cast("long")) / (lit(100.0) * count(lit(1)))).as("avg_price"))
      .orderBy("c_mktsegment")
  }

  /** A13 — 4-table join + aggregate (revenue per nation, TPC-H Q5 shape).
    * Dim side broadcast; fact-fact join shuffles once on orderkey.
    */
  def qMultiJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg((sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")) / 10000.0).as("revenue"))
      .orderBy("n_name")
  }

  /** A14 — approximate distinct (HLL) — the 100 TB path for A9, where
    * exact per-group distinct would shuffle every key. No SQL oracle
    * (approx result); driver records rows-only.
    */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id").as("approx_users"))
      .orderBy("event_type")

  /** A15 — EXISTS-style filter: orders having at least one high-discount
    * line (left-semi against a pre-filtered build side — the filter is
    * pushed below the join).
    */
  def qCorrelatedExists(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val hot = Tables.lineitem(spark, dir).filter(col("l_discount") > lit(0.08)).select("l_orderkey")
    o.join(hot, o("o_orderkey") === hot("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), r4(col("o_totalprice")).as("total"))
      .orderBy("o_orderkey")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pricing" -> (qAggPricing _),
    "q_filter_project" -> (qFilterProject _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q_join_shuffle" -> (qJoinShuffle _),
    "q_semi_anti" -> (qSemiAnti _),
    "q_window_pit" -> (qWindowPit _),
    "q_upsert_latest" -> (qUpsertLatest _),
    "q_topk" -> (qTopK _),
    "q_distinct_count" -> (qDistinctCount _),
    "q_rollup" -> (qRollup _),
    "q_union_dedup" -> (qUnionDedup _),
    "q_case_agg" -> (qCaseAgg _),
    "q_multi_join_agg" -> (qMultiJoinAgg _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_correlated_exists" -> (qCorrelatedExists _))

  val oracles: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 4) AS sum_qty,
        | sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
        | sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS sum_disc_price,
        | floor((avg(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
        | floor((sum(CAST(round(l_discount * 100) AS BIGINT)) / (100.0 * count(*))) * 10000 + 0.5) / 10000 AS avg_disc,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        | floor((l_extendedprice * (1.0 - l_discount)) * 10000 + 0.5) / 10000 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin,
    "q_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 4) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_join_shuffle" ->
      """SELECT o_orderpriority,
        | count(DISTINCT o_orderkey) AS n_orders,
        | sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_semi_anti" ->
      """SELECT * FROM (
        | SELECT 'with_items' AS kind, count(*) AS n_orders FROM orders
        |  WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        | UNION ALL
        | SELECT 'no_items' AS kind, count(*) AS n_orders FROM orders
        |  WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |) ORDER BY kind""".stripMargin,
    "q_window_pit" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | round(coalesce(sum(l_quantity) OVER (
        |   PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0), 4) AS qty_before
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, qty_before""".stripMargin,
    "q_upsert_latest" ->
      """SELECT user_id, last_type, last_value FROM (
        | SELECT user_id, event_type AS last_type, floor((value) * 10000 + 0.5) / 10000 AS last_value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_topk" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 4) AS acctbal
        |FROM customer ORDER BY acctbal DESC, c_custkey LIMIT 10""".stripMargin,
    "q_distinct_count" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name, coalesce(n_name, 'ALL') AS nation_name,
        | count(*) AS n_cust, round(sum(c_acctbal), 4) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,
    "q_union_dedup" ->
      """SELECT o_orderstatus, count(*) AS n FROM (
        | SELECT DISTINCT * FROM (
        |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_case_agg" ->
      """SELECT c_mktsegment,
        | count(CASE WHEN o_totalprice > 200000.0 THEN 1 END) AS n_big,
        | count(*) AS n_orders,
        | floor((sum(CAST(round(o_totalprice * 100) AS BIGINT)) / (100.0 * count(*))) * 10000 + 0.5) / 10000 AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_multi_join_agg" ->
      """SELECT n_name,
        | sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_correlated_exists" ->
      """SELECT o_orderkey, round(o_totalprice, 4) AS total FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
        |ORDER BY o_orderkey""".stripMargin)
}
