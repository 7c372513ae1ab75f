package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** As-of (point-in-time) join — SURVEY.md §2.A16.
  *
  * The reference's defining semantic: each game is joined to the
  * pitcher's latest stats STRICTLY BEFORE game time (README "stats going
  * into the game"). Spark has no asof-join operator; the scalable
  * formulation is the tagged-union trick:
  *
  *   union(probe tagged 0, build tagged 1)
  *     → one shuffle on the key, in-partition sort by (time, tag)
  *     → forward-fill the build value with last(ignoreNulls) over a
  *       running frame → keep probe rows.
  *
  * Probe rows sort before build rows at equal timestamps, so a build row
  * at exactly probe-time is NOT visible (strict "before"). One shuffle
  * total — no per-key subqueries, no range cross-join; at 100 TB this is
  * the plan a custom SparkPlan would produce anyway, so composing
  * builtins wins (stays inside whole-stage codegen + AQE).
  */
object AsOf {

  /** Generic as-of join: for each probe row, the latest build row value
    * with build.time strictly below probe.time, per key. With
    * `inclusive = true` a build row at EXACTLY probe.time is visible
    * (at-or-before semantics) — build rows then sort before probe rows
    * on timestamp ties instead of after.
    */
  def asofJoin(probe: DataFrame, build: DataFrame,
               keyCol: String, timeCol: String, valueCol: String,
               asofName: String, inclusive: Boolean = false): DataFrame = {
    val p = probe.withColumn("_tag", lit(0))
    val b = build.select(col(keyCol), col(timeCol),
        col(valueCol).as("_build_value"))
      .withColumn("_tag", lit(1))
    val unioned = p.unionByName(b, allowMissingColumns = true)
    val tagOrder = if (inclusive) col("_tag").desc else col("_tag").asc
    val w = Window.partitionBy(keyCol)
      // _build_value last: deterministic fill if two build rows share a ts
      .orderBy(col(timeCol), tagOrder, col("_build_value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(asofName,
        last(when(col("_tag") === 1, col("_build_value")), ignoreNulls = true).over(w))
      .filter(col("_tag") === 0)
      .drop("_tag", "_build_value")
  }

  /** A16 — `q_asof_join`: each purchase event joined to the same user's
    * most recent strictly-prior view event (game ⋈ latest pre-game stat).
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    asofJoin(purchases, views, "user_id", "ts", "value", "prior_view_value")
      .select(col("user_id"), col("event_id"),
        OracleRound.r4b(col("value")).as("purchase_value"),
        OracleRound.r4b(col("prior_view_value")).as("prior_view_value"))
      .orderBy("user_id", "event_id")
  }

  /** A16b — the same query through the custom [[graft.plans.AsOfJoinExec]]
    * plan node (LogicalPlan + SparkStrategy + sort-merge SparkPlan),
    * hash-checked against the identical DuckDB oracle.
    */
  def qAsofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    graft.plans.AsOfJoinNative
      .asofJoin(purchases, views, "user_id", "ts", "value", "prior_view_value")
      .select(col("user_id"), col("event_id"),
        OracleRound.r4b(col("value")).as("purchase_value"),
        OracleRound.r4b(col("prior_view_value")).as("prior_view_value"))
      .orderBy("user_id", "event_id")
  }

  /** A51 — NEAREST-in-time join: each purchase pairs with the view
    * closest in time in EITHER direction (ties → the earlier one) — the
    * sensor/feature-alignment semantic where "latest before" is wrong
    * half the time. Two as-of passes (a backward AT-OR-BEFORE one, and
    * a strictly-after forward one obtained by running the same
    * tagged-union trick on negated time), then an O(1) per-row pick —
    * still two shuffles total, no range join. The carried value is a
    * (time, value) struct so the pick can compare distances. A view at
    * exactly the purchase timestamp is the true nearest neighbor at
    * dt=0: it rides the backward (inclusive) pass, and only there, so
    * it is neither dropped nor double-counted.
    */
  def qAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("us"),
        col("event_id"), col("event_type"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("us"),
        struct(col("us").as("v_us"), col("value").as("v_val")).as("vrec"))
    val back = asofJoin(purchases, views, "user_id", "us", "vrec", "back",
      inclusive = true)
    val fwd = asofJoin(
      back.withColumn("us_neg", -col("us")),
      views.withColumn("us_neg", -col("us")).select(col("user_id"), col("us_neg"), col("vrec")),
      "user_id", "us_neg", "vrec", "fwd")
    val dtBack = col("us") - col("back.v_us")
    val dtFwd = col("fwd.v_us") - col("us")
    val pickBack = col("fwd").isNull || (col("back").isNotNull && dtBack <= dtFwd)
    fwd.select(col("user_id"), col("event_id"),
      when(col("back").isNotNull || col("fwd").isNotNull,
        when(pickBack, col("back.v_val")).otherwise(col("fwd.v_val"))).as("nearest_view_value"),
      when(col("back").isNotNull || col("fwd").isNotNull,
        when(pickBack, dtBack).otherwise(dtFwd)).as("nearest_dt_us"),
      when(col("back").isNotNull || col("fwd").isNotNull,
        when(pickBack, lit("back")).otherwise(lit("fwd"))).as("direction"))
      .orderBy("user_id", "event_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_join_native" -> (qAsofJoinNative _),
    "q_asof_nearest" -> (qAsofNearest _))

  private val asofOracle =
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id, value, 0 AS tag
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, NULL AS event_id, value, 1 AS tag
        |  FROM events WHERE event_type = 'view'),
        |filled AS (
        |  SELECT *, last_value(CASE WHEN tag = 1 THEN value END IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, tag, CASE WHEN tag = 1 THEN value END
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_view
        |  FROM tagged)
        |SELECT user_id, event_id,
        | floor((value) * 10000 + 0.5) / 10000 AS purchase_value,
        | floor((prior_view) * 10000 + 0.5) / 10000 AS prior_view_value
        |FROM filled WHERE tag = 0
        |ORDER BY user_id, event_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_asof_join" -> asofOracle,
    "q_asof_join_native" -> asofOracle,
    // correlated LIMIT-1 subqueries replay the two as-of passes; the
    // tie-breaks mirror the Spark window's last()-over-sorted-struct
    // (backward: max (us, value) AT-or-below t — an exact-time view is
    // the dt=0 nearest neighbor; forward: min us / max value strictly
    // above t — see qAsofNearest)
    "q_asof_nearest" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, value
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id, epoch_us(ts) AS us, value FROM events
        |  WHERE event_type = 'view'),
        |paired AS (
        |  SELECT p.user_id, p.event_id, p.us,
        |   (SELECT {u: v.us, val: v.value} FROM v
        |    WHERE v.user_id = p.user_id AND v.us <= p.us
        |    ORDER BY v.us DESC, v.value DESC LIMIT 1) AS back,
        |   (SELECT {u: v.us, val: v.value} FROM v
        |    WHERE v.user_id = p.user_id AND v.us > p.us
        |    ORDER BY v.us ASC, v.value DESC LIMIT 1) AS fwd
        |  FROM p)
        |SELECT user_id, event_id,
        |  CASE WHEN fwd IS NULL OR (back IS NOT NULL AND us - back.u <= fwd.u - us)
        |       THEN back.val ELSE fwd.val END AS nearest_view_value,
        |  CASE WHEN fwd IS NULL OR (back IS NOT NULL AND us - back.u <= fwd.u - us)
        |       THEN us - back.u ELSE fwd.u - us END AS nearest_dt_us,
        |  CASE WHEN back IS NULL AND fwd IS NULL THEN NULL
        |       WHEN fwd IS NULL OR (back IS NOT NULL AND us - back.u <= fwd.u - us)
        |       THEN 'back' ELSE 'fwd' END AS direction
        |FROM paired ORDER BY user_id, event_id""".stripMargin)
}
