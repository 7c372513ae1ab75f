package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Relational extensions (round 3, wave 9) — SURVEY.md §2.A46-A47.
  *
  * A46 chi-squared independence is the categorical-feature-selection
  * test the reference's model bench implies (it benches "old-school" vs
  * "modern" feature SUBSETS — modeling.ipynb cell 123; a χ² screen is how
  * such subsets get chosen from data). A47 per-group mode is the
  * categorical summary statistic `describe()` omits.
  */
object Relational5 {
  import OracleRound.r4b

  /** A46 — χ² contingency of market segment × urgent-priority label over
    * orders ⋈ customer. Observed counts are exact integers from ONE
    * conditional-aggregate pass; expected counts and per-cell
    * contributions are fixed-order IEEE expressions from those integers
    * (identical text on both engines), rounded via OracleRound. Output is
    * one row per segment with its χ² contribution — Σ(contrib) is the
    * statistic, df = (|seg|−1)·1.
    *
    * Plan shape: fact⋈dim equi-join (dim broadcast at test scale;
    * bucket-compatible plain keys at 100 TB), then a ≤|segments|-group
    * aggregate with map-side partials and a 1-row totals broadcast — no
    * window, no second fact scan.
    */
  def qChiSquare(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), (col("o_orderpriority") < "3").cast("int").as("urgent"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    val cells = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(sum(col("urgent")).as("obs_pos"),
        count(lit(1)).as("row_tot"))
      .withColumn("obs_neg", col("row_tot") - col("obs_pos"))
    val tot = cells.agg(sum("obs_pos").as("g_pos"), sum("row_tot").as("g_tot"))
    cells.crossJoin(broadcast(tot))
      .withColumn("exp_pos",
        col("row_tot") * col("g_pos").cast("double") / col("g_tot"))
      .withColumn("exp_neg",
        col("row_tot") * (col("g_tot") - col("g_pos")).cast("double") / col("g_tot"))
      .select(col("segment"), col("obs_pos"), col("obs_neg"),
        r4b(col("exp_pos")).as("exp_pos"),
        r4b(col("exp_neg")).as("exp_neg"),
        r4b((col("obs_pos") - col("exp_pos")) * (col("obs_pos") - col("exp_pos")) / col("exp_pos") +
          (col("obs_neg") - col("exp_neg")) * (col("obs_neg") - col("exp_neg")) / col("exp_neg"))
          .as("chi2_term"))
      .orderBy("segment")
  }

  /** A47 — per-group mode with a deterministic tie-break (most frequent
    * return flag per line status; ties → lexicographically smallest).
    * Two bounded aggregates: counts on (group, value) — map-side
    * partials, |groups|·|domain| rows — then a row_number window over
    * that TINY aggregate, never over the facts.
    */
  def qModePerGroup(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("l_linestatus")
      .orderBy(col("cnt").desc, col("l_returnflag"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_linestatus").as("linestatus"),
        col("l_returnflag").as("mode_returnflag"), col("cnt").as("mode_count"))
      .orderBy("linestatus")
  }

  /** A48 — share-of-total: each group's fraction of the grand total
    * (the "% of league revenue" reporting shape). Exact integer cents
    * through both the group and grand aggregates; the grand total is a
    * 1-row broadcast back onto the ≤|groups| aggregate — NOT a
    * partition-less window over the facts, which is the common
    * anti-pattern this operator exists to replace at scale.
    */
  def qPercentTotal(spark: SparkSession, dir: String): DataFrame = {
    val grouped = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
        count(lit(1)).as("n_orders"))
    val tot = grouped.agg(sum("cents").as("g_cents"))
    grouped.crossJoin(broadcast(tot))
      .select(col("priority"), col("n_orders"),
        (col("cents") / 100.0).as("revenue"),
        r4b(col("cents").cast("double") / col("g_cents")).as("pct_of_total"))
      .orderBy("priority")
  }

  /** A49 — long-form unpivot (the inverse of A19's pivot): four lineitem
    * measures melt to (key, metric, value) rows via `stack` — a pure
    * shuffle-free Generate projection (4 output rows per input row, no
    * wide-to-long shuffle), the feed shape for the melted-feature
    * pipelines (C22's histogram trainer starts exactly like this).
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("""stack(4, 'disc', l_discount, 'price', l_extendedprice,
               |         'qty', l_quantity, 'tax', l_tax)""".stripMargin)
          .as(Seq("metric", "value")))
      .orderBy("l_orderkey", "l_linenumber", "metric")

  /** A50 — key-sequence gap detection over an extract: the 20 widest
    * runs of orderkeys missing from the urgent-priority extract (the
    * "which batch did the export drop" check — a dense upstream keyspace
    * is exactly when holes in a slice are meaningful). The filter
    * reaches the scan; the ordered lead() pass runs over the extract
    * (already a fraction of the facts), and DistRank's range-repartition
    * is the 100 TB path (C7b's proven technique). Top-20 by exact
    * integer width, deterministic tie-break.
    */
  def qSequenceGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("k")
    Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("k"))
      .withColumn("next_key", lead("k", 1).over(w))
      .filter(col("next_key") > col("k") + 1)
      .select((col("k") + 1).as("gap_start"),
        (col("next_key") - 1).as("gap_end"),
        (col("next_key") - col("k") - 1).as("n_missing"))
      .orderBy(col("n_missing").desc, col("gap_start"))
      .limit(20)
  }

  /** A50b — `q_sequence_gaps` without the global window: rank every
    * present key with `DistRank.withGlobalRank` (range-sliced, full
    * parallelism), then pair rank r with rank r+1 by an EQUI-JOIN on the
    * rank — consecutive-row pairing as a shuffle join instead of a
    * single-partition lead(). Shares A50's oracle verbatim, so the
    * hash gate proves the distributed pairing bit-identical. The join
    * costs one extra shuffle at bench scale but never funnels the
    * extract through one task — the 100 TB shape.
    */
  def qSequenceGapsDist(spark: SparkSession, dir: String): DataFrame = {
    val extract = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("k"))
    val ranked = DistRank.withGlobalRank(extract, "r", col("k"))
    ranked.as("a")
      .join(ranked.select((col("r") - 1).as("r"), col("k").as("next_key")).as("b"), "r")
      .filter(col("next_key") > col("k") + 1)
      .select((col("k") + 1).as("gap_start"),
        (col("next_key") - 1).as("gap_end"),
        (col("next_key") - col("k") - 1).as("n_missing"))
      .orderBy(col("n_missing").desc, col("gap_start"))
      .limit(20)
  }

  /** A52 — cumulative reach: daily active events, NEW users (first-ever
    * activity that day), and the running distinct-user total. Exact
    * running COUNT DISTINCT is normally quadratic; the first-seen-flag
    * trick makes it linear — one per-user window marks each user's first
    * event, then distinct-so-far = cumulative sum of new-user counts
    * over the tiny per-day aggregate. One fact shuffle (user_id), one
    * window over ≤days rows.
    */
  def qRunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val flagged = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("us"), col("event_id"))
      .withColumn("is_new", (row_number().over(w) === 1).cast("int"))
      .withColumn("day", date_format(expr("timestamp_micros(us)"), "yyyy-MM-dd"))
    val daily = flagged.groupBy("day")
      .agg(count(lit(1)).as("n_events"), sum("is_new").as("new_users"))
    daily
      .withColumn("cum_users", sum("new_users").over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("day")
  }

  /** A53 — Benford first-digit screen: the observed leading-digit
    * distribution of order totals against Benford's law expectation
    * log₁₀(1+1/d) — the classic fabricated-numbers / broken-ETL
    * detector. The digit comes from pure string arithmetic on the
    * integer part (no log10 on the data path); one ≤9-group
    * conditional-aggregate pass + a 1-row total broadcast.
    */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val digit = substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
    val counts = Tables.orders(spark, dir)
      .select(digit.cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("n_tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        r4b(col("n").cast("double") / col("n_tot")).as("observed"),
        r4b(log((col("digit") + 1).cast("double") / col("digit")) / log(lit(10.0)))
          .as("benford"))
      .orderBy("digit")
  }

  /** A54 — `q_interpolate`: per-entity LINEAR time interpolation of
    * missing measurements — the standard repair step a time-series
    * feature pipeline runs where A34's forward-fill would bias toward
    * the past. Missingness is synthetic (event_id % 5 == 0 masked) so
    * the op is self-contained; each masked row is rebuilt from its
    * nearest non-missing neighbors on BOTH sides, weighted by actual
    * time position ((t−t₀)/(t₁−t₀) over exact micros longs), with
    * nearest-fill at sequence edges.
    *
    * Plan shape: both neighbor lookups are `last/first(..,
    * ignoreNulls)` frames over ONE per-user window sort — partitioned
    * by the entity key, no global window, one fact shuffle. The
    * interpolation expression is written identically on both engines
    * (same IEEE op order), so the oracle matches bit-for-bit after
    * quantization.
    */
  def qInterpolate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wp = w.rowsBetween(Window.unboundedPreceding, -1)
    val wn = w.rowsBetween(1, Window.unboundedFollowing)
    val base = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")).as("v"))
      .withColumn("pv", last("v", ignoreNulls = true).over(wp))
      .withColumn("pt",
        last(when(col("v").isNotNull, col("us")), ignoreNulls = true).over(wp))
      .withColumn("nv", first("v", ignoreNulls = true).over(wn))
      .withColumn("nt",
        first(when(col("v").isNotNull, col("us")), ignoreNulls = true).over(wn))
    val frac = (col("us") - col("pt")).cast("double") / (col("nt") - col("pt"))
    base.filter(col("v").isNull)
      .select(col("user_id"), col("event_id"),
        // nt = pt (non-masked neighbors sharing one microsecond) would
        // divide by zero — Spark NULL vs DuckDB inf; fall back to pv,
        // guarded identically in the oracle's CASE
        r4b(when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .when(col("nt") === col("pt"), col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) * frac)).as("interp"))
      .orderBy("user_id", "event_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_interpolate" -> (qInterpolate _),
    "q_chi_square" -> (qChiSquare _),
    "q_mode_per_group" -> (qModePerGroup _),
    "q_percent_total" -> (qPercentTotal _),
    "q_unpivot" -> (qUnpivot _),
    "q_sequence_gaps" -> (qSequenceGaps _),
    "q_sequence_gaps_dist" -> (qSequenceGapsDist _),
    "q_running_distinct" -> (qRunningDistinct _),
    "q_benford" -> (qBenford _))

  private val sequenceGapsSql =
    """WITH d AS (
      |  SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
      |g AS (
      |  SELECT k, lead(k, 1) OVER (ORDER BY k) AS next_key FROM d)
      |SELECT k + 1 AS gap_start, next_key - 1 AS gap_end,
      |       next_key - k - 1 AS n_missing
      |FROM g WHERE next_key > k + 1
      |ORDER BY n_missing DESC, gap_start LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(
    // identical masking, neighbor frames, and IEEE op order; micros are
    // exact longs (< 2^53) so the time fraction is exact cross-engine
    "q_interpolate" ->
      """WITH b AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us,
        |   CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        | FROM events),
        |f AS (
        | SELECT user_id, event_id, us, v,
        |   last_value(v IGNORE NULLS) OVER wp AS pv,
        |   last_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS) OVER wp AS pt,
        |   first_value(v IGNORE NULLS) OVER wn AS nv,
        |   first_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS) OVER wn AS nt
        | FROM b
        | WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |  wn AS (PARTITION BY user_id ORDER BY us, event_id
        |   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, event_id,
        |  floor((CASE WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv
        |    WHEN nt = pt THEN pv
        |    ELSE pv + (nv - pv) * (CAST(us - pt AS DOUBLE) / (nt - pt)) END) * 10000 + 0.5) / 10000 AS interp
        |FROM f WHERE v IS NULL ORDER BY user_id, event_id""".stripMargin,
    "q_chi_square" ->
      """WITH cells AS (
        |  SELECT c.c_mktsegment AS segment,
        |         sum(CAST(o.o_orderpriority < '3' AS INT)) AS obs_pos,
        |         count(*) AS row_tot
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_mktsegment),
        |tot AS (
        |  SELECT sum(obs_pos) AS g_pos, sum(row_tot) AS g_tot FROM cells)
        |SELECT segment,
        |  CAST(obs_pos AS BIGINT) AS obs_pos,
        |  CAST(row_tot - obs_pos AS BIGINT) AS obs_neg,
        |  floor((row_tot * CAST(g_pos AS DOUBLE) / g_tot) * 10000 + 0.5) / 10000 AS exp_pos,
        |  floor((row_tot * CAST(g_tot - g_pos AS DOUBLE) / g_tot) * 10000 + 0.5) / 10000 AS exp_neg,
        |  floor(((obs_pos - row_tot * CAST(g_pos AS DOUBLE) / g_tot) *
        |         (obs_pos - row_tot * CAST(g_pos AS DOUBLE) / g_tot) /
        |         (row_tot * CAST(g_pos AS DOUBLE) / g_tot) +
        |         ((row_tot - obs_pos) - row_tot * CAST(g_tot - g_pos AS DOUBLE) / g_tot) *
        |         ((row_tot - obs_pos) - row_tot * CAST(g_tot - g_pos AS DOUBLE) / g_tot) /
        |         (row_tot * CAST(g_tot - g_pos AS DOUBLE) / g_tot)) * 10000 + 0.5) / 10000
        |    AS chi2_term
        |FROM cells CROSS JOIN tot
        |ORDER BY segment""".stripMargin,
    "q_benford" ->
      """WITH c AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
        |         count(*) AS n
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM c)
        |SELECT digit, n,
        |  floor((CAST(n AS DOUBLE) / n_tot) * 10000 + 0.5) / 10000 AS observed,
        |  floor((ln(CAST(digit + 1 AS DOUBLE) / digit) / ln(10.0)) * 10000 + 0.5) / 10000 AS benford
        |FROM c CROSS JOIN tot ORDER BY digit""".stripMargin,
    "q_running_distinct" ->
      """WITH f AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |         CAST(row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) = 1 AS INT) AS is_new,
        |         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
        |  FROM events),
        |daily AS (
        |  SELECT day, count(*) AS n_events,
        |         CAST(sum(is_new) AS BIGINT) AS new_users
        |  FROM f GROUP BY 1)
        |SELECT day, n_events, new_users,
        |       CAST(sum(new_users) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM daily ORDER BY day""".stripMargin,
    "q_sequence_gaps" -> sequenceGapsSql,
    // shared verbatim: the hash gate proves the rank-pairing join
    // bit-identical to the lead() formulation
    "q_sequence_gaps_dist" -> sequenceGapsSql,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'disc' AS metric, l_discount AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'qty', l_quantity FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "q_percent_total" ->
      """WITH g AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS g_cents FROM g)
        |SELECT priority, n_orders, cents / 100.0 AS revenue,
        |       floor((CAST(cents AS DOUBLE) / g_cents) * 10000 + 0.5) / 10000 AS pct_of_total
        |FROM g CROSS JOIN tot ORDER BY priority""".stripMargin,
    "q_mode_per_group" ->
      """WITH counts AS (
        |  SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT l_linestatus AS linestatus, l_returnflag AS mode_returnflag,
        |       CAST(cnt AS BIGINT) AS mode_count
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_linestatus
        |            ORDER BY cnt DESC, l_returnflag) AS rn
        |  FROM counts)
        |WHERE rn = 1 ORDER BY linestatus""".stripMargin)
}
