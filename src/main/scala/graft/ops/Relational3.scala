package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Relational extensions (round 3) — SURVEY.md §2.A (A26-A30).
  *
  * Completes the reporting/temporal surface: explicit GROUPING SETS,
  * salted skew joins (the 100 TB answer when one key dominates), per-key
  * lead/lag gap analysis, a zero-filled date spine, and SCD-2 interval
  * construction from event snapshots (the "UPDATE winning_team next day"
  * lifecycle, reference function.py:462-539, expressed as immutable
  * validity intervals).
  */
object Relational3 {

  /** A26 — GROUPING SETS: the explicit-sets generalization of A10/A20
    * (rollup/cube). One pass, Expand handles the set multiplication
    * map-side before the single hash aggregate — never k scans. Revenue
    * flows as exact integer cents (order-independent partial merges).
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq.empty[Column]),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("o_totalprice") * 100).cast("long")) / 100.0).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("revenue"))
      .orderBy("status", "priority")

  /** A27 — salted skew join: when one join key holds a disproportionate
    * share of the probe rows, a plain hash join lands that key on a single
    * reducer and the stage runs at the speed of its hottest partition.
    * Salting splits each probe key into S deterministic sub-keys and
    * replicates the build side S× — the hot key now spreads over S
    * reducers. Result is bit-identical to the plain join (the oracle IS
    * the plain join); AQE skew-split is the automatic variant, this is the
    * explicit one that also works mid-pipeline where AQE can't re-split.
    * S=4 here; at 100 TB S scales with the observed skew factor.
    */
  def qSkewSaltJoin(spark: SparkSession, dir: String): DataFrame = {
    val salts = 4
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        // deterministic salt — any per-row value works; pmod keeps it in [0, S)
        pmod(col("l_linenumber"), lit(salts)).as("salt"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .crossJoin(spark.range(salts).select(col("id").cast("int").as("salt")))
    li.join(o, li("l_orderkey") === o("o_orderkey") && li("salt") === o("salt"))
      .groupBy("o_orderpriority")
      .agg((sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")) / 10000.0).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** A27b — `q_skew_join_aqe` (round-11 stretch #9): A27's join with
    * the salt REMOVED and AQE's runtime skew-split left to handle the
    * hot keys instead — `spark.sql.adaptive.skewJoin` splits an
    * oversized sort-merge partition into advisory-sized sub-reads at
    * runtime, joining each against a replicated other side (exactly the
    * probe-replication HotBucket variant, decided from MEASURED map
    * output sizes instead of a pre-pinned hot list). The merge-join
    * hint keeps the plan in SMJ territory — at 100 TB both sides are
    * fact-sized and SMJ is the real plan; without the hint the demo-SF
    * orders side would broadcast and there'd be nothing to split.
    *
    * WHEN THE MANUAL SALT (A27) IS STILL REQUIRED — the documented
    * boundary Round11fSpec pins: AQE can only re-split a SHUFFLE
    * sort-merge/hash join. A broadcast join has no shuffle to split; a
    * bucketed co-located join (A22/I18) reads pre-shuffled files AQE
    * never re-plans; and aggregation skew (one hot GROUP BY key) needs
    * the two-level salt-and-merge rewrite — AQE's skewedJoin
    * optimization rule does not touch it. The oracle is A27's
    * VERBATIM (the unsalted replay): however the engine splits, the
    * result must be the plain join's.
    */
  def qSkewJoinAqe(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg((sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")) / 10000.0).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** A28 — lead/lag gap analysis: time between consecutive events per
    * user (inter-arrival stats — the "days since last game" family of
    * features). Single shuffle on user_id; microsecond integer arithmetic
    * end to end (events.ts is nanos-as-long; μs is the finest resolution
    * every engine preserves — see A18). Sort key (us, event_id) is total.
    */
  def qLeadLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"))
      .withColumn("gap", col("us") - lag("us", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(col("gap")).as("n_gaps"),
        sum("gap").as("sum_gap_us"),
        max("gap").as("max_gap_us"))
      .orderBy("user_id")
  }

  /** A29 — date spine: zero-filled daily counts over the full [min, max]
    * order-date range (reporting needs every day present, including the
    * days with no games). The spine comes from `sequence()` over the
    * 1-row min/max aggregate — a few thousand rows regardless of fact
    * size, so the left join broadcasts the counts side is wrong-way-
    * round; instead the tiny spine broadcasts and the big side was
    * already reduced to per-day counts by the aggregate. No driver-side
    * date loop.
    */
  def qDateSpine(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("d"))
    val spine = days.agg(min("d").as("dmin"), max("d").as("dmax"))
      .select(explode(expr("sequence(dmin, dmax, interval 1 day)")).as("d"))
    val counts = days.groupBy("d").agg(count(lit(1)).as("n_orders"))
    spine.join(counts, Seq("d"), "left")
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("day")
  }

  /** A30 — SCD-2 interval build: collapse each user's event stream into
    * state-change rows with [valid_from, valid_to) validity intervals
    * (valid_to null = current). This is the immutable-history answer to
    * the reference's in-place UPDATE lifecycle: instead of mutating the
    * row, append the new state and derive intervals declaratively.
    * Gaps-and-islands via lag-filter + lead — one shuffle on user_id,
    * both windows share the partitioning.
    */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val changes = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        col("event_type").as("state"), expr("ts div 1000").as("us"))
      .withColumn("prev_state", lag("state", 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
    changes
      .withColumn("valid_to_us", lead("us", 1).over(w))
      .select(col("user_id"), col("state"), col("us").as("valid_from_us"),
        col("valid_to_us"), col("event_id"))
      .orderBy("user_id", "valid_from_us", "event_id")
  }

  /** A31 — bloom-filter pre-join: semi-join lineitem to the urgent
    * orders, with a bloom filter built over the dim keys and applied to
    * the fact BEFORE the join shuffle. At 100 TB this is the difference
    * between shuffling the full fact table and shuffling only the ~1/5
    * that can possibly match: the filter is a few MB regardless of fact
    * size, false positives are removed by the exact semi join that
    * follows, so the result is exactly the plain semi join (the oracle).
    * Catalyst's runtime row-level filtering injects this pattern for
    * joins it can see; the explicit form works mid-pipeline too. The
    * single-row driver collect is the bloom binary itself (same tiny-
    * broadcast budget as C3's centroids).
    */
  def qBloomPrejoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Bloom
    val dim = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val bloomBytes = dim.agg(Bloom.bloomAgg(col("o_orderkey")).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    Tables.lineitem(spark, dir)
      .filter(Bloom.mightContain(lit(bloomBytes), col("l_orderkey")))
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** A32 — the SQL-string surface: the same Catalyst engine through
    * `spark.sql` over temp views (TPC-H Q3 shape adapted to this schema:
    * segment-filtered unshipped-revenue top-10). A user of the
    * reference's raw-SQL workflow ports queries verbatim; DataFrame and
    * SQL formulations compile to identical plans, so everything §5 says
    * about pushdown/broadcast applies unchanged. `TakeOrderedAndProject`
    * handles the global top-10 without a full sort.
    */
  def qSqlApi(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("v_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("v_lineitem")
    spark.sql(
      """SELECT o_orderkey,
        | date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
        | o_orderpriority,
        | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM v_customer
        |JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < CAST('1998-01-01' AS TIMESTAMP)
        |  AND l_shipdate > CAST('1998-01-01' AS TIMESTAMP)
        |GROUP BY o_orderkey, orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_api" -> (qSqlApi _),
    "q_bloom_prejoin" -> (qBloomPrejoin _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_skew_salt_join" -> (qSkewSaltJoin _),
    "q_skew_join_aqe" -> (qSkewJoinAqe _),
    "q_skew_salt_agg" -> ((s: SparkSession, d: String) => qSkewSaltAgg(s, d)),
    "q_lead_lag" -> (qLeadLag _),
    "q_date_spine" -> (qDateSpine _),
    "q_scd2" -> (qScd2 _))

  /** A27c — `q_skew_salt_agg` (round-12 stretch #8, completing the
    * skew playbook A27/A27b/A22 built for JOINS): the two-stage
    * SALTED PARTIAL AGGREGATE for a hot-key groupBy. Why joins' tools
    * don't transfer: AQE's skewedJoin rule only re-splits shuffle
    * JOIN partitions (Round11fSpec pinned the boundary), and Spark's
    * own map-side partial aggregation already neutralizes hot keys
    * for ALGEBRAIC aggregates (sum/count collapse to one row per key
    * per task) — the case that actually skews at 100 TB is the
    * NON-COLLAPSIBLE aggregate, count(DISTINCT user) per hot key,
    * where every task must ship its full per-key distinct set to one
    * reducer. The rewrite: salt = user_id % S PARTITIONS THE DISTINCT
    * DOMAIN (not the rows — a row-random salt would double-count),
    * so stage 1's per-(key, salt) exact distinct counts are disjoint
    * and stage 2's plain sum is exact. Result-invisible by
    * construction; the oracle is the UNSALTED plain aggregate.
    *
    * Scale shape: stage 1 shuffles (key × S) groups — the hot key's
    * distinct set fans out over S reducers instead of one; stage 2
    * shuffles S rows per key. The algebraic companions (sum, count)
    * ride the same two stages to show the rewrite carries a full
    * aggregate list, not just the distinct.
    */
  def qSkewSaltAgg(spark: SparkSession, dir: String,
                   salts: Int = 8): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        round(col("value") * 10000).cast("long").as("v"))
    ev.groupBy(col("event_type"),
        pmod(col("user_id"), lit(salts)).as("salt"))
      .agg(countDistinct(col("user_id")).as("pd"),
        sum(col("v")).as("pv"), count(lit(1)).as("pn"))
      .groupBy("event_type")
      .agg(sum("pd").as("n_users"),
        (sum("pv") / 10000.0).as("total_value"),
        sum("pn").as("n"))
      .orderBy("event_type")
  }

  private lazy val skewJoinOracle: String =
    """SELECT o_orderpriority,
      | sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
      | count(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_sql_api" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        | o_orderpriority,
        | sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < CAST('1998-01-01' AS TIMESTAMP)
        |  AND l_shipdate > CAST('1998-01-01' AS TIMESTAMP)
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    // the oracle is the plain semi join — the bloom pre-filter must be
    // result-invisible (false positives all die in the exact join)
    "q_bloom_prejoin" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (
        | SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n,
        | sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY status, priority""".stripMargin,
    // the oracle is the UNSALTED join — salting must be result-invisible
    "q_skew_salt_join" -> skewJoinOracle,
    // A27b shares it VERBATIM: however AQE splits the skewed shuffle at
    // runtime, the result must be the plain join's
    "q_skew_join_aqe" -> skewJoinOracle,
    // A27c: the plain UNSALTED aggregate — however the engine salts,
    // the result must be the one-stage groupBy's
    "q_skew_salt_agg" ->
      """SELECT event_type,
        | count(DISTINCT user_id) AS n_users,
        | sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0 AS total_value,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_lead_lag" ->
      """WITH g AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
        | FROM events)
        |SELECT user_id, count(*) AS n_events, count(gap) AS n_gaps,
        | CAST(sum(gap) AS BIGINT) AS sum_gap_us, max(gap) AS max_gap_us
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_date_spine" ->
      """WITH b AS (
        | SELECT min(o_orderdate::DATE) AS dmin, max(o_orderdate::DATE) AS dmax FROM orders),
        |spine AS (
        | SELECT unnest(generate_series(dmin, dmax, INTERVAL 1 DAY))::DATE AS d FROM b),
        |c AS (
        | SELECT o_orderdate::DATE AS d, count(*) AS n_orders FROM orders GROUP BY 1)
        |SELECT strftime(spine.d, '%Y-%m-%d') AS day, coalesce(c.n_orders, 0) AS n_orders
        |FROM spine LEFT JOIN c ON spine.d = c.d
        |ORDER BY day""".stripMargin,
    "q_scd2" ->
      """WITH e AS (
        | SELECT user_id, event_id, event_type AS state, epoch_us(ts) AS us,
        |  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_state
        | FROM events),
        |changes AS (
        | SELECT * FROM e WHERE prev_state IS NULL OR prev_state <> state)
        |SELECT user_id, state, us AS valid_from_us,
        | lead(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
        | event_id
        |FROM changes
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin)
}
