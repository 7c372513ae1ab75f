package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Feature engineering — SURVEY.md §2.B.
  *
  * Re-expresses the reference's EDA/feature pipeline
  * (straslerj/mlb-win-predictor `modeling/eda.ipynb`: null-on-zero-divide
  * derived ratio, away−home comparison diffs, dropna, describe,
  * StandardScaler, deterministic train/test split, binary label) as
  * declarative Spark plans.
  *
  * Scale rules: all dataset-level statistics (mean/std/min/max/cutpoints)
  * are computed as a tiny aggregate and broadcast back via crossJoin —
  * never a window over the whole table; the comparison-diff self-join
  * broadcasts the (small) per-entity stat tables.
  */
object Features {

  private def r4(c: Column): Column = round(c, 4)
  // binary-deterministic rounding for computed doubles (see OracleRound)
  private def r4b(c: Column): Column = OracleRound.r4b(c)
  // round() can yield IEEE -0.0 on one engine and 0.0 on the other for
  // tiny negatives; adding 0.0 normalizes both to +0.0.
  private def r4z(c: Column): Column = round(c, 4) + lit(0.0)

  /** Null-on-zero-divide derived ratio (eda cell 20-21: `k_bb_ratio =
    * k9/bb9` with 0-denominator → null). Pure projection — stays inside
    * whole-stage codegen, no shuffle.
    */
  private def ratioCol: Column =
    when(col("l_discount") === 0.0, lit(null))
      .otherwise(col("l_quantity") / col("l_discount"))

  /** B1 — null-safe ratio. */
  def fNullSafeRatio(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r4b(ratioCol).as("qty_disc_ratio"))
      .orderBy("l_orderkey", "l_linenumber", "qty_disc_ratio")

  /** B2 — comparison features: the reference joins per-pitcher stats twice
    * (home + away) onto each game and emits away−home diffs (eda cell 27).
    * Here each lineitem references two entities (supplier, part); we join
    * each entity's stat table back and emit the diff. The stat tables are
    * aggregates (|suppliers|, |parts| rows — tiny vs the fact) so both
    * joins broadcast: no fact-side shuffle at any scale.
    */
  def fCompDiff(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // entity means from exact integer cents: a double avg's summation
    // order differs between engines, an integer sum cannot
    val cents = sum(round(col("l_extendedprice") * 100).cast("long"))
    val supStats = li.groupBy("l_suppkey")
      .agg((cents / (lit(100.0) * count(lit(1)))).as("supp_avg_price"))
    val partStats = li.groupBy("l_partkey")
      .agg((cents / (lit(100.0) * count(lit(1)))).as("part_avg_price"))
    li.join(broadcast(supStats), "l_suppkey")
      .join(broadcast(partStats), "l_partkey")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r4b(col("supp_avg_price") - col("part_avg_price")).as("supp_part_diff"),
        r4b(col("l_extendedprice") - col("supp_avg_price")).as("price_vs_supp"))
      .orderBy("l_orderkey", "l_linenumber", "supp_part_diff", "price_vs_supp")
  }

  /** B3 — dropna across derived feature columns (eda cell 15/24): rows
    * whose derived ratio is null are dropped.
    */
  def fDropNulls(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("qty_disc_ratio", r4b(ratioCol))
      .na.drop(Seq("qty_disc_ratio"))
      .select("l_orderkey", "l_linenumber", "qty_disc_ratio")
      .orderBy("l_orderkey", "l_linenumber", "qty_disc_ratio")

  /** B4 — describe(): count/mean/std/min/max per numeric column (eda cell
    * 7). Single pass over the table (one agg), then `stack` pivots the 1×N
    * aggregate row into one output row per column — no per-column rescan.
    */
  def fDescribe(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        count(lit(1)).as("n"),
        avg("l_quantity").as("q_mean"), stddev("l_quantity").as("q_std"),
        min("l_quantity").as("q_min"), max("l_quantity").as("q_max"),
        avg("l_extendedprice").as("p_mean"), stddev("l_extendedprice").as("p_std"),
        min("l_extendedprice").as("p_min"), max("l_extendedprice").as("p_max"),
        avg("l_discount").as("d_mean"), stddev("l_discount").as("d_std"),
        min("l_discount").as("d_min"), max("l_discount").as("d_max"))
      .select(expr(
        """stack(3,
          | 'l_quantity', n, round(q_mean,4), round(q_std,4), round(q_min,4), round(q_max,4),
          | 'l_extendedprice', n, round(p_mean,4), round(p_std,4), round(p_min,4), round(p_max,4),
          | 'l_discount', n, round(d_mean,4), round(d_std,4), round(d_min,4), round(d_max,4)
          |) AS (col_name, n, mean, std, min_val, max_val)""".stripMargin))
      .orderBy("col_name")

  /** B5 — StandardScaler (modeling cell 7-8): (x−μ)/σ. Two-pass: a 1-row
    * stats aggregate, broadcast back via crossJoin, scale in-projection.
    * No window-over-all — the stats row is the only shuffled data.
    */
  def fStandardScale(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // μ and σ from EXACT integer moments (cents; Σc² in decimal — it
    // overflows a long): double-precision avg/stddev merge partial
    // aggregates in partition order, which differs between engines and
    // runs, and the ulp drift lands on 600k rounded output rows. From
    // exact Σc and Σc², both engines derive bit-identical doubles.
    def exactStats(c: Column, scale: Double, muName: String) = {
      val cents = round(c * scale).cast("long")
      Seq(sum(cents).as(s"_s1_$muName"),
        sum((cents * cents).cast("decimal(38,0)")).as(s"_s2_$muName"),
        count(lit(1)).as(s"_n_$muName"))
    }
    val statCols = exactStats(col("l_quantity"), 1.0, "q") ++
      exactStats(col("l_extendedprice"), 100.0, "p")
    val raw = li.agg(statCols.head, statCols.tail: _*)
    def mu(tag: String, scale: Double): Column =
      col(s"_s1_$tag").cast("double") / (lit(scale) * col(s"_n_$tag"))
    def sigma(tag: String, scale: Double): Column = {
      val n = col(s"_n_$tag").cast("decimal(38,0)")
      val s1 = col(s"_s1_$tag").cast("decimal(38,0)")
      val num = (col(s"_s2_$tag") * n - s1 * s1).cast("double")
      sqrt(num) / (lit(scale) * sqrt(col(s"_n_$tag").cast("double") * (col(s"_n_$tag") - 1)))
    }
    val stats = raw.select(
      mu("q", 1.0).as("q_mu"), sigma("q", 1.0).as("q_sigma"),
      mu("p", 100.0).as("p_mu"), sigma("p", 100.0).as("p_sigma"))
    li.crossJoin(broadcast(stats))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r4b((col("l_quantity") - col("q_mu")) / col("q_sigma")).as("qty_scaled"),
        r4b((col("l_extendedprice") - col("p_mu")) / col("p_sigma")).as("price_scaled"))
      .orderBy("l_orderkey", "l_linenumber", "qty_scaled", "price_scaled")
  }

  /** B6 — deterministic train/test split (modeling `train_test_split(...,
    * random_state=42)`): stable key-hash bucketing, not `rand()` — the same
    * row lands in the same split on every run and every engine. Knuth
    * multiplicative hash mod 100 < 80 → train.
    */
  def fTrainTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("split",
        when(pmod(col("o_orderkey") * lit(2654435761L), lit(100)) < 80, lit("train"))
          .otherwise(lit("test")))
      .groupBy("split")
      .agg(count(lit(1)).as("n_orders"),
        r4(sum(round(col("o_totalprice") * 100).cast("long")) / (lit(100.0) * count(lit(1)))).as("avg_price"))
      .orderBy("split")

  /** B7 — binary label (eda cell 27: `winning_team == home_team_id`):
    * label from a row-level predicate, cast to int.
    */
  def fBinaryLabel(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        (col("o_totalprice") > lit(150000.0)).cast("int").as("label"))
      .orderBy("o_orderkey")

  /** B8 — min-max normalization: same broadcast-stats pattern as B5. */
  def fMinmaxScale(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val stats = li.agg(
      min("l_extendedprice").as("p_min"), max("l_extendedprice").as("p_max"))
    li.crossJoin(broadcast(stats))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r4b((col("l_extendedprice") - col("p_min")) /
          (col("p_max") - col("p_min"))).as("price_norm"))
      .orderBy("l_orderkey", "l_linenumber", "price_norm")
  }

  /** B9 — quantile discretization into 4 buckets via ntile over a total
    * deterministic order. NOTE (100 TB): a global ntile single-partitions
    * the sort; at cluster scale the same result comes from broadcasting
    * approx-quantile cutpoints (`approxQuantile`) and bucketing
    * in-projection — kept as ntile here because the oracle needs exact
    * bucket boundaries.
    */
  def fQuantileBucket(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), ntile(4).over(w).as("price_bucket"))
      .orderBy("o_orderkey")
  }

  /** B10 — mean imputation of derived-null features (the at-scale
    * alternative to dropping rows, eda cell 24): tiny mean aggregate
    * broadcast back, `coalesce` in-projection.
    */
  def fImputeMean(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).withColumn("ratio", ratioCol)
    val m = li.agg(avg("ratio").as("ratio_mean"))
    li.crossJoin(broadcast(m))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r4b(coalesce(col("ratio"), col("ratio_mean"))).as("ratio_imputed"))
      .orderBy("l_orderkey", "l_linenumber", "ratio_imputed")
  }

  /** B11 — one-hot encoding of a low-cardinality categorical (the
    * sklearn-style dummy columns the reference's modeling feeds). Explicit
    * category list → static projection, no distinct-discovery scan; each
    * indicator is a codegen'd comparison, zero shuffles.
    */
  def fOneHot(spark: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val cols = segs.map(s =>
      (col("c_mktsegment") === s).cast("int").as(s"seg_${s.toLowerCase}"))
    Tables.customer(spark, dir)
      .select(col("c_custkey") +: cols: _*)
      .orderBy("c_custkey")
  }

  /** B12 — target (mean) encoding: replace a categorical with the mean of
    * the label within that category. The encoding table is |categories|
    * rows — a tiny aggregate broadcast back onto the facts, never a
    * window. Exact across engines: integer label sum / count is a single
    * double division.
    */
  def fTargetEncode(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = broadcast(Tables.customer(spark, dir))
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        (col("o_totalprice") > lit(150000.0)).cast("long").as("label"))
    val enc = joined.groupBy("c_mktsegment")
      .agg(r4b(sum("label") / count(lit(1))).as("seg_rate"))
    joined.join(broadcast(enc), "c_mktsegment")
      .select(col("o_orderkey"), col("c_mktsegment"), col("label"), col("seg_rate"))
      .orderBy("o_orderkey")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f_target_encode" -> (fTargetEncode _),
    "f_onehot" -> (fOneHot _),
    "f_null_safe_ratio" -> (fNullSafeRatio _),
    "f_comp_diff" -> (fCompDiff _),
    "f_drop_nulls" -> (fDropNulls _),
    "f_describe" -> (fDescribe _),
    "f_standard_scale" -> (fStandardScale _),
    "f_train_test_split" -> (fTrainTestSplit _),
    "f_binary_label" -> (fBinaryLabel _),
    "f_minmax_scale" -> (fMinmaxScale _),
    "f_quantile_bucket" -> (fQuantileBucket _),
    "f_impute_mean" -> (fImputeMean _))

  val oracles: Map[String, String] = Map(
    "f_target_encode" ->
      """WITH j AS (
        | SELECT o_orderkey, c_mktsegment,
        |  CAST(o_totalprice > 150000.0 AS BIGINT) AS label
        | FROM orders JOIN customer ON o_custkey = c_custkey),
        |enc AS (
        | SELECT c_mktsegment,
        |  floor((sum(label)::DOUBLE / count(*)) * 10000 + 0.5) / 10000 AS seg_rate
        | FROM j GROUP BY 1)
        |SELECT j.o_orderkey, j.c_mktsegment, j.label, enc.seg_rate
        |FROM j JOIN enc USING (c_mktsegment) ORDER BY o_orderkey""".stripMargin,
    "f_onehot" ->
      """SELECT c_custkey,
        | CAST(c_mktsegment = 'AUTOMOBILE' AS INTEGER) AS seg_automobile,
        | CAST(c_mktsegment = 'BUILDING' AS INTEGER) AS seg_building,
        | CAST(c_mktsegment = 'FURNITURE' AS INTEGER) AS seg_furniture,
        | CAST(c_mktsegment = 'HOUSEHOLD' AS INTEGER) AS seg_household,
        | CAST(c_mktsegment = 'MACHINERY' AS INTEGER) AS seg_machinery
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f_null_safe_ratio" ->
      """SELECT l_orderkey, l_linenumber,
        | floor((CASE WHEN l_discount = 0 THEN NULL ELSE l_quantity / l_discount END) * 10000 + 0.5) / 10000
        |   AS qty_disc_ratio
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, qty_disc_ratio""".stripMargin,
    "f_comp_diff" ->
      """WITH sup AS (SELECT l_suppkey,
        |             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / (100.0 * count(*)) AS supp_avg_price
        |             FROM lineitem GROUP BY 1),
        |     prt AS (SELECT l_partkey,
        |             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / (100.0 * count(*)) AS part_avg_price
        |             FROM lineitem GROUP BY 1)
        |SELECT l_orderkey, l_linenumber,
        | floor((supp_avg_price - part_avg_price) * 10000 + 0.5) / 10000 AS supp_part_diff,
        | floor((l_extendedprice - supp_avg_price) * 10000 + 0.5) / 10000 AS price_vs_supp
        |FROM lineitem JOIN sup USING (l_suppkey) JOIN prt USING (l_partkey)
        |ORDER BY l_orderkey, l_linenumber, supp_part_diff, price_vs_supp""".stripMargin,
    "f_drop_nulls" ->
      """SELECT l_orderkey, l_linenumber,
        | floor((l_quantity / l_discount) * 10000 + 0.5) / 10000 AS qty_disc_ratio
        |FROM lineitem WHERE l_discount <> 0
        |ORDER BY l_orderkey, l_linenumber, qty_disc_ratio""".stripMargin,
    "f_describe" ->
      """SELECT * FROM (
        | SELECT 'l_quantity' AS col_name, count(*) AS n,
        |  round(avg(l_quantity),4) AS mean, round(stddev_samp(l_quantity),4) AS std,
        |  round(min(l_quantity),4) AS min_val, round(max(l_quantity),4) AS max_val
        | FROM lineitem
        | UNION ALL
        | SELECT 'l_extendedprice', count(*), round(avg(l_extendedprice),4),
        |  round(stddev_samp(l_extendedprice),4), round(min(l_extendedprice),4),
        |  round(max(l_extendedprice),4) FROM lineitem
        | UNION ALL
        | SELECT 'l_discount', count(*), round(avg(l_discount),4),
        |  round(stddev_samp(l_discount),4), round(min(l_discount),4),
        |  round(max(l_discount),4) FROM lineitem
        |) ORDER BY col_name""".stripMargin,
    "f_standard_scale" ->
      """SELECT l_orderkey, l_linenumber,
        | floor(((l_quantity - q_mu) / q_sigma) * 10000 + 0.5) / 10000 AS qty_scaled,
        | floor(((l_extendedprice - p_mu) / p_sigma) * 10000 + 0.5) / 10000 AS price_scaled
        |FROM lineitem CROSS JOIN (
        | SELECT
        |  sum(cq)::DOUBLE / (1.0 * count(*)) AS q_mu,
        |  sqrt((sum(cq*cq) * count(*) - sum(cq) * sum(cq))::DOUBLE)
        |    / (1.0 * sqrt(count(*)::DOUBLE * (count(*) - 1))) AS q_sigma,
        |  sum(cp)::DOUBLE / (100.0 * count(*)) AS p_mu,
        |  sqrt((sum(cp*cp) * count(*) - sum(cp) * sum(cp))::DOUBLE)
        |    / (100.0 * sqrt(count(*)::DOUBLE * (count(*) - 1))) AS p_sigma
        | FROM (SELECT CAST(round(l_quantity) AS BIGINT) AS cq,
        |              CAST(round(l_extendedprice * 100) AS BIGINT) AS cp
        |       FROM lineitem))
        |ORDER BY l_orderkey, l_linenumber, qty_scaled, price_scaled""".stripMargin,
    "f_train_test_split" ->
      """SELECT split, count(*) AS n_orders,
        | round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / (100.0 * count(*)), 4) AS avg_price
        |FROM (SELECT o_totalprice,
        |  CASE WHEN (o_orderkey * 2654435761) % 100 < 80 THEN 'train' ELSE 'test' END AS split
        | FROM orders)
        |GROUP BY split ORDER BY split""".stripMargin,
    "f_binary_label" ->
      """SELECT o_orderkey, CAST(o_totalprice > 150000.0 AS INTEGER) AS label
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f_minmax_scale" ->
      """SELECT l_orderkey, l_linenumber,
        | floor(((l_extendedprice - p_min) / (p_max - p_min)) * 10000 + 0.5) / 10000 AS price_norm
        |FROM lineitem CROSS JOIN (
        | SELECT min(l_extendedprice) AS p_min, max(l_extendedprice) AS p_max FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, price_norm""".stripMargin,
    "f_quantile_bucket" ->
      """SELECT o_orderkey,
        | ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS price_bucket
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f_impute_mean" ->
      """SELECT l_orderkey, l_linenumber,
        | floor((coalesce(CASE WHEN l_discount = 0 THEN NULL
        |                     ELSE l_quantity / l_discount END, ratio_mean)) * 10000 + 0.5) / 10000 AS ratio_imputed
        |FROM lineitem CROSS JOIN (
        | SELECT avg(CASE WHEN l_discount = 0 THEN NULL
        |                 ELSE l_quantity / l_discount END) AS ratio_mean FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, ratio_imputed""".stripMargin)
}
