package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Feature-engineering extensions (round 3, wave 2) — SURVEY.md §2.B
  * (B16-B17).
  *
  * Winsorization (outlier clipping to per-group percentile fences — the
  * clip-don't-drop alternative to eda.ipynb's dropna, cell 15/24) and
  * multiplicative interaction features (the product form of eda cell 20's
  * derived `k_bb_ratio`; reference: modeling.ipynb feeds raw stat columns,
  * interactions are the standard widening).
  */
object Features3 {

  /** B16 — winsorize: clip `value` into [p05, p95] per event_type.
    * Percentiles are EXACT DISCRETE values at integer rank
    * (n·p + 99) div 100 (A21/B13's rank arithmetic) so every output is a
    * RAW input double — zero float drift, no rounding needed. One window
    * shuffle for the ranks + a 5-row broadcast back onto the facts; the
    * 100 TB path swaps the exact window for approx_percentile fences.
    */
  def fWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("event_type", "event_id", "value")
    val wOrd = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val wAll = Window.partitionBy("event_type")
    val fences = e.withColumn("r", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy("event_type")
      .agg(
        max(when(col("r") === expr("(n * 5 + 99) div 100"), col("value"))).as("p05"),
        max(when(col("r") === expr("(n * 95 + 99) div 100"), col("value"))).as("p95"))
    e.join(broadcast(fences), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        least(greatest(col("value"), col("p05")), col("p95")).as("value_w"))
      .orderBy("event_id")
  }

  /** B17 — interaction features: per-row products over lineitem (net and
    * gross revenue, quantity×discount). A pure projection — shuffle-free,
    * whole-stage-codegen'd, the parquet scan reads only the 7 referenced
    * columns. Each output is a FIXED left-associated IEEE op sequence, so
    * Spark and DuckDB produce identical bits before the r4b round.
    */
  def fInteraction(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        OracleRound.r4b(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        OracleRound.r4b(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("gross_price"),
        OracleRound.r4b(col("l_quantity") * col("l_discount")).as("qty_disc"))
      .orderBy("l_orderkey", "l_linenumber")

  /** B18 — feature hashing (the hashing trick): each categorical maps to
    * a bucket in [0,64) via the native codegen [[graft.functions.RollHash64]]
    * over "name=value" (bit 6 gives the ±1 collision-cancelling sign).
    * No vocabulary pass, no fit state, fixed output width — THE encoder
    * for high-cardinality categoricals at 100 TB (vs B11's explicit
    * one-hot list). Pure shuffle-free projection; DuckDB replays the
    * polynomial in HUGEINT (divisors 64/2 divide 2⁶⁴, so signed pmod ==
    * unsigned mod).
    */
  def fHashedFeatures(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps.rollhash64
    def hf(name: String, c: org.apache.spark.sql.Column) = {
      val h = rollhash64(concat(lit(name + "="), c))
      Seq(pmod(h, lit(64L)).as(s"b_$name"),
        (shiftrightunsigned(h, 6).bitwiseAND(lit(1L)) * 2 - 1).as(s"s_$name"))
    }
    Tables.orders(spark, dir)
      .select(col("o_orderkey") +:
        (hf("pri", col("o_orderpriority")) ++
         hf("st", col("o_orderstatus")) ++
         hf("cust", col("o_custkey").cast("string"))): _*)
      .orderBy("o_orderkey")
  }

  /** B19 — deterministic k-fold assignment: fold = Knuth-multiplicative
    * key hash mod 5 (B6's split arithmetic generalized from 80/20 to k
    * folds — reproducible with no RNG state, stable under reruns and
    * repartitions). Output is the per-fold class profile a CV driver
    * consumes; the fold column itself is a shuffle-free projection.
    */
  /** B23 — `f_target_encode_oof`: LEAKAGE-SAFE target encoding — the
    * out-of-fold variant of B12 every careful ML pipeline uses: a row's
    * segment rate is computed from the OTHER folds only (B19's
    * deterministic fold assignment), so no row's own label leaks into
    * its feature. The returned frame IS the encoder: per (segment,
    * fold), the in-fold rate (for leak comparison) and the
    * rate-excluding-this-fold a row in that cell would receive —
    * (seg_total − cell) / (seg_n − cell_n), all integer sums until the
    * final quantized ratio.
    *
    * Scale shape: one fact aggregate to the (segments × folds) cell
    * table, one re-aggregate of that TINY table, one broadcast join
    * between the two — the encoder never touches fact-table cardinality
    * after the first combine.
    */
  def fTargetEncodeOof(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = broadcast(Tables.customer(spark, dir))
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_mktsegment"),
        pmod(col("o_orderkey") * lit(2654435761L), lit(k.toLong)).as("fold"),
        (col("o_totalprice") > lit(150000.0)).cast("long").as("label"))
    val cell = joined.groupBy("c_mktsegment", "fold")
      .agg(count(lit(1)).as("n"), sum("label").as("pos"))
    val seg = cell.groupBy("c_mktsegment")
      .agg(sum("n").as("seg_n"), sum("pos").as("seg_pos"))
    cell.join(broadcast(seg), "c_mktsegment")
      .select(col("c_mktsegment"), col("fold"), col("n"),
        OracleRound.r4b(col("pos").cast("double") / col("n")).as("in_fold_rate"),
        // degenerate-fold guard: a segment entirely inside one fold has
        // seg_n = n and no out-of-fold rows — NULL in both engines
        // (Spark returns NULL for x/0 but DuckDB returns inf, so the
        // zero divisor must be nulled explicitly on both sides)
        OracleRound.r4b((col("seg_pos") - col("pos")).cast("double") /
          nullif(col("seg_n") - col("n"), lit(0))).as("oof_rate"))
      .orderBy("c_mktsegment", "fold")
  }

  def fCvFolds(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables.orders(spark, dir)
      .select(
        pmod(col("o_orderkey") * lit(2654435761L), lit(k.toLong)).as("fold"),
        (col("o_orderpriority") < lit("3")).cast("int").as("label"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n"), sum("label").as("n_pos"),
        OracleRound.r4b(sum("label").cast("double") / count(lit(1)).cast("double")).as("pos_rate"))
      .orderBy("fold")

  /** B20 — point-in-time lag features per entity: previous two event
    * values and the running mean of all STRICTLY PRIOR values. This is
    * the reference's core feature semantic — "stats going into the game"
    * (function.py pulls season-to-date pitcher stats as of the morning
    * of each game) — packaged as a reusable per-key windowed feature op:
    * no row ever sees its own value in its features, so there is no
    * label/feature leakage by construction.
    *
    * One shuffle on user_id; the running mean accumulates QUANTIZED
    * integer ticks (round(value·10⁴) as long) so the growing-frame sum
    * is order-independent and exact on both engines — a double running
    * sum would drift between Spark's incremental frame evaluation and
    * DuckDB's segment tree.
    */
  def fLagFeatures(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        col("value"), round(col("value") * 10000).cast("long").as("vq"))
      .withColumn("lag1", lag("value", 1).over(w))
      .withColumn("lag2", lag("value", 2).over(w))
      .withColumn("prior_n", count(col("vq")).over(prior))
      .withColumn("prior_sum_q", sum(col("vq")).over(prior))
      .select(col("event_id"), col("user_id"), col("value"),
        col("lag1"), col("lag2"),
        OracleRound.r4b(col("value") - col("lag1")).as("delta1"),
        col("prior_n"),
        when(col("prior_n") > 0,
          OracleRound.r4b(col("prior_sum_q").cast("double") /
            (lit(10000.0) * col("prior_n")))).as("prior_avg"))
      .orderBy("event_id")
  }

  /** B21 — embedding L2 norms: the vector hygiene check every embedding
    * pipeline runs before cosine math (zero vectors poison similarity;
    * norm drift flags a bad encoder batch). Per-row work only — the dot
    * is a sequential fold, sqrt is IEEE-correctly-rounded, both
    * portable; zero shuffles at any scale.
    */
  def fEmbeddingNorm(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps.{asDouble, dot}
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .select(col("vec_id"), size(col("emb")).as("dim"),
        OracleRound.r4b(sqrt(dot(col("emb"), col("emb")))).as("l2_norm"))
      .orderBy("vec_id")
  }

  /** B22 — cyclical (sin/cos) encoding of calendar features: day-of-week
    * and month mapped onto the unit circle so "Sunday is next to
    * Saturday" and "December is next to January" survive into the
    * feature space (a linear dow/month column breaks both wrap-arounds).
    * Shuffle-free projection; the trig arguments are 19 distinct exact
    * rationals of 2π, the outputs round via OracleRound on both engines.
    */
  def fCyclicalEncode(spark: SparkSession, dir: String): DataFrame = {
    val twoPi = lit(2.0 * math.Pi)
    val dow = (dayofweek(col("o_orderdate")) - 1).cast("double")
    val month0 = (month(col("o_orderdate")) - 1).cast("double")
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        dow.cast("int").as("dow"),
        OracleRound.r4b(sin(twoPi * dow / 7.0)).as("dow_sin"),
        OracleRound.r4b(cos(twoPi * dow / 7.0)).as("dow_cos"),
        (month0 + 1).cast("int").as("month_"),
        OracleRound.r4b(sin(twoPi * month0 / 12.0)).as("month_sin"),
        OracleRound.r4b(cos(twoPi * month0 / 12.0)).as("month_cos"))
      .orderBy("o_orderkey")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f_winsorize" -> (fWinsorize _),
    "f_interaction" -> (fInteraction _),
    "f_hashed_features" -> (fHashedFeatures _),
    "f_cv_folds" -> ((s, d) => fCvFolds(s, d)),
    "f_target_encode_oof" -> ((s, d) => fTargetEncodeOof(s, d)),
    "f_lag_features" -> (fLagFeatures _),
    "f_embedding_norm" -> (fEmbeddingNorm _),
    "f_cyclical_encode" -> (fCyclicalEncode _))

  val oracles: Map[String, String] = Map(
    // B12's join + B19's fold arithmetic; OOF = (seg − cell) / (n − n_cell)
    "f_target_encode_oof" ->
      """WITH j AS (
        | SELECT c_mktsegment,
        |  (o_orderkey * 2654435761) % 5 AS fold,
        |  CAST(o_totalprice > 150000.0 AS BIGINT) AS label
        | FROM orders JOIN customer ON o_custkey = c_custkey),
        |cell AS (
        | SELECT c_mktsegment, fold, count(*) AS n, sum(label) AS pos
        | FROM j GROUP BY 1, 2),
        |seg AS (
        | SELECT c_mktsegment, sum(n) AS seg_n, sum(pos) AS seg_pos
        | FROM cell GROUP BY 1)
        |SELECT cell.c_mktsegment, CAST(fold AS BIGINT) AS fold,
        |  CAST(n AS BIGINT) AS n,
        |  floor((CAST(pos AS DOUBLE) / n) * 10000 + 0.5) / 10000 AS in_fold_rate,
        |  floor((CAST(seg_pos - pos AS DOUBLE) / nullif(seg_n - n, 0)) * 10000 + 0.5) / 10000 AS oof_rate
        |FROM cell JOIN seg USING (c_mktsegment)
        |ORDER BY 1, 2""".stripMargin,
    "f_winsorize" ->
      """WITH ranked AS (
        | SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS r,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events),
        |fences AS (
        | SELECT event_type,
        |  max(CASE WHEN r = (n * 5 + 99) // 100 THEN value END) AS p05,
        |  max(CASE WHEN r = (n * 95 + 99) // 100 THEN value END) AS p95
        | FROM ranked GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        | least(greatest(e.value, f.p05), f.p95) AS value_w
        |FROM events e JOIN fences f USING (event_type)
        |ORDER BY e.event_id""".stripMargin,
    "f_interaction" ->
      s"""SELECT l_orderkey, l_linenumber,
        | ${OracleRound.sql4("l_extendedprice * (1.0 - l_discount)")} AS net_price,
        | ${OracleRound.sql4("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS gross_price,
        | ${OracleRound.sql4("l_quantity * l_discount")} AS qty_disc
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f_hashed_features" -> {
      def hf(name: String, c: String): String = {
        val h = Dedup.rollSql(s"('$name=' || $c)")
        s"CAST($h % 64 AS BIGINT) AS b_$name,\n CAST(($h // 64) % 2 AS BIGINT) * 2 - 1 AS s_$name"
      }
      s"""SELECT o_orderkey,
        | ${hf("pri", "o_orderpriority")},
        | ${hf("st", "o_orderstatus")},
        | ${hf("cust", "CAST(o_custkey AS VARCHAR)")}
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
    },
    "f_cv_folds" ->
      s"""SELECT (o_orderkey * 2654435761) % 5 AS fold,
        | count(*) AS n,
        | CAST(sum(CAST(o_orderpriority < '3' AS INT)) AS BIGINT) AS n_pos,
        | ${OracleRound.sql4("CAST(sum(CAST(o_orderpriority < '3' AS INT)) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS pos_rate
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // Spark dayofweek is 1..7 Sunday-first; DuckDB dayofweek is 0..6
    // Sunday-first — so Spark's (dayofweek-1) equals DuckDB's directly.
    // 2π is interpolated as one shortest-repr double literal so both
    // engines parse the identical value.
    "f_cyclical_encode" -> {
      val twoPi = (2.0 * math.Pi).toString
      s"""SELECT o_orderkey,
         |  CAST(dayofweek(o_orderdate) AS INT) AS dow,
         |  ${OracleRound.sql4(s"sin($twoPi * CAST(dayofweek(o_orderdate) AS DOUBLE) / 7.0)")} AS dow_sin,
         |  ${OracleRound.sql4(s"cos($twoPi * CAST(dayofweek(o_orderdate) AS DOUBLE) / 7.0)")} AS dow_cos,
         |  CAST(month(o_orderdate) AS INT) AS month_,
         |  ${OracleRound.sql4(s"sin($twoPi * CAST(month(o_orderdate) - 1 AS DOUBLE) / 12.0)")} AS month_sin,
         |  ${OracleRound.sql4(s"cos($twoPi * CAST(month(o_orderdate) - 1 AS DOUBLE) / 12.0)")} AS month_cos
         |FROM orders ORDER BY o_orderkey""".stripMargin
    },
    "f_embedding_norm" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        |  floor(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * 10000 + 0.5) / 10000 AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "f_lag_features" ->
      s"""WITH e AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us, value,
        |  CAST(round(value * 10000) AS BIGINT) AS vq
        | FROM events),
        |w AS (
        | SELECT event_id, user_id, value,
        |  lag(value, 1) OVER win AS lag1,
        |  lag(value, 2) OVER win AS lag2,
        |  count(vq) OVER (win ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_n,
        |  sum(vq) OVER (win ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_sum_q
        | FROM e
        | WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT event_id, user_id, value, lag1, lag2,
        | ${OracleRound.sql4("value - lag1")} AS delta1,
        | CAST(prior_n AS BIGINT) AS prior_n,
        | CASE WHEN prior_n > 0 THEN
        |  ${OracleRound.sql4("CAST(prior_sum_q AS DOUBLE) / (10000.0 * prior_n)")}
        | END AS prior_avg
        |FROM w ORDER BY event_id""".stripMargin)
}
