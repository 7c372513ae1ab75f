package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Exact distributed global ranking — the 100 TB replacement for a
  * single-partition `Window.orderBy(...)` (Spark's "No Partition Defined
  * for Window operation" path, which funnels the whole table through one
  * task).
  *
  * Plan shape: range-repartition on the sort key so each task owns one
  * contiguous ordered slice, rank locally inside slices, then add each
  * slice's cumulative row offset — a ≤`shuffle.partitions`-row aggregate
  * collected to the driver and broadcast back (bounded, unlike the
  * data). The result is bit-identical to the global-window
  * `row_number()`: the contract queries below share their oracle SQL
  * with the window formulations verbatim, so the driver hash-verifies
  * the equivalence, while the sort runs at full cluster parallelism.
  * Slice boundaries don't affect the output — local rank + offset is the
  * global rank wherever the range sampler draws the cuts.
  */
object DistRank {

  /** The leading sort column must be numeric (every caller ranks on a
    * score or a price). Slice boundaries are sampled ONCE
    * (approx-quantile sketch over the leading key, O(slices) doubles
    * collected) and inlined as LITERALS, so the slice id is a pure
    * deterministic function of the row: the sizes pass and the rank pass
    * can each re-scan the input freely — nothing is cached, nothing
    * drifts (RangePartitioner, by contrast, resamples boundaries per
    * instantiation, which forced the previous implementation to pin the
    * whole ranked input in the block-manager cache). Boundary QUALITY
    * only affects balance, never correctness: slice assignment is
    * monotone in the sort key, and local rank + slice offset equals the
    * global rank wherever the cuts land. NaN and null keys are mapped to
    * the slice end their window sort order puts them at (Spark: NaN is
    * the largest value; nulls first under asc, last under desc), so
    * dirty keys degrade to skew, never to corrupt ranks. Per-row cost is
    * O(log slices): the bucket lookup is a generated binary-search
    * `when` tree, the offset an O(1) array index.
    */
  /** Slice the input on literal quantile bounds of the leading sort key:
    * returns the frame with a `_slice` column plus the slice count.
    * Shared by [[withGlobalRank]] and [[withRunningSums]].
    */
  private def sliceByKey(df: DataFrame, sortCols: Seq[Column]): (DataFrame, Int) = {
    val spark = df.sparkSession
    val slices = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // ascending-monotone image of the leading sort key. For desc the key
    // negates, but NaN and null don't flip under negation: NaN (sorted
    // FIRST under desc) maps to -inf, null (sorted LAST under desc) to
    // +inf. Under asc the raw double already agrees with the sort order
    // (null -> slice 0 via null-comparison semantics, NaN -> last).
    val lead = org.apache.spark.sql.GraftColumnBridge.sortOrder(sortCols.head) match {
      case Some((_, _, false)) =>
        // asc_nulls_last / desc_nulls_first would route nulls to the
        // WRONG end of the keyspace and silently corrupt every rank in
        // the boundary slice — refuse loudly instead
        throw new IllegalArgumentException(
          "DistRank supports only the default null ordering " +
            "(NULLS FIRST under asc, NULLS LAST under desc)")
      case Some((key, true, _)) =>
        val kd = key.cast("double")
        when(key.isNull, lit(Double.PositiveInfinity))
          .when(isnan(kd), lit(Double.NegativeInfinity))
          .otherwise(negate(kd))
      case Some((key, false, _)) => key.cast("double")
      case None => sortCols.head.cast("double")
    }
    val keyed = df.withColumn("_k", lead)
    val probs = (1 until slices).map(_.toDouble / slices).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else keyed.stat.approxQuantile("_k", probs, 0.01).distinct.sorted
    // binary-search `when` tree over the sorted bounds: log(slices)
    // comparisons per row (a linear fold would pay O(slices) per row on
    // the full-table hot path — RangePartitioner binary-searches too)
    def bucket(lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(col("_k") > lit(bounds(mid)), bucket(mid + 1, hi))
          .otherwise(bucket(lo, mid))
      }
    val sliceCol =
      if (bounds.isEmpty) lit(0)
      // null _k never exceeds a bound -> every comparison is null/false
      // -> slice 0, matching asc NULLS FIRST (desc nulls were remapped)
      else bucket(0, bounds.length)
    (keyed.withColumn("_slice", sliceCol), bounds.length + 1)
  }

  def withGlobalRank(df: DataFrame, rankName: String, sortCols: Column*): DataFrame = {
    val (sliced, nSlices) = sliceByKey(df, sortCols)
    val local = sliced.withColumn("_lrank",
      row_number().over(Window.partitionBy("_slice").orderBy(sortCols: _*)))
    // cache-free sizes pass: a cheap re-aggregation over the same pure
    // slice assignment; ≤slices rows collected
    val sizes = sliced.groupBy("_slice").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val offsets = (0 until nSlices).scanLeft(0L)(
      (acc, s) => acc + sizes.getOrElse(s, 0L))
    val offArr = array((0 until nSlices).map(s => lit(offsets(s))): _*)
    local.withColumn(rankName,
        element_at(offArr, col("_slice") + 1) + col("_lrank"))
      .drop("_k", "_slice", "_lrank")
  }

  /** Distributed RUNNING SUMS — withGlobalRank generalized from
    * row_number to arbitrary cumulative integer sums: each value column
    * gets a per-slice running sum at full parallelism plus its slice's
    * literal offset (per-slice totals collected once, O(slices) longs).
    * Bit-identical to `sum(v).over(Window.orderBy(sortCols))` when the
    * sort is unique, while never funnelling the table through one task —
    * the cumulative-metric primitive (CDFs, precision@k, reach curves)
    * at 100 TB. Values must be integer-typed (exact, order-independent).
    */
  def withRunningSums(df: DataFrame, values: Seq[(Column, String)],
                      sortCols: Column*): DataFrame =
    withRunningSumsAndTotals(df, values, sortCols: _*)._1

  /** [[withRunningSums]] plus each value's GRAND TOTAL, which the
    * machinery already collected as the sum of the per-slice totals —
    * callers needing totals (CDF normalizers) get them as free driver
    * literals instead of paying another full-table aggregate scan.
    */
  def withRunningSumsAndTotals(df: DataFrame, values: Seq[(Column, String)],
                               sortCols: Column*): (DataFrame, Seq[Long]) = {
    val (sliced, nSlices) = sliceByKey(df, sortCols)
    val w = Window.partitionBy("_slice").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = values.zipWithIndex.foldLeft(sliced) {
      case (d, ((v, _), i)) => d.withColumn(s"_ls_$i", sum(v).over(w))
    }
    // one aggregate pass collects every value's per-slice total
    val totAggs = values.zipWithIndex.map { case ((v, _), i) => sum(v).as(s"_t_$i") }
    val totDf = sliced.groupBy("_slice").agg(totAggs.head, totAggs.tail: _*)
    // the offsets below do exact long arithmetic — fail with a clear
    // message on a non-integer value column instead of a deep cast error
    totDf.schema.fields.drop(1).foreach { f =>
      require(f.dataType == org.apache.spark.sql.types.LongType,
        s"withRunningSums needs integer-typed value columns; " +
          s"'${f.name}' summed to ${f.dataType.simpleString}")
    }
    val totals = totDf.collect()
      .map(r => r.getInt(0) -> values.indices.map(i =>
        if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)))
      .toMap
    val named = values.zipWithIndex.foldLeft(withLocal) { case (d, ((_, name), i)) =>
      val offs = (0 until nSlices).scanLeft(0L)(
        (acc, s) => acc + totals.get(s).map(_(i)).getOrElse(0L))
      val offArr = array((0 until nSlices).map(s => lit(offs(s))): _*)
      d.withColumn(name, element_at(offArr, col("_slice") + 1) + col(s"_ls_$i"))
    }
    val grand = values.indices.map(i =>
      totals.values.map(_(i)).sum)
    (named.drop(Seq("_k", "_slice") ++ values.indices.map(i => s"_ls_$i"): _*),
      grand)
  }

  /** C7b — ml_roc_auc through the distributed rank instead of the global
    * window; same Mann-Whitney aggregate, same oracle SQL as C7.
    */
  def mlRocAucDist(spark: SparkSession, dir: String): DataFrame =
    withGlobalRank(graft.ml.Metrics.labeled(spark, dir), "rank",
      col("score"), col("o_orderkey"))
      .agg(
        sum(when(col("truth") === 1, col("rank"))).as("pos_rank_sum"),
        count(when(col("truth") === 1, 1)).as("p"),
        count(when(col("truth") === 0, 1)).as("n"))
      .select(col("p"), col("n"),
        round((col("pos_rank_sum") - col("p") * (col("p") + 1) / 2).cast("double") /
          (col("p") * col("n")), 4).as("auc"))

  /** B9b — f_quantile_bucket through the distributed rank: ntile(4)
    * reconstructed from (global rank, N) with the same
    * first-buckets-get-the-remainder arithmetic; same oracle SQL as B9.
    */
  def fQuantileBucketDist(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    val n = o.agg(count(lit(1)).as("_n"))
    withGlobalRank(o, "_grank", col("o_totalprice"), col("o_orderkey"))
      .crossJoin(broadcast(n))
      .select(col("o_orderkey"),
        expr("""CASE WHEN _grank <= (_n % 4) * (_n div 4 + 1)
                THEN CAST((_grank - 1) div (_n div 4 + 1) + 1 AS INT)
                ELSE CAST((_n % 4) + (_grank - (_n % 4) * (_n div 4 + 1) - 1) div (_n div 4) + 1 AS INT)
                END""").as("price_bucket"))
      .orderBy("o_orderkey")
  }

  /** C18b — ml_ks_statistic through [[withRunningSums]] instead of the
    * global window: both CDFs accumulate per slice at full parallelism;
    * same tied-score collapse, same exact integer cross-product max,
    * same oracle SQL as C18.
    */
  def mlKsStatisticDist(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.ml.Metrics.labeled(spark, dir)
    // the grand totals come back with the running sums — already summed
    // from the collected per-slice totals, no extra full-table aggregate
    val (cum, totals) = withRunningSumsAndTotals(base,
      Seq((col("truth"), "cum_pos"), (lit(1) - col("truth"), "cum_neg")),
      col("score"), col("o_orderkey"))
    val (pTot, nTot) = (totals(0), totals(1))
    cum
      .groupBy("score")
      .agg(max("cum_pos").as("cum_pos"), max("cum_neg").as("cum_neg"))
      .select(
        abs(col("cum_pos") * lit(nTot) - col("cum_neg") * lit(pTot)).as("diff"))
      .agg(max(lit(pTot)).as("p"), max(lit(nTot)).as("n"),
        max(col("diff")).as("ks_num"))
      .select(col("p"), col("n"), col("ks_num"),
        OracleRound.r4b(col("ks_num").cast("double") / (col("p") * col("n"))).as("ks"))
  }

  /** C19b — ml_auc_pr through [[withRunningSums]]: rank and cumulative
    * positives from one sliced pass (k = running sum of 1 — identical to
    * row_number under the unique sort), then the same quantized-integer
    * precision sum; same oracle SQL as C19.
    */
  def mlAucPrDist(spark: SparkSession, dir: String): DataFrame =
    withRunningSums(graft.ml.Metrics.labeled(spark, dir),
        Seq((lit(1), "k"), (col("truth"), "cum_pos")),
        col("score").desc, col("o_orderkey"))
      .select(col("truth"),
        when(col("truth") === 1, expr("cum_pos * 1000000 div k"))
          .otherwise(lit(0L)).as("prec_q"))
      .agg(sum(col("truth")).as("p"),
        sum(lit(1) - col("truth")).as("n"),
        sum(col("prec_q")).as("ap_q"))
      .select(col("p"), col("n"),
        OracleRound.r4b(col("ap_q").cast("double") / (lit(1000000.0) * col("p"))).as("ap"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_roc_auc_dist" -> (mlRocAucDist _),
    "f_quantile_bucket_dist" -> (fQuantileBucketDist _),
    "ml_ks_statistic_dist" -> (mlKsStatisticDist _),
    "ml_auc_pr_dist" -> (mlAucPrDist _))

  /** Shared verbatim with the window formulations — the driver's hash
    * compare proves the distributed rank/running-sum is bit-identical.
    */
  val oracles: Map[String, String] = Map(
    "ml_roc_auc_dist" -> graft.ml.Metrics.oracles("ml_roc_auc"),
    "f_quantile_bucket_dist" -> Features.oracles("f_quantile_bucket"),
    "ml_ks_statistic_dist" -> graft.ml.Ml4.oracles("ml_ks_statistic"),
    "ml_auc_pr_dist" -> graft.ml.Ml4.oracles("ml_auc_pr"))
}
