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
  def withGlobalRank(df: DataFrame, rankName: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val slices = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // ascending-monotone image of the leading sort key. For desc the key
    // negates, but NaN and null don't flip under negation: NaN (sorted
    // FIRST under desc) maps to -inf, null (sorted LAST under desc) to
    // +inf. Under asc the raw double already agrees with the sort order
    // (null -> slice 0 via null-comparison semantics, NaN -> last).
    val lead = org.apache.spark.sql.GraftColumnBridge.sortOrder(sortCols.head) match {
      case Some((key, true)) =>
        val kd = key.cast("double")
        when(key.isNull, lit(Double.PositiveInfinity))
          .when(isnan(kd), lit(Double.NegativeInfinity))
          .otherwise(negate(kd))
      case Some((key, false)) => key.cast("double")
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
    val sliced = keyed.withColumn("_slice", sliceCol)
    val local = sliced.withColumn("_lrank",
      row_number().over(Window.partitionBy("_slice").orderBy(sortCols: _*)))
    // cache-free sizes pass: a cheap re-aggregation over the same pure
    // slice assignment; ≤slices rows collected
    val sizes = sliced.groupBy("_slice").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val offsets = (0 to bounds.length).scanLeft(0L)(
      (acc, s) => acc + sizes.getOrElse(s, 0L))
    val offArr = array((0 to bounds.length).map(s => lit(offsets(s))): _*)
    local.withColumn(rankName,
        element_at(offArr, col("_slice") + 1) + col("_lrank"))
      .drop("_k", "_slice", "_lrank")
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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_roc_auc_dist" -> (mlRocAucDist _),
    "f_quantile_bucket_dist" -> (fQuantileBucketDist _))

  /** Shared verbatim with the window formulations — the driver's hash
    * compare proves the distributed rank is bit-identical.
    */
  val oracles: Map[String, String] = Map(
    "ml_roc_auc_dist" -> graft.ml.Metrics.oracles("ml_roc_auc"),
    "f_quantile_bucket_dist" -> Features.oracles("f_quantile_bucket"))
}
