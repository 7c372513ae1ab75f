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

  def withGlobalRank(df: DataFrame, rankName: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val slices = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(slices, sortCols: _*)
      .withColumn("_slice", spark_partition_id())
      .persist()
    val local = ranged.withColumn("_lrank",
      row_number().over(Window.partitionBy("_slice").orderBy(sortCols: _*)))
    val sizes = ranged.groupBy("_slice").count().orderBy("_slice")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // The persist is CORRECTNESS-critical, not an optimization:
    // RangePartitioner samples its split boundaries per RDD
    // instantiation, so if `ranged` were recomputed for the caller's
    // final action it could draw DIFFERENT slice boundaries than the
    // sizes scan above — and the offsets would no longer match the local
    // ranks. The cache pins one materialization of the slicing for both
    // passes; it is bounded by the ranked input's size.
    val offsets = sizes.map(_._1).zip(sizes.map(_._2).scanLeft(0L)(_ + _))
    val result = local
      .join(broadcast(offsets.toSeq.toDF("_slice", "_off")), "_slice")
      .withColumn(rankName, col("_off") + col("_lrank"))
      .drop("_slice", "_lrank", "_off")
    result
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
