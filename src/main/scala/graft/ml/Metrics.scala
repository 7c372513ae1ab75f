package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Evaluation metrics — SURVEY.md §2.C6/C7.
  *
  * The reference computes accuracy/precision/recall/F1/ROC-AUC per model
  * (modeling.ipynb cell 12). Here both are exact single-pass aggregates
  * over a deterministic predictor (pred = o_totalprice > 150k, truth =
  * priority is urgent/high) so DuckDB can replay them bit-for-bit.
  */
object Metrics {

  private[graft] def labeled(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      col("o_totalprice").as("score"),
      (col("o_totalprice") > lit(150000.0)).cast("int").as("pred"),
      (col("o_orderpriority") < lit("3")).cast("int").as("truth"))

  /** C6 — confusion matrix + accuracy/precision/recall/F1 as ONE
    * aggregation pass (conditional count aggregates; no per-metric
    * rescan).
    */
  def mlEvalMetrics(spark: SparkSession, dir: String): DataFrame =
    labeled(spark, dir)
      .agg(
        count(when(col("pred") === 1 && col("truth") === 1, 1)).as("tp"),
        count(when(col("pred") === 1 && col("truth") === 0, 1)).as("fp"),
        count(when(col("pred") === 0 && col("truth") === 1, 1)).as("fn"),
        count(when(col("pred") === 0 && col("truth") === 0, 1)).as("tn"))
      .select(
        col("tp"), col("fp"), col("fn"), col("tn"),
        round((col("tp") + col("tn")) / (col("tp") + col("fp") + col("fn") + col("tn")), 4).as("accuracy"),
        round(col("tp") / (col("tp") + col("fp")), 4).as("precision_"),
        round(col("tp") / (col("tp") + col("fn")), 4).as("recall_"),
        round(lit(2.0) * col("tp") / (lit(2.0) * col("tp") + col("fp") + col("fn")), 4).as("f1"))

  /** C7 — ROC-AUC via the Mann-Whitney rank statistic:
    * AUC = (Σ rank(positives) − P(P+1)/2) / (P·N), ranks from a
    * deterministic total order (score, key). One sort + one aggregate —
    * no threshold sweep.
    */
  def mlRocAuc(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("score"), col("o_orderkey"))
    labeled(spark, dir)
      .withColumn("rank", row_number().over(w))
      .agg(
        sum(when(col("truth") === 1, col("rank"))).as("pos_rank_sum"),
        count(when(col("truth") === 1, 1)).as("p"),
        count(when(col("truth") === 0, 1)).as("n"))
      .select(col("p"), col("n"),
        round((col("pos_rank_sum") - col("p") * (col("p") + 1) / 2).cast("double") /
          (col("p") * col("n")), 4).as("auc"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_eval_metrics" -> (mlEvalMetrics _),
    "ml_roc_auc" -> (mlRocAuc _))

  val oracles: Map[String, String] = Map(
    "ml_eval_metrics" ->
      """WITH l AS (
        |  SELECT CAST(o_totalprice > 150000.0 AS INT) AS pred,
        |         CAST(o_orderpriority < '3' AS INT) AS truth
        |  FROM orders),
        |cm AS (
        |  SELECT count(CASE WHEN pred = 1 AND truth = 1 THEN 1 END) AS tp,
        |         count(CASE WHEN pred = 1 AND truth = 0 THEN 1 END) AS fp,
        |         count(CASE WHEN pred = 0 AND truth = 1 THEN 1 END) AS fn,
        |         count(CASE WHEN pred = 0 AND truth = 0 THEN 1 END) AS tn
        |  FROM l)
        |SELECT tp, fp, fn, tn,
        | round((tp + tn) / CAST(tp + fp + fn + tn AS DOUBLE), 4) AS accuracy,
        | round(tp / CAST(tp + fp AS DOUBLE), 4) AS precision_,
        | round(tp / CAST(tp + fn AS DOUBLE), 4) AS recall_,
        | round(2.0 * tp / CAST(2 * tp + fp + fn AS DOUBLE), 4) AS f1
        |FROM cm""".stripMargin,
    "ml_roc_auc" ->
      """WITH l AS (
        |  SELECT o_orderkey, o_totalprice AS score,
        |         CAST(o_orderpriority < '3' AS INT) AS truth
        |  FROM orders),
        |r AS (
        |  SELECT truth, row_number() OVER (ORDER BY score, o_orderkey) AS rank
        |  FROM l)
        |SELECT p, n,
        | round(CAST(pos_rank_sum - p * (p + 1) / 2 AS DOUBLE) / (p * n), 4) AS auc
        |FROM (
        |  SELECT sum(CASE WHEN truth = 1 THEN rank END) AS pos_rank_sum,
        |         count(CASE WHEN truth = 1 THEN 1 END) AS p,
        |         count(CASE WHEN truth = 0 THEN 1 END) AS n
        |  FROM r)""".stripMargin)
}
