package graft.ml

import org.apache.spark.ml.classification.{GBTClassifier, LinearSVC, LogisticRegression}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._
import graft.tables.Tables

/** ML model bench — SURVEY.md §2.C.
  *
  * Re-expresses the reference's model bench (straslerj/mlb-win-predictor
  * `modeling/modeling.ipynb`: LogisticRegression, SVC, NearestCentroid,
  * KNN+grid-CV, boosted trees, per-feature-subset model selection) on
  * Spark: MLlib estimators where they exist, pure DataFrame plans where
  * the algorithm is expressible declaratively (NearestCentroid, KNN) —
  * those two get exact DuckDB SQL oracles.
  *
  * Scale: the training side of NC/KNN reduces to tiny broadcastable
  * aggregates (centroid table, probe set); the full×full cross join never
  * materializes. MLlib estimators train distributed via their own
  * treeAggregate paths.
  */
object Models {

  /** Embeddings with the float array widened to double once. */
  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("embedding"), col("label"))

  private def embFeatures(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("vec_id"), array_to_vector(col("embedding")).as("features"),
        col("label").cast("double").as("label"))

  /** Binary view: class label > 4 (10 balanced classes → balanced binary). */
  private def embBinary(spark: SparkSession, dir: String): DataFrame =
    embFeatures(spark, dir)
      .withColumn("label", (col("label") > 4.5).cast("double"))

  /** C3 — NearestCentroid (modeling cell 31-34) as a pure DataFrame plan:
    * per-class mean vector via `Summarizer.mean` (single-pass vector agg —
    * the 100 TB path; no 64× posexplode inflation), centroids broadcast
    * (|classes| rows), argmin squared distance per row. Deterministic
    * tie-break on class id. SQL oracle via DuckDB element indexing.
    */
  def mlNearestCentroid(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val centroids = embFeatures(spark, dir)
      .groupBy(col("label").cast("int").as("c_label"))
      .agg(Summarizer.mean(col("features")).as("centroid_vec"))
      .select(col("c_label"), vector_to_array(col("centroid_vec")).as("centroid"))
    val scored = e.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("c_label"),
        sqDist(col("embedding"), col("centroid")).as("dist"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist"), col("c_label"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_label").as("pred_label"))
      .orderBy("vec_id")
  }

  /** C4 — KNN classify (modeling cell 36-43): small probe set broadcast
    * against the full train side, per-probe top-k by squared L2 (monotonic
    * with L2 — no sqrt needed for ranking), majority vote with
    * deterministic tie-break (higher count, then smaller label).
    */
  def mlKnn(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = emb(spark, dir)
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("pid"), col("embedding").as("p_emb"))
    val train = e.filter(col("vec_id") % 50 =!= 0)
    val dists = train.crossJoin(broadcast(probes))
      .select(col("pid"), col("label"), col("vec_id").as("tid"),
        sqDist(col("p_emb"), col("embedding")).as("dist"))
    val wTop = Window.partitionBy("pid").orderBy(col("dist"), col("tid"))
    val votes = dists.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .groupBy("pid", "label").agg(count(lit(1)).as("n_votes"))
    val wVote = Window.partitionBy("pid").orderBy(col("n_votes").desc, col("label"))
    votes.withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("pid").as("vec_id"), col("label").as("pred_label"), col("n_votes"))
      .orderBy("vec_id")
  }

  /** C1 — LogisticRegression (modeling cell 20-23) via spark.ml.
    * Multinomial over the 10 classes; rows-only check (iterative fit is
    * not SQL-expressible).
    */
  def mlLogreg(spark: SparkSession, dir: String): DataFrame = {
    val data = embFeatures(spark, dir)
    val model = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setStandardization(true)
      .fit(data)
    model.transform(data)
      .select(col("vec_id"), col("label").cast("int").as("label"),
        col("prediction").cast("int").as("pred_label"))
      .orderBy("vec_id")
  }

  /** C2 — linear SVM (modeling cell 25-28) via spark.ml.LinearSVC on the
    * binarized label.
    */
  def mlLinearSvc(spark: SparkSession, dir: String): DataFrame = {
    val data = embBinary(spark, dir)
    val model = new LinearSVC().setMaxIter(30).setRegParam(0.01).fit(data)
    model.transform(data)
      .select(col("vec_id"), col("label").cast("int").as("label"),
        col("prediction").cast("int").as("pred_label"))
      .orderBy("vec_id")
  }

  /** C5 — boosted trees (modeling cell 45-48: HistGradientBoosting) via
    * spark.ml.GBTClassifier (binary).
    */
  def mlGbt(spark: SparkSession, dir: String): DataFrame = {
    val data = embBinary(spark, dir)
    val model = new GBTClassifier()
      .setMaxIter(10).setMaxDepth(3).setSeed(42L).fit(data)
    model.transform(data)
      .select(col("vec_id"), col("label").cast("int").as("label"),
        col("prediction").cast("int").as("pred_label"))
      .orderBy("vec_id")
  }

  /** C8 — grid-search cross-validation (modeling cell 37-41) via
    * `CrossValidator`: regParam grid × 3 folds, AUC metric. Output: one
    * row per grid point with its mean metric.
    */
  def mlCvGrid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val data = embBinary(spark, dir)
    val lr = new LogisticRegression().setMaxIter(25)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.0, 0.01, 0.1))
      .build()
    val cv = new CrossValidator()
      .setEstimator(lr)
      .setEvaluator(new BinaryClassificationEvaluator())
      .setEstimatorParamMaps(grid)
      .setNumFolds(3).setSeed(42L)
    val fitted = cv.fit(data)
    grid.zip(fitted.avgMetrics).toSeq
      .map { case (pm, m) => (pm.get(lr.regParam).get, math.round(m * 10000) / 10000.0) }
      .toDF("reg_param", "avg_auc")
      .orderBy("reg_param")
  }

  /** C9 — best-model-per-feature-subset (modeling cell 123-125: all /
    * old-school / modern subsets): train the same estimator on dimension
    * slices, report accuracy per subset with the winner ranked first.
    * The winner is PERSISTED — MLWritable artifact plus the
    * export_models.py metadata sidecar (metric, subset, params) — and
    * the `exported` column comes from the RELOADED sidecar, so the
    * round-trip is on the query path, not just in a spec.
    */
  def mlModelSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = emb(spark, dir)
      .withColumn("label", (col("label") > 4.5).cast("double"))
    val subsets = Seq(
      ("all_64", (c: org.apache.spark.sql.Column) => c),
      ("first_32", (c: org.apache.spark.sql.Column) => slice(c, 1, 32)),
      ("last_32", (c: org.apache.spark.sql.Column) => slice(c, 33, 32)))
    val rows = subsets.map { case (name, f) =>
      val data = base.select(
        array_to_vector(f(col("embedding"))).as("features"), col("label"))
      val model = new LogisticRegression().setMaxIter(25).setRegParam(0.01).fit(data)
      val pred = model.transform(data)
      val acc = pred.filter(col("prediction") === col("label")).count().toDouble /
        pred.count()
      (name, math.round(acc * 10000) / 10000.0, model)
    }
    val (bestName, bestAcc, bestModel) =
      rows.minBy { case (name, acc, _) => (-acc, name) }
    val path = graft.Scratch.dir("best_model") + "/model"
    Persistence.saveLogreg(bestModel, path)
    Persistence.saveMeta(spark, path, bestName, bestAcc, Map(
      "estimator" -> "LogisticRegression",
      "maxIter" -> bestModel.getMaxIter.toString,
      "regParam" -> bestModel.getRegParam.toString))
    val exported = Persistence.loadMeta(spark, path)
      .select(col("subset"), lit(true).as("exported"))
    rows.map { case (name, acc, _) => (name, acc) }.toDF("subset", "accuracy")
      .join(exported, Seq("subset"), "left")
      .na.fill(false, Seq("exported"))
      .orderBy(col("accuracy").desc, col("subset"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_nearest_centroid" -> ((s, d) => mlNearestCentroid(s, d)),
    "ml_knn" -> ((s, d) => mlKnn(s, d)),
    "ml_logreg" -> (mlLogreg _),
    "ml_linear_svc" -> (mlLinearSvc _),
    "ml_gbt" -> (mlGbt _),
    "ml_cv_grid" -> (mlCvGrid _),
    "ml_model_select" -> (mlModelSelect _))

  val oracles: Map[String, String] = Map(
    "ml_nearest_centroid" ->
      """WITH cent AS (
        |  SELECT label AS c_label, idx,
        |         avg(embedding[idx]::DOUBLE) AS c
        |  FROM embeddings, range(1, 65) t(idx)
        |  GROUP BY 1, 2),
        |dist AS (
        |  SELECT e.vec_id, c.c_label,
        |         sum((e.embedding[c.idx]::DOUBLE - c.c) ^ 2) AS d
        |  FROM embeddings e CROSS JOIN cent c
        |  GROUP BY 1, 2)
        |SELECT vec_id, c_label AS pred_label FROM (
        |  SELECT vec_id, c_label,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY d, c_label) AS rn
        |  FROM dist) WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,
    "ml_knn" ->
      """WITH probes AS (
        |  SELECT vec_id AS pid, embedding AS p_emb FROM embeddings WHERE vec_id % 50 = 0),
        |train AS (
        |  SELECT * FROM embeddings WHERE vec_id % 50 <> 0),
        |d AS (
        |  SELECT p.pid, t.label, t.vec_id AS tid,
        |         list_distance(p.p_emb::DOUBLE[], t.embedding::DOUBLE[]) AS dist
        |  FROM probes p CROSS JOIN train t),
        |top5 AS (
        |  SELECT * FROM (
        |    SELECT pid, label,
        |           row_number() OVER (PARTITION BY pid ORDER BY dist, tid) AS rn
        |    FROM d) WHERE rn <= 5),
        |votes AS (
        |  SELECT pid, label, count(*) AS n_votes FROM top5 GROUP BY 1, 2)
        |SELECT pid AS vec_id, label AS pred_label, n_votes FROM (
        |  SELECT *, row_number() OVER (PARTITION BY pid ORDER BY n_votes DESC, label) AS vr
        |  FROM votes) WHERE vr = 1
        |ORDER BY vec_id""".stripMargin)
}
