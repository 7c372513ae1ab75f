package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Metrics, Models}

class MlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("ml_nearest_centroid predicts every vector, labels in range") {
    val df = Models.mlNearestCentroid(spark, sf)
    val n = graft.tables.Tables.embeddings(spark, sf).count()
    assert(df.count() == n)
    val range = df.agg(min("pred_label"), max("pred_label")).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) <= 9)
  }

  test("ml_nearest_centroid beats random guessing on its own train set") {
    val e = graft.tables.Tables.embeddings(spark, sf).select("vec_id", "label")
    val pred = Models.mlNearestCentroid(spark, sf)
    val acc = pred.join(e, "vec_id")
      .filter(col("pred_label") === col("label")).count().toDouble /
      pred.count()
    assert(acc > 0.2, s"NC accuracy $acc should beat 10-class chance")
  }

  test("ml_knn votes sum to at most k and one prediction per probe") {
    val df = Models.mlKnn(spark, sf).collect()
    assert(df.nonEmpty)
    assert(df.map(_.getAs[Long]("vec_id")).distinct.length == df.length)
    assert(df.forall(r => r.getAs[Long]("n_votes") >= 1 && r.getAs[Long]("n_votes") <= 5))
  }

  test("ml_logreg trains and predicts all rows") {
    val df = Models.mlLogreg(spark, sf)
    assert(df.count() == graft.tables.Tables.embeddings(spark, sf).count())
  }

  test("ml_eval_metrics identities hold (counts sum, F1 harmonic)") {
    val r = Metrics.mlEvalMetrics(spark, sf).head()
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    assert(tp + fp + fn + tn ==
      graft.tables.Tables.orders(spark, sf).count())
    val acc = r.getAs[Double]("accuracy")
    assert(acc >= 0.0 && acc <= 1.0)
  }

  test("ml_roc_auc is within [0, 1] and p+n covers all orders") {
    val r = Metrics.mlRocAuc(spark, sf).head()
    assert(r.getAs[Long]("p") + r.getAs[Long]("n") ==
      graft.tables.Tables.orders(spark, sf).count())
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
  }
}
