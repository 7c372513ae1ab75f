package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Metrics, Models}

class MlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("ml_logreg_step: one Newton step from zero increases the log-likelihood") {
    val r = graft.ml.Ml4.mlLogregStep(spark, sf).head()
    val n = r.getLong(0)
    val (sq, sqq, sqy) =
      (r.getLong(2).toDouble, r.getLong(3).toDouble, r.getLong(4).toDouble)
    // recompute the unrounded betas from the exact integer aggregates
    val nd = n.toDouble
    val b0r = (r.getLong(1) * 2.0 - nd) / 2.0
    val b1r = sqy / 2.0
    val den = nd * sqq - sq * sq
    val beta0 = 4.0 * (sqq * b0r - sq * b1r) / den
    val beta1 = 4.0 * (nd * b1r - sq * b0r) / den
    assert(math.abs(r.getDouble(5) - beta0) < 1e-3, "reported beta0 drifted")
    assert(math.abs(r.getDouble(6) - beta1 * 10000.0) < 1e-3, "reported beta1 drifted")
    // the logistic log-likelihood is concave, so the Newton step from
    // beta = 0 must strictly improve on LL(0) = n·ln(1/2)
    val ll = Metrics.labeled(spark, sf)
      .select(col("truth").cast("double").as("y"),
        (lit(beta0) + lit(beta1) *
          floor(col("score") * lit(0.01) + lit(0.5))).as("eta"))
      .agg(sum(col("y") * col("eta") - log(lit(1.0) + exp(col("eta")))))
      .head().getDouble(0)
    val ll0 = n * math.log(0.5)
    assert(ll > ll0, s"Newton step did not improve LL: $ll vs $ll0")
  }

  test("ml_svc_step: betas match the integer aggregates, accuracy is consistent") {
    val r = graft.ml.Ml4.mlSvcStep(spark, sf).head()
    val (n, sy, syq, nCorrect) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0 && nCorrect >= 0 && nCorrect <= n)
    assert(math.abs(r.getDouble(4) - sy.toDouble / n) < 1e-3, "b1 drifted")
    assert(math.abs(r.getDouble(5) - syq.toDouble / n) < 1e-3, "w1 drifted")
    assert(math.abs(r.getDouble(6) - nCorrect.toDouble / n) < 1e-3,
      "train_acc inconsistent with n_correct")
    // stepped-model evaluation must see every row exactly once
    assert(n == graft.ml.Metrics.labeled(spark, sf).count())
  }

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
