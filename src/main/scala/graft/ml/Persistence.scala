package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.sql.DataFrame

/** Model persistence — the reference pickles its best models and ships
  * them to object storage (export_models.py; modeling.ipynb cell 123-125
  * dumps model + metadata). Spark-native: every fitted `spark.ml` model
  * is MLWritable — save() writes a self-describing directory (params JSON
  * + data parquet) that any cluster can load without the training code.
  */
object Persistence {

  def saveLogreg(model: LogisticRegressionModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadLogreg(path: String): LogisticRegressionModel =
    LogisticRegressionModel.load(path)

  /** Train → save → reload → predict; returns (original, reloaded)
    * prediction frames for equality checks.
    */
  def roundTrip(data: DataFrame, path: String): (DataFrame, DataFrame) = {
    val model = new LogisticRegression().setMaxIter(25).setRegParam(0.01).fit(data)
    saveLogreg(model, path)
    val reloaded = loadLogreg(path)
    (model.transform(data), reloaded.transform(data))
  }
}
