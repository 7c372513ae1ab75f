package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSim, RollHash64}

/** SparkSessionExtensions hook: registers the graft native expressions as
  * SQL functions (`graft_cosine`, `graft_rollhash64`) so `spark.sql` /
  * `expr` users get them too. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  * (The DataFrame API in graft.ops constructs the expressions directly,
  * so operators work on vanilla sessions as well.)
  */
object GraftFunctions {
  /** Imperative registration for sessions that already exist (tests,
    * notebooks): `GraftFunctions.register(spark)` then `spark.sql(...)`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, "graft_cosine",
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      children => CosineSim(children(0), children(1)))
    org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, "graft_rollhash64",
      new ExpressionInfo(classOf[RollHash64].getName, "graft_rollhash64"),
      children => RollHash64(children(0)))
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_rollhash64"),
      new ExpressionInfo(classOf[RollHash64].getName, "graft_rollhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollHash64(children(0))))
  }
}
