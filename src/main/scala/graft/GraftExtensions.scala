package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{Combine64, CosineSim, DotProduct, IntSqDist, Mix64, RollHash64}

/** Algebraic simplification over the graft expression domain: chained
  * affine mixes compose into one. a₂·(a₁·h + b₁) + b₂ ≡ (a₁a₂)·h +
  * (a₂b₁ + b₂), and because Mix64 is DEFINED on wrapping mod-2⁶⁴
  * arithmetic, folding the constants with plain Java long multiplication
  * is exact — no overflow caveat. Collapses re-permuted minhash chains
  * to a single codegen'd multiply-add per row.
  */
object GraftOptimizations extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Mix64(Mix64(h, a1, b1), a2, b2) =>
        Mix64(h, a1 * a2, a2 * b1 + b2)
    }
}

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
    org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, "graft_combine64",
      new ExpressionInfo(classOf[Combine64].getName, "graft_combine64"),
      children => Combine64(children(0)))
    org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, "graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      children => DotProduct(children(0), children(1)))
    org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, "graft_int_sqdist",
      new ExpressionInfo(classOf[IntSqDist].getName, "graft_int_sqdist"),
      children => IntSqDist(children(0), children(1)))
    if (!spark.experimental.extraOptimizations.contains(GraftOptimizations)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GraftOptimizations
    }
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
    ext.injectFunction((
      FunctionIdentifier("graft_combine64"),
      new ExpressionInfo(classOf[Combine64].getName, "graft_combine64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Combine64(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_int_sqdist"),
      new ExpressionInfo(classOf[IntSqDist].getName, "graft_int_sqdist"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        IntSqDist(children(0), children(1))))
    // every extension tier: functions (above), optimizer rule, planner
    // strategy (the custom as-of join node becomes available to ALL
    // sessions built with these extensions, not just the DataFrame API)
    ext.injectOptimizerRule(_ => GraftOptimizations)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
  }
}
