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
  import org.apache.spark.sql.catalyst.expressions.Expression

  /** The single registry both registration paths iterate — adding an
    * expression here makes it available to imperative `register` AND
    * extensions-built sessions, with no second edit to forget.
    */
  private[graft] val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq[(String, Class[_], Seq[Expression] => Expression)](
      ("graft_cosine", classOf[CosineSim], c => CosineSim(c(0), c(1))),
      ("graft_rollhash64", classOf[RollHash64], c => RollHash64(c(0))),
      ("graft_combine64", classOf[Combine64], c => Combine64(c(0))),
      ("graft_dot", classOf[DotProduct], c => DotProduct(c(0), c(1))),
      ("graft_int_sqdist", classOf[IntSqDist], c => IntSqDist(c(0), c(1))))
      .map { case (name, cls, builder) =>
        (name, new ExpressionInfo(cls.getName, name), builder)
      }

  /** Imperative registration for sessions that already exist (tests,
    * notebooks): `GraftFunctions.register(spark)` then `spark.sql(...)`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, name, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(GraftOptimizations)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GraftOptimizations
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // every extension tier: functions (above), optimizer rule, planner
    // strategy (the custom as-of join node becomes available to ALL
    // sessions built with these extensions, not just the DataFrame API)
    ext.injectOptimizerRule(_ => GraftOptimizations)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
  }
}
