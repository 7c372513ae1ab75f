package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into `private[sql]` Column construction — Spark 4 wraps Columns
  * around ColumnNodes, and `classic.ExpressionUtils.column` is the
  * supported internal path from a raw Catalyst [[Expression]]. Lives in
  * the `org.apache.spark.sql` package purely for access; no Spark
  * internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw LogicalPlan (Dataset.ofRows is
    * private[sql]).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Decompose a sort Column (`col.asc` / `col.desc`) into (key column,
    * isDescending, isDefaultNullOrdering); None when the column carries
    * no sort order. Spark 4 models sort order as an `internal.SortOrder`
    * ColumnNode, not a catalyst expression, so this is the only reliable
    * way to inspect it. Default null ordering = NULLS FIRST under asc,
    * NULLS LAST under desc (what a bare asc/desc means).
    */
  def sortOrder(c: Column): Option[(Column, Boolean, Boolean)] = c.node match {
    case internal.SortOrder(child, dir, nulls, _) =>
      val desc = dir == internal.SortOrder.Descending
      val defaultNulls =
        (desc && nulls == internal.SortOrder.NullsLast) ||
          (!desc && nulls == internal.SortOrder.NullsFirst)
      Some((Column(child), desc, defaultNulls))
    case _ => None
  }

  /** Register a SQL function on an ALREADY-RUNNING session (the
    * `spark.sql.extensions` config path only applies at session build).
    */
  def registerFunction(spark: SparkSession, name: String, info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
