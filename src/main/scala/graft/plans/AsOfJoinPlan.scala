package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class plan node — the SURVEY.md §3 "custom
  * operator" path (LogicalPlan + SparkStrategy + SparkPlan), for the one
  * operator the reference leans on hardest ("stats going into the game").
  *
  * Physical algorithm: both sides hash-clustered on the key and sorted
  * in-partition by (key, time); a single forward merge per partition
  * carries the latest build value for the current key and emits each
  * probe row with the value from strictly-earlier build rows. O(1) state
  * per partition, zero allocation per row beyond the output projection —
  * the plan shape a 100 TB as-of join wants (exactly one shuffle and one
  * sort per side, like sort-merge join).
  *
  * The composed formulation ([[graft.ops.AsOf.asofJoin]]) remains the
  * default (it rides whole-stage codegen); this node exists where the
  * union trick can't be used — e.g. heterogeneous schemas too wide to
  * union — and as the extension-point demonstration. Registered via
  * `spark.experimental.extraStrategies` (works on vanilla sessions) or
  * `SparkSessionExtensions.injectPlannerStrategy`.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightValue: Expression,
                        resultAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ resultAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(resultAttr :: Nil)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rv, attr) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, attr) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightValue: Expression,
                        resultAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ resultAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(resultAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
      Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending),
        // value tiebreak: build rows tied on (key, time) must resolve the
        // same way as the composed formulation / the SQL-window oracle
        // (last-consumed = max value)
        SortOrder(rightValue, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val rValB = BindReferences.bindReference(rightValue, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val outAttrs = output
    val leftAttrs = left.output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val project = UnsafeProjection.create(outAttrs, leftAttrs :+ resultAttr)
      val valueRow = new GenericInternalRow(1)
      val joined = new JoinedRow

      // Eagerly-extracted build-side head (rows are reused by the
      // upstream iterator — never hold an InternalRow across next()).
      var rHasHead = false
      var rKey: Any = null; var rTime: Any = null; var rVal: Any = null
      def advanceRight(): Unit =
        if (rIt.hasNext) {
          val row = rIt.next()
          // copyValue: eval() of string/decimal/struct types returns
          // buffer-backed views into the reused upstream row
          rKey = InternalRow.copyValue(rKeyB.eval(row))
          rTime = InternalRow.copyValue(rTimeB.eval(row))
          rVal = InternalRow.copyValue(rValB.eval(row))
          rHasHead = true
        } else rHasHead = false
      advanceRight()

      // latest consumed build row (primitives only)
      var lastKey: Any = null
      var lastVal: Any = null
      var hasLast = false

      lIt.map { lRow =>
        val k = lKeyB.eval(lRow)
        val t = lTimeB.eval(lRow)
        // consume build rows with (key < k) or (key == k && time < t)
        var continue = rHasHead
        while (continue) {
          val c = keyOrd.compare(rKey, k)
          if (c < 0 || (c == 0 && timeOrd.compare(rTime, t) < 0)) {
            lastKey = rKey; lastVal = rVal; hasLast = true
            advanceRight()
            continue = rHasHead
          } else continue = false
        }
        val v: Any =
          if (hasLast && keyOrd.compare(lastKey, k) == 0) lastVal else null
        valueRow.update(0, v)
        project(joined(lRow, valueRow))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API for the custom node. */
object AsOfJoinNative {
  import org.apache.spark.sql.GraftColumnBridge

  def asofJoin(probe: DataFrame, build: DataFrame,
               keyCol: String, timeCol: String, valueCol: String,
               asofName: String): DataFrame = {
    val spark = probe.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    }
    // Re-alias the build side with FRESH exprIds: when probe and build
    // derive from the same relation (the common case), the analyzer's
    // DeduplicateRelations rewrites the right child's attributes but not
    // a custom node's expressions — so we never share ids to begin with.
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val rAnalyzed = build.queryExecution.analyzed
    val aliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rFresh = Project(aliases, rAnalyzed)
    val rOut = aliases.map(_.toAttribute)
    def rAttr(name: String) = rOut.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not in build side"))
    val valueExpr = rAttr(valueCol)
    val attr = AttributeReference(asofName, valueExpr.dataType, nullable = true)()
    val plan = AsOfJoinPlan(
      probe.queryExecution.analyzed, rFresh,
      GraftColumnBridge.expression(probe(keyCol)), rAttr(keyCol),
      GraftColumnBridge.expression(probe(timeCol)), rAttr(timeCol),
      valueExpr, attr)
    GraftColumnBridge.ofRows(spark, plan)
  }
}
