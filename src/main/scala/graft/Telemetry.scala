package graft

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Run telemetry — the reference wraps every run in structured logging
  * shipped to object storage (function.py:349-365, 531-536). The
  * Spark-native analog: execute the plan and harvest the physical
  * operators' own SQL metrics (rows, shuffle/spill bytes) — the numbers
  * a pipeline health dashboard ingests per run.
  */
object Telemetry {

  case class RunMetrics(wallSec: Double, outputRows: Long,
                        shuffleBytesWritten: Long, spilledBytes: Long)

  /** AQE wraps the plan in AdaptiveSparkPlanExec / QueryStageExec whose
    * `children` don't expose the executed sub-plans — descend explicitly.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  /** In-flight metrics via `Dataset.observe` — aggregate expressions
    * evaluated WHILE the rows stream through the plan, no second scan
    * (the production shape for data-quality gates: the write and its
    * row/null accounting share one pass; in streaming the observation
    * reports per micro-batch). Returns the instrumented frame and the
    * handle to read after an action.
    *
    * CAUTION (Spark 4.1): the first observe on a session initializes its
    * ObservationManager, a NON-SERIALIZABLE session field — any later
    * closure that drags the session along (e.g. an MLlib model's
    * training summary inside CrossValidator) then fails serialization.
    * Observe on an isolated `spark.newSession()` when the session also
    * runs MLlib fits.
    */
  def withObservation(df: DataFrame, name: String,
                      exprs: Seq[Column]): (DataFrame, Observation) = {
    require(exprs.nonEmpty, "observe needs at least one aggregate")
    val obs = Observation(name)
    (df.observe(obs, exprs.head, exprs.tail: _*), obs)
  }

  /** Execute `df`'s own QueryExecution (a `write` would build a fresh one
    * whose metrics this df never sees) and aggregate the plan metrics.
    */
  def measure(df: DataFrame): RunMetrics = {
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.foreachPartition(_ => ())
    val wall = (System.nanoTime() - t0) / 1e9
    val plans = flatten(df.queryExecution.executedPlan)
    def sumMetric(name: String): Long =
      plans.flatMap(_.metrics.get(name)).map(_.value).sum
    val topRows = plans.iterator
      .flatMap(_.metrics.get("numOutputRows")).map(_.value)
      .toSeq.headOption.getOrElse(0L)
    RunMetrics(
      wallSec = wall,
      outputRows = topRows,
      shuffleBytesWritten = sumMetric("shuffleBytesWritten"),
      spilledBytes = sumMetric("spillSize"))
  }
}
