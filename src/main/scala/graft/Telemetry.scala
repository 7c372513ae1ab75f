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
    // CONSUME every partition iterator: foreachPartition(_ => ()) would
    // skip the final stage's lazy per-row work (post-shuffle projections,
    // broadcast probes) and under-measure the plan
    df.queryExecution.toRdd.foreachPartition { it =>
      while (it.hasNext) it.next()
    }
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

/** Shuffle-byte regression gate: each headline query's shuffle volume is
  * PINNED, not just prose-audited — "the plan is the one you'd want at
  * 100×" as an executable assertion. Budgets are 2× the bytes measured
  * on the round-4 plans (`Telemetry.measure`), so compression jitter and
  * partition-count variation pass while a plan regression that doubles
  * the shuffle (a lost broadcast, a dropped partial aggregate, an
  * unpersisted double-scan) fails the bench run and the plan-audit spec.
  * Wall time is host-noise; shuffle bytes are a property of the PLAN.
  */
object ShuffleBudget {
  val atSf0001: Map[String, Long] = Map(
    "q_agg_pricing" -> 3000L, "q_join_shuffle" -> 63000L,
    "q_multi_join_agg" -> 8000L, "q_asof_join" -> 34000L,
    "q_topk_per_key" -> 8000L, "f_comp_diff" -> 300000L,
    "f_standard_scale" -> 230000L, "dedup_minhash_lsh" -> 30000L,
    "ann_bruteforce" -> 5000L, "text_quality" -> 32000L,
    "stream_window_agg" -> 84000L)
  val atSf01: Map[String, Long] = Map(
    "q_agg_pricing" -> 3000L, "q_join_shuffle" -> 5200000L,
    "q_multi_join_agg" -> 8000L, "q_asof_join" -> 2700000L,
    "q_topk_per_key" -> 280000L, "f_comp_diff" -> 28200000L,
    "f_standard_scale" -> 21200000L, "dedup_minhash_lsh" -> 170000L,
    "ann_bruteforce" -> 13000L, "text_quality" -> 240000L,
    "stream_window_agg" -> 320000L)

  def forDir(dir: String): Option[Map[String, Long]] =
    if (dir.endsWith("sf0.001")) Some(atSf0001)
    else if (dir.endsWith("sf0.1")) Some(atSf01)
    else None
}
