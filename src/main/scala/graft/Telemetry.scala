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
    "stream_window_agg" -> 84000L,
    // round-5 widening: iterative graph/dedup, PQ/ANN, the distributed
    // twins, JDBC and layout round-trips, the exact-training loops
    // (probed under the 4-partition TEST config this table is gated in)
    "dedup_cluster" -> 11000L, "graph_pagerank" -> 26000L,
    "graph_pagerank_iter" -> 30000L,
    "ann_pq_search" -> 2500L, "ann_pq_refine" -> 9700L,
    "ann_centroid_ivf" -> 2500L, "ml_ks_statistic_dist" -> 133000L,
    "q_sequence_gaps_dist" -> 4200L, "f_quantile_bucket_dist" -> 61000L,
    "mm_chunk_dedup" -> 5500L, "text_tfidf" -> 650000L,
    "src_jdbc_roundtrip" -> 12000L, "ml_gbt_step2" -> 7600L,
    "ml_kmeans_lloyd" -> 500L, "src_sorted_layout" -> 3000L,
    "src_zorder_layout" -> 12000L)
  val atSf01: Map[String, Long] = Map(
    "q_agg_pricing" -> 3000L, "q_join_shuffle" -> 5200000L,
    "q_multi_join_agg" -> 8000L, "q_asof_join" -> 2700000L,
    "q_topk_per_key" -> 280000L, "f_comp_diff" -> 28200000L,
    "f_standard_scale" -> 21200000L, "dedup_minhash_lsh" -> 170000L,
    "ann_bruteforce" -> 13000L, "text_quality" -> 240000L,
    "stream_window_agg" -> 320000L,
    "dedup_cluster" -> 105000L, "graph_pagerank" -> 260000L,
    "graph_pagerank_iter" -> 330000L,
    "ann_pq_search" -> 12600L, "ann_pq_refine" -> 41000L,
    "ann_centroid_ivf" -> 13000L, "ml_ks_statistic_dist" -> 12800000L,
    "q_sequence_gaps_dist" -> 310000L, "f_quantile_bucket_dist" -> 5400000L,
    "mm_chunk_dedup" -> 190000L, "text_tfidf" -> 6800000L,
    "src_jdbc_roundtrip" -> 770000L, "ml_gbt_step2" -> 13000L,
    "ml_kmeans_lloyd" -> 500L, "src_sorted_layout" -> 220000L,
    "src_zorder_layout" -> 530000L)

  def forDir(dir: String): Option[Map[String, Long]] =
    if (dir.endsWith("sf0.001")) Some(atSf0001)
    else if (dir.endsWith("sf0.1")) Some(atSf01)
    else None

  /** The configuration each budget table was MEASURED under (2× the
    * bytes `graft.BudgetProbe` reported on these settings — the sf0.001
    * table under the 4-partition test session that PlanAuditSpec gates
    * in, the sf0.1 table under the 32-partition bench session).
    * Compressed shuffle volume depends on partition count, codec, and
    * Spark's serialization — an environment that changes any of these
    * can blow a budget with zero plan regression, so on a fingerprint
    * mismatch the gate turns ADVISORY (report, don't fail) and the right
    * move is re-baselining with BudgetProbe, not silencing a phantom
    * regression.
    */
  def fingerprintForDir(dir: String): Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> (if (dir.endsWith("sf0.001")) "4" else "32"),
    "spark.io.compression.codec" -> "lz4",
    "spark.version" -> "4.1")

  def mismatches(spark: org.apache.spark.sql.SparkSession,
                 dir: String): Seq[String] = {
    val pinned = fingerprintForDir(dir)
    Seq(
      ("spark.sql.shuffle.partitions",
        spark.conf.get("spark.sql.shuffle.partitions")),
      ("spark.io.compression.codec",
        spark.conf.get("spark.io.compression.codec", "lz4")),
      ("spark.version", spark.version)
    ).flatMap { case (k, actual) =>
      val want = pinned(k)
      if (actual == want || actual.startsWith(want + ".")) None
      else Some(s"$k=$actual (budgets pinned under $want)")
    }
  }

  /** Hard enforcement only under the measuring config, with an explicit
    * operator escape hatch (`SPARK_GRAFT_BUDGET_GATE=off`).
    */
  def enforced(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    sys.env.get("SPARK_GRAFT_BUDGET_GATE").forall(_.toLowerCase != "off") &&
      mismatches(spark, dir).isEmpty
}
