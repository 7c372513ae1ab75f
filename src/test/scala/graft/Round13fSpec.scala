package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphAnn

/** Round-13 directive #4 witnesses: `ann_graph_refine` — the recall
  * frontier pushed past the (20,3) build's 0.733 exact-walk ceiling by
  * building at degree 40 and serving with E23's ADC walk verbatim.
  * Done-bar from the r12 verdict: measured recall@3 ≥ 0.85 inside ≤ 4×
  * the LSH byte scan. Graded at sf0.1 (Round9dSpec's argument).
  */
class Round13fSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.1"
  private val k = 3

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

  private def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
    val res = df.select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }
    truth.map { case (q, t) => (res.getOrElse(q, Set.empty) & t).size }.sum
      .toDouble / truth.map(_._2.size).sum
  }

  private lazy val lshScanBytes: Long = {
    val planes = graft.ops.Dedup.hyperplanes(4, 64)
    val e = graft.tables.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit(_)): _*)
      when(graft.functions.VectorOps.dot(col("emb"), planeCol) > 0, lit(1 << i))
        .otherwise(lit(0))
    }.reduce(_ + _)
    val b = e.withColumn("bucket", bucket).select("vec_id", "bucket")
    b.filter(col("vec_id") % 100 === 0).select(col("vec_id").as("qid"), col("bucket"))
      .join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .count() * 256L
  }

  test("the refined build reaches 0.85 recall inside 4x the LSH byte scan, dominating E23") {
    val refined = recallOf(GraphAnn.annGraphRefine(spark, dir, k))
    val (rounds, pooled, codeB, rerankB) =
      GraphAnn.adcBeamStats.get(s"refine:$dir")
    val bytes = codeB + rerankB
    info(f"refine recall@$k = $refined%.3f ($rounds rounds, $pooled pooled, " +
      f"${bytes} B = ${bytes.toDouble / lshScanBytes}%.2fx LSH)")
    assert(refined >= 0.85,
      f"refined recall $refined%.3f below the 0.85 directive bar")
    assert(bytes <= 4 * lshScanBytes,
      s"refined walk bytes $bytes exceed 4x the LSH scan ($lshScanBytes)")
    // strict dominance over E23's pinned ceiling: the better build
    // lifts recall ABOVE the (20,3) exact-walk ceiling the r12 sweep
    // proved binding
    val adc = recallOf(GraphAnn.annGraphBeamAdc(spark, dir, k))
    assert(refined > adc,
      f"refined $refined%.3f does not dominate E23's $adc%.3f")
    // the r13 sweep's pinned point — a silent build/serve change shows
    // up here before it shows up at 10x
    assert(refined >= 0.95, f"pinned recall moved: $refined%.3f")
    assert(bytes == 1426928L, s"pinned touched-bytes moved: $bytes")
  }

  test("the refined artifact honors its degree and leaves E23's pinned point untouched") {
    // build both; the stats keys are distinct per artifact, and E23's
    // pinned numbers must not move because E27 exists
    GraphAnn.annGraphRefine(spark, dir, k).count()
    GraphAnn.annGraphBeamAdc(spark, dir, k).count()
    val (_, _, codeB, rerankB) = GraphAnn.adcBeamStats.get(dir)
    assert(codeB + rerankB == 1273904L,
      s"E23's pinned byte point moved: ${codeB + rerankB}")
    // degree contract of the refined build — and it actually USES the
    // wider budget (max out-degree above E23's 20)
    val degs = GraphAnn.refineEdgesArtifact(spark, dir)
      .groupBy("src").count().agg(max("count"), min("count")).head()
    assert(degs.getLong(0) <= GraphAnn.refineDegree,
      s"refined build overflowed degree: ${degs.getLong(0)}")
    assert(degs.getLong(0) > 20L,
      s"refined build never exceeds the (20,3) degree: ${degs.getLong(0)}")
    assert(degs.getLong(1) >= 1L, "a node lost all out-edges")
  }
}
