package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.GraphAnn
import graft.tables.Tables

/** Round-13 build sweep (debug main, Explain/BudgetProbe's discipline):
  * measure recall@3 and touched bytes for candidate E27 graph builds —
  * degree × descent-rounds × frontier × rerank — against the exact
  * truth panel at the given sf dir. Usage:
  *   R13Probe <sfDir> [deg,rounds,ef,rerank ...]
  */
object R13Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val combos =
      if (args.length > 1) args.drop(1).toSeq.map { s =>
        val Array(d, r, e, n) = s.split(","); (d.toInt, r.toInt, e.toInt, n.toInt)
      }
      else Seq((40, 3, 24, 200), (40, 3, 32, 200), (40, 3, 48, 200),
        (32, 3, 24, 200), (40, 3, 32, 300))
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val k = 3

    val tk = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * lit(1000000.0) + lit(0.5)).cast("long")).as("tv"))
    val probes = tk.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("tv").as("qv"))
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("vec_id"))
    val truth = tk.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.functions.VectorOps.intSqDist(col("qv"), col("tv")).as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    val slots = truth.map(_._2.size).sum

    combos.foreach { case (deg, rounds, ef, rerank) =>
      val t0 = System.nanoTime()
      val edges = GraphAnn.buildEdgesFrom(Tables.embeddings(spark, dir),
        s"r13probe.buckets:$dir:$deg:$rounds", deg, rounds).localCheckpoint()
      val tBuild = (System.nanoTime() - t0) / 1e9
      val key = s"probe:$deg:$rounds:$ef:$rerank"
      val res = GraphAnn.beamAdcServe(spark, dir, edges, k, ef, rerank, key)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, r) => q -> r.map(_._2).toSet }
      val hit = truth.map { case (q, t) =>
        (res.getOrElse(q, Set.empty[Long]) & t).size }.sum
      val recall = hit.toDouble / slots
      val (rnds, pooled, codeB, rerankB) = GraphAnn.adcBeamStats.get(key)
      println(f"PROBE deg=$deg rounds=$rounds ef=$ef rerank=$rerank " +
        f"recall@$k=$recall%.3f bytes=${codeB + rerankB} " +
        f"(code=$codeB rerank=$rerankB pooled=$pooled walkRounds=$rnds) " +
        f"build=${tBuild}%.1fs")
    }
    spark.stop()
  }
}
