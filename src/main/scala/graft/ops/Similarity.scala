package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.stat.Summarizer

import graft.functions.VectorOps._
import graft.tables.Tables

/** Approximate-nearest-neighbor search — SURVEY.md §2.E.
  *
  * Three tiers over the `embeddings` table:
  *  - E1 brute force (exact baseline): broadcast probe set × full table.
  *  - E2 random-hyperplane LSH: probe only its own sign-bucket.
  *  - E3 IVF: coarse centroids, probe the nearest `nprobe` cells.
  *
  * Scale shape: the probe set is always the small side and broadcast; the
  * big side is partition-parallel and never shuffled except for the final
  * per-probe top-k (a few rows per probe after the window).
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))

  private def probesOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("emb").as("q_emb"))

  /** Per-probe top-k by cosine (desc), deterministic id tie-break. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("neighbor_id"), OracleRound.r4b(col("cos_sim")).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** E1 — exact brute-force cosine top-k (the recall-1.0 baseline). */
  def annBruteforce(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = emb(spark, dir)
    val scored = e.crossJoin(broadcast(probesOf(e)))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("q_emb"), col("emb")).as("cos_sim"))
    topK(scored, k)
  }

  /** E2 — random-hyperplane LSH ANN: 4 sign bits → 16 buckets; a probe
    * scans only its own bucket (~n/16 of the data; more planes at real
    * scale shrink the scanned fraction geometrically at some recall cost).
    */
  def annLsh(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val planes = Dedup.hyperplanes(4, 64)
    val e = emb(spark, dir)
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit(_)): _*)
      when(dot(col("emb"), planeCol) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    val bucketed = e.withColumn("bucket", bucket)
    val probes = bucketed.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("emb").as("q_emb"), col("bucket"))
    val scored = bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("q_emb"), col("emb")).as("cos_sim"))
    topK(scored, k)
  }

  /** E3 — IVF: coarse quantizer = per-label mean vectors (k-means-style
    * cells seeded from the label partition), every vector assigned to its
    * nearest cell, probes search their `nprobe` closest cells only.
    */
  def annCentroidIvf(spark: SparkSession, dir: String, k: Int = 5,
                     nprobe: Int = 2): DataFrame = {
    val e = emb(spark, dir)
    val cells = Tables.embeddings(spark, dir)
      .select(col("label"), array_to_vector(asDouble(col("embedding"))).as("fv"))
      .groupBy(col("label").as("cell")).agg(Summarizer.mean(col("fv")).as("cv"))
      .select(col("cell"), vector_to_array(col("cv")).as("cell_vec"))
    // assign every vector to its nearest cell (1 row out per vector)
    val wAssign = Window.partitionBy("vec_id").orderBy(col("d"), col("cell"))
    val assigned = e.crossJoin(broadcast(cells))
      .select(col("vec_id"), col("emb"), col("cell"),
        sqDist(col("emb"), col("cell_vec")).as("d"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("emb"), col("cell"))
    // probes pick their nprobe nearest cells
    val wProbe = Window.partitionBy("qid").orderBy(col("d"), col("cell"))
    val probeCells = probesOf(e).crossJoin(broadcast(cells))
      .select(col("qid"), col("q_emb"), col("cell"),
        sqDist(col("q_emb"), col("cell_vec")).as("d"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("q_emb"), col("cell"))
    val scored = assigned.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        cosine(col("q_emb"), col("emb")).as("cos_sim"))
    topK(scored, k)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> ((s, d) => annBruteforce(s, d)),
    "ann_lsh" -> ((s, d) => annLsh(s, d)),
    "ann_centroid_ivf" -> ((s, d) => annCentroidIvf(s, d)))

  val oracles: Map[String, String] = Map(
    "ann_bruteforce" ->
      """WITH probes AS (
        |  SELECT vec_id AS qid, embedding AS q_emb FROM embeddings WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT p.qid, e.vec_id AS nid,
        |         list_cosine_similarity(p.q_emb::DOUBLE[], e.embedding::DOUBLE[]) AS cos_sim
        |  FROM probes p CROSS JOIN embeddings e WHERE e.vec_id <> p.qid)
        |SELECT qid AS query_id, rank, nid AS neighbor_id, floor((cos_sim) * 10000 + 0.5) / 10000 AS cos_sim
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
        |      FROM scored)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // same deterministic hyperplane literals as the Spark plan (see
    // Dedup.bucketSql); probes search only their own sign-bucket
    "ann_lsh" -> {
      val planes = Dedup.hyperplanes(4, 64)
      s"""WITH b AS (
         | SELECT vec_id, embedding::DOUBLE[] AS emb,
         |  ${Dedup.bucketSql(planes)} AS bucket
         | FROM embeddings),
         |probes AS (
         | SELECT vec_id AS qid, emb AS q_emb, bucket FROM b WHERE vec_id % 100 = 0),
         |scored AS (
         | SELECT p.qid, e.vec_id AS nid,
         |  list_cosine_similarity(p.q_emb, e.emb) AS cos_sim
         | FROM b e JOIN probes p USING (bucket) WHERE e.vec_id <> p.qid)
         |SELECT qid AS query_id, rank, nid AS neighbor_id,
         | floor((cos_sim) * 10000 + 0.5) / 10000 AS cos_sim
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rank
         |      FROM scored)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    })
}
