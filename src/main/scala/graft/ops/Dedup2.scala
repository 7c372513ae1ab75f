package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps.rollhash64
import graft.tables.Tables

/** Dedup extensions (round 3, wave 9) — SURVEY.md §2.D8.
  *
  * Chunk-level (partial) duplication: documents that are not near-dups
  * as a whole can still share verbatim PASSAGES (boilerplate, quoted
  * blocks, template text). Pretraining-corpus pipelines detect this at
  * chunk granularity — split each document into disjoint token blocks,
  * hash each block, and join on block hash — because whole-document
  * MinHash (D2) is blind to a 10-token copy inside an otherwise unique
  * document.
  */
object Dedup2 {

  /** D8 — exact shared-chunk detection: disjoint 10-token blocks per
    * document (tail shorter than 10 dropped), block → RollHash64, doc
    * pairs sharing ≥1 distinct block hash, with the shared count.
    *
    * Plan shape: tokenize+chunk is a shuffle-free projection; the pair
    * join is an equi-join on the 64-bit block hash over the DISTINCT
    * (doc, hash) set — candidates are hash-co-resident rows only, the
    * same O(n·blocks) bucket-join shape as D2's LSH bands, never doc×doc.
    * At 100 TB a frequency cap on pathological boilerplate hashes (drop
    * hashes in >F docs before the self-join) bounds the worst bucket;
    * the synthetic corpus needs no cap.
    */
  def dedupDocChunk(spark: SparkSession, dir: String): DataFrame = {
    val blocks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tokens"))
      .select(col("doc_id"), expr(
        """CASE WHEN size(tokens) >= 10 THEN
          |  transform(sequence(0, size(tokens) div 10 - 1),
          |            i -> concat_ws(' ', slice(tokens, i * 10 + 1, 10)))
          |ELSE array() END""".stripMargin).as("blocks"))
      .select(col("doc_id"), explode(col("blocks")).as("block"))
      .select(col("doc_id"), rollhash64(col("block")).as("h"))
      .distinct()
    blocks.as("l").join(blocks.as("r"), col("l.h") === col("r.h") &&
        col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .agg(count(lit(1)).as("shared_blocks"))
      .orderBy("a", "b")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_doc_chunk" -> (dedupDocChunk _))

  val oracles: Map[String, String] = Map(
    "dedup_doc_chunk" ->
      s"""WITH tok AS (
         | SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens FROM documents),
         |blk AS (
         | SELECT doc_id,
         |  unnest([array_to_string(tokens[(i - 1) * 10 + 1 : i * 10], ' ')
         |          FOR i IN range(1, len(tokens) // 10 + 1)]) AS block
         | FROM tok),
         |h AS (
         | SELECT DISTINCT doc_id, ${Dedup.wrapSql(Dedup.rollSql("block"))} AS h
         | FROM blk)
         |SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS shared_blocks
         |FROM h l JOIN h r ON l.h = r.h AND l.doc_id < r.doc_id
         |GROUP BY 1, 2 ORDER BY a, b""".stripMargin)
}
