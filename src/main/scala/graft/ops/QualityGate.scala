package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** F21 — `corpus_quality_gate` (round-8 stretch directive #6): the
  * fastText-filter shape every pretraining pipeline runs, composed
  * entirely from shipped exact pieces — train a cheap text classifier
  * on a weak label, score the whole corpus, keep/drop at a threshold,
  * report per-language keep rates for the curation audit (the table
  * F15's cascade consumes as its language gate evidence).
  *
  *  - Weak label (the CCNet/fastText move): docs from the CURATED
  *    source list — here "source id is even", the deterministic stand-
  *    in for a quality-domain allowlist — are the positive class.
  *  - Feature: B18's hashing trick reduced to ONE dimension — the
  *    signed token-hash sum Σ±1 over the doc's tokens (sign = bit 6 of
  *    RollHash64("tok=" + token), exactly B18's sign rule). A 1-dim
  *    random projection of the bag-of-words: no vocabulary pass, no
  *    fit state, |q| ≤ n_tokens so every IRLS intermediate stays far
  *    inside int64/HUGEINT.
  *  - Trainer: C36's two exact IRLS rounds ([[graft.ml.Irls]]
  *    .irlsRounds — the literal σ-table program, shared verbatim).
  *  - Serving: C34's integer-tick discipline — zt = b0t·10⁴ + b1t·q
  *    per doc, an exact integer; keep iff zt ≥ 0 (σ(z) ≥ ½, the
  *    canonical probability-0.5 gate in tick space).
  *
  * The oracle replays the ENTIRE pipeline — label, hashed feature,
  * both IRLS rounds ([[graft.ml.Irls.stepsCtes]] with the documents
  * labeling swapped in, the recurrence text shared verbatim with
  * C36/C37), the tick score, and the per-language keep aggregate — so
  * the driver hash-proves train → score → gate end to end.
  *
  * Scale shape: training is two aggregate scans (map-side partial, 5
  * sums each) + O(1) driver BigInt; scoring is a pure codegen
  * projection with β as two literal longs; the audit is a ≤|langs|
  * aggregate. Exactly how a corpus filter serves at 100 TB — the
  * model never touches a shuffle.
  */
object QualityGate {

  /** B18's sign rule applied per token: bit 6 of the rolling hash of
    * "tok=" + token, mapped to ±1.
    */
  private def tokenSign(t: Column): Column =
    shiftrightunsigned(
      graft.functions.VectorOps.rollhash64(concat(lit("tok="), t)), 6)
      .bitwiseAND(lit(1L)) * 2 - 1

  /** (doc_id, lang, y, q): the labeled frame both the trainer and the
    * scorer scan. Memoized+persisted per dir: the per-token rollhash
    * fold is the expensive part and the plan reads it three times
    * (round-1 aggregate, round-2 aggregate, serving projection) — the
    * same cache-boundary discipline as F20's token frame, ~16 B/doc of
    * state. `substr(source, 4)` is deliberately UNBOUNDED on both
    * engines (a length-capped Spark substring against DuckDB's
    * uncapped substr would diverge the parity label on source ids
    * past the cap).
    */
  private[graft] def labeled(spark: SparkSession, dir: String): DataFrame =
    graft.QueryCaches.memo(s"qualgate.lab:$dir") {
      labeledOf(Tables.documents(spark, dir)).persist()
    }

  /** The label+feature projection over an ARBITRARY documents-shaped
    * frame — shared by the batch gate and G16's per-micro-batch
    * scoring so the two paths cannot diverge on a single feature bit.
    */
  private[graft] def labeledOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("lang"),
      (expr("substr(source, 4)").cast("int") % 2 === 0)
        .cast("int").as("y"),
      aggregate(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"), lit(0L),
        (acc, t) => acc + tokenSign(t)).as("q"))

  /** The trained (b0, b1) ticks, memoized per dir — the frozen model
    * artifact G16's stream serves (trained offline once, exactly the
    * production deployment shape).
    */
  private[graft] def trainedTicks(spark: SparkSession, dir: String): (Long, Long) =
    graft.QueryCaches.memo(s"qualgate.beta:$dir") {
      val Seq(_, (b0, b1)) =
        graft.ml.Irls.irlsRounds(labeled(spark, dir).select("y", "q"), rounds = 2)
      (b0.toLong, b1.toLong)
    }

  /** Per-doc keep verdicts under the frozen model — the scoring
    * projection both the batch aggregate and G16's stream share.
    */
  private[graft] def keepCol(b0: Long, b1: Long): Column =
    when(lit(b0) * 10000L + lit(b1) * col("q") >= 0, 1L).otherwise(0L)

  /** The per-language audit aggregate shared by F21 and G16's sink. */
  private[graft] def keepAudit(scored: DataFrame): DataFrame =
    scored.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_keep"))
      .select(col("lang"), col("n_docs"), col("n_keep"),
        OracleRound.r4b(col("n_keep").cast("double") / col("n_docs"))
          .as("keep_rate"))
      .orderBy("lang")

  def corpusQualityGate(spark: SparkSession, dir: String): DataFrame = {
    val (b0, b1) = trainedTicks(spark, dir)
    keepAudit(labeled(spark, dir)
      .select(col("lang"), keepCol(b0, b1).as("keep")))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_quality_gate" -> (corpusQualityGate _))

  val oracles: Map[String, String] = Map(
    "corpus_quality_gate" -> {
      val sign = s"(${Dedup.rollSql("('tok=' || t)")} // 64) % 2 * 2 - 1"
      val prelude =
        s"""lab AS (
           |  SELECT doc_id, lang,
           |    CAST(CAST(substr(source, 4) AS INT) % 2 = 0 AS INT) AS y,
           |    (SELECT CAST(coalesce(sum($sign), 0) AS BIGINT)
           |     FROM unnest(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS u(t)) AS q
           |  FROM documents),
           |""".stripMargin
      s"""${graft.ml.Irls.stepsCtes(2, prelude, "SELECT y, q FROM lab")},
         |scored AS (
         |  SELECT lang, CASE WHEN b0_2 * 10000 + b1_2 * q >= 0
         |               THEN 1 ELSE 0 END AS keep
         |  FROM lab, b2)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(keep) AS BIGINT) AS n_keep,
         |  floor((CAST(sum(keep) AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000 AS keep_rate
         |FROM scored GROUP BY lang ORDER BY lang""".stripMargin
    })
}
