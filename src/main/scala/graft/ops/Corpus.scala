package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps.rollhash64
import graft.tables.Tables

/** Training-corpus ASSEMBLY — round 6, SURVEY.md §2.D10/D11/F12.
  *
  * The dedup/quality/similarity families (D/E/F) detect; these three
  * operators are what a pretraining pipeline DOES with the detections:
  * pick the survivor of each near-dup cluster, strip documents that
  * leak the evaluation set, and pack what remains into balanced
  * token-budget bins for the trainer.
  */
object Corpus {

  /** D10 — `dedup_canonical`: per near-dup cluster (D7's connected
    * components), keep the HIGHEST-QUALITY member (F2's quality score,
    * lowest doc_id on ties) — the selection policy real pipelines run
    * where D1/D6's canonical-min keeps an arbitrary survivor. Only
    * multi-member clusters are reported (singletons have nothing to
    * drop).
    *
    * Plan shape: D7's labels joined with F2's per-doc score (both
    * doc-sized), one aggregate per cluster — `max_by` over the
    * (quality, −doc_id) struct is the argmax with the tie-break built
    * into lexicographic ordering, no per-cluster window needed.
    */
  def dedupCanonical(spark: SparkSession, dir: String): DataFrame = {
    // round 11: the PRODUCTION consumers ride the O(log n) star
    // contraction — same labels, same oracle, but the round count no
    // longer depends on the largest component's diameter (the r10
    // verdict's one `weak`); D7 keeps the min-label twin as a contract
    // row
    val clusters = Dedup.dedupClusterLogn(spark, dir)
    val quality = graft.ops.Text.textQuality(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    clusters.join(quality, "doc_id")
      .groupBy("cluster")
      .agg(
        max_by(col("doc_id"),
          struct(col("quality_score"), (-col("doc_id")).as("nid"))).as("keep_id"),
        max(col("quality_score")).as("keep_quality"),
        count(lit(1)).as("n_members"))
      .filter(col("n_members") >= 2)
      .select(col("cluster"), col("keep_id"), col("keep_quality"),
        col("n_members"), (col("n_members") - 1).as("n_dropped"))
      .orderBy("cluster")
  }

  /** D11 — `text_decontaminate`: benchmark-leak detection, the
    * asymmetric overlap check every LLM data pipeline runs before
    * training (D4's pairwise Jaccard treats all documents alike; this
    * scores TRAINING docs against a designated EVAL set). Eval set =
    * doc_id % 50 == 0; a training doc's contamination is the fraction
    * of its distinct word-3-gram shingles that appear ANYWHERE in the
    * eval set. Top-20 by overlap reported (the review queue), ratio
    * quantized for the exact oracle.
    *
    * Scale shape: the eval side collapses to a DISTINCT 8-byte
    * shingle-hash index (|eval shingles| rows, the small side at any
    * realistic eval:train ratio); the training side explodes to
    * (doc, shingle-hash) and semi-joins the index on the LONG hash —
    * an O(n·shingles) equi-join, never doc×doc. Joining on
    * RollHash64 instead of the shingle STRING keeps the shuffle rows
    * at 16 B and replays exactly (same hash both engines, and any
    * collision collides identically).
    */
  def textDecontaminate(spark: SparkSession, dir: String,
                        topK: Int = 20): DataFrame =
    decontamScores(spark, dir)
      .orderBy(col("overlap").desc, col("doc_id"))
      .limit(topK)

  /** The UNRANKED per-doc overlap frame D11's review queue truncates —
    * what gating consumers (F29's funnel) filter: no global sort, no
    * 2³¹-row `limit` cliff (a contaminated set past Int.MaxValue rows
    * would silently survive a limit-based gate at 100 TB).
    */
  private[graft] def decontamScores(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingled(Tables.documents(spark, dir))
    val evalIdx = sh.filter(col("doc_id") % 50 === 0)
      .select(explode(col("shingles")).as("shingle"))
      .select(rollhash64(col("shingle")).as("h"))
      .distinct()
    val train = sh.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), size(col("shingles")).as("n_shingles"),
        explode(col("shingles")).as("shingle"))
      .select(col("doc_id"), col("n_shingles"), rollhash64(col("shingle")).as("h"))
    train.join(evalIdx, "h")
      .groupBy("doc_id", "n_shingles")
      .agg(count(lit(1)).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        OracleRound.r4b(col("n_shared").cast("double") / col("n_shingles"))
          .as("overlap"))
  }

  /** F12 — `corpus_pack`: sequence packing — distribute documents into
    * the minimum-ish number of fixed-token-budget bins (what a trainer
    * does before batching). True first-fit packing is inherently
    * sequential; the SCALABLE deterministic policy is sorted
    * round-robin (longest-processing-time scheduling): rank all docs by
    * token count descending via [[DistRank]] (full-parallelism global
    * rank — no single-partition window), bins = ⌈total/capacity⌉ from
    * one bounded driver aggregate, bin = (rank−1) mod bins. LPT is the
    * classic 4/3-approximation to balanced makespan, and unlike
    * first-fit it is order-independent and replayable as one window
    * expression.
    */
  def corpusPack(spark: SparkSession, dir: String,
                 capacity: Long = 2048): DataFrame =
    packBins(Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).cast("long").as("n_tokens")),
      capacity)

  /** F29 — `corpus_build_audit`: the corpus BUILD as one funnel — the
    * manifest a curation run ships: every stage is the REAL shipped
    * operator (not a re-implementation), composed end to end with
    * per-stage surviving documents AND tokens:
    *
    *  - stage 1 `dedup_canonical`: drop every near-dup cluster member
    *    except D10's canonical survivor (D7's clusters, D10's argmax
    *    policy — the frames are the shipped operators' own).
    *  - stage 2 `decontaminate`: drop the eval set itself (it is the
    *    benchmark) and every training doc whose D11 overlap — the
    *    shipped operator un-truncated — reaches the 0.2 gate
    *    (quantized compare, so the boundary replays exactly;
    *    non-vacuous at every contract SF: 2/3/1452 docs fire).
    *  - stage 3 `quality`: F15's full rule conjunction via the SHARED
    *    `cascadeFlags` (one definition of the rules).
    *
    * Scale shape: the funnel is ONE pass — per-doc stage flags from
    * three id-sized left joins against the (usually much smaller) drop
    * sets, then a single conditional-sum aggregate stacked into the
    * four audit rows (F15's shape). Each constituent pipeline runs
    * exactly once; the corpus text is scanned only inside those
    * operators, which are individually gate-audited.
    */
  /** Per-doc funnel flags (doc_id, n_tokens, s1, s2, s3) — F15's flags
    * discipline applied to the whole build: ONE pass over each
    * constituent frame (a union of per-stage aggregates would re-run
    * the shingle and cluster pipelines once per stage), aggregated
    * once by the audit and filtered by the spec's witnesses.
    */
  private[graft] def buildFlags(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).cast("long").as("n_tokens"))
    val dropDup = Dedup.dedupClusterLogn(spark, dir)
      .join(dedupCanonical(spark, dir).select("cluster", "keep_id"), Seq("cluster"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), lit(true).as("dup"))
    val cont = decontamScores(spark, dir)
      .filter(col("overlap") >= 0.2)
      .select(col("doc_id"), lit(true).as("cont"))
    val qual = Corpus2.cascadeFlags(spark, dir)
      .select(col("doc_id"),
        (col("r1") && col("r2") && col("r3") && col("r4")).as("qual"))
    docs
      .join(dropDup, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .join(qual, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        (!coalesce(col("dup"), lit(false))).as("s1"),
        (!coalesce(col("dup"), lit(false)) && col("doc_id") % 50 =!= 0 &&
          !coalesce(col("cont"), lit(false))).as("s2"),
        (!coalesce(col("dup"), lit(false)) && col("doc_id") % 50 =!= 0 &&
          !coalesce(col("cont"), lit(false)) && col("qual")).as("s3"))
  }

  def corpusBuildAudit(spark: SparkSession, dir: String): DataFrame =
    buildFlags(spark, dir)
      .agg(
        count(lit(1)).as("d0"), sum("n_tokens").as("t0"),
        sum(when(col("s1"), 1L).otherwise(0L)).as("d1"),
        sum(when(col("s1"), col("n_tokens")).otherwise(0L)).as("t1"),
        sum(when(col("s2"), 1L).otherwise(0L)).as("d2"),
        sum(when(col("s2"), col("n_tokens")).otherwise(0L)).as("t2"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("d3"),
        sum(when(col("s3"), col("n_tokens")).otherwise(0L)).as("t3"))
      .selectExpr(
        """stack(4,
          | 0, 'corpus',          d0, t0,
          | 1, 'dedup_canonical', d1, t1,
          | 2, 'decontaminate',   d2, t2,
          | 3, 'quality',         d3, t3) AS (stage, rule, n_docs, n_tokens)""".stripMargin)
      .orderBy("stage")

  /** F28 — `corpus_pack_chunks`: the packed SEQUENCES themselves —
    * F17's ship-the-artifact discipline applied to packing. F12/F20/F23
    * report bin AUDITS; the trainer consumes sequences. Every document
    * splits into capacity-bounded chunks WITH their text payload
    * (slice + reassemble — chunk boundaries in the same whitespace
    * accounting as F12, because only whitespace boundaries can cut the
    * TEXT exactly; F23's BPE bins budget counts, where subword
    * boundaries need no text), and the chunks LPT-pack through the
    * shared [[binAssigned]] core with F23's extended tie-break. Output:
    * one row per chunk with its bin — the trainer's input artifact,
    * not a report.
    *
    * Contract capacity 64 (F23's reasoning: the split path must
    * genuinely fire at every SF). The explode duplicates a doc's token
    * array once per capacity of tokens — output-proportional, the
    * unavoidable floor for a text-materializing packer.
    */
  def corpusPackChunks(spark: SparkSession, dir: String,
                       capacity: Long = 64): DataFrame = {
    val chunks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n"),
        explode(expr(s"sequence(0L, CAST((size(toks) - 1) div $capacity AS BIGINT))"))
          .as("chunk"))
      .select(col("doc_id"), col("chunk"),
        least(lit(capacity), col("n") - col("chunk") * capacity).as("n_tokens"),
        expr(s"concat_ws(' ', slice(toks, CAST(chunk * $capacity + 1 AS INT), $capacity))")
          .as("chunk_text"))
    binAssigned(chunks, capacity, col("n_tokens").desc, col("doc_id"), col("chunk"))
      .select("doc_id", "chunk", "bin", "n_tokens", "chunk_text")
      .orderBy("doc_id", "chunk")
  }

  /** The LPT pack core over an arbitrary (doc_id, n_tokens) frame —
    * shared between F12 (whitespace tokens) and F19's BPE-budget
    * variant so the bin policy can never drift between the two
    * accountings.
    */
  private[ops] def packBins(toks: DataFrame, capacity: Long): DataFrame =
    binAssigned(toks, capacity, col("n_tokens").desc, col("doc_id"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"),
        max("n_tokens").as("max_doc_tokens"))
      .orderBy("bin")

  /** The LPT bin assignment over an arbitrary token frame with an
    * explicit TOTAL sort order (F23's chunk frame needs the chunk
    * index in the tie-break — two capacity-sized chunks of one doc
    * would otherwise rank non-deterministically): bins =
    * ⌈Σtokens/capacity⌉ from one bounded driver aggregate, bin =
    * (global rank − 1) mod bins via [[DistRank]].
    */
  private[graft] def binAssigned(toks: DataFrame, capacity: Long,
      sort: org.apache.spark.sql.Column*): DataFrame = {
    // ⌈Σtokens / capacity⌉ — one bounded driver aggregate (2 longs).
    // An empty (or all-null) token frame packs to an EMPTY result, not
    // a failure: the DuckDB oracle of every consumer returns the empty
    // set on an all-empty corpus, and the engine must agree (loud-vs-
    // empty asymmetry would be a silent contract divergence).
    val totalRow = toks.agg(sum("n_tokens")).head()
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val nbins = math.max(1L, (total + capacity - 1) / capacity)
    DistRank.withGlobalRank(toks, "rank", sort: _*)
      .withColumn("bin", (col("rank") - 1) % nbins)
      .drop("rank")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_canonical" -> (dedupCanonical _),
    "text_decontaminate" -> ((s, d) => textDecontaminate(s, d)),
    "corpus_pack" -> ((s, d) => corpusPack(s, d)),
    "corpus_pack_chunks" -> ((s, d) => corpusPackChunks(s, d)),
    "corpus_build_audit" -> (corpusBuildAudit _))

  /** F2's quality-score expression, verbatim (shared with the
    * text_quality oracle's formula so the two can never drift in
    * meaning — the canonical pick depends on it).
    */
  private[ops] val qualitySql =
    """floor((least(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) / 50.0, 1.0) *
      |       (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 \t\n\x0B\f\r]', '', 'g')))
      |        / CAST(length(text) AS DOUBLE))) * 10000 + 0.5) / 10000""".stripMargin

  val oracles: Map[String, String] = Map(
    // D7's recursive-component oracle + F2's quality formula + per-
    // cluster argmax with the same (quality desc, doc_id asc) tie-break
    "dedup_canonical" ->
      s"""WITH RECURSIVE ${Dedup.minhashJacCtes},
         |edges AS (SELECT a, b FROM jac WHERE jaccard >= 0.5
         |          UNION ALL SELECT b, a FROM jac WHERE jaccard >= 0.5),
         |reach(node, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node),
         |clus AS (SELECT node AS doc_id, min(lab) AS cluster FROM reach GROUP BY 1),
         |q AS (SELECT doc_id, $qualitySql AS quality_score FROM documents),
         |m AS (
         |  SELECT c.cluster, c.doc_id, q.quality_score,
         |    row_number() OVER (PARTITION BY c.cluster
         |      ORDER BY q.quality_score DESC, c.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY c.cluster) AS n_members
         |  FROM clus c JOIN q USING (doc_id))
         |SELECT cluster, doc_id AS keep_id, quality_score AS keep_quality,
         |  n_members, n_members - 1 AS n_dropped
         |FROM m WHERE rn = 1 AND n_members >= 2 ORDER BY cluster""".stripMargin,
    // same shingling + RollHash64 as the minhash oracle; the eval index
    // is DISTINCT hashes, overlap counts a train doc's hashes in it
    "text_decontaminate" ->
      s"""WITH tok AS (
         | SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tokens FROM documents),
         |sh AS (
         | SELECT doc_id, list_distinct([concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2])
         |   FOR i IN range(1, greatest(len(tokens) - 3, 0) + 2)]) AS shingles
         | FROM tok),
         |expl AS (SELECT doc_id, len(shingles) AS n_shingles, unnest(shingles) AS shingle FROM sh),
         |h AS (SELECT doc_id, n_shingles, ${Dedup.rollSql("shingle")} AS hu FROM expl),
         |ev AS (SELECT DISTINCT hu FROM h WHERE doc_id % 50 = 0),
         |hits AS (
         |  SELECT t.doc_id, t.n_shingles, count(*) AS n_shared
         |  FROM h t JOIN ev USING (hu)
         |  WHERE t.doc_id % 50 <> 0
         |  GROUP BY 1, 2)
         |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
         |  n_shared,
         |  floor((CAST(n_shared AS DOUBLE) / n_shingles) * 10000 + 0.5) / 10000 AS overlap
         |FROM hits ORDER BY overlap DESC, doc_id LIMIT 20""".stripMargin,
    // sorted round-robin replay: rank by (tokens desc, doc_id), bins
    // from the same ceil-total scalar, identical mod arithmetic
    "corpus_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (SELECT CAST((sum(n_tokens) + 2047) // 2048 AS BIGINT) AS nbins FROM t),
        |r AS (
        |  SELECT n_tokens,
        |    (row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1) % p.nbins AS bin
        |  FROM t CROSS JOIN p)
        |SELECT bin, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
        |  CAST(max(n_tokens) AS BIGINT) AS max_doc_tokens
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // the chunk explode WITH its 1-based inclusive list slice — both
    // engines cut the identical token ranges and reassemble with ' '
    "corpus_pack_chunks" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS t FROM documents),
        |ch0 AS (
        |  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
        |    unnest(range(0, (len(t) - 1) // 64 + 1)) AS chunk
        |  FROM tok),
        |ch AS (
        |  SELECT doc_id, CAST(chunk AS BIGINT) AS chunk,
        |    least(64, n - chunk * 64) AS n_tokens,
        |    array_to_string(t[chunk * 64 + 1 : chunk * 64 + 64], ' ') AS chunk_text
        |  FROM ch0),
        |p AS (SELECT CAST((sum(n_tokens) + 63) // 64 AS BIGINT) AS nbins FROM ch),
        |r AS (
        |  SELECT doc_id, chunk, n_tokens, chunk_text,
        |    (row_number() OVER (ORDER BY n_tokens DESC, doc_id, chunk) - 1)
        |      % p.nbins AS bin
        |  FROM ch CROSS JOIN p)
        |SELECT doc_id, chunk, CAST(bin AS BIGINT) AS bin,
        |  CAST(n_tokens AS BIGINT) AS n_tokens, chunk_text
        |FROM r ORDER BY doc_id, chunk""".stripMargin,
    // the build funnel stitched from the CONSTITUENT oracles' own CTE
    // chains: D2's signature pipeline + D7/D10's reach/canonical replay
    // (shared names verbatim), D11's overlap from the same h0/sh, F15's
    // flags with the identical quantized thresholds
    "corpus_build_audit" ->
      s"""WITH RECURSIVE ${Dedup.minhashJacCtes},
         |t AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens FROM tok),
         |edges AS (SELECT a, b FROM jac WHERE jaccard >= 0.5
         |          UNION ALL SELECT b, a FROM jac WHERE jaccard >= 0.5),
         |reach(node, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node),
         |clus AS (SELECT node AS doc_id, min(lab) AS cluster FROM reach GROUP BY 1),
         |q AS (SELECT doc_id, $qualitySql AS quality_score FROM documents),
         |m AS (
         |  SELECT c.cluster, c.doc_id,
         |    row_number() OVER (PARTITION BY c.cluster
         |      ORDER BY q.quality_score DESC, c.doc_id) AS rn
         |  FROM clus c JOIN q USING (doc_id)),
         |s1 AS (SELECT doc_id FROM m WHERE rn = 1),
         |nsh AS (SELECT doc_id, len(shingles) AS n_shingles FROM sh),
         |ev AS (SELECT DISTINCT hu FROM h0 WHERE doc_id % 50 = 0),
         |chits AS (
         |  SELECT e.doc_id, count(*) AS n_shared FROM h0 e JOIN ev USING (hu)
         |  WHERE e.doc_id % 50 <> 0 GROUP BY 1),
         |cont AS (
         |  SELECT c.doc_id FROM chits c JOIN nsh USING (doc_id)
         |  WHERE floor((CAST(n_shared AS DOUBLE) / n_shingles) * 10000 + 0.5) / 10000 >= 0.2),
         |s2 AS (SELECT doc_id FROM s1 WHERE doc_id % 50 <> 0
         |       AND doc_id NOT IN (SELECT doc_id FROM cont)),
         |quni AS (
         |  SELECT doc_id, max(cnt) AS top_uni FROM (
         |    SELECT doc_id, count(*) AS cnt
         |    FROM (SELECT doc_id, unnest(tokens) AS tt FROM tok) GROUP BY doc_id, tt)
         |  GROUP BY doc_id),
         |flags AS (
         |  SELECT d.doc_id,
         |    (d.lang = 'en') AS r1,
         |    (len(k.tokens) >= 30) AS r2,
         |    ($qualitySql >= 0.85) AS r3,
         |    (floor((CAST(u.top_uni AS DOUBLE) / len(k.tokens)) * 10000 + 0.5) / 10000 <= 0.12) AS r4
         |  FROM documents d JOIN tok k USING (doc_id) JOIN quni u USING (doc_id)),
         |s3 AS (SELECT s2.doc_id FROM s2 JOIN flags USING (doc_id)
         |       WHERE r1 AND r2 AND r3 AND r4),
         |res AS (
         |  SELECT 0 AS stage, 'corpus' AS rule, count(*) AS n_docs,
         |    coalesce(sum(n_tokens), 0) AS n_toks FROM t
         |  UNION ALL
         |  SELECT 1, 'dedup_canonical', count(*), coalesce(sum(n_tokens), 0)
         |  FROM s1 JOIN t USING (doc_id)
         |  UNION ALL
         |  SELECT 2, 'decontaminate', count(*), coalesce(sum(n_tokens), 0)
         |  FROM s2 JOIN t USING (doc_id)
         |  UNION ALL
         |  SELECT 3, 'quality', count(*), coalesce(sum(n_tokens), 0)
         |  FROM s3 JOIN t USING (doc_id))
         |SELECT CAST(stage AS INTEGER) AS stage, rule,
         |  CAST(n_docs AS BIGINT) AS n_docs, CAST(n_toks AS BIGINT) AS n_tokens
         |FROM res ORDER BY stage""".stripMargin)
}
