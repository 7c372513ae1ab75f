package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps.rollhash64
import graft.tables.Tables

/** One sampled frame's extracted features (H2 output row). */
case class FrameFeature(doc_id: Long, frame_idx: Int, frame_size: Int,
                        feature: Long)

/** Multimodal (binary-column) plumbing — SURVEY.md §2.H.
  *
  * Media handling at 100 TB means: payloads as opaque `binary` columns
  * with typed metadata alongside, decode/feature-extract as batched
  * per-partition functions. No codecs ship in this container, so the
  * decode step is a clearly-marked deterministic STUB — but the
  * Spark-side plumbing (binary schema, magic-byte sniffing, frame
  * slicing, partition-iterator batching, typed Encoder output) is real
  * and tested.
  */
object Multimodal {

  /** Documents with a synthetic binary payload (utf-8 text bytes). At
    * production scale this column arrives from the source parquet as real
    * image/audio bytes; everything downstream treats it as opaque binary.
    */
  private def withPayload(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** H1 — binary metadata extraction: payload size, leading-bytes "magic"
    * sniff, and a coarse type classification — all pure projections over
    * the binary column (pushdown-friendly; the payload itself is never
    * interpreted).
    */
  def mmBinaryMeta(spark: SparkSession, dir: String): DataFrame =
    withPayload(spark, dir)
      .select(
        col("doc_id"),
        length(col("payload")).as("payload_size"),
        hex(substring(col("payload"), 1, 4)).as("magic"),
        when(length(col("payload")) > 300, lit("large"))
          .when(length(col("payload")) > 150, lit("medium"))
          .otherwise(lit("small")).as("size_class"))
      .orderBy("doc_id")

  /** H2 — deterministic frame sampling + stub feature extraction.
    *
    * Real plumbing: 64-byte frames sliced from the binary payload, every
    * 4th frame sampled (`frame_idx % 4 == 0`), frames batched through a
    * per-partition iterator (the `mapPartitions` shape a real decoder —
    * JNI codec, ONNX session — needs: one expensive init per partition,
    * then streaming batches). STUB: `decodeFrame` fakes the decoded
    * feature as a deterministic byte-sum hash; swap its body for a real
    * codec call in production.
    */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val frames = withPayload(spark, dir)
      .select(col("doc_id"),
        posexplode(expr(
          """transform(sequence(0, (length(payload) - 1) div 64),
            |  i -> substring(payload, i * 64 + 1, 64))""".stripMargin))
          .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % 4 === 0)
    frames
      .mapPartitions { it =>
        // per-partition init happens HERE once (e.g. codec handle) —
        // stubbed as a no-op because no codecs ship in this container.
        it.map { row =>
          val docId = row.getLong(0)
          val idx = row.getInt(1)
          val bytes = row.getAs[Array[Byte]](2)
          FrameFeature(docId, idx, bytes.length, decodeFrame(bytes))
        }
      }(Encoders.product[FrameFeature])
      .orderBy("doc_id", "frame_idx")
      .toDF()
  }

  /** STUB decode: deterministic fake "feature" (polynomial byte hash).
    * A real deployment replaces this body with the codec/model call; the
    * signature (bytes in, fixed-width feature out) is the real contract.
    */
  private def decodeFrame(bytes: Array[Byte]): Long =
    bytes.foldLeft(1125899906842597L)((h, b) => 31 * h + (b & 0xff))

  /** H3 — per-type payload statistics: the corpus-composition report a
    * multimodal ingest runs first (how many assets per sniffed type, how
    * many bytes, size distribution). Exact integer byte counts through a
    * ≤|types|-group aggregate with map-side partials; the only doubles
    * are two final divisions.
    */
  def mmPayloadStats(spark: SparkSession, dir: String): DataFrame =
    withPayload(spark, dir)
      .select(
        when(length(col("payload")) > 300, lit("large"))
          .when(length(col("payload")) > 150, lit("medium"))
          .otherwise(lit("small")).as("size_class"),
        length(col("payload")).cast("long").as("sz"))
      .groupBy("size_class")
      .agg(count(lit(1)).as("n_assets"),
        sum("sz").as("total_bytes"),
        min("sz").as("min_bytes"),
        max("sz").as("max_bytes"),
        OracleRound.r4b(sum("sz").cast("double") / count(lit(1))).as("avg_bytes"))
      .orderBy("size_class")

  /** H4 — cross-payload chunk dedup (the storage/backup-dedup
    * primitive): every 64-byte frame of every payload hashed, pairs of
    * documents sharing ≥1 identical chunk reported with the shared
    * count. Same equi-join-on-hash scale shape as D8; on real media this
    * finds re-encoded containers sharing embedded streams. Pure binary
    * plumbing — the payload is never interpreted.
    */
  def mmChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    // self-joined below; unpersisted, the explode+hash scan would run
    // on BOTH sides (ReusedExchange is not guaranteed under AQE). The
    // persisted state is 16 B/row — same discipline as D2's signature
    // table, built once per sf dir via the bounded memo; the raw frames
    // themselves are never cached.
    val frames = graft.QueryCaches.memo(s"mm.chunk:$dir") {
      withPayload(spark, dir)
        .select(col("doc_id"),
          explode(expr(
            """transform(sequence(0, (length(payload) - 1) div 64),
              |  i -> substring(payload, i * 64 + 1, 64))""".stripMargin)).as("frame"))
        .select(col("doc_id"), rollhash64(col("frame")).as("h"))
        .distinct()
        .persist()
    }
    frames.as("l").join(frames.as("r"), col("l.h") === col("r.h") &&
        col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .agg(count(lit(1)).as("shared_chunks"))
      .orderBy("a", "b")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (mmBinaryMeta _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_payload_stats" -> (mmPayloadStats _),
    "mm_chunk_dedup" -> (mmChunkDedup _))

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id,
        | octet_length(encode(text)) AS payload_size,
        | substr(hex(encode(text)), 1, 8) AS magic,
        | CASE WHEN octet_length(encode(text)) > 300 THEN 'large'
        |      WHEN octet_length(encode(text)) > 150 THEN 'medium'
        |      ELSE 'small' END AS size_class
        |FROM documents ORDER BY doc_id""".stripMargin,
    // replays the frame slicing + stub byte-hash "decode" on raw OCTETS:
    // frames slice the hex image of the encoded payload (64 bytes = 128
    // hex chars) and the fold consumes hex pairs, so the replay is exact
    // for arbitrary payloads — no ASCII/chars-equal-bytes assumption,
    // matching the Spark side's binary slicing + byte hash. Edge parity
    // checked: both `div` and `//` truncate toward zero, so an EMPTY
    // payload yields exactly one empty frame (hash = fold seed) on BOTH
    // engines — no floor-vs-truncate divergence.
    "mm_frame_sample" ->
      s"""WITH fr AS (
         | SELECT doc_id,
         |  CAST(unnest(range(0, (octet_length(encode(text)) - 1) // 64 + 1)) AS INT) AS frame_idx,
         |  hex(encode(text)) AS hx
         | FROM documents),
         |sampled AS (
         | SELECT doc_id, frame_idx, substr(hx, frame_idx * 128 + 1, 128) AS fh
         | FROM fr WHERE frame_idx % 4 = 0)
         |SELECT doc_id, frame_idx, frame_size, ${Dedup.wrapSql("h")} AS feature
         |FROM (
         | SELECT doc_id, frame_idx, CAST(length(fh) // 2 AS INT) AS frame_size,
         |  ${Dedup.rollHexSql("fh", "length(fh) // 2")} AS h
         | FROM sampled)
         |ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_chunk_dedup" ->
      s"""WITH fr AS (
         | SELECT doc_id,
         |  CAST(unnest(range(0, (octet_length(encode(text)) - 1) // 64 + 1)) AS INT) AS frame_idx,
         |  hex(encode(text)) AS hx
         | FROM documents),
         |fs AS (
         | SELECT DISTINCT doc_id, ${Dedup.wrapSql(Dedup.rollHexSql("fh", "length(fh) // 2"))} AS h
         | FROM (SELECT doc_id, substr(hx, frame_idx * 128 + 1, 128) AS fh FROM fr))
         |SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS shared_chunks
         |FROM fs l JOIN fs r ON l.h = r.h AND l.doc_id < r.doc_id
         |GROUP BY 1, 2 ORDER BY a, b""".stripMargin,
    "mm_payload_stats" ->
      """WITH p AS (
        |  SELECT CASE WHEN octet_length(encode(text)) > 300 THEN 'large'
        |              WHEN octet_length(encode(text)) > 150 THEN 'medium'
        |              ELSE 'small' END AS size_class,
        |         octet_length(encode(text)) AS sz
        |  FROM documents)
        |SELECT size_class, count(*) AS n_assets,
        |       CAST(sum(sz) AS BIGINT) AS total_bytes,
        |       CAST(min(sz) AS BIGINT) AS min_bytes,
        |       CAST(max(sz) AS BIGINT) AS max_bytes,
        |       floor((CAST(sum(sz) AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000 AS avg_bytes
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)
}
