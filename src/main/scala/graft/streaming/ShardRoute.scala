package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.tables.Tables

/** G17 — `stream_shard_route`: I16's shard assignment IN the ingest
  * stream — the last stage of the streaming ingest cascade (G15 admits
  * on novelty, G16 on quality, G17 routes the survivors to their
  * training shard as they arrive, instead of re-sharding the corpus
  * nightly). Every arriving micro-batch is projected through the
  * SHARED shard row ([[graft.sources.SourceQueries.shardRouteCols]] —
  * one definition of the hash draw and the token accounting, so the
  * live route and the batch layout can never disagree about where a
  * document lives), and lands batchId-keyed (G15's idempotent
  * at-least-once overwrite discipline).
  *
  * The contract query aggregates the shard manifest FROM THE SINK and
  * shares I17's oracle VERBATIM — the driver hash-proves that routing
  * documents one micro-batch at a time lands the byte-identical
  * DUAL-accounting manifest the batch shard writer produces.
  *
  * Scale shape: per micro-batch one arrival-sized codegen projection —
  * no joins, no shuffle, no state store; the route is a pure function
  * of doc_id, which is exactly why it streams.
  */
object ShardRoute {

  private val drained = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Route one micro-batch and overwrite its batchId-keyed partition.
    * Exposed so the spec can drive a split source and a redelivery.
    */
  private[graft] def routeBatch(batch: DataFrame, nshards: Int,
                                sink: String, batchId: Long): Unit =
    batch.select(graft.sources.SourceQueries.shardRouteColsBpe(nshards): _*)
      .write.mode("overwrite").parquet(s"$sink/batch=$batchId")

  private[graft] def drain(spark: SparkSession, srcDir: String, glob: String,
                           sink: String, ckpt: String, nshards: Int): Unit = {
    val q = spark.readStream
      .schema(Tables.load(spark, srcDir, "documents").schema)
      .option("pathGlobFilter", glob)
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        routeBatch(batch, nshards, sink, batchId)
      }
      .start()
    q.awaitTermination()
  }

  /** Drain once per JVM per sf dir; later invocations read the sink. */
  private def sinkPath(spark: SparkSession, dir: String): String =
    drained.computeIfAbsent(dir, _ => {
      val base = graft.Scratch.dir("shard_route")
      val (sink, ckpt) = (s"$base/sink", s"$base/ckpt")
      drain(spark, dir, "documents.parquet", sink, ckpt, 8)
      sink
    })

  /** The DUAL-accounting manifest aggregated from the routed sink —
    * I17's oracle verbatim: whitespace AND subword budgets per shard
    * (round-9 directive #5: the loader budgets in subwords, so the
    * STREAMED manifest must carry the same dual accounting the batch
    * hand-off does).
    */
  private[graft] def manifestOf(routed: DataFrame): DataFrame =
    routed.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("n_bpe_tokens").as("n_bpe_tokens"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("shard")

  def streamShardRoute(spark: SparkSession, dir: String): DataFrame =
    manifestOf(spark.read.parquet(sinkPath(spark, dir)).drop("batch"))
}
