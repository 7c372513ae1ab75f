package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.streaming.Events

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("G3: streaming window agg equals the batch formulation") {
    val q = Events.startStreamingWindowAgg(spark, sf, "stream_test_sink")
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT * FROM stream_test_sink ORDER BY window_start, event_type")
        .collect().map(_.toSeq)
      val batch = Events.streamWindowAgg(spark, sf).collect().map(_.toSeq)
      assert(streamed.nonEmpty)
      assert(streamed.sameElements(batch),
        s"streaming (${streamed.length} rows) != batch (${batch.length} rows)")
    } finally q.stop()
  }

  test("stream_sessionize: session ids are dense per user starting at 1") {
    val df = Events.streamSessionize(spark, sf)
    val bad = df.groupBy("user_id")
      .agg(min("session_id").as("lo"), max("session_id").as("hi"),
        countDistinct("session_id").as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("mm_binary_meta payload size matches n_chars for ascii text") {
    val df = Multimodal.mmBinaryMeta(spark, sf)
    val docs = graft.tables.Tables.documents(spark, sf)
    // synthetic corpus may include non-ascii (zh); sizes must be >= n_chars
    val joined = df.join(docs, "doc_id")
      .filter(col("payload_size") < col("n_chars"))
    assert(joined.count() == 0)
  }

  test("mm_frame_sample: samples every 4th 64-byte frame deterministically") {
    val df = Multimodal.mmFrameSample(spark, sf)
    assert(df.filter(col("frame_idx") % 4 =!= 0).count() == 0)
    assert(df.filter(col("frame_size") > 64).count() == 0)
    val again = Multimodal.mmFrameSample(spark, sf)
    assert(df.collect().map(_.toSeq).sameElements(again.collect().map(_.toSeq)))
  }
}
