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

  test("G2b: native session_window finds the same number of sessions as the lag formulation") {
    // boundary semantics differ only when a gap is EXACTLY 30 minutes
    // (probability ~0 on continuous timestamps) — session counts match
    val native = Events.streamSessionWindow(spark, sf).count()
    val lagged = Events.streamSessionize(spark, sf).count()
    assert(native == lagged)
  }

  test("G2b: duplicate timestamps never split a session; the gap boundary is MEASURED inclusive") {
    // the 4x rehearsal's find (round 11): with every event duplicated,
    // the ORACLE's row-flagged running sum could land a session boundary
    // mid-tie (4+4 replayed as 7+1) — session membership is a property
    // of the timestamp VALUE. Pinned here on constructed boundaries:
    //  - user 7: 4 events at t0, 4 at exactly t0+30:00 — session_window
    //    MERGES the exact-gap event (boundary-inclusive): ONE session
    //    of 8. This refuted the operator's original "end-exclusive"
    //    doc note and the oracle's `>=` (latent: no corpus has an
    //    adjacent pair at exactly 1800 s).
    //  - user 8: 4 events at t0, 4 at t0+30:01 — over the gap: TWO
    //    sessions of 4, never 7+1/1+7 however ties are ordered.
    val dir = Scratch.dir("ssw-ties")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    val atGap = java.sql.Timestamp.valueOf("2024-01-01 12:30:00")
    val overGap = java.sql.Timestamp.valueOf("2024-01-01 12:30:01")
    import scala.jdk.CollectionConverters._
    val rows = (1 to 4).flatMap { i =>
      Seq(org.apache.spark.sql.Row(i.toLong, t0, 7L, "click", 1.0, "{}"),
        org.apache.spark.sql.Row(i.toLong + 4, atGap, 7L, "click", 1.0, "{}"),
        org.apache.spark.sql.Row(i.toLong + 8, t0, 8L, "click", 1.0, "{}"),
        org.apache.spark.sql.Row(i.toLong + 12, overGap, 8L, "click", 1.0, "{}"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val sessions = Events.streamSessionWindow(spark, dir).collect()
    val byUser = sessions.groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_events")).toSeq.sorted).toMap
    assert(byUser(7L) == Seq(8L),
      s"exact-gap event did not merge: ${sessions.mkString(", ")}")
    assert(byUser(8L) == Seq(4L, 4L),
      s"tied over-gap boundary split sessions: ${sessions.mkString(", ")}")
    // the lag twin draws the SAME boundary (strict > on the gap)
    val lagged = Events.streamSessionize(spark, dir).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_events")).toSeq.sorted).toMap
    assert(lagged == byUser)
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

class StreamingDedupSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("G10: windowed agg state runs on the RocksDB state store backend") {
    // RocksDB is the state backend that survives 100 TB streaming state
    // (bounded heap, incremental checkpoints); the plan must be
    // backend-agnostic. Isolated session: provider is a session conf.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = Events.startStreamingWindowAgg(s2, sf, "rocksdb_sink")
    try {
      q.processAllAvailable()
      val streamed = s2.sql(
        "SELECT * FROM rocksdb_sink ORDER BY window_start, event_type")
        .collect().map(_.toSeq)
      val batch = Events.streamWindowAgg(s2, sf).collect().map(_.toSeq)
      assert(streamed.nonEmpty)
      assert(streamed.sameElements(batch),
        "RocksDB-backed state must produce the same windows as the batch twin")
    } finally q.stop()
  }

  test("G4: watermarked streaming dedup keeps one row per event_id from a doubled feed") {
    val q = graft.streaming.StreamingDedup.start(spark, sf, "stream_dedup_sink")
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT count(*) FROM stream_dedup_sink").head().getLong(0)
      val expected = graft.tables.Tables.events(spark, sf)
        .select("event_id").distinct().count()
      assert(streamed == expected)
    } finally q.stop()
  }

  test("G11: DQ alert sink delivers violation rows exactly once under batch redelivery") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_dq_src").toString
    val alerts = java.nio.file.Files.createTempDirectory("graft_dq_alerts").toString + "/t"
    Seq(
      (1L, 10L, "view", 1.5),
      (2L, 11L, null.asInstanceOf[String], 2.0),
      (3L, 12L, "purchase", -4.0),
      (4L, 13L, "view", 0.0),
      (5L, 14L, "click", 3.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(src)
    graft.streaming.DqAlertSink.run(spark, src, alerts)
    // uncheckpointed second run re-lands the same batch ids — redelivery
    graft.streaming.DqAlertSink.run(spark, src, alerts)
    def alertRows() = spark.read.parquet(alerts)
      .filter(col("check_name") =!= "_batch_checked")
      .select("check_name", "n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(alertRows() == Set(("nonpositive_value", 2L), ("null_event_type", 1L)),
      s"unexpected alert rows: ${alertRows()}")
    // exactly-once: redelivery replaced its own partition, never appended
    // (2 violations + the per-batch checked marker)
    assert(spark.read.parquet(alerts).count() == 3)
    // redelivery of a CORRECTED batch must clear its stale alerts — the
    // always-written marker row is what forces the partition overwrite
    Seq((1L, 10L, "view", 1.5), (5L, 14L, "click", 3.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(src)
    graft.streaming.DqAlertSink.run(spark, src, alerts)
    assert(alertRows().isEmpty,
      s"stale alerts survived a clean redelivery: ${alertRows()}")
  }

  test("G12: kill-and-restart from checkpoint loses and duplicates nothing (RocksDB state)") {
    import org.apache.spark.sql.functions._
    // RocksDB backend — the state store that has to survive the restart
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val root = java.nio.file.Files.createTempDirectory("graft_g12").toString
    val (src, out, ckpt) = (s"$root/src", s"$root/out/t", s"$root/ckpt")
    val ev = graft.tables.Tables.events(s2, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // time-split prefix/suffix so the watermark stays honest across the
    // restart; the hour straddling the midpoint has state in BOTH halves
    // — its final count is only right if the checkpoint restores it
    val mm = ev.agg(min("ts"), max("ts")).head()
    val mid = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
    ev.filter(col("ts") <= mid).repartition(2).write.parquet(src)
    val q1 = graft.streaming.CheckpointRestart.start(s2, src, out, ckpt)
    try q1.processAllAvailable() finally q1.stop() // "crash" after the prefix
    // suffix arrives while the query is down (the reference's next cron
    // tick); new part files in the same source dir
    ev.filter(col("ts") > mid).repartition(2).write.mode("append").parquet(src)
    val q2 = graft.streaming.CheckpointRestart.start(s2, src, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val recovered = graft.streaming.CheckpointRestart.finalSink(s2, out)
      .select("window_start", "event_type", "n_events", "sum_value")
    val batch = graft.streaming.Events.streamWindowAgg(s2, sf)
    assert(recovered.count() > 0)
    // exact equality against the batch twin: a reprocessed prefix would
    // double counts, lost state would undercount the straddling hour
    assert(recovered.exceptAll(batch).isEmpty && batch.exceptAll(recovered).isEmpty,
      "restarted stream diverged from the batch twin")
  }

  test("G13: three Trigger.AvailableNow cron ticks over a growing source equal the batch twin") {
    import org.apache.spark.sql.functions._
    // the reference's lifecycle: a scheduled entrypoint drains whatever
    // arrived since the last run and EXITS; offsets/window state carry
    // across invocations only through the checkpoint. Same RocksDB
    // backend as G12 — the tick path must resume RocksDB state too.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val root = java.nio.file.Files.createTempDirectory("graft_g13").toString
    val (src, out, ckpt) = (s"$root/src", s"$root/out/t", s"$root/ckpt")
    val ev = graft.tables.Tables.events(s2, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val mm = ev.agg(min("ts"), max("ts")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
    // "day" 1/2/3 arrive between ticks; cut hours straddle the splits so
    // their final counts are only right if state survives the exits
    ev.filter(col("ts") <= c1).repartition(2).write.parquet(src)
    graft.streaming.CheckpointRestart.tick(s2, src, out, ckpt)
    ev.filter(col("ts") > c1 && col("ts") <= c2).repartition(2)
      .write.mode("append").parquet(src)
    graft.streaming.CheckpointRestart.tick(s2, src, out, ckpt)
    ev.filter(col("ts") > c2).repartition(2).write.mode("append").parquet(src)
    graft.streaming.CheckpointRestart.tick(s2, src, out, ckpt)
    val drained = graft.streaming.CheckpointRestart.finalSink(s2, out)
      .select("window_start", "event_type", "n_events", "sum_value")
    val batch = graft.streaming.Events.streamWindowAgg(s2, sf)
    assert(drained.count() > 0)
    assert(drained.exceptAll(batch).isEmpty && batch.exceptAll(drained).isEmpty,
      "AvailableNow tick sequence diverged from the batch twin")
  }

  test("G14: a tick of WATERMARK-LATE data is dropped — the drain equals the on-time-only twin") {
    import org.apache.spark.sql.functions._
    // The one lifecycle question G12/G13 left open: what happens when a
    // cron tick delivers data OLDER than the watermark bound established
    // by earlier ticks? Contract (update mode + 2h watermark): windows
    // whose end precedes the checkpointed watermark are already evicted,
    // so late rows into them are DROPPED — the final sink equals the
    // batch twin over the ON-TIME rows only, never a silently-partial
    // blend. The spec pins that semantics exactly.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val root = java.nio.file.Files.createTempDirectory("graft_g14").toString
    val (src, out, ckpt) = (s"$root/src", s"$root/out/t", s"$root/ckpt")
    val ev = graft.tables.Tables.events(s2, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val mm = ev.agg(min("ts"), max("ts")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val c = lo + 2 * (hi - lo) / 3
    // precondition for total lateness: every early-cut window END
    // (ts ≤ c, +1h window) must precede the tick-1 watermark (hi − 2h)
    assert(c + 3L * 3600 * 1000000000 < hi,
      "events span too short for the late-tick scenario")
    // tick 1 drains the LAST third — the checkpoint now carries a
    // watermark 2h below hi
    ev.filter(col("ts") > c).repartition(2).write.parquet(src)
    graft.streaming.CheckpointRestart.tick(s2, src, out, ckpt)
    // tick 2 delivers the first two thirds — ALL beyond-watermark late
    ev.filter(col("ts") <= c).repartition(2).write.mode("append").parquet(src)
    graft.streaming.CheckpointRestart.tick(s2, src, out, ckpt)
    val drained = graft.streaming.CheckpointRestart.finalSink(s2, out)
      .select("window_start", "event_type", "n_events", "sum_value")
    // the on-time-only batch twin (same quantized-agg shape)
    def twin(rows: org.apache.spark.sql.DataFrame) = rows
      .select(expr("timestamp_micros(ts div 1000)").as("event_ts"),
        col("event_type"), col("value"))
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100000000L + lit(0.5)).cast("long")).as("sv_q"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"),
        graft.ops.OracleRound.r4b(col("sv_q") / 100000000.0).as("sum_value"))
    val onTime = twin(ev.filter(col("ts") > c))
    val everything = twin(ev)
    assert(drained.count() > 0)
    assert(drained.exceptAll(onTime).isEmpty && onTime.exceptAll(drained).isEmpty,
      "late tick leaked beyond-watermark rows into the sink (or dropped on-time ones)")
    // and the scenario is non-vacuous: the late data would have changed
    // the answer had it been admitted
    assert(everything.exceptAll(onTime).count() > 0,
      "scenario degenerate: late rows wouldn't have changed any window")
  }

  test("G5: foreachBatch upsert + latest-wins read equals the source, idempotent on redelivery") {
    val out = java.nio.file.Files.createTempDirectory("graft_stream_upsert").toString
    graft.streaming.StreamingUpsert.run(spark, sf, out)
    // simulate batch redelivery: a second uncheckpointed run re-lands the
    // same batch ids — the dynamic partition overwrite must replace, not
    // append, so even the RAW path has no duplicates
    graft.streaming.StreamingUpsert.run(spark, sf, out)
    val src = graft.tables.Tables.events(spark, sf)
    assert(spark.read.parquet(out).count() == src.count())
    val merged = graft.sources.Sources.readLatest(spark, out, Seq("event_id"))
    assert(merged.count() == src.count())
    val srcSum = src.agg(sum("event_id")).head().getLong(0)
    val mergedSum = merged.agg(sum("event_id")).head().getLong(0)
    assert(srcSum == mergedSum)
  }
}

class StatefulStreamingSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("G6: stream-stream interval join emits exactly the batch join's pairs") {
    val q = graft.streaming.StreamStreamJoin.start(spark, sf, "stream_join_sink")
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT e_id, c_id FROM stream_join_sink")
      val batch = graft.streaming.StreamStreamJoin.batch(spark, sf)
      assert(streamed.count() > 0, "join emitted nothing")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream-stream join pairs != batch join pairs")
    } finally q.stop()
  }

  test("G3b: flatMapGroupsWithState sessionization matches batch sessions") {
    import org.apache.spark.sql.functions._
    val q = graft.streaming.StatefulSessionize.start(spark, sf, "stateful_sess_sink")
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM stateful_sess_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.streaming.Events.streamSessionize(spark, sf)
        .select(col("user_id"), col("session_id"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("G7: streaming funnel pattern detection matches the batch twin") {
    import org.apache.spark.sql.functions._
    val q = graft.streaming.StreamingFunnel.start(spark, sf, "funnel_sink")
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM funnel_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.streaming.StreamingFunnel.batch(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch)
      // at most one match per user, click strictly inside (0, 7 days]
      assert(streamed.groupBy(_._1).forall(_._2.size == 1))
      assert(streamed.forall { case (_, s, c) =>
        c > s && c - s <= graft.streaming.StreamingFunnel.windowUs })
    } finally q.stop()
  }
}

class SkewSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("salted join equals the plain join") {
    import org.apache.spark.sql.functions._
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val o = graft.tables.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, "l_orderkey")
      .agg(count(lit(1)), sum("l_extendedprice")).head()
    val salted = graft.ops.Skew.saltedEquiJoin(li, o, "l_orderkey",
        distributor = col("l_linenumber"), numSalts = 8)
      .agg(count(lit(1)), sum("l_extendedprice")).head()
    assert(plain.getLong(0) == salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-6)
  }
}
