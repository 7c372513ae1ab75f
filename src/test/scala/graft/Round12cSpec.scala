package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup2, GraphAnn, Similarity}
import graft.sources.Sources
import graft.tables.Tables

/** Round-12 stretch: the MULTI-DAY LIFECYCLE SOAK (r11 verdict stretch
  * #9). Every maintenance verb is individually proven — D13/G15 admit,
  * E12 frozen-codebook append, E18/G18 graph insert, I20 concurrent
  * commits, I15 compact/vacuum, I21 manifest reads — but rounds 1–11
  * never ran them INTERLEAVED: three simulated days where each day
  * admits a doc slice, appends a vector slice to the PQ artifact,
  * inserts an arrival slice into the graph, and double-commits its
  * verdicts to the lakehouse log (two racing writers), with a
  * compact+vacuum mid-soak. The final state of every artifact must
  * equal the corresponding ONE-SHOT batch build — the per-vector /
  * per-doc determinism arguments say interleaving is invisible, and
  * this spec is where that claim is actually exercised.
  */
class Round12cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def sf = TestSpark.sf

  private def daySlice(idCol: String, day: Int) =
    pmod(col(idCol).divide(lit(10)).cast("long"), lit(3)) === day

  test("three interleaved maintenance days equal the one-shot builds") {
    import spark.implicits._
    val soak = Scratch.dir("soak")
    val docs = Tables.documents(spark, sf)
    val embs = Tables.embeddings(spark, sf)

    // standing artifacts, day 0 dawn: PQ base (E12's base predicate),
    // empty verdict sink, empty log
    Similarity.buildPqBase(spark, sf, s"$soak/pq", 8, 16)
    val cb = Similarity.readCodebook(spark, s"$soak/pq")
    val (logPath, basePath) = (s"$soak/log", s"$soak/compacted")
    var dayEdges = Seq.empty[org.apache.spark.sql.DataFrame]

    (0 to 2).foreach { day =>
      // 1. admission of the day's arrivals against the standing index
      //    (G15's batch body — the day IS a micro-batch)
      val dayDocs = docs.filter(daySlice("doc_id", day))
      graft.streaming.CorpusAdmit.admitBatch(
        dayDocs, sf, s"$soak/verdicts", day.toLong)
      // 2. frozen-codebook PQ append of the day's delta vectors
      Similarity.pqOrdsFor(
          embs.filter(col("vec_id") % 10 === 0 && daySlice("vec_id", day)),
          8, cb)
        .write.mode("append").parquet(s"$soak/pq/codes")
      // 3. graph insert of the day's arrivals (G18's batch body)
      dayEdges :+= GraphAnn.streamInsertBatch(
        embs.filter(daySlice("vec_id", day)), sf).localCheckpoint()
      // 4. TWO writers race the day's verdicts into the log — I20's
      //    claim protocol sequences them; content-identical commits
      //    make the latest-wins state invariant to who wins
      val vd = spark.read.parquet(s"$soak/verdicts/batch=$day")
        .withColumn("day", lit(day.toLong))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val commits = Seq(s"w1-d$day", s"w2-d$day").map(w =>
        Future(Sources.commitBatchWithStats(vd, logPath, w, "doc_id")))
      val ids = commits.map(Await.result(_, 10.minutes))
      assert(ids.distinct.size == 2, s"day $day: writers shared a batch id")
      // 5. mid-soak maintenance: compact + vacuum after day 1, so day
      //    2's commits land as post-watermark deltas over the base
      if (day == 1) {
        // the manifest-pruned range read before compaction: pruned ≡
        // unpruned-filtered (I21 under a half-built log)
        val keys = Seq("doc_id", "day")
        val lo = 0L
        val hi = 200L
        val pruned = Sources.readLatestRange(
          spark, logPath, keys, "doc_id", lo, hi).orderBy("doc_id").collect()
        val plain = Sources.readLatest(spark, logPath, keys)
          .filter(col("doc_id").between(lo, hi)).orderBy("doc_id").collect()
        assert(pruned.sameElements(plain),
          "manifest-pruned range read diverged mid-soak")
        Sources.compactLog(spark, logPath, keys, basePath)
        assert(Sources.vacuumLog(spark, logPath, basePath) > 0,
          "vacuum removed nothing after compaction")
      }
    }

    // (a) the three admit days union to D13's one-shot verdicts
    val soaked = spark.read.parquet(s"$soak/verdicts")
      .select("doc_id", "n_candidates", "n_near_dups", "verdict")
      .orderBy("doc_id").collect()
    val oneShot = Dedup2.dedupIncremental(spark, sf).collect()
    assert(soaked.sameElements(oneShot),
      "interleaved daily admits diverged from the one-shot backfill")

    // (b) the PQ artifact equals E12's one-shot base∪delta encode
    val soakCodes = spark.read.parquet(s"$soak/pq/codes")
    val oneShotCodes = spark.read.parquet(
      s"${Similarity.pqAppendIndexPath(spark, sf)}/codes")
    assert(soakCodes.exceptAll(oneShotCodes).isEmpty &&
      oneShotCodes.exceptAll(soakCodes).isEmpty,
      "three daily PQ appends diverged from the one-shot append artifact")

    // (c) the three days' insert edges union to the one-shot insert
    val soakEdges = dayEdges.reduce(_ unionByName _)
    val oneShotEdges = GraphAnn.streamInsertBatch(embs, sf)
    assert(soakEdges.exceptAll(oneShotEdges).isEmpty &&
      oneShotEdges.exceptAll(soakEdges).isEmpty,
      "daily graph inserts diverged from the one-shot insert")

    // (d) the log's final latest-wins state — compacted base + day-2
    //     deltas — is exactly one verdict row per delta doc, equal to
    //     the one-shot admission (per-day rows carry their day column;
    //     latest-wins on (doc_id, day) keeps all three days, so project
    //     the verdict fields and dedup to the per-doc verdict)
    val logState = Sources.readCompacted(spark, basePath, logPath,
        Seq("doc_id", "day"))
      .select("doc_id", "n_candidates", "n_near_dups", "verdict")
      .distinct().orderBy("doc_id").collect()
    if (!logState.sameElements(oneShot)) {
      info(s"logState n=${logState.length} oneShot n=${oneShot.length}")
      logState.take(3).foreach(r => info(s"log:  $r"))
      oneShot.take(3).foreach(r => info(s"one:  $r"))
      val lset = logState.toSet; val oset = oneShot.toSet
      (lset -- oset).take(3).foreach(r => info(s"only log: $r"))
      (oset -- lset).take(3).foreach(r => info(s"only one: $r"))
    }
    assert(logState.sameElements(oneShot),
      "the soaked log's final state diverged from the one-shot verdicts")
  }

  test("post-vacuum commits claim ABOVE the vacuumed history (the soak's find)") {
    import spark.implicits._
    val root = Scratch.dir("claim_floor")
    val (log, base) = (s"$root/log", s"$root/base")
    Sources.commitBatch(Seq((1L, "v1")).toDF("k", "v"), log, "a")
    Sources.commitBatch(Seq((2L, "v1")).toDF("k", "v"), log, "b")
    Sources.compactLog(spark, log, Seq("k"), base)
    assert(Sources.vacuumLog(spark, log, base) == 2)
    // pre-fix, this commit re-claimed id 1 (the surviving-dirs
    // sequencer saw an empty log) — at or below the watermark, so
    // readCompacted's strictly-above filter dropped the batch: a
    // successfully-committed write invisible to every compacted read
    val id = Sources.commitBatch(Seq((3L, "v2")).toDF("k", "v"), log, "c")
    assert(id == 3L, s"post-vacuum commit claimed vacuumed id $id")
    val state = Sources.readCompacted(spark, base, log, Seq("k"))
      .select("k", "v").orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(state.toSeq == Seq((1L, "v1"), (2L, "v1"), (3L, "v2")),
      s"post-vacuum commit lost from the compacted read: ${state.toSeq}")
    // and the floor is monotone across a second compact/vacuum cycle
    Sources.compactLog(spark, log, Seq("k"), base)
    Sources.vacuumLog(spark, log, base)
    val id2 = Sources.commitBatch(Seq((4L, "v3")).toDF("k", "v"), log, "d")
    assert(id2 == 4L, s"second-cycle commit claimed vacuumed id $id2")
  }
}
