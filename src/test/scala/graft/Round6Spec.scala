package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 invariants: the parallel deterministic clustered-layout
  * writer (the round-5 `weak` was a `repartition(1)` global sort), the
  * persisted PQ index, log compaction, and 3-round boosting.
  */
class Round6Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("hashSlots: each slot value routes to exactly its partition class") {
    val parts = 8
    val slots = graft.sources.Sources.hashSlots(spark, parts)
    assert(slots.length == parts)
    // verify with Spark's own hash — the same function repartition uses
    import spark.implicits._
    val got = slots.toSeq.toDF("v")
      .select(pmod(hash(col("v")), lit(parts)).as("p")).collect().map(_.getInt(0))
    assert(got.toSeq == (0 until parts),
      s"slot values ${slots.mkString(",")} hash to ${got.mkString(",")}")
  }

  test("clustered writer: parallel multi-file output with DISJOINT per-file key ranges") {
    val (zorder, _) = graft.sources.SourceQueries.zorderLayoutPaths(spark, sf)
    val files = new java.io.File(zorder).listFiles.toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    // the round-5 writer produced exactly one file (repartition(1)); the
    // parallel writer must spread the sort across tasks
    assert(files.size > 1, s"clustered write not parallel: ${files.size} file(s)")
    // recompute the write's Morton key per file: ranges must be pairwise
    // disjoint — each contiguous key range lives in exactly one task, so
    // no row group straddles a range gap
    val (mp, ms) = graft.sources.Sources.clusterMaxes(
      graft.tables.Tables.lineitem(spark, sf), "l_partkey", "l_suppkey")
    val ranges = files.map { f =>
      val z = graft.sources.Sources.mortonKey(
        expr(s"CAST(l_partkey AS BIGINT) * 65535 div $mp"),
        expr(s"CAST(l_suppkey AS BIGINT) * 65535 div $ms"))
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(z).cast("long"), max(z).cast("long")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file key ranges overlap: ${ranges.mkString(" ")}")
      case _ => ()
    }
  }

  test("clustered writer: byte-deterministic across rewrites (literal bounds, no sampling seed)") {
    import scala.jdk.CollectionConverters._
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val conf = spark.sparkContext.hadoopConfiguration
    def footprint(dir: String): Seq[(String, Long, Seq[(Long, Long)])] =
      new java.io.File(dir).listFiles.toSeq
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .sortBy(_.getName.replaceAll(".*part-(\\d+)-.*", "$1"))
        .map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val blocks = rd.getFooter.getBlocks.asScala.toSeq.map { b =>
              val st = b.getColumns.asScala
                .find(_.getPath.toDotString == "l_partkey").get.getStatistics
              (st.genericGetMin.asInstanceOf[Number].longValue,
                st.genericGetMax.asInstanceOf[Number].longValue)
            }
            (f.getName.replaceAll("part-(\\d+)-.*", "$1"), f.length, blocks)
          } finally rd.close()
        }
    val (d1, d2) = (Scratch.dir("det1"), Scratch.dir("det2"))
    val tie = Seq("l_orderkey", "l_linenumber")
    graft.sources.Sources.writeZorderLayout(li, "l_partkey", "l_suppkey", d1,
      tieBreak = tie)
    graft.sources.Sources.writeZorderLayout(li, "l_partkey", "l_suppkey", d2,
      tieBreak = tie)
    assert(footprint(d1) == footprint(d2),
      "two writes of the same data produced different layouts")
  }

  test("ann_index_persist: search over the reloaded index equals E5; corpus side reads ONLY the artifact") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, BroadcastQueryStageExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val viaIndex = graft.ops.Similarity.annIndexPersist(spark, sf)
    val direct = graft.ops.Similarity.annPqSearch(spark, sf)
    assert(viaIndex.collect().toSeq == direct.collect().toSeq,
      "reloaded-index search diverged from the in-session ADC search")
    // every parquet scan in the executed plan, tagged with whether it
    // sits under a broadcast exchange (the probe side)
    def scans(p: SparkPlan, inB: Boolean): Seq[(String, Boolean)] = {
      val here = p match {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map(rp => (rp.toString, inB))
        case _ => Nil
      }
      val kids: Seq[(SparkPlan, Boolean)] = p match {
        case a: AdaptiveSparkPlanExec => Seq((a.executedPlan, inB))
        case b: BroadcastQueryStageExec => Seq((b.plan, true))
        case q: QueryStageExec => Seq((q.plan, inB))
        case b: BroadcastExchangeExec => b.children.map((_, true))
        case o => o.children.map((_, inB))
      }
      here ++ kids.flatMap { case (c, b) => scans(c, b) }
    }
    val ss = scans(viaIndex.queryExecution.executedPlan, inB = false)
    assert(ss.exists { case (path, inB) => path.contains("pqindex") && !inB },
      s"corpus side does not scan the persisted code artifact: $ss")
    val embStreamSide = ss.collect {
      case (path, false) if path.contains("embeddings") => path
    }
    assert(embStreamSide.isEmpty,
      s"embeddings table scanned outside the probe-side broadcast: $embStreamSide")
  }

  test("src_compact: compacted read is value-identical to the raw log and scans fewer bytes") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val S = graft.sources.Sources
    val log = Scratch.dir("cmp_log")
    val base = Scratch.dir("cmp_base")
    val orders = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus")
    S.upsertBatch(orders.withColumn("o_orderstatus", lit("PENDING")), log, 1L)
    S.upsertBatch(orders, log, 2L)
    S.compactLog(spark, log, Seq("o_orderkey"), base)
    S.upsertBatch(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("SHIPPED")), log, 3L)
    // result-invisible: base+delta resolves to the same state as the
    // raw full-history merge
    val viaCompact = S.readCompacted(spark, base, log, Seq("o_orderkey"))
    val viaRaw = S.readLatest(spark, log, Seq("o_orderkey"))
    assert(viaCompact.exceptAll(viaRaw).isEmpty &&
      viaRaw.exceptAll(viaCompact).isEmpty)
    // read amplification: raw scans every historical batch; compacted
    // scans base + only the post-watermark partition
    def bytesUnder(dir: String, keep: java.io.File => Boolean): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) { if (keep(f)) f.listFiles.map(walk).sum else 0L }
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(new java.io.File(dir))
    }
    val rawBytes = bytesUnder(log, _ => true)
    val compactBytes = bytesUnder(s"$base/base", _ => true) +
      bytesUnder(log, f => !f.getName.startsWith("_batch_id=") ||
        f.getName.stripPrefix("_batch_id=").toLong > 2L)
    assert(compactBytes < rawBytes,
      s"compaction did not shrink the read: $compactBytes vs raw $rawBytes")
    // and the pruning is structural: the delta scan carries a PARTITION
    // filter on _batch_id, so pruned batches never reach file listing
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      (p match { case f: FileSourceScanExec => Seq(f); case _ => Nil }) ++
        kids.flatMap(scansOf)
    }
    viaCompact.collect()
    val logScans = scansOf(viaCompact.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("cmp_log")))
    assert(logScans.nonEmpty && logScans.forall(_.partitionFilters.nonEmpty),
      "delta scan does not partition-prune the compacted batches")
  }

  test("src_compact lifecycle: re-compaction is idempotent and vacuum reclaims the merged history") {
    val S = graft.sources.Sources
    val log = Scratch.dir("vac_log")
    val base = Scratch.dir("vac_base")
    val orders = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus")
    S.upsertBatch(orders.withColumn("o_orderstatus", lit("PENDING")), log, 1L)
    S.upsertBatch(orders, log, 2L)
    S.compactLog(spark, log, Seq("o_orderkey"), base)
    S.upsertBatch(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("SHIPPED")), log, 3L)
    val before = S.readCompacted(spark, base, log, Seq("o_orderkey")).collect().toSet
    // vacuum: batches 1-2 are fully represented in the base — deleting
    // their partitions must not change the compacted read, and the log
    // must actually shrink (compaction without reclaim is bookkeeping)
    def logBytes: Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles.map(walk).sum
        else f.length
      walk(new java.io.File(log))
    }
    val bytesBefore = logBytes
    val removed = S.vacuumLog(spark, log, base)
    assert(removed == 2, s"expected to vacuum batches 1 and 2, removed $removed")
    assert(logBytes * 2 < bytesBefore,
      s"vacuum reclaimed too little: $logBytes of $bytesBefore bytes remain")
    assert(S.readCompacted(spark, base, log, Seq("o_orderkey")).collect().toSet == before,
      "vacuum changed the compacted read")
    // steady-state re-compaction must be INCREMENTAL (base + deltas):
    // after the vacuum, the raw log no longer holds the full history, so
    // a from-scratch compactLog over it would keep only batch 3's 10%
    // and silently lose every other key — recompact folds the existing
    // base forward instead, and a subsequent vacuum retires batch 3 too
    val base2 = Scratch.dir("vac_base2")
    S.recompact(spark, base, log, Seq("o_orderkey"), base2)
    assert(S.readCompacted(spark, base2, log, Seq("o_orderkey")).collect().toSet == before,
      "re-compaction changed the final state")
    assert(S.vacuumLog(spark, log, base2) == 1)
    assert(S.readCompacted(spark, base2, log, Seq("o_orderkey")).collect().toSet == before,
      "vacuum after re-compaction changed the final state")
  }

  test("dedup_canonical: the kept doc is its cluster's quality argmax") {
    val picks = graft.ops.Corpus.dedupCanonical(spark, sf).collect()
    assert(picks.nonEmpty)
    val clusters = graft.ops.Dedup.dedupCluster(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
    val quality = graft.ops.Text.textQuality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    val byCluster = clusters.groupBy(_._2)
    picks.foreach { p =>
      val (c, keep) = (p.getAs[Long]("cluster"), p.getAs[Long]("keep_id"))
      val members = byCluster(c).map(_._1)
      assert(members.contains(keep), s"keep_id $keep not in cluster $c")
      assert(p.getAs[Long]("n_members") == members.length)
      val best = members.map(quality).max
      assert(quality(keep) == best,
        s"cluster $c kept $keep (q=${quality(keep)}) but best is $best")
      // tie-break: lowest doc_id among the best-quality members
      assert(keep == members.filter(m => quality(m) == best).min)
    }
  }

  test("text_decontaminate: overlap is a valid ratio over TRAINING docs only, sorted desc") {
    val rows = graft.ops.Corpus.textDecontaminate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 50 != 0, "eval doc leaked into the report")
      val (sh, shared) = (r.getAs[Int]("n_shingles").toLong, r.getAs[Long]("n_shared"))
      assert(shared >= 1 && shared <= sh)
      val ov = r.getAs[Double]("overlap")
      assert(ov > 0.0 && ov <= 1.0)
    }
    val ovs = rows.map(_.getAs[Double]("overlap")).toSeq
    assert(ovs == ovs.sorted.reverse, "report not sorted by overlap desc")
  }

  test("corpus_pack: bins conserve tokens, hit the ceil count, and stay LPT-balanced") {
    import org.apache.spark.sql.functions._
    val bins = graft.ops.Corpus.corpusPack(spark, sf).collect()
    val toks = graft.tables.Tables.documents(spark, sf)
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
    val agg = toks.agg(sum("n"), max("n"), count(lit(1))).head()
    val (total, maxDoc, nDocs) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    val expectBins = (total + 2047) / 2048
    assert(bins.length == expectBins, s"${bins.length} bins, want $expectBins")
    assert(bins.map(_.getAs[Long]("bin_tokens")).sum == total, "tokens not conserved")
    assert(bins.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // sorted round-robin balance: no bin exceeds another by more than
    // the largest document
    val sums = bins.map(_.getAs[Long]("bin_tokens"))
    assert(sums.max - sums.min <= maxDoc,
      s"bins unbalanced beyond the LPT bound: ${sums.max - sums.min} > $maxDoc")
  }

  test("boostStumps generalizes past three rounds: four rounds, monotone exp-loss bound") {
    import spark.implicits._
    // same constructed blocks as the 3-round spec plus a fourth usable
    // feature; the committee machinery (pattern weights, 2^N vote
    // table, HUGEINT-free BigInt comparisons) must hold for N=4
    val groups = Seq(
      (400, 0.1, 0.1, 0.1, 0.1, 0),
      (250, 0.9, 0.9, 0.1, 0.1, 1),
      (100, 0.9, 0.1, 0.1, 0.9, 1),
      (50, 0.1, 0.9, 0.1, 0.1, 1),
      (50, 0.9, 0.9, 0.9, 0.1, 1),
      (30, 0.1, 0.9, 0.9, 0.9, 0))
    val rows = groups.zipWithIndex.flatMap { case ((cnt, a, b, c, d, y), g) =>
      (0 until cnt).map(i => (a, b, c, d, (g * 37 + i) % 2 / 10.0, y))
    }
    val base = rows.toDF("fa", "fb", "fc", "fd", "fe", "y")
    val r = graft.ml.Ml5.boostStumps(base,
      Seq("fa" -> "fa", "fb" -> "fb", "fc" -> "fc", "fd" -> "fd", "fe" -> "fe"),
      rounds = 4).collect().head
    val losses = (1 to 4).map(t => r.getAs[Double](s"loss$t"))
    assert(losses == losses.sorted.reverse && losses.distinct == losses,
      s"exp-loss bound not strictly decreasing over 4 rounds: $losses")
    val n = r.getAs[Long]("n")
    assert(2 * r.getAs[Long]("correct4") > n,
      "4-round committee no better than random")
  }

  test("ml_gbt_step3 on lineitem: weak learners all three rounds, strictly decreasing exp-loss") {
    val r = graft.ml.Ml5.mlGbtStep3(spark, sf).collect().head
    val n = r.getAs[Long]("n")
    // every round's weighted error beats random (exact integer witness)
    assert(2 * r.getAs[Long]("err1") < n)
    assert(2 * r.getAs[Long]("err2_w") < r.getAs[Long]("total2_w"))
    assert(2 * r.getAs[Long]("err3_w") < r.getAs[Long]("total3_w"))
    // the AdaBoost exp-loss bound strictly decreases at EVERY round
    val (l1, l2, l3) = (r.getAs[Double]("loss1"), r.getAs[Double]("loss2"),
      r.getAs[Double]("loss3"))
    assert(l2 < l1 && l3 < l2, s"loss bound not decreasing: $l1, $l2, $l3")
    // the α-weighted committee trains better than random
    assert(2 * r.getAs[Long]("correct3") > n)
  }

  test("boosting dynamics: three rounds select THREE distinct stumps when the data demands it") {
    import spark.implicits._
    // fa wins round 1 (errs only on the 50-row E1 block); AdaBoost hands
    // E1 half the mass, so round 2 must switch to fb (which isolates E1
    // cleanly, erring on B5+E2); round 3's reweighting then concentrates
    // on fb's errors, where fc's split (isolating E2 against B4) beats
    // re-splitting either used feature — three rounds, three features
    val groups = Seq(
      (400, 0.1, 0.1, 0.1, 0), // B1: clean negatives
      (250, 0.9, 0.9, 0.1, 1), // B2: positives on fa and fb
      (100, 0.9, 0.1, 0.1, 1), // B5: positives fb gets wrong
      (50, 0.1, 0.9, 0.1, 1), //  E1: fa's only errors
      (50, 0.9, 0.9, 0.9, 1), //  B4: positives, also fc-high
      (30, 0.1, 0.9, 0.9, 0)) //  E2: fb's other errors, fc-high
    val rows = groups.zipWithIndex.flatMap { case ((cnt, a, b, c, y), g) =>
      (0 until cnt).map(i => (a, b, c, (g * 37 + i) % 2 / 10.0, y))
    }
    val base = rows.toDF("fa", "fb", "fc", "fd", "y")
    val r = graft.ml.Ml5.boostStumps(base,
      Seq("fa" -> "fa", "fb" -> "fb", "fc" -> "fc", "fd" -> "fd"),
      rounds = 3).collect().head
    assert(r.getAs[String]("f1") == "fa", s"round 1 should pick fa: $r")
    assert(r.getAs[String]("f2") == "fb", s"round 2 should switch to fb: $r")
    assert(r.getAs[String]("f3") == "fc", s"round 3 should switch to fc: $r")
    assert(r.getAs[Double]("loss3") < r.getAs[Double]("loss2"),
      s"third stump should keep shrinking the bound: $r")
  }

  test("boosting guards: a perfect stump fails the weak-learnability contract loudly") {
    import spark.implicits._
    val separable = ((0 until 50).map(i => (0.1, i % 2 / 10.0, 0)) ++
      (0 until 50).map(i => (0.9, i % 2 / 10.0, 1))).toDF("fa", "fb", "y")
    val e = intercept[IllegalArgumentException] {
      graft.ml.Ml5.boostStumps(separable, Seq("fa" -> "fa", "fb" -> "fb"), 2)
    }
    assert(e.getMessage.contains("weak-learnability"),
      s"wrong failure mode: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      graft.ml.Ml5.boostTwoStumps(separable, Seq("fa" -> "fa", "fb" -> "fb"))
    }
    assert(e2.getMessage.contains("weak-learnability"))
  }

  test("QueryCaches: a re-invocation serves its loop frame from the memoized cache") {
    import spark.implicits._
    // Two failure modes this pins against (both measured before the memo
    // design): an unpersist-after-rebuild scheme evicts the plan-equal
    // cache entry the new query is about to read (pagerank's edge frame
    // silently re-shuffled per round, 164 KB → 1.4 MB at sf0.1), and a
    // retire-before-build scheme rebuilds the whole upstream pipeline
    // per invocation (dedup_minhash_lsh 1.2 s → 9.7 s per bench pass).
    // The memo returns ONE persisted generation per input key: the
    // second run's executed plan must serve the loop frame from cache.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    graft.ops.Dedup2.pagerankRounds(edges, 2, "r6.pagerank.cache").collect()
    val second = graft.ops.Dedup2.pagerankRounds(edges, 2, "r6.pagerank.cache")
    second.collect()
    val plan = second.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"second invocation lost its cached loop frame:\n$plan")
  }

  test("pagerankRounds: an unsymmetrized edge list fails the contract loudly") {
    import spark.implicits._
    // (3,2) is missing its reverse — the old inner-join loop would have
    // silently dropped mass instead of failing
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Dedup2.pagerankRounds(edges, 1, "r6.pagerank.unsym")
    }
    assert(e.getMessage.contains("SYMMETRIZED"), s"wrong failure: ${e.getMessage}")
  }
}
