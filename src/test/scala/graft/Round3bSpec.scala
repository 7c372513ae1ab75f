package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-3 wave-3 operators (SURVEY.md §2 B16-B17,
  * C13-C14). Oracle hash-matching is the driver's gate; these pin the
  * semantic properties that survive refactors.
  */
class Round3bSpec extends AnyFunSuite {
  import graft.ml.Ml3
  import graft.ops.Features3
  lazy val spark = TestSpark.spark
  lazy val sf = TestSpark.sf

  test("f_winsorize: outputs clipped into [p05,p95], interior values untouched") {
    val w = Features3.fWinsorize(spark, sf).cache()
    // row count preserved, and clipping actually fired on both tails
    val n = graft.tables.Tables.events(spark, sf).count()
    assert(w.count() == n)
    assert(w.filter(col("value_w") > col("value")).count() > 0, "low tail clipped")
    assert(w.filter(col("value_w") < col("value")).count() > 0, "high tail clipped")
    // winsorized values are always RAW input values (exact discrete fences)
    val vals = w.select(col("value").as("v")).distinct()
    val outs = w.select(col("value_w").as("v")).distinct()
    assert(outs.join(vals, Seq("v"), "left_anti").isEmpty)
    w.unpersist()
  }

  test("f_interaction: product ordering invariants hold, row count preserved") {
    val f = Features3.fInteraction(spark, sf).cache()
    val li = graft.tables.Tables.lineitem(spark, sf)
    assert(f.count() == li.count())
    // tax >= 0 and discount in [0,1) in the data, so net <= gross and both >= 0
    assert(f.filter(col("net_price") > col("gross_price")).isEmpty)
    assert(f.filter(col("net_price") < 0 || col("qty_disc") < 0).isEmpty)
    f.unpersist()
  }

  test("ml_kmeans_assign: total coverage, k clusters, assignment is the argmax") {
    val a = Ml3.mlKmeansAssign(spark, sf).cache()
    val n = graft.tables.Tables.embeddings(spark, sf).count()
    assert(a.count() == n)
    assert(a.select("cluster_seed").distinct().count() == 8)
    assert(a.select("cluster_lloyd").distinct().count() == 8)
    // seeds stay home in pass 1: vec_id i<8 has cluster_seed == i
    val seeds = a.filter(col("vec_id") < 8).collect()
    assert(seeds.forall(r => r.getLong(0) == r.getLong(1)))
    // the update must actually move some assignments (else it's a no-op)
    assert(a.filter(col("cluster_seed") =!= col("cluster_lloyd")).count() > 0)
    a.unpersist()
  }

  test("ml_lift_deciles: 10 tiles partition the table, lift ends at 1.0") {
    val d = Ml3.mlLiftDeciles(spark, sf).collect()
    assert(d.length == 10 && d.map(_.getInt(0)).toSeq == (1 to 10))
    val tot = graft.tables.Tables.orders(spark, sf).count()
    assert(d.map(_.getLong(1)).sum == tot)
    // tile sizes differ by at most 1 (ntile contract)
    val sizes = d.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    // cumulative lift over the whole population is exactly 1
    assert(d.last.getDouble(4) == 1.0)
  }

  test("q_range_window: singleton frames equal own value, frame never exceeds user total") {
    import graft.ops.Analytics
    val r = Analytics.qRangeWindow(spark, sf).cache()
    assert(r.filter(col("roll_n") < 1).isEmpty)
    val perUser = r.groupBy("user_id").agg(count(lit(1)).as("tot"), max("roll_n").as("mx"))
    assert(perUser.filter(col("mx") > col("tot")).isEmpty)
    // a frame of one row sums to exactly that row's quantized value
    val singles = r.filter(col("roll_n") === 1)
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), floor(col("value") * 100 + lit(0.5)).cast("long").as("vq"))
    assert(singles.join(ev, "event_id").filter(col("roll_sum_q") =!= col("vq")).isEmpty)
    r.unpersist()
  }

  test("q_funnel: stage timestamps strictly ordered, monotone stage counts") {
    import graft.ops.Analytics
    val f = Analytics.qFunnel(spark, sf).cache()
    assert(f.filter(col("t_click").isNotNull && col("t_click") <= col("t_signup")).isEmpty)
    assert(f.filter(col("t_purchase").isNotNull && col("t_purchase") <= col("t_click")).isEmpty)
    // purchase implies click
    assert(f.filter(col("t_purchase").isNotNull && col("t_click").isNull).isEmpty)
    val n = f.count()
    val nc = f.filter(col("t_click").isNotNull).count()
    val np = f.filter(col("t_purchase").isNotNull).count()
    assert(n >= nc && nc >= np && np > 0)
    f.unpersist()
  }

  test("q_retention_cohort: offset-0 equals cohort size, later offsets never exceed it") {
    import graft.ops.Analytics
    val rc = Analytics.qRetentionCohort(spark, sf).cache()
    val base = rc.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    assert(rc.join(base, "cohort_week").filter(col("n_users") > col("cohort_size")).isEmpty)
    assert(rc.filter(col("week_offset") < 0).isEmpty)
    rc.unpersist()
  }

  test("f_hashed_features: buckets in [0,64), signs in {-1,1}, hash is a function of the value") {
    val h = Features3.fHashedFeatures(spark, sf).cache()
    for (c <- Seq("b_pri", "b_st", "b_cust"))
      assert(h.filter(col(c) < 0 || col(c) >= 64).isEmpty, c)
    for (c <- Seq("s_pri", "s_st", "s_cust"))
      assert(h.filter(col(c) =!= -1 && col(c) =!= 1).isEmpty, c)
    // same priority value always lands in the same (bucket, sign)
    val o = graft.tables.Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
    val pairs = h.join(o, "o_orderkey").select("o_orderpriority", "b_pri", "s_pri").distinct()
    assert(pairs.count() == o.select("o_orderpriority").distinct().count())
    h.unpersist()
  }

  test("dedup_cluster: labels are component minima consistent with the pair graph") {
    import graft.ops.Dedup
    val labels = Dedup.dedupCluster(spark, sf).cache()
    val n = graft.tables.Tables.documents(spark, sf).count()
    assert(labels.count() == n)
    // cluster label never exceeds the member id (component-min labeling)
    assert(labels.filter(col("cluster") > col("doc_id")).isEmpty)
    // every edge's endpoints share a cluster
    val pairs = Dedup.minhashCandidatePairs(spark, sf).filter(col("jaccard") >= 0.5)
      .select("a", "b")
    val la = labels.select(col("doc_id").as("a"), col("cluster").as("ca"))
    val lb = labels.select(col("doc_id").as("b"), col("cluster").as("cb"))
    assert(pairs.join(la, "a").join(lb, "b").filter(col("ca") =!= col("cb")).isEmpty)
    // non-trivial: at least one real multi-doc cluster exists
    assert(labels.filter(col("cluster") =!= col("doc_id")).count() > 0)
    labels.unpersist()
  }

  test("ml_calibration_bins: bins partition the table, rates and mean_p in [0,1]") {
    val b = Ml3.mlCalibrationBins(spark, sf).collect()
    assert(b.map(_.getInt(0)).toSet.subsetOf((0 to 9).toSet))
    assert(b.map(_.getLong(1)).sum == graft.tables.Tables.orders(spark, sf).count())
    assert(b.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    assert(b.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
    // mean predicted p grows with the bin index (it's the bin's own range)
    val means = b.sortBy(_.getInt(0)).map(_.getDouble(3))
    assert(means.zip(means.tail).forall { case (a, c) => a < c })
  }

  test("ml_confusion_by_group: slices sum to the global confusion matrix") {
    import graft.ml.Metrics
    val g = Ml3.mlConfusionByGroup(spark, sf).collect()
    val global = Metrics.mlEvalMetrics(spark, sf).collect().head
    for (i <- 1 to 4) // tp, fp, fn, tn are cols 1-4 per slice, 0-3 globally
      assert(g.map(_.getLong(i)).sum == global.getLong(i - 1))
  }

  test("src_text_roundtrip: text survives the sink byte-for-byte") {
    import graft.sources.SourceQueries
    val rt = SourceQueries.srcTextRoundtrip(spark, sf)
    val docs = graft.tables.Tables.documents(spark, sf).select("doc_id", "text")
    // corpus precondition for the TAB framing
    assert(docs.filter(col("text").contains("\t") || col("text").contains("\n")).isEmpty)
    assert(rt.exceptAll(docs).isEmpty && docs.exceptAll(rt).isEmpty)
  }

  test("ann_pq: full coverage, codes in [0,16), training beats the seed codebook") {
    import graft.ops.Similarity
    val pq = Similarity.annPq(spark, sf).cache()
    assert(pq.count() == graft.tables.Tables.embeddings(spark, sf).count())
    for (i <- 0 until 8)
      assert(pq.filter(col(s"code_$i") < 0 || col(s"code_$i") >= 16).isEmpty, s"code_$i")
    // round 11: codewords are LLOYD-TRAINED centroids, so the seed
    // vectors no longer reconstruct to themselves (the pre-training
    // invariant this test used to pin); the trained-world invariants:
    // quantization is lossy yet strictly CHEAPER in total than the
    // lowest-id seed codebook (Round11bSpec pins the magnitude)
    assert(pq.filter(col("err_q") > 0).count() > 0)
    val embs = graft.tables.Tables.embeddings(spark, sf)
    val trainedErr = pq.agg(sum("err_q")).head().getLong(0)
    val seedErr = Similarity.quantErrOf(embs, 8, Similarity.codebookOf(embs, 8, 16))
    assert(trainedErr < seedErr, s"trained $trainedErr !< seed $seedErr")
    pq.unpersist()
  }

  test("ann_pq_search: 5 ranked rows per probe, never self, nonzero brute-force recall") {
    import graft.ops.Similarity
    val pq = Similarity.annPqSearch(spark, sf).cache()
    val probes = graft.tables.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 100 === 0).count()
    assert(pq.count() == probes * 5)
    assert(pq.filter(col("query_id") === col("neighbor_id")).isEmpty)
    val perProbe = pq.groupBy("query_id").agg(count(lit(1)).as("n"))
    assert(perProbe.filter(col("n") =!= 5).isEmpty)
    // Recall floor: synthetic embeddings are uniform (no cluster
    // structure), PQ's adversarial case — assert non-degeneracy, not a
    // production recall bar (trained codebooks + real data raise it).
    val exact = Similarity.annBruteforce(spark, sf)
      .select("query_id", "neighbor_id")
    val overlap = pq.select("query_id", "neighbor_id").intersect(exact).count()
    assert(overlap >= 1, s"PQ search found nothing from the exact top-5")
    pq.unpersist()
  }

  test("f_cv_folds: k folds partition the table with balanced sizes") {
    val f = Features3.fCvFolds(spark, sf).collect()
    assert(f.map(_.getLong(0)).toSet == (0L to 4L).toSet)
    val tot = graft.tables.Tables.orders(spark, sf).count()
    assert(f.map(_.getLong(1)).sum == tot)
    val sizes = f.map(_.getLong(1))
    assert(sizes.max < 2 * sizes.min, s"folds unbalanced: ${sizes.mkString(",")}")
  }

  test("q_snapshot_diff: classes partition the key union, all four appear") {
    import graft.ops.Analytics
    val d = Analytics.qSnapshotDiff(spark, sf).collect()
    assert(d.map(_.getString(0)).toSet ==
      Set("added", "removed", "changed", "unchanged"))
    val o = graft.tables.Tables.orders(spark, sf)
    val unionKeys = o.filter(col("o_orderkey") % 97 =!= 0 || col("o_orderkey") % 101 =!= 0).count()
    assert(d.map(_.getLong(1)).sum == unionKeys)
  }

  test("q_approx_quantile: sketch medians land within 1% of the exact rank values") {
    import graft.ops.Analytics
    val approx = Analytics.qApproxQuantile(spark, sf)
      .select("l_returnflag", "p50").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = graft.tables.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e) / e < 0.01, s"$k: approx $a vs exact $e")
    }
  }

  test("ntileFromRank matches native ntile on an uneven-sized input") {
    import spark.implicits._
    val base = graft.tables.Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), col("o_totalprice").as("score"))
    val native = base.withColumn("decile",
      ntile(10).over(Window.orderBy(col("score").desc, col("o_orderkey"))))
    val tot = base.agg(count(lit(1)).as("tot"))
    val viaRank = graft.ops.DistRank.withGlobalRank(base, "rank", col("score").desc, col("o_orderkey"))
      .crossJoin(broadcast(tot))
      .withColumn("q", expr("tot div 10"))
      .withColumn("m", col("tot") % 10)
      .withColumn("decile", Ml3.ntileFromRank(col("rank"), col("q"), col("m")).cast("int"))
      .select("o_orderkey", "score", "decile")
    assert(native.select("o_orderkey", "decile").exceptAll(
      viaRank.select("o_orderkey", "decile")).isEmpty)
    assert(viaRank.select("o_orderkey", "decile").exceptAll(
      native.select("o_orderkey", "decile")).isEmpty)
  }
}
