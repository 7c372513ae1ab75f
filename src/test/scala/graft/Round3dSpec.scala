package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-3 wave-9 operators (SURVEY.md §2 A46-A47,
  * C18-C20, D8, E6, F8). Oracle hash-matching is the driver's gate;
  * these pin the semantic properties that survive refactors.
  */
class Round3dSpec extends AnyFunSuite {
  import graft.ml.Ml4
  import graft.ops.{Dedup2, Relational5, Similarity, Text2}
  lazy val spark = TestSpark.spark
  lazy val sf = TestSpark.sf

  test("ml_ks_statistic: KS in [0,1] and equals AUC-consistent separation on this data") {
    val r = Ml4.mlKsStatistic(spark, sf).head()
    val (p, n, ks) = (r.getLong(0), r.getLong(1), r.getDouble(3))
    assert(p > 0 && n > 0)
    assert(ks >= 0.0 && ks <= 1.0)
    assert(r.getLong(2) <= p * n, "integer numerator bounded by P*N")
  }

  test("ml_auc_pr: AP within the exact attainable bounds for (P, N)") {
    val r = Ml4.mlAucPr(spark, sf).head()
    val (p, n, ap) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(ap <= 1.0)
    // worst attainable AP: every positive ranked after every negative,
    // AP_min = (1/P) Σ_{i=1..P} i/(N+i); quantization only lowers by <1e-6
    val apMin = (1L to p).map(i => i.toDouble / (n + i)).sum / p
    assert(ap >= apMin - 1e-4, s"AP $ap below attainable floor $apMin")
  }

  test("ml_psi: fractions sum to 1 per split, identical split ⇒ psi 0") {
    val rows = Ml4.mlPsi(spark, sf).collect()
    val trainTot = rows.map(_.getLong(1)).sum
    val testTot = rows.map(_.getLong(2)).sum
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-3)
    // B6's 80/20 hash split is uniform: both splits see every bin here
    assert(rows.forall(r => !r.isNullAt(5)))
    assert(trainTot > testTot, "80/20 split direction")
  }

  test("q_chi_square: observed totals recompose, contributions non-negative") {
    val rows = Relational5.qChiSquare(spark, sf).collect()
    val nOrders = graft.tables.Tables.orders(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == nOrders)
    assert(rows.forall(_.getDouble(5) >= 0.0))
    // expected counts recompose to the row totals (within rounding)
    rows.foreach { r =>
      val obs = r.getLong(1) + r.getLong(2)
      assert(math.abs(r.getDouble(3) + r.getDouble(4) - obs) < 2e-4)
    }
  }

  test("q_mode_per_group: the mode really is the max count in its group") {
    val counts = graft.tables.Tables.lineitem(spark, sf)
      .groupBy("l_linestatus", "l_returnflag").count()
      .collect().groupBy(_.getString(0))
    Relational5.qModePerGroup(spark, sf).collect().foreach { r =>
      val grp = counts(r.getString(0))
      assert(r.getLong(2) == grp.map(_.getLong(2)).max)
    }
  }

  test("ann_rerank: recall ⊇ single-bucket LSH, ⊆ brute force per query") {
    val bf = Similarity.annBruteforce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.annLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val multi = Similarity.annRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // multi-probe recall (fraction of brute-force top-k recovered) must
    // be at least single-bucket recall: its candidate set is a superset
    val lshRecall = lsh.count(bf.contains).toDouble / bf.size
    val multiRecall = multi.count(bf.contains).toDouble / bf.size
    assert(multiRecall >= lshRecall)
    assert(multiRecall > 0.5, s"multi-probe recall $multiRecall too low")
  }

  test("dedup_doc_chunk: pairs symmetric-free (a<b) and counts positive") {
    val rows = Dedup2.dedupDocChunk(spark, sf).collect()
    assert(rows.nonEmpty, "synthetic corpus contains duplicated passages")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getLong(2) > 0))
  }

  test("f_lag_features: no leakage — prior stats never include the row itself") {
    val f = graft.ops.Features3.fLagFeatures(spark, sf).cache()
    // first event per user: no lag, no prior average
    assert(f.filter(col("prior_n") === 0 && !col("lag1").isNull).isEmpty)
    assert(f.filter(col("prior_n") === 0 && !col("prior_avg").isNull).isEmpty)
    // second event: prior average IS lag1 (single prior value, quantized)
    val second = f.filter(col("prior_n") === 1)
      .filter(abs(col("prior_avg") - col("lag1")) > 1e-4)
    assert(second.isEmpty, "prior_avg over one value must equal lag1")
    f.unpersist()
  }

  test("ml_bootstrap_ci: CI brackets the pooled accuracy") {
    val ci = Ml4.mlBootstrapCi(spark, sf).head()
    val (mean, sd, lo, hi) = (ci.getDouble(1), ci.getDouble(2), ci.getDouble(3), ci.getDouble(4))
    assert(ci.getLong(0) == 10)
    assert(sd >= 0 && lo <= mean && mean <= hi)
    val pooled = graft.ml.Metrics.mlEvalMetrics(spark, sf).head().getDouble(4)
    assert(lo <= pooled && pooled <= hi,
      s"pooled accuracy $pooled outside fold CI [$lo, $hi]")
  }

  test("src_schema_evolution: v1 rows null-fill the late column, v2 keep it") {
    val r = graft.sources.SourceQueries.srcSchemaEvolution(spark, sf).cache()
    assert(r.filter(col("o_orderkey") % 2 === 0 && !col("o_orderstatus").isNull).isEmpty)
    assert(r.filter(col("o_orderkey") % 2 === 1 && col("o_orderstatus").isNull).isEmpty)
    assert(r.count() == graft.tables.Tables.orders(spark, sf).count())
    r.unpersist()
  }

  test("ann_knn_join: ranks contiguous per source, graph covers the non-isolated corpus") {
    val g = Similarity.annKnnJoin(spark, sf).cache()
    val n = graft.tables.Tables.embeddings(spark, sf).count()
    // contiguous ranks 1..k per src
    val perSrc = g.groupBy("src").agg(count(lit(1)).as("deg"), max("rank").as("mx"))
    assert(perSrc.filter(col("deg") =!= col("mx")).isEmpty, "rank gaps within a source")
    assert(perSrc.filter(col("deg") > 3).isEmpty)
    // 4-plane buckets on this corpus leave few isolated vectors
    assert(g.select("src").distinct().count() > n * 9 / 10)
    g.unpersist()
  }

  test("q_percent_total: shares sum to 1, revenues recompose the grand total") {
    val rows = Relational5.qPercentTotal(spark, sf).collect()
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    val total = rows.map(_.getDouble(2)).sum
    val expect = graft.tables.Tables.orders(spark, sf)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))).head.getLong(0) / 100.0
    assert(math.abs(total - expect) < 1e-6)
  }

  test("ml_tree_stump: split partitions the facts and can't increase impurity") {
    val s = Ml4.mlTreeStump(spark, sf).head()
    val (nl, pl, nr, pr) = (s.getLong(3), s.getLong(4), s.getLong(5), s.getLong(6))
    val li = graft.tables.Tables.lineitem(spark, sf)
    val n = li.count()
    val pos = li.filter(col("l_returnflag") === "R").count()
    assert(nl + nr == n, "children must partition the rows")
    assert(pl + pr == pos, "children must partition the positives")
    // weighted child Gini never exceeds the parent's (impurity concavity)
    val p = pos.toDouble / n
    val parentGini = 1.0 - p * p - (1 - p) * (1 - p)
    assert(s.getDouble(7) <= parentGini + 1e-4)
  }

  test("ml_feature_importance: one row per feature, gains non-negative, global best has max gain") {
    val imp = Ml4.mlFeatureImportance(spark, sf).collect()
    assert(imp.map(_.getString(0)).sorted.toSeq == Seq("disc", "price", "qty"))
    assert(imp.forall(_.getDouble(4) >= -1e-4), "split gain must be >= 0 (concavity)")
    val stump = Ml4.mlTreeStump(spark, sf).head()
    // the importance table carries the ROUNDED wgini while the stump
    // argmins the unrounded value with its own (feature, bin) tie-break
    // — so assert membership in the rounded-minimum set, not a unique
    // argmin (two features tying at 4 decimals would flip a minBy)
    val minW = imp.map(_.getDouble(3)).min
    val bestSet = imp.filter(_.getDouble(3) == minW)
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(bestSet.contains((stump.getString(0), stump.getInt(1))),
      s"global stump ${stump.getString(0)}/${stump.getInt(1)} not among " +
        s"rounded-minimum rows $bestSet")
  }

  test("ml_pca_power: unit-norm 64-dim loading vector") {
    val rows = Ml4.mlPcaPower(spark, sf).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 64))
    val norm2 = rows.map(r => r.getDouble(1) * r.getDouble(1)).sum
    assert(math.abs(norm2 - 1.0) < 1e-2, s"norm^2 $norm2 far from 1")
  }

  test("f_embedding_norm: positive norms, one row per vector") {
    val n = graft.ops.Features3.fEmbeddingNorm(spark, sf).cache()
    assert(n.count() == graft.tables.Tables.embeddings(spark, sf).count())
    assert(n.filter(col("l2_norm") <= 0 || col("dim") =!= 64).isEmpty)
    n.unpersist()
  }

  test("text_bigram_lm: conditional probabilities within (0, 1e6] quantized") {
    val rows = graft.ops.Text2.textBigramLm(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "c12 must not exceed c1")
      assert(r.getLong(4) > 0 && r.getLong(4) <= 1000000L)
    }
  }

  test("stream_window_topk: at most 3 per window, counts non-increasing in rank") {
    val rows = graft.streaming.Events.streamWindowTopk(spark, sf).collect()
      .groupBy(_.getString(0))
    rows.values.foreach { grp =>
      assert(grp.length <= 3)
      val byRank = grp.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("mm_payload_stats: byte totals recompose the corpus") {
    val rows = graft.ops.Multimodal.mmPayloadStats(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val expect = graft.tables.Tables.documents(spark, sf)
      .agg(sum(length(col("text").cast("binary")))).head.getLong(0)
    assert(total == expect, "per-class byte totals must sum to the corpus bytes")
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(4)))
  }

  test("q_sequence_gaps: gaps contain no urgent keys and widths recompose") {
    val urgent = graft.tables.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    val gaps = Relational5.qSequenceGaps(spark, sf).collect()
    assert(gaps.length == 20)
    gaps.foreach { g =>
      val (s, e, w) = (g.getLong(0), g.getLong(1), g.getLong(2))
      assert(e - s + 1 == w)
      assert(!(s to e).exists(urgent.contains), "a gap may not contain extract keys")
    }
  }

  test("ml_item_cooccurrence: supports consistent and lift bounded") {
    val rows = Ml4.mlItemCooccurrence(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (sab, sa, sb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sab <= math.min(sa, sb), "pair support cannot exceed item support")
      assert(r.getLong(5) > 0)
    }
  }

  test("graph_pagerank: base mass floor, isolated nodes at exactly the floor, mass bounded") {
    val r = Dedup2.graphPagerank(spark, sf).cache()
    assert(r.filter(col("rank_q") < 150000L).isEmpty, "damping floor violated")
    assert(r.filter(col("degree") === 0 && col("rank_q") =!= 150000L).isEmpty,
      "isolated nodes receive no propagated mass")
    // integer division only LOSES mass: total <= N * 10^6
    val n = r.count()
    val total = r.agg(sum("rank_q")).head.getLong(0)
    assert(total <= n * 1000000L)
    assert(total > n * 150000L, "connected corpus must propagate some mass")
    r.unpersist()
  }

  test("ml_survival_km: survival non-increasing, risk sets shrink, deaths bounded") {
    val rows = Ml4.mlSurvivalKm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "deaths cannot exceed the risk set")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) < a.getLong(2), "risk set strictly shrinks across event times")
      assert(b.getLong(3) <= a.getLong(3), "survival is non-increasing")
    case _ => ()
    }
  }

  test("q_asof_nearest: distance never exceeds the backward as-of distance") {
    import graft.ops.AsOf
    val nearest = AsOf.qAsofNearest(spark, sf)
      .select(col("event_id"), col("nearest_dt_us"), col("direction")).cache()
    assert(nearest.filter(col("nearest_dt_us") < 0).isEmpty)
    // every purchase with any view neighbor got one
    assert(nearest.filter(col("direction").isNull).count() <
      nearest.count() / 10, "almost all purchases have a view neighbor")
    // both directions actually occur on this data
    val dirs = nearest.select("direction").distinct().collect().map(_.getString(0)).toSet
    assert(dirs.contains("back") && dirs.contains("fwd"))
    nearest.unpersist()
  }

  test("ann_pq_refine: 5 contiguous ranks per probe, exact distance non-decreasing") {
    val byQ = Similarity.annPqRefine(spark, sf).collect().groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
      val dists = rows.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
  }

  test("ml_ab_test: variants partition the population, rates recompose") {
    val r = Ml4.mlAbTest(spark, sf).head()
    val n = graft.tables.Tables.orders(spark, sf).count()
    assert(r.getLong(0) + r.getLong(2) == n)
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2))
    // hash split is near-even: neither arm under 40%
    assert(math.min(r.getLong(0), r.getLong(2)) > n * 2 / 5)
  }

  test("q_running_distinct: cumulative reach is monotone and ends at the distinct-user total") {
    val rows = Relational5.qRunningDistinct(spark, sf).collect()
    val users = graft.tables.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.last.getLong(3) == users, "final cumulative = distinct users")
    val cums = rows.map(_.getLong(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(rows.map(_.getLong(2)).sum == users)
  }

  test("q_benford: digits 1-9 only, shares and expectations each sum to ~1") {
    val rows = Relational5.qBenford(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3)
  }

  test("f_cyclical_encode: every point lies on the unit circle") {
    val rows = graft.ops.Features3.fCyclicalEncode(spark, sf)
      .select("dow_sin", "dow_cos", "month_sin", "month_cos").distinct().collect()
    assert(rows.length <= 7 * 12)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) * r.getDouble(0) + r.getDouble(1) * r.getDouble(1) - 1.0) < 1e-3)
      assert(math.abs(r.getDouble(2) * r.getDouble(2) + r.getDouble(3) * r.getDouble(3) - 1.0) < 1e-3)
    }
  }

  test("mm_chunk_dedup: pair counts bounded by the smaller document's frame count") {
    val pairs = graft.ops.Multimodal.mmChunkDedup(spark, sf).cache()
    assert(pairs.filter(col("a") >= col("b")).isEmpty)
    val frames = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), ((length(col("text")) - 1) / 64 + 1).cast("long").as("nf"))
    val bad = pairs
      .join(frames.withColumnRenamed("doc_id", "a").withColumnRenamed("nf", "nf_a"), "a")
      .join(frames.withColumnRenamed("doc_id", "b").withColumnRenamed("nf", "nf_b"), "b")
      .filter(col("shared_chunks") > least(col("nf_a"), col("nf_b")))
    assert(bad.isEmpty, "shared chunks cannot exceed either document's frame count")
    pairs.unpersist()
  }

  test("text_char_entropy: bounds [0, ln 5], class counts recompose") {
    val rows = Text2.textCharEntropy(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5) + r.getLong(6)
        == r.getLong(1), "class counts must partition the characters")
      if (!r.isNullAt(7)) {
        val h = r.getDouble(7)
        assert(h >= 0.0 && h <= math.log(5.0) + 1e-4)
      }
    }
  }
}
