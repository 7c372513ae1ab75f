package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup2, GraphAnn, Similarity}
import graft.tables.Tables

/** Tombstone-delete witnesses (r11 verdict directive #2) — the DELETE
  * analog of the reference's after-the-fact UPDATE lifecycle
  * (straslerj/mlb-win-predictor function.py:462-539). Three persisted
  * artifacts learn takedown: D18 `dedup_tombstone` (the band-signature
  * index), E21 `ann_index_delete` (the PQ code table), E22
  * `ann_graph_delete` (the graph edge artifact, with bridge repair).
  * Per the directive's done-bar, each gets:
  *
  *  1. influence removal — a deleted doc no longer influences
  *     admission / a deleted vector never appears in any serve;
  *  2. the delete is REAL — it changes at least one served row
  *     relative to the undeleted twin (otherwise the test would pass
  *     on a no-op);
  *  3. a re-add round-trip — restoring the tombstoned rows reproduces
  *     the undeleted behavior exactly (D18/E21) or re-attaches the
  *     vectors into serveable positions (E22, E18's insert machinery
  *     at E18's own recall bar).
  *
  * Cross-engine exactness of the three serves is the driver's: each
  * oracle is the undeleted twin's text with the tombstone predicate
  * (hash-green at all three SFs).
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def sf = TestSpark.sf

  // ---------------- D18: band-signature index ----------------

  test("dedup_tombstone: a delta doc whose ONLY near-dup was tombstoned flips reject -> admit") {
    import spark.implicits._
    val dir = Scratch.dir("tomb_docs")
    val filler = (1 to 9).map { i =>
      (i.toLong, (1 to 20).map(w => s"w${i}_$w").mkString(" "))
    }
    val dup = "the exact same twenty word payload " +
      (1 to 14).map(w => s"shared_$w").mkString(" ")
    // doc 10 is in D13's delta (% 10 = 0); doc 13 is its only near-dup
    // and lands in the takedown batch (% 10 = 3)
    val docs = filler ++ Seq((10L, dup), (13L, dup))
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("spec").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val before = Dedup2.dedupIncremental(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    val after = Dedup2.dedupTombstone(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(before(10L) == "reject",
      "setup broke: the planted duplicate must reject doc 10 pre-delete")
    assert(after(10L) == "admit",
      "tombstoning doc 13 must stop it from influencing doc 10's admission")
  }

  test("dedup_tombstone: re-appending the tombstoned rows restores D13's verdicts bit-for-bit") {
    val root = Dedup2.bandTombstonePath(spark, sf)
    // re-add = the merge-on-read serve with an EMPTY tombstone set:
    // the index parquet still holds every row (deletes never rewrote
    // it), so dropping the sidecar IS the round-trip
    val readd = Dedup2.admissionOver(spark, sf,
      graft.ops.HotBucket.saltByCap(spark.read.parquet(s"$root/index"),
        Seq("band", "sig"), col("doc_id"), s"r12.readd:$sf"))
      .collect().toSeq
    val d13 = Dedup2.dedupIncremental(spark, sf).collect().toSeq
    assert(readd == d13,
      "serving the un-tombstoned index diverged from dedup_incremental")
    // and the tombstoned serve is a REAL delete at this SF: strictly
    // fewer candidate sightings in total (the deleted docs were
    // somebody's candidates), never more per doc
    val tomb = Dedup2.dedupTombstone(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_candidates")).toMap
    val base = d13
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_candidates")).toMap
    assert(tomb.keySet == base.keySet, "delta membership must not change")
    assert(tomb.forall { case (id, n) => n <= base(id) },
      "a delete can only remove candidates")
    // NOTE at sf0.001 the takedown batch happens to collide with no
    // delta doc's bands, so tomb == base here — that a delete REALLY
    // changes admission is the constructed-corpus flip test's job
    // above (reject -> admit), not this SF's
  }

  // ---------------- E21: PQ code table ----------------

  test("ann_index_delete: tombstoned vectors vanish from every serve, and the delete is real") {
    val del = Similarity.annIndexDelete(spark, sf).collect()
    assert(del.nonEmpty)
    assert(del.forall(_.getAs[Long]("neighbor_id") % 10 != 3),
      "a tombstoned vector appeared in a post-delete serve")
    val persist = Similarity.annIndexPersist(spark, sf).collect()
    assert(persist.exists(_.getAs[Long]("neighbor_id") % 10 == 3),
      "no tombstoned vector ever served pre-delete — vacuous test")
    assert(!del.sameElements(persist),
      "the delete changed nothing about the serve")
  }

  test("ann_index_delete: frozen-codebook re-encode of the deleted set round-trips the code rows exactly") {
    val base = Similarity.pqIndexPath(spark, sf)
    val codes = spark.read.parquet(s"$base/codes")
    val tomb = spark.read
      .parquet(s"${Similarity.pqTombstonePath(spark, sf)}/tombstones")
    val deleted = Tables.embeddings(spark, sf)
      .join(tomb, Seq("vec_id"), "left_semi")
    // the codebook never retrained across the delete, so re-encoding
    // the tombstoned vectors reproduces their original code rows —
    // surviving ∪ re-encoded IS the pre-delete artifact, bit for bit
    val readd = codes.join(tomb, Seq("vec_id"), "left_anti")
      .unionByName(Similarity.pqOrdsFor(deleted, 8,
        Similarity.readCodebook(spark, base)))
    assert(readd.exceptAll(codes).isEmpty && codes.exceptAll(readd).isEmpty,
      "re-encoded deleted rows diverged from the original code rows")
  }

  // ---------------- A27c: salted hot-key aggregate ----------------

  test("q_skew_salt_agg: the two-stage salted distinct is result-identical to the plain aggregate") {
    val salted = graft.ops.Relational3.qSkewSaltAgg(spark, sf).collect()
    val plain = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        (sum(round(col("value") * 10000).cast("long")) / 10000.0)
          .as("total_value"),
        count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    assert(salted.sameElements(plain),
      "salting changed the aggregate — the domain partition is broken")
    // the plan property the operator exists for: stage 1 groups on
    // (event_type, salt), fanning the hot key's distinct set over S
    // reducers instead of one
    val qe = graft.ops.Relational3.qSkewSaltAgg(spark, sf).queryExecution
    val aggKeys = qe.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.groupingExpressions.map(_.sql).mkString(",")
    }
    assert(aggKeys.exists(_.contains("salt")) ||
      qe.optimizedPlan.toString.contains("pmod"),
      s"no salted grouping in the optimized plan:\n${aggKeys.mkString("\n")}")
  }

  // ---------------- E22: graph edge artifact ----------------

  test("ann_graph_delete: no deleted endpoint anywhere — edges, entries, or served rows") {
    val served = GraphAnn.annGraphDelete(spark, sf).collect()
    assert(served.nonEmpty)
    assert(served.forall(_.getAs[Long]("neighbor_id") % 10 != 3),
      "a tombstoned vector appeared in a post-delete serve")
    val embs = Tables.embeddings(spark, sf)
    val (repaired, (lost, bridges, kept)) = GraphAnn.repairedEdges(
      GraphAnn.edgesArtifact(spark, sf), embs, col("vec_id") % 10 === 3)
    val bad = repaired.filter(col("src") % 10 === 3 || col("dst") % 10 === 3)
    assert(bad.isEmpty, "a deleted endpoint survived repair")
    // the repair is exercised, not vacuous: edges were lost and
    // bridges were considered
    assert(lost > 0 && bridges > 0,
      s"takedown touched no edges at this SF (lost=$lost bridges=$bridges)")
    info(s"lost=$lost bridge_candidates=$bridges repaired_edges=$kept")
    // degree contract: repair re-prunes to the build's out-degree
    val maxDeg = repaired.groupBy("src").count()
      .agg(max("count")).head().getLong(0)
    assert(maxDeg <= GraphAnn.degree, s"repair overflowed degree: $maxDeg")
    // the delete is real: the undeleted serve returned tombstoned rows
    val undeleted = GraphAnn.annGraphSearch(spark, sf).collect()
    assert(undeleted.exists(_.getAs[Long]("neighbor_id") % 10 == 3),
      "no tombstoned vector ever served pre-delete — vacuous test")
  }

  test("ann_graph_delete: re-adding the deleted set re-attaches it at E18's recall bar") {
    val embs = Tables.embeddings(spark, sf)
    val isDel = col("vec_id") % 10 === 3
    val (repaired, _) = GraphAnn.repairedEdges(
      GraphAnn.edgesArtifact(spark, sf), embs, isDel)
    val surv = embs.filter(!isDel)
    val deleted = embs.filter(isDel)
    val tkAll = GraphAnn.ticksOf(embs).localCheckpoint()
    // E18's insert machinery verbatim: beam each re-added vector from
    // the surviving entries, keep top-degree edges, add the capped
    // reverse edges (appendTail's rule)
    val dEdges = GraphAnn.insertEdges(repaired,
      GraphAnn.entriesFrom(surv, deleted), tkAll)
    val wr = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
    val rev = dEdges
      .select(col("dst").as("src"), col("src").as("dst"), col("d2"))
      .withColumn("_rn", row_number().over(wr))
      .filter(col("_rn") <= GraphAnn.degree).drop("_rn")
    val full = repaired.unionByName(dEdges).unionByName(rev)
    // serve the RE-ADDED vectors' own searches over the repaired ∪
    // re-inserted graph: a round-tripped set must serve its own
    // neighborhood at least as well as E18's staleness gate demands
    val (pool, _) = GraphAnn.greedyPoolFrom(full,
      GraphAnn.entriesFrom(surv, deleted), tkAll, GraphAnn.maxSteps)
    val wq = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
    val served3 = pool.withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= 3).select("qid", "nid")
    val qarr = GraphAnn.ticksOf(deleted)
      .select(col("vec_id").as("qid"), col("tv").as("qv"))
    val wt = Window.partitionBy("qid").orderBy(col("d2"), col("nid"))
    val exact3 = tkAll.select(col("vec_id").as("nid"), col("tv"))
      .crossJoin(broadcast(qarr))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        graft.functions.VectorOps.intSqDist(col("qv"), col("tv")).as("d2"))
      .withColumn("_rn", row_number().over(wt)).filter(col("_rn") <= 3)
      .select("qid", "nid")
    val hits = exact3.join(served3, Seq("qid", "nid")).count()
    val truth = exact3.count()
    info(s"re-add recall@3: $hits/$truth")
    assert(hits * 100L >= GraphAnn.appendThresholdPct * truth,
      s"re-added vectors under-serve their own neighborhood: $hits/$truth")
    // and the re-added ids are served again (they are their own walks'
    // starting pool, so assert the stronger thing: they appear as
    // NEIGHBORS in surviving probes' serves over the re-added graph)
    val probes = surv.filter(col("vec_id") % 100 === 0)
    val (spool, _) = GraphAnn.greedyPoolFrom(full,
      GraphAnn.entriesFrom(embs, probes), tkAll, GraphAnn.maxSteps)
    assert(spool.filter(col("nid") % 10 === 3).count() > 0,
      "no re-added vector is reachable from surviving probes")
  }
}
