package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._
import graft.tables.Tables

/** E15 — `ann_graph_search`: the HNSW-SHAPE graph serving tier
  * (round-9 directive #3). IVF-PQ (E10) covers the billion-vector
  * budget regime; high-recall serving regimes are graph-index
  * territory: a persisted neighbor graph walked greedily from a
  * deterministic entry point, touching steps·degree vectors per query
  * instead of a cell's worth.
  *
  * Build (NN-DESCENT, the distributed graph-construction algorithm):
  * initialize with the LSH same-bucket top-`degree` edges (E7's
  * bounded O(n²/2^planes) candidate shape, triangle-guarded) PLUS a
  * deterministic id-order ring — the ring is the "any connected graph"
  * seed NN-descent needs: bucket-local edges alone leave the graph
  * split into ≤2^planes components a greedy walk could never cross.
  * Then two descent rounds: candidates = current edges ∪ composed
  * neighbor-of-neighbor pairs over the UNDIRECTED closure, keep the
  * top-`degree` by exact integer-tick L2 (ties to the lower id).
  * Each round is O(n·degree²) equi-join work — no n² anywhere, and
  * every step is hash-partitioned by node id at scale.
  *
  * Serve: greedy best-first from the corpus MEDOID (argmin integer L2
  * to the round-half integer centroid — deterministic, replayable):
  * per step, evaluate the current node's out-neighbors against the
  * query and move to the best strictly-improving one; stop at a local
  * minimum. The result is the exact top-k over every vector the walk
  * TOUCHED (entry + all evaluated neighbor lists) — the honest scan
  * fraction, steps·degree per query. The driver loop is bounded (the
  * walk distance strictly decreases), and each step is one
  * probe-frontier broadcast against the edge artifact — the graph is
  * the big side, scanned per step, never collected.
  *
  * Everything is integer (10⁻⁶ ticks, exact bigint L2), so the WHOLE
  * pipeline — bucket init, ring, both descent rounds, medoid entry,
  * the greedy walk itself, and the final top-k — replays bit-for-bit
  * in DuckDB: the walk as a pointer-chase recursive CTE over a
  * precomputed per-(query, node) best-neighbor table (recursive terms
  * cannot aggregate, so the argmin is hoisted out — same fixpoint).
  * Round9dSpec pins recall ≥ the LSH tier's at a smaller touched
  * fraction, walk-length sanity, and artifact-read serving.
  */
object GraphAnn {

  private[graft] val degree = 12
  private[ops] val descentRounds = 2
  private[graft] val maxSteps = 64

  /** Per-dir serve telemetry for the recall/scan audit (Round9dSpec):
    * (global walk steps until every walk stalled, touched-pool rows).
    */
  private[graft] val serveStats =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()

  private def qticks(c: Column): Column =
    transform(c, x => floor(x * lit(1000000.0) + lit(0.5)).cast("long"))

  /** The 4-hyperplane sign-bucket expression over an `emb` column —
    * shared by the build, the entry medoids, and the append insert.
    */
  private def bucketCol: Column = {
    val planes = Dedup.hyperplanes(4, 64)
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit(_)): _*)
      when(dot(col("emb"), planeCol) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** (vec_id, tv) — the integer-tick view of an embeddings-shaped
    * frame (vec_id, embedding).
    */
  private[graft] def ticksOf(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), qticks(asDouble(col("embedding"))).as("tv"))

  /** (vec_id, tv) — the integer-tick corpus. */
  private def ticks(spark: SparkSession, dir: String): DataFrame =
    ticksOf(Tables.embeddings(spark, dir))

  private def withDist(pairs: DataFrame, tk: DataFrame): DataFrame =
    pairs
      .join(tk.select(col("vec_id").as("src"), col("tv").as("sv")), Seq("src"))
      .join(tk.select(col("vec_id").as("dst"), col("tv").as("dv")), Seq("dst"))
      .select(col("src"), col("dst"), intSqDist(col("sv"), col("dv")).as("d2"))

  private def topDeg(pairs: DataFrame, tk: DataFrame,
                     deg: Int = degree): DataFrame = {
    val w = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
    withDist(pairs, tk)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= deg)
      .drop("_rn")
  }

  /** One NN-descent round: candidates = current edges ∪ composed
    * neighbor-of-neighbor pairs over the REVERSE-CAPPED undirected
    * closure. The cap is load-bearing at scale: a hub vector chosen by
    * many nodes has unbounded IN-degree, and an uncapped composition
    * squares it per hub (the measured sf0.1 oracle replay ran minutes
    * instead of seconds) — production NN-descent samples/bounds reverse
    * neighbors for exactly this reason, so the capped closure (top-
    * `degree` reverse edges per node, nearest-first, id tie-break) is
    * the honest algorithm, not a shortcut. Per-node composition work is
    * then ≤ (2·degree)², deterministic, and replayable.
    */
  private def descentRound(edges: DataFrame, tk: DataFrame,
                           deg: Int = degree): DataFrame = {
    val dir0 = edges.select("src", "dst")
    val revW = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
    val rev = edges
      .select(col("dst").as("src"), col("src").as("dst"), col("d2"))
      .withColumn("_rn", row_number().over(revW))
      .filter(col("_rn") <= deg)
      .select("src", "dst")
    val u = dir0.union(rev).distinct()
    val composed = u.as("a").join(u.as("b"), col("a.dst") === col("b.src"))
      .filter(col("a.src") =!= col("b.dst"))
      .select(col("a.src").as("src"), col("b.dst").as("dst"))
    topDeg(dir0.union(composed).distinct(), tk, deg)
  }

  /** The persisted edge artifact (src, dst, d2) — built once per sf
    * dir, written to parquet (E9's ship-the-artifact discipline), and
    * read back for every serve. Out-degree ≥ 1 for every node (the
    * ring seeds one out-edge each and descent only ever REPLACES
    * candidates, never empties them).
    */
  private[graft] def edgesArtifact(spark: SparkSession, dir: String): DataFrame =
    // applicationId in the key (statsplan.tables / mergeencode.table
    // discipline): the memoized frame is bound to THIS SparkContext —
    // a later context in the same JVM must rebuild, not receive a
    // handle to a stopped context.
    graft.QueryCaches.memo(
      s"graphann.edges:$dir:${spark.sparkContext.applicationId}") {
      val edges = buildEdges(spark, dir)
      val path = graft.Scratch.dir("graphann_edges")
      edges.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

  /** The edge-build plan, pre-persist — split out so Round10Spec can
    * audit it (no fact-scale single-partition window anywhere in the
    * build).
    */
  private[graft] def buildEdges(spark: SparkSession, dir: String): DataFrame =
    buildEdgesFrom(Tables.embeddings(spark, dir), s"graphann.buckets:$dir")

  /** NN-descent over an ARBITRARY embeddings-shaped frame — the
    * frame-parameterized core the full-corpus build, the append
    * pipeline's BASE build, and the shifted-delta specs share.
    */
  private[graft] def buildEdgesFrom(embs: DataFrame, bucketTag: String,
                                    deg: Int = degree,
                                    rounds: Int = descentRounds): DataFrame = {
      // build-LOCAL tick materialization (localCheckpoint, not persist):
      // persist registers by analyzed-plan equality, so a build-scoped
      // persist+unpersist of the shared ticks plan would evict any
      // serve's cache of the same frame mid-session (the r12 advisor's
      // finding against adcEdgesArtifact) — the checkpointed copy has
      // its own LogicalRDD plan and no CacheManager interaction
      val tk = ticksOf(embs).localCheckpoint()
      val bucket = bucketCol
      val e = embs
        .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      // same-bucket init pairs under the lossless triangle guard (E7's
      // discipline — 16 sign buckets are STRUCTURALLY hot at scale)
      val bucketed = HotBucket.triangleReplicate(e.withColumn("bucket", bucket),
        Seq("bucket"), col("vec_id"), bucketTag)
      val pairs0 = bucketed.as("l")
        .join(bucketed.as("r"), Seq("bucket", "tmin", "tmax"))
        .filter(HotBucket.trianglePairFilter(col("l.grp"), col("r.grp")))
        .filter(col("l.vec_id") =!= col("r.vec_id"))
        .select(col("l.vec_id").as("src"), col("r.vec_id").as("dst"))
      // deterministic id-order ring: the cross-component connectivity
      // seed. Consecutive pairing rides DistRank (A50b's shape): global
      // rank at full parallelism, then rank-r ⋈ rank-r+1 — the round-9
      // verdict's one plan nit was this ring as a fact-scale
      // single-partition `lead() OVER (ORDER BY src)` window (n ids
      // through ONE task at 10⁹–10¹⁰ vectors); the rank equi-join is
      // the same consecutive pairing, hashes unchanged, and
      // Round10Spec pins the build plan free of single-partition
      // windows.
      val minId = e.agg(min("vec_id")).head().getLong(0)
      val ranked = DistRank.withGlobalRank(
        e.select(col("vec_id")), "_r", col("vec_id"))
      val ring = ranked.select(col("vec_id").as("src"), col("_r"))
        .join(ranked.select(col("vec_id").as("dst"), (col("_r") - 1).as("_r")),
          Seq("_r"), "left")
        .select(col("src"), coalesce(col("dst"), lit(minId)).as("dst"))
        .filter(col("src") =!= col("dst"))
      var edges = topDeg(pairs0.union(ring).distinct(), tk, deg)
      // materialize BETWEEN rounds: an un-checkpointed r-round descent
      // executes as one stacked job whose concurrent join/aggregate
      // buffers scale with r·deg² — the 4× rehearsal's deg-16 × 3-round
      // layer build exhausted execution memory exactly this way inside
      // the full-sweep JVM (standalone it fit). Per-round checkpoints
      // cap the live set at ONE round's shuffles; results are identical
      // (re-verified at all three SFs for every graph row).
      (1 to rounds).foreach { _ =>
        edges = descentRound(edges.localCheckpoint(), tk, deg)
      }
      edges
    }

  /** The entry-point masks: each probe starts one walk from the global
    * medoid plus the medoids of its own and xor-adjacent sign buckets —
    * E6's multi-probe discipline applied to graph ENTRIES. Measured at
    * sf0.1 (60 truth slots): recall@3 0.33 vs the LSH tier's 0.18, at
    * ~1.2× the LSH bucket-scan's touched vectors; a single global entry
    * was 0.02 (beam-1 greedy on random 64-d data stalls in the first
    * local minimum — entries, not walk length, are the recall lever).
    */
  private val entryMasks = Seq(0, 1, 2, 4, 8)

  /** The greedy serve: independent walks from each entry, then exact
    * top-k over everything any walk touched. Memoized per dir — the
    * loop's bounded per-step frames are built once per JVM and reused
    * by repeated bench passes.
    */
  /** The probe set with its entry points (qid, qv, ent) — the medoid
    * arithmetic shared by the greedy serve and the beam serve: global
    * medoid + xor-adjacent sign-bucket medoids, all collected bounded
    * (|dims| centroid rows, ≤2^planes medoids) and inlined as
    * literals. Memoized per dir.
    */
  private def probeEntries(spark: SparkSession, dir: String): DataFrame =
    graft.QueryCaches.memo(
      s"graphann.entries:$dir:${spark.sparkContext.applicationId}") {
      val embs = Tables.embeddings(spark, dir)
      entriesFrom(embs, embs.filter(col("vec_id") % 100 === 0))
    }

  /** Entries for an ARBITRARY probe frame over an ARBITRARY corpus
    * frame: medoids from the corpus, entry picks per probe bucket —
    * the append pipeline routes its delta probes through the BASE
    * corpus's medoids with this.
    */
  private[graft] def entriesFrom(corpusEmbs: DataFrame, probeEmbs: DataFrame): DataFrame = {
      val tk = ticksOf(corpusEmbs)
      val bucket = bucketCol
      val withB = corpusEmbs
        .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
        .withColumn("bucket", bucket)
        .select(col("vec_id"), col("bucket"), qticks(col("emb")).as("tv"))
      // round-half integer centroid (E3's cq formula over one group),
      // collected bounded (|dims| rows), inlined as a literal
      val cent = tk.select(posexplode(col("tv")).as(Seq("pos", "q")))
        .groupBy("pos").agg(sum("q").as("sq"), count(lit(1)).as("cnt"))
        .select(col("pos"), expr("(2 * sq + cnt) div (2 * cnt)").as("cq"))
        .collect().sortBy(_.getInt(0)).map(_.getLong(1))
      val centLit = array(cent.map(lit(_)): _*)
      val dC = withB.select(col("vec_id"), col("bucket"),
        intSqDist(col("tv"), centLit).as("d2c"))
      val gmed = dC.orderBy(col("d2c"), col("vec_id")).limit(1)
        .head().getLong(0)
      // per-bucket medoids: ≤ 2^planes rows, collected and inlined
      val bw = Window.partitionBy("bucket").orderBy(col("d2c"), col("vec_id"))
      val bmeds = dC.withColumn("_rn", row_number().over(bw))
        .filter(col("_rn") === 1).select("bucket", "vec_id")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val bmapLit = map(bmeds.toSeq.sortBy(_._1)
        .flatMap { case (b, m) => Seq(lit(b), lit(m)) }: _*)
      val entries = entryMasks.map(m =>
        coalesce(element_at(bmapLit, col("bucket").bitwiseXOR(lit(m))),
          lit(gmed))) :+ lit(gmed)
      probeEmbs
        .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
        .withColumn("bucket", bucket)
        .select(col("vec_id").as("qid"), qticks(col("emb")).as("qv"),
          explode(array_distinct(array(entries: _*))).as("ent"))
        .localCheckpoint()
    }

  /** The greedy multi-entry walk over an ARBITRARY edge frame + probe
    * frame, returning (touched pool (qid, nid, d), steps) — shared by
    * the E15 serve and the append pipeline's staleness gate.
    * localCheckpoint (not persist) on every loop frame is
    * CORRECTNESS-critical, not an optimization: with plain persist
    * the next step's `edges.join(frontier, ...)` is a self-join
    * (frontier's lineage CONTAINS the edge scan), whose ambiguous
    * column resolution silently mis-joined at sf0.1 — and the
    * uncheckpointed lineage doubles per step (measured: 188 s → 52 s
    * for the whole serve, and a driver OOM in the debug twin).
    */
  private[graft] def greedyPoolFrom(edges: DataFrame, probes: DataFrame,
                                    tk: DataFrame, stepCap: Int): (DataFrame, Int) = {
      var frontier = probes
        .join(tk.select(col("vec_id").as("ent"), col("tv").as("ev")), Seq("ent"))
        .select(col("qid"), col("ent"), col("qv"), col("ent").as("cur"),
          intSqDist(col("qv"), col("ev")).as("d"))
        .localCheckpoint()
      val pools = scala.collection.mutable.ArrayBuffer(
        frontier.select(col("qid"), col("cur").as("nid"), col("d")))
      var steps = 0
      var active = frontier.count()
      while (active > 0 && steps < stepCap) {
        // the probe frontier is the broadcast side; the edge artifact
        // is the big side, scanned per step
        val cand = edges.join(broadcast(frontier), edges("src") === frontier("cur"))
          .join(tk.select(col("vec_id").as("dst"), col("tv").as("dv")), Seq("dst"))
          .select(col("qid"), col("ent"), col("qv"), col("d"), col("dst"),
            intSqDist(col("qv"), col("dv")).as("nd"))
          .localCheckpoint()
        pools += cand.select(col("qid"), col("dst").as("nid"), col("nd").as("d"))
        val best = cand.groupBy("qid", "ent")
          .agg(min(struct(col("nd"), col("dst"))).as("m"))
        val next = frontier.join(best, Seq("qid", "ent"))
          .filter(col("m.nd") < col("d"))
          .select(col("qid"), col("ent"), col("qv"), col("m.dst").as("cur"),
            col("m.nd").as("d"))
          .localCheckpoint()
        active = next.count()
        frontier = next
        steps += 1
      }
      // the oracle's recursive walk CTE is UNBOUNDED; a corpus where any
      // walk makes stepCap+ strictly-improving steps would silently
      // truncate the touched pool here and surface only as a confusing
      // hash mismatch — fail loudly instead (Round10Spec witnesses)
      require(active == 0,
        s"greedy walk: $active walk(s) still strictly improving after " +
          s"$stepCap steps — the bounded engine walk would diverge from " +
          "the oracle's unbounded greedy fixpoint; raise the step cap")
      val pool = pools.reduce(_.union(_)).distinct()
        .filter(col("nid") =!= col("qid"))
        .localCheckpoint()
      (pool, steps)
  }

  def annGraphSearch(spark: SparkSession, dir: String, k: Int = 3,
                     stepCap: Int = maxSteps): DataFrame =
    graft.QueryCaches.memo(
      s"graphann.search:$dir:$k:$stepCap:${spark.sparkContext.applicationId}") {
      val tk = ticks(spark, dir).persist()
      val edges = edgesArtifact(spark, dir)
      val probes = probeEntries(spark, dir)
      val (pool, steps) = greedyPoolFrom(edges, probes, tk, stepCap)
      serveStats.put(dir, (steps, pool.count()))
      val w = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
      pool.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid").as("query_id"), col("rank"),
          col("nid").as("neighbor_id"), col("d").as("graph_dist"))
        .orderBy("query_id", "rank")
        .persist()
    }

  // ef = 16: measured at sf0.1 against the same exact truth as the
  // greedy tier — recall@3 0.433 vs greedy's 0.317 at 1.92x its touched
  // scan (ef 6/8/12 measured 0.267/0.300/0.367 at 1.00/1.20/1.54x);
  // the frontier must be WIDER than the ~6 medoid entries it replaces,
  // or merging the independent walks into one beam LOSES exploration
  // (ef=4 measured 0.200 - worse than greedy)
  private[graft] val beamEf = 16
  private[graft] val beamRounds = 24

  /** Per-dir beam-serve telemetry: (rounds to fixpoint, pooled rows). */
  private[graft] val beamStats =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()

  /** The ef-bounded best-first frontier loop over an ARBITRARY edge
    * frame + (qid, qv, ent) probe frame, to the fixpoint — shared by
    * the E17 serve and the append pipeline's search-based insert.
    * Returns (touched pool (qid, nid, d), rounds).
    */
  private[graft] def beamPoolFrom(edges: DataFrame, probes: DataFrame,
                                  tk: DataFrame, ef: Int,
                                  roundCap: Int): (DataFrame, Int) = {
      val w = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
      var frontier = probes
        .join(tk.select(col("vec_id").as("ent"), col("tv").as("ev")), Seq("ent"))
        .select(col("qid"), col("qv"), col("ent").as("nid"),
          intSqDist(col("qv"), col("ev")).as("d"))
        .distinct()
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= ef)
        .drop("_rn")
        .localCheckpoint()
      val pools = scala.collection.mutable.ArrayBuffer(
        frontier.select(col("qid"), col("nid"), col("d")))
      var rounds = 0
      var converged = false
      while (!converged && rounds < roundCap) {
        val cand = edges.join(broadcast(frontier), edges("src") === frontier("nid"))
          .join(tk.select(col("vec_id").as("dst"), col("tv").as("dv")), Seq("dst"))
          .select(col("qid"), col("qv"), col("dst").as("nid"),
            intSqDist(col("qv"), col("dv")).as("d"))
          .localCheckpoint()
        pools += cand.select(col("qid"), col("nid"), col("d"))
        val next = frontier.union(cand).distinct()
          .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= ef)
          .drop("_rn")
          .localCheckpoint()
        converged = next.select(col("qid"), col("nid"))
          .exceptAll(frontier.select(col("qid"), col("nid"))).isEmpty
        frontier = next
        rounds += 1
      }
      require(converged,
        s"beam frontier still improving after $roundCap rounds — " +
          "the fixed-unroll oracle would diverge; raise beamRounds")
      val pool = pools.reduce(_.union(_)).distinct()
        .filter(col("nid") =!= col("qid"))
        .localCheckpoint()
      (pool, rounds)
  }

  /** E17 — `ann_graph_beam` (round-10 directive #4): the greedy walk
    * widened to an ef-BOUNDED BEST-FIRST FRONTIER — HNSW's ef-search,
    * the standard lever from greedy's local-minimum recall regime
    * toward the 0.9+ regimes graph indexes serve at. Per round the
    * frontier (top-`beamEf` nodes per probe by exact integer (d, nid))
    * expands every member's out-neighbors and re-selects the top-ef
    * over frontier ∪ candidates; the iteration is a DETERMINISTIC
    * FIXPOINT — the frontier's sorted (d, nid) list is monotone
    * non-increasing under expansion, so it strictly improves until no
    * neighbor beats the worst member, then never changes again. The
    * result is the exact top-k over everything any round touched.
    *
    * The per-step join shape is E15's unchanged: the bounded frontier
    * (|probes|·ef rows) broadcasts against the edge artifact — the
    * graph is the big side, scanned per round, never collected.
    *
    * ORACLE: the fixpoint property is what makes a FIXED unroll exact —
    * `beamRounds` idempotent CTE rounds (a converged frontier re-derives
    * itself and its candidates dedupe into the pool), while the engine
    * iterates only to the measured fixpoint and FAILS LOUDLY if
    * convergence would need more rounds than the oracle unrolls (E15's
    * step-cap discipline).
    */
  def annGraphBeam(spark: SparkSession, dir: String, k: Int = 3,
                   ef: Int = beamEf, roundCap: Int = beamRounds): DataFrame =
    graft.QueryCaches.memo(
      s"graphann.beam:$dir:$k:$ef:$roundCap:${spark.sparkContext.applicationId}") {
      val tk = ticks(spark, dir).persist()
      val edges = edgesArtifact(spark, dir)
      val w = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
      val (pool, rounds) = beamPoolFrom(edges, probeEntries(spark, dir),
        tk, ef, roundCap)
      beamStats.put(dir, (rounds, pool.count()))
      pool.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid").as("query_id"), col("rank"),
          col("nid").as("neighbor_id"), col("d").as("beam_dist"))
        .orderBy("query_id", "rank")
        .persist()
    }

  // ---------------- E18: incremental append + staleness gate ----------------

  /** Gate threshold, integer percent: recall@3 of the appended
    * vectors' OWN serve over base ∪ append. Measured (exact integers,
    * deterministic): contract delta 78/77/43% at sf0.001/0.01/0.1; the
    * constructed disjoint-cluster delta 26% — the cluster is reachable
    * only through the ≤`degree` reverse slots of the few base nodes
    * nearest to it, so most cluster-mates never serve. 30% separates
    * the regimes on every measured corpus (Round10fSpec pins both
    * sides).
    */
  private[graft] val appendThresholdPct = 30L

  /** Per-(dir, k) append telemetry: (gate hits, truth slots, stale). */
  private[graft] val appendStats =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Boolean)]()

  private[graft] case class AppendBuild(baseEdges: DataFrame,
                                        appendEdges: DataFrame,
                                        probes: DataFrame,
                                        gatePool: DataFrame,
                                        hits: Long, truth: Long, stale: Boolean)

  /** E18's frame-parameterized core (the shifted-delta specs drive
    * synthetic corpora through it): incremental maintenance of the
    * edge artifact, E12/E13's discipline applied to the graph tier.
    *
    *  - BASE: the full NN-descent build over the base subset only —
    *    built once, its files never touched again.
    *  - INSERT (search-based, HNSW's discipline — stronger than
    *    bucket-candidate attach: it reuses the index being maintained
    *    and costs one beam search per vector instead of an
    *    O(|bucket|) scan): each appended vector beam-searches the
    *    BASE graph from the base medoid entries; its top-`degree`
    *    pooled results become its out-edges. One LOCALIZED descent
    *    round (neighbor-of-neighbor through the base adjacency,
    *    re-top-degree by exact distance) then repairs what the beam
    *    missed — O(|delta|·degree²), never O(corpus).
    *  - REVERSE edges give reachability INTO the appended vectors: per
    *    touched base node up to `degree` nearest appended vectors
    *    (out-degree may temporarily exceed `degree` — the same
    *    overflow HNSW tolerates between maintenance passes).
    *  - GATE: greedy-serve the appended vectors THEMSELVES over
    *    base ∪ append against the exact full-corpus truth — a
    *    well-attached delta serves its own neighborhood; a
    *    distribution-shifted one is unreachable from base entries and
    *    collapses. All-integer recall, so the decision replays
    *    bit-for-bit in the oracle (E13's gate pattern).
    *
    * Split (round 11) into [[insertEdges]] + [[appendTail]] so the G18
    * streaming drain can run the per-vector-deterministic insert per
    * micro-batch and the accumulated tail at serve time.
    */
  private[graft] def appendPipeline(embs: DataFrame, isDelta: Column,
                                    bucketTag: String): AppendBuild = {
    val base = embs.filter(!isDelta)
    val delta = embs.filter(isDelta)
    val tkAll = ticksOf(embs).localCheckpoint()
    val baseEdges = buildEdgesFrom(base, bucketTag).localCheckpoint()
    val dEdges = insertEdges(baseEdges, entriesFrom(base, delta), tkAll)
    appendTail(baseEdges, dEdges, embs, isDelta, tkAll)
  }

  /** The search-based INSERT for one arrival frame: beam from the base
    * medoid entries, keep each arrival's top-`degree` pooled results as
    * out-edges, repair with one localized descent round through the
    * base adjacency. PER-VECTOR deterministic and pure in its inputs —
    * each probe's beam converges to its own fixpoint regardless of what
    * else is in the frame — so ANY batching of the delta (one shot, a
    * daily job, streaming micro-batches) lands the identical edge rows.
    * `stream_vector_admit` (G18) rides exactly this property.
    */
  private[graft] def insertEdges(baseEdges: DataFrame, dEntries: DataFrame,
                                 tkAll: DataFrame): DataFrame = {
    val (insPool, _) = beamPoolFrom(baseEdges, dEntries, tkAll, beamEf, beamRounds)
    val wq = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
    val dEdges0 = insPool.withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= degree)
      .select(col("qid").as("src"), col("nid").as("dst"))
    val comp = dEdges0.join(
        baseEdges.select(col("src").as("dst"), col("dst").as("dst2")), Seq("dst"))
      .select(col("src"), col("dst2").as("dst"))
    topDeg(dEdges0.union(comp).distinct(), tkAll).localCheckpoint()
  }

  /** Everything AFTER the inserts: the reverse-edge cap (a function of
    * the ACCUMULATED delta edges — per-batch capping would admit up to
    * batches·degree reverse slots per base node and diverge from the
    * one-shot build, which is why the streaming drain stores raw insert
    * edges and derives reverse edges here), the gate serve, and the
    * gate arithmetic. Shared verbatim by E18 and G18.
    */
  private[graft] def appendTail(baseEdges: DataFrame, dEdges: DataFrame,
                                embs: DataFrame, isDelta: Column,
                                tkAll: DataFrame): AppendBuild = {
    val base = embs.filter(!isDelta)
    val delta = embs.filter(isDelta)
    val dEntries = entriesFrom(base, delta)
    val wq = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
    val wr = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
    val rev = dEdges
      .select(col("dst").as("src"), col("src").as("dst"), col("d2"))
      .withColumn("_rn", row_number().over(wr)).filter(col("_rn") <= degree)
      .drop("_rn")
    val appendEdges = dEdges.union(rev).localCheckpoint()
    val (gatePool, _) =
      greedyPoolFrom(baseEdges.union(appendEdges), dEntries, tkAll, maxSteps)
    val served3 = gatePool.withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= 3).select("qid", "nid")
    val qarr = ticksOf(delta).select(col("vec_id").as("qid"), col("tv").as("qv"))
    val wt = Window.partitionBy("qid").orderBy(col("d2"), col("nid"))
    val exact3 = tkAll.select(col("vec_id").as("nid"), col("tv"))
      .crossJoin(broadcast(qarr))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), intSqDist(col("qv"), col("tv")).as("d2"))
      .withColumn("_rn", row_number().over(wt)).filter(col("_rn") <= 3)
      .select("qid", "nid")
      .localCheckpoint()
    val hits = exact3.join(served3, Seq("qid", "nid")).count()
    val truth = exact3.count()
    val stale = hits * 100L < appendThresholdPct * truth
    AppendBuild(baseEdges, appendEdges, dEntries, gatePool, hits, truth, stale)
  }

  /** Per-(dir, k) append artifact root, for the base-files-untouched
    * spec — keyed like the memo itself, so a second call with a
    * different k never overwrites the stats/root a reader pairs with
    * the first call's memoized frame.
    */
  private[graft] val appendRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** E18 — `ann_graph_append`: the maintained index serving the
    * APPENDED vectors' searches from whichever generation the gate
    * picked — the appended base∪delta artifact when fresh (the
    * contract corpus), the full rebuild when the gate trips. The
    * oracle replays the base build, the insert beams, the localized
    * descent, the reverse cap, the gate arithmetic, and BOTH serve
    * branches, UNION-selecting on the gate boolean — the driver
    * hash-proves the maintenance DECISION, not just the served rows.
    */
  def annGraphAppend(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    graft.QueryCaches.memo(
      s"graphann.append:$dir:$k:${spark.sparkContext.applicationId}") {
      val embs = Tables.embeddings(spark, dir)
      val isDelta = col("vec_id") % 10 === 7
      val ab = appendPipeline(embs, isDelta, s"graphann.abuckets:$dir")
      val root = graft.Scratch.dir("graphann_append")
      ab.baseEdges.write.mode("overwrite").parquet(s"$root/base")
      // the append writes a SEPARATE file set — the base generation's
      // files stay byte-identical (Round10fSpec pins it)
      ab.appendEdges.write.mode("overwrite").parquet(s"$root/delta")
      appendRoots.put(s"$dir:$k", root)
      appendStats.put(s"$dir:$k", (ab.hits, ab.truth, ab.stale))
      // the stale branch REBUILDS — and a rebuild regenerates the entry
      // medoids from the full corpus too (base-medoid entries can never
      // route a walk into a delta-only region; Round10fSpec measured
      // exactly that: rebuilt edges under base entries served 0/120 on
      // the disjoint-cluster delta, full entries recover it)
      val pool =
        if (ab.stale)
          greedyPoolFrom(edgesArtifact(spark, dir),
            entriesFrom(embs, embs.filter(isDelta)),
            ticksOf(embs), maxSteps)._1
        else ab.gatePool
      val w = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
      pool.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid").as("query_id"), col("rank"),
          col("nid").as("neighbor_id"), col("d").as("append_dist"))
        .orderBy("query_id", "rank")
        .persist()
    }

  // ---------------- E23: ADC-assisted beam serve ----------------

  /** E23's dedicated build: the (20, 3) point the E19 sweep MEASURED at
    * 0.733 recall but rejected — its touched pool (11,495 rows at
    * sf0.1) is 4.7× the LSH tier's scan when every touched vector
    * costs a 256 B raw read. ADC re-prices exactly that term.
    */
  private[graft] val adcDegree = 20
  private[graft] val adcBuildRounds = 3

  /** How many ADC-ranked pool rows per probe get the exact integer
    * re-rank — E8's shortlist discipline, widened 4× because the ADC
    * ordering is the walk's ONLY ordering here (E8 reranks a full-scan
    * shortlist; this reranks a walk-pool whose ADC-competitive junk
    * crowds true neighbors below rank 50 — measured: rank-50 rerank
    * caps recall at 0.517–0.550 across every frontier width, rank-100
    * reaches 0.717, rank-200 recovers 0.733 = the (20,3) build's
    * exact-walk ceiling). 200 raw reads/probe = 51 KB/probe, still
    * ~20% of the per-probe LSH bucket scan.
    */
  private[graft] val adcRerankN = 200

  /** The ADC walk's frontier width. WIDER than E17's exact-scored
    * ef=16 on purpose: ADC misorders near-ties (8-lookup error), so
    * the frontier must hold more candidates to keep the true near
    * neighbors walking — and ADC re-priced the frontier's cost to
    * 16 B/row, which is exactly what pays for the width. Measured at
    * sf0.1 (rerank=200): ef=16 → 0.667, ef=24 → 0.733, and WIDER IS
    * NOT MONOTONE at thin reranks (ef=48/rerank=100 → 0.667 vs
    * ef=24's 0.717: a wider pool adds ADC-flattering junk that crowds
    * the shortlist). 24 is the measured knee.
    */
  private[graft] val adcBeamEf = 24

  /** Per-dir E23 telemetry: (beam rounds, pooled rows, code bytes
    * touched, rerank bytes touched).
    */
  private[graft] val adcBeamStats =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Long, Long, Long)]()

  private def adcEdgesArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.QueryCaches.memo(
      s"graphann.adcedges:$dir:${spark.sparkContext.applicationId}") {
      val edges = buildEdgesFrom(Tables.embeddings(spark, dir),
        s"graphann.adcbuckets:$dir", adcDegree, adcBuildRounds)
      val path = graft.Scratch.dir("graphann_adc_edges")
      edges.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

  /** E27's refined build: degree 40 (same 3 NN-descent rounds). The r13
    * sweep over the EXACT truth panel at sf0.1, all serves at E23's
    * (ef 24, rerank 200): deg 20 → 0.733 (E23's pinned ceiling),
    * deg 32 → 0.917, deg 40 → 0.950 at 1,426,928 touched bytes = 2.28×
    * the LSH tier's scan (bar: ≥ 0.85 inside ≤ 4×). Rerank depth
    * remains the floor on the better graph too — rank-100 collapses to
    * 0.750 even at deg 40 (the r12 finding transfers); extra descent
    * rounds matter less than degree (deg 40 at TWO rounds → 0.883).
    * Degree is the budget lever ADC pricing paid for: doubling it
    * roughly doubles the 16 B/row code-read term (~250 KB → ~400 KB)
    * while the raw-read rerank term (1,024 KB) is unchanged.
    */
  private[graft] val refineDegree = 40
  private[graft] val refineBuildRounds = 3

  private[graft] def refineEdgesArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.QueryCaches.memo(
      s"graphann.refineedges:$dir:${spark.sparkContext.applicationId}") {
      val edges = buildEdgesFrom(Tables.embeddings(spark, dir),
        s"graphann.refinebuckets:$dir", refineDegree, refineBuildRounds)
      val path = graft.Scratch.dir("graphann_refine_edges")
      edges.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

  /** E27 — `ann_graph_refine` (r12 verdict directive #4): the recall
    * frontier pushed past the (20,3) build's 0.733 exact-walk ceiling
    * by building a BETTER GRAPH and serving it with E23's ADC walk
    * verbatim ([[beamAdcServe]] — shared code, so the two rows can
    * only differ in the edges). Measured at sf0.1: recall@3 = 0.950 at
    * 2.28× the LSH byte budget (constants' scaladoc has the sweep;
    * Round13fSpec pins the point, the budget, and dominance over E23).
    *
    * Scale shape: identical to E23's — the build is offline (one
    * NN-descent at 2× the degree, still bounded composition under the
    * reverse cap); the serve's per-round cost doubles with the degree
    * but stays 16 B/touched-row, and the exact re-rank term is
    * unchanged.
    */
  def annGraphRefine(spark: SparkSession, dir: String, k: Int = 3,
                     ef: Int = adcBeamEf,
                     rerankN: Int = adcRerankN): DataFrame =
    graft.QueryCaches.memo(
      s"graphann.refine:$dir:$k:$ef:$rerankN:${spark.sparkContext.applicationId}") {
      beamAdcServe(spark, dir, refineEdgesArtifact(spark, dir), k, ef,
        rerankN, s"refine:$dir")
    }

  /** [[beamPoolFrom]] with the SCORING swapped from exact 64-dim
    * integer L2 to E5's 8-lookup ADC distance: probes carry their
    * per-subspace distance tables (`dtm`), candidates join the 16 B
    * code rows instead of the 256 B tick vectors. Same fixpoint
    * argument — the ADC-scored frontier is monotone non-increasing
    * under expansion in (ad, nid) order — so the fixed oracle unroll
    * stays exact. Returns (touched pool (qid, nid, ad), rounds).
    */
  private[graft] def beamPoolAdcFrom(edges: DataFrame, probes: DataFrame,
                                     codes: DataFrame, subs: Int, ef: Int,
                                     roundCap: Int): (DataFrame, Int) = {
    val w = Window.partitionBy("qid").orderBy(col("ad"), col("nid"))
    val ad = Similarity.adcDist(subs).as("ad")
    var frontier = probes
      .join(codes.select(col("vec_id").as("ent"), col("ords")), Seq("ent"))
      .select(col("qid"), col("dtm"), col("ent").as("nid"), ad)
      .distinct()
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= ef)
      .drop("_rn")
      .localCheckpoint()
    val pools = scala.collection.mutable.ArrayBuffer(
      frontier.select(col("qid"), col("nid"), col("ad")))
    var rounds = 0
    var converged = false
    while (!converged && rounds < roundCap) {
      val cand = edges.join(broadcast(frontier), edges("src") === frontier("nid"))
        .join(codes.select(col("vec_id").as("dst"), col("ords")), Seq("dst"))
        .select(col("qid"), col("dtm"), col("dst").as("nid"), ad)
        .localCheckpoint()
      pools += cand.select(col("qid"), col("nid"), col("ad"))
      val next = frontier.union(cand).distinct()
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= ef)
        .drop("_rn")
        .localCheckpoint()
      converged = next.select(col("qid"), col("nid"))
        .exceptAll(frontier.select(col("qid"), col("nid"))).isEmpty
      frontier = next
      rounds += 1
    }
    require(converged,
      s"ADC beam frontier still improving after $roundCap rounds — " +
        "the fixed-unroll oracle would diverge; raise beamRounds")
    val pool = pools.reduce(_.union(_)).distinct()
      .filter(col("nid") =!= col("qid"))
      .localCheckpoint()
    (pool, rounds)
  }

  /** E23 — `ann_graph_beam_adc` (r11 verdict directive #3): E17's
    * ef-bounded beam walked with E5's 8-lookup APPROXIMATE distances
    * and an exact integer re-rank of the final shortlist — the
    * standard way past E19's budget wall (cheaper distance per touched
    * node buys the better build's recall back inside the byte budget).
    * The walk reads the persisted 16 B/vector PQ codes (E9's artifact,
    * SHARED — one encode serves E5/E9/E12/E21 and this walk) over the
    * dedicated (20, 3) graph the E19 sweep measured at 0.733 recall
    * but rejected at 4.7× the LSH tier's RAW-BYTE scan; at 16 B/row
    * the same pool costs ~0.07× the LSH bytes, and the exact re-rank
    * (top-[[adcRerankN]] per probe by ADC, then exact integer L2 over
    * raw ticks) adds |probes|·[[adcRerankN]] raw reads. Round12bSpec pins
    * recall@3 ≥ 0.70 with total touched bytes ≤ 4× the LSH tier's —
    * the directive's done-bar — and strict dominance over E17/E19.
    *
    * Scale shape: per round the bounded frontier broadcasts against
    * the edge artifact and the CODE table (16 B/vector — the 100 TB
    * point: the walk never touches raw vectors until the final
    * |probes|·[[adcRerankN]] re-rank); the codebook/table state is
    * probe-local; the only shuffles are the bounded frontier re-sorts.
    */
  def annGraphBeamAdc(spark: SparkSession, dir: String, k: Int = 3,
                      ef: Int = adcBeamEf,
                      rerankN: Int = adcRerankN): DataFrame =
    graft.QueryCaches.memo(
      s"graphann.beamadc:$dir:$k:$ef:$rerankN:${spark.sparkContext.applicationId}") {
      beamAdcServe(spark, dir, adcEdgesArtifact(spark, dir), k, ef, rerankN,
        dir)
    }

  /** The ADC walk + exact re-rank over an ARBITRARY edge artifact —
    * E23's serve parameterized by the graph, shared by E23 (the (20,3)
    * build), E27's refined build, and the r13 build sweep, so a better
    * graph changes only where the edges came from, never the serve's
    * byte accounting.
    */
  private[graft] def beamAdcServe(spark: SparkSession, dir: String,
                                  edges: DataFrame, k: Int, ef: Int,
                                  rerankN: Int, statsKey: String): DataFrame = {
      val subs = 8
      val base = Similarity.pqIndexPath(spark, dir)
      val codes = spark.read.parquet(s"$base/codes")
      val dt = Similarity.pqDistTablesFor(spark, dir, subs,
        Similarity.readCodebook(spark, base))
      val probes = probeEntries(spark, dir)
        .select("qid", "ent").distinct()
        .join(dt.select(col("qid"), col("dtm")), Seq("qid"))
      val (pool, rounds) = beamPoolAdcFrom(edges,
        probes, codes, subs, ef, beamRounds)
      val wa = Window.partitionBy("qid").orderBy(col("ad"), col("nid"))
      val short = pool.withColumn("_rn", row_number().over(wa))
        .filter(col("_rn") <= rerankN).select("qid", "nid")
      val tk = ticks(spark, dir).persist()
      val we = Window.partitionBy("qid").orderBy(col("d2"), col("nid"))
      val res = short
        .join(tk.select(col("vec_id").as("qid"), col("tv").as("qv")), Seq("qid"))
        .join(tk.select(col("vec_id").as("nid"), col("tv").as("nv")), Seq("nid"))
        .select(col("qid"), col("nid"), intSqDist(col("qv"), col("nv")).as("d2"))
        .withColumn("rank", row_number().over(we))
        .filter(col("rank") <= k)
        .select(col("qid").as("query_id"), col("rank"),
          col("nid").as("neighbor_id"), col("d2").as("adc_rerank_dist"))
        .orderBy("query_id", "rank")
        .persist()
      val pooled = pool.count()
      adcBeamStats.put(statsKey,
        (rounds, pooled, pooled * 16L, short.count() * 256L))
      res
    }

  // ---------------- E22: graph tombstone delete ----------------

  /** Per-dir delete telemetry: (edges lost to the takedown, bridge
    * candidates considered, repaired out-edges written).
    */
  private[graft] val deleteStats =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Long)]()

  /** The repaired surviving graph for an ARBITRARY delete predicate —
    * split from the serve so Round12Spec can drive constructed delete
    * sets through the same machinery and re-insert on top of it.
    * Repair is the published bridge rule (FreshDiskANN's delete
    * consolidation): a surviving node u that lost an out-neighbor v
    * considers u → w for every surviving out-neighbor w of v (the
    * bridge THROUGH the hole), then re-prunes kept ∪ bridges to the
    * top-`degree` by exact (d2, dst). Nodes that lost nothing re-prune
    * their own ≤ degree kept edges — an identity, so repair touches
    * exactly the damage.
    */
  private[graft] def repairedEdges(edges: DataFrame, embs: DataFrame,
                                   isDel: Column): (DataFrame, (Long, Long, Long)) =
    repairedEdgesFrom(edges, embs, embs.filter(isDel).select(col("vec_id")))

  /** [[repairedEdges]] with the delete set as an explicit FRAME — the
    * sidecar-driven form E25's vacuum serve and post-vacuum re-deletes
    * use (a takedown arrives as keys, not as a predicate).
    */
  private[graft] def repairedEdgesFrom(edges: DataFrame, embs: DataFrame,
                                       delKeys: DataFrame): (DataFrame, (Long, Long, Long)) = {
    val del = delKeys.select(col("vec_id"))
    val delS = del.select(col("vec_id").as("src"))
    val delD = del.select(col("vec_id").as("dst"))
    // the tombstone set is takedown-sized — broadcast every anti-join
    // the trailing select is LOAD-BEARING: a Seq("dst") join moves the
    // key column first, and the positional union below would silently
    // flip every kept edge (caught by the sf0.001 oracle diff)
    val kept = edges.select("src", "dst")
      .join(broadcast(delS), Seq("src"), "left_anti")
      .join(broadcast(delD), Seq("dst"), "left_anti")
      .select("src", "dst")
    val uToDel = edges.select("src", "dst")
      .join(broadcast(delS), Seq("src"), "left_anti")
      .join(broadcast(delD), Seq("dst"), "left_semi")
      .select(col("src").as("u"), col("dst").as("v"))
    val delOut = edges.select("src", "dst")
      .join(broadcast(delS), Seq("src"), "left_semi")
      .join(broadcast(delD), Seq("dst"), "left_anti")
      .select(col("src").as("v"), col("dst").as("w"))
    // |bridges| ≤ |lost edges| · degree: v's out-list is ≤ degree and
    // the deleted side of the join is broadcast — no pair blow-up
    val bridges = uToDel.join(broadcast(delOut), Seq("v"))
      .filter(col("u") =!= col("w"))
      .select(col("u").as("src"), col("w").as("dst")).distinct()
    val surv = embs.join(broadcast(del), Seq("vec_id"), "left_anti")
    val repaired = topDeg(kept.union(bridges).distinct(), ticksOf(surv))
      .localCheckpoint()
    val stats = (uToDel.count(), bridges.count(), repaired.count())
    (repaired, stats)
  }

  /** E22 — `ann_graph_delete` (r11 verdict directive #2): takedown of
    * vectors from the PERSISTED graph artifact — the delete analog of
    * the reference's after-the-fact UPDATE lifecycle
    * (function.py:462-539), completing the index lifecycle story
    * (E18 append, E13 retrain, THIS delete). The tombstoned vectors
    * (vec_id % 10 = 3, disjoint from the % 100 = 0 probe panel) lose
    * every in- and out-edge; surviving nodes that lost a neighbor are
    * repaired by bridging through the hole (u → deleted v → w becomes
    * a u → w candidate) and re-pruning to the exact top-`degree` —
    * without the bridge, a node whose whole neighborhood was taken
    * down goes dark and every walk through it dead-ends. The serve is
    * E15's greedy walk verbatim over the repaired graph with entry
    * medoids recomputed from the SURVIVING corpus (a deleted medoid
    * must not route walks). A deleted vector can therefore never
    * appear in any serve — the edges, entries, and pool are all
    * surviving-only by construction (Round12Spec also proves the
    * re-add round-trip: E18's insert machinery re-attaches the
    * deleted set over the repaired graph and they serve again).
    *
    * Scale shape: the delete reads the takedown-sized tombstone set
    * broadcast against the edge artifact (one scan); bridge repair is
    * O(|lost edges| · degree) candidates — damage-proportional, never
    * corpus-proportional; the re-prune touches only affected nodes'
    * rows plus an identity pass over kept edges. The oracle replays
    * build, delete, bridge, re-prune, surviving entries, and the walk.
    */
  def annGraphDelete(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    graft.QueryCaches.memo(
      s"graphann.delete:$dir:$k:${spark.sparkContext.applicationId}") {
      val embs = Tables.embeddings(spark, dir)
      val isDel = col("vec_id") % 10 === 3
      val (repaired, stats) =
        repairedEdges(edgesArtifact(spark, dir), embs, isDel)
      deleteStats.put(dir, stats)
      greedyDeleteServe(spark, dir, repaired, embs.filter(!isDel), k)
    }

  /** E22's serve tail — greedy walk over a repaired graph with entries
    * from the surviving corpus — shared verbatim by the in-session
    * delete (E22) and the vacuumed-artifact serve (E25), so the two
    * can only ever differ in WHERE the edges came from.
    */
  private def greedyDeleteServe(spark: SparkSession, dir: String,
                                repaired: DataFrame, surv: DataFrame,
                                k: Int): DataFrame = {
    val probes = surv.filter(col("vec_id") % 100 === 0)
    val (pool, _) = greedyPoolFrom(repaired,
      entriesFrom(surv, probes), ticksOf(surv), maxSteps)
    val w = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
    pool.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("neighbor_id"), col("d").as("delete_dist"))
      .orderBy("query_id", "rank")
      .persist()
  }

  /** The generation-resolved serve over a VACUUMED graph-delete root
    * (E25): edges read back from the persisted generation, the corpus
    * masked by the root's cumulative `deleted` ledger, and any
    * POST-vacuum tombstones repaired merge-on-read — the same
    * [[repairedEdgesFrom]] rule that produced the artifact, so a
    * re-delete after a vacuum behaves exactly like the original
    * delete did at generation 0. An empty sidecar short-circuits to
    * the persisted edges verbatim (re-pruning a top-degree graph is
    * the identity).
    */
  private[graft] def graphDeleteServeFrom(spark: SparkSession, dir: String,
                                          root: String, k: Int = 3): DataFrame = {
    val gen = ArtifactGen.current(root)
    // a digest of the sidecar's (name, size, mtime) listing rides in
    // the memo key so ANY tombstone write — an appended part-file, an
    // overwritten/redelivered batch partition (TombstoneAdmit's own
    // idempotence pattern), a compacted sidecar — busts the cache. A
    // raw file COUNT (r13 advisor) misses same-count content swaps.
    val tombDigest = ArtifactGen.dirDigest(
      new java.io.File(ArtifactGen.dir(root, gen), "tombstones"))
    graft.QueryCaches.memo(
      s"graphann.delserve:$root:$k:$gen:$tombDigest:${spark.sparkContext.applicationId}") {
      val gd = ArtifactGen.dir(root, gen)
      val edges = spark.read.parquet(s"$gd/edges")
      val tomb = spark.read.parquet(s"$gd/tombstones")
      val embs = Tables.embeddings(spark, dir)
      val deleted =
        if (new java.io.File(gd, "deleted").exists)
          spark.read.parquet(s"$gd/deleted")
        else tomb.limit(0)
      val members = embs.join(broadcast(deleted), Seq("vec_id"), "left_anti")
      val repaired =
        if (tomb.isEmpty) edges
        else repairedEdgesFrom(edges, members, tomb)._1
      val surv = members.join(broadcast(tomb), Seq("vec_id"), "left_anti")
      greedyDeleteServe(spark, dir, repaired, surv, k)
    }
  }

  // ---------------- G18: streaming vector admit (engine side) ----------------

  /** G18's standing base artifact: E18's base build (the %10≠7 subset),
    * built once per JVM per dir and persisted — every micro-batch's
    * insert beams against THESE files, and they are never rewritten.
    */
  private[graft] def streamBaseEdges(spark: SparkSession, dir: String): DataFrame =
    graft.QueryCaches.memo(
      s"graphann.gbase:$dir:${spark.sparkContext.applicationId}") {
      val base = Tables.embeddings(spark, dir).filter(col("vec_id") % 10 =!= 7)
      val edges = buildEdgesFrom(base, s"graphann.sbuckets:$dir")
      val path = graft.Scratch.dir("graphann_streambase")
      edges.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

  /** One micro-batch's insert work: beam THIS batch's arrivals
    * (vec_id % 10 = 7, E18's delta predicate) against the standing base
    * artifact and return their insert edges. Rides [[insertEdges]]'s
    * per-vector determinism — any batching of the arrivals lands the
    * identical rows, which is what makes stream ≡ batch provable
    * row-for-row.
    */
  private[graft] def streamInsertBatch(batch: DataFrame, dir: String): DataFrame = {
    val s = batch.sparkSession
    val arrivals = batch.filter(col("vec_id") % 10 === 7)
    val base = Tables.embeddings(s, dir).filter(col("vec_id") % 10 =!= 7)
    insertEdges(streamBaseEdges(s, dir), entriesFrom(base, arrivals),
      ticks(s, dir).localCheckpoint())
  }

  /** Per-dir gate telemetry for the streaming path (consulted at each
    * drain's serve): (hits, truth, stale).
    */
  private[graft] val streamGateStats =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Boolean)]()

  /** The serve over the ACCUMULATED drained insert edges: reverse cap +
    * gate + branch — [[appendTail]] and E18's branch rule verbatim, so
    * the drained stream serves the exact frame the one-shot batch
    * append serves (and shares its oracle).
    */
  private[graft] def streamAppendServe(spark: SparkSession, dir: String,
                                       dEdges: DataFrame, k: Int = 3): DataFrame = {
    val embs = Tables.embeddings(spark, dir)
    val isDelta = col("vec_id") % 10 === 7
    val tkAll = ticksOf(embs).localCheckpoint()
    val ab = appendTail(streamBaseEdges(spark, dir), dEdges.localCheckpoint(),
      embs, isDelta, tkAll)
    streamGateStats.put(dir, (ab.hits, ab.truth, ab.stale))
    val pool =
      if (ab.stale)
        greedyPoolFrom(edgesArtifact(spark, dir),
          entriesFrom(embs, embs.filter(isDelta)),
          ticksOf(embs), maxSteps)._1
      else ab.gatePool
    val w = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
    pool.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("neighbor_id"), col("d").as("append_dist"))
      .orderBy("query_id", "rank")
      .persist()
  }

  // ---------------- E19: HNSW-style upper layer ----------------

  /** Upper-layer membership: a deterministic 1/16 id-hash sample — the
    * level assignment HNSW draws geometrically, realized replayably.
    */
  private[graft] val layerSampleMod = 16

  /** Entries the upper-layer serve hands the base beam, per probe —
    * measured at sf0.1 against the same exact truth as E15/E17 (see
    * annGraphLayer's scaladoc for the sweep).
    */
  private[graft] val layerEntryCount = 4

  /** Per-dir layer-serve telemetry: (upper rounds, base rounds, pooled
    * rows upper, pooled rows base).
    */
  private[graft] val layerStats =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int, Long, Long)]()

  /** E19 — `ann_graph_layer` (round-11 directive #4): the recall
    * frontier pushed past E17's measured 0.433 ceiling, with every step
    * of the design MEASURED at sf0.1 against the exact integer truth
    * (60 slots) rather than assumed:
    *
    *  - The directive's hypothesis — entries are the binding constraint
    *    — was REFUTED on the flat deg-12 graph: an HNSW-style upper
    *    layer (NN-descent over the deterministic 1/16 id-hash sample,
    *    probe beams over it, top picks seeding the base beam) measured
    *    0.383 with picks alone (WORSE than flat — four sample
    *    near-neighbors share one basin and the frontier loses the
    *    medoid entries' exploration) and 0.450 with picks ∪ medoids —
    *    one truth slot above flat, at +2,300 touched.
    *  - The BINDING constraint is BUILD QUALITY: on the same flat serve,
    *    (degree, descent rounds) swept (12,2)→0.433, (16,2)→0.500,
    *    (16,3)→0.650, (20,3)→0.733 — each descent round and degree slot
    *    compounds through every beam expansion. (20,3) breaks the scan
    *    budget, so E19's serve graph pins (16,3) — a DEDICATED artifact;
    *    E15/E17/E18 keep the deg-12 graph and their hashes.
    *  - The upper layer is KEPT, tuned cheap (ef=[[layerUpperEf]],
    *    top-[[layerEntryCount]] picks ∪ medoid entries): at this corpus
    *    scale it is recall-neutral (the ~313-node sample can't beat
    *    medoids), but it is the principled entry mechanism when medoids
    *    degrade at 10⁹ vectors, and its measured cost is bounded
    *    (~1.5k touched rows of the budget).
    *
    * PINNED (Round11cSpec): recall@3 = 0.650 at 9,725 touched = 3.97×
    * the LSH tier's 2,450-row bucket scan — strictly dominating E17's
    * flat beam (0.433 @ 6,594) and meeting the directive's ≥0.6 target
    * inside its ≤4× budget.
    *
    * Scale shape: the upper graph is |corpus|/16 nodes built by the
    * same capped NN-descent equi-joins; the upper serve's frontier is
    * |probes|·ef rows broadcast per round against the small edge
    * artifact; the base serve is E17's plan verbatim over the
    * higher-degree artifact. Nothing new shuffles at corpus scale, and
    * the layer recursion generalizes (a 1/256 layer above the 1/16 one
    * is the same code over the sample).
    *
    * ORACLE: the E18 subset-build machinery reused — the sample build
    * chain (prefixed `u`, deg 16 × 3 rounds), the dedicated base chain
    * (prefixed `L`), sample medoid entries, a fixed idempotent upper
    * beam unroll at ef=3, the entry pick, then the base unroll from
    * picks ∪ medoid entries; the engine fails loudly if either beam
    * would need more rounds than the oracle unrolls.
    */
  /** The layered pipeline, fully parameterized for the Round11cSpec
    * frontier sweep: dedicated (deg, rounds) serve graph, upper-layer
    * beam at `upperEf`, top-`nEntries` picks unioned with the medoid
    * entries, base beam at `baseEf`. Returns (top-k frame, (upper
    * rounds, base rounds, upper pool, base pool)).
    */
  private[graft] def layerPipeline(spark: SparkSession, dir: String, k: Int,
                                   upperEf: Int, baseEf: Int, nEntries: Int,
                                   deg: Int, rounds: Int)
  : (DataFrame, (Int, Int, Long, Long)) = {
      val embs = Tables.embeddings(spark, dir)
      val upper = embs.filter(col("vec_id") % layerSampleMod === 0)
      val tkAll = ticks(spark, dir).persist()
      val upperEdges = buildEdgesFrom(upper, s"graphann.lbuckets:$dir:$deg:$rounds",
          deg, rounds)
        .localCheckpoint()
      val baseEdges = graft.QueryCaches.memo(
        s"graphann.ledges:$dir:$deg:$rounds:${spark.sparkContext.applicationId}") {
        val e = buildEdgesFrom(embs, s"graphann.lbbuckets:$dir:$deg:$rounds",
          deg, rounds)
        val path = graft.Scratch.dir("graphann_layer_edges")
        e.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      }
      val probes = embs.filter(col("vec_id") % 100 === 0)
      val uEntries = entriesFrom(upper, probes)
      val (uPool, uRounds) = beamPoolFrom(upperEdges, uEntries, tkAll,
        upperEf, beamRounds)
      val wq = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
      val entPick = uPool.withColumn("_rn", row_number().over(wq))
        .filter(col("_rn") <= nEntries)
        .select(col("qid"), col("nid").as("ent"))
      // entries = base medoid entries ∪ upper picks: the picks alone
      // MEASURED WORSE than the flat beam (0.383 vs 0.433 at sf0.1) —
      // eight sample near-neighbors all sit in one basin, so the
      // frontier loses the exploration the spread-out medoid entries
      // provide; the union keeps both (proximity + diversity)
      val baseEntries = probeEntries(spark, dir).select("qid", "ent")
        .union(entPick).distinct()
      val baseProbes = uEntries.select("qid", "qv").distinct()
        .join(baseEntries, Seq("qid"))
      val (pool, bRounds) = beamPoolFrom(baseEdges, baseProbes,
        tkAll, baseEf, beamRounds)
      val res = pool.withColumn("rank", row_number().over(wq))
        .filter(col("rank") <= k)
        .select(col("qid").as("query_id"), col("rank"),
          col("nid").as("neighbor_id"), col("d").as("layer_dist"))
        .orderBy("query_id", "rank")
        .persist()
      (res, (uRounds, bRounds, uPool.count(), pool.count()))
  }

  /** The pinned serve-graph constants for E19 — see annGraphLayer. */
  private[graft] val layerDegree = 16
  private[graft] val layerBuildRounds = 3
  private[graft] val layerUpperEf = 3

  def annGraphLayer(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    graft.QueryCaches.memo(
      s"graphann.layer:$dir:$k:${spark.sparkContext.applicationId}") {
      val (res, stats) = layerPipeline(spark, dir, k, layerUpperEf, beamEf,
        layerEntryCount, layerDegree, layerBuildRounds)
      layerStats.put(dir, stats)
      res
    }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_graph_search" -> ((s, d) => annGraphSearch(s, d)),
    "ann_graph_beam" -> ((s, d) => annGraphBeam(s, d)),
    "ann_graph_append" -> ((s, d) => annGraphAppend(s, d)),
    "ann_graph_layer" -> ((s, d) => annGraphLayer(s, d)),
    "ann_graph_delete" -> ((s, d) => annGraphDelete(s, d)),
    "ann_graph_beam_adc" -> ((s, d) => annGraphBeamAdc(s, d)),
    "ann_graph_refine" -> ((s, d) => annGraphRefine(s, d)))

  /** The full ADC-walk oracle — trained-PQ encode + distance tables,
    * the deg/rounds build chain, the ef-bounded ADC beam unroll, and
    * the exact top-`rerankN` re-rank — parameterized by the BUILD so
    * E23 (the (20,3) graph) and E27 (the refined (40,3) graph) replay
    * through one generator and can never drift in walk semantics.
    * `p` prefixes the build chain and every walk CTE so two builds
    * could coexist in one statement.
    */
  private def adcWalkOracleSql(deg: Int, buildRounds: Int, ef: Int,
                               rerankN: Int, p: String): String = {
      val rounds = (1 to beamRounds)
        .map(i => beamRoundSql(i, s"${p}afr", s"${p}acnd",
          s"${p}e$buildRounds", "adcq", ef))
        .mkString(",\n")
      val poolArms = (1 to beamRounds)
        .map(i => s"SELECT qid, nid, d FROM ${p}acnd$i")
        .mkString("\n   UNION ALL ")
      s"""$corePrefixSql,
         |pqex AS (SELECT vec_id, CAST((dim - 1) // 8 AS INT) AS sub,
         |        (dim - 1) % 8 AS dimin, q FROM gex),
         |${Similarity.pqTrainCtes("", "pqex", "TRUE", 16)},
         |pqd AS (SELECT e.vec_id, e.sub, c.code, sum((e.q - c.cq) * (e.q - c.cq)) AS d2
         |        FROM pqex e JOIN cb c USING (sub, dimin) GROUP BY 1, 2, 3),
         |pqcodes AS (SELECT vec_id, sub, code FROM (
         |  SELECT vec_id, sub, code,
         |   row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn FROM pqd)
         | WHERE rn = 1),
         |pqdt AS (SELECT p.vec_id AS qid, p.sub, c.code,
         |        sum((p.q - c.cq) * (p.q - c.cq)) AS dt
         |       FROM pqex p JOIN cb c USING (sub, dimin)
         |       WHERE p.vec_id % 100 = 0 GROUP BY 1, 2, 3),
         |adcq AS MATERIALIZED (
         | SELECT t.qid, k.vec_id AS nid, sum(t.dt) AS d2
         | FROM pqcodes k JOIN pqdt t ON t.sub = k.sub AND t.code = k.code
         | GROUP BY 1, 2),
         |${buildChainSql("gb", p, deg, buildRounds)},
         |${p}afr0 AS MATERIALIZED (
         | SELECT qid, nid, d FROM (
         |   SELECT qid, nid, d,
         |     row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
         |   FROM (SELECT DISTINCT en.qid, en.ent AS nid, a.d2 AS d
         |         FROM entries en
         |         JOIN adcq a ON a.qid = en.qid AND a.nid = en.ent) t)
         | WHERE rn <= $ef),
         |$rounds,
         |${p}adcpool AS (
         | SELECT DISTINCT qid, nid, d FROM (
         |   SELECT qid, nid, d FROM ${p}afr0
         |   UNION ALL $poolArms) t
         | WHERE nid <> qid),
         |${p}ashort AS (
         | SELECT qid, nid FROM (
         |   SELECT qid, nid,
         |     row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
         |   FROM ${p}adcpool)
         | WHERE rn <= $rerankN),
         |${p}aexact AS (
         | SELECT s.qid, s.nid,
         |   list_sum(list_transform(list_zip(a.q, b.q),
         |     z -> (z[1] - z[2]) * (z[1] - z[2]))) AS xd
         | FROM ${p}ashort s
         | JOIN qv a ON a.vec_id = s.qid
         | JOIN qv b ON b.vec_id = s.nid)
         |SELECT qid AS query_id, rank, nid AS neighbor_id,
         |  CAST(xd AS BIGINT) AS adc_rerank_dist
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY xd, nid) AS rank
         |      FROM ${p}aexact)
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** Integer pairwise distance over a named pair CTE: joins the
    * LIST-form tick vectors to both endpoints and computes the squared
    * distance as one scalar lambda per pair — exactly `IntSqDist`
    * relationally. This REPLACED the r11 explode-join form
    * (`gex a JOIN gex b ON dim` + GROUP BY), which materialized
    * |pairs| × dims intermediate rows into a |pairs|-group hash
    * aggregate: at the 10× rehearsal (20k vectors, ~25M candidate
    * pairs per descent round) that was ~1.6B rows of spill — the
    * r11 verdict's `weak` (DuckDB OOM / temp-disk-full). The lambda
    * form streams: one row per pair, no aggregate, bit-identical
    * values (list_sum over BIGINT products = the same HUGEINT sum;
    * equivalence measured 2500/2500 pairs, 0 diffs, at sf0.01).
    */
  private[ops] def distSql(pairsCte: String, out: String): String =
    s"""$out AS (
       | SELECT p.src, p.dst,
       |   list_sum(list_transform(list_zip(a.q, bq.q),
       |     z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d2
       | FROM $pairsCte p
       | JOIN qv a ON a.vec_id = p.src
       | JOIN qv bq ON bq.vec_id = p.dst)""".stripMargin

  // NOTE every dedup below is an explicit DISTINCT over UNION ALL, never
  // a bare top-level UNION: inside a WITH RECURSIVE block DuckDB parses a
  // CTE-body UNION as a recursive union even without a self-reference,
  // and its arms are NOT set-deduped against each other (measured: a
  // 2-arm UNION of one row returned 2 rows) — the duplicates then
  // multiply the grouped distance sums by odd factors
  private def descentRoundSql(candIn: String, i: Int,
                              pfx: String = "", deg: Int = degree): String =
    s"""${pfx}rev$i AS (
       | SELECT src, dst FROM (
       |   SELECT e.dst AS src, e.src AS dst, e.d2,
       |     row_number() OVER (PARTITION BY e.dst ORDER BY e.d2, e.src) AS rn
       |   FROM $candIn e) t
       | WHERE rn <= $deg),
       |${pfx}u$i AS MATERIALIZED (
       | SELECT DISTINCT src, dst FROM (
       |   SELECT src, dst FROM $candIn
       |   UNION ALL SELECT src, dst FROM ${pfx}rev$i) t),
       |${pfx}comp$i AS (
       | SELECT a.src AS src, b.dst AS dst
       | FROM ${pfx}u$i a JOIN ${pfx}u$i b ON a.dst = b.src WHERE a.src <> b.dst),
       |${pfx}c$i AS (
       | SELECT DISTINCT src, dst FROM (
       |   SELECT src, dst FROM $candIn
       |   UNION ALL SELECT src, dst FROM ${pfx}comp$i) t),
       |${distSql(s"${pfx}c$i", s"${pfx}dd$i")},
       |${pfx}e$i AS MATERIALIZED (
       | SELECT src, dst, d2 FROM (
       |   SELECT src, dst, d2,
       |     row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rn
       |   FROM ${pfx}dd$i)
       | WHERE rn <= $deg)""".stripMargin

  /** The NN-descent build chain (p0 .. e2) over a bucketed gb-shaped
    * CTE, name-prefixed so the full-corpus chain and the append
    * pipeline's BASE chain coexist in one oracle.
    */
  private[ops] def buildChainSql(gbName: String, pfx: String,
                            deg: Int = degree,
                            rounds: Int = descentRounds): String =
    s"""${pfx}p0 AS (
       | SELECT l.vec_id AS src, r.vec_id AS dst
       | FROM $gbName l JOIN $gbName r USING (bucket) WHERE l.vec_id <> r.vec_id),
       |${pfx}ring AS (
       | SELECT vec_id AS src,
       |   coalesce(lead(vec_id) OVER (ORDER BY vec_id),
       |            (SELECT min(vec_id) FROM $gbName)) AS dst
       | FROM $gbName),
       |${pfx}cinit AS (
       | SELECT DISTINCT src, dst FROM (
       |   SELECT src, dst FROM ${pfx}p0 UNION ALL SELECT src, dst FROM ${pfx}ring) t
       | WHERE src <> dst),
       |${distSql(s"${pfx}cinit", s"${pfx}dd0")},
       |${pfx}e0 AS MATERIALIZED (
       | SELECT src, dst, d2 FROM (
       |   SELECT src, dst, d2,
       |     row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rn
       |   FROM ${pfx}dd0)
       | WHERE rn <= $deg),
       |${(1 to rounds).map(i =>
           descentRoundSql(s"${pfx}e${i - 1}", i, pfx, deg)).mkString(",\n")}""".stripMargin

  /** The shared oracle prefix: build replay (gex .. e2), probe
    * distances (qd), medoid entries — everything through `entries`,
    * reused verbatim by the greedy and beam serve oracles.
    */
  /** Everything the serve oracles share EXCEPT a build chain: tick
    * explode, buckets, probe distances, and the full-corpus medoid
    * entries — so the layer oracle (which builds at its own degree)
    * doesn't pay a deg-12 build it never reads.
    */
  private lazy val corePrefixSql: String = {
    val planes = Dedup.hyperplanes(4, 64)
    s"""WITH RECURSIVE
         |gex AS MATERIALIZED (
         | SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         |        CAST(floor(unnest(embedding::DOUBLE[]) * 1000000.0 + 0.5) AS BIGINT) AS q
         | FROM embeddings),
         |qv AS MATERIALIZED (
         | SELECT vec_id, list_transform(embedding::DOUBLE[],
         |   x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS q
         | FROM embeddings),
         |gb AS (
         | SELECT vec_id, embedding::DOUBLE[] AS emb,
         |  ${Dedup.bucketSql(planes)} AS bucket
         | FROM embeddings),
         |qd AS MATERIALIZED (
         | SELECT pa.vec_id AS qid, pb.vec_id AS nid,
         |        list_sum(list_transform(list_zip(pa.q, pb.q),
         |          z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d2
         | FROM qv pa CROSS JOIN qv pb
         | WHERE pa.vec_id % 100 = 0),
         |cent AS (
         | SELECT dim, (2 * sum(q) + count(*)) // (2 * count(*)) AS cq
         | FROM gex GROUP BY 1),
         |ed AS (
         | SELECT e.vec_id, sum((e.q - c.cq) * (e.q - c.cq)) AS d2
         | FROM gex e JOIN cent c USING (dim) GROUP BY 1),
         |gmed AS (
         | SELECT vec_id FROM (
         |   SELECT vec_id, row_number() OVER (ORDER BY d2, vec_id) AS rn FROM ed)
         | WHERE rn = 1),
         |bmed AS (
         | SELECT bucket, vec_id AS medoid FROM (
         |   SELECT gb.bucket, ed.vec_id,
         |     row_number() OVER (PARTITION BY gb.bucket ORDER BY ed.d2, ed.vec_id) AS rn
         |   FROM ed JOIN gb ON gb.vec_id = ed.vec_id)
         | WHERE rn = 1),
         |pb AS (SELECT vec_id AS qid, bucket FROM gb WHERE vec_id % 100 = 0),
         |entries AS (
         | SELECT DISTINCT qid, ent FROM (
         |   SELECT pb.qid, coalesce(bm.medoid, g.vec_id) AS ent
         |   FROM pb
         |   CROSS JOIN (VALUES ${entryMasks.map(m => s"($m)").mkString(", ")}) mm(m)
         |   CROSS JOIN gmed g
         |   LEFT JOIN bmed bm ON bm.bucket = xor(pb.bucket, mm.m)
         |   UNION ALL
         |   SELECT pb.qid, g.vec_id FROM pb CROSS JOIN gmed g) t)""".stripMargin
  }

  /** The shared oracle prefix the E15/E17/E18 serves read: the core
    * plus the deg-12 × 2-round build chain (gex .. e2).
    */
  private lazy val oraclePrefixSql: String =
    s"""$corePrefixSql,
       |${buildChainSql("gb", "")}""".stripMargin

  /** One idempotent beam round: candidates = the previous frontier's
    * out-neighbors scored against the probe; next frontier = top-ef of
    * frontier ∪ candidates. At the fixpoint a round re-derives the
    * same frontier and its candidates dedupe into the pool — which is
    * what makes the FIXED `beamRounds` unroll exact (the engine fails
    * loudly if convergence would need more).
    */
  private def beamRoundSql(i: Int, frPfx: String = "fr",
                           cndPfx: String = "cnd", edges: String = "e2",
                           dist: String = "qd", ef: Int = beamEf): String =
    s"""$cndPfx$i AS (
       | SELECT f.qid, e.dst AS nid, q.d2 AS d
       | FROM $frPfx${i - 1} f JOIN $edges e ON e.src = f.nid
       | JOIN $dist q ON q.qid = f.qid AND q.nid = e.dst),
       |$frPfx$i AS MATERIALIZED (
       | SELECT qid, nid, d FROM (
       |   SELECT qid, nid, d,
       |     row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
       |   FROM (SELECT DISTINCT qid, nid, d FROM (
       |     SELECT qid, nid, d FROM $frPfx${i - 1}
       |     UNION ALL SELECT qid, nid, d FROM $cndPfx$i) t) t2)
       | WHERE rn <= $ef)""".stripMargin

  /** A greedy multi-entry walk + touched-pool CTE block over arbitrary
    * edge/distance/entry CTE names — the E15 serve shape, reused by the
    * append gate serve (over the appended adjacency) and the append
    * stale-branch serve (over the rebuilt full graph).
    */
  /** The greedy multi-entry walk + touched-pool CTE block: a FIXED
    * [[maxSteps]]-round UNROLL of the engine's per-chain loop (r12 —
    * the third and final form). History of this block, because each
    * rewrite was a measured 10×-rehearsal fix: (r11) a per-(probe,
    * node) `bestn` row_number window over the |edges| × |probes| join
    * SORTED ~1B rows at 10× — temp-disk-full; (r12a) the same bestn as
    * a packed-HUGEINT min aggregate stopped the sort but still
    * MATERIALIZED a |probes| × |nodes| relation — ~36M groups fed by
    * 500M join rows, 17+ GB of out-of-core aggregate spill measured on
    * the truncated probe. The unroll computes best-neighbors ONLY for
    * the frontier's ~|chains| current nodes per round (chains × degree
    * scored rows ≈ 400k at 10×, × 64 rounds — linear, spill-free):
    * per round, score the chains' out-neighbors (c$i), take each
    * chain's packed-HUGEINT argmin (b$i — min(d2·10¹⁰ + dst) is the
    * exact (d2, dst) tie-break; dst < 10¹⁰ by construction, d2 ≤
    * 2.56·10¹⁴ keeps the pack exact), and move the chain iff strictly
    * improving, else CARRY it unchanged — the carry makes the fixed
    * unroll idempotent at each chain's fixpoint, exactly
    * [[beamRoundSql]]'s argument, and [[maxSteps]] rounds match the
    * engine walk's loud step cap. Pool = every round's scored
    * candidates ∪ every round's chain positions, deduped.
    */
  private def walkPoolSql(pfx: String, edges: String, dist: String,
                          ents: String): String = {
    def round(i: Int): String =
      s"""${pfx}c$i AS MATERIALIZED (
         | SELECT w.qid, w.ent, e.dst, q.d2
         | FROM ${pfx}w${i - 1} w JOIN $edges e ON e.src = w.cur
         | JOIN $dist q ON q.qid = w.qid AND q.nid = e.dst),
         |${pfx}b$i AS (
         | SELECT qid, ent, min(d2 * 10000000000 + dst) AS m
         | FROM ${pfx}c$i GROUP BY 1, 2),
         |${pfx}w$i AS MATERIALIZED (
         | SELECT w.qid, w.ent,
         |   CASE WHEN b.m IS NOT NULL AND b.m // 10000000000 < w.d
         |        THEN CAST(b.m % 10000000000 AS BIGINT) ELSE w.cur END AS cur,
         |   CASE WHEN b.m IS NOT NULL AND b.m // 10000000000 < w.d
         |        THEN b.m // 10000000000 ELSE w.d END AS d
         | FROM ${pfx}w${i - 1} w
         | LEFT JOIN ${pfx}b$i b ON b.qid = w.qid AND b.ent = w.ent)""".stripMargin
    val rounds = (1 to maxSteps).map(round).mkString(",\n")
    val candArms = (1 to maxSteps)
      .map(i => s"SELECT qid, dst AS nid, d2 AS d FROM ${pfx}c$i")
      .mkString("\n   UNION ALL ")
    val curArms = (0 to maxSteps)
      .map(i => s"SELECT qid, cur AS nid, d FROM ${pfx}w$i")
      .mkString("\n   UNION ALL ")
    s"""${pfx}w0 AS MATERIALIZED (
       | SELECT en.qid, en.ent, en.ent AS cur, q.d2 AS d
       | FROM $ents en JOIN $dist q ON q.qid = en.qid AND q.nid = en.ent),
       |$rounds,
       |${pfx}pool AS (
       | SELECT DISTINCT qid, nid, d FROM (
       |   $candArms
       |   UNION ALL $curArms) t
       | WHERE nid <> qid)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // E18: base build (prefixed chain over the base subset), insert
    // beams, localized descent, reverse cap, gate arithmetic, and BOTH
    // serve branches UNION-selected on the gate boolean — the whole
    // maintenance decision replayed relationally
    "ann_graph_append" -> {
      val insRounds = (1 to beamRounds)
        .map(i => beamRoundSql(i, "ifr", "icnd", "be2", "dq")).mkString(",\n")
      val insPoolArms = (1 to beamRounds)
        .map(i => s"SELECT qid, nid, d FROM icnd$i")
        .mkString("\n   UNION ALL ")
      s"""$oraclePrefixSql,
         |gbb AS (SELECT * FROM gb WHERE vec_id % 10 <> 7),
         |${buildChainSql("gbb", "b")},
         |dq AS MATERIALIZED (
         | SELECT pa.vec_id AS qid, pb2.vec_id AS nid,
         |        list_sum(list_transform(list_zip(pa.q, pb2.q),
         |          z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d2
         | FROM qv pa CROSS JOIN qv pb2
         | WHERE pa.vec_id % 10 = 7),
         |gexb AS (SELECT * FROM gex WHERE vec_id % 10 <> 7),
         |bcent AS (
         | SELECT dim, (2 * sum(q) + count(*)) // (2 * count(*)) AS cq
         | FROM gexb GROUP BY 1),
         |bed AS (
         | SELECT e.vec_id, sum((e.q - c.cq) * (e.q - c.cq)) AS d2
         | FROM gexb e JOIN bcent c USING (dim) GROUP BY 1),
         |bgmed AS (
         | SELECT vec_id FROM (
         |   SELECT vec_id, row_number() OVER (ORDER BY d2, vec_id) AS rn FROM bed)
         | WHERE rn = 1),
         |bbmed AS (
         | SELECT bucket, vec_id AS medoid FROM (
         |   SELECT g.bucket, bed.vec_id,
         |     row_number() OVER (PARTITION BY g.bucket ORDER BY bed.d2, bed.vec_id) AS rn
         |   FROM bed JOIN gbb g ON g.vec_id = bed.vec_id)
         | WHERE rn = 1),
         |dpb AS (SELECT vec_id AS qid, bucket FROM gb WHERE vec_id % 10 = 7),
         |dent AS (
         | SELECT DISTINCT qid, ent FROM (
         |   SELECT dpb.qid, coalesce(bm.medoid, g.vec_id) AS ent
         |   FROM dpb
         |   CROSS JOIN (VALUES ${entryMasks.map(m => s"($m)").mkString(", ")}) mm(m)
         |   CROSS JOIN bgmed g
         |   LEFT JOIN bbmed bm ON bm.bucket = xor(dpb.bucket, mm.m)
         |   UNION ALL
         |   SELECT dpb.qid, g.vec_id FROM dpb CROSS JOIN bgmed g) t),
         |ifr0 AS MATERIALIZED (
         | SELECT qid, nid, d FROM (
         |   SELECT qid, nid, d,
         |     row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
         |   FROM (SELECT DISTINCT de.qid, de.ent AS nid, q.d2 AS d
         |         FROM dent de JOIN dq q ON q.qid = de.qid AND q.nid = de.ent) t)
         | WHERE rn <= $beamEf),
         |$insRounds,
         |ipool AS (
         | SELECT DISTINCT qid, nid, d FROM (
         |   SELECT qid, nid, d FROM ifr0
         |   UNION ALL $insPoolArms) t
         | WHERE nid <> qid),
         |ded0 AS (
         | SELECT qid AS src, nid AS dst FROM (
         |   SELECT qid, nid,
         |     row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
         |   FROM ipool)
         | WHERE rn <= $degree),
         |dcomp AS (
         | SELECT d.src, b.dst FROM ded0 d JOIN be2 b ON b.src = d.dst),
         |dcand AS (
         | SELECT DISTINCT src, dst FROM (
         |   SELECT src, dst FROM ded0
         |   UNION ALL SELECT src, dst FROM dcomp) t),
         |dedge AS MATERIALIZED (
         | SELECT src, dst, d2 FROM (
         |   SELECT c.src, c.dst, q.d2,
         |     row_number() OVER (PARTITION BY c.src ORDER BY q.d2, c.dst) AS rn
         |   FROM dcand c JOIN dq q ON q.qid = c.src AND q.nid = c.dst)
         | WHERE rn <= $degree),
         |redge AS (
         | SELECT src, dst, d2 FROM (
         |   SELECT e.dst AS src, e.src AS dst, e.d2,
         |     row_number() OVER (PARTITION BY e.dst ORDER BY e.d2, e.src) AS rn
         |   FROM dedge e) t
         | WHERE rn <= $degree),
         |appe AS MATERIALIZED (
         | SELECT src, dst, d2 FROM (
         |   SELECT src, dst, d2 FROM be2
         |   UNION ALL SELECT src, dst, d2 FROM dedge
         |   UNION ALL SELECT src, dst, d2 FROM redge) t),
         |${walkPoolSql("a", "appe", "dq", "dent")},
         |tr3 AS MATERIALIZED (
         | SELECT qid, nid FROM (
         |   SELECT qid, nid,
         |     row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn
         |   FROM dq WHERE nid <> qid)
         | WHERE rn <= 3),
         |srv3 AS (
         | SELECT qid, nid FROM (
         |   SELECT qid, nid,
         |     row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
         |   FROM apool)
         | WHERE rn <= 3),
         |gate AS MATERIALIZED (
         | SELECT (SELECT count(*) FROM srv3 JOIN tr3 USING (qid, nid)) * 100
         |        < $appendThresholdPct * (SELECT count(*) FROM tr3) AS stale),
         |fent AS (
         | SELECT DISTINCT qid, ent FROM (
         |   SELECT dpb.qid, coalesce(bm.medoid, g.vec_id) AS ent
         |   FROM dpb
         |   CROSS JOIN (VALUES ${entryMasks.map(m => s"($m)").mkString(", ")}) mm(m)
         |   CROSS JOIN gmed g
         |   LEFT JOIN bmed bm ON bm.bucket = xor(dpb.bucket, mm.m)
         |   UNION ALL
         |   SELECT dpb.qid, g.vec_id FROM dpb CROSS JOIN gmed g) t),
         |${walkPoolSql("f", "e2", "dq", "fent")},
         |fin AS (
         | SELECT qid, rank, nid, d FROM (
         |   SELECT qid, rank, nid, d FROM (
         |     SELECT qid, nid, d,
         |       row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |     FROM apool) t
         |   WHERE rank <= 3 AND NOT (SELECT stale FROM gate)
         |   UNION ALL
         |   SELECT qid, rank, nid, d FROM (
         |     SELECT qid, nid, d,
         |       row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |     FROM fpool) t
         |   WHERE rank <= 3 AND (SELECT stale FROM gate)) t3)
         |SELECT qid AS query_id, rank, nid AS neighbor_id,
         |  CAST(d AS BIGINT) AS append_dist
         |FROM fin ORDER BY query_id, rank""".stripMargin
    },
    // E19: sample build chain (u, deg 16 × 3), dedicated base chain
    // (lb, deg 16 × 3), sample medoid entries, upper beam unroll at
    // ef=3, top-4 entry pick ∪ full-corpus medoid entries, base beam
    // unroll at ef=16 — the whole layered serve replayed relationally
    "ann_graph_layer" -> {
      val uRoundsSql = (1 to beamRounds).map(i =>
        beamRoundSql(i, "ufr", "ucnd", s"ue$layerBuildRounds", "qd",
          layerUpperEf)).mkString(",\n")
      val uPoolArms = (1 to beamRounds)
        .map(i => s"SELECT qid, nid, d FROM ucnd$i")
        .mkString("\n   UNION ALL ")
      val bRoundsSql = (1 to beamRounds).map(i =>
        beamRoundSql(i, "lfr", "lcnd", s"lbe$layerBuildRounds", "qd"))
        .mkString(",\n")
      val bPoolArms = (1 to beamRounds)
        .map(i => s"SELECT qid, nid, d FROM lcnd$i")
        .mkString("\n   UNION ALL ")
      s"""$corePrefixSql,
         |gbu AS (SELECT * FROM gb WHERE vec_id % $layerSampleMod = 0),
         |${buildChainSql("gbu", "u", layerDegree, layerBuildRounds)},
         |${buildChainSql("gb", "lb", layerDegree, layerBuildRounds)},
         |gexu AS (SELECT * FROM gex WHERE vec_id % $layerSampleMod = 0),
         |ucent AS (
         | SELECT dim, (2 * sum(q) + count(*)) // (2 * count(*)) AS cq
         | FROM gexu GROUP BY 1),
         |ued AS (
         | SELECT e.vec_id, sum((e.q - c.cq) * (e.q - c.cq)) AS d2
         | FROM gexu e JOIN ucent c USING (dim) GROUP BY 1),
         |ugmed AS (
         | SELECT vec_id FROM (
         |   SELECT vec_id, row_number() OVER (ORDER BY d2, vec_id) AS rn FROM ued)
         | WHERE rn = 1),
         |ubmed AS (
         | SELECT bucket, vec_id AS medoid FROM (
         |   SELECT g.bucket, ued.vec_id,
         |     row_number() OVER (PARTITION BY g.bucket ORDER BY ued.d2, ued.vec_id) AS rn
         |   FROM ued JOIN gbu g ON g.vec_id = ued.vec_id)
         | WHERE rn = 1),
         |uent AS (
         | SELECT DISTINCT qid, ent FROM (
         |   SELECT pb.qid, coalesce(bm.medoid, g.vec_id) AS ent
         |   FROM pb
         |   CROSS JOIN (VALUES ${entryMasks.map(m => s"($m)").mkString(", ")}) mm(m)
         |   CROSS JOIN ugmed g
         |   LEFT JOIN ubmed bm ON bm.bucket = xor(pb.bucket, mm.m)
         |   UNION ALL
         |   SELECT pb.qid, g.vec_id FROM pb CROSS JOIN ugmed g) t),
         |ufr0 AS MATERIALIZED (
         | SELECT qid, nid, d FROM (
         |   SELECT qid, nid, d,
         |     row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
         |   FROM (SELECT DISTINCT en.qid, en.ent AS nid, q.d2 AS d
         |         FROM uent en
         |         JOIN qd q ON q.qid = en.qid AND q.nid = en.ent) t)
         | WHERE rn <= $layerUpperEf),
         |$uRoundsSql,
         |upool AS (
         | SELECT DISTINCT qid, nid, d FROM (
         |   SELECT qid, nid, d FROM ufr0
         |   UNION ALL $uPoolArms) t
         | WHERE nid <> qid),
         |upick AS (
         | SELECT qid, nid AS ent FROM (
         |   SELECT qid, nid,
         |     row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
         |   FROM upool)
         | WHERE rn <= $layerEntryCount),
         |lent AS (
         | SELECT DISTINCT qid, ent FROM (
         |   SELECT qid, ent FROM entries
         |   UNION ALL SELECT qid, ent FROM upick) t),
         |lfr0 AS MATERIALIZED (
         | SELECT qid, nid, d FROM (
         |   SELECT qid, nid, d,
         |     row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
         |   FROM (SELECT DISTINCT en.qid, en.ent AS nid, q.d2 AS d
         |         FROM lent en
         |         JOIN qd q ON q.qid = en.qid AND q.nid = en.ent) t)
         | WHERE rn <= $beamEf),
         |$bRoundsSql,
         |lpool AS (
         | SELECT DISTINCT qid, nid, d FROM (
         |   SELECT qid, nid, d FROM lfr0
         |   UNION ALL $bPoolArms) t
         | WHERE nid <> qid)
         |SELECT qid AS query_id, rank, nid AS neighbor_id,
         |  CAST(d AS BIGINT) AS layer_dist
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |      FROM lpool)
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    },
    "ann_graph_beam" -> {
      val roundsSql = (1 to beamRounds).map(i => beamRoundSql(i)).mkString(",\n")
      val poolArms = (1 to beamRounds)
        .map(i => s"SELECT qid, nid, d FROM cnd$i")
        .mkString("\n   UNION ALL ")
      s"""$oraclePrefixSql,
         |fr0 AS MATERIALIZED (
         | SELECT qid, nid, d FROM (
         |   SELECT qid, nid, d,
         |     row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
         |   FROM (SELECT DISTINCT en.qid, en.ent AS nid, q.d2 AS d
         |         FROM entries en
         |         JOIN qd q ON q.qid = en.qid AND q.nid = en.ent) t)
         | WHERE rn <= $beamEf),
         |$roundsSql,
         |bpool AS (
         | SELECT DISTINCT qid, nid, d FROM (
         |   SELECT qid, nid, d FROM fr0
         |   UNION ALL $poolArms) t
         | WHERE nid <> qid)
         |SELECT qid AS query_id, rank, nid AS neighbor_id,
         |  CAST(d AS BIGINT) AS beam_dist
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |      FROM bpool)
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    },
    // E23: the trained-PQ encode/table CTEs (E5's oracle machinery),
    // the probes × corpus ADC distance relation, the dedicated (20,3)
    // build chain, the ADC-scored beam unroll, and the exact-integer
    // re-rank of the per-probe top-[adcRerankN=200] shortlist — the driver
    // hash-proves the approximate walk AND the exact finish
    "ann_graph_beam_adc" ->
      adcWalkOracleSql(adcDegree, adcBuildRounds, adcBeamEf, adcRerankN, "z"),
    // E27: the SAME ADC walk + exact re-rank replay over the REFINED
    // (40, 3) build — only the build chain's degree changes
    "ann_graph_refine" ->
      adcWalkOracleSql(refineDegree, refineBuildRounds, adcBeamEf,
        adcRerankN, "y"),
    // E22: the full-corpus build chain (the standing artifact), the
    // tombstone cut, the bridge repair (u → deleted v → w), the exact
    // top-degree re-prune, entry medoids recomputed over the SURVIVING
    // corpus, and E15's greedy walk over the repaired graph — the
    // driver hash-proves the whole takedown, not just the served rows
    "ann_graph_delete" -> {
      s"""$oraclePrefixSql,
         |kept AS (
         | SELECT src, dst FROM e2 WHERE src % 10 <> 3 AND dst % 10 <> 3),
         |bru AS (
         | SELECT src AS u, dst AS v FROM e2 WHERE src % 10 <> 3 AND dst % 10 = 3),
         |brw AS (
         | SELECT src AS v, dst AS w FROM e2 WHERE src % 10 = 3 AND dst % 10 <> 3),
         |brid AS (
         | SELECT DISTINCT u AS src, w AS dst FROM bru JOIN brw USING (v)
         | WHERE u <> w),
         |rcand AS (
         | SELECT DISTINCT src, dst FROM (
         |   SELECT src, dst FROM kept
         |   UNION ALL SELECT src, dst FROM brid) t),
         |${distSql("rcand", "rdd")},
         |dedg AS MATERIALIZED (
         | SELECT src, dst, d2 FROM (
         |   SELECT src, dst, d2,
         |     row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rn
         |   FROM rdd)
         | WHERE rn <= $degree),
         |sgex AS (SELECT * FROM gex WHERE vec_id % 10 <> 3),
         |scent AS (
         | SELECT dim, (2 * sum(q) + count(*)) // (2 * count(*)) AS cq
         | FROM sgex GROUP BY 1),
         |sed AS (
         | SELECT e.vec_id, sum((e.q - c.cq) * (e.q - c.cq)) AS d2
         | FROM sgex e JOIN scent c USING (dim) GROUP BY 1),
         |sgmed AS (
         | SELECT vec_id FROM (
         |   SELECT vec_id, row_number() OVER (ORDER BY d2, vec_id) AS rn FROM sed)
         | WHERE rn = 1),
         |sbmed AS (
         | SELECT bucket, vec_id AS medoid FROM (
         |   SELECT g.bucket, sed.vec_id,
         |     row_number() OVER (PARTITION BY g.bucket ORDER BY sed.d2, sed.vec_id) AS rn
         |   FROM sed JOIN gb g ON g.vec_id = sed.vec_id WHERE g.vec_id % 10 <> 3)
         | WHERE rn = 1),
         |sent AS (
         | SELECT DISTINCT qid, ent FROM (
         |   SELECT pb.qid, coalesce(bm.medoid, g.vec_id) AS ent
         |   FROM pb
         |   CROSS JOIN (VALUES ${entryMasks.map(m => s"($m)").mkString(", ")}) mm(m)
         |   CROSS JOIN sgmed g
         |   LEFT JOIN sbmed bm ON bm.bucket = xor(pb.bucket, mm.m)
         |   UNION ALL
         |   SELECT pb.qid, g.vec_id FROM pb CROSS JOIN sgmed g) t),
         |${walkPoolSql("t", "dedg", "qd", "sent")}
         |SELECT qid AS query_id, rank, nid AS neighbor_id,
         |  CAST(d AS BIGINT) AS delete_dist
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |      FROM tpool)
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    },
    "ann_graph_search" -> {
      s"""$oraclePrefixSql,
         |${walkPoolSql("s", "e2", "qd", "entries")}
         |SELECT qid AS query_id, rank, nid AS neighbor_id,
         |  CAST(d AS BIGINT) AS graph_dist
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |      FROM spool)
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    })
}
