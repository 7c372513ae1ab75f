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

  private val degree = 12
  private val descentRounds = 2
  private val maxSteps = 64

  /** Per-dir serve telemetry for the recall/scan audit (Round9dSpec):
    * (global walk steps until every walk stalled, touched-pool rows).
    */
  private[graft] val serveStats =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()

  private def qticks(c: Column): Column =
    transform(c, x => floor(x * lit(1000000.0) + lit(0.5)).cast("long"))

  /** (vec_id, tv) — the integer-tick corpus. */
  private def ticks(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), qticks(asDouble(col("embedding"))).as("tv"))

  private def withDist(pairs: DataFrame, tk: DataFrame): DataFrame =
    pairs
      .join(tk.select(col("vec_id").as("src"), col("tv").as("sv")), Seq("src"))
      .join(tk.select(col("vec_id").as("dst"), col("tv").as("dv")), Seq("dst"))
      .select(col("src"), col("dst"), intSqDist(col("sv"), col("dv")).as("d2"))

  private def topDeg(pairs: DataFrame, tk: DataFrame): DataFrame = {
    val w = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
    withDist(pairs, tk)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= degree)
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
  private def descentRound(edges: DataFrame, tk: DataFrame): DataFrame = {
    val dir0 = edges.select("src", "dst")
    val revW = Window.partitionBy("src").orderBy(col("d2"), col("dst"))
    val rev = edges
      .select(col("dst").as("src"), col("src").as("dst"), col("d2"))
      .withColumn("_rn", row_number().over(revW))
      .filter(col("_rn") <= degree)
      .select("src", "dst")
    val u = dir0.union(rev).distinct()
    val composed = u.as("a").join(u.as("b"), col("a.dst") === col("b.src"))
      .filter(col("a.src") =!= col("b.dst"))
      .select(col("a.src").as("src"), col("b.dst").as("dst"))
    topDeg(dir0.union(composed).distinct(), tk)
  }

  /** The persisted edge artifact (src, dst, d2) — built once per sf
    * dir, written to parquet (E9's ship-the-artifact discipline), and
    * read back for every serve. Out-degree ≥ 1 for every node (the
    * ring seeds one out-edge each and descent only ever REPLACES
    * candidates, never empties them).
    */
  private[graft] def edgesArtifact(spark: SparkSession, dir: String): DataFrame =
    graft.QueryCaches.memo(s"graphann.edges:$dir") {
      val edges = buildEdges(spark, dir)
      val path = graft.Scratch.dir("graphann_edges")
      edges.write.mode("overwrite").parquet(path)
      // drop the build-scoped tick cache (unpersist matches by analyzed
      // plan, so a plan-equal handle releases the entry persisted inside
      // buildEdges)
      ticks(spark, dir).unpersist()
      spark.read.parquet(path)
    }

  /** The edge-build plan, pre-persist — split out so Round10Spec can
    * audit it (no fact-scale single-partition window anywhere in the
    * build).
    */
  private[graft] def buildEdges(spark: SparkSession, dir: String): DataFrame = {
      val tk = ticks(spark, dir).persist()
      val planes = Dedup.hyperplanes(4, 64)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        val planeCol = array(p.map(lit(_)): _*)
        when(dot(col("emb"), planeCol) > 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      // same-bucket init pairs under the lossless triangle guard (E7's
      // discipline — 16 sign buckets are STRUCTURALLY hot at scale)
      val bucketed = HotBucket.triangleReplicate(e.withColumn("bucket", bucket),
        Seq("bucket"), col("vec_id"), s"graphann.buckets:$dir")
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
      var edges = topDeg(pairs0.union(ring).distinct(), tk)
      (1 to descentRounds).foreach { _ => edges = descentRound(edges, tk) }
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
    graft.QueryCaches.memo(s"graphann.entries:$dir") {
      val tk = ticks(spark, dir)
      val planes = Dedup.hyperplanes(4, 64)
      val bucket = planes.zipWithIndex.map { case (p, i) =>
        val planeCol = array(p.map(lit(_)): _*)
        when(dot(col("emb"), planeCol) > 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
      val withB = Tables.embeddings(spark, dir)
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
      withB.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("tv").as("qv"),
          explode(array_distinct(array(entries: _*))).as("ent"))
        .localCheckpoint()
    }

  def annGraphSearch(spark: SparkSession, dir: String, k: Int = 3,
                     stepCap: Int = maxSteps): DataFrame =
    graft.QueryCaches.memo(s"graphann.search:$dir:$k:$stepCap") {
      val tk = ticks(spark, dir).persist()
      val edges = edgesArtifact(spark, dir)
      val probes = probeEntries(spark, dir)
      // localCheckpoint (not persist) on every loop frame is
      // CORRECTNESS-critical, not an optimization: with plain persist
      // the next step's `edges.join(frontier, ...)` is a self-join
      // (frontier's lineage CONTAINS the edge scan), whose ambiguous
      // column resolution silently mis-joined at sf0.1 — and the
      // uncheckpointed lineage doubles per step (measured: 188 s → 52 s
      // for the whole serve, and a driver OOM in the debug twin)
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
        s"annGraphSearch: $active walk(s) still strictly improving after " +
          s"$stepCap steps — the bounded engine walk would diverge from " +
          "the oracle's unbounded greedy fixpoint; raise the step cap")
      val pool = pools.reduce(_.union(_)).distinct()
        .filter(col("nid") =!= col("qid"))
        .localCheckpoint()
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
    graft.QueryCaches.memo(s"graphann.beam:$dir:$k:$ef:$roundCap") {
      val tk = ticks(spark, dir).persist()
      val edges = edgesArtifact(spark, dir)
      val w = Window.partitionBy("qid").orderBy(col("d"), col("nid"))
      var frontier = probeEntries(spark, dir)
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
        s"annGraphBeam: frontier still improving after $roundCap rounds — " +
          "the fixed-unroll oracle would diverge; raise beamRounds")
      val pool = pools.reduce(_.union(_)).distinct()
        .filter(col("nid") =!= col("qid"))
        .localCheckpoint()
      beamStats.put(dir, (rounds, pool.count()))
      pool.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid").as("query_id"), col("rank"),
          col("nid").as("neighbor_id"), col("d").as("beam_dist"))
        .orderBy("query_id", "rank")
        .persist()
    }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_graph_search" -> ((s, d) => annGraphSearch(s, d)),
    "ann_graph_beam" -> ((s, d) => annGraphBeam(s, d)))

  /** Integer pairwise distance over a named pair CTE: joins the tick
    * explode to both endpoints — exactly `IntSqDist` relationally.
    */
  private def distSql(pairsCte: String, out: String): String =
    s"""$out AS (
       | SELECT p.src, p.dst, sum((a.q - bq.q) * (a.q - bq.q)) AS d2
       | FROM $pairsCte p
       | JOIN gex a ON a.vec_id = p.src
       | JOIN gex bq ON bq.vec_id = p.dst AND bq.dim = a.dim
       | GROUP BY 1, 2)""".stripMargin

  // NOTE every dedup below is an explicit DISTINCT over UNION ALL, never
  // a bare top-level UNION: inside a WITH RECURSIVE block DuckDB parses a
  // CTE-body UNION as a recursive union even without a self-reference,
  // and its arms are NOT set-deduped against each other (measured: a
  // 2-arm UNION of one row returned 2 rows) — the duplicates then
  // multiply the grouped distance sums by odd factors
  private def descentRoundSql(candIn: String, i: Int): String =
    s"""rev$i AS (
       | SELECT src, dst FROM (
       |   SELECT e.dst AS src, e.src AS dst, e.d2,
       |     row_number() OVER (PARTITION BY e.dst ORDER BY e.d2, e.src) AS rn
       |   FROM $candIn e) t
       | WHERE rn <= $degree),
       |u$i AS MATERIALIZED (
       | SELECT DISTINCT src, dst FROM (
       |   SELECT src, dst FROM $candIn
       |   UNION ALL SELECT src, dst FROM rev$i) t),
       |comp$i AS (
       | SELECT a.src AS src, b.dst AS dst
       | FROM u$i a JOIN u$i b ON a.dst = b.src WHERE a.src <> b.dst),
       |c$i AS (
       | SELECT DISTINCT src, dst FROM (
       |   SELECT src, dst FROM $candIn
       |   UNION ALL SELECT src, dst FROM comp$i) t),
       |${distSql(s"c$i", s"dd$i")},
       |e$i AS MATERIALIZED (
       | SELECT src, dst, d2 FROM (
       |   SELECT src, dst, d2,
       |     row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rn
       |   FROM dd$i)
       | WHERE rn <= $degree)""".stripMargin

  /** The shared oracle prefix: build replay (gex .. e2), probe
    * distances (qd), medoid entries — everything through `entries`,
    * reused verbatim by the greedy and beam serve oracles.
    */
  private lazy val oraclePrefixSql: String = {
    val planes = Dedup.hyperplanes(4, 64)
    s"""WITH RECURSIVE
         |gex AS MATERIALIZED (
         | SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         |        CAST(floor(unnest(embedding::DOUBLE[]) * 1000000.0 + 0.5) AS BIGINT) AS q
         | FROM embeddings),
         |gb AS (
         | SELECT vec_id, embedding::DOUBLE[] AS emb,
         |  ${Dedup.bucketSql(planes)} AS bucket
         | FROM embeddings),
         |p0 AS (
         | SELECT l.vec_id AS src, r.vec_id AS dst
         | FROM gb l JOIN gb r USING (bucket) WHERE l.vec_id <> r.vec_id),
         |ring AS (
         | SELECT vec_id AS src,
         |   coalesce(lead(vec_id) OVER (ORDER BY vec_id),
         |            (SELECT min(vec_id) FROM gb)) AS dst
         | FROM gb),
         |cinit AS (
         | SELECT DISTINCT src, dst FROM (
         |   SELECT src, dst FROM p0 UNION ALL SELECT src, dst FROM ring) t
         | WHERE src <> dst),
         |${distSql("cinit", "dd0")},
         |e0 AS MATERIALIZED (
         | SELECT src, dst, d2 FROM (
         |   SELECT src, dst, d2,
         |     row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rn
         |   FROM dd0)
         | WHERE rn <= $degree),
         |${descentRoundSql("e0", 1)},
         |${descentRoundSql("e1", 2)},
         |qd AS MATERIALIZED (
         | SELECT pa.vec_id AS qid, pb.vec_id AS nid,
         |        sum((pa.q - pb.q) * (pa.q - pb.q)) AS d2
         | FROM gex pa JOIN gex pb ON pb.dim = pa.dim
         | WHERE pa.vec_id % 100 = 0 GROUP BY 1, 2),
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

  /** One idempotent beam round: candidates = the previous frontier's
    * out-neighbors scored against the probe; next frontier = top-ef of
    * frontier ∪ candidates. At the fixpoint a round re-derives the
    * same frontier and its candidates dedupe into the pool — which is
    * what makes the FIXED `beamRounds` unroll exact (the engine fails
    * loudly if convergence would need more).
    */
  private def beamRoundSql(i: Int): String =
    s"""cnd$i AS (
       | SELECT f.qid, e.dst AS nid, q.d2 AS d
       | FROM fr${i - 1} f JOIN e2 e ON e.src = f.nid
       | JOIN qd q ON q.qid = f.qid AND q.nid = e.dst),
       |fr$i AS MATERIALIZED (
       | SELECT qid, nid, d FROM (
       |   SELECT qid, nid, d,
       |     row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
       |   FROM (SELECT DISTINCT qid, nid, d FROM (
       |     SELECT qid, nid, d FROM fr${i - 1}
       |     UNION ALL SELECT qid, nid, d FROM cnd$i) t) t2)
       | WHERE rn <= $beamEf)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ann_graph_beam" -> {
      val roundsSql = (1 to beamRounds).map(beamRoundSql).mkString(",\n")
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
    "ann_graph_search" -> {
      s"""$oraclePrefixSql,
         |bestn AS (
         | SELECT qid, node, bn, bnd FROM (
         |   SELECT q.qid, e.src AS node, e.dst AS bn, q.d2 AS bnd,
         |     row_number() OVER (PARTITION BY q.qid, e.src ORDER BY q.d2, e.dst) AS rn
         |   FROM e2 e JOIN qd q ON q.nid = e.dst)
         | WHERE rn = 1),
         |walk(qid, ent, cur, d) AS (
         | SELECT en.qid, en.ent, en.ent, q.d2
         | FROM entries en JOIN qd q ON q.qid = en.qid AND q.nid = en.ent
         | UNION ALL
         | SELECT w.qid, w.ent, b.bn, b.bnd
         | FROM walk w JOIN bestn b ON b.qid = w.qid AND b.node = w.cur
         | WHERE b.bnd < w.d),
         |pool AS (
         | SELECT DISTINCT qid, nid, d FROM (
         |   SELECT w.qid, e.dst AS nid, q.d2 AS d
         |   FROM walk w JOIN e2 e ON e.src = w.cur
         |   JOIN qd q ON q.qid = w.qid AND q.nid = e.dst
         |   UNION ALL
         |   SELECT qid, cur AS nid, d FROM walk) t
         | WHERE nid <> qid)
         |SELECT qid AS query_id, rank, nid AS neighbor_id,
         |  CAST(d AS BIGINT) AS graph_dist
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |      FROM pool)
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    })
}
