package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-bucket guard for LSH-family candidate joins — the D/E/H bucket
  * self-joins (MinHash bands, SimHash blocks, hyperplane sign buckets,
  * SemDeDup cells, shared-chunk hashes) and their probe-join twins
  * (D13/G15's delta-vs-index).
  *
  * The failure mode this bounds: a boilerplate-heavy corpus (millions
  * of near-identical docs that survive exact dedup by one byte) puts m
  * rows into ONE (band, sig) bucket and the candidate self-join
  * materializes m²/2 pairs inside a single task — the classic skew
  * blow-up that kills the job at 100 TB while every small-SF test stays
  * green. The guard: count bucket sizes once (a construction-time
  * aggregate, the same bounded-collect discipline as E3's literal
  * codebook), and for buckets over `cap` split members into ⌈n/cap⌉
  * deterministic hash groups. The candidate join then keys on
  * (bucket, salt), so per-bucket pair count drops from n²/2 to
  * ~n·cap/2 and per-task work is bounded by the cap, not the corpus.
  *
  * Semantics contract: the salt is 0 for every bucket at or under the
  * cap, so BELOW threshold the (keys :+ salt) join is bit-identical to
  * the plain (keys) join — all contract-data oracles are unchanged
  * (measured max contract bucket at sf0.1: 451 rows, vs the 4096
  * default cap). ABOVE threshold the policy is part of the operator's
  * definition: a member pairs only within its hash group — recall
  * inside a giant bucket is traded for a hard per-task bound. Members
  * of such a bucket are near-identical to each other, so group-local
  * detection still flags them; full-bucket linkage, when wanted, comes
  * from the cluster transitivity D7 runs on top.
  *
  * Plan shape: the salt is a PURE PROJECTION — a literal when-chain
  * over the (rare) hot buckets plus one hash — so the guarded join adds
  * ZERO shuffle, zero extra scan, and stays inside whole-stage codegen;
  * the only added cost is the one construction-time count job, memoized
  * per (site, dir) per JVM. The hot list is ≤ |rows|/cap entries by
  * construction and a sliver of that in any real corpus; the
  * `maxHotBuckets` guard turns the degenerate case (so many hot buckets
  * the literal chain itself would be the problem) into a loud error
  * rather than a silent driver stall — at that point the corpus needs a
  * frequency floor upstream, not a bigger when-chain.
  *
  * Determinism: group count and salt depend only on (bucket size,
  * member id), so two INDEPENDENTLY salted derivations of the same
  * frame agree — the probe and index sides of an incremental join can
  * be salted separately (G15 salts each micro-batch against the
  * standing index's hot list via the shared memo key) and still collide
  * exactly with the batch path.
  */
object HotBucket {

  /** Default per-bucket cap: far above every bucket the contract data
    * produces at sf ≤ 0.1, so the guard is result-invisible in every
    * driver gate; a production deployment tunes it to the executor-task
    * budget (pairs per task ≤ cap²/2).
    */
  val defaultCap = 4096

  /** Refuse to inline a pathologically long literal chain. */
  val maxHotBuckets = 4096

  /** The pre-collect hot-list frame, limited to maxHotBuckets + 1 rows
    * BEFORE the driver ever sees it: in the degenerate corpus this
    * guard exists for, hot buckets ≈ rows/cap (10⁸ at 100 TB) and an
    * unbounded collect would OOM the driver before the require in
    * [[hotBuckets]] could refuse loudly — maxHotBuckets + 1 rows
    * suffice to detect excess. Exposed so the pathological-refusal spec
    * can assert the plan carries the GlobalLimit.
    */
  private[graft] def hotBucketsFrame(rows: DataFrame, keys: Seq[String],
                                     cap: Int): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap)
      .select(keys.map(col) :+
        ceil(col("__n").cast("double") / cap).cast("int").as("__groups"): _*)
      .limit(maxHotBuckets + 1)

  /** The collected hot-bucket list: one (key values, ⌈n/cap⌉) entry per
    * bucket STRICTLY over the cap. Construction-time job over `rows`
    * (count(*) prunes everything but the key columns), memoized per
    * caller site by [[saltByCap]].
    */
  private[graft] def hotBuckets(rows: DataFrame, keys: Seq[String],
                                cap: Int): Seq[(Seq[Any], Int)] = {
    val collected = hotBucketsFrame(rows, keys, cap).collect()
    require(collected.length <= maxHotBuckets,
      s"more than $maxHotBuckets buckets exceed cap=$cap — the corpus " +
        "needs an upstream frequency floor before LSH, not a literal " +
        "salt table this size")
    collected.toSeq.map(r => (keys.indices.map(r.get), r.getInt(keys.length)))
  }

  /** The salt projection for a precomputed hot list: members of a hot
    * bucket get `pmod(hash(id), groups)`, everyone else 0 (cold buckets
    * have groups = 1 and pmod(·, 1) ≡ 0, so no special case).
    */
  private[graft] def saltCol(hot: Seq[(Seq[Any], Int)], keys: Seq[String],
                             idCol: Column): Column =
    if (hot.isEmpty) lit(0) else pmod(hash(idCol), groupsCol(hot, keys))

  /** Salt `rows` against its own bucket sizes: adds a `salt` column;
    * the guarded join keys on `keys :+ "salt"`. `site` keys the
    * per-JVM memo of the counted hot list (explicit descriptor, never a
    * plan hash — two sites with colliding hashes must not share salt
    * tables).
    */
  def saltByCap(rows: DataFrame, keys: Seq[String], idCol: Column,
                site: String, cap: Int = defaultCap): DataFrame =
    rows.withColumn("salt", saltCol(memoHot(rows, keys, site, cap), keys, idCol))

  /** The memoized hot list for a site — exposed so a PROBE frame that is
    * NOT the indexed frame (a streaming micro-batch) can salt itself
    * against the index's hot list and collide exactly with it.
    */
  private[graft] def memoHot(rows: DataFrame, keys: Seq[String],
                             site: String, cap: Int): Seq[(Seq[Any], Int)] =
    graft.QueryCaches.memo(s"hotbucket:$site:$cap") {
      hotBuckets(rows, keys, cap)
    }

  /** The LOSSLESS bounded-task variant, for buckets whose hotness is
    * STRUCTURAL rather than adversarial — SimHash's 16-bit block values
    * put thousands of ordinary documents in one bucket on perfectly
    * normal data (caught by the sf0.1 oracle sweep: the lossy salt
    * dropped cross-group SimHash pairs and the near-dup counts
    * diverged). Where the operator's declared OUTPUT depends on full
    * pair coverage (D3's per-doc near-dup counts), pairs cannot be
    * dropped; instead the classic triangle split bounds the TASK, not
    * the answer: members of an over-cap bucket are hash-grouped as in
    * [[saltByCap]], and each member is replicated into the g group-pair
    * tasks containing its group. The self-join keys on
    * (keys, tmin, tmax) with [[trianglePairFilter]] keeping exactly one
    * copy of every pair — per-task input is ≤ 2·cap-ish rows, total
    * pairs are EXACTLY the plain join's, at the price of a g×
    * replication of the hot bucket only (n·g ≈ n²/cap rows — the
    * unavoidable cost of an output that is itself quadratic in the
    * bucket). Cold buckets replicate once with task (0, 0): the plan
    * degenerates to the plain join.
    */
  def triangleReplicate(rows: DataFrame, keys: Seq[String], idCol: Column,
                        site: String, cap: Int = defaultCap): DataFrame = {
    val hot = memoHot(rows, keys, site, cap)
    val groups = groupsCol(hot, keys)
    rows
      .withColumn("grp", pmod(hash(idCol), groups))
      .withColumn("other", explode(sequence(lit(0), groups - 1)))
      .withColumn("tmin", least(col("grp"), col("other")))
      .withColumn("tmax", greatest(col("grp"), col("other")))
      .drop("other")
  }

  /** Keeps exactly one copy of each pair in the triangle join: the left
    * member must own the task's low group and the right its high group
    * (or vice versa) — same-group pairs survive only in their (s, s)
    * task, cross-group pairs only in their one (s, t) task.
    */
  def trianglePairFilter(lGrp: Column, rGrp: Column): Column =
    (lGrp === col("tmin") && rGrp === col("tmax")) ||
      (lGrp === col("tmax") && rGrp === col("tmin"))

  /** ⌈n/cap⌉ for the row's bucket (1 for cold buckets) as ONE FLAT
    * CaseWhen over the hot list — chained `.when` branches on a single
    * builder, never a nested when(...).otherwise(when(...)) fold: a
    * hot list in the thousands would make the nested form a
    * thousands-deep expression tree and crash Catalyst's recursive
    * transforms long before the maxHotBuckets guard fires.
    */
  private[graft] def groupsCol(hot: Seq[(Seq[Any], Int)],
                               keys: Seq[String]): Column =
    if (hot.isEmpty) lit(1)
    else {
      def cond(vals: Seq[Any]): Column =
        keys.zip(vals).map { case (k, v) => col(k) <=> lit(v) }.reduce(_ && _)
      val first = when(cond(hot.head._1), lit(hot.head._2))
      hot.tail.foldLeft(first) { case (acc, (vals, g)) =>
        acc.when(cond(vals), lit(g))
      }.otherwise(lit(1))
    }

  /** PROBE-side lossless coverage of a [[saltByCap]]'d corpus: each
    * probe row is replicated across ALL of its bucket's salt groups, so
    * the (keys, salt) equi-join meets every corpus member — results are
    * identical to the plain join at ANY scale, while per-task work is
    * one salt group (≤ cap-ish corpus rows) × that bucket's probes. The
    * right guard when the probe side is small (E2/E6's %100 sample) and
    * the output — top-k over the whole bucket — depends on full
    * coverage; for cold buckets the single salt 0 makes it the plain
    * join.
    */
  def probeAllSalts(probes: DataFrame, hot: Seq[(Seq[Any], Int)],
                    keys: Seq[String]): DataFrame =
    probes.withColumn("salt",
      explode(sequence(lit(0), groupsCol(hot, keys) - 1)))
}
