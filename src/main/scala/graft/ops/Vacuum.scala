package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generation pointer for tombstoned artifacts — the discipline that
  * lets a vacuum REWRITE an artifact without ever serving a torn state
  * (r12 verdict directive #3, carrying I15's compact+vacuum lifecycle
  * and its monotone-claim-floor lesson over to the three merge-on-read
  * artifacts: D18's band index, E21's PQ code table, E22's graph
  * edges).
  *
  * Layout: generation 0 IS the artifact root (exactly the pre-vacuum
  * paths, so un-vacuumed artifacts read identically to rounds ≤12);
  * generation g ≥ 1 lives under `root/_gen=g`. The current generation
  * is named by a dot-prefixed `.generation` sidecar (I21's manifest
  * discipline — invisible to plain parquet readers), written via
  * temp-file + atomic rename and REQUIRED monotone: the pointer flips
  * only after the new generation's files are fully written, so a crash
  * mid-vacuum leaves the old generation serving (index + sidecar —
  * correct by merge-on-read) and never a half-written new one. This is
  * the same write-before-delete ordering vacuumLog's claim floor
  * established for batch ids (Sources.scala) — here the "floor" is the
  * generation number itself.
  */
private[graft] object ArtifactGen {
  private def genFile(root: String) = new java.io.File(root, ".generation")

  def current(root: String): Int = {
    val f = genFile(root)
    if (f.isFile) {
      val raw = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
      // an unreadable pointer means the live generation is UNKNOWN —
      // serving could resurrect vacuumed tombstones, so fail loudly
      // (unreachable through the atomic writer below; guards manual
      // edits and torn non-POSIX writes — claimFloor's discipline)
      try raw.toInt catch {
        case _: NumberFormatException => throw new IllegalStateException(
          s"generation sidecar $f is unreadable (contents: '$raw')")
      }
    } else 0
  }

  def dir(root: String, g: Int): String =
    if (g == 0) root else s"$root/_gen=$g"

  /** Flip the pointer to `to` — atomic and monotone. */
  def bump(root: String, to: Int): Unit = {
    val cur = current(root)
    require(to > cur, s"generation must rise: $cur -> $to")
    val tmp = java.nio.file.Files.createTempFile(
      new java.io.File(root).toPath, ".generation_", ".tmp")
    java.nio.file.Files.write(tmp,
      to.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, genFile(root).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Reclaim old generations' member directories (the VACUUM half —
    * only this returns the bytes). Safe strictly AFTER [[bump]]: the
    * pointer already names the new generation, so readers never list
    * the removed paths. Deletes only the named members, never the
    * pointer or newer `_gen=` dirs.
    */
  def reclaim(root: String, below: Int, members: Seq[String]): Unit = {
    def delete(f: java.io.File): Unit = {
      val kids = f.listFiles
      if (kids != null) kids.foreach(delete)
      f.delete()
      ()
    }
    (0 until below).foreach { g =>
      members.foreach { m =>
        val f = new java.io.File(dir(root, g), m)
        if (f.exists) delete(f)
      }
    }
  }
}

/** Maintenance vacuum for the three tombstoned artifacts (r12 verdict
  * directive #3): the merge-on-read sidecars are correct forever but
  * grow forever — every serve pays the anti-join and the artifact
  * keeps storing rows nobody may ever see. At 100 TB with takedown
  * churn the sidecar eventually IS a table, so the same
  * compact+vacuum discipline the lakehouse log has (I15) applies
  * here: REWRITE the artifact without the tombstoned rows as a new
  * generation, reset the sidecar to empty, flip the generation
  * pointer atomically, and only then reclaim the old files.
  *
  * Result-invisible by construction: the serve reads
  * (current-generation member) ANTI-JOIN (current-generation
  * tombstones) either way — pre-vacuum that is (full index, sidecar),
  * post-vacuum (purged index, empty sidecar) — so every vacuum
  * contract row below shares its tombstoned serve's oracle VERBATIM
  * and the driver hash-proves serve equality. Post-vacuum re-deletes
  * keep working because the sidecar mechanism is untouched — new
  * tombstones land in the current generation's sidecar
  * ([[addTombstones]]), exactly as they did at generation 0.
  *
  * The contract queries operate on their OWN artifact instances
  * (same builders as the shared per-dir artifacts, separate scratch
  * roots) so vacuuming never mutates the generation-0 state the
  * D18/E21/E22 rows and their specs read.
  *
  * Scale shape: one vacuum = one scan of the member anti-join a
  * broadcast takedown-sized sidecar, writing O(survivors) — I15's
  * compaction cost, amortized over every future serve's saved
  * anti-join; between vacuums deletes stay O(|takedown|).
  */
object Vacuum {

  /** Per-vacuum receipt telemetry: (rows before, rows after, bytes
    * before, bytes after) — how the spec pins that reclaim actually
    * shrank the artifact. Keyed by `statsKey`.
    */
  private[graft] val vacuumStats =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Long, Long)]()

  private[graft] def bytesUnder(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).getOrElse(Array.empty).map(walk).sum
      else f.length
    walk(new java.io.File(path))
  }

  /** Append new tombstones to the CURRENT generation's sidecar — the
    * post-vacuum re-delete path (the mechanism a vacuum must never
    * break).
    */
  private[graft] def addTombstones(root: String, tomb: DataFrame): Unit = {
    val gd = ArtifactGen.dir(root, ArtifactGen.current(root))
    tomb.write.mode("append").parquet(s"$gd/tombstones")
  }

  /** One generation step for a keyed artifact: write `surviving` as
    * the next generation's member, an empty sidecar next to it, flip
    * the pointer, reclaim the old generation's files. `memberBytesPath`
    * is where the CURRENT member's bytes live (outside the root for
    * E21, whose generation-0 codes are E9's shared artifact — those
    * are never reclaimed, only superseded).
    */
  private[graft] def vacuumMember(spark: SparkSession, root: String,
                                  member: String, surviving: DataFrame,
                                  tombEmpty: DataFrame,
                                  memberBytesPath: String,
                                  reclaimGen0Member: Boolean,
                                  statsKey: String): Unit = {
    val g = ArtifactGen.current(root)
    val gd = ArtifactGen.dir(root, g)
    val rowsBefore = spark.read.parquet(memberBytesPath).count()
    val bytesBefore =
      bytesUnder(memberBytesPath) + bytesUnder(s"$gd/tombstones")
    val nd = ArtifactGen.dir(root, g + 1)
    surviving.write.mode("overwrite").parquet(s"$nd/$member")
    tombEmpty.limit(0).write.mode("overwrite").parquet(s"$nd/tombstones")
    ArtifactGen.bump(root, g + 1)
    val reclaimMembers =
      if (reclaimGen0Member) Seq(member, "tombstones") else Seq("tombstones")
    ArtifactGen.reclaim(root, g + 1, reclaimMembers)
    val rowsAfter = spark.read.parquet(s"$nd/$member").count()
    val bytesAfter =
      bytesUnder(s"$nd/$member") + bytesUnder(s"$nd/tombstones")
    vacuumStats.put(statsKey, (rowsBefore, rowsAfter, bytesBefore, bytesAfter))
    ()
  }

  // ---------------- D19: band-index vacuum ----------------

  private val bandVacOnce =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The vacuum instance of D18's artifact: band-signature index +
    * takedown sidecar (the same builders as the shared artifact),
    * vacuumed immediately — the contract row serves FROM the
    * generation-1 files.
    */
  private[graft] def bandVacuumRoot(spark: SparkSession, dir: String): String =
    bandVacOnce.computeIfAbsent(dir, _ => {
      val root = graft.Scratch.dir("band_tombstone_vac")
      Dedup.bandSignatures(spark, dir)
        .write.mode("overwrite").parquet(s"$root/index")
      graft.tables.Tables.documents(spark, dir)
        .filter(col("doc_id") % 10 === 3)
        .select("doc_id").write.mode("overwrite").parquet(s"$root/tombstones")
      val tomb = spark.read.parquet(s"$root/tombstones")
      val surviving = spark.read.parquet(s"$root/index")
        .join(broadcast(tomb), Seq("doc_id"), "left_anti")
      vacuumMember(spark, root, "index", surviving, tomb,
        s"$root/index", reclaimGen0Member = true, statsKey = s"band:$dir")
      root
    })

  /** D19 — `dedup_tombstone_vacuum`: D18's serve over the VACUUMED
    * band index (purged member + empty sidecar) — shares D18's oracle
    * verbatim, so the driver hash-proves a vacuum is result-invisible.
    */
  def dedupTombstoneVacuum(spark: SparkSession, dir: String): DataFrame =
    Dedup2.tombstoneServeFrom(spark, dir, bandVacuumRoot(spark, dir))

  // ---------------- E24: PQ code-table vacuum ----------------

  private val pqVacOnce =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def pqVacuumRoot(spark: SparkSession, dir: String): String =
    pqVacOnce.computeIfAbsent(dir, _ => {
      val root = graft.Scratch.dir("pqdelete_vac")
      graft.tables.Tables.embeddings(spark, dir)
        .filter(col("vec_id") % 10 === 3)
        .select("vec_id").write.mode("overwrite").parquet(s"$root/tombstones")
      val base = Similarity.pqIndexPath(spark, dir)
      val tomb = spark.read.parquet(s"$root/tombstones")
      val surviving = spark.read.parquet(s"$base/codes")
        .join(broadcast(tomb), Seq("vec_id"), "left_anti")
      // generation-0 codes are E9's SHARED artifact — superseded for
      // this root, never reclaimed (E5/E9/E12 keep serving them)
      vacuumMember(spark, root, "codes", surviving, tomb,
        s"$base/codes", reclaimGen0Member = false, statsKey = s"pq:$dir")
      root
    })

  /** E24 — `ann_index_vacuum`: E21's ADC serve over the VACUUMED code
    * table — shares E21's oracle verbatim (frozen codebook, purged
    * codes ≡ codes minus sidecar).
    */
  def annIndexVacuum(spark: SparkSession, dir: String): DataFrame =
    Similarity.pqDeleteServeFrom(spark, dir, pqVacuumRoot(spark, dir))

  // ---------------- E25: graph edge-artifact vacuum ----------------

  private val graphVacOnce =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def graphVacuumRoot(spark: SparkSession, dir: String): String =
    graphVacOnce.computeIfAbsent(dir, _ => {
      val root = graft.Scratch.dir("graph_tombstone_vac")
      val embs = graft.tables.Tables.embeddings(spark, dir)
      embs.filter(col("vec_id") % 10 === 3)
        .select("vec_id").write.mode("overwrite").parquet(s"$root/tombstones")
      val tomb = spark.read.parquet(s"$root/tombstones")
      // the graph's surviving view is the bridge-REPAIRED edge set
      // (E22's rule), not a plain anti-join — the vacuum persists it.
      // The CUMULATIVE deleted set rides along as its own member —
      // edges no longer witness membership (a survivor's absence from
      // the corpus mask must not depend on graph reachability), and a
      // takedown system keeps its ledger anyway. Written BEFORE the
      // pointer flip inside vacuumMember, same crash argument as the
      // member itself.
      val edgesDf = GraphAnn.edgesArtifact(spark, dir)
      val (repaired, _) =
        GraphAnn.repairedEdges(edgesDf, embs, col("vec_id") % 10 === 3)
      tomb.write.mode("overwrite")
        .parquet(s"${ArtifactGen.dir(root, 1)}/deleted")
      // the generation-0 member is the SHARED edge artifact (E15/E17's
      // files) — recover its directory for the before-accounting;
      // superseded for this root, never reclaimed
      val edgesPath = new java.io.File(
        new java.net.URI(edgesDf.inputFiles.head)).getParent
      vacuumMember(spark, root, "edges", repaired, tomb,
        edgesPath, reclaimGen0Member = false,
        statsKey = s"graph:$dir")
      root
    })

  /** E25 — `ann_graph_vacuum`: E22's greedy serve over the PERSISTED
    * vacuumed graph (repaired edges read back from parquet, entries
    * from the surviving corpus) — shares E22's oracle verbatim.
    */
  def annGraphVacuum(spark: SparkSession, dir: String): DataFrame =
    GraphAnn.graphDeleteServeFrom(spark, dir, graphVacuumRoot(spark, dir))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_tombstone_vacuum" -> (dedupTombstoneVacuum _),
    "ann_index_vacuum" -> (annIndexVacuum _),
    "ann_graph_vacuum" -> (annGraphVacuum _))

  /** Each vacuum row shares its tombstoned serve's oracle VERBATIM —
    * vacuum is storage maintenance, not a semantic operation, and the
    * shared oracle is what lets the driver hash-prove that.
    */
  val oracles: Map[String, String] = Map(
    "dedup_tombstone_vacuum" -> Dedup2.oracles("dedup_tombstone"),
    "ann_index_vacuum" -> Similarity.oracles("ann_index_delete"),
    "ann_graph_vacuum" -> GraphAnn.oracles("ann_graph_delete"))
}
