package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ArtifactGen, Dedup, Dedup2, GraphAnn, HotBucket, Similarity, Vacuum}
import graft.tables.Tables

/** Round-13 directive #3: compact+vacuum for the three tombstoned
  * artifacts (D18 band index, E21 PQ codes, E22 graph edges). The
  * contract rows share the tombstoned serves' oracles verbatim (the
  * driver hash-proves result-invisibility); this spec pins the three
  * things the oracle can't see — the artifact actually SHRANK, the
  * pointer-flip lifecycle is crash-ordered, and a post-vacuum
  * re-delete still works (the sidecar mechanism survives its own
  * maintenance).
  */
class Round13bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def sf = TestSpark.sf

  test("vacuum serves are row-identical to their tombstoned serves") {
    val pairs = Seq(
      ("dedup_tombstone", Dedup2.dedupTombstone(spark, sf),
        Vacuum.dedupTombstoneVacuum(spark, sf)),
      ("ann_index_delete", Similarity.annIndexDelete(spark, sf),
        Vacuum.annIndexVacuum(spark, sf)),
      ("ann_graph_delete", GraphAnn.annGraphDelete(spark, sf),
        Vacuum.annGraphVacuum(spark, sf)))
    pairs.foreach { case (name, tombed, vacuumed) =>
      assert(vacuumed.collect().sameElements(tombed.collect()),
        s"$name: the vacuumed serve diverged from the tombstoned serve")
    }
  }

  test("vacuum reclaims rows and bytes on all three artifacts") {
    // the serves above force the vacuum instances to exist
    Vacuum.dedupTombstoneVacuum(spark, sf).count()
    Vacuum.annIndexVacuum(spark, sf).count()
    Vacuum.annGraphVacuum(spark, sf).count()
    Seq(s"band:$sf", s"pq:$sf", s"graph:$sf").foreach { key =>
      val (rowsB, rowsA, bytesB, bytesA) = Vacuum.vacuumStats.get(key)
      assert(rowsA < rowsB,
        s"$key: vacuum removed no rows ($rowsB -> $rowsA)")
      assert(bytesA < bytesB,
        s"$key: vacuum reclaimed no bytes ($bytesB -> $bytesA)")
      info(s"$key: rows $rowsB -> $rowsA, bytes $bytesB -> $bytesA")
    }
  }

  test("generation pointer: monotone, atomic, and files land before the flip") {
    val root = Scratch.dir("gen_pointer")
    assert(ArtifactGen.current(root) == 0)
    // writing into the NEXT generation's directory does not change
    // what readers see until the pointer flips — the crash window
    // between member-write and bump serves the OLD generation
    java.nio.file.Files.createDirectories(
      new java.io.File(ArtifactGen.dir(root, 1)).toPath)
    assert(ArtifactGen.current(root) == 0,
      "un-flipped generation became visible")
    ArtifactGen.bump(root, 1)
    assert(ArtifactGen.current(root) == 1)
    intercept[IllegalArgumentException](ArtifactGen.bump(root, 1))
    intercept[IllegalArgumentException](ArtifactGen.bump(root, 0))
    // a torn pointer refuses loudly instead of serving generation 0
    // (which could resurrect vacuumed tombstones)
    java.nio.file.Files.write(
      new java.io.File(root, ".generation").toPath,
      "garbage".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    intercept[IllegalStateException](ArtifactGen.current(root))
  }

  test("band index: a post-vacuum re-delete lands in the fresh sidecar and binds") {
    val docs = Tables.documents(spark, sf)
    val root = Scratch.dir("band_vac_redelete")
    Dedup.bandSignatures(spark, sf)
      .write.mode("overwrite").parquet(s"$root/index")
    docs.filter(col("doc_id") % 10 === 3)
      .select("doc_id").write.mode("overwrite").parquet(s"$root/tombstones")
    val tomb = spark.read.parquet(s"$root/tombstones")
    val surviving = spark.read.parquet(s"$root/index")
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
    Vacuum.vacuumMember(spark, root, "index", surviving, tomb,
      s"$root/index", reclaimGen0Member = true, statsKey = "spec:band")
    assert(ArtifactGen.current(root) == 1)
    assert(!new java.io.File(root, "index").exists,
      "reclaim left the generation-0 index behind")
    // the re-delete: a second takedown batch lands in generation 1's
    // (empty) sidecar and the serve merges it on read
    Vacuum.addTombstones(root,
      docs.filter(col("doc_id") % 10 === 6).select("doc_id"))
    val served = Dedup2.tombstoneServeFrom(spark, sf, root).collect()
    val expected = Dedup2.admissionOver(spark, sf,
      HotBucket.saltByCap(
        Dedup.bandSignatures(spark, sf)
          .filter(col("doc_id") % 10 =!= 3 && col("doc_id") % 10 =!= 6),
        Seq("band", "sig"), col("doc_id"), s"r13b.redelete:$sf"))
      .collect()
    assert(served.sameElements(expected),
      "post-vacuum re-delete serve diverged from the direct double-delete")
  }

  test("graph: a post-vacuum re-delete repairs over the vacuumed edges and binds") {
    val embs = Tables.embeddings(spark, sf)
    val root = Scratch.dir("graph_vac_redelete")
    embs.filter(col("vec_id") % 10 === 3)
      .select("vec_id").write.mode("overwrite").parquet(s"$root/tombstones")
    val tomb = spark.read.parquet(s"$root/tombstones")
    val (repaired, _) = GraphAnn.repairedEdges(
      GraphAnn.edgesArtifact(spark, sf), embs, col("vec_id") % 10 === 3)
    tomb.write.mode("overwrite")
      .parquet(s"${ArtifactGen.dir(root, 1)}/deleted")
    Vacuum.vacuumMember(spark, root, "edges", repaired, tomb,
      s"$root/tombstones", reclaimGen0Member = false, statsKey = "spec:graph")
    Vacuum.addTombstones(root,
      embs.filter(col("vec_id") % 10 === 6).select("vec_id"))
    val served = GraphAnn.graphDeleteServeFrom(spark, sf, root).collect()
    assert(served.nonEmpty)
    assert(served.forall { r =>
      val nid = r.getAs[Long]("neighbor_id")
      nid % 10 != 3 && nid % 10 != 6
    }, "a deleted or re-deleted vector appeared in the post-vacuum serve")
    // the probe panel also shrank to the double-surviving corpus
    assert(served.forall { r =>
      val qid = r.getAs[Long]("query_id")
      qid % 10 != 3 && qid % 10 != 6
    }, "a deleted vector still probes")
  }

  test("pq codes: a post-vacuum re-delete anti-joins against the fresh sidecar") {
    val embs = Tables.embeddings(spark, sf)
    val root = Scratch.dir("pq_vac_redelete")
    embs.filter(col("vec_id") % 10 === 3)
      .select("vec_id").write.mode("overwrite").parquet(s"$root/tombstones")
    val base = Similarity.pqIndexPath(spark, sf)
    val tomb = spark.read.parquet(s"$root/tombstones")
    val surviving = spark.read.parquet(s"$base/codes")
      .join(broadcast(tomb), Seq("vec_id"), "left_anti")
    Vacuum.vacuumMember(spark, root, "codes", surviving, tomb,
      s"$base/codes", reclaimGen0Member = false, statsKey = "spec:pq")
    // E9's shared codes are superseded, never reclaimed
    assert(new java.io.File(s"$base/codes").exists,
      "vacuum reclaimed the SHARED generation-0 code table")
    Vacuum.addTombstones(root,
      embs.filter(col("vec_id") % 10 === 6).select("vec_id"))
    val served = Similarity.pqDeleteServeFrom(spark, sf, root).collect()
    assert(served.nonEmpty)
    assert(served.forall { r =>
      val nid = r.getAs[Long]("neighbor_id")
      nid % 10 != 3 && nid % 10 != 6
    }, "a deleted or re-deleted vector appeared in the post-vacuum ADC serve")
  }
}
