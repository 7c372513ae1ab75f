package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity
import graft.tables.Tables

/** Round-13 stretch (r12 verdict #9): the IVF cell-balance audit
  * (E26 `ann_cell_audit`). The contract row is hash-proven against
  * the trained-assignment replay; this spec pins that the audit
  * actually DETECTS the failure it exists for — a constructed corpus
  * with one dense cluster produces one hot cell whose scan mass
  * dominates the index — and that the audit's accounting ties out
  * against the corpus.
  */
class Round13eSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def sf = TestSpark.sf

  test("the audit's occupancy ties out and every probe routes to exactly nprobe cells") {
    val audit = Similarity.annCellAudit(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(audit.map(_.getAs[Long]("n_vecs")).sum == nVecs,
      "cell occupancies do not partition the corpus")
    val nProbes = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 100 === 0).count()
    assert(audit.map(_.getAs[Long]("n_probe_hits")).sum == nProbes * 2,
      "probe routing does not account for nprobe=2 cells per probe")
    assert(audit.forall(r =>
      r.getAs[Long]("scan_mass") ==
        r.getAs[Long]("n_vecs") * r.getAs[Long]("n_probe_hits")))
  }

  test("a constructed hot cluster surfaces as one dominating cell") {
    import spark.implicits._
    val dir = Scratch.dir("cell_audit_skew")
    // 40 vectors: ids 0 and 8..39 sit in one tight cluster (vec 0 is
    // the probe — %100=0 — and a cluster member, so its nprobe set
    // includes the hot cell); ids 1..7 are far-apart singletons. The
    // 8 trained seeds are the lowest ids, so the cluster collapses
    // onto one cell and 1..7 stay near-empty.
    val rows = (0 until 40).map { i =>
      val emb =
        if (i == 0 || i >= 8)
          Array.tabulate(64)(d => 0.5f + 0.001f * ((i * 7 + d) % 5))
        else
          Array.tabulate(64)(d => if (d == i) 10f else 0.1f * d / 64f)
      (i.toLong, emb.toSeq, i % 3)
    }
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"),
        col("label").cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val audit = Similarity.annCellAudit(spark, dir).collect()
    val hot = audit.maxBy(_.getAs[Long]("n_vecs"))
    assert(hot.getAs[Long]("n_vecs") >= 33,
      s"the cluster did not collapse onto one cell: ${audit.mkString(", ")}")
    assert(hot.getAs[Long]("n_probe_hits") >= 1,
      "the cluster probe did not route to the hot cell")
    val others = audit.filter(_.getAs[Long]("cell") != hot.getAs[Long]("cell"))
    assert(hot.getAs[Long]("scan_mass") >
      others.map(_.getAs[Long]("scan_mass")).sum,
      "the hot cell's scan mass does not dominate — the audit missed the skew")
  }
}
