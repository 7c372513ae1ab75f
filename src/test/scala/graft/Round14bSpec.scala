package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Round-14 directive #4 (r13 verdict): the IVF hot-cell MITIGATION
  * (E28 `ann_cell_split`) must actually fix the skew E26's audit
  * alarms on. On a constructed corpus with one dense cluster —
  * Round13eSpec's shape, scaled up and given distinct in-cluster
  * geometry plus dense probe traffic — the dominating cell's scan
  * mass must drop to ≤ 2× the mean post-mitigation, while the
  * survivors' cells and the corpus partition stay intact.
  */
class Round14bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val audit: Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    // 400 vectors in 8 well-separated clusters — seven normal-sized
    // (~28 members) and ONE hot (200 members, 4x the mean): the
    // realistic skew shape where every cell carries traffic, so the
    // post-split "≤ 2x mean scan mass" bar measures mitigation rather
    // than dilution by empty cells. The 8 trained seeds are the
    // lowest ids = the 8 cluster centers, so the pre-split assignment
    // collapses each cluster onto its own cell. Member jitter is
    // distinct per id so sub-quantizers can separate the hot mass.
    // normal clusters share a +8 offset on dim 63 so each one's
    // second-nearest cell is ANOTHER normal cluster (d2 50), not the
    // hot mass (d2 89) — without it every normal probe is exactly
    // equidistant to all hot subcells and the argmin tie-break piles
    // their second choices onto one subcell, a pure artifact of
    // orthogonal-spike geometry that no real corpus exhibits
    val rows = (0 until 400).map { i =>
      val c = if (i < 8) i else if (i < 208) 0 else 1 + (i - 208) % 7
      val emb = Array.tabulate(64) { d =>
        val center = (if (d == c) 5.0 else 0.0) +
          (if (d == 63 && c >= 1) 8.0 else 0.0)
        val jitter =
          if (i < 8) 0.0
          else 0.01 * (((i * 2654435761L + d * 40503L) % 65521L) / 65521.0)
        center + jitter
      }
      (i.toLong, emb.toSeq)
    }
    val embs = rows.toDF("vec_id", "embedding")
    // dense probe traffic (every vector queries) — the 100 TB serving
    // shape where scan mass is meaningful per cell
    Similarity.cellSplitAuditOf(spark, embs, "r14b_split", nprobe = 2,
      cells = 8, probeMod = 1L).collect()
  }

  private def phase(p: String) = audit.filter(_.getAs[String]("phase") == p)

  test("pre-split: the constructed cluster's cell dominates scan mass") {
    val pre = phase("pre")
    assert(pre.map(_.getAs[Long]("n_vecs")).sum == 400L)
    val hot = pre.maxBy(_.getAs[Long]("scan_mass"))
    assert(hot.getAs[Long]("n_vecs") >= 200,
      s"cluster did not collapse onto one cell: ${pre.mkString(", ")}")
    assert(hot.getAs[Long]("scan_mass") >
      pre.filter(_ ne hot).map(_.getAs[Long]("scan_mass")).sum,
      "the hot cell's scan mass does not dominate pre-split")
  }

  test("post-split: the dominating scan mass drops to <= 2x the mean") {
    val post = phase("post")
    // the corpus is still exactly partitioned
    assert(post.map(_.getAs[Long]("n_vecs")).sum == 400L)
    val masses = post.map(_.getAs[Long]("scan_mass"))
    val mean = masses.sum.toDouble / masses.length
    val preMax = phase("pre").map(_.getAs[Long]("scan_mass")).max
    assert(masses.max <= 2.0 * mean,
      s"post-split max scan mass ${masses.max} > 2x mean $mean " +
        s"(cells: ${post.mkString(", ")})")
    assert(masses.max < preMax / 4,
      s"mitigation barely moved the dominating mass: $preMax -> ${masses.max}")
  }

  test("the split touches only the hot cell: survivors keep their identity") {
    val preCells = phase("pre").map(_.getAs[Long]("cell")).toSet
    val postCells = phase("post").map(_.getAs[Long]("cell")).toSet
    val survivors = postCells.filter(_ < Similarity.cellSplitOffset)
    val subcells = postCells.filter(_ >= Similarity.cellSplitOffset)
    assert(survivors.subsetOf(preCells),
      "a survivor cell id appeared from nowhere")
    assert(subcells.nonEmpty, "no subcells — the split never ran")
    assert((preCells -- survivors).size == 1,
      "the split removed more than the one hot cell")
    // occupancy of every survivor is unchanged pre -> post
    val preOcc = phase("pre").map(r =>
      r.getAs[Long]("cell") -> r.getAs[Long]("n_vecs")).toMap
    val postOcc = phase("post").map(r =>
      r.getAs[Long]("cell") -> r.getAs[Long]("n_vecs")).toMap
    survivors.foreach { c =>
      assert(preOcc(c) == postOcc(c),
        s"survivor cell $c occupancy moved: ${preOcc(c)} -> ${postOcc(c)}")
    }
  }
}
