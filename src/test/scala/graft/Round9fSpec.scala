package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{BandTune, Dedup}

/** Round-9 directive #6 witnesses: the banding auto-tuner — the exact
  * integer S-curve, the (bands, rows) decision, and the constructed
  * BORDERLINE corpus where the default 8×4 scheme measurably misses
  * true near-dup pairs the tuned scheme surfaces.
  */
class Round9fSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("the exact S-curve matches closed-form expectations and the tuner picks 18x3") {
    // q(tau=0.5, r=4) = 62 per-mille; eight truncating decay steps land 404
    assert(BandTune.estRecallPermille(500, 4, 8) == 404L)
    // r=3 at 17 bands just misses 900, 18 clears it — the boundary that
    // fixes min-b; r=4 cannot reach 900 inside the 64-permutation budget
    assert(BandTune.estRecallPermille(500, 3, 17) < 900L)
    assert(BandTune.estRecallPermille(500, 3, 18) >= 900L)
    assert((1 to 16).forall(b => BandTune.estRecallPermille(500, 4, b) < 900L))
    assert(BandTune.tune() == (18, 3))
  }

  /** 50 borderline pairs: a 20-token shared prefix + disjoint 8-token
    * tails per side gives shingle Jaccard 18/34 ≈ 0.529 — just above
    * D2's 0.5 verify threshold, squarely on the S-curve's slope where
    * the default banding coin-flips. Pair i = (probe 10i, partner
    * 10i+1); token universes are pair-disjoint so cross-pair J ≈ 0.
    */
  private lazy val borderline = (0 until 50).flatMap { i =>
    val prefix = (0 until 20).map(j => s"c${i}w$j")
    val aTail = (0 until 8).map(j => s"a${i}t$j")
    val bTail = (0 until 8).map(j => s"b${i}t$j")
    Seq((10L * i, (prefix ++ aTail).mkString(" ")),
      (10L * i + 1, (prefix ++ bTail).mkString(" ")))
  }.toDF("doc_id", "text")

  test("on the borderline corpus the default banding measurably misses; the tuned scheme hits") {
    val d = Dedup.recallAuditOf(borderline, 32, 8, "spec.bandtune.default").head()
    val t = Dedup.recallAuditOf(borderline, 54, 18, "spec.bandtune.tuned").head()
    assert(d.getAs[Long]("n_truth") == 50L, s"expected 50 true pairs, got $d")
    assert(t.getAs[Long]("n_truth") == 50L)
    val (dr, tr) = (d.getAs[Long]("recall_pct"), t.getAs[Long]("recall_pct"))
    info(s"default 8x4 recall: $dr%  tuned 18x3 recall: $tr%")
    // the S-curve says ~48% vs ~94% at J=0.529; the corpus is fixed and
    // the hashes deterministic, so these are exact reproducible counts —
    // bounds leave slack only for the discreteness of 50 pairs
    assert(dr <= 70L, s"default banding should measurably miss borderline pairs, got $dr%")
    assert(tr >= 85L, s"tuned banding should surface borderline pairs, got $tr%")
    assert(tr >= dr + 20L, s"tuning gain collapsed: $dr% -> $tr%")
  }
}
