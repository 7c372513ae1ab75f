package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{BlockTune, Dedup}

/** Round-9 stretch #9 witnesses: the SimHash block-count tuner (D17).
  * The tuning math (exact inclusion–exclusion over clean blocks) is
  * checked against brute-force position enumeration and its own
  * structural identities; the audit is driven over a constructed
  * borderline corpus whose pairs land at hamming 4..7 — where the
  * default 4×16 scheme measurably misses and the tuned 8×8 scheme is
  * pigeonhole-GUARANTEED complete.
  */
class Round10gSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("the tuner PROVES D3's 4x16 constant minimal at its own threshold") {
    assert(BlockTune.estRecallPermille(4, 3) == 1000L) // pigeonhole 3 < 4
    assert(BlockTune.estRecallPermille(2, 3) == 238L)  // 2 blocks can't
    assert(BlockTune.tune(h = 3) == 4)
  }

  test("at the contract threshold (hamming 7) the tuner lands 8 blocks") {
    assert(BlockTune.estRecallPermille(4, 7) == 441L)
    assert(BlockTune.estRecallPermille(8, 7) == 1000L) // pigeonhole 7 < 8
    assert(BlockTune.tune() == 8)
  }

  test("pigeonhole identity: h < k closes at exactly 1000 permille") {
    for (k <- Seq(2, 4, 8, 16); h <- 1 until k)
      assert(BlockTune.estRecallPermille(k, h) == 1000L, s"k=$k h=$h")
  }

  test("estimates nest like the candidate sets: more blocks never lose recall") {
    for (h <- 1 to 12) {
      val e = Seq(2, 4, 8, 16).map(BlockTune.estRecallPermille(_, h))
      assert(e == e.sorted, s"h=$h: $e not monotone in block count")
    }
  }

  test("inclusion-exclusion matches brute-force position enumeration (h ≤ 2)") {
    for (k <- Seq(4, 8); h <- 1 to 2) {
      val m = 64 / k
      // enumerate every placement of h differing bits; count placements
      // leaving at least one block clean
      val placements =
        if (h == 1) (0 until 64).map(Seq(_))
        else for { a <- 0 until 64; b <- a + 1 until 64 } yield Seq(a, b)
      val hits = placements.count { pos =>
        (0 until k).exists(blk => pos.forall(p => p / m != blk))
      }
      val want = BigInt(hits) * 1000 / placements.size
      assert(BlockTune.estRecallPermille(k, h) == want.toLong,
        s"k=$k h=$h: formula disagrees with enumeration")
    }
  }

  test("borderline corpus: default 4x16 misses hamming-4..7 pairs the tuned 8x8 is guaranteed to surface") {
    // pairs (10i, 10i+1): a base doc of unique tokens and a copy with j
    // tokens substituted — j sweeps 1..12, dragging the pair's simhash
    // hamming through the 4..7 band where 16-bit blocks can all be dirty
    // tokens are full-width random hex strings: a shared-prefix vocab
    // would concentrate RollHash64 differences in LOW bits (polynomial
    // hash: a late-character change perturbs only low powers), cluster
    // every flip in the low blocks, and hand the default scheme a free
    // clean high block — measured: 42/42 recall on a prefix-shaped
    // vocab vs the misses below on hash-diverse tokens
    val rnd = new scala.util.Random(20260815)
    val docs = (0 until 60).flatMap { i =>
      val n = 40
      val base = Array.fill(n)(rnd.nextLong().toHexString)
      val j = 1 + (i % 12)
      val mutated = base.clone()
      (0 until j).foreach { x =>
        mutated(rnd.nextInt(n)) = rnd.nextLong().toHexString
      }
      Seq((10L * i, base.mkString(" ")), (10L * i + 1, mutated.mkString(" ")))
    }.toDF("doc_id", "text")
    val sigs = Dedup.simhashSigsOf(docs).localCheckpoint()
    // the constructed pairs' hamming spectrum — the borderline band must
    // be populated or the miss claim is vacuous
    val hams = sigs.as("l").join(sigs.as("r"),
        col("l.doc_id") + 1 === col("r.doc_id") &&
          col("l.doc_id") % 10 === 0)
      .select(bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("h"))
      .as[Int].collect()
    val inBand = hams.count(h => h >= 4 && h <= 7)
    info(s"constructed hamming spectrum: ${hams.groupBy(identity).view.mapValues(_.length).toMap.toSeq.sorted}")
    assert(inBand >= 5, s"only $inBand pairs in the 4..7 borderline band")
    def auditRow(k: Int, tag: String): (Long, Long, Long) = {
      val r = BlockTune.blockAuditOf(sigs, k, tag).head()
      (r.getLong(0), r.getLong(2), r.getLong(3)) // (n_truth, n_hits, recall_pct)
    }
    val (tDef, hDef, rDef) = auditRow(4, "r10g.default")
    val (tTun, hTun, rTun) = auditRow(8, "r10g.tuned")
    info(s"default 4x16: $hDef/$tDef ($rDef%); tuned 8x8: $hTun/$tTun ($rTun%)")
    assert(tDef > 0 && tDef == tTun, "schemes must audit the same truth")
    assert(rDef < 100,
      s"default scheme missed nothing on the borderline corpus ($hDef/$tDef)")
    assert(rTun == 100 && hTun == tTun,
      s"tuned scheme must be pigeonhole-complete at hamming ≤ 7 ($hTun/$tTun)")
  }
}
