package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup
import graft.tables.Tables

/** Round-11 10× rehearsal find: the recall audits' probe panel was a
  * fixed 10% FRACTION, making their truth scan QUADRATIC (0.1·n² exact
  * comparisons). Between sf0.1 and the 10× corpus the panel cost grew
  * 100× — the two audit queries alone outlived the rest of the 229-query
  * sweep by over an hour before being killed; with the fixed-count rule
  * the same five-query set completed in 19 minutes. The rule:
  * mod = max(10, n/500) — bit-identical to the historical 10% panel
  * through 5,000 docs (every gate SF: the driver re-verified all three
  * audits hash-unchanged), ~500 probes beyond, truth cost linear in n.
  * The oracle derives the SAME modulus from the same count
  * (Dedup.panelModSql), so the audit replays exactly at every size —
  * hash-proven at 10× by the rehearsal comparison.
  */
class Round11hSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docsOfSize(n: Long) =
    spark.range(n).select(col("id").as("doc_id"))

  test("panel modulus: 10% through every gate SF, fixed ~500-probe count beyond") {
    assert(Dedup.panelModOf(docsOfSize(50)) == 10L)     // sf0.001
    assert(Dedup.panelModOf(docsOfSize(500)) == 10L)    // sf0.01
    assert(Dedup.panelModOf(docsOfSize(5000)) == 10L)   // sf0.1 — the boundary
    assert(Dedup.panelModOf(docsOfSize(20000)) == 40L)  // 4× rehearsal
    assert(Dedup.panelModOf(docsOfSize(50000)) == 100L) // 10× rehearsal
    // the capped panel: count stays ~500 at ANY scale (the whole point)
    for (n <- Seq(20000L, 50000L, 1000000L)) {
      val pm = Dedup.panelModOf(docsOfSize(n))
      val panel = n / pm
      assert(panel >= 250 && panel <= 510,
        s"panel count drifted at n=$n: $panel probes (mod $pm)")
    }
  }

  test("the contract corpus sits below the boundary: audits are bit-identical to the 10% era") {
    val pm = Dedup.panelModOf(Tables.documents(spark, TestSpark.sf))
    assert(pm == 10L,
      s"gate-SF modulus moved to $pm — contract hashes would change")
  }
}
