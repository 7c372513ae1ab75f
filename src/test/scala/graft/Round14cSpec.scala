package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corpus, PartGen, Takedown}
import graft.tables.Tables

/** Round-14 directive #5 (r13 verdict): the damage-proportional bin
  * TOP-UP (D21 `takedown_bin_topup`). The contract row's oracle
  * replays pack → purge → spans → run-length refill → audit; this
  * spec pins the three properties the hash alone doesn't spell out:
  * (a) untouched bins are byte-identical (their partitions are never
  * rewritten — the PartGen layer holds ONLY damaged bins), (b)
  * refilled bins meet the fill floor (each covered damaged bin gets
  * back at least its deficit minus one predecessor-overshoot doc),
  * (c) the write cost is O(damage).
  */
class Round14cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def sf = TestSpark.sf

  private def root = Takedown.topupRoot(spark, sf)
  private def packedPath = s"$root/packed"

  private def toks = Tables.documents(spark, sf)
    .select(col("doc_id"),
      size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"))
        .cast("long").as("n_tokens"))

  private def holdRem = (col("doc_id") % Takedown.takedownMod)
    .isin(Takedown.topupHoldoutRems: _*)
  private def isTd = col("doc_id") % Takedown.takedownMod === Takedown.takedownRem

  /** The pure pack the artifact persisted (pre-takedown). */
  private def originalPack = Corpus.binAssigned(toks.filter(!holdRem),
    Takedown.topupCapacity, col("n_tokens").desc, col("doc_id"))

  test("the layer holds ONLY damaged bins - untouched partitions never rewritten") {
    val layerBins = PartGen.partsIn(packedPath, 1, "bin").map(_.toLong).toSet
    assert(layerBins.nonEmpty, "no layer — the top-up never ran")
    val damagedBins = originalPack.filter(isTd)
      .select("bin").distinct().collect().map(_.getLong(0)).toSet
    assert(layerBins == damagedBins,
      s"layer partitions $layerBins != damaged bins $damagedBins")
    // after reclaim, gen 0 holds exactly the untouched bins
    val gen0Bins = PartGen.partsIn(packedPath, 0, "bin").map(_.toLong).toSet
    val allBins = originalPack.select("bin").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(gen0Bins == allBins -- damagedBins,
      "gen-0 partitions are not exactly the untouched bins")
  }

  test("untouched bins serve rows bit-identical to the original pack") {
    val damagedBins = originalPack.filter(isTd)
      .select("bin").distinct().collect().map(_.getLong(0))
    val served = PartGen.read(spark, packedPath, "bin")
      .filter(!col("bin").isin(damagedBins: _*))
      .select(col("doc_id"), col("n_tokens"), col("bin").cast("long").as("bin"))
    val orig = originalPack.filter(!col("bin").isin(damagedBins: _*))
    assert(served.exceptAll(orig).isEmpty && orig.exceptAll(served).isEmpty,
      "an untouched bin's rows diverged from the original pack")
  }

  test("no takedown doc survives, and refilled bins meet the fill floor") {
    val served = PartGen.read(spark, packedPath, "bin")
      .select(col("doc_id"), col("n_tokens"), col("bin").cast("long").as("bin"))
    assert(served.filter(isTd).count() == 0,
      "a takedown doc survives in the topped-up pack")
    val preFill = originalPack.groupBy("bin")
      .agg(sum("n_tokens").as("pre")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val postFill = served.groupBy("bin")
      .agg(sum("n_tokens").as("post")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val deficits = originalPack.filter(isTd).groupBy("bin")
      .agg(sum("n_tokens").as("d")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxHoldDoc = toks.filter(holdRem)
      .agg(max("n_tokens")).head.getLong(0)
    val holdTotal = toks.filter(holdRem)
      .agg(sum("n_tokens")).head.getLong(0)
    val totalDeficit = deficits.values.sum
    assert(holdTotal >= totalDeficit,
      s"holdout pool $holdTotal cannot cover total deficit $totalDeficit " +
        "- the two-class pool sizing assumption broke")
    deficits.keys.foreach { b =>
      // covered bin: refill >= deficit minus at most one
      // predecessor-overshoot doc (the run-length boundary rule)
      assert(postFill(b) >= preFill(b) - maxHoldDoc,
        s"bin $b refilled to ${postFill(b)}, below the floor " +
          s"${preFill(b)} - $maxHoldDoc")
    }
    info(s"damaged=${deficits.size} bins, totalDeficit=$totalDeficit, " +
      s"holdout=$holdTotal, maxHoldDoc=$maxHoldDoc")
  }

  test("conservation: every holdout doc is a top-up or in the remainder") {
    val audit = Takedown.takedownBinTopup(spark, sf).collect()
    assert(audit.forall(_.getAs[Long]("takedown_rows") == 0L),
      "the hashed absence proof is non-zero")
    val nHold = toks.filter(holdRem).count()
    val topups = audit.filter(_.getAs[Long]("bin") >= 0)
      .map(_.getAs[Long]("topup_docs")).sum
    val leftover = audit.filter(_.getAs[Long]("bin") == -1L)
      .map(_.getAs[Long]("topup_docs")).sum
    assert(topups + leftover == nHold,
      s"holdout conservation broke: $topups + $leftover != $nHold")
    assert(topups > 0, "the top-up assigned nothing — vacuous")
  }
}
