package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.StatsPlan

/** Round-10 directive #5 witnesses: histogram statistics. On a column
  * where ONE value covers 90% of the fact, the equality-uniform 1/ndv
  * estimate (A56's mechanism) under-sizes the hot-key filter by more
  * than an order of magnitude — the exact failure a planner pays for
  * by broadcasting a near-full fact slice; the equi-height histogram
  * puts the estimate within 2× of truth, and the physical join shape
  * flips on nothing but WHICH stats the catalog serves, over
  * byte-identical parquet, with a bit-identical answer.
  */
class Round10dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("1/ndv mis-sizes the hot-key filter; the histogram lands within 2x of truth") {
    val dir = TestSpark.sf
    val (hist, noHist) = StatsPlan.histTables(spark, dir)
    val truth = spark.table(hist).filter(col("hot_key") === 0).count()
    def rowEstimate(table: String): BigInt =
      withConfsGet("spark.sql.cbo.enabled" -> "true") {
        spark.table(table).filter(col("hot_key") === 0)
          .queryExecution.optimizedPlan.stats.rowCount.getOrElse(BigInt(-1))
      }
    val estNdv = rowEstimate(noHist)
    val estHist = rowEstimate(hist)
    info(s"truth=$truth, ndv-estimate=$estNdv, histogram-estimate=$estHist")
    assert(estNdv > 0, "no row estimate under plain column stats")
    // the uniform estimate misses by more than 10x on the hot key
    assert(estNdv * 10 < BigInt(truth),
      s"expected the 1/ndv estimate to under-size the hot filter: $estNdv vs $truth")
    // the histogram estimate is within 2x either way
    assert(estHist * 2 >= BigInt(truth) && estHist <= BigInt(truth) * 2,
      s"histogram estimate $estHist not within 2x of truth $truth")
  }

  private def withConfsGet[T](pairs: (String, String)*)(body: => T): T = {
    var out: Option[T] = None
    withConfs(pairs: _*) { out = Some(body) }
    out.get
  }

  test("the join shape flips on which stats the catalog serves; the answer doesn't") {
    val dir = TestSpark.sf
    val (hist, noHist) = StatsPlan.histTables(spark, dir)
    // size estimate of the actual build candidate: hot-filtered, pruned
    // to the join key
    def sizeEstimate(table: String): BigInt =
      withConfsGet("spark.sql.cbo.enabled" -> "true") {
        spark.table(table).filter(col("hot_key") === 0)
          .select("o_orderkey")
          .queryExecution.optimizedPlan.stats.sizeInBytes
      }
    val sizeNdv = sizeEstimate(noHist)
    val sizeHist = sizeEstimate(hist)
    info(s"build-side size estimate: $sizeNdv B (1/ndv) vs $sizeHist B (histogram)")
    assert(sizeNdv * 4 < sizeHist,
      "the two stats regimes should disagree substantially on the hot slice")
    // a broadcast threshold BETWEEN the two estimates: the 1/ndv
    // planner wrongly broadcasts the 90% fact slice; the histogram
    // planner keeps the sort-merge join. The other side is the full
    // fact scan — never a broadcast candidate.
    val threshold = ((sizeNdv + sizeHist) / 2).toString
    def run(useHist: Boolean): (String, Array[org.apache.spark.sql.Row]) =
      withConfsGet(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> threshold) {
        val df = StatsPlan.qStatsHistOver(spark, dir, useHist)
        (df.queryExecution.executedPlan.toString, df.collect())
      }
    val (ndvPlan, ndvRows) = run(useHist = false)
    val (histPlan, histRows) = run(useHist = true)
    assert(ndvPlan.contains("BroadcastHashJoin"),
      s"1/ndv stats should (wrongly) broadcast the hot slice at threshold $threshold:\n$ndvPlan")
    assert(histPlan.contains("SortMergeJoin") && !histPlan.contains("BroadcastHashJoin"),
      s"histogram stats should keep the sort-merge join at threshold $threshold:\n$histPlan")
    assert(ndvRows.sameElements(histRows),
      "the physical shape changed the answer — stats must be result-invisible")
    assert(ndvRows.nonEmpty)
  }

  test("ANALYZE recorded an equi-height histogram only on the histogram table") {
    val dir = TestSpark.sf
    val (hist, noHist) = StatsPlan.histTables(spark, dir)
    def histogramOf(t: String): String =
      spark.sql(s"DESCRIBE EXTENDED $t hot_key")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        .getOrElse("histogram", "NULL")
    assert(histogramOf(hist) != "NULL",
      "no histogram recorded on the histogram-analyzed table")
    assert(histogramOf(noHist) == "NULL",
      "the plain-stats twin unexpectedly carries a histogram")
  }
}
