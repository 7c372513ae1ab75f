package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-3 wave-8 operators (SURVEY.md §2 A44-A45,
  * C17, F7). Oracle hash-matching is the driver's gate; these pin the
  * semantic properties that survive refactors.
  */
class Round3cSpec extends AnyFunSuite {
  import graft.ml.Ml3
  import graft.ops.{Analytics, Text2}
  lazy val spark = TestSpark.spark
  lazy val sf = TestSpark.sf

  test("q_incremental_agg: partial-merge result equals the full recompute") {
    val inc = Analytics.qIncrementalAgg(spark, sf)
    val full = graft.tables.Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sc"))
      .select(col("o_orderpriority"), col("n_orders"),
        (col("sc") / 100.0).as("revenue"),
        graft.ops.OracleRound.r4b(col("sc").cast("double") / (col("n_orders") * lit(100L)).cast("double")).as("avg_price"))
      .orderBy("o_orderpriority")
    assert(inc.collect().toSeq == full.collect().toSeq)
  }

  test("q_event_transitions: pair count = events - users (one chain per user)") {
    val t = Analytics.qEventTransitions(spark, sf).cache()
    val ev = graft.tables.Tables.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(t.agg(sum("n")).head.getLong(0) == nEvents - nUsers)
    assert(t.filter(col("n") <= 0).isEmpty)
    t.unpersist()
  }

  test("ml_threshold_sweep: counts monotone in the threshold, population constant") {
    val s = Ml3.mlThresholdSweep(spark, sf).orderBy("threshold").collect()
    assert(s.length == 9)
    val pop = s.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)).distinct
    assert(pop.length == 1, "tp+fp+fn+tn differs across thresholds")
    val pos = s.map(r => r.getLong(1) + r.getLong(3)).distinct // tp+fn fixed
    assert(pos.length == 1, "positive count differs across thresholds")
    s.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) <= a.getLong(1), "tp must not grow with threshold")
      assert(b.getLong(2) <= a.getLong(2), "fp must not grow with threshold")
    }
  }

  test("text_readability: counts positive, flesch recomputes from the parts") {
    val r = Text2.textReadability(spark, sf).cache()
    assert(r.filter(col("n_sent") < 1 || col("n_words") < 1 || col("n_syll") < 1).isEmpty)
    val n = graft.tables.Tables.documents(spark, sf).count()
    assert(r.count() == n)
    // the composite stays in a sane band for synthetic prose
    assert(r.filter(col("flesch") > lit(206.835)).isEmpty)
    r.unpersist()
  }
}
