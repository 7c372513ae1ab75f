package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Relational2Spec extends AnyFunSuite {
  import graft.ops.Relational2
  lazy val spark = TestSpark.spark

  test("q_range_join covers every error event and counts are bounded") {
    val df = Relational2.qRangeJoin(spark, TestSpark.sf)
    val nErrors = graft.tables.Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === "error").count()
    assert(df.count() == nErrors)
    assert(df.agg(min("n_prior_clicks")).head().getLong(0) >= 0L)
  }

  test("q_range_join matches the naive non-equi formulation") {
    // the banded equi-join must agree with the direct (unscalable)
    // interval join on the small test slice
    val e = graft.tables.Tables.events(spark, TestSpark.sf)
    val err = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("u"), expr("ts div 1000").as("ets"))
    val clk = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), expr("ts div 1000").as("cts"))
    val naive = err.join(clk,
        col("u") === col("cu") &&
          col("cts") >= col("ets") - lit(300L * 1000000L) &&
          col("cts") < col("ets"), "left")
      .groupBy("event_id").agg(count(col("cu")).as("n"))
    val banded = Relational2.qRangeJoin(spark, TestSpark.sf)
    val diff = banded.join(naive, "event_id")
      .filter(col("n_prior_clicks") =!= col("n")).count()
    assert(diff == 0L)
  }

  test("q_pivot row sums equal order counts per priority") {
    val df = Relational2.qPivot(spark, TestSpark.sf)
    val total = df.agg(sum(col("n_f") + col("n_o") + col("n_p"))).head().getLong(0)
    assert(total == graft.tables.Tables.orders(spark, TestSpark.sf).count())
  }

  test("q_cube grand total row aggregates the whole table") {
    val df = Relational2.qCube(spark, TestSpark.sf)
    val grand = df.filter(col("status") === "ALL" && col("priority") === "ALL")
      .select("n").head().getLong(0)
    assert(grand == graft.tables.Tables.orders(spark, TestSpark.sf).count())
  }

  test("q_percentile_disc quantiles are ordered and drawn from the data") {
    val rows = Relational2.qPercentileDisc(spark, TestSpark.sf).collect()
    rows.foreach { r =>
      val (p25, p50, p95) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p95)
    }
  }

  test("q_join_bucketed executes without a shuffle below the join") {
    // at test scale AQE would broadcast the tiny orders side, which hides
    // what we're asserting — force the sort-merge path the plan takes when
    // both sides are fact-sized, then check the buckets joined in place
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val df = try {
      val d = Relational2.qJoinBucketed(spark, TestSpark.sf)
      d.collect() // force execution so AQE finalizes the plan
      d
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join in:\n$plan")
    assert(plan.contains("Bucketed: true"), s"expected bucketed scans in:\n$plan")
    // no exchange may repartition either side by the join key — the
    // bucket layout already co-locates them (the groupBy/orderBy
    // exchanges above the join are expected and allowed)
    val keyExchange = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
    assert(keyExchange.findFirstIn(plan).isEmpty,
      s"bucketed join should not shuffle its inputs:\n$plan")
    // and it must agree with the shuffle formulation
    val viaShuffle = graft.ops.Relational.qJoinShuffle(spark, TestSpark.sf)
      .select("o_orderpriority", "revenue")
    val diff = df.join(viaShuffle, "o_orderpriority")
      .filter(df("revenue") =!= viaShuffle("revenue")).count()
    assert(diff == 0L)
  }

  test("q_moving_avg covers every fact row and stays within value bounds") {
    val df = Relational2.qMovingAvg(spark, TestSpark.sf)
    val li = graft.tables.Tables.lineitem(spark, TestSpark.sf)
    assert(df.count() == li.count())
    val (lo, hi) = (li.agg(min("l_quantity")).head().getDouble(0),
      li.agg(max("l_quantity")).head().getDouble(0))
    assert(df.filter(col("qty_ma7") < lo || col("qty_ma7") > hi).count() == 0)
  }

  test("q_json_extract parses every props payload") {
    val df = Relational2.qJsonExtract(spark, TestSpark.sf)
    val total = df.agg(sum("n_with_k")).head().getLong(0)
    assert(total == graft.tables.Tables.events(spark, TestSpark.sf).count())
  }

  test("q_intersect_except partitions the first extract") {
    val rows = Relational2.qIntersectExcept(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = graft.tables.Tables.orders(spark, TestSpark.sf)
    val e1 = o.filter(col("o_orderkey") % 3 =!= 0).count()
    assert(rows("both") + rows("only_first") == e1)
  }

  test("f_target_encode rates lie in [0,1] with one rate per segment") {
    val df = graft.ops.Features.fTargetEncode(spark, TestSpark.sf)
    assert(df.filter(col("seg_rate") < 0 || col("seg_rate") > 1).count() == 0)
    val perSeg = df.groupBy("c_mktsegment")
      .agg(countDistinct("seg_rate").as("n")).filter(col("n") =!= 1)
    assert(perSeg.count() == 0)
  }

  test("f_onehot indicators are exclusive and exhaustive") {
    val df = graft.ops.Features.fOneHot(spark, TestSpark.sf)
    val bad = df.filter(
      col("seg_automobile") + col("seg_building") + col("seg_furniture") +
        col("seg_household") + col("seg_machinery") =!= 1).count()
    assert(bad == 0L)
  }
}
