package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DistRankSpec extends AnyFunSuite {
  import graft.ops.DistRank
  lazy val spark = TestSpark.spark

  test("withGlobalRank equals the single-partition window row_number") {
    val o = graft.tables.Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val viaWindow = o.withColumn("rank", row_number().over(w).cast("long"))
    val viaDist = DistRank.withGlobalRank(o, "rank",
      col("o_totalprice"), col("o_orderkey"))
    assert(viaDist.count() == o.count())
    assert(viaDist.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaDist).isEmpty)
  }

  test("distributed rank slices on literal boundaries: no cache, no single-partition sort") {
    val o = graft.tables.Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice")
    val df = DistRank.withGlobalRank(o, "rank",
      col("o_totalprice"), col("o_orderkey"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // nothing may pin the ranked input in the block-manager cache — at
    // scale that held the entire table in memory+disk
    assert(!plan.contains("InMemoryRelation") && !plan.contains("InMemoryTableScan"),
      s"distributed rank still caches its input:\n$plan")
    // the only full-data exchange is the hash partition on the slice id
    assert(plan.contains("hashpartitioning(_slice"),
      s"expected the slice-id exchange in:\n$plan")
    // and the rank window must stay partitioned by the slice id — a
    // windowspecdefinition without _slice would be the single-partition
    // global sort this operator exists to avoid
    assert(plan.contains("windowspecdefinition(_slice"),
      s"rank window lost its slice partitioning in:\n$plan")
  }

  test("withGlobalRank handles a DESCENDING leading key (decile-lift shape)") {
    val o = graft.tables.Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = o.withColumn("rank", row_number().over(w).cast("long"))
    val viaDist = DistRank.withGlobalRank(o, "rank",
      col("o_totalprice").desc, col("o_orderkey"))
    assert(viaDist.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaDist).isEmpty)
  }

  test("withGlobalRank handles NaN and null keys like the window, asc and desc") {
    import spark.implicits._
    val data = (1 to 40).map { i =>
      val k: Option[Double] = i % 7 match {
        case 0 => None
        case 1 => Some(Double.NaN)
        case _ => Some((i * 37 % 23).toDouble)
      }
      (i.toLong, k)
    }
    val df = data.toDF("id", "key")
    Seq(col("key"), col("key").desc).foreach { order =>
      val w = org.apache.spark.sql.expressions.Window.orderBy(order, col("id"))
      val viaWindow = df.withColumn("rank", row_number().over(w).cast("long"))
      val viaDist = DistRank.withGlobalRank(df, "rank", order, col("id"))
      assert(viaDist.exceptAll(viaWindow).isEmpty &&
        viaWindow.exceptAll(viaDist).isEmpty,
        s"rank mismatch for order $order")
    }
  }

  test("withGlobalRank sizes branch is a pruned partial-aggregated scan, never a second full exchange") {
    // r15 redesign (guide §2.3): the r14 windowed-subplan sizes only
    // reused the rank exchange on inputs too narrow to prune (this
    // test's old shape) — and even then BOTH consumers re-fetched the
    // full-width shuffle. On real consumers (withRunningSums with label
    // columns) pruning differentiated the branches and the fallback
    // shipped the whole table through a SECOND full exchange. Sizes are
    // now count(*) per slice from a lazy pruned scan: map-side partial
    // aggregation, a ≤ mappers × slices-row exchange, the table crosses
    // the network once. Pins: (a) the sizes scan reads ONLY the sort
    // key, (b) its aggregate partial-aggregates before its exchange,
    // (c) still no driver collect (the plan stays lazy — asserted by
    // construction: this test reaches the executed plan only via the
    // caller's own collect).
    val o = graft.tables.Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice")
    val df = DistRank.withGlobalRank(o, "rank",
      col("o_totalprice"), col("o_orderkey"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val scans = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toSeq
    assert(scans.size == 2, s"expected rank scan + pruned sizes scan:\n$plan")
    assert(scans.exists(s => s.contains("o_totalprice") && !s.contains("o_orderkey")),
      s"sizes scan was not pruned to the sort key:\n$plan")
    assert(plan.contains("partial_count"),
      s"sizes branch lost its map-side partial aggregation:\n$plan")
  }

  test("withRunningSums reads NULL values as 0 (carries prior totals across null prefixes)") {
    import spark.implicits._
    // slices get all-null PREFIXES by construction: low keys pair with
    // null values, so the first rows of early slices sum NULL locally —
    // the round-4 formulation emitted offset + NULL = NULL there, while
    // the global window carries the prior slices' total forward
    val df = (1 to 80).map { i =>
      val v: Option[Long] = if (i % 4 < 2) None else Some(i % 5L)
      (i.toLong, (i * 13 % 41).toDouble, v)
    }.toDF("id", "key", "v")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("key"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val viaWindow = df.withColumn("cum_v", sum(coalesce(col("v"), lit(0))).over(w))
    val viaDist = DistRank.withRunningSums(df,
      Seq((col("v"), "cum_v")), col("key"), col("id"))
    assert(viaDist.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaDist).isEmpty,
      "null-valued running sums diverged from the coalesced global window")
    assert(viaDist.filter(col("cum_v").isNull).count() == 0,
      "running sum emitted NULL for an all-null slice prefix")
  }

  test("withRunningSums equals the global-window cumulative sums, dirty keys included") {
    import spark.implicits._
    val df = (1 to 60).map { i =>
      val k: Option[Double] = i % 9 match {
        case 0 => None
        case 1 => Some(Double.NaN)
        case _ => Some((i * 31 % 17).toDouble)
      }
      (i.toLong, k, i % 3L)
    }.toDF("id", "key", "v")
    Seq(col("key"), col("key").desc).foreach { order =>
      val w = org.apache.spark.sql.expressions.Window.orderBy(order, col("id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val viaWindow = df
        .withColumn("cum_v", sum(col("v")).over(w))
        .withColumn("cnt", sum(lit(1)).over(w))
      val viaDist = DistRank.withRunningSums(df,
        Seq((col("v"), "cum_v"), (lit(1), "cnt")), order, col("id"))
      assert(viaDist.exceptAll(viaWindow).isEmpty &&
        viaWindow.exceptAll(viaDist).isEmpty,
        s"running sums diverged for order $order")
    }
  }

  test("property: rank and running sums equal the window on seeded RANDOM dirty frames") {
    import spark.implicits._
    // heavy duplication (7-value key space), nulls, NaNs, random sizes
    // across several seeds — boundary placement lands INSIDE duplicate
    // runs and degenerate slices by construction, which the fixed test
    // table cannot force
    Seq(5, 17, 91).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 40 + rnd.nextInt(200)
      val rows = (1 to n).map { i =>
        val k: Option[Double] = rnd.nextInt(10) match {
          case 0 => None
          case 1 => Some(Double.NaN)
          case d => Some((d % 7).toDouble)
        }
        (i.toLong, k, rnd.nextInt(5).toLong)
      }
      val df = rows.toDF("id", "key", "v")
      Seq(col("key"), col("key").desc).foreach { order =>
        val w = org.apache.spark.sql.expressions.Window.orderBy(order, col("id"))
        val viaWindow = df.withColumn("rank", row_number().over(w).cast("long"))
        val viaDist = DistRank.withGlobalRank(df, "rank", order, col("id"))
        assert(viaDist.exceptAll(viaWindow).isEmpty &&
          viaWindow.exceptAll(viaDist).isEmpty,
          s"rank diverged (seed $seed, order $order)")
        val wf = w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
        val sumWindow = df.withColumn("cum_v", sum(col("v")).over(wf))
        val sumDist = DistRank.withRunningSums(df,
          Seq((col("v"), "cum_v")), order, col("id"))
        assert(sumDist.exceptAll(sumWindow).isEmpty &&
          sumWindow.exceptAll(sumDist).isEmpty,
          s"running sums diverged (seed $seed, order $order)")
      }
    }
  }

  test("withGlobalRank and withRunningSums handle EMPTY input (no offsets, no NPE)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double, Long)].toDF("id", "key", "v")
    assert(DistRank.withGlobalRank(empty, "rank", col("key"), col("id")).count() == 0)
    val (cum, totals) = DistRank.withRunningSumsAndTotals(empty,
      Seq((col("v"), "cum_v")), col("key"), col("id"))
    assert(cum.count() == 0)
    // the totals frame still yields one well-typed zero row (coalesce),
    // so CDF normalizers over an empty slice don't propagate NULL
    val t = totals.collect()
    assert(t.length == 1 && t.head.getLong(0) == 0L)
  }

  test("ml_ks_statistic_dist equals ml_ks_statistic; ml_auc_pr_dist equals ml_auc_pr") {
    assert(DistRank.mlKsStatisticDist(spark, TestSpark.sf).collect().map(_.toSeq).toSeq ==
      graft.ml.Ml4.mlKsStatistic(spark, TestSpark.sf).collect().map(_.toSeq).toSeq)
    assert(DistRank.mlAucPrDist(spark, TestSpark.sf).collect().map(_.toSeq).toSeq ==
      graft.ml.Ml4.mlAucPr(spark, TestSpark.sf).collect().map(_.toSeq).toSeq)
  }

  test("ml_roc_auc_dist equals ml_roc_auc") {
    val a = DistRank.mlRocAucDist(spark, TestSpark.sf).collect()
    val b = graft.ml.Metrics.mlRocAuc(spark, TestSpark.sf).collect()
    assert(a.map(_.toSeq).sameElements(b.map(_.toSeq)))
  }

  test("f_quantile_bucket_dist equals f_quantile_bucket") {
    val a = DistRank.fQuantileBucketDist(spark, TestSpark.sf)
    val b = graft.ops.Features.fQuantileBucket(spark, TestSpark.sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
