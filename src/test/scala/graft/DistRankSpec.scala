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
