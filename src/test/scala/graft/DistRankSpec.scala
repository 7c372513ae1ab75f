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

  test("distributed rank plan range-partitions instead of single-partition sorting") {
    val o = graft.tables.Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice")
    val df = DistRank.withGlobalRank(o, "rank",
      col("o_totalprice"), col("o_orderkey"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"expected a range repartition in:\n$plan")
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
