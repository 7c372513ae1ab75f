package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Features

class FeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("f_null_safe_ratio is null exactly where discount is zero") {
    val li = graft.tables.Tables.lineitem(spark, sf)
    val zeroDisc = li.filter(col("l_discount") === 0.0).count()
    val nulls = Features.fNullSafeRatio(spark, sf)
      .filter(col("qty_disc_ratio").isNull).count()
    assert(nulls == zeroDisc)
  }

  test("f_drop_nulls drops exactly the null-ratio rows") {
    val total = graft.tables.Tables.lineitem(spark, sf).count()
    val zeroDisc = graft.tables.Tables.lineitem(spark, sf)
      .filter(col("l_discount") === 0.0).count()
    assert(Features.fDropNulls(spark, sf).count() == total - zeroDisc)
  }

  test("f_describe emits one row per profiled column") {
    val rows = Features.fDescribe(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("l_quantity", "l_extendedprice", "l_discount"))
  }

  test("f_standard_scale output has ~zero mean and ~unit variance") {
    val stats = Features.fStandardScale(spark, sf)
      .agg(avg("qty_scaled").as("m"), stddev("qty_scaled").as("s")).head()
    assert(math.abs(stats.getDouble(0)) < 0.01)
    assert(math.abs(stats.getDouble(1) - 1.0) < 0.01)
  }

  test("f_train_test_split is deterministic and ~80/20") {
    val m = Features.fTrainTestSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val frac = m("train").toDouble / (m("train") + m("test"))
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    val m2 = Features.fTrainTestSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == m2)
  }

  test("f_minmax_scale stays within [0, 1]") {
    val mm = Features.fMinmaxScale(spark, sf)
      .agg(min("price_norm"), max("price_norm")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("f_quantile_bucket buckets are near-equal sized") {
    val counts = Features.fQuantileBucket(spark, sf)
      .groupBy("price_bucket").count().collect()
      .map(_.getLong(1))
    assert(counts.length == 4)
    assert(counts.max - counts.min <= 1)
  }

  test("f_impute_mean has no nulls") {
    assert(Features.fImputeMean(spark, sf)
      .filter(col("ratio_imputed").isNull).count() == 0)
  }
}
