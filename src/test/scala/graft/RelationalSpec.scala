package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    // the full suite drives 140 queries through one JVM; a GC pause
    // during an MLlib parallel fit can blow the 300s default
    s.conf.set("spark.sql.broadcastTimeout", "1200")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import graft.ops.Relational
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs non-empty on sf0.001") {
    // one retry per query, for CLASSIFIED-TRANSIENT failures only (see
    // Verify.isTransient): a broadcast/GC hiccup deep into the 140-query
    // sweep is not a correctness signal, but anything else fails
    // immediately — a blanket retry would mask nondeterministic bugs.
    def runCount(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Long =
      try fn(spark, TestSpark.sf).count()
      catch {
        case e: Throwable if Verify.isTransient(e) =>
          info(s"query $name retried after transient failure: ${e.getMessage}")
          try fn(spark, TestSpark.sf).count()
          catch { case e2: Throwable => fail(s"query $name threw twice: ${e2.getMessage}") }
        case e: Throwable =>
          fail(s"query $name threw (non-transient, not retried): ${e.getMessage}")
      }
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (runCount(name, fn) == 0) Some(name) else None
    }
    assert(bad.isEmpty, s"queries returned no rows: ${bad.mkString(", ")}")
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("the rows-only set is EXACTLY the declared sketch/iterative-fit tail") {
    // every contract query must carry an oracle UNLESS it is one of the
    // seven declared rows-only entries (HLL and GK sketches whose exact
    // twins exist, and the four multi-iteration MLlib fits each paired
    // with an exact oracled twin) — a new query landing without an
    // oracle fails HERE, not silently in the driver report
    val declared = Set("q_approx_distinct", "q_approx_quantile",
      "q_incremental_distinct",
      "ml_logreg", "ml_linear_svc", "ml_gbt", "ml_cv_grid", "ml_model_select")
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual == declared,
      s"rows-only drift: undeclared ${actual -- declared}, stale ${declared -- actual}")
  }

  test("q_agg_pricing groups are complete and counts sum to table size") {
    val df = Relational.qAggPricing(spark, TestSpark.sf)
    val total = df.agg(org.apache.spark.sql.functions.sum("n_rows")).head().getLong(0)
    val raw = graft.tables.Tables.lineitem(spark, TestSpark.sf).count()
    assert(total == raw)
  }

  test("q_semi_anti partitions orders exactly") {
    val df = Relational.qSemiAnti(spark, TestSpark.sf).collect()
    val total = df.map(_.getAs[Long]("n_orders")).sum
    assert(total == graft.tables.Tables.orders(spark, TestSpark.sf).count())
  }

  test("q_upsert_latest yields one row per user") {
    val df = Relational.qUpsertLatest(spark, TestSpark.sf)
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("q_window_pit first row per supplier has qty_before 0") {
    import org.apache.spark.sql.functions._
    val df = Relational.qWindowPit(spark, TestSpark.sf)
    val firsts = df.groupBy("l_suppkey").agg(min(struct(col("l_orderkey"), col("l_linenumber"))).as("f"))
    // at least: global min qty_before is 0.0
    assert(df.agg(min("qty_before")).head().getDouble(0) == 0.0)
  }

  test("q_topk returns exactly 10 descending") {
    val rows = Relational.qTopK(spark, TestSpark.sf).collect()
    assert(rows.length == 10)
    val bals = rows.map(_.getAs[Double]("acctbal"))
    assert(bals.sameElements(bals.sorted(Ordering[Double].reverse)))
  }
}

class AsOfSpec extends AnyFunSuite {
  import org.apache.spark.sql.functions._
  lazy val spark = TestSpark.spark

  test("q_asof_join: prior view is strictly before the purchase") {
    val events = graft.tables.Tables.events(spark, TestSpark.sf)
    val purchases = events.filter(col("event_type") === "purchase").count()
    val df = graft.ops.AsOf.qAsofJoin(spark, TestSpark.sf)
    assert(df.count() == purchases) // left semantics: every probe row kept
  }

  test("asofJoin honors strict-before at equal timestamps") {
    import spark.implicits._
    val probe = Seq((1L, 100L, 9.9)).toDF("k", "t", "v")
    val build = Seq((1L, 100L, 1.0), (1L, 50L, 2.0)).toDF("k", "t", "v")
    val out = graft.ops.AsOf.asofJoin(probe, build, "k", "t", "v", "prior")
      .select("prior").head()
    // the ts=100 build row must NOT be visible; ts=50 wins
    assert(out.getDouble(0) == 2.0)
  }
}

class TopKPerKeySpec extends AnyFunSuite {
  import org.apache.spark.sql.functions._
  lazy val spark = TestSpark.spark

  test("q_topk_per_key: at most 3 per supplier, descending, matches window formulation") {
    val df = graft.plans.TopK.qTopKPerKey(spark, TestSpark.sf)
    val per = df.groupBy("l_suppkey").count().agg(max("count")).head().getLong(0)
    assert(per <= 3)
    // cross-check against the window-rank formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val windowed = graft.tables.Tables.lineitem(spark, TestSpark.sf)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("l_suppkey"), col("rank"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 4).as("price"))
      .orderBy("l_suppkey", "rank")
    assert(df.collect().map(_.toSeq).sameElements(windowed.collect().map(_.toSeq)))
  }
}

class AsOfNativeSpec extends AnyFunSuite {
  import org.apache.spark.sql.functions._
  lazy val spark = TestSpark.spark

  test("native AsOfJoinExec equals the composed asofJoin formulation") {
    val events = graft.tables.Tables.events(spark, TestSpark.sf)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    val composed = graft.ops.AsOf
      .asofJoin(purchases, views, "user_id", "ts", "value", "prior")
      .select("user_id", "event_id", "prior").orderBy("user_id", "event_id")
      .collect().map(_.toSeq)
    val native = graft.plans.AsOfJoinNative
      .asofJoin(purchases, views, "user_id", "ts", "value", "prior")
      .select("user_id", "event_id", "prior").orderBy("user_id", "event_id")
      .collect().map(_.toSeq)
    assert(native.nonEmpty)
    assert(native.sameElements(composed))
  }

  test("native AsOfJoinExec strict-before at equal timestamps") {
    import spark.implicits._
    val probe = Seq((1L, 100L, 9.9)).toDF("k", "t", "v")
    val build = Seq((1L, 50L, 2.0), (1L, 100L, 1.0)).toDF("k", "t", "v")
    val out = graft.plans.AsOfJoinNative.asofJoin(probe, build, "k", "t", "v", "prior")
      .select("prior").head()
    assert(out.getDouble(0) == 2.0)
  }

  test("native AsOfJoinExec emits null when no earlier build row exists") {
    import spark.implicits._
    val probe = Seq((1L, 10L, 9.9), (2L, 10L, 8.8)).toDF("k", "t", "v")
    val build = Seq((1L, 99L, 2.0)).toDF("k", "t", "v")
    val rows = graft.plans.AsOfJoinNative.asofJoin(probe, build, "k", "t", "v", "prior")
      .orderBy("k").select("prior").collect()
    assert(rows.forall(_.isNullAt(0)))
  }
}
