package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-3 operators (SURVEY.md §2 A26-A30, B13-B14,
  * C12, F6). Oracle hash-matching is the driver's gate; these pin the
  * semantic properties that survive refactors.
  */
class Round3Spec extends AnyFunSuite {
  import graft.ops.{Features2, Relational2, Relational3, Text2}
  lazy val spark = TestSpark.spark
  lazy val sf = TestSpark.sf

  test("q_grouping_sets: grand-total row matches orders, levels are consistent") {
    val gs = Relational3.qGroupingSets(spark, sf).collect()
    val nOrders = graft.tables.Tables.orders(spark, sf).count()
    val grand = gs.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1 && grand.head.getLong(2) == nOrders)
    // per-status rows (priority=ALL) partition the grand total
    val perStatus = gs.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    assert(perStatus.map(_.getLong(2)).sum == nOrders)
    // finest level partitions each status row
    val fine = gs.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    assert(fine.map(_.getLong(2)).sum == nOrders)
  }

  test("q_skew_salt_join: salting is result-invisible (equals the plain join)") {
    import graft.tables.Tables
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg((sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")) / 10000.0).as("revenue"),
        count(lit(1)).as("n"))
    val salted = Relational3.qSkewSaltJoin(spark, sf)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q_lead_lag: every user has n_gaps = n_events - 1") {
    val bad = Relational3.qLeadLag(spark, sf)
      .filter(col("n_gaps") =!= col("n_events") - 1)
    assert(bad.isEmpty)
    val total = Relational3.qLeadLag(spark, sf).agg(sum("n_events")).head.getLong(0)
    assert(total == graft.tables.Tables.events(spark, sf).count())
  }

  test("q_date_spine: contiguous daily coverage, counts preserved") {
    val spine = Relational3.qDateSpine(spark, sf)
    val n = spine.count()
    val bounds = spine.agg(min("day"), max("day"), sum("n_orders")).head
    val days = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(bounds.getString(0)),
      java.time.LocalDate.parse(bounds.getString(1))) + 1
    assert(n == days, s"spine has $n rows for $days calendar days")
    assert(bounds.getLong(2) == graft.tables.Tables.orders(spark, sf).count())
  }

  test("q_scd2: one open interval per user, consecutive states differ, intervals chain") {
    val scd = Relational3.qScd2(spark, sf).cache()
    val users = scd.select("user_id").distinct().count()
    assert(scd.filter(col("valid_to_us").isNull).count() == users)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from_us", "event_id")
    val withNext = scd
      .withColumn("next_state", lead("state", 1).over(w))
      .withColumn("next_from", lead("valid_from_us", 1).over(w))
    assert(withNext.filter(col("next_state").isNotNull &&
      col("next_state") === col("state")).isEmpty, "consecutive equal states survived")
    assert(withNext.filter(col("next_from").isNotNull &&
      col("valid_to_us") =!= col("next_from")).isEmpty, "validity intervals don't chain")
    scd.unpersist()
  }

  test("f_robust_scale: median row scales to zero, row count preserved") {
    val r = Features2.fRobustScale(spark, sf).cache()
    val e = graft.tables.Tables.events(spark, sf)
    assert(r.count() == e.count())
    // the row holding each group's p50 value must map to exactly 0.0
    assert(r.filter(col("value_robust") === 0.0).count() >= 5)
    r.unpersist()
  }

  test("f_count_encode: encoded count equals the group's true cardinality") {
    val enc = Features2.fCountEncode(spark, sf)
    val truth = graft.tables.Tables.customer(spark, sf)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("true_n"))
    val bad = enc.join(truth, Seq("c_mktsegment"))
      .filter(col("seg_n") =!= col("true_n"))
    assert(bad.isEmpty)
  }

  test("ml_naive_bayes: total coverage, valid classes, deterministic across runs") {
    val nb1 = graft.ml.NaiveBayes.mlNaiveBayes(spark, sf)
    val nb2 = graft.ml.NaiveBayes.mlNaiveBayes(spark, sf)
    val docs = graft.tables.Tables.documents(spark, sf)
    assert(nb1.count() == docs.count())
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(nb1.select("pred_lang").distinct().collect()
      .map(_.getString(0)).forall(langs))
    assert(nb1.exceptAll(nb2).isEmpty && nb2.exceptAll(nb1).isEmpty)
  }

  test("text_tfidf: at most 3 terms per doc, df bounded by corpus size") {
    val t = Text2.textTfidf(spark, sf).cache()
    val n = graft.tables.Tables.documents(spark, sf).count()
    assert(t.groupBy("doc_id").count().filter(col("count") > 3).isEmpty)
    assert(t.filter(col("df") > n || col("df") < 1).isEmpty)
    assert(t.filter(col("tfidf_q") < col("tf")).isEmpty,
      "quantized score below tf implies df > 1e6*N — impossible")
    t.unpersist()
  }

  test("q_bloom_prejoin: equals the plain semi join, and the bloom actually prunes") {
    import graft.tables.Tables
    import graft.functions.Bloom
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = Tables.lineitem(spark, sf)
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
    val bloomed = Relational3.qBloomPrejoin(spark, sf)
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
    // the pre-filter must prune most non-matching fact rows (~4/5 here);
    // generous bound to stay robust to bloom false-positive rates
    val bloomBytes = dim.agg(Bloom.bloomAgg(col("o_orderkey")).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val li = Tables.lineitem(spark, sf)
    val kept = li.filter(Bloom.mightContain(lit(bloomBytes), col("l_orderkey"))).count()
    assert(kept < li.count() * 2 / 3, s"bloom kept $kept of ${li.count()} rows")
  }

  test("f_stratified_sample: exactly k per class (or the whole class), deterministic") {
    val s1 = Features2.fStratifiedSample(spark, sf)
    val s2 = Features2.fStratifiedSample(spark, sf)
    val classSizes = graft.tables.Tables.documents(spark, sf)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    classSizes.foreach { case (lang, n) =>
      assert(sampled(lang) == math.min(20L, n), s"$lang: ${sampled.get(lang)}")
    }
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }

  test("q_sql_api: SQL-string formulation matches the DataFrame formulation") {
    import graft.tables.Tables
    val sql = Relational3.qSqlApi(spark, sf)
    val df = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .filter(col("c_mktsegment") === "BUILDING" &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .groupBy(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .agg((sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")).cast("double") / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
    assert(sql.collect().map(_.toSeq).sameElements(df.collect().map(_.toSeq)))
  }

  test("q_dq_checks: planted dupes detected, clean constraints report zero") {
    import graft.ops.Quality
    val checks = Quality.qDqChecks(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(checks.size == 6)
    // the generator plants duplicate (l_orderkey, l_linenumber) rows
    assert(checks("lineitem_duplicate_line") > 0)
    // quantities are generated in [1, 50] and totals are positive
    assert(checks("lineitem_qty_out_of_range") == 0)
    assert(checks("orders_nonpositive_total") == 0)
  }

  test("q_forward_fill: no null after first valid reading, values carried verbatim") {
    import graft.ops.Quality
    val ff = Quality.qForwardFill(spark, sf)
    // once a reading exists for a user, reading_filled is never null again
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val bad = ff.withColumn("seen", count("reading").over(w))
      .filter(col("seen") > 0 && col("reading_filled").isNull)
    assert(bad.isEmpty)
    // non-gap rows pass their own reading through unchanged
    assert(ff.filter(col("reading").isNotNull &&
      col("reading_filled") =!= col("reading")).isEmpty)
    // filled values only ever come from the reading domain
    val domain = ff.select(col("reading")).na.drop().distinct()
    val filled = ff.select(col("reading_filled").as("reading")).na.drop().distinct()
    assert(filled.exceptAll(domain).isEmpty)
  }

  test("q_rank_funcs: ranks span [0,1], quartiles balanced within 1") {
    import graft.ops.Relational4
    val r = Relational4.qRankFuncs(spark, sf)
    val g = r.groupBy("o_orderpriority")
      .agg(min("pct_rank").as("lo"), max("pct_rank").as("hi"), max("cume").as("cd"))
    assert(g.filter(col("lo") =!= 0.0 || col("hi") =!= 1.0 || col("cd") =!= 1.0).isEmpty)
    val q = r.groupBy("o_orderpriority", "quartile").count()
      .groupBy("o_orderpriority").agg((max("count") - min("count")).as("spread"))
    assert(q.filter(col("spread") > 1).isEmpty)
  }

  test("q_histogram: counts partition the table, bounds inside the bucket") {
    import graft.ops.Relational4
    val h = Relational4.qHistogram(spark, sf)
    assert(h.agg(sum("n")).head.getLong(0) ==
      graft.tables.Tables.orders(spark, sf).count())
    val bad = h.filter(col("min_cents") < col("bucket") * 2000000L ||
      col("max_cents") >= (col("bucket") + 1) * 2000000L)
    assert(bad.isEmpty)
  }

  test("q_percentile_disc and f_robust_scale agree on p25/p50") {
    // both derive the same discrete quantiles — cross-check the cut tables
    val pd = Relational2.qPercentileDisc(spark, sf)
      .select("event_type", "p25", "p50").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val zeroAtMedian = Features2.fRobustScale(spark, sf)
      .select("event_id", "value_robust")
      .join(graft.tables.Tables.events(spark, sf), Seq("event_id"))
      .filter(col("value_robust") === 0.0)
    // every event whose raw value IS the group median scales to zero
    pd.foreach { case (et, (_, p50)) =>
      assert(zeroAtMedian.filter(col("event_type") === et &&
        col("value") === p50).count() >= 1, s"median row of $et not at 0")
    }
  }
}
