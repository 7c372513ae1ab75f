package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.ops.{Dedup, Redact}

/** Round-15 optimization pins — each test freezes the VALUE equality (or
  * the plan property) an r15 optimization rests on:
  *  - JaccardSim (fused native) ≡ composed array_intersect/array_union
  *  - RedactCascade (fused native) ≡ composed six-pass regex chain
  *  - admissionOver's o-side semi-join prune is result-invisible
  *  - upsertBatches lays out exactly what sequential upsertBatch does
  *  - pagerankRounds' per-round localCheckpoint keeps the plan bounded
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  private def composedJaccard(a: org.apache.spark.sql.Column,
                              b: org.apache.spark.sql.Column) =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  test("JaccardSim equals composed intersect/union bit-for-bit on adversarial arrays") {
    // dups, empties, null elements, disjoint, identical, both-empty (NaN)
    val edge = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("b", "b", "a")),
      (Seq(""), Seq("", "x")),
      (Seq("x"), Seq("y")),
      (Seq("x", "y"), Seq("x", "y")),
      // NOTE both-empty is excluded: union size 0 makes the COMPOSED
      // double divide throw under ANSI (the fused form returns NaN).
      // No declared query can reach it — shingled()/grams always emit
      // ≥1 element — and the divergence is error-vs-NaN, never a value.
      (Seq.empty[String], Seq("a")),
      (Seq("a", null, "b"), Seq("b", null)),
      (Seq(null, null), Seq("a")),
      (Seq("ü", "日本", "🎉"), Seq("日本", "ü", "z"))
    ).toDF("a", "b")
    val rows = edge.select(
      VectorOps.jaccardSim(col("a"), col("b")).as("fused"),
      composedJaccard(col("a"), col("b")).as("composed")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"fused ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
  }

  test("JaccardSim equals the composed form on real corpus shingle pairs") {
    val sh = Dedup.shingled(graft.tables.Tables.documents(spark, sf))
    val pairs = sh.limit(40).select(col("shingles").as("sh_a"))
      .crossJoin(sh.limit(40).select(col("shingles").as("sh_b")))
    val rows = pairs.select(
      VectorOps.jaccardSim(col("sh_a"), col("sh_b")).as("fused"),
      composedJaccard(col("sh_a"), col("sh_b")).as("composed")).collect()
    assert(rows.length == 1600)
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"fused ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
  }

  test("RedactCascade equals the composed six-pass chain per row") {
    val texts = Seq(
      "reach user1@example.com and user2@foo.bar now",
      "call +1 (415) 555-0000 or +44 20 7946 0958 then acct 123456789012",
      "digits 123456789 and 987654321012345 mixed a@b.cc",
      "no pii here $dollar \\backslash ${group} $1 `quote`",
      "email-with-digits 12345a@b.io6789 then +999123456789",
      "",
      "just text",
      "edge +1 415 555 9999888877 end",
      "unicode préfix ü@exämple.com 日本語 123456789",
      "a@b.cc a@b.cc a@b.cc",
      "+12 34567 8 90 12 345",
      "999999999999999999999999999")
    val df = texts.toDF("t")
    val (cf, rf) = Redact.redactCols(col("t"))
    val (cc, rc) = Redact.redactColsComposed(col("t"))
    val rows = df.select(
      (cf.map(_._2) :+ rf) ++ (cc.map(_._2) :+ rc): _*).collect()
    rows.foreach { r =>
      (0 until 3).foreach { i =>
        assert(r.getInt(i) == r.getInt(i + 4),
          s"count $i fused ${r.getInt(i)} != composed ${r.getInt(i + 4)} in $r")
      }
      assert(r.getString(3) == r.getString(7),
        s"redacted '${r.getString(3)}' != composed '${r.getString(7)}'")
    }
  }

  test("RedactCascade matches the composed chain on the injected contract corpus") {
    val dirty = graft.tables.Tables.documents(spark, sf)
      .select(Redact.injectCol(col("text"), col("doc_id")).as("t"))
    val (cf, rf) = Redact.redactCols(col("t"))
    val (cc, rc) = Redact.redactColsComposed(col("t"))
    val fused = cf.map { case (n, c) => c.as(s"n_$n") } :+ rf.as("redacted")
    val comp = cc.map { case (n, c) => c.as(s"n_${n}_c") } :+ rc.as("redacted_c")
    val diff = dirty.select(fused ++ comp: _*)
      .filter(Redact.patterns.map { case (n, _, _) =>
        col(s"n_$n") =!= col(s"n_${n}_c") }.reduce(_ || _) ||
        col("redacted") =!= col("redacted_c"))
    assert(diff.isEmpty, "fused and composed cascade disagree on the contract corpus")
  }

  test("admissionOver o-side semi-join prune is result-invisible (D13 vs unpruned replay)") {
    // the unpruned replay: D13's admission with the o-side shingling the
    // FULL corpus — the pre-r15 plan. Verdicts must be row-identical.
    val docs = graft.tables.Tables.documents(spark, sf)
    val sigs = graft.ops.HotBucket.saltByCap(Dedup.bandSignatures(spark, sf),
      Seq("band", "sig"), col("doc_id"), s"d2.bandSigs:$sf:32:8")
    val probe = sigs.filter(col("doc_id") % 10 === 0)
      .select(col("band"), col("sig"), col("salt"), col("doc_id").as("d"))
    val index = sigs.select(col("band"), col("sig"), col("salt"), col("doc_id").as("o"))
    val cands = probe.join(index, Seq("band", "sig", "salt"))
      .filter(col("o") =!= col("d"))
      .select("d", "o").distinct()
    val unpruned = cands
      .join(Dedup.shingled(docs.filter(col("doc_id") % 10 === 0))
        .select(col("doc_id").as("d"), col("shingles").as("sh_d")), "d")
      .join(Dedup.shingled(docs)
        .select(col("doc_id").as("o"), col("shingles").as("sh_o")), "o")
      .select(col("d"), composedJaccard(col("sh_d"), col("sh_o")).as("jaccard"))
      .groupBy("d")
      .agg(count(lit(1)).as("n_candidates"),
        count(when(col("jaccard") >= 0.5, 1)).as("n_near_dups"))
    val expected = docs.filter(col("doc_id") % 10 === 0).select("doc_id")
      .join(unpruned.withColumnRenamed("d", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        when(coalesce(col("n_near_dups"), lit(0L)) > 0, lit("reject"))
          .otherwise(lit("admit")).as("verdict"))
    val got = SparkEntry.queries("dedup_incremental")(spark, sf)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "pruned admission diverged from the unpruned replay")
  }

  test("dedup_incremental plan shingles the o-side under a candidate semi-join") {
    val df = SparkEntry.queries("dedup_incremental")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the prune is a LeftSemi join on doc_id feeding the o-side shingle
    // projection — its presence is the plan-level difference the r14
    // no-op lacked (node trees were identical there; here a new join
    // type appears)
    assert(plan.contains("LeftSemi"),
      s"expected a LeftSemi candidate prune in the admission plan:\n$plan")
  }

  test("upsertBatches lays out exactly what sequential upsertBatch calls do") {
    val a = Scratch.dir("r15_batches_oneshot")
    val b = Scratch.dir("r15_batches_seq")
    val orders = graft.tables.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus").limit(500)
    graft.sources.Sources.upsertBatches(Seq(
      orders.withColumn("o_orderstatus", lit("PENDING")) -> 1L,
      orders -> 2L), a)
    graft.sources.Sources.upsertBatch(
      orders.withColumn("o_orderstatus", lit("PENDING")), b, 1L)
    graft.sources.Sources.upsertBatch(orders, b, 2L)
    assert(graft.sources.Sources.committedIds(a) ==
      graft.sources.Sources.committedIds(b))
    val da = spark.read.parquet(a)
    val db = spark.read.parquet(b)
    assert(da.exceptAll(db).isEmpty && db.exceptAll(da).isEmpty,
      "one-shot seeding diverged from sequential upserts")
  }

  test("pagerankRounds keeps the 3-round plan bounded (per-round localCheckpoint)") {
    val pr = SparkEntry.queries("graph_pagerank_iter")(spark, sf)
    val planLines = pr.queryExecution.executedPlan.toString.linesIterator.size
    // pre-r15 the lazy 3-round lineage exploded to a 16.4k-line plan
    // (six round-step subtrees); with per-round checkpoints it is ~2.8k
    // (one round-step + the cached edge frame's lineage print). Generous
    // ceiling — the point is the ORDER of magnitude, not the exact count.
    assert(planLines < 6000,
      s"graph_pagerank_iter plan has $planLines lines — lineage truncation lost")
    // and the ranks are still exactly the unrolled integer recurrence
    // (the oracle pins this too; here we just re-assert non-degeneracy)
    val out = pr.collect()
    assert(out.nonEmpty)
  }
}
