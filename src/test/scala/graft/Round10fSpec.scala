package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphAnn

/** Round-10 directive #3 witnesses: incremental maintenance of the
  * graph index (`ann_graph_append`) — E12/E13's append/gate discipline
  * applied to the NN-descent edge artifact. Pinned: the append never
  * touches the base generation's files; the contract (unshifted) delta
  * clears the staleness gate; a constructed distribution-shifted delta
  * trips it and the full-rebuild branch restores recall.
  */
class Round10fSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def embFrame(n: Int)(gen: Long => Array[Float]) =
    (0L until n.toLong).map(id => (id, gen(id).toSeq)).toDF("vec_id", "embedding")

  test("append writes a separate file set; base generation stays byte-identical") {
    val dir = TestSpark.sf
    GraphAnn.annGraphAppend(spark, dir).collect()
    val root = GraphAnn.appendRoots.get(s"$dir:3")
    def snapshot(sub: String): Map[String, (Long, Long)] =
      Option(new java.io.File(s"$root/$sub").listFiles).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length, f.lastModified)).toMap
    val baseBefore = snapshot("base")
    assert(baseBefore.nonEmpty, "no base edge files written")
    assert(snapshot("delta").nonEmpty, "no append edge files written")
    // re-running the whole append (fresh memo key via k=2) must leave
    // the ORIGINAL base generation untouched on disk
    GraphAnn.annGraphAppend(spark, dir, k = 2).collect()
    assert(snapshot("base") == baseBefore,
      "base generation files changed across an append run")
  }

  test("the contract (unshifted) delta clears the gate — serving stays incremental") {
    val dir = TestSpark.sf
    GraphAnn.annGraphAppend(spark, dir).collect()
    val (hits, truth, stale) = GraphAnn.appendStats.get(s"$dir:3")
    info(s"contract gate: $hits/$truth stale=$stale")
    assert(!stale,
      s"unshifted contract delta tripped the gate: $hits/$truth")
    assert(hits * 100L >= GraphAnn.appendThresholdPct * truth)
  }

  test("a distribution-shifted delta trips the gate; the rebuild branch restores recall") {
    val rng = new scala.util.Random(7)
    val offs = Array.fill(400, 64)((rng.nextDouble() * 0.02).toFloat)
    // base near +0.5 with per-id offsets; delta (%10==7) a DISJOINT
    // tight cluster near -0.5 — its members' true neighbors are each
    // other, but the appended graph reaches the cluster only through
    // the few reverse slots of the base nodes nearest to it
    val shifted = embFrame(400) { id =>
      if (id % 10 == 7) Array.tabulate(64)(d => -0.5f + offs(id.toInt)(d) * 0.1f)
      else Array.tabulate(64)(d => 0.5f + offs(id.toInt)(d))
    }
    val isDelta = col("vec_id") % 10 === 7
    val ab = GraphAnn.appendPipeline(shifted, isDelta, "r10f.shifted")
    info(s"shifted gate: ${ab.hits}/${ab.truth} stale=${ab.stale}")
    assert(ab.stale,
      s"shifted delta did NOT trip the gate: ${ab.hits}/${ab.truth}")
    // the decision is right: a full rebuild (what the stale branch
    // serves) recovers the cluster — rebuild includes delta↔delta
    // edges, so the same probes' serve recall rises above the gate
    val fullEdges = GraphAnn.buildEdgesFrom(shifted, "r10f.shifted.full")
    val tkAll = shifted.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => floor(x * lit(1000000.0) + lit(0.5)).cast("long")).as("tv"))
      .localCheckpoint()
    // the rebuild regenerates entries from the full corpus (the spec
    // that motivated the engine's stale-branch entry re-derivation:
    // base-medoid entries served 0/120 over the very same rebuilt edges)
    val fullProbes = GraphAnn.entriesFrom(shifted, shifted.filter(isDelta))
    val (pool, _) = GraphAnn.greedyPoolFrom(fullEdges, fullProbes, tkAll, 64)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d"), col("nid"))
    val served3 = pool.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 3).select("qid", "nid")
    val qarr = tkAll.filter(isDelta)
      .select(col("vec_id").as("qid"), col("tv").as("qv"))
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d2"), col("nid"))
    val exact3 = tkAll.select(col("vec_id").as("nid"), col("tv"))
      .crossJoin(broadcast(qarr))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        graft.functions.VectorOps.intSqDist(col("qv"), col("tv")).as("d2"))
      .withColumn("_rn", row_number().over(wt)).filter(col("_rn") <= 3)
      .select("qid", "nid").localCheckpoint()
    val hits2 = exact3.join(served3, Seq("qid", "nid")).count()
    val truth2 = exact3.count()
    info(s"rebuilt-serve gate replay: $hits2/$truth2")
    assert(hits2 * ab.truth > ab.hits * truth2,
      s"rebuild did not improve recall: $hits2/$truth2 vs ${ab.hits}/${ab.truth}")
    assert(hits2 * 100L >= GraphAnn.appendThresholdPct * truth2,
      s"rebuilt recall still below the gate: $hits2/$truth2")
  }

  test("append cost scales with the delta: delta out-degree is bounded by the build degree") {
    val dir = TestSpark.sf
    GraphAnn.annGraphAppend(spark, dir).collect()
    val root = GraphAnn.appendRoots.get(s"$dir:3")
    val app = spark.read.parquet(s"$root/delta")
    // appended DELTA nodes carry at most `degree` out-edges; reverse
    // slots give base nodes at most `degree` extra out-edges
    val maxOut = app.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxOut <= 12L, s"append produced out-degree $maxOut > degree")
    // every delta vector got attached (out-degree >= 1)
    val nDelta = graft.tables.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 10 === 7).count()
    val attached = app.filter(col("src") % 10 === 7)
      .select("src").distinct().count()
    assert(attached == nDelta, s"$attached of $nDelta delta vectors attached")
  }
}
