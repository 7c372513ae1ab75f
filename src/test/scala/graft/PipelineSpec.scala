package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity, Text}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  lazy val nDocs = graft.tables.Tables.documents(spark, sf).count()
  lazy val nVecs = graft.tables.Tables.embeddings(spark, sf).count()

  test("dedup_exact keeps every distinct text") {
    val df = Dedup.dedupExact(spark, sf)
    assert(df.count() <= nDocs)
    val copies = df.agg(sum("n_copies")).head().getLong(0)
    assert(copies == nDocs)
  }

  test("dedup_pipeline output is a quality-filtered, dedup-consistent subset") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Pipeline.corpusClean(spark, sf)
    val docs = graft.tables.Tables.documents(spark, sf)
    assert(out.count() > 0)
    // every survivor passed the quality gate
    val badLen = out.join(docs, "doc_id").filter(col("n_chars") < 100).count()
    assert(badLen == 0)
    // no two survivors are ≥0.5-Jaccard near-dups
    val pairs = graft.ops.Dedup.minhashCandidatePairs(spark, sf)
      .filter(col("jaccard") >= 0.5)
    val survPairs = pairs
      .join(out.select(col("doc_id").as("a")), Seq("a"), "left_semi")
      .join(out.select(col("doc_id").as("b")), Seq("b"), "left_semi")
      .count()
    assert(survPairs == 0, s"$survPairs near-dup pairs survived")
  }

  test("dedup_minhash_lsh covers every doc and counts are sane") {
    val df = Dedup.dedupMinhashLsh(spark, sf)
    assert(df.count() == nDocs)
    assert(df.filter(col("n_near_dups") > col("n_candidates")).count() == 0)
  }

  test("dedup_simhash emits one 64-bit signature per doc") {
    val df = Dedup.dedupSimhash(spark, sf)
    assert(df.count() == nDocs)
    assert(df.select("simhash").distinct().count() > 1)
  }

  test("dedup_ngram_jaccard top pairs are ordered and in [0,1]") {
    val rows = Dedup.dedupNgramJaccard(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val js = rows.map(_.getAs[Double]("jaccard"))
    assert(js.forall(j => j >= 0.0 && j <= 1.0))
    assert(js.sameElements(js.sorted(Ordering[Double].reverse)))
  }

  test("dedup_embedding returns top cosine pairs from LSH buckets") {
    val rows = Dedup.dedupEmbedding(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos_sim")) <= 1.0))
  }

  test("ann_bruteforce returns k ranked neighbors per probe") {
    val df = Similarity.annBruteforce(spark, sf)
    val perProbe = df.groupBy("query_id").count().collect()
    assert(perProbe.nonEmpty)
    assert(perProbe.forall(_.getLong(1) == 5))
  }

  test("ann_lsh neighbors are a subset of candidates with recall vs brute force") {
    val bf = Similarity.annBruteforce(spark, sf)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annLsh(spark, sf)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    // bucketed search must agree with brute force on some neighbors
    assert((lsh intersect bf).nonEmpty)
  }

  test("ann_centroid_ivf returns ranked neighbors") {
    val df = Similarity.annCentroidIvf(spark, sf)
    assert(df.count() > 0)
    assert(df.filter(col("rank") > 5).count() == 0)
  }

  test("text_token_count positive for all docs") {
    val df = Text.textTokenCount(spark, sf)
    assert(df.count() == nDocs)
    assert(df.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("text_quality ratios within [0,1]") {
    val df = Text.textQuality(spark, sf)
    assert(df.filter(col("punct_ratio") < 0 || col("punct_ratio") > 1).count() == 0)
    assert(df.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
  }

  test("text_lang_id predicts a known language for every doc") {
    val df = Text.textLangId(spark, sf)
    assert(df.count() == nDocs)
    val langs = df.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr", "zh")))
  }

  test("text_fingerprint is unique per distinct text") {
    val df = Text.textFingerprint(spark, sf)
    assert(df.select("fingerprint").distinct().count() ==
      graft.tables.Tables.documents(spark, sf).select("text").distinct().count())
  }

  test("text_ngram_stats yields 20 trigrams, counts descending") {
    val rows = Text.textNgramStats(spark, sf).collect()
    assert(rows.length == 20)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sorted(Ordering[Long].reverse)))
    assert(rows.forall(_.getString(0).length == 3))
  }
}
