package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.HotBucket

/** Round-7 hardening: the hot-bucket guard for LSH-family candidate
  * joins. The adversarial case the contract data never produces: m
  * near-identical members landing in ONE bucket, where the plain
  * self-join builds m²/2 pairs in a single task. The guard must (a)
  * bound candidates to O(cap·m), (b) be bit-invisible below the cap,
  * and (c) salt independently-derived frames identically so probe/index
  * joins (D13/G15) still collide correctly.
  */
class Round7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val m = 2000
  private val cap = 64

  /** One hot bucket (band 0, sig 7) with m members, one cold bucket
    * (band 1, sig 9) with 10 — the band-signature shape D2/D13 join on.
    */
  private def sigs = {
    val hot = (0 until m).map(i => (0, 7L, i.toLong))
    val cold = (0 until 10).map(i => (1, 9L, (m + i).toLong))
    (hot ++ cold).toDF("band", "sig", "doc_id")
  }

  test("hotBuckets lists exactly the over-cap bucket with ceil(n/cap) groups") {
    val hot = HotBucket.hotBuckets(sigs, Seq("band", "sig"), cap)
    assert(hot.map(h => (h._1, h._2)) ==
      Seq((Seq(0, 7L), math.ceil(m.toDouble / cap).toInt)))
  }

  test("salt is 0 for every member of a below-cap bucket") {
    val salted = HotBucket.saltByCap(sigs, Seq("band", "sig"),
      col("doc_id"), site = "r7.cold", cap = cap)
    assert(salted.filter($"band" === 1 && $"salt" =!= 0).count() == 0)
  }

  test("guarded self-join builds O(cap·m) candidates where plain builds m²/2") {
    val salted = HotBucket.saltByCap(sigs, Seq("band", "sig"),
      col("doc_id"), site = "r7.hot", cap = cap)
    val l = salted.select($"band", $"sig", $"salt", $"doc_id".as("a"))
    val r = salted.select($"band", $"sig", $"salt", $"doc_id".as("b"))
    val guarded = l.join(r, Seq("band", "sig", "salt"))
      .filter($"a" < $"b").count()
    val plain = m.toLong * (m - 1) / 2 + 10L * 9 / 2
    // hash groups are uniform in expectation (group ≈ cap rows →
    // ≈ m·cap/2 pairs); 2·cap·m absorbs hash imbalance with room to
    // spare while staying ~8× under the plain join's m²/2
    assert(guarded <= 2L * cap * m,
      s"guarded join built $guarded pairs — the cap is not bounding the bucket")
    assert(guarded < plain / 4,
      s"guarded $guarded is not meaningfully below plain $plain")
    // the cold bucket is untouched: its 45 pairs are all present
    val coldPairs = l.join(r, Seq("band", "sig", "salt"))
      .filter($"a" < $"b" && $"band" === 1).count()
    assert(coldPairs == 45)
  }

  test("per-member candidates are capped (per-task bound, not just total)") {
    val salted = HotBucket.saltByCap(sigs, Seq("band", "sig"),
      col("doc_id"), site = "r7.perdoc", cap = cap)
    val l = salted.select($"band", $"sig", $"salt", $"doc_id".as("a"))
    val r = salted.select($"band", $"sig", $"salt", $"doc_id".as("b"))
    val maxPerDoc = l.join(r, Seq("band", "sig", "salt"))
      .filter($"a" =!= $"b")
      .groupBy("a").agg(count(lit(1)).as("n"))
      .agg(max("n")).head.getLong(0)
    // a member meets only its own hash group: ≈ cap in expectation;
    // 4× absorbs worst hash imbalance at this scale
    assert(maxPerDoc <= 4L * cap,
      s"one member still meets $maxPerDoc candidates — bucket not split")
  }

  test("independently salted derivations agree (probe/index consistency)") {
    val hot = HotBucket.memoHot(sigs, Seq("band", "sig"), "r7.consist", cap)
    // the probe side: a DIFFERENT frame (subset, different lineage)
    // salted against the index's hot list — D13/G15's shape
    val probe = sigs.filter($"doc_id" % 10 === 0)
      .withColumn("salt", HotBucket.saltCol(hot, Seq("band", "sig"), col("doc_id")))
    val index = sigs
      .withColumn("salt", HotBucket.saltCol(hot, Seq("band", "sig"), col("doc_id")))
    // every probe row's salt equals the index's salt for the same doc
    val joined = probe.select($"doc_id", $"salt".as("ps"))
      .join(index.select($"doc_id", $"salt".as("is")), "doc_id")
    assert(joined.filter($"ps" =!= $"is").count() == 0)
    // and a probe member still finds its own group's candidates
    val cands = probe.select($"band", $"sig", $"salt", $"doc_id".as("d"))
      .join(index.select($"band", $"sig", $"salt", $"doc_id".as("o")),
        Seq("band", "sig", "salt"))
      .filter($"d" =!= $"o")
    val perProbe = cands.groupBy("d").agg(count(lit(1)).as("n"))
    assert(perProbe.agg(min("n")).head.getLong(0) > 0,
      "a hot-bucket probe found no candidates — salt groups misaligned")
    assert(perProbe.agg(max("n")).head.getLong(0) <= 4L * cap)
  }

  test("contract corpus has NO hot bucket at ANY lossy-guard site — result-invisible by construction") {
    // the strongest below-threshold statement: at the default cap the
    // hot list is EMPTY for every LOSSY-variant site's real input, so
    // every salted join degenerates to the plain join (salt ≡ 0) and
    // the unchanged oracles stay exact. This closure is per SITE — the
    // sf0.1 sweep caught D3's 16-bit blocks violating exactly this
    // assumption (hence its move to the lossless triangle); any future
    // lossy site must prove its cold-corpus claim here — at EVERY
    // graded SF, not just the spec default: above the test SF the
    // salted join would silently diverge from the unchanged DuckDB
    // oracles if a bucket went hot only at the larger scale (exactly
    // how D3's structural hotness was caught), so each graded dir gets
    // its own emptiness audit.
    val testdataRoot = new java.io.File(TestSpark.sf).getParentFile
    val gradedSfs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => new java.io.File(testdataRoot, s).getPath)
      .filter(d => new java.io.File(d).isDirectory)
    assert(gradedSfs.nonEmpty, "no graded SF dirs found to audit")
    for (sfd <- gradedSfs) {
      val bandSigs = graft.ops.Dedup.bandSignatures(spark, sfd)
      assert(HotBucket.hotBuckets(bandSigs, Seq("band", "sig"),
        HotBucket.defaultCap).isEmpty, s"D2/D13/G15 band-sig site is hot at $sfd")
      // D8: disjoint 10-token block hashes
      val blocks = graft.tables.Tables.documents(spark, sfd)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tokens"))
        .select(col("doc_id"), expr(
          """CASE WHEN size(tokens) >= 10 THEN
            |  transform(sequence(0, size(tokens) div 10 - 1),
            |            i -> concat_ws(' ', slice(tokens, i * 10 + 1, 10)))
            |ELSE array() END""".stripMargin).as("bs"))
        .select(col("doc_id"), explode(col("bs")).as("block"))
        .select(graft.functions.VectorOps.rollhash64(col("block")).as("h"))
      assert(HotBucket.hotBuckets(blocks, Seq("h"),
        HotBucket.defaultCap).isEmpty, s"D8 block-hash site is hot at $sfd")
      // D12: SemDeDup cells (E20's trained assignment since r12)
      val (assigned, _) = graft.ops.Similarity.ivfTrainedAssignment(spark,
        sfd, graft.ops.Similarity.ivfTrainedCells)
      assert(HotBucket.hotBuckets(assigned, Seq("cell"),
        HotBucket.defaultCap).isEmpty, s"D12 cell site is hot at $sfd")
      // H5: payload-chunk MinHash band signatures
      val mmSigs = graft.ops.Multimodal.nearDupBandSigs(spark, sfd)
      assert(HotBucket.hotBuckets(mmSigs, Seq("band", "sig"),
        HotBucket.defaultCap).isEmpty, s"H5 band-sig site is hot at $sfd")
    }
  }

  test("triangleReplicate: LOSSLESS pair coverage with bounded tasks on a hot bucket") {
    // the structural-hotness case (SimHash 16-bit blocks): the output
    // depends on full pair coverage, so the guard must preserve every
    // pair while still bounding the per-task input
    val tri = HotBucket.triangleReplicate(sigs, Seq("band", "sig"),
      col("doc_id"), site = "r7.triangle", cap = cap)
    val l = tri.select($"band", $"sig", $"tmin", $"tmax",
      $"grp".as("g_a"), $"doc_id".as("a"))
    val r = tri.select($"band", $"sig", $"tmin", $"tmax",
      $"grp".as("g_b"), $"doc_id".as("b"))
    val pairs = l.join(r, Seq("band", "sig", "tmin", "tmax"))
      .filter(HotBucket.trianglePairFilter($"g_a", $"g_b"))
      .filter($"a" < $"b")
      .select("a", "b")
    // exactly the plain join's pairs — count AND no duplicates
    val nPairs = pairs.count()
    val nDistinct = pairs.distinct().count()
    val plain = m.toLong * (m - 1) / 2 + 10L * 9 / 2
    assert(nDistinct == plain, s"triangle lost pairs: $nDistinct of $plain")
    assert(nPairs == plain, s"triangle duplicated pairs: $nPairs of $plain")
    // per-task input stays bounded (two hash groups ≈ 2·cap rows; 4×
    // absorbs hash imbalance)
    val maxTask = tri.groupBy("band", "sig", "tmin", "tmax")
      .agg(count(lit(1)).as("n")).agg(max("n")).head.getLong(0)
    assert(maxTask <= 4L * cap,
      s"one triangle task holds $maxTask rows — not bounded by the cap")
    // cold buckets degenerate to the plain join: one replica, task (0,0)
    assert(tri.filter($"band" === 1 &&
      ($"tmin" =!= 0 || $"tmax" =!= 0)).count() == 0)
  }

  test("probeAllSalts: probe join over a salted corpus is lossless and task-bounded") {
    val hot = HotBucket.memoHot(sigs, Seq("band", "sig"), "r7.probeAll", cap)
    val corpus = sigs.withColumn("salt",
      HotBucket.saltCol(hot, Seq("band", "sig"), col("doc_id")))
    val probes = HotBucket.probeAllSalts(
      sigs.filter($"doc_id" % 100 === 0)
        .select($"band", $"sig", $"doc_id".as("qid")),
      hot, Seq("band", "sig"))
    val guarded = corpus.join(probes, Seq("band", "sig", "salt"))
      .filter($"doc_id" =!= $"qid").select("qid", "doc_id")
    val plain = sigs.filter($"doc_id" % 100 === 0)
      .select($"band", $"sig", $"doc_id".as("qid"))
      .join(sigs, Seq("band", "sig"))
      .filter($"doc_id" =!= $"qid").select("qid", "doc_id")
    // identical (probe, neighbor) multiset — the probe meets EVERY salt
    // group, so nothing is lost and nothing duplicated
    assert(guarded.exceptAll(plain).count() == 0 &&
      plain.exceptAll(guarded).count() == 0,
      "probe replication diverged from the plain bucket join")
    // and the per-(bucket, salt) corpus-side group stays bounded
    val maxGroup = corpus.groupBy("band", "sig", "salt")
      .agg(count(lit(1)).as("n")).agg(max("n")).head.getLong(0)
    assert(maxGroup <= 4L * cap)
  }

  test("a WIDE hot list (hundreds of buckets) evaluates — flat CaseWhen, not a nested tree") {
    import spark.implicits._
    // 600 over-cap buckets: the dispatch expression must stay a single
    // flat CaseWhen — the nested when/otherwise fold this replaced
    // would build a 600-deep expression tree and blow Catalyst's
    // recursive transforms exactly when the guard matters
    val wide = (0 until 600).flatMap(b => (0 until 6).map(i => (b, i.toLong)))
      .toDF("band", "doc_id")
    val salted = HotBucket.saltByCap(wide, Seq("band"), col("doc_id"),
      site = "r7.wide", cap = 2)
    // every bucket splits into 3 groups of ~2; salts land in [0, 3)
    assert(salted.filter($"salt" < 0 || $"salt" >= 3).count() == 0)
    val nonzero = salted.filter($"salt" =!= 0).count()
    assert(nonzero > 0, "wide hot list produced no splits")
    val tri = HotBucket.triangleReplicate(wide, Seq("band"), col("doc_id"),
      site = "r7.wideTri", cap = 2)
    // lossless: 600 buckets × C(6,2)=15 pairs each
    val l = tri.select($"band", $"tmin", $"tmax", $"grp".as("g_a"), $"doc_id".as("a"))
    val r = tri.select($"band", $"tmin", $"tmax", $"grp".as("g_b"), $"doc_id".as("b"))
    val pairs = l.join(r, Seq("band", "tmin", "tmax"))
      .filter(HotBucket.trianglePairFilter($"g_a", $"g_b"))
      .filter($"a" < $"b").count()
    assert(pairs == 600L * 15, s"wide triangle lost pairs: $pairs of ${600 * 15}")
  }

  test("hotBuckets refuses a pathological hot-list size loudly") {
    val many = (0 until HotBucket.maxHotBuckets + 5)
      .flatMap(b => (0 until 2).map(i => (b, i.toLong)))
      .toDF("band", "doc_id")
    val e = intercept[IllegalArgumentException] {
      HotBucket.hotBuckets(many, Seq("band"), cap = 1)
    }
    assert(e.getMessage.contains("frequency floor"))
    // the refusal must not itself OOM the driver: the collect is
    // bounded by a GlobalLimit of maxHotBuckets + 1 IN THE PLAN, so
    // the pathological corpus (hot buckets ≈ rows/cap) ships at most
    // 4097 rows to the driver before the require speaks
    val frame = HotBucket.hotBucketsFrame(many, Seq("band"), cap = 1)
    val plan = frame.queryExecution.optimizedPlan.toString
    assert(plan.contains("GlobalLimit") &&
      plan.contains((HotBucket.maxHotBuckets + 1).toString),
      s"hot-list collect is not limit-bounded in the plan:\n$plan")
    assert(frame.collect().length == HotBucket.maxHotBuckets + 1)
  }
}
