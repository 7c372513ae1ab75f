package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.ops.Text

class ExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("CosineSim (codegen) equals the composed-builtins cosine") {
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("emb"))
    val self = e.limit(50)
      .select(
        VectorOps.cosine(col("emb"), col("emb")).as("fused"),
        VectorOps.cosineComposed(col("emb"), col("emb")).as("composed"))
      .collect()
    assert(self.nonEmpty)
    self.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"fused ${r.getDouble(0)} != composed ${r.getDouble(1)}")
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    }
  }

  test("DotProduct (codegen) equals the composed-builtins dot bit-for-bit") {
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select(VectorOps.asDouble(col("embedding")).as("emb")).limit(100)
    val planes = Seq(
      Array.tabulate(64)(i => math.sin(i + 1.0)),
      Array.tabulate(64)(i => math.cos(i * 0.7) - 0.3))
    planes.foreach { p =>
      val planeCol = array(p.map(lit(_)): _*)
      val rows = e.select(
        VectorOps.dot(col("emb"), planeCol).as("fused"),
        VectorOps.dotComposed(col("emb"), planeCol).as("composed")).collect()
      rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
        s"fused dot ${r.getDouble(0)} != composed ${r.getDouble(1)}"))
    }
  }

  test("RollWindowHash64 equals the composed slice+concat_ws+rollhash64 per element") {
    // the composed form spansOf used before r14 — per window position, a
    // materialized string hashed from scratch; the fused expression must
    // match it VALUE-FOR-VALUE so the D14/F17 oracle hashes cannot move
    def composed(win: Int) = expr(
      s"""transform(sequence(0, size(toks) - $win),
         |  i -> graft_rollhash64(concat_ws(' ', slice(toks, i + 1, $win))))"""
        .stripMargin)
    graft.GraftFunctions.register(spark)
    // real corpus tokens at the test SF plus adversarial shapes: multi-
    // byte UTF-8, empty strings, single-char tokens, exactly-win tokens
    val real = graft.tables.Tables.documents(spark, sf)
      .select(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+").as("toks"))
    val edge = spark.createDataFrame(Seq(
      Tuple1(Seq("héllo", "wörld", "日本語のトークン", "a", "б", "🎉emoji", "x", "y", "z", "w", "v")),
      Tuple1(Seq("", "", "a", "", "b", "", "", "c", "", "")),
      Tuple1(Seq.fill(10)("same")),
      Tuple1((1 to 10).map(_.toString)),
      Tuple1(Seq("exactly", "ten", "tokens", "in", "this", "row", "here", "now", "ok", "end"))
    )).toDF("toks")
    for (win <- Seq(1, 2, 10)) {
      Seq(real, edge).foreach { df =>
        val rows = df.filter(size(col("toks")) >= win)
          .select(graft.functions.VectorOps.rollWindowHash64(col("toks"), win).as("fused"),
            composed(win).as("comp"))
          .collect()
        assert(rows.nonEmpty)
        rows.foreach { r =>
          val f = r.getSeq[Long](0)
          val c = r.getSeq[Long](1)
          assert(f == c, s"win=$win fused $f != composed $c")
        }
      }
    }
    // short input yields an empty array (callers filter size >= win first)
    val short = edge.select(
      graft.functions.VectorOps.rollWindowHash64(col("toks"), 99).as("h"))
      .collect()
    short.foreach(r => assert(r.getSeq[Long](0).isEmpty))
  }

  test("IntSqDist (codegen) equals the zip_with integer fold exactly") {
    val q = graft.tables.Tables.embeddings(spark, sf)
      .select(expr(
        "transform(CAST(embedding AS array<double>), x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))")
        .as("q")).limit(100)
    val other = q.limit(1).head().getSeq[Long](0)
    val otherCol = array(other.map(lit(_)): _*)
    val fold = aggregate(zip_with(col("q"), otherCol, (a, b) => (a - b) * (a - b)),
      lit(0L), (s, v) => s + v)
    val rows = q.select(
      VectorOps.intSqDist(col("q"), otherCol).as("fused"), fold.as("folded")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("RollHash64 on binary input equals string input byte-for-byte, non-ASCII included") {
    import spark.implicits._
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(1125899906842597L)((h, b) => 31 * h + (b & 0xff))
    val samples = Seq("plain ascii", "héllo wörld", "日本語テキスト", "mixed ✓ Ω 1")
    val rows = samples.toDF("s")
      .select(col("s"),
        VectorOps.rollhash64(col("s")).as("hs"),
        VectorOps.rollhash64(col("s").cast("binary")).as("hb"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"string vs binary hash split on '${r.getString(0)}'")
      assert(r.getLong(1) == ref(r.getString(0)),
        s"hash drifted from the byte fold on '${r.getString(0)}'")
    }
    // a frame sliced mid-codepoint is un-decodable as a string but must
    // still hash raw — the media-chunk contract
    val bytes = "é".getBytes("UTF-8")
    val half = bytes.take(1)
    val got = Seq(Tuple1(half)).toDF("b")
      .select(VectorOps.rollhash64(col("b"))).head().getLong(0)
    assert(got == 31 * 1125899906842597L + (half(0) & 0xff))
  }

  test("RollHash64 matches a reference Scala implementation") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(1125899906842597L)((h, b) => 31 * h + (b & 0xff))
    val rows = graft.tables.Tables.documents(spark, sf).limit(20)
      .select(col("text"), VectorOps.rollhash64(col("text")).as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == ref(r.getString(0)))
    }
  }

  test("text_rollhash distinct per distinct text") {
    val df = Text.textRollhash(spark, sf)
    assert(df.select("rollhash").distinct().count() ==
      graft.tables.Tables.documents(spark, sf).select("text").distinct().count())
  }

  test("GraftFunctions.register exposes the SQL functions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) c, " +
      "graft_rollhash64('abc') h, " +
      "graft_combine64(array(1L, 2L, 3L)) s, " +
      "graft_dot(array(2.0d, 3.0d), array(4.0d, 5.0d)) d, " +
      "graft_int_sqdist(array(5L, 1L), array(2L, 5L)) q").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) != 0L)
    assert(r.getLong(2) == ((1125899906842597L * 31 + 1) * 31 + 2) * 31 + 3)
    assert(r.getDouble(3) == 23.0)
    assert(r.getLong(4) == 25L)
  }

  test("fused dot/int_sqdist preserve composed NULL semantics on mismatch and null elements") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d), array(1.0d, 2.0d)) a, " +
        "graft_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) b, " +
        "graft_int_sqdist(array(1L), array(1L, 2L)) c, " +
        "graft_int_sqdist(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)) d, " +
        "graft_combine64(array(1L, CAST(NULL AS BIGINT))) e").head()
    (0 to 4).foreach(i => assert(r.isNullAt(i),
      s"column $i should be NULL — a partial dot/distance/hash would be silently wrong"))
  }

  test("Mix64 wraps like Java long arithmetic") {
    val (a, b) = (2147483647L, 9007199254740993L)
    val rows = graft.tables.Tables.documents(spark, sf).limit(20)
      .select(VectorOps.rollhash64(col("text")).as("h"),
        VectorOps.mix64(VectorOps.rollhash64(col("text")), a, b).as("m"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == a * r.getLong(0) + b))
  }

  test("GraftOptimizations collapses chained affine mixes to one") {
    GraftFunctions.register(spark) // installs the optimizer rule
    val (a1, b1, a2, b2) = (2654435761L, 11L, 40503L, 7L)
    val df = graft.tables.Tables.documents(spark, sf).limit(20)
      .select(VectorOps.rollhash64(col("text")).as("h"))
      .select(col("h"),
        VectorOps.mix64(VectorOps.mix64(col("h"), a1, b1), a2, b2).as("m"))
    val nMix = df.queryExecution.optimizedPlan.collect { case node =>
      node.expressions.map(_.collect { case m: graft.functions.Mix64 => m }.size).sum
    }.sum
    assert(nMix == 1, s"chain not collapsed:\n${df.queryExecution.optimizedPlan}")
    // and the folded constants are semantically exact (wrapping algebra)
    df.collect().foreach { r =>
      val expect = a2 * (a1 * r.getLong(0) + b1) + b2
      assert(r.getLong(1) == expect)
    }
  }

  test("PqNearest/PqDists (codegen) equal the IntSqDist reference, encode decodes, ties break low") {
    val cb: Seq[Seq[Long]] = Seq(
      Seq(0L, 0L, 0L), Seq(10L, -5L, 3L), Seq(10L, -5L, 3L), Seq(-7L, 2L, 100L))
    val q = graft.tables.Tables.embeddings(spark, sf).limit(50)
      .select(expr(
        "slice(transform(CAST(embedding AS array<double>), x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)), 1, 3)")
        .as("q"))
    val rows = q.select(
      VectorOps.pqNearest(col("q"), cb).as("enc"),
      VectorOps.pqDists(col("q"), cb).as("dists"),
      array(cb.map(cw => VectorOps.intSqDist(col("q"),
        array(cw.map(lit(_)): _*))): _*).as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dists = r.getSeq[Long](1)
      val ref = r.getSeq[Long](2)
      assert(dists == ref, s"PqDists $dists != IntSqDist reference $ref")
      val enc = r.getLong(0)
      val (d2, ord) = (enc >> 8, (enc & 255L).toInt)
      assert(d2 == ref.min, s"decoded d2 $d2 != min ${ref.min}")
      assert(ord == ref.indexOf(ref.min),
        s"ordinal $ord is not the LOWEST argmin of $ref")
      // codewords 1 and 2 are identical: a tie there must pick ordinal 1
      if (ref(1) == ref.min) assert(ord <= 1)
    }
    // null semantics: mismatched codeword length nulls both, through SQL
    val bad: Seq[Seq[Long]] = Seq(Seq(1L, 2L, 3L), Seq(4L, 5L))
    val nulls = q.limit(5).select(
      VectorOps.pqNearest(col("q"), bad).as("e"),
      VectorOps.pqDists(col("q"), bad).as("d")).collect()
    nulls.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1),
      "length-mismatched codebook must null the result"))
  }
}
