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
      "graft_rollhash64('abc') h").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) != 0L)
  }
}
