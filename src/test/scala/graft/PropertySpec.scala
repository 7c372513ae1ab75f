package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK.{Line, TopKByPrice}

/** Randomized-property tests for the hand-written algorithmic cores —
  * the pieces whose correctness the SQL oracles can't stress beyond the
  * fixed test corpus (buffer merge order, tie handling, split points).
  * Seeded generators: failures reproduce.
  */
class PropertySpec extends AnyFunSuite {

  // constant key: the aggregator always runs inside one groupByKey group,
  // so its ordering never needs to disambiguate across keys
  private def randLines(rnd: Random, n: Int): List[Line] =
    List.fill(n)(Line(
      1L,
      rnd.nextInt(50).toDouble, // coarse prices → frequent ties
      rnd.nextInt(20).toLong,
      rnd.nextInt(4) + 1))

  private def refTop3(xs: List[Line]): List[Line] =
    xs.sortBy(l => (-l.l_extendedprice, l.l_orderkey, l.l_linenumber)).take(3)

  test("TopKByPrice reduce-then-merge equals sort-take for any split") {
    val rnd = new Random(42)
    val agg = new TopKByPrice(3)
    (1 to 300).foreach { _ =>
      val a = randLines(rnd, rnd.nextInt(12))
      val b = randLines(rnd, rnd.nextInt(12))
      val bufA = a.foldLeft(agg.zero)(agg.reduce)
      val bufB = b.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bufA, bufB)) == refTop3(a ++ b),
        s"split a=$a b=$b")
      assert(agg.merge(bufA, bufB) == agg.merge(bufB, bufA),
        s"merge-order a=$a b=$b")
    }
  }

  test("RollHash64 eval matches the byte-fold reference on random strings") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(1125899906842597L)((h, b) => 31 * h + (b & 0xff))
    val rnd = new Random(7)
    (1 to 300).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(40)).mkString +
        (if (rnd.nextBoolean()) "äöü漢字" else "")
      val got = graft.functions.RollHash64(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s),
          org.apache.spark.sql.types.StringType)).eval(null)
      assert(got == ref(s), s"string '$s'")
    }
  }

  test("IntSqDist eval matches a BigInt reference on random tick arrays") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val rnd = new Random(11)
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(80)
      // tick magnitudes up to 10^7 — beyond any caller's range, still
      // overflow-free: d^2 <= 4e14, x80 dims <= 3.2e16
      val a = Array.fill(n)(rnd.nextLong() % 10000000L)
      val b = Array.fill(n)(rnd.nextLong() % 10000000L)
      val expect = a.zip(b).map { case (x, y) =>
        val d = BigInt(x) - BigInt(y); d * d
      }.sum
      val got = graft.functions.IntSqDist(
        Literal(ArrayData.toArrayData(a), ArrayType(LongType)),
        Literal(ArrayData.toArrayData(b), ArrayType(LongType))).eval(null)
      assert(BigInt(got.asInstanceOf[Long]) == expect, s"n=$n")
    }
  }

  test("DotProduct eval matches the sequential fold reference bit-for-bit") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val rnd = new Random(13)
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(80)
      val a = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val b = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      // the reference is the same left-to-right accumulation the
      // composed zip_with+aggregate formulation performs
      var expect = 0.0
      var i = 0
      while (i < n) { expect += a(i) * b(i); i += 1 }
      val got = graft.functions.DotProduct(
        Literal(ArrayData.toArrayData(a), ArrayType(DoubleType)),
        Literal(ArrayData.toArrayData(b), ArrayType(DoubleType))).eval(null)
      assert(got.asInstanceOf[Double] == expect
        || (n == 0 && got.asInstanceOf[Double] == 0.0), s"n=$n")
    }
  }

  test("Mix64 is a bijection mod 2^64 for odd multipliers") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.LongType
    val rnd = new Random(13)
    (1 to 50).foreach { _ =>
      val a = rnd.nextInt(Int.MaxValue).toLong | 1L
      val b = rnd.nextLong()
      val inputs = Seq.fill(200)(rnd.nextLong()).distinct
      val outputs = inputs.map { h =>
        graft.functions.Mix64(Literal(h, LongType), a, b).eval(null).asInstanceOf[Long]
      }
      // odd multiplier ⇒ injective mod 2^64: distinct inputs stay distinct
      assert(outputs.distinct.size == inputs.size)
      // and eval agrees with plain wrapping arithmetic
      inputs.zip(outputs).foreach { case (h, o) => assert(o == a * h + b) }
    }
  }

  test("Combine64 equals the fold reference and composes with Mix64 algebra") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val rnd = new Random(17)
    (1 to 200).foreach { _ =>
      val xs = Array.fill(rnd.nextInt(10))(rnd.nextLong())
      val got = graft.functions.Combine64(
        Literal(ArrayData.toArrayData(xs), ArrayType(LongType))).eval(null)
      val ref = xs.foldLeft(1125899906842597L)((s, x) => 31L * s + x)
      assert(got == ref)
      // the GraftOptimizations fold law: a2·(a1·h+b1)+b2 == (a1a2)h + (a2b1+b2)
      val (a1, b1, a2, b2) = (rnd.nextLong() | 1L, rnd.nextLong(), rnd.nextLong() | 1L, rnd.nextLong())
      val h = rnd.nextLong()
      assert(a2 * (a1 * h + b1) + b2 == (a1 * a2) * h + (a2 * b1 + b2))
    }
  }

  test("DistRank rank and running sums equal the global window on random distributions") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new Random(23)
    (1 to 4).foreach { trial =>
      // heavy duplication in keys AND values: slice cuts land inside
      // runs of equal keys, the case offset arithmetic must survive
      val n = 200 + rnd.nextInt(400)
      val data = (1 to n).map { i =>
        val key: Option[Double] = rnd.nextInt(12) match {
          case 0 => None
          case 1 => Some(Double.NaN)
          case _ => Some(rnd.nextInt(9).toDouble)
        }
        val v: Option[Long] = if (rnd.nextInt(5) == 0) None
          else Some(rnd.nextInt(7).toLong - 3)
        (i.toLong, key, v)
      }
      val df = data.toDF("id", "key", "v")
      val order = if (trial % 2 == 0) col("key") else col("key").desc
      val w = org.apache.spark.sql.expressions.Window.orderBy(order, col("id"))
      val rankWindow = df.withColumn("r", row_number().over(w).cast("long"))
      val rankDist = graft.ops.DistRank.withGlobalRank(df, "r", order, col("id"))
      assert(rankDist.exceptAll(rankWindow).isEmpty &&
        rankWindow.exceptAll(rankDist).isEmpty,
        s"trial $trial rank diverged (n=$n, order=$order)")
      val wc = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val sumWindow = df.withColumn("cv", sum(coalesce(col("v"), lit(0))).over(wc))
      val sumDist = graft.ops.DistRank.withRunningSums(df,
        Seq((col("v"), "cv")), order, col("id"))
      assert(sumDist.exceptAll(sumWindow).isEmpty &&
        sumWindow.exceptAll(sumDist).isEmpty,
        s"trial $trial running sum diverged (n=$n, order=$order)")
    }
  }

  test("CosineSim eval matches a plain-Scala reference on random vectors") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def ref(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / math.sqrt(na * nb)
    }
    val rnd = new Random(11)
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(16) + 1
      val a = Array.fill(n)(rnd.nextGaussian())
      val b = Array.fill(n)(rnd.nextGaussian())
      val got = graft.functions.CosineSim(
        Literal(ArrayData.toArrayData(a), ArrayType(DoubleType)),
        Literal(ArrayData.toArrayData(b), ArrayType(DoubleType))).eval(null)
      assert(got == ref(a, b))
    }
  }

  test("mortonKey equals the bit-loop reference on random 16-bit pairs") {
    // reference: place bit i of a at position 2i, bit i of b at 2i+1
    def ref(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      }
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new Random(7)
    val pairs = List.fill(300)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("a", "b")
      .select(graft.sources.Sources.mortonKey(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("z"))
      .collect().map(_.getLong(0))
    pairs.zip(got).foreach { case ((a, b), z) =>
      assert(z == ref(a, b), s"mortonKey($a,$b)=$z, want ${ref(a, b)}")
    }
  }
}
