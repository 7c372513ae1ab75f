package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** C33 — `ml_linreg_normal`: closed-form ordinary least squares via the
  * normal equations, EXACT end to end — the missing regression analog
  * of the C28/C29/C30 exact-training program (which is classification
  * throughout). Fit: price_cents ~ b0 + b1·quantity + b2·discount_pct
  * over lineitem.
  *
  * The whole fit is ONE aggregate: the 3×3 Gram matrix XᵀX and Xᵀy are
  * nine exact integer sums (quantity, discount ticks, price cents —
  * per-row products ≤ 5·10⁸, sums < 2⁶³ up to ~10⁹ rows; past that the
  * same sums run as decimal(38,0)). The solve is Cramer's rule on the
  * driver in BigInt — four 3×3 determinants, zero floating point until
  * the final quantized ratio, which rounds with INTEGER arithmetic
  * ((2·10⁴·|detᵢ| + |det|) div (2·|det|), sign handled separately) so
  * the oracle's HUGEINT replay is bit-identical.
  *
  * Scale shape: one codegen'd scan ending in a 9-long aggregate with
  * map-side partials; driver state is 9 longs + 4 BigInts; the result
  * is a literal 1-row frame. This is how linear models actually train
  * at 100 TB when d is small — the Gram matrix is the only reduction.
  */
object Ols {

  /** Coefficient in 10⁻⁴ ticks via sign-separated integer rounding —
    * the exactly-replayable bridge between the BigInt Cramer ratios and
    * a double column.
    */
  private def qticks(num: BigInt, den: BigInt): Long = {
    require(den != 0, "ml_linreg_normal: singular normal matrix (det = 0)")
    val sign = if ((num < 0) ^ (den < 0)) -1 else 1
    (sign * ((num.abs * 20000 + den.abs) / (den.abs * 2))).toLong
  }

  private def q4(num: BigInt, den: BigInt): Double =
    qticks(num, den).toDouble / 10000.0

  private def designMatrix(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_quantity").cast("long").as("x1"),
      floor(col("l_discount") * 100 + lit(0.5)).cast("long").as("x2"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("y"))

  /** The nine exact Gram sums — ONE aggregate, the only cross-row
    * communication any normal-equations fit in this file needs.
    */
  private def gramSums(spark: SparkSession, dir: String): IndexedSeq[BigInt] = {
    val li = designMatrix(spark, dir)
    // per-row products fit int64 (x1 ≤ 50, x2 ≤ 10, y ≤ 10⁷ ticks); the
    // SUMS escalate to decimal(38,0) so the fit stays exact past ~10⁹
    // rows (s1y ≈ 5·10⁸·n) — matching the oracle's HUGEINT sums instead
    // of wrapping silently in non-ANSI int64
    val r = li.agg(
      count(lit(1)).as("n"),
      sum(col("x1").cast("decimal(38,0)")).as("s1"),
      sum(col("x2").cast("decimal(38,0)")).as("s2"),
      sum((col("x1") * col("x1")).cast("decimal(38,0)")).as("s11"),
      sum((col("x1") * col("x2")).cast("decimal(38,0)")).as("s12"),
      sum((col("x2") * col("x2")).cast("decimal(38,0)")).as("s22"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("x1") * col("y")).cast("decimal(38,0)")).as("s1y"),
      sum((col("x2") * col("y")).cast("decimal(38,0)")).as("s2y")).head()
    BigInt(r.getLong(0)) +:
      (1 until 9).map(i => BigInt(r.getDecimal(i).toBigInteger))
  }

  /** Cramer determinants for the (optionally L2-damped) normal system:
    * `lam` is added to the two slope diagonal entries (the intercept is
    * never penalized — the standard ridge convention).
    */
  private def cramer(s: IndexedSeq[BigInt], lam: BigInt): Seq[BigInt] = {
    val Seq(n, s1, s2, s11r, s12, s22r, sy, s1y, s2y) = s.toSeq
    val (s11, s22) = (s11r + lam, s22r + lam)
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    Seq(det, det0, det1, det2)
  }

  /** (n, det, det0, det1, det2) — the full Cramer state, shared by the
    * fit (C33) and the batch scorer (C34).
    */
  private def gramSolve(spark: SparkSession, dir: String): (Long, Seq[BigInt]) = {
    val s = gramSums(spark, dir)
    (s(0).toLong, cramer(s, BigInt(0)))
  }

  def mlLinregNormal(spark: SparkSession, dir: String): DataFrame = {
    val (n, Seq(det, det0, det1, det2)) = gramSolve(spark, dir)
    import spark.implicits._
    Seq((n, q4(det0, det), q4(det1, det), q4(det2, det)))
      .toDF("n", "b0", "b1", "b2")
  }

  /** C34 — `ml_batch_score`: the SERVING path of the exact-training
    * program — score every row with C33's coefficients and report
    * residual quality per group, all in integer ticks: with Tᵢ the
    * 10⁻⁴-tick coefficients, ŷ·10⁴ = T₀ + T₁x₁ + T₂x₂ is an exact
    * integer per row, the residual r = 10⁴·y − ŷ·10⁴ an exact integer
    * difference, and the per-group MAE/bias are integer sums quantized
    * only at the end. Train exactly → score exactly → evaluate exactly,
    * one declarative lineage, bit-replayable in the oracle.
    *
    * Scale shape: the coefficients are 3 literal longs (driver state
    * from C33's one-aggregate fit); scoring is a pure codegen
    * projection over the fact scan; the evaluation is a ≤|groups|
    * aggregate with map-side partials. This is exactly how a linear
    * model serves at 100 TB.
    */
  def mlBatchScore(spark: SparkSession, dir: String): DataFrame = {
    val (_, Seq(det, det0, det1, det2)) = gramSolve(spark, dir)
    val (t0, t1, t2) =
      (qticks(det0, det), qticks(det1, det), qticks(det2, det))
    val scored = Tables.lineitem(spark, dir).select(
      col("l_returnflag"),
      col("l_quantity").cast("long").as("x1"),
      floor(col("l_discount") * 100 + lit(0.5)).cast("long").as("x2"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("y"))
      .withColumn("r",
        col("y") * lit(10000L) -
          (lit(t0) + lit(t1) * col("x1") + lit(t2) * col("x2")))
    // residual sums in decimal(38,0): |r| ≈ 10¹⁰ ticks/row, so int64
    // wraps past ~10⁹ rows while the oracle's HUGEINT does not
    scored.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(abs(col("r")).cast("decimal(38,0)")).as("sae"),
        sum(col("r").cast("decimal(38,0)")).as("sre"))
      .select(col("l_returnflag"), col("n"),
        graft.ops.OracleRound.r4b(col("sae").cast("double") /
          (col("n") * 10000.0)).as("mae_cents"),
        graft.ops.OracleRound.r4b(col("sre").cast("double") /
          (col("n") * 10000.0)).as("bias_cents"))
      .orderBy("l_returnflag")
  }

  /** The ridge λ grid, in Gram-tick units (spans the s22≈10⁸ / s11≈10⁹
    * diagonal scale at sf0.1, so the path shows real shrinkage at every
    * SF). Shared with the oracle as literals.
    */
  private[graft] val ridgeLambdas: Seq[Long] = Seq(0L, 100000000L, 10000000000L)

  /** C35 — `ml_ridge_path`: the L2-regularization path, EXACT — ridge
    * β(λ) = (XᵀX + λ·diag(0,1,1))⁻¹ Xᵀy for a literal λ grid, solved
    * from the SAME nine Gram sums as C33 (regularization costs zero
    * additional scans: the damped system differs only in two diagonal
    * entries of driver-side BigInt state). λ=0 row ≡ C33's OLS fit —
    * the oracle hash proves it — and the penalized-norm shrinkage down
    * the path is the spec's witness.
    */
  def mlRidgePath(spark: SparkSession, dir: String): DataFrame = {
    val s = gramSums(spark, dir)
    import spark.implicits._
    ridgeLambdas.map { lam =>
      val Seq(det, det0, det1, det2) = cramer(s, BigInt(lam))
      (lam, q4(det0, det), q4(det1, det), q4(det2, det))
    }.toDF("lambda", "b0", "b1", "b2")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_linreg_normal" -> (mlLinregNormal _),
    "ml_batch_score" -> (mlBatchScore _),
    "ml_ridge_path" -> (mlRidgePath _))

  /** The tick-design + Gram-sum CTEs (`t` → `s`), shared verbatim by
    * every oracle in this file so the three estimators can never
    * disagree about the sums they solve from.
    */
  private val gramCtes: String =
    """t AS (
      | SELECT CAST(l_quantity AS HUGEINT) AS x1,
      |   CAST(floor(l_discount * 100 + 0.5) AS HUGEINT) AS x2,
      |   CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) AS y
      | FROM lineitem),
      |s AS (
      | SELECT count(*)::HUGEINT AS n, sum(x1) AS s1, sum(x2) AS s2,
      |   sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
      |   sum(y) AS sy, sum(x1*y) AS s1y, sum(x2*y) AS s2y
      | FROM s0)""".stripMargin.replace("FROM s0", "FROM t")

  val oracles: Map[String, String] = Map(
    // same Gram CTEs, diagonal-damped dets per literal lambda, same
    // sign-separated integer rounding; the lambda=0 row hash-proves
    // ridge(0) == OLS
    "ml_ridge_path" -> {
      def q(num: String) =
        s"(CASE WHEN ($num < 0) <> (det < 0) THEN -1 ELSE 1 END * " +
          s"((abs($num) * 20000 + abs(det)) // (2 * abs(det)))) / 10000.0"
      def dets(lam: Long): String = {
        val (a, b) = (s"(s11 + $lam)", s"(s22 + $lam)")
        s""" SELECT CAST($lam AS BIGINT) AS lambda,
           |  n*($a*$b - s12*s12) - s1*(s1*$b - s12*s2) + s2*(s1*s12 - $a*s2) AS det,
           |  sy*($a*$b - s12*s12) - s1*(s1y*$b - s12*s2y) + s2*(s1y*s12 - $a*s2y) AS det0,
           |  n*(s1y*$b - s12*s2y) - sy*(s1*$b - s12*s2) + s2*(s1*s2y - s1y*s2) AS det1,
           |  n*($a*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - $a*s2) AS det2
           | FROM s""".stripMargin
      }
      s"""WITH $gramCtes,
         |d AS (
         |${ridgeLambdas.map(dets).mkString("\n UNION ALL\n")})
         |SELECT lambda, Q0 AS b0, Q1 AS b1, Q2 AS b2
         |FROM d ORDER BY lambda""".stripMargin
        .replace("Q0", q("det0")).replace("Q1", q("det1")).replace("Q2", q("det2"))
    },
    // same tick quantization, same HUGEINT Gram sums, same Cramer
    // expansion, same sign-separated integer rounding
    "ml_linreg_normal" -> {
      def q(num: String) =
        s"(CASE WHEN ($num < 0) <> (det < 0) THEN -1 ELSE 1 END * " +
          s"((abs($num) * 20000 + abs(det)) // (2 * abs(det)))) / 10000.0"
      s"""WITH $gramCtes,
        |d AS (
        | SELECT n,
        |  n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
        |  sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS det0,
        |  n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS det1,
        |  n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2) AS det2
        | FROM s)
        |SELECT CAST(n AS BIGINT) AS n,
        |  Q0 AS b0,
        |  Q1 AS b1,
        |  Q2 AS b2
        |FROM d""".stripMargin
        .replace("Q0", q("det0")).replace("Q1", q("det1")).replace("Q2", q("det2"))
    },
    // C33's Gram/Cramer CTEs verbatim, coefficients kept as INTEGER
    // ticks, scoring and residual sums in HUGEINT, quantized at the end
    "ml_batch_score" -> {
      def tick(num: String) =
        s"(CASE WHEN ($num < 0) <> (det < 0) THEN -1 ELSE 1 END * " +
          s"((abs($num) * 20000 + abs(det)) // (2 * abs(det))))"
      s"""WITH $gramCtes,
        |d AS (
        | SELECT
        |  n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
        |  sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS det0,
        |  n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS det1,
        |  n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2) AS det2
        | FROM d0),
        |k AS (SELECT T0 AS t0, T1 AS t1, T2 AS t2 FROM d),
        |sc AS (
        | SELECT l_returnflag,
        |   CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) * 10000 -
        |   (k.t0 + k.t1 * CAST(l_quantity AS HUGEINT) +
        |    k.t2 * CAST(floor(l_discount * 100 + 0.5) AS HUGEINT)) AS r
        | FROM lineitem CROSS JOIN k)
        |SELECT l_returnflag, count(*) AS n,
        |  floor((CAST(sum(abs(r)) AS DOUBLE) / (count(*) * 10000.0)) * 10000 + 0.5) / 10000 AS mae_cents,
        |  floor((CAST(sum(r) AS DOUBLE) / (count(*) * 10000.0)) * 10000 + 0.5) / 10000 AS bias_cents
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin
        .replace("FROM d0", "FROM s")
        .replace("T0", tick("det0")).replace("T1", tick("det1"))
        .replace("T2", tick("det2"))
    })
}
