package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array-vector math over `array<double>` columns, built from codegen'd
  * builtins (`zip_with`, `aggregate`, `transform`) — no UDFs, so every
  * expression stays inside whole-stage codegen and matches DuckDB's
  * `list_*` double-precision semantics element-for-element.
  *
  * All helpers expect `array<double>`; call [[asDouble]] on float arrays
  * first (the test `embeddings.embedding` column is `array<float>`).
  */
object VectorOps {

  def asDouble(c: Column): Column = c.cast("array<double>")

  /** Σ aᵢ·bᵢ — fused native [[DotProduct]]: one codegen'd loop, no
    * per-row product array.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DotProduct(expression(a), expression(b)))

  /** Composed-builtins dot (allocates a zip_with array per row) — kept
    * for A/B testing against [[dot]].
    */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Σ (aᵢ−bᵢ)² over integer-tick arrays — fused native [[IntSqDist]],
    * exact long arithmetic.
    */
  def intSqDist(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      IntSqDist(expression(a), expression(b)))

  /** Distinct-set Jaccard over two array<string> columns — fused native
    * [[JaccardSim]], bit-identical to
    * `size(array_intersect(a, b)).cast("double") / size(array_union(a, b))`
    * without materializing either intermediate array.
    */
  def jaccardSim(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      JaccardSim(expression(a), expression(b)))

  /** Σ (aᵢ−bᵢ)² — squared Euclidean distance. Monotonic with L2, so rank
    * and top-k logic can skip the sqrt.
    */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² */
  def normSq(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** cos(a, b) = a·b / √(Σa²·Σb²) — the sqrt-of-product form, matching
    * DuckDB's `list_cosine_similarity` bit-for-bit for oracle parity.
    * Backed by the fused native [[CosineSim]] expression: one codegen'd
    * loop, no intermediate product array per row.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CosineSim(expression(a), expression(b)))

  /** Composed-builtins cosine (allocates a zip_with array per row) — kept
    * for A/B testing against [[cosine]]. Built on [[dotComposed]] so the
    * reference stays fully independent of the native loops.
    */
  def cosineComposed(a: Column, b: Column): Column =
    dotComposed(a, b) / sqrt(normSq(a) * normSq(b))

  /** 64-bit polynomial rolling hash over a string column. */
  def rollhash64(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(RollHash64(expression(c)))

  /** All sliding-window [[rollhash64]] values over an array<string>
    * column in one O(bytes) pass — element i equals
    * `rollhash64(concat_ws(' ', slice(c, i+1, win)))` exactly.
    */
  def rollWindowHash64(c: Column, win: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      RollWindowHash64(expression(c), win))

  /** Wrapping affine mix a·h + b (mod 2⁶⁴) over a bigint column. */
  def mix64(c: Column, a: Long, b: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(Mix64(expression(c), a, b))

  /** SplitMix64 finalizer — full-avalanche scramble of a bigint column
    * (ordering-grade; see [[graft.functions.Avalanche64]]).
    */
  def avalanche64(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(Avalanche64(expression(c)))

  /** Wrapping polynomial fold 31·s + xᵢ over an array<long> column. */
  def combine64(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(Combine64(expression(c)))

  /** Nearest-codeword argmin for one PQ subspace — fused native
    * [[PqNearest]] over a driver-built codebook literal; returns the
    * `d2 · 256 + ordinal` encoding (decode with `>> 8` / `& 255`).
    */
  def pqNearest(subv: Column, codebook: Seq[Seq[Long]]): Column = {
    require(codebook.nonEmpty && codebook.size <= 256,
      s"pqNearest codebook must hold 1..256 codewords, got ${codebook.size}")
    org.apache.spark.sql.GraftColumnBridge.column(PqNearest(expression(subv),
      codebookLit(codebook)))
  }

  /** Exact integer L2 to every codeword of one PQ subspace — fused
    * native [[PqDists]]; one ADC lookup-table row in ordinal order.
    */
  def pqDists(subv: Column, codebook: Seq[Seq[Long]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(PqDists(expression(subv),
      codebookLit(codebook)))

  private def codebookLit(codebook: Seq[Seq[Long]]) =
    org.apache.spark.sql.catalyst.expressions.Literal.create(
      codebook,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))

  private def expression(c: Column) =
    org.apache.spark.sql.GraftColumnBridge.expression(c)
}
