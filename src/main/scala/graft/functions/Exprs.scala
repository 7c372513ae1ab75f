package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY.md §3 functions/) — used on hot
  * paths where composing builtins would allocate intermediates:
  *
  *  - [[CosineSim]] fuses `dot/sqrt(Σa²·Σb²)` into one loop over the two
  *    arrays. The `zip_with`+`aggregate` formulation materializes a
  *    products array per row; at 100 TB of 1k-dim vectors that's pure
  *    garbage-collector load.
  *  - [[DotProduct]] / [[IntSqDist]] are the fused dot and exact
  *    integer-tick squared L2 (LSH bucketing, IVF/PQ geometry), with the
  *    composed formulations' NULL semantics: length mismatch or a null
  *    element nulls the result instead of silently truncating.
  *  - [[RollHash64]] is a polynomial (base-31) rolling hash over UTF8 or
  *    raw binary bytes — a single-pass 64-bit content fingerprint, no
  *    md5 digest allocation.
  *  - [[Mix64]] / [[Combine64]] are wrapping mod-2⁶⁴ hash combinators
  *    (MinHash permutations, band signatures).
  *
  * All implement `doGenCode`, so they inline into whole-stage codegen
  * exactly like builtins.
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = xs.getDouble(i); val y = ys.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Fused dot product over two array<double> columns — one codegen'd loop,
  * no per-row `zip_with` product array. The LSH bucket computations
  * evaluate a dot against every hyperplane literal per row (4× today,
  * more planes at scale); the allocation saved is per row × per plane.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // returns NULL for length-mismatched or null-element inputs even when
  // the arrays themselves are non-null — codegen must keep a real isNull
  override def nullable: Boolean = true

  // composed-dot NULL semantics: zip_with pads a length mismatch with
  // nulls and a null product nulls the whole fold — so mismatch or a
  // null element returns NULL here too, never a silent partial dot
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused exact squared L2 over two array<bigint> tick columns — the
  * quantized-vector geometry primitive (IVF assignment, PQ): one integer
  * loop, no intermediate diff array, exact long arithmetic (callers
  * bound tick magnitudes so the squared sums fit).
  */
case class IntSqDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_int_sqdist expects two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_sqdist"
  // see DotProduct.nullable
  override def nullable: Boolean = true

  // same NULL semantics as DotProduct: mismatch or null element -> NULL
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val d = xs.getLong(i) - ys.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): IntSqDist =
    copy(left = newLeft, right = newRight)
}

case class RollHash64(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_rollhash64 expects a string or binary argument, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rollhash64"

  // string and binary inputs with identical bytes hash identically —
  // binary payloads (media chunks) are hashed raw, no string cast that
  // would trip on frames split mid-codepoint
  override def nullSafeEval(input: Any): Any = {
    val bytes = child.dataType match {
      case StringType => input.asInstanceOf[UTF8String].getBytes
      case _ => input.asInstanceOf[Array[Byte]]
    }
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val src = if (child.dataType == StringType) s"$c.getBytes()" else c
      s"""
         |byte[] $bytes = $src;
         |long $h = 1125899906842597L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = 31L * $h + ($bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollHash64 =
    copy(child = newChild)
}

/** All sliding-window [[RollHash64]] values over a token array in ONE
  * O(total-bytes) pass — the Rabin-Karp prefix-product identity applied
  * to the positional-dedup hot path (guide §1.2 "per-task work" after
  * the distributed shape is right).
  *
  * Element i of the result is VALUE-IDENTICAL to
  * `RollHash64(concat_ws(' ', slice(toks, i+1, win)))` for every
  * i ∈ [0, n−win]: with S the seed and pre(k) the seedless base-31 fold
  * of the first k bytes of the space-joined token stream,
  * H(a,e) = pre(e) + (S − pre(a))·31^(e−a) (mod 2⁶⁴) — all wrapping
  * Java long arithmetic, so the identity is exact, not approximate.
  * The composed formulation materializes every window STRING
  * (O(bytes × win) character copies + hashing); this expression hashes
  * each byte once and reads each window off the prefix table.
  * RollWindowHash64Spec pins the per-element equality against the
  * composed form, so the D14/F17 oracles are untouched by construction.
  */
case class RollWindowHash64(child: Expression, win: Int)
  extends UnaryExpression {

  require(win >= 1, s"graft_rollwindow64 window must be >= 1, got $win")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_rollwindow64 expects an array<string> argument, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rollwindow64"

  override def nullSafeEval(input: Any): Any =
    RollWindowHash64.hashes(input.asInstanceOf[ArrayData], win)

  // one static call — the loops live in a real JVM method (JIT-compiled,
  // immune to the 8 KB generated-method cliff a fully inlined table
  // build would risk), and the expression still fuses into whole-stage
  // codegen like the other natives
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollWindowHash64.hashes($c, $win);")

  override protected def withNewChildInternal(newChild: Expression): RollWindowHash64 =
    copy(child = newChild)
}

object RollWindowHash64 {
  private val Seed = 1125899906842597L

  /** All window hashes over `toks` joined by single spaces (exactly the
    * byte stream `concat_ws(' ', ...)` produces — split-derived tokens
    * are never null, and empty tokens join like any other). Returns an
    * empty array when fewer than `win` tokens (callers filter first).
    */
  def hashes(toks: ArrayData, win: Int): ArrayData = {
    val n = toks.numElements()
    if (n < win)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val tb = new Array[Array[Byte]](n)
    var l = n - 1 // the n−1 single-space separators
    var t = 0
    while (t < n) {
      // r15 (advisor): getUTF8String on a null slot reads garbage bytes
      // from UnsafeArrayData — no caller produces null tokens (split()
      // output), so fail LOUDLY instead of hashing undefined memory
      if (toks.isNullAt(t))
        throw new IllegalArgumentException(
          "graft_rollwindow64 does not support null array elements " +
            s"(null at index $t)")
      tb(t) = toks.getUTF8String(t).getBytes
      l += tb(t).length
      t += 1
    }
    // byte offset of each token in the joined stream + the longest
    // window's byte length (powers are only needed up to that)
    val off = new Array[Int](n + 1)
    var k = 0
    t = 0
    while (t < n) {
      off(t) = k
      k += tb(t).length + 1 // +1 for the following space (or 1 past end)
      t += 1
    }
    off(n) = l + 1
    var maxM = 0
    var i = 0
    while (i <= n - win) {
      val m = (if (i + win < n) off(i + win) - 1 else l) - off(i)
      if (m > maxM) maxM = m
      i += 1
    }
    // prefix fold pre(k) over the joined bytes and 31^m table
    val pre = new Array[Long](l + 1)
    var h = 0L
    k = 0
    t = 0
    while (t < n) {
      val b = tb(t)
      var j = 0
      while (j < b.length) {
        h = 31L * h + (b(j) & 0xff)
        k += 1
        pre(k) = h
        j += 1
      }
      if (t < n - 1) {
        h = 31L * h + 0x20L
        k += 1
        pre(k) = h
      }
      t += 1
    }
    val pow = new Array[Long](maxM + 1)
    pow(0) = 1L
    i = 1
    while (i <= maxM) { pow(i) = 31L * pow(i - 1); i += 1 }
    val out = new Array[Long](n - win + 1)
    i = 0
    while (i <= n - win) {
      val a = off(i)
      val e = if (i + win < n) off(i + win) - 1 else l
      out(i) = pre(e) + (Seed - pre(a)) * pow(e - a)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Wrapping 64-bit affine mix `h → a·h + b` (mod 2⁶⁴) — the universal-hash
  * "permutation" family MinHash needs. A native expression because plain
  * Column arithmetic throws on long overflow under ANSI mode, while Java
  * long arithmetic wraps silently — and mod-2⁶⁴ wrapping is exactly the
  * semantic a hash mix wants. Portable: any engine with 128-bit integers
  * can replay `(a·h + b) mod 2⁶⁴` (see the DuckDB oracles in Dedup).
  */
case class Mix64(child: Expression, a: Long, b: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mix64 expects a bigint argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mix64"

  override def nullSafeEval(input: Any): Any =
    a * input.asInstanceOf[Long] + b

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${a}L * $c + ${b}L;")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

/** SplitMix64 finalizer (Steele/Lea/Flood's SplittableRandom mix, the
  * public-domain xor-shift-multiply avalanche): the ORDERING-grade
  * scrambler the affine [[Mix64]] is not. An affine map a·h+b mod 2⁶⁴
  * is monotone between wraparounds, so over dense sequential inputs its
  * HIGH bits barely move — fine for a mod-10⁶ keep rate (the low bits
  * equidistribute), useless as a sort key (F25 measured 498/499
  * doc_id-ascending adjacent pairs under Mix64). Three rounds give full
  * avalanche; wrapping Java long semantics; replayable exactly in any
  * 128-bit-integer engine via xor + floor-divide + mod-2⁶⁴ multiply.
  */
case class Avalanche64(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_avalanche64 expects a bigint argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_avalanche64"

  override def nullSafeEval(input: Any): Any = {
    var z = input.asInstanceOf[Long]
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""
         |long $z = $c;
         |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |${ev.value} = $z ^ ($z >>> 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Avalanche64 =
    copy(child = newChild)
}

/** Wrapping polynomial fold over an array<long>: s = 31·s + xᵢ (mod 2⁶⁴)
  * from seed 1125899906842597 — combines a band index + its minhash rows
  * into one 64-bit band signature in a single pass, again with wrapping
  * (not throwing) overflow semantics and a portable mod-2⁶⁴ definition.
  */
case class Combine64(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_combine64 expects array<bigint>, got ${t.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_combine64"
  // a null ELEMENT nulls the result even when the array itself is
  // non-null — without this override codegen would constant-fold isNull
  // to false and emit 0-hash garbage for such rows
  override def nullable: Boolean = true

  // a null ELEMENT nulls the whole hash (SQL semantics) — silently
  // hashing nulls as 0 would collide distinct inputs for SQL callers
  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    var s = 1125899906842597L
    var i = 0
    while (i < xs.numElements()) {
      if (xs.isNullAt(i)) return null
      s = 31L * s + xs.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |long $s = 1125899906842597L;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s = 31L * $s + $c.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Combine64 =
    copy(child = newChild)
}

/** PQ nearest-codeword argmin: left = one subspace's tick subvector
  * (`array<bigint>`), right = the subspace's codebook (an
  * `array<array<bigint>>` LITERAL, k codewords × d ticks). Returns the
  * order-preserving encoding `d2 · 256 + ordinal` of the nearest
  * codeword under exact integer L2, ties to the lowest ordinal — so a
  * numeric min over the encodings IS the (d2, code) lexicographic
  * argmin, and callers decode with `>> 8` / `& 255`.
  *
  * Why native: the composed formulation (`array_min` over k structs of
  * [[IntSqDist]] calls, times S subspaces) inlines k·S distance loops
  * into one generated method — past the JVM's 8 KB JIT limit the WHOLE
  * fused stage runs as interpreted bytecode, including any join loop
  * fused after it. One small per-subspace loop keeps the stage JIT'd.
  * Encoding headroom: d2 ≤ d·maxdiff², so d2·256 fits a long for any
  * realistic tick scale (10⁻⁶ ticks of unit-norm floats: ~3·10¹⁶).
  */
case class PqNearest(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_nearest expects (array<bigint>, array<array<bigint>>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_nearest"
  // empty codebook, length-mismatched codeword, or null element -> NULL
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val subv = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val k = cb.numElements()
    if (k == 0 || k > 256) return null
    val n = subv.numElements()
    var best = Long.MaxValue
    var c = 0
    while (c < k) {
      if (cb.isNullAt(c)) return null
      val cw = cb.getArray(c)
      if (cw.numElements() != n) return null
      var acc = 0L
      var i = 0
      while (i < n) {
        if (subv.isNullAt(i) || cw.isNullAt(i)) return null
        val d = subv.getLong(i) - cw.getLong(i)
        acc += d * d
        i += 1
      }
      val enc = (acc << 8) | c
      if (enc < best) best = enc
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cw = ctx.freshName("cw")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val enc = ctx.freshName("enc")
      val best = ctx.freshName("best")
      s"""
         |int $k = $b.numElements();
         |int $n = $a.numElements();
         |long $best = Long.MAX_VALUE;
         |if ($k == 0 || $k > 256) { ${ev.isNull} = true; }
         |for (int $c = 0; !${ev.isNull} && $c < $k; $c++) {
         |  if ($b.isNullAt($c)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $cw = $b.getArray($c);
         |  if ($cw.numElements() != $n) { ${ev.isNull} = true; break; }
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $cw.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $cw.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (${ev.isNull}) break;
         |  long $enc = ($acc << 8) | (long) $c;
         |  if ($enc < $best) $best = $enc;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqNearest =
    copy(left = newLeft, right = newRight)
}

/** Per-subspace PQ distance row: left = a probe's tick subvector, right
  * = the subspace codebook literal (as in [[PqNearest]]). Returns the
  * `array<bigint>` of exact integer L2 distances to every codeword — one
  * row of the probe's ADC lookup table, in codebook-ordinal order.
  * Same JIT rationale as [[PqNearest]]: the probe side scales with the
  * corpus (1% sample), so its encode stage must also stay compiled.
  */
case class PqDists(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_dists expects (array<bigint>, array<array<bigint>>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_dists"
  // mismatched codeword length or null element -> NULL
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val subv = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val k = cb.numElements()
    val n = subv.numElements()
    val out = new Array[Long](k)
    var c = 0
    while (c < k) {
      if (cb.isNullAt(c)) return null
      val cw = cb.getArray(c)
      if (cw.numElements() != n) return null
      var acc = 0L
      var i = 0
      while (i < n) {
        if (subv.isNullAt(i) || cw.isNullAt(i)) return null
        val d = subv.getLong(i) - cw.getLong(i)
        acc += d * d
        i += 1
      }
      out(c) = acc
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cw = ctx.freshName("cw")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      s"""
         |int $k = $b.numElements();
         |int $n = $a.numElements();
         |long[] $out = new long[$k];
         |for (int $c = 0; !${ev.isNull} && $c < $k; $c++) {
         |  if ($b.isNullAt($c)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $cw = $b.getArray($c);
         |  if ($cw.numElements() != $n) { ${ev.isNull} = true; break; }
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $cw.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $cw.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  $out[$c] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqDists =
    copy(left = newLeft, right = newRight)
}

/** Fused distinct-set Jaccard over two array<string> columns — VALUE-
  * IDENTICAL to `size(array_intersect(a, b)).cast("double") /
  * size(array_union(a, b))` (r15, r14 verdict directive #7; guide §1.2
  * per-task work): both operands of the division are the same exact
  * integers, so the double quotient is bit-equal. (Sole divergence: on
  * TWO EMPTY arrays — union size 0, unreachable for every caller, since
  * shingled()/grams emit ≥1 element — the composed divide raises
  * DIVIDE_BY_ZERO under ANSI while this returns NaN; error-vs-NaN on an
  * impossible input, never a value difference.) The composed form
  * builds three hash
  * sets and MATERIALIZES two intermediate arrays (full element copies)
  * per pair just to take their sizes; this expression computes both
  * cardinalities in one pass over each array with one hash set and two
  * counters — no intermediate arrays, no copies. Null ELEMENTS follow
  * array_intersect/array_union semantics exactly: null counts as one
  * distinct value, in the intersection iff present on both sides.
  * JaccardSimSpec pins the per-pair equality against the composed form.
  */
case class JaccardSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaccard expects two array<string> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.of(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // one static call — the loop lives in a real JVM method (the
  // RollWindowHash64 discipline: JIT-compiled, immune to the 8 KB
  // generated-method cliff), still fused into whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardSim.of($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  /** |distinct(a) ∩ distinct(b)| / |distinct(a) ∪ distinct(b)| as the
    * exact double quotient of the two int cardinalities.
    */
  def of(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val setA = new java.util.HashSet[UTF8String](Math.max(4, na * 2))
    var aNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aNull = true
      else setA.add(a.getUTF8String(i))
      i += 1
    }
    // one pass over b: seenB dedupes b's own repeats; an element of b is
    // an intersection hit iff it is in setA (counted once), else a
    // union-only extra (counted once)
    val seenB = new java.util.HashSet[UTF8String](Math.max(4, nb * 2))
    var bNull = false
    var inter = 0
    var extra = 0
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bNull = true
      else {
        val e = b.getUTF8String(i)
        if (seenB.add(e)) { if (setA.contains(e)) inter += 1 else extra += 1 }
      }
      i += 1
    }
    val interN = inter + (if (aNull && bNull) 1 else 0)
    val unionN = setA.size + extra +
      (if (aNull || bNull) 1 else 0)
    interN.toDouble / unionN
  }
}

/** The full PII cascade — email → phone → id — fused into ONE expression
  * (r15, r14 verdict directive #6; guide §1.2 per-task work): returns
  * struct(n_email, n_phone, n_id, redacted). VALUE-IDENTICAL to the
  * composed `size(regexp_extract_all(...))` + `regexp_replace(...)`
  * chain: each class's count and replacement come from the SAME
  * java.util.regex Matcher walk Spark's own RegExpReplace /
  * RegExpExtractAll run, in the same class order on the same
  * intermediate strings — the count of find()s IS the number of
  * replacements. The composed form pays SIX regex passes per row (one
  * extract_all + one replace per class) and materializes a matched-
  * substrings array per class just to take its size; the fused form
  * pays three and allocates nothing but the rewritten strings.
  * RedactCascadeSpec pins per-row equality against the composed chain.
  *
  * The pattern/replacement triples are compiled ONCE per JVM (static
  * finals) from [[RedactCascade.patterns]] — the single definition of
  * the cascade, re-exported by ops.Redact so the contract query, the
  * oracle SQL and this expression can never disagree.
  */
case class RedactCascade(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_redact_cascade expects a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType = RedactCascade.outType
  override def prettyName: String = "graft_redact_cascade"

  override def nullSafeEval(input: Any): Any =
    RedactCascade.redact(input.asInstanceOf[UTF8String])

  // one static call — the matcher loops live in a real JVM method (the
  // RollWindowHash64 discipline), still fused into whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RedactCascade.redact($c);")

  override protected def withNewChildInternal(newChild: Expression): RedactCascade =
    copy(child = newChild)
}

object RedactCascade {
  /** The cascade, in application order — THE definition (ops.Redact
    * re-exports it). RE2-compatible, and the phone separator class
    * spells out its whitespace explicitly (Java \s includes \x0B,
    * RE2's does not) — see ops.Redact for the full rationale.
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+[0-9][0-9() \\t\\n\\r\\f.-]{6,}[0-9]", "<PHONE>"),
    ("id", "[0-9]{9,}", "<ID>"))

  val outType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      patterns.map { case (name, _, _) =>
        org.apache.spark.sql.types.StructField(
          s"n_$name", org.apache.spark.sql.types.IntegerType, nullable = false)
      } :+ org.apache.spark.sql.types.StructField(
        "redacted", StringType, nullable = false))

  private val compiled: Array[(java.util.regex.Pattern, String)] =
    patterns.map { case (_, p, r) =>
      (java.util.regex.Pattern.compile(p), r)
    }.toArray

  /** Count-and-replace each class in declared order on the text as
    * already redacted by the earlier classes — exactly the composed
    * chain's sequential semantics.
    */
  def redact(input: UTF8String): InternalRow = {
    var t = input.toString
    val counts = new Array[Any](compiled.length + 1)
    var ci = 0
    while (ci < compiled.length) {
      val (p, rep) = compiled(ci)
      val m = p.matcher(t)
      var n = 0
      if (m.find()) {
        val sb = new java.lang.StringBuffer(t.length)
        do {
          n += 1
          m.appendReplacement(sb, rep)
        } while (m.find())
        m.appendTail(sb)
        t = sb.toString
      }
      counts(ci) = n
      ci += 1
    }
    counts(compiled.length) = UTF8String.fromString(t)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(counts)
  }
}
