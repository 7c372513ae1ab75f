package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A trained BPE merge list as a broadcast rank table — the
  * merge-COUNT-scalable encoder the round-9 verdict led with (#1):
  * F33's chained-replace realization is what makes the DuckDB oracle
  * exact, but it materializes one codegen `replace` call PER MERGE in
  * the Catalyst tree, so at a release tokenizer's 30k+ merges it is
  * structurally impossible (30k chained string ops per row). Here the
  * merge list lives OUTSIDE the plan — one driver-built table, shipped
  * once per executor as a `Broadcast` — and the per-word work is the
  * standard heap-driven BPE encode: O(len · log len) per word,
  * INDEPENDENT of the merge count.
  *
  * Semantics are EXACTLY the in-order one-pass-each rule the trainer
  * defines and F33 realizes (VocabTrain.scala: for each trained merge
  * in rank order, one left-to-right non-overlapping merge pass over
  * the whole word): Round10bSpec property-tests this implementation
  * against an independent plain-Scala chained-replace reference on
  * adversarial strings and random merge lists, and pins engine ≡
  * literal twin over the whole contract corpus.
  *
  * Why a heap reproduces the pass-by-pass rule: a min-heap on
  * (rank, position) pops ranks in nondecreasing order, and merging the
  * rank-r pair (l, r) can never create another rank-r occurrence
  * (the new symbol `lr` is strictly longer than both sides), so all
  * occurrences of a rank are exactly the ones a left-to-right pass
  * would see — stale entries (a side consumed by an earlier merge) are
  * detected by re-ranking the CURRENT pair at the popped position. The
  * one divergence heap-BPE (GPT-2 style, merge the lowest-rank pair
  * PRESENT) has from pass-by-pass is a pair RE-FORMED by a
  * later-ranked merge after its own pass already ran; the `watermark`
  * skip (drop any popped pair whose rank is below the highest rank
  * already merged) restores pass-by-pass exactly — a re-formed earlier
  * pair stays unmerged, as the chained replaces leave it.
  *
  * Whitespace (Java's `\s` set, matching the explicit
  * `[ \t\n\x0B\f\r]+` split every token consumer uses) separates
  * words; merge sides therefore must not contain whitespace — rejected
  * loudly at build, like PieceTrie's pieces.
  */
final class MergeTable private[functions] (
    ranks: java.util.HashMap[String, Integer], val mergeCount: Int)
  extends Serializable {

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** Rank of the adjacent pair splitting [l0, r1) at l1 (UTF-16
    * offsets), 0 if the pair is not a trained merge. Key = UTF-16
    * length of the LEFT side, ':', then the combined characters — the
    * split-point prefix keeps pairs with embedded arbitrary characters
    * collision-free.
    */
  private def rankOf(s: String, l0: Int, l1: Int, r1: Int,
                     sb: java.lang.StringBuilder): Int = {
    sb.setLength(0)
    sb.append(l1 - l0).append(':').append(s, l0, r1)
    val v = ranks.get(sb.toString)
    if (v == null) 0 else v.intValue
  }

  /** In-order BPE symbol count of one word s[ws, we) holding n code
    * points. Linked-list of symbol spans + a long-encoded
    * (rank << 32 | leftIdx) min-heap; `watermark` enforces the
    * pass-by-pass rule (see class doc).
    */
  private def encodeWord(s: String, ws: Int, we: Int, n: Int,
                         sb: java.lang.StringBuilder): Int = {
    if (n == 1) return 1
    val start = new Array[Int](n)
    val end = new Array[Int](n)
    var i = ws
    var k = 0
    while (i < we) {
      start(k) = i
      i += Character.charCount(s.codePointAt(i))
      end(k) = i
      k += 1
    }
    val nxt = new Array[Int](n)
    val prv = new Array[Int](n)
    val alive = new Array[Boolean](n)
    var x = 0
    while (x < n) {
      nxt(x) = if (x == n - 1) -1 else x + 1
      prv(x) = x - 1
      alive(x) = true
      x += 1
    }
    // binary min-heap of (rank << 32) | leftIdx
    var heap = new Array[Long](2 * n + 8)
    var hs = 0
    def push(v: Long): Unit = {
      if (hs == heap.length) heap = java.util.Arrays.copyOf(heap, heap.length * 2)
      heap(hs) = v; hs += 1
      var c = hs - 1
      while (c > 0 && heap((c - 1) / 2) > heap(c)) {
        val p = (c - 1) / 2
        val t = heap(p); heap(p) = heap(c); heap(c) = t
        c = p
      }
    }
    def pop(): Long = {
      val top = heap(0)
      hs -= 1
      heap(0) = heap(hs)
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = l + 1
        var m = c
        if (l < hs && heap(l) < heap(m)) m = l
        if (r < hs && heap(r) < heap(m)) m = r
        if (m == c) done = true
        else { val t = heap(m); heap(m) = heap(c); heap(c) = t; c = m }
      }
      top
    }
    var p = 0
    while (p < n - 1) {
      val r = rankOf(s, start(p), end(p), end(p + 1), sb)
      if (r > 0) push((r.toLong << 32) | p.toLong)
      p += 1
    }
    var watermark = 0
    var merged = 0
    while (hs > 0) {
      val e = pop()
      val r = (e >>> 32).toInt
      val li = (e & 0xFFFFFFFFL).toInt
      if (alive(li)) {
        val ri = nxt(li)
        if (ri >= 0 && rankOf(s, start(li), end(li), end(ri), sb) == r &&
            r >= watermark) {
          // merge: absorb ri into li
          end(li) = end(ri)
          alive(ri) = false
          nxt(li) = nxt(ri)
          if (nxt(li) >= 0) prv(nxt(li)) = li
          merged += 1
          watermark = r
          val pi = prv(li)
          if (pi >= 0) {
            val nr = rankOf(s, start(pi), end(pi), end(li), sb)
            if (nr > 0) push((nr.toLong << 32) | pi.toLong)
          }
          val ni = nxt(li)
          if (ni >= 0) {
            val nr = rankOf(s, start(li), end(li), end(ni), sb)
            if (nr > 0) push((nr.toLong << 32) | li.toLong)
          }
        }
      }
    }
    n - merged
  }

  /** Total in-order BPE symbol count over a whole text: whitespace
    * runs separate words, each word encodes independently (a merge
    * side never contains whitespace, so a pattern can never span a
    * word boundary — the same argument that makes F33's doc-level
    * replaces per-word decomposable).
    */
  def countTokens(text: UTF8String): Long = {
    val s = text.toString
    val len = s.length
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    var total = 0L
    while (i < len) {
      val cp = s.codePointAt(i)
      if (isWs(cp)) i += Character.charCount(cp)
      else {
        var j = i
        var n = 0
        while (j < len && !isWs(s.codePointAt(j))) {
          j += Character.charCount(s.codePointAt(j))
          n += 1
        }
        total += encodeWord(s, i, j, n, sb)
        i = j
      }
    }
    total
  }
}

object MergeTable {

  /** Build from the trained merge list in RANK ORDER. Rejects
    * empty/whitespace-bearing sides (a merge spanning a word boundary
    * would break per-word decomposition) and DUPLICATE pairs: a pair
    * trained at two ranks would need per-pass bookkeeping the
    * watermark rule cannot represent — fail loudly rather than encode
    * subtly differently from the chained replaces.
    */
  def apply(merges: Seq[(String, String)]): MergeTable = {
    require(merges.nonEmpty, "empty merge list")
    val ranks = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      Seq(l, r).foreach { side =>
        require(side.nonEmpty && !side.exists(c => c == ' ' || c == '\t' ||
          c == '\n' || c == 0x0B || c == '\f' || c == '\r'),
          s"merge side '$side' is empty or contains whitespace")
      }
      val key = s"${l.length}:$l$r"
      val prev = ranks.putIfAbsent(key, Integer.valueOf(i + 1))
      require(prev == null,
        s"duplicate merge pair ($l, $r) at ranks $prev and ${i + 1}")
    }
    new MergeTable(ranks, merges.size)
  }

  /** True when the list trains the same (l, r) pair at two ranks — a
    * LEGITIMATE training outcome (a later merge with a different split
    * can re-create a side's string, e.g. (ab,c) trained and then (a,bc)
    * re-creating 'abc' adjacent to 'c'), but the one shape the
    * watermark rank table cannot represent. Callers probe this BEFORE
    * [[apply]] and route duplicate-bearing lists through the
    * chained-replace encoder, which applies each rank as its own global
    * pass and handles re-learned pairs naturally.
    */
  def hasDuplicatePairs(merges: Seq[(String, String)]): Boolean = {
    val seen = new java.util.HashSet[String](merges.size * 2)
    merges.exists { case (l, r) => !seen.add(s"${l.length}:$l$r") }
  }
}

/** In-order BPE symbol count under a broadcast [[MergeTable]] — the
  * scalar expression the TRAINED-vocabulary consumers ride. Generated
  * code is one virtual call regardless of merge count (SubwordCount's
  * discipline), so a 30k-merge release tokenizer adds ZERO generated
  * bytecode and the projection stays inside whole-stage codegen.
  *
  * `mergesTag` names the trained merge list in explain output and
  * keeps expression equality semantic (Broadcast compares by
  * reference; expressions over the same training run share the
  * memoized broadcast, see [[graft.ops.VocabTrain.mergeTableFor]]).
  */
case class MergeEncodeCount(child: Expression, table: Broadcast[MergeTable],
                            mergesTag: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_merge_encode_count expects a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = s"graft_merge_encode_count[$mergesTag]"

  override def nullSafeEval(input: Any): Any =
    table.value.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bc = ctx.addReferenceObj("mergeTable", table,
        classOf[Broadcast[MergeTable]].getName)
      s"${ev.value} = ((graft.functions.MergeTable) $bc.value()).countTokens($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MergeEncodeCount =
    copy(child = newChild)
}
