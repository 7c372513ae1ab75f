package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A production-scale subword vocabulary as a compact code-point trie —
  * the vocab-SCALABLE encoder the round-8 verdict led with (#1): the
  * literal-CASE formulation in [[graft.ops.Bpe]] is what makes the
  * DuckDB oracle exact, but it inlines the piece table into the
  * Catalyst tree, so at a real release-vocab size (32k–100k pieces) it
  * would blow both the expression tree and the 8 KB JIT method limit
  * the PQ expressions documented. Here the piece table lives OUTSIDE
  * the plan: one driver-built trie, shipped once per executor as a
  * `Broadcast`, and the generated code per row is a single call into
  * [[PieceTrie.countTokens]] — constant code size in |vocab|.
  *
  * Matching semantics are exactly the greedy longest-match
  * (maximal-munch) rule of the literal path: at each position take the
  * LONGEST vocabulary piece that matches, else consume one code point
  * (byte-fallback, as real BPE vocabularies guarantee); whitespace
  * (Java's regex `\s` set — space, tab, LF, VT, FF, CR, matching the
  * `split(trim(text), '[ \\t\\n\\x0B\\f\\r]+')` word accounting every consumer uses)
  * separates words and is never part of a token. Round9bSpec pins
  * trie ≡ literal fold on the shared contract vocabulary over the
  * whole corpus, and property-tests the trie against an independent
  * quadratic reference on adversarial strings.
  *
  * Layout: open-addressed transition table keyed `(node << 21) | cp`
  * (code points need 21 bits), linear probing at ≤ 50% load; values
  * are child node ids; one boolean per node marks piece ends. Walks
  * advance code-point-wise (NOT UTF-16 units), so the count agrees
  * with DuckDB's character-based `substr`/`length` replay on
  * supplementary-plane text.
  */
final class PieceTrie private[functions] (
    keys: Array[Long], vals: Array[Int], terminal: Array[Boolean],
    val nodeCount: Int, val pieceCount: Int) extends Serializable {

  private def mask: Int = keys.length - 1

  // stored key is (node<<21|cp) + 1 so 0 marks an empty slot
  private def lookup(node: Int, cp: Int): Int = {
    val key = ((node.toLong << 21) | cp) + 1L
    var i = (java.lang.Long.hashCode(key * 0x9E3779B97F4A7C15L)) & mask
    while (true) {
      val k = keys(i)
      if (k == key) return vals(i)
      if (k == 0L) return -1
      i = (i + 1) & mask
    }
    -1
  }

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** Greedy longest-match token count over a whole text: whitespace
    * runs separate words; each step consumes the longest matching
    * piece, else one code point. Equivalent to splitting on `\s+` and
    * folding the per-word maximal-munch recurrence (the literal path),
    * because pieces never contain whitespace.
    */
  def countTokens(text: UTF8String): Long = {
    val s = text.toString
    val len = s.length
    var i = 0
    var cnt = 0L
    while (i < len) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      if (isWs(cp)) i += w
      else {
        var node = lookup(0, cp)
        var j = i + w
        // fallback: one code point; a terminal first node is the same length
        var last = j
        var scan = node >= 0
        while (scan && j < len) {
          val c2 = s.codePointAt(j)
          if (isWs(c2)) scan = false
          else {
            node = lookup(node, c2)
            if (node < 0) scan = false
            else {
              j += Character.charCount(c2)
              if (terminal(node)) last = j
            }
          }
        }
        cnt += 1L
        i = last
      }
    }
    cnt
  }
}

object PieceTrie {

  /** Build from a piece list. Rejects empty/whitespace-carrying pieces
    * (a piece spanning a word boundary would silently change the word
    * accounting every consumer budget shares).
    */
  def apply(pieces: Seq[String]): PieceTrie = {
    val distinct = pieces.distinct
    require(distinct.nonEmpty, "empty vocabulary")
    distinct.foreach { p =>
      require(p.nonEmpty && !p.exists(c => c == ' ' || c == '\t' || c == '\n' ||
        c == 0x0B || c == '\f' || c == '\r'),
        s"vocabulary piece '$p' is empty or contains whitespace")
    }
    val totalCps = distinct.iterator.map(p => p.codePointCount(0, p.length)).sum
    // ≤ 50% load: capacity = next power of two past 2·(nodes ≤ totalCps)
    val cap = Integer.highestOneBit(math.max(16, totalCps * 4 - 1)) << 1
    val keys = new Array[Long](cap)
    val vals = new Array[Int](cap)
    val term = new Array[Boolean](totalCps + 1)
    val mask = cap - 1
    var nodes = 1
    def insert(node: Int, cp: Int): Int = {
      val key = ((node.toLong << 21) | cp) + 1L
      var i = java.lang.Long.hashCode(key * 0x9E3779B97F4A7C15L) & mask
      while (true) {
        val k = keys(i)
        if (k == key) return vals(i)
        if (k == 0L) {
          keys(i) = key; vals(i) = nodes; nodes += 1
          return nodes - 1
        }
        i = (i + 1) & mask
      }
      -1
    }
    distinct.foreach { p =>
      var node = 0
      var i = 0
      while (i < p.length) {
        val cp = p.codePointAt(i)
        node = insert(node, cp)
        i += Character.charCount(cp)
      }
      term(node) = true
    }
    new PieceTrie(keys, vals, term, nodes, distinct.size)
  }
}

/** Subword token count under a broadcast [[PieceTrie]] — the scalar
  * expression every token-budgeted operator's ENGINE path rides. The
  * generated code is one virtual call regardless of vocabulary size,
  * so the whole projection stays inside whole-stage codegen (a 100k
  * piece vocab adds ZERO generated bytecode — the 8 KB JIT cliff the
  * literal CASE would hit).
  *
  * `vocabTag` names the frozen vocabulary in explain output and keeps
  * expression equality semantic (Broadcast compares by reference; two
  * expressions over the same released vocab share the memoized
  * broadcast, see [[graft.ops.Bpe.trieFor]]).
  */
case class SubwordCount(child: Expression, trie: Broadcast[PieceTrie],
                        vocabTag: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_subword_count expects a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = s"graft_subword_count[$vocabTag]"

  override def nullSafeEval(input: Any): Any =
    trie.value.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bc = ctx.addReferenceObj("subwordTrie", trie,
        classOf[Broadcast[PieceTrie]].getName)
      s"${ev.value} = ((graft.functions.PieceTrie) $bc.value()).countTokens($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}
