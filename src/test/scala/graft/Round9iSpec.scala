package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PieceTrie
import graft.ops.BandTune

/** Round-9 randomized-property hardening (PropertySpec's discipline,
  * seeded so failures reproduce): the code-point trie against an
  * independent quadratic matcher over RANDOM vocabularies and texts,
  * and the integer S-curve against its closed-form double formula.
  */
class Round9iSpec extends AnyFunSuite {

  private def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' ||
    c == 0x0B || c == '\f' || c == '\r'

  /** Quadratic greedy longest-match reference (ASCII-only inputs here,
    * so UTF-16 units == code points).
    */
  private def refCount(vocab: Set[String], text: String): Long = {
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
    var i = 0; var cnt = 0L
    while (i < text.length) {
      if (isWs(text(i))) i += 1
      else {
        var end = i
        while (end < text.length && !isWs(text(end))) end += 1
        var step = 1
        var l = math.min(maxLen, end - i)
        while (step == 1 && l >= 2) {
          if (vocab.contains(text.substring(i, i + l))) step = l
          l -= 1
        }
        cnt += 1; i += step
      }
    }
    cnt
  }

  test("property: trie == quadratic reference on 300 random (vocab, text) pairs") {
    val rnd = new Random(1337)
    val alphabet = "abcd"
    def randPiece() =
      (0 until (2 + rnd.nextInt(3))).map(_ => alphabet(rnd.nextInt(4))).mkString
    (1 to 300).foreach { it =>
      val vocab = (1 to (1 + rnd.nextInt(12))).map(_ => randPiece()).distinct
      val trie = PieceTrie(vocab)
      val text = (0 until rnd.nextInt(40)).map { _ =>
        if (rnd.nextInt(5) == 0) " \t\n".charAt(rnd.nextInt(3))
        else alphabet(rnd.nextInt(4))
      }.mkString
      val got = trie.countTokens(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val want = refCount(vocab.toSet, text)
      assert(got == want,
        s"iter $it vocab=$vocab text='$text': trie=$got ref=$want")
    }
  }

  test("property: the integer S-curve tracks the closed form within its truncation error") {
    // each of the b decay steps truncates the survivor mass s DOWNWARD
    // by < 1 per-mille tick, so the recall estimate 1000 − s is
    // OPTIMISTIC by at most b ticks and never pessimistic by more than
    // a rounding tick: closed − 1 ≤ est ≤ closed + b
    val rnd = new Random(7)
    (1 to 500).foreach { _ =>
      val tau = 50L + rnd.nextInt(900)
      val r = 1 + rnd.nextInt(8)
      val b = 1 + rnd.nextInt(32)
      val est = BandTune.estRecallPermille(tau, r, b)
      val q = (BigInt(tau).pow(r) / BigInt(1000).pow(r - 1)).toLong
      val closed = 1000.0 * (1.0 - math.pow(1.0 - q / 1000.0, b))
      assert(est >= math.floor(closed) - 1 && est <= math.ceil(closed) + b,
        s"tau=$tau r=$r b=$b: est=$est closed=$closed")
      assert(est >= 0 && est <= 1000)
    }
  }
}
