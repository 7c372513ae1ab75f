package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Driver-artifact contract pins. Round 6 taught the lesson the hard
  * way: the bench's single stdout JSON line grew past the driver's
  * ~2000-char tail capture and `BENCH_r06.json` recorded
  * `parsed: null` — a blind gate with a healthy engine behind it. These
  * specs make every driver-facing channel a FAILING test when a future
  * widening would re-break it: the final bench line's length and
  * schema, the sidecar's schema, and Verify's two-positional-arg
  * contract.
  */
class BenchContractSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  /** Worst-case rendering: every per-query value at the widest %.3f
    * the bench can realistically emit (four integer digits = a 9999 s
    * query — far past anything a round would accept anyway).
    */
  private def worstCaseLine: String = {
    val results = Bench.headline.map(_ -> 9999.999)
    Bench.finalLine(99999.999, results, shuffleOk = false,
      gate = "advisory", sfDir = "/root/testdata/sf0.1")
  }

  test("bench final line stays under the driver tail-capture window") {
    val line = worstCaseLine
    assert(line.length < Bench.maxFinalLineChars,
      s"final bench line is ${line.length} chars >= ${Bench.maxFinalLineChars}: " +
        "the driver captures only the last ~2000 chars of stdout (sbt " +
        "appends ~100 more) — move new fields to Bench.sidecarLine")
  }

  test("the standing bench baseline stays anchored to the headline set") {
    // BASELINE_BENCH.json pins the round-9 driver bench (sf0.1) as the
    // standing per-query regression baseline — a future slowdown is
    // graded against a committed NUMBER, not round-over-round memory.
    // Structural contract only (wall-times are host-load-dependent, so
    // the time comparison itself belongs to the judge, not the suite):
    // every baselined query must still be a headline query, and the
    // artifact must parse with its graded fields.
    val node = mapper.readTree(
      new java.io.File("BASELINE_BENCH.json"))
    assert(node.get("total_sec").isNumber)
    val qs = node.get("queries_sec")
    assert(qs != null && qs.size() == node.get("n_queries").asInt())
    val headline = Bench.headline.toSet
    val it = qs.fieldNames()
    while (it.hasNext) {
      val q = it.next()
      assert(headline.contains(q),
        s"baseline query $q vanished from Bench.headline — a silent " +
          "de-benchmarking would un-grade its regression history")
      assert(qs.get(q).isNumber)
    }
  }

  test("bench final line is valid JSON with the graded fields") {
    val node = mapper.readTree(worstCaseLine)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("value").isNumber)
    assert(node.get("shuffle_ok").isBoolean)
    assert(Set("enforced", "advisory")(node.get("budget_gate").asText()))
    val qs = node.get("queries")
    assert(qs != null && qs.isObject)
    Bench.headline.foreach { name =>
      assert(qs.has(name), s"final line lost headline query $name")
      assert(qs.get(name).isNumber, s"non-numeric seconds for $name")
    }
    assert(qs.size() == Bench.headline.size,
      "final line carries queries outside the headline set")
  }

  test("bench final line stays parseable under a comma-decimal default locale") {
    // the round-7 ADVICE class: the f interpolator honors the JVM
    // default locale, and a de_DE default would render 1,234 instead
    // of 1.234 — an unparseable graded line, the same driver-blindness
    // failure the length budget guards via a different channel. The
    // formatter must pin Locale.ROOT regardless of the default.
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.finalLine(12.345,
        Seq("q_agg_pricing" -> 1.5, "q_join_shuffle" -> 0.25),
        shuffleOk = true, gate = "enforced", sfDir = "/x/sf0.1")
      val node = mapper.readTree(line) // throws on a comma decimal
      assert(node.get("value").asDouble() == 12.345)
      assert(node.get("queries").get("q_agg_pricing").asDouble() == 1.5)
      assert(!line.contains("12,345"), s"locale leaked into the line: $line")
    } finally java.util.Locale.setDefault(saved)
  }

  test("bench sidecar line is valid JSON carrying both shuffle maps") {
    val node = mapper.readTree(Bench.sidecarLine(
      Seq("a" -> 1L, "b" -> -1L), Seq("c" -> 42L)))
    assert(node.get("metric").asText() == "shuffle_bytes")
    assert(node.get("headline").get("a").asLong() == 1L)
    assert(node.get("headline").get("b").asLong() == -1L)
    assert(node.get("extended").get("c").asLong() == 42L)
  }

  test("shuffle-byte maps are NOT on the final line") {
    val line = worstCaseLine
    assert(!line.contains("shuffle_bytes"),
      "shuffle-byte maps crept back onto the graded line — that is the " +
        "exact round-6 regression (2911-char line, parsed:null)")
  }

  test("Verify accepts the driver's two-positional-arg contract") {
    // the driver always invokes `Verify <sfDir> <outDir>`; the optional
    // trailing names are a local-iteration aid. Exercise the REAL parse
    // main uses (no Spark start) so a signature change can't strand the
    // correctness gate.
    assert(Verify.parseArgs(Array("/x", "/y")) == (("/x", "/y", Set.empty)))
    assert(Verify.parseArgs(Array("/x", "/y", "q1", "q2")) ==
      (("/x", "/y", Set("q1", "q2"))))
    val m = Verify.getClass.getMethods.find(_.getName == "main").get
    assert(m.getParameterTypes.toSeq == Seq(classOf[Array[String]]))
  }
}
