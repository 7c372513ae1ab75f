package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** D17 — `dedup_block_tune`: D16's auto-tuning discipline generalized
  * to the SIMHASH family (round-9 stretch #9). D3's 4×16-bit block
  * index is a constant someone once picked; the quantity that decides
  * a block scheme before a 100 TB run is the exact collision
  * probability P(candidate | hamming = h) for k equal blocks of
  * m = 64/k bits: a pair surfaces iff SOME block carries none of the h
  * differing bits, and with the differing positions uniform that is
  * inclusion–exclusion over clean blocks —
  * P = Σ_{j=1..k} (−1)^{j+1} C(k,j)·C(64−j·m, h) / C(64, h) —
  * a ratio of binomials, EXACT in integers. The pigeonhole case falls
  * out: h < k forces a clean block and the formula closes at exactly 1
  * (the identity D3's 4-blocks-for-hamming≤3 constant encodes).
  *
  * The tuner derives k from (H, target recall ρ): the FEWEST equal
  * blocks whose estimate at the verify threshold h = H clears ρ —
  * fewest blocks = widest block values = least chance-collision
  * candidate mass (a width-m block collides by luck at ~n²/2^m, so
  * every halving of m multiplies false candidates; minimal feasible k
  * is the whole game). At the contract point (H = 7, ρ = 900‰): 4
  * blocks estimate 441‰ — infeasible — and 8 blocks close at exactly
  * 1000‰ (pigeonhole, 7 < 8), so the tuner lands 8×8. At D3's own
  * H = 3 the tuner returns 4 — PROVING the 4×16 constant minimal
  * rather than assuming it (2 blocks estimate only 238‰).
  *
  * The contract row runs the per-scheme recall audit on the real
  * corpus (10% probe panel, exact bit_count(xor) ≤ H truth — the
  * probe-bounded D15 shape) under BOTH schemes through the same
  * lossless triangle-guarded block join D3 serves with; every estimate
  * replays in the oracle as staged binomial product-divide chains
  * (exact at every step — the D16 discipline: the driver hash-proves
  * the TUNING MATH, not just the audit counts).
  */
object BlockTune {

  private[graft] val hammingMax = 7
  private[graft] val rhoPermille = 900L
  private[graft] val defaultBlocks = 4

  /** C(n, k) exactly; staged product-divide (each prefix is itself a
    * binomial, so every division is exact).
    */
  private[graft] def binom(n: Int, k: Int): BigInt =
    if (k < 0 || k > n) BigInt(0)
    else (1 to k).foldLeft(BigInt(1))((c, i) => c * (n - i + 1) / i)

  /** Exact per-mille P(≥1 clean block | h differing bits uniformly
    * placed over 64 positions) for k equal blocks.
    */
  private[graft] def estRecallPermille(k: Int, h: Int): Long = {
    val m = 64 / k
    val num = (1 to k).map(j =>
      BigInt(if (j % 2 == 1) 1 else -1) * binom(k, j) * binom(64 - j * m, h)).sum
    ((num * 1000) / binom(64, h)).toLong
  }

  /** The fewest equal blocks whose estimate clears ρ at h = H. */
  private[graft] def tune(h: Int = hammingMax, rho: Long = rhoPermille): Int =
    Seq(1, 2, 4, 8, 16, 32).find(k => estRecallPermille(k, h) >= rho)
      .getOrElse(throw new IllegalArgumentException(
        s"no equal-block scheme reaches ${rho}‰ at hamming $h"))

  /** One scheme's probe-panel audit: (n_truth, n_candidates, n_hits,
    * recall_pct) as a lazy 1-row frame. Truth is probe-bounded
    * (|panel|·n exact XOR popcounts, panel broadcast); candidates ride
    * the same triangle-guarded block join as D3.
    */
  private def blockAudit(spark: SparkSession, dir: String, k: Int): DataFrame =
    // The panel modulus is derived from the DOCUMENTS count — the same
    // table panelModSql counts — not from the signature frame: they are
    // equal today (one sig row per doc), but a future doc yielding zero
    // sig rows would silently give engine and oracle different moduli
    // and a whole-audit hash mismatch (r11 ADVICE).
    blockAuditOf(Dedup.simhashSigs(spark, dir), k, s"blocktune.$k:$dir",
      Some(Dedup.panelModOf(Tables.documents(spark, dir))))

  /** The audit over an ARBITRARY signature frame — the spec drives a
    * constructed borderline corpus (pairs at hamming 4..7, where the
    * default 16-bit blocks measurably miss and the tuned 8-bit scheme
    * is pigeonhole-guaranteed) through the same machinery.
    */
  private[graft] def blockAuditOf(sigs: DataFrame, k: Int,
                                  guardTag: String,
                                  panelMod: Option[Long] = None): DataFrame = {
    val m = 64 / k
    def blkVal(i: Int) =
      if (m == 64) col("simhash")
      else shiftright(col("simhash"), i * m).bitwiseAND(lit((1L << m) - 1))
    val blocks = HotBucket.triangleReplicate(
      sigs.select(col("doc_id"), explode(array(
        (0 until k).map(i =>
          struct(lit(i).as("blk"), blkVal(i).as("blk_val"))): _*)).as("b"))
        .select(col("doc_id"), col("b.blk"), col("b.blk_val")),
      Seq("blk", "blk_val"), col("doc_id"), guardTag)
    val l = blocks.select(col("blk"), col("blk_val"), col("tmin"), col("tmax"),
      col("grp").as("g_a"), col("doc_id").as("a"))
    val r = blocks.select(col("blk"), col("blk_val"), col("tmin"), col("tmax"),
      col("grp").as("g_b"), col("doc_id").as("b"))
    val pm = panelMod.getOrElse(Dedup.panelModOf(sigs))
    val cand = l.join(r, Seq("blk", "blk_val", "tmin", "tmax"))
      .filter(HotBucket.trianglePairFilter(col("g_a"), col("g_b")))
      .filter(col("a") % pm === 0 || col("b") % pm === 0)
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val panel = sigs.filter(col("doc_id") % pm === 0)
      .select(col("doc_id").as("pid"), col("simhash").as("shp"))
    val truth = sigs.crossJoin(broadcast(panel))
      .filter(col("doc_id") =!= col("pid"))
      .filter(bit_count(col("simhash").bitwiseXOR(col("shp"))) <= hammingMax)
      .select(least(col("doc_id"), col("pid")).as("a"),
        greatest(col("doc_id"), col("pid")).as("b"))
      .distinct()
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(truth.join(cand, Seq("a", "b"))
        .agg(count(lit(1)).as("n_hits")))
      .select(col("n_truth"), col("n_candidates"), col("n_hits"),
        Dedup.recallPctCol.as("recall_pct"))
  }

  def dedupBlockTune(spark: SparkSession, dir: String): DataFrame = {
    val tk = tune()
    Seq(("default", defaultBlocks), ("tuned", tk)).map { case (name, k) =>
      blockAudit(spark, dir, k)
        .select(lit(name).as("scheme"), lit(k.toLong).as("blocks"),
          lit((64 / k).toLong).as("block_bits"),
          lit(estRecallPermille(k, hammingMax)).as("est_recall_permille"),
          col("n_truth"), col("n_candidates"), col("n_hits"), col("recall_pct"))
    }.reduce(_.unionByName(_)).orderBy("scheme")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_block_tune" -> (dedupBlockTune _))

  /** C(n, h) as a staged product-divide chain — exact at every step in
    * SQL for the same reason the Scala is: each prefix is a binomial.
    */
  private def binomSql(n: Int, h: Int): String =
    if (h < 0 || h > n) "0::HUGEINT"
    else (1 to h).foldLeft("1::HUGEINT")((acc, i) => s"(($acc * ${n - i + 1}) // $i)")

  /** The inclusion–exclusion estimate as HUGEINT SQL — the oracle
    * recomputes the tuning math (D16's estSql discipline).
    */
  private def estSql(k: Int, h: Int): String = {
    val m = 64 / k
    val terms = (1 to k).map { j =>
      val sign = if (j % 2 == 1) "+" else "-"
      s"$sign (${binomSql(k, j)} * ${binomSql(64 - j * m, h)})"
    }.mkString(" ")
    s"CAST(((0::HUGEINT $terms) * 1000) // ${binomSql(64, h)} AS BIGINT)"
  }

  private def blockCtes(k: Int, p: String): String = {
    val m = 64 / k
    val arms = (0 until k).map { i =>
      val div = BigInt(1) << (i * m)
      val mod = BigInt(1) << m
      s"SELECT doc_id, $i AS blk, (sigu // $div::HUGEINT) % $mod::HUGEINT AS blk_val FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""${p}bl AS (
       |  $arms),
       |${p}cand AS MATERIALIZED (
       | SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       | FROM ${p}bl l JOIN ${p}bl r
       |   ON l.blk = r.blk AND l.blk_val = r.blk_val AND l.doc_id < r.doc_id
       | WHERE l.doc_id % ${Dedup.panelModSql} = 0
       |    OR r.doc_id % ${Dedup.panelModSql} = 0)""".stripMargin
  }

  private def schemeArm(name: String, k: Int, p: String): String =
    s"""SELECT '$name' AS scheme, CAST($k AS BIGINT) AS blocks,
       |  CAST(${64 / k} AS BIGINT) AS block_bits,
       |  ${estSql(k, hammingMax)} AS est_recall_permille,
       |  (SELECT count(*) FROM truth) AS n_truth,
       |  (SELECT count(*) FROM ${p}cand) AS n_candidates,
       |  (SELECT count(*) FROM truth JOIN ${p}cand USING (a, b)) AS n_hits,
       |  CAST(CASE WHEN (SELECT count(*) FROM truth) = 0 THEN -1
       |       ELSE (SELECT count(*) FROM truth JOIN ${p}cand USING (a, b)) * 100
       |            // (SELECT count(*) FROM truth) END AS BIGINT) AS recall_pct""".stripMargin

  val oracles: Map[String, String] = {
    val tk = tune()
    Map("dedup_block_tune" ->
      s"""WITH ${Dedup.simhashSigCtes},
         |p AS (SELECT doc_id AS pid, simhash AS shp FROM sigs
         |      WHERE doc_id % ${Dedup.panelModSql} = 0),
         |truth AS MATERIALIZED (
         | SELECT DISTINCT least(s.doc_id, p.pid) AS a,
         |        greatest(s.doc_id, p.pid) AS b
         | FROM sigs s CROSS JOIN p
         | WHERE s.doc_id <> p.pid
         |  AND bit_count(xor(s.simhash, p.shp)) <= $hammingMax),
         |${blockCtes(defaultBlocks, "d_")},
         |${blockCtes(tk, "t_")}
         |SELECT * FROM (
         |  ${schemeArm("default", defaultBlocks, "d_")}
         |  UNION ALL
         |  ${schemeArm("tuned", tk, "t_")})
         |ORDER BY scheme""".stripMargin)
  }
}
