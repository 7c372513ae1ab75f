package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** D16 — `dedup_band_tune`: the BANDING AUTO-TUNER (round-9 directive
  * #6). D2's 8-band × 4-row scheme is a constant someone once picked;
  * the quantity that actually decides a banding before a 100 TB dedup
  * run is the S-curve P(candidate | J) = 1 − (1 − J^r)^b at the
  * operator's own verify threshold τ. The tuner derives (bands, rows)
  * from (τ, target recall ρ): among schemes within the permutation
  * budget whose estimated recall at τ clears ρ, take the STEEPEST
  * feasible curve (max rows-per-band — steeper means fewer low-J false
  * candidates, i.e. less verify work per true pair) with the fewest
  * bands (less signature state). At τ=0.5, ρ=0.9, budget 64: the
  * default 8×4 estimates only 404‰ recall; the tuner lands 18×3
  * (54 permutations, 912‰) — r=4 cannot reach 900‰ inside the budget.
  *
  * Every estimate is EXACT integer arithmetic in per-mille ticks
  * (τ^r by integer power/floor-divide, the (1−τ^r)^b decay as a
  * truncating ×(1000−q)/1000 recurrence), so the S-curve numbers
  * replay bit-for-bit in the oracle — the driver hash-proves the
  * TUNING MATH, not just the audit counts. The contract row then runs
  * D15's probe-panel recall audit under BOTH schemes on the real
  * corpus through the same guarded candidate join; Round9fSpec runs
  * the audit on a constructed borderline-pair corpus (true J ≈ τ)
  * where the default measurably misses and the tuned scheme hits.
  *
  * Scale shape: per scheme one D2-shaped signature build (numPerm
  * mixes over one shingle-hash scan, map-side min-combine) and one
  * salted band-bucket join — the tuner itself is O(budget²) driver
  * integer arithmetic, free.
  */
object BandTune {

  private[graft] val tauPermille = 500L
  private[graft] val rhoPermille = 900L
  private[graft] val permBudget = 64
  private[graft] val maxRows = 8

  /** Exact S-curve recall estimate in per-mille ticks: q = ⌊τ^r⌋ in
    * per-mille, then b truncating decay steps s ← ⌊s·(1000−q)/1000⌋;
    * estimate = 1000 − s. Pure integer — replays in HUGEINT. The
    * truncation floors the SURVIVOR mass, so the estimate is OPTIMISTIC
    * by at most b ticks (Round9iSpec property-bounds it against the
    * closed form) — at the contract decision boundary the true closed
    * form still clears: 18×3 closes at 909‰ ≥ 900 while 17 bands'
    * integer 899 correctly rejects.
    */
  private[graft] def estRecallPermille(tau: Long, r: Int, b: Int): Long = {
    val q = (BigInt(tau).pow(r) / BigInt(1000).pow(r - 1)).toLong
    var s = 1000L
    var i = 0
    while (i < b) { s = s * (1000L - q) / 1000L; i += 1 }
    1000L - s
  }

  /** (bands, rowsPerBand) for the steepest feasible scheme. */
  private[graft] def tune(tau: Long = tauPermille, rho: Long = rhoPermille,
                          budget: Int = permBudget, maxR: Int = maxRows): (Int, Int) = {
    val feasible = for {
      r <- 1 to maxR
      b <- 1 to budget / r
      if estRecallPermille(tau, r, b) >= rho
    } yield (r, b)
    require(feasible.nonEmpty,
      s"no (bands, rows) within budget $budget reaches ${rho}‰ recall at ${tau}‰")
    val r = feasible.map(_._1).max
    val b = feasible.filter(_._1 == r).map(_._2).min
    (b, r)
  }

  def dedupBandTune(spark: SparkSession, dir: String): DataFrame = {
    val (tb, tr) = tune()
    val docs = Tables.documents(spark, dir)
    val schemes = Seq(("default", 8, 4), ("tuned", tb, tr))
    schemes.map { case (name, b, r) =>
      Dedup.recallAuditOf(docs, b * r, b, s"bandtune.$name:$dir")
        .select(lit(name).as("scheme"),
          lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          lit(estRecallPermille(tauPermille, r, b)).as("est_recall_permille"),
          col("n_truth"), col("n_candidates"), col("n_hits"), col("recall_pct"))
    }.reduce(_.unionByName(_)).orderBy("scheme")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_band_tune" -> (dedupBandTune _))

  /** The S-curve estimate as unrolled HUGEINT SQL — the same integer
    * recurrence the Scala tuner runs, recomputed by the oracle so the
    * driver hash-proves the tuning math itself.
    */
  private def estSql(r: Int, b: Int): String = {
    val qNum = (1 until r).map(_ => " * 500").mkString
    val q = s"((500::HUGEINT$qNum) // ${BigInt(1000).pow(r - 1)})"
    var s = "1000::HUGEINT"
    (1 to b).foreach(_ => s = s"(($s * (1000 - $q)) // 1000)")
    s"CAST(1000 - $s AS BIGINT)"
  }

  private def schemeArm(name: String, b: Int, r: Int, p: String): String =
    s"""SELECT '$name' AS scheme, CAST($b AS BIGINT) AS bands,
       |  CAST($r AS BIGINT) AS rows_per_band,
       |  ${estSql(r, b)} AS est_recall_permille,
       |  (SELECT count(*) FROM truth) AS n_truth,
       |  (SELECT count(*) FROM ${p}pc) AS n_candidates,
       |  (SELECT count(*) FROM truth JOIN ${p}pc USING (a, b)) AS n_hits,
       |  CAST(CASE WHEN (SELECT count(*) FROM truth) = 0 THEN -1
       |       ELSE (SELECT count(*) FROM truth JOIN ${p}pc USING (a, b)) * 100
       |            // (SELECT count(*) FROM truth) END AS BIGINT) AS recall_pct""".stripMargin

  val oracles: Map[String, String] = {
    val (tb, tr) = tune()
    Map("dedup_band_tune" ->
      s"""WITH ${Dedup.shingleHashCtes},
         |pex AS (SELECT doc_id AS pid, unnest(shingles) AS shingle
         |        FROM sh WHERE doc_id % ${Dedup.panelModSql} = 0),
         |tsz AS MATERIALIZED (SELECT doc_id, len(shingles) AS ns FROM sh),
         |tinter AS MATERIALIZED (
         | SELECT e.doc_id, px.pid, count(*) AS ni
         | FROM expl e JOIN pex px USING (shingle)
         | WHERE e.doc_id <> px.pid GROUP BY 1, 2),
         |truth AS MATERIALIZED (
         | SELECT DISTINCT least(i.doc_id, i.pid) AS a,
         |        greatest(i.doc_id, i.pid) AS b
         | FROM tinter i
         | JOIN tsz sa ON sa.doc_id = i.doc_id
         | JOIN tsz sb ON sb.doc_id = i.pid
         | WHERE 3 * i.ni >= sa.ns + sb.ns),
         |${Dedup.bandCandCtes(32, 8, "d_")},
         |d_pc AS MATERIALIZED (SELECT a, b FROM d_cand
         |  WHERE a % ${Dedup.panelModSql} = 0 OR b % ${Dedup.panelModSql} = 0),
         |${Dedup.bandCandCtes(tb * tr, tb, "t_")},
         |t_pc AS MATERIALIZED (SELECT a, b FROM t_cand
         |  WHERE a % ${Dedup.panelModSql} = 0 OR b % ${Dedup.panelModSql} = 0)
         |SELECT * FROM (
         |  ${schemeArm("default", 8, 4, "d_")}
         |  UNION ALL
         |  ${schemeArm("tuned", tb, tr, "t_")})
         |ORDER BY scheme""".stripMargin)
  }
}
