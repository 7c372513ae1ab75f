package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.OracleRound.{r4b, sql4}
import graft.tables.Tables

/** Round-5 exact iterative-training twins — SURVEY.md §2.C30/C31.
  *
  * C28/C29 proved ONE training step of a linear model can be fully
  * oracle-replayed; this file extends the program to SEQUENTIAL training
  * loops: a second exact boosting round on top of the C22 stump (the
  * reference benches HistGradientBoostingClassifier, modeling.ipynb cells
  * 45-48), and a 3-round exact Lloyd k-means iteration (C13's assignment
  * step closed into a training loop). The engineering point both make:
  * iteration does NOT force approximation — keep every cross-row
  * aggregate in exact integer/rational space and each round is one
  * deterministic scan + tiny broadcast, bit-identical on any engine and
  * any partitioning, at any scale.
  */
object Ml5 {

  /** C30 — `ml_gbt_step2`: one EXACT boosting round on top of the C22
    * histogram stump (AdaBoost reweighting, all rational arithmetic).
    *
    * Round 1 IS C22's stump (unit weights, histogram Gini split — the
    * split XGBoost/LightGBM-style engines make). Round 2 reweights: the
    * normalized AdaBoost update puts total mass 1/2 on the misclassified
    * rows and 1/2 on the rest, so per-row weights are RATIONAL —
    * (W/2) div err and (W/2) div (n−err) in integer ticks of W=10¹² —
    * never the exp(α) floats of the textbook formulation, which would
    * break cross-engine exactness. Stump 2 trains on the weighted
    * histogram with the same machinery. The two-stump vote needs no
    * α = ½ln((1−ε)/ε) either: for two voters, sign(α₁h₁+α₂h₂) is "agree
    * → that label, disagree → the stump with the smaller weighted error",
    * and ε₁ vs ε₂ compares exactly as the integer cross-product
    * err₁·totalw₂ vs err₂w·n. Every output cell is an exact integer or a
    * rounded ratio of exact integers — the full two-round boosted model,
    * hash-verified cross-engine.
    *
    * Plan shape: boosting is inherently sequential, so each round is a
    * stateless full scan (melt projection + ≤60-group histogram + 1-row
    * broadcasts) — five fact scans total, zero data-sized shuffles, no
    * cached per-row state. That is the checkpoint-free boosting shape
    * that holds at 100 TB: the only state carried between rounds is the
    * O(1) stump + error-count broadcasts.
    */
  /** The per-round AdaBoost exponential-loss factor 2√(ε(1−ε)). */
  private def lossBound(eps: Column): Column =
    lit(2.0) * sqrt(eps * (lit(1.0) - eps))

  /** The C30/C32 contract base + features over lineitem, with the
    * binning min/max literals memoized per sf dir (shared by both
    * queries — the input projection is identical).
    */
  private def gbtContract(spark: SparkSession, dir: String):
      (DataFrame, Seq[(String, String)], Map[String, (Double, Double)]) = {
    val base = Tables.lineitem(spark, dir).select(
      col("l_discount"), col("l_extendedprice"), col("l_quantity"),
      (col("l_returnflag") === "R").cast("int").as("y"))
    val feats = Seq("disc" -> "l_discount", "price" -> "l_extendedprice",
      "qty" -> "l_quantity")
    // IMMUTABILITY ASSUMPTION (r15, advisor): unlike the DistRank bounds
    // memo (balance-only), stale min/max here would change binning
    // thresholds and thus RESULTS — the memo is sound only because sf
    // dirs are immutable test fixtures for the JVM's lifetime (the same
    // contract every codebook/salt-table memo in QueryCaches rests on).
    // Rewriting data under `dir` in a live JVM requires a new dir name.
    val mm = graft.QueryCaches.memo(s"ml5.stumpMm:$dir") {
      stumpMmOf(base, feats)
    }
    (base, feats, mm)
  }

  def mlGbtStep2(spark: SparkSession, dir: String): DataFrame = {
    val (base, feats, mm) = gbtContract(spark, dir)
    boostTwoStumps(base, feats, Some(mm))
  }

  /** The data-generic two-round core behind `ml_gbt_step2`: `base` holds
    * the numeric feature columns named by `features` (display-name →
    * column) plus an int 0/1 label `y`. Generic so the boosting DYNAMICS
    * are testable on synthetic data where reweighting provably must
    * select a different second stump (Round5Spec) — on lineitem the
    * optimal round-2 stump happens to re-split `disc` with flipped
    * weights, which is correct but undemonstrative.
    */
  /** (feature, bin, threshold, nl, pl, nr, pr) */
  private type Stump = (String, Int, Double, Long, Long, Long, Long)

  /** The shared histogram-stump machinery behind C30/C32: every piece of
    * inter-round state is O(1) — one stump row, two error counters,
    * per-feature min/max doubles — so it's collected once and INLINED AS
    * LITERALS (the E3-codebook / C31 discipline): each boosting round
    * becomes a single whole-stage-codegen scan with a tiny aggregate, no
    * broadcast joins and no re-executed subtrees. The driver-side double
    * arithmetic repeats the exact same IEEE operations as the SQL
    * oracles, so nothing drifts.
    */
  /** The per-feature min/max literals a StumpKit bins with — one
    * columnar scan (min/max commute with the melt). Factored out so the
    * contract callers can memoize it per sf dir (r14: it is bounded
    * construction state exactly like the codebook collects); synthetic
    * spec frames skip the memo and compute fresh.
    */
  private def stumpMmOf(base: DataFrame,
                        features: Seq[(String, String)]): Map[String, (Double, Double)] = {
    val mmRow = base.agg(
      features.flatMap { case (_, c) => Seq(min(c), max(c)) }.head,
      features.flatMap { case (_, c) => Seq(min(c), max(c)) }.tail: _*).head()
    features.zipWithIndex.map {
      case ((f, _), i) => f -> (mmRow.getDouble(2 * i), mmRow.getDouble(2 * i + 1))
    }.toMap
  }

  private final class StumpKit(base: DataFrame, features: Seq[(String, String)],
                               mmPre: Option[Map[String, (Double, Double)]] = None) {
    val mm: Map[String, (Double, Double)] =
      mmPre.getOrElse(stumpMmOf(base, features))
    private val featCol = features.toMap

    // identical binning expression to the histogram construction, so a
    // row's bin and its histogram cell can never disagree
    def binOf(f: String): Column = {
      val (vmin, vmax) = mm(f)
      least(floor((col(featCol(f)) - lit(vmin)) / (lit(vmax) - lit(vmin)) * 10),
        lit(9.0)).cast("int")
    }

    // per-row stump prediction: majority leaf label (2·pos == n ties to
    // 0 deterministically), pure literal projection
    def predict(s: Stump): Column = {
      val (f, bin, _, nl, pl, nr, pr) = s
      when(binOf(f) <= lit(bin),
        lit(if (2 * pl > nl) 1 else 0)).otherwise(lit(if (2 * pr > nr) 1 else 0))
    }

    // one scan: the per-(feature, bin) weighted class histogram — bins
    // computed per feature BEFORE the melt (literal min/max), collected
    // (≤ |features|·10 cells). r14: the cells also carry the UNWEIGHTED
    // (n, pos) pair — two extra agg buffers on the same scan — so the
    // per-round error aggregates are read off these cells instead of a
    // second full pass (see [[errTotal]]/[[errCnt]]).
    def hist(w: Column): Array[(String, Int, Long, Long, Long, Long)] = {
      val binCols = features.map { case (f, _) => binOf(f).as(s"_b_$f") }
      val stackExpr = s"stack(${features.size}, " +
        features.map { case (f, _) => s"'$f', _b_$f" }.mkString(", ") + ")"
      base.withColumn("_w", w)
        .select(col("y") +: col("_w") +: binCols: _*)
        .select(expr(stackExpr).as(Seq("feature", "bin")), col("y"), col("_w"))
        .groupBy("feature", "bin")
        .agg(sum("_w").as("wn"), sum(col("_w") * col("y")).as("wpos"),
          count(lit(1)).as("cn"), sum("y").cast("long").as("cpos"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
    }

    // exact weighted (error, total) of a stump read off the SAME
    // collected cells the argmin consumed — every row of a cell shares
    // the stump's predicted label (prediction is a function of the
    // cell's bin), so the misclassified weight per cell is wpos or
    // wn−wpos and the driver Long sums equal the full-scan aggregate
    // it replaces (sums of the same longs, regrouped). Guide §1.2:
    // one scan per boosting round instead of two.
    def errTotal(s: Stump,
                 cells: Array[(String, Int, Long, Long, Long, Long)]): (Long, Long) = {
      val (f, bin, _, nl, pl, nr, pr) = s
      val leftLab = if (2 * pl > nl) 1 else 0
      val rightLab = if (2 * pr > nr) 1 else 0
      var err = 0L; var tot = 0L
      cells.iterator.filter(_._1 == f).foreach { case (_, b, wn, wpos, _, _) =>
        val lab = if (b <= bin) leftLab else rightLab
        err += (if (lab == 1) wn - wpos else wpos)
        tot += wn
      }
      (err, tot)
    }

    // the UNWEIGHTED misclassification count of a stump, same identity
    // over the cells' (n, pos) pair
    def errCnt(s: Stump,
               cells: Array[(String, Int, Long, Long, Long, Long)]): Long = {
      val (f, bin, _, nl, pl, nr, pr) = s
      val leftLab = if (2 * pl > nl) 1 else 0
      val rightLab = if (2 * pr > nr) 1 else 0
      var err = 0L
      cells.iterator.filter(_._1 == f).foreach { case (_, b, _, _, cn, cpos) =>
        val lab = if (b <= bin) leftLab else rightLab
        err += (if (lab == 1) cn - cpos else cpos)
      }
      err
    }

    // candidate-split argmin over the collected histogram cells — driver
    // arithmetic, exact same formulas (and IEEE ops) and the same
    // (wgini, feature, bin) tie-break as the SQL candw argmin; phantom
    // empty-bin candidates tie with the preceding real bin and lose the
    // tie-break, so the selection matches the SQL exactly
    private def gini(p: Long, nn: Long): Double = {
      val q = p.toDouble / nn
      1.0 - q * q - (1.0 - q) * (1.0 - q)
    }
    def argminStump(cells: Array[(String, Int, Long, Long, Long, Long)]): Stump = {
      val cands = for {
        (f, _) <- features
        fc = cells.filter(_._1 == f)
        nTot = fc.map(_._3).sum
        posTot = fc.map(_._4).sum
        bin <- 0 until 9
        nl = fc.filter(_._2 <= bin).map(_._3).sum
        pl = fc.filter(_._2 <= bin).map(_._4).sum
        if nl > 0 && nTot > nl
      } yield {
        val (nr, pr) = (nTot - nl, posTot - pl)
        val (vmin, vmax) = mm(f)
        val thr = vmin + (bin + 1) * (vmax - vmin) / 10
        val wg = (nl * gini(pl, nl) + nr * gini(pr, nr)) / (nl + nr)
        (f, bin, thr, nl, pl, nr, pr, wg)
      }
      val b = cands.minBy(c => (c._8, c._1, c._2))
      (b._1, b._2, b._3, b._4, b._5, b._6, b._7)
    }
  }

  /** The AdaBoost weak-learnability contract made loud: reweighting
    * divides by both the error and the complement, so a perfect or
    * constant-wrong stump must fail with a named precondition, not an
    * ArithmeticException.
    */
  private def requireWeakLearner(round: Int, errW: Long, totalW: Long): Unit =
    require(errW > 0 && errW < totalW,
      s"weak-learnability contract: stump $round is " +
        (if (errW == 0) "perfect" else "constant-wrong") +
        s" (weighted error $errW of $totalW) — AdaBoost reweighting needs " +
        "0 < error < total")

  private[graft] def boostTwoStumps(base: DataFrame,
                                 features: Seq[(String, String)],
                                 mmPre: Option[Map[String, (Double, Double)]] = None): DataFrame = {
    val spark = base.sparkSession
    val kit = new StumpKit(base, features, mmPre)
    import kit.{argminStump, hist, predict}

    // stump 1 = C22's argmin on the UNIT-weight histogram (the shared
    // oracle recomputes it through the candw CTE, so the hash match
    // proves this driver path equals the C22 formulation)
    val cells1 = hist(lit(1L))
    val s1: Stump = argminStump(cells1)

    // round-1 error count read off the SAME unit-weight cells (w = 1 ⇒
    // weighted error IS the count) — was a second full scan (r14,
    // guide §1.2: 5 scans → 3 across the two rounds)
    val (err1, n) = kit.errTotal(s1, cells1)
    requireWeakLearner(1, err1, n)
    // AdaBoost reweighting in integer ticks: misclassified rows split
    // W/2 = 5·10¹¹ equally, the rest split the other half (truncating
    // division — identical on both engines)
    val (wErr, wCorr) = (500000000000L / err1, 500000000000L / (n - err1))
    val wCol = when(predict(s1) =!= col("y"), lit(wErr)).otherwise(lit(wCorr))

    // stump 2 on the reweighted histogram (one more scan)
    val cells2 = hist(wCol)
    val s2: Stump = argminStump(cells2)

    // round-2 weighted error + unweighted count, both off cells2
    val (err2w, totalW) = kit.errTotal(s2, cells2)
    val err2cnt = kit.errCnt(s2, cells2)

    // two-voter decision: agree → that label; disagree → the stump with
    // the smaller weighted error, compared exactly as integer
    // cross-products (h1 wins ties — deterministic, both engines). On
    // agree rows both labels coincide, so the vote is UNIFORMLY the
    // winning stump's label and the combined train accuracy is
    // n − err(winner) — no per-row vote pass needed.
    val correct2 = if (err1 * totalW <= err2w * n) n - err1 else n - err2cnt

    spark.range(1).select(
      lit(s1._1).as("f1"), lit(s1._2).as("bin1"), r4b(lit(s1._3)).as("thr1"),
      lit(s2._1).as("f2"), lit(s2._2).as("bin2"), r4b(lit(s2._3)).as("thr2"),
      lit(n).as("n"), lit(err1).as("err1"), lit(err2w).as("err2_w"),
      lit(totalW).as("total_w"), lit(correct2).as("correct2"),
      r4b(lit(err1.toDouble / n)).as("eps1"),
      r4b(lit(err2w.toDouble / totalW)).as("eps2"),
      r4b(lit(correct2.toDouble / n)).as("acc2"),
      // the AdaBoost exp-loss bound Π 2√(εt(1−εt)) after each round —
      // strictly decreasing while εt < ½, emitted so the ORACLE proves
      // the training-loss improvement, not just a local spec
      r4b(lossBound(lit(err1.toDouble / n))).as("loss1"),
      r4b(lossBound(lit(err1.toDouble / n)) *
        lossBound(lit(err2w.toDouble / totalW))).as("loss2"))
  }

  /** C32 — `ml_gbt_step3`: THREE exact boosting rounds with REAL
    * α-weighted voting. C30 stops at two voters, where
    * sign(α₁h₁+α₂h₂) degenerates to "agree → that label, disagree → the
    * smaller-error stump"; three-plus rounds need the general AdaBoost
    * committee sign(Σ αₜhₜ) with αₜ = ½ln((1−εₜ)/εₜ). Nothing goes
    * float: a prediction pattern votes 1 iff Σ_{hₜ=1}αₜ > Σ_{hₜ=0}αₜ
    * ⟺ Π_{hₜ=1}(Tₜ−eₜ)/eₜ > Π_{hₜ=0}(Tₜ−eₜ)/eₜ, which cross-multiplies
    * to ONE exact integer-product comparison per pattern —
    * Π(hₜ=1 ? Tₜ−eₜ : eₜ) vs Π(hₜ=1 ? eₜ : Tₜ−eₜ) — BigInt on the
    * driver, HUGEINT in the oracle (≤10³⁶ for 3 rounds of 10¹²-tick
    * totals; a tie votes 0, deterministic on both engines).
    *
    * Weights stay in exact integer ticks like C30: per-row weight after
    * round t is a function of the row's misclassification PATTERN under
    * stumps 1..t — ≤2ᵗ literal values, updated driver-side in BigInt
    * (wₜ₊₁ = (W/2)·wₜ div errₜ for wrong rows, div (Tₜ−errₜ) for right
    * rows — each round renormalizes total mass to W=10¹², so magnitudes
    * never grow) and inlined as a pattern-indexed literal array. Each
    * round is one histogram scan + one 2-value aggregate over literal
    * state; the vote pass is one more scan with the 2³-entry literal
    * vote table. The checkpoint-free boosting shape of C30, now with the
    * committee that scales past two voters (the reference benches ~100
    * HistGradientBoosting rounds, modeling.ipynb cells 45-48).
    */
  def mlGbtStep3(spark: SparkSession, dir: String): DataFrame = {
    val (base, feats, mm) = gbtContract(spark, dir)
    boostStumps(base, feats, rounds = 3, mmPre = Some(mm))
  }

  /** The data-generic N-round core behind `ml_gbt_step3` (generic so the
    * round-3 dynamics are testable on synthetic data where each round
    * provably must select a DIFFERENT stump — Round6Spec).
    */
  private[graft] def boostStumps(base: DataFrame,
                                 features: Seq[(String, String)],
                                 rounds: Int,
                                 mmPre: Option[Map[String, (Double, Double)]] = None): DataFrame = {
    val spark = base.sparkSession
    val kit = new StumpKit(base, features, mmPre)
    val HALF = BigInt(500000000000L)
    val W = 1000000000000L

    // misclassification-pattern index under the stumps so far (bit t set
    // = stump t+1 got the row wrong) — a pure literal projection
    def misIdx(stumps: Seq[Stump]): Column =
      stumps.zipWithIndex.map { case (s, i) =>
        when(kit.predict(s) =!= col("y"), lit(1 << i)).otherwise(lit(0))
      }.reduceOption(_ + _).getOrElse(lit(0))

    // per-row weight = pattern-indexed literal array (≤2^t entries)
    def weightCol(ws: IndexedSeq[Long], stumps: Seq[Stump]): Column =
      if (stumps.isEmpty) lit(1L)
      else element_at(array(ws.map(lit(_)): _*), misIdx(stumps) + 1)

    // the sequential training loop: per round, one histogram scan (stump
    // selection) + one 2-value aggregate (weighted error/total), then a
    // driver-side BigInt weight update over the ≤2^t pattern classes
    case class RoundState(stump: Stump, errW: Long, totalW: Long)
    var classW: IndexedSeq[Long] = IndexedSeq(1L)
    var stumps: Seq[Stump] = Nil
    val trained = (1 to rounds).map { t =>
      val w = weightCol(classW, stumps)
      val cells = kit.hist(w)
      val s = kit.argminStump(cells)
      // weighted error/total read off the SAME collected cells — was a
      // second full scan per round (r14, guide §1.2: 2 scans/round → 1)
      val (errW, totalW) = kit.errTotal(s, cells)
      requireWeakLearner(t, errW, totalW)
      // pattern p under t stumps extends pattern p mod 2^(t-1) with the
      // new stump's wrong-bit; a non-empty wrong class always has
      // w_old ≤ errW so the new weight fits a Long — empty classes may
      // not, so clamp (the value is never selected by a real row, and
      // the oracle computes weights per ROW, so no mismatch can surface)
      val nextW = (0 until (2 << stumps.size)).map { p =>
        val wOld = BigInt(classW(p % classW.size))
        val denom = if ((p & (1 << stumps.size)) != 0) errW else totalW - errW
        ((HALF * wOld) / BigInt(denom)).min(BigInt(W)).toLong
      }
      stumps = stumps :+ s
      classW = nextW.toIndexedSeq
      RoundState(s, errW, totalW)
    }

    // the α-weighted committee vote, resolved per PREDICTION pattern as
    // an exact BigInt product comparison and inlined as a 2^N-entry
    // literal vote table (ties vote 0 — deterministic)
    def voteOf(bits: Int): Int = {
      def side(forOne: Boolean): BigInt =
        trained.zipWithIndex.map { case (r, t) =>
          val one = (bits & (1 << t)) != 0
          BigInt(if (one == forOne) r.totalW - r.errW else r.errW)
        }.product
      if (side(forOne = true) > side(forOne = false)) 1 else 0
    }
    val predIdx = trained.zipWithIndex.map { case (r, t) =>
      when(kit.predict(r.stump) === 1, lit(1 << t)).otherwise(lit(0))
    }.reduce(_ + _)
    val votes = (0 until (1 << rounds)).map(voteOf)
    val voteCol = element_at(array(votes.map(lit(_)): _*), predIdx + 1)

    // one final scan: committee train accuracy + row count
    val fin = base.agg(
      sum((voteCol === col("y")).cast("long")), count(lit(1))).head()
    val (correct, n) = (fin.getLong(0), fin.getLong(1))

    val perRound = trained.zipWithIndex.flatMap { case (r, i) =>
      val t = i + 1
      Seq(
        lit(r.stump._1).as(s"f$t"), lit(r.stump._2).as(s"bin$t"),
        r4b(lit(r.stump._3)).as(s"thr$t")) ++
        (if (t == 1) Seq(lit(r.errW).as("err1"))
         else Seq(lit(r.errW).as(s"err${t}_w"), lit(r.totalW).as(s"total${t}_w")))
    }
    val epsLoss = {
      val eps = trained.map(r => r.errW.toDouble / r.totalW)
      trained.indices.flatMap { i =>
        val t = i + 1
        Seq(r4b(lit(eps(i))).as(s"eps$t"),
          r4b(eps.take(t).map(e => lossBound(lit(e))).reduce(_ * _)).as(s"loss$t"))
      }
    }
    spark.range(1).select(
      perRound ++ Seq(lit(n).as("n"), lit(correct).as(s"correct$rounds"),
        r4b(lit(correct.toDouble / n)).as(s"acc$rounds")) ++ epsLoss: _*)
  }

  /** C31 — `ml_kmeans_lloyd`: THREE exact Lloyd iterations over
    * `embeddings`, with a monotone-inertia convergence witness.
    *
    * C13 proved one Lloyd round replays exactly; this closes the loop:
    * everything lives in integer tick space (components quantized at
    * 10⁴ — squared distances stay Long-safe past 10⁹ vectors), distances
    * are the fused native [[graft.functions.IntSqDist]] against the
    * k·dim LITERAL codebook (E3's zero-shuffle assignment shape), and
    * centroid updates are round-half integer divisions
    * (2·Σq + n) div (2n), so every round — not just the first — is
    * bit-identical on any engine, any partitioning, any merge order. An
    * empty cluster keeps its previous centroid (deterministic on both
    * engines). Output: one row per round with the EXACT integer inertia
    * (Σ min ‖x−c‖² in ticks², measured at assignment time) and the count
    * of vectors that changed cluster — Lloyd's monotone convergence,
    * hash-verified cross-engine. (Integer-rounded centroids bound the
    * classic monotonicity argument within ¼-tick²·dim per vector —
    * orders of magnitude below the per-round decrease on real data; the
    * spec asserts the strict decrease.)
    *
    * Plan per round: one scan for (inertia, moved) — a codegen'd
    * projection over the literal codebook plus a 2-value aggregate — and
    * one scan for the update histogram (k·dim groups, map-side
    * partials); the only driver state is the k·dim Long codebook. The
    * same loop trains k in the thousands at 100 TB.
    */
  def mlKmeansLloyd(spark: SparkSession, dir: String, k: Int = 8,
                    rounds: Int = 3): DataFrame = {
    import graft.functions.VectorOps.intSqDist
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr(
        "transform(cast(embedding as array<double>), x -> cast(floor(x * 10000.0 + 0.5) as bigint))")
        .as("q"))
    def litArr(c: Array[Long]): Column = array(c.map(lit).toIndexedSeq: _*)

    // codebook 0 = the k lowest-id vectors (cid = sorted position)
    var cents: IndexedSeq[Array[Long]] = e.orderBy("vec_id").limit(k).collect()
      .map(_.getSeq[Long](1).toArray).toIndexedSeq
    val dim = cents.head.length

    var prevCents: Option[IndexedSeq[Array[Long]]] = None
    val stats = (1 to rounds).map { t =>
      // ONE literal codebook array + a `transform` HOF fold (E3's
      // idiom): the expression tree is O(1) in k — `array(k × dist)`
      // would bloat codegen linearly and stop compiling for k in the
      // thousands. array_min over (d2, cid) structs is the argmin with
      // the lowest-cid tie-break built into lexicographic ordering.
      def asgOf(cs: IndexedSeq[Array[Long]]): Column = {
        val cbLit = array(cs.zipWithIndex.map { case (c, cid) =>
          struct(lit(cid).as("cid"), litArr(c).as("cv"))
        }: _*)
        array_min(transform(cbLit, c => struct(
          intSqDist(col("q"), c.getField("cv")).as("d2"),
          c.getField("cid").as("cid"))))
      }
      val withD = e.withColumn("_m", asgOf(cents))
        .withColumn("_min", col("_m").getField("d2"))
        .withColumn("_a", col("_m").getField("cid"))
      // moved vs the PREVIOUS round's assignment — also a pure literal
      // projection, so both assignments ride the same scan
      // r14 note: fusing this aggregate into the posexplode update job
      // (one job per round) was tried and REVERTED — the combined stage
      // inlines BOTH rounds' 8×64-long literal codebook folds plus the
      // generator into one generated method, the exact 8 KB JIT-cliff
      // shape SURVEY §5 documents, and the bench measured it ~60%
      // SLOWER (1.21 s → 1.99 s). Two narrow jobs it stays.
      val movedAgg = prevCents match {
        case None => count(lit(1)).cast("long")
        case Some(pcs) =>
          sum((col("_a") =!= asgOf(pcs).getField("cid")).cast("long"))
      }
      val row = withD.agg(sum(col("_min")).as("inertia"), movedAgg.as("moved"))
        .collect().head
      val (inertia, moved) = (row.getLong(0), row.getLong(1))
      // Lloyd update: exact integer sums per (cluster, dim), round-half
      // division in driver Long math (truncation toward zero — identical
      // to SQL div on both engines)
      val upd = withD.select(col("_a"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy("_a", "pos")
        .agg(sum("x").as("sq"), count(lit(1)).as("cnt"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)),
          (2 * r.getLong(2) + r.getLong(3)) / (2 * r.getLong(3))))
        .toMap
      prevCents = Some(cents)
      cents = cents.indices.map(cid =>
        Array.tabulate(dim)(d => upd.getOrElse((cid, d), cents(cid)(d))))
      (t, inertia, moved)
    }
    import spark.implicits._
    stats.toDF("round", "inertia", "moved").orderBy("round")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_gbt_step2" -> (mlGbtStep2 _),
    "ml_gbt_step3" -> (mlGbtStep3 _),
    "ml_kmeans_lloyd" -> ((s: SparkSession, d: String) => mlKmeansLloyd(s, d)))

  private def wg = {
    def g(p: String, n: String) = {
      val q = s"(CAST($p AS DOUBLE) / $n)"
      s"(1.0 - $q * $q - (1.0 - $q) * (1.0 - $q))"
    }
    s"(nl * ${g("pl", "nl")} + nr * ${g("pr", "nr")}) / (nl + nr)"
  }
  private def binSql(v: String) =
    s"CAST(least(floor(($v - x.vmin) / (x.vmax - x.vmin) * 10), 9.0) AS INT)"
  private def pickSql(f: String) =
    s"CASE $f WHEN 'disc' THEN b.l_discount WHEN 'price' THEN b.l_extendedprice ELSE b.l_quantity END"
  private def lossSql(eps: String) = s"(2.0 * sqrt(($eps) * (1.0 - ($eps))))"

  val oracles: Map[String, String] = {
    // one Lloyd round: assign against cents{t-1}, keep the assignment
    // distance (that round's inertia term), update with round-half
    // integer division, carry empty clusters' previous centroids
    def lloydRound(t: Int): String =
      s"""ad$t AS (
         |  SELECT v.vec_id, c.cid, sum((v.x - c.c) * (v.x - c.c)) AS dist
         |  FROM ex v JOIN cents${t - 1} c ON v.dim = c.dim GROUP BY 1, 2),
         |asg$t AS (
         |  SELECT vec_id, cid, dist FROM (
         |    SELECT vec_id, cid, dist,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM ad$t) WHERE rn = 1),
         |upd$t AS (
         |  SELECT a.cid, x.dim,
         |    CAST((2 * sum(x.x) + count(*)) // (2 * count(*)) AS BIGINT) AS c
         |  FROM asg$t a JOIN ex x USING (vec_id) GROUP BY 1, 2),
         |cents$t AS (
         |  SELECT p.cid, p.dim, COALESCE(u.c, p.c) AS c
         |  FROM cents${t - 1} p LEFT JOIN upd$t u ON u.cid = p.cid AND u.dim = p.dim)""".stripMargin
    Map(
      "ml_kmeans_lloyd" ->
        s"""WITH e AS (
           |  SELECT vec_id,
           |    list_transform(embedding::DOUBLE[],
           |      x -> CAST(floor(x * 10000.0 + 0.5) AS BIGINT)) AS q
           |  FROM embeddings),
           |ex AS (
           |  SELECT vec_id, CAST(generate_subscripts(q, 1) - 1 AS INT) AS dim,
           |         unnest(q) AS x
           |  FROM e),
           |seeds AS (
           |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
           |  FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT 8)),
           |cents0 AS (SELECT s.cid, x.dim, x.x AS c FROM seeds s JOIN ex x USING (vec_id)),
           |${lloydRound(1)},
           |${lloydRound(2)},
           |${lloydRound(3)}
           |SELECT CAST(1 AS INTEGER) AS round,
           |       (SELECT CAST(sum(dist) AS BIGINT) FROM asg1) AS inertia,
           |       (SELECT count(*) FROM asg1) AS moved
           |UNION ALL
           |SELECT 2, (SELECT CAST(sum(dist) AS BIGINT) FROM asg2),
           |       (SELECT count(*) FROM asg2 a JOIN asg1 b USING (vec_id) WHERE a.cid <> b.cid)
           |UNION ALL
           |SELECT 3, (SELECT CAST(sum(dist) AS BIGINT) FROM asg3),
           |       (SELECT count(*) FROM asg3 a JOIN asg2 b USING (vec_id) WHERE a.cid <> b.cid)
           |ORDER BY round""".stripMargin,
      "ml_gbt_step2" ->
        s"""WITH $boostPrefix,
           |fin AS (
           |  SELECT CASE WHEN e1.err1 * e2.total_w <= e2.err2_w * e1.n
           |              THEN e1.n - e1.err1 ELSE e1.n - e2.err2_cnt END AS correct2
           |  FROM e2 CROSS JOIN e1)
           |SELECT s1.feature AS f1, s1.bin AS bin1,
           |  ${sql4("s1.threshold")} AS thr1,
           |  s2.feature AS f2, s2.bin AS bin2,
           |  ${sql4("s2.threshold")} AS thr2,
           |  e1.n, e1.err1, e2.err2_w, e2.total_w, fin.correct2,
           |  ${sql4("CAST(err1 AS DOUBLE) / n")} AS eps1,
           |  ${sql4("CAST(err2_w AS DOUBLE) / total_w")} AS eps2,
           |  ${sql4("CAST(correct2 AS DOUBLE) / n")} AS acc2,
           |  ${sql4(lossSql("CAST(err1 AS DOUBLE) / n"))} AS loss1,
           |  ${sql4(s"${lossSql("CAST(err1 AS DOUBLE) / n")} * ${lossSql("CAST(err2_w AS DOUBLE) / total_w")}")} AS loss2
           |FROM s1 CROSS JOIN s2 CROSS JOIN e1 CROSS JOIN e2 CROSS JOIN fin""".stripMargin,
      // C32 — the general α-weighted committee: round-3 weights are the
      // round-2 rowsw weights renormalized per the h2 outcome (HUGEINT
      // product, truncating //), stump 3 trains on them, and the vote is
      // the exact integer-product comparison described at [[mlGbtStep3]]
      "ml_gbt_step3" ->
        s"""WITH $boostPrefix,
           |rowsw2 AS (
           |  SELECT r.l_discount, r.l_extendedprice, r.l_quantity, r.y, r.h1, r.h2,
           |    CAST(CAST(500000000000 AS HUGEINT) * r.w //
           |      (CASE WHEN r.h2 <> r.y THEN e2.err2_w
           |            ELSE e2.total_w - e2.err2_w END) AS BIGINT) AS w3
           |  FROM rows2 r CROSS JOIN e2),
           |melted3 AS (
           |  SELECT 'disc' AS feature, l_discount AS value, y, w3 FROM rowsw2
           |  UNION ALL
           |  SELECT 'price', l_extendedprice, y, w3 FROM rowsw2
           |  UNION ALL
           |  SELECT 'qty', l_quantity, y, w3 FROM rowsw2),
           |hist3 AS (
           |  SELECT m.feature,
           |    CAST(least(floor((m.value - x.vmin) / (x.vmax - x.vmin) * 10), 9.0) AS INT) AS bin,
           |    CAST(sum(w3) AS BIGINT) AS wn, CAST(sum(w3 * y) AS BIGINT) AS wpos
           |  FROM melted3 m JOIN mm x USING (feature) GROUP BY 1, 2),
           |cand3 AS (
           |  SELECT feature, bin,
           |    x.vmin + (bin + 1) * (x.vmax - x.vmin) / 10 AS threshold,
           |    CAST(cum_n AS BIGINT) AS nl, CAST(cum_pos AS BIGINT) AS pl,
           |    CAST(n_tot - cum_n AS BIGINT) AS nr,
           |    CAST(pos_tot - cum_pos AS BIGINT) AS pr
           |  FROM (
           |    SELECT feature, bin,
           |      sum(wn) OVER (PARTITION BY feature ORDER BY bin) AS cum_n,
           |      sum(wpos) OVER (PARTITION BY feature ORDER BY bin) AS cum_pos,
           |      sum(wn) OVER (PARTITION BY feature) AS n_tot,
           |      sum(wpos) OVER (PARTITION BY feature) AS pos_tot
           |    FROM hist3) h JOIN mm x USING (feature)
           |  WHERE bin < 9 AND cum_n > 0 AND n_tot > cum_n),
           |cand3w AS (SELECT *, $wg AS wgini FROM cand3),
           |s3 AS (SELECT * FROM cand3w ORDER BY wgini, feature, bin LIMIT 1),
           |rows3 AS (
           |  SELECT b.*,
           |    CASE WHEN ${binSql(pickSql("s3.feature"))} <= s3.bin
           |         THEN CAST(2 * s3.pl > s3.nl AS INT)
           |         ELSE CAST(2 * s3.pr > s3.nr AS INT) END AS h3
           |  FROM rowsw2 b CROSS JOIN s3 JOIN mm x ON x.feature = s3.feature),
           |e3 AS (
           |  SELECT CAST(sum(CASE WHEN h3 <> y THEN w3 ELSE 0 END) AS BIGINT) AS err3_w,
           |         CAST(sum(w3) AS BIGINT) AS total3_w
           |  FROM rows3),
           |voted AS (
           |  SELECT r.y,
           |    CASE WHEN
           |      CAST(CASE WHEN r.h1 = 1 THEN e1.n - e1.err1 ELSE e1.err1 END AS HUGEINT)
           |      * (CASE WHEN r.h2 = 1 THEN e2.total_w - e2.err2_w ELSE e2.err2_w END)
           |      * (CASE WHEN r.h3 = 1 THEN e3.total3_w - e3.err3_w ELSE e3.err3_w END)
           |      >
           |      CAST(CASE WHEN r.h1 = 1 THEN e1.err1 ELSE e1.n - e1.err1 END AS HUGEINT)
           |      * (CASE WHEN r.h2 = 1 THEN e2.err2_w ELSE e2.total_w - e2.err2_w END)
           |      * (CASE WHEN r.h3 = 1 THEN e3.err3_w ELSE e3.total3_w - e3.err3_w END)
           |    THEN 1 ELSE 0 END AS vote
           |  FROM rows3 r CROSS JOIN e1 CROSS JOIN e2 CROSS JOIN e3),
           |fin AS (SELECT CAST(sum(CAST(vote = y AS INT)) AS BIGINT) AS correct3 FROM voted)
           |SELECT s1.feature AS f1, s1.bin AS bin1, ${sql4("s1.threshold")} AS thr1,
           |  e1.err1,
           |  s2.feature AS f2, s2.bin AS bin2, ${sql4("s2.threshold")} AS thr2,
           |  e2.err2_w, e2.total_w AS total2_w,
           |  s3.feature AS f3, s3.bin AS bin3, ${sql4("s3.threshold")} AS thr3,
           |  e3.err3_w, e3.total3_w,
           |  e1.n, fin.correct3,
           |  ${sql4("CAST(correct3 AS DOUBLE) / n")} AS acc3,
           |  ${sql4("CAST(err1 AS DOUBLE) / n")} AS eps1,
           |  ${sql4(lossSql("CAST(err1 AS DOUBLE) / n"))} AS loss1,
           |  ${sql4("CAST(err2_w AS DOUBLE) / total_w")} AS eps2,
           |  ${sql4(s"${lossSql("CAST(err1 AS DOUBLE) / n")} * ${lossSql("CAST(err2_w AS DOUBLE) / total_w")}")} AS loss2,
           |  ${sql4("CAST(err3_w AS DOUBLE) / total3_w")} AS eps3,
           |  ${sql4(s"${lossSql("CAST(err1 AS DOUBLE) / n")} * ${lossSql("CAST(err2_w AS DOUBLE) / total_w")} * ${lossSql("CAST(err3_w AS DOUBLE) / total3_w")}")} AS loss3
           |FROM s1 CROSS JOIN s2 CROSS JOIN s3
           |CROSS JOIN e1 CROSS JOIN e2 CROSS JOIN e3 CROSS JOIN fin""".stripMargin)
  }

  /** The shared 2-round boosting CTE chain (stump 1 → reweight → stump 2
    * → weighted round-2 error) — C30's oracle body, reused verbatim as
    * C32's prefix so the two oracles cannot drift.
    */
  private lazy val boostPrefix: String =
        s"""${Ml4.stumpCtes},
           |s1 AS (SELECT * FROM candw ORDER BY wgini, feature, bin LIMIT 1),
           |base AS (
           |  SELECT l_discount, l_extendedprice, l_quantity,
           |         CAST(l_returnflag = 'R' AS INT) AS y
           |  FROM lineitem),
           |rows1 AS (
           |  SELECT b.*,
           |    CASE WHEN ${binSql(pickSql("s1.feature"))} <= s1.bin
           |         THEN CAST(2 * s1.pl > s1.nl AS INT)
           |         ELSE CAST(2 * s1.pr > s1.nr AS INT) END AS h1
           |  FROM base b CROSS JOIN s1 JOIN mm x ON x.feature = s1.feature),
           |e1 AS (
           |  SELECT CAST(sum(CAST(h1 <> y AS INT)) AS BIGINT) AS err1,
           |         count(*) AS n
           |  FROM rows1),
           |rowsw AS (
           |  SELECT r.*, e1.err1, e1.n,
           |    CASE WHEN h1 <> y THEN 500000000000 // err1
           |         ELSE 500000000000 // (n - err1) END AS w
           |  FROM rows1 r CROSS JOIN e1),
           |melted2 AS (
           |  SELECT 'disc' AS feature, l_discount AS value, y, w FROM rowsw
           |  UNION ALL
           |  SELECT 'price', l_extendedprice, y, w FROM rowsw
           |  UNION ALL
           |  SELECT 'qty', l_quantity, y, w FROM rowsw),
           |hist2 AS (
           |  SELECT m.feature,
           |    CAST(least(floor((m.value - x.vmin) / (x.vmax - x.vmin) * 10), 9.0) AS INT) AS bin,
           |    CAST(sum(w) AS BIGINT) AS wn, CAST(sum(w * y) AS BIGINT) AS wpos
           |  FROM melted2 m JOIN mm x USING (feature) GROUP BY 1, 2),
           |cand2 AS (
           |  SELECT feature, bin,
           |    x.vmin + (bin + 1) * (x.vmax - x.vmin) / 10 AS threshold,
           |    CAST(cum_n AS BIGINT) AS nl, CAST(cum_pos AS BIGINT) AS pl,
           |    CAST(n_tot - cum_n AS BIGINT) AS nr,
           |    CAST(pos_tot - cum_pos AS BIGINT) AS pr
           |  FROM (
           |    SELECT feature, bin,
           |      sum(wn) OVER (PARTITION BY feature ORDER BY bin) AS cum_n,
           |      sum(wpos) OVER (PARTITION BY feature ORDER BY bin) AS cum_pos,
           |      sum(wn) OVER (PARTITION BY feature) AS n_tot,
           |      sum(wpos) OVER (PARTITION BY feature) AS pos_tot
           |    FROM hist2) h JOIN mm x USING (feature)
           |  WHERE bin < 9 AND cum_n > 0 AND n_tot > cum_n),
           |cand2w AS (SELECT *, $wg AS wgini FROM cand2),
           |s2 AS (SELECT * FROM cand2w ORDER BY wgini, feature, bin LIMIT 1),
           |rows2 AS (
           |  SELECT b.*,
           |    CASE WHEN ${binSql(pickSql("s2.feature"))} <= s2.bin
           |         THEN CAST(2 * s2.pl > s2.nl AS INT)
           |         ELSE CAST(2 * s2.pr > s2.nr AS INT) END AS h2
           |  FROM rowsw b CROSS JOIN s2 JOIN mm x ON x.feature = s2.feature),
           |e2 AS (
           |  SELECT CAST(sum(CASE WHEN h2 <> y THEN w ELSE 0 END) AS BIGINT) AS err2_w,
           |         CAST(sum(w) AS BIGINT) AS total_w,
           |         CAST(sum(CAST(h2 <> y AS INT)) AS BIGINT) AS err2_cnt
           |  FROM rows2)""".stripMargin
}
