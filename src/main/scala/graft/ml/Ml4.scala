package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.OracleRound
import graft.tables.Tables

/** Model-evaluation extensions (round 3, wave 9) — SURVEY.md §2.C18-C20.
  *
  * The reference's model bench reports accuracy/precision/recall/F1/
  * ROC-AUC per model (modeling.ipynb cell 12). Production evaluation adds
  * three staples this wave supplies:
  *
  *  - C18 Kolmogorov-Smirnov statistic: max separation between the
  *    positive and negative score CDFs — the classic "is this scorer any
  *    good" scalar for binary scorers.
  *  - C19 average precision (the step-function area under the
  *    precision-recall curve) — the imbalanced-class counterpart of
  *    ROC-AUC (C7).
  *  - C20 population stability index between B6's deterministic
  *    train/test splits — the drift monitor scoring pipelines run before
  *    trusting a model on fresh data.
  *
  * Determinism: everything reduces to exact integer counts first. KS
  * keeps its max as the integer numerator |cum_pos·N − cum_neg·P| and
  * divides once at the end; AP sums the integer quantization
  * floor(cum_pos·10⁶ div k) so the sum is order-independent (a double
  * sum would depend on partial-merge order); PSI's per-bin ln() scalars
  * are identical fixed-order IEEE expressions on both engines, rounded
  * via OracleRound.
  */
object Ml4 {
  import OracleRound.r4b

  /** C18 — KS statistic via one ordered cumulative pass.
    *
    * D = max over thresholds of |F_pos − F_neg|; after ordering by
    * (score, key) the candidate thresholds are exactly the observed rows,
    * where F_pos = cum_pos/P, F_neg = cum_neg/N. The max runs on the
    * exact integer cross-product |cum_pos·N − cum_neg·P|; one IEEE
    * division at the end.
    *
    * Scale shape: the global-order window is the oracle-exact
    * formulation; at 100 TB the same cumulative counts come from
    * DistRank's range-repartition + per-slice partials + broadcast
    * offsets (C7b `ml_roc_auc_dist` proves that technique bit-identical
    * via its shared oracle).
    */
  def mlKsStatistic(spark: SparkSession, dir: String): DataFrame = {
    val base = Metrics.labeled(spark, dir)
    val tot = base.agg(
      sum(col("truth")).as("p_tot"),
      sum(lit(1) - col("truth")).as("n_tot"))
    val w = Window.orderBy(col("score"), col("o_orderkey"))
    base
      .withColumn("cum_pos", sum(col("truth")).over(w))
      .withColumn("cum_neg", sum(lit(1) - col("truth")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("p_tot"), col("n_tot"),
        abs(col("cum_pos") * col("n_tot") - col("cum_neg") * col("p_tot")).as("diff"))
      .agg(max(col("p_tot")).as("p"), max(col("n_tot")).as("n"),
        max(col("diff")).as("ks_num"))
      .select(col("p"), col("n"), col("ks_num"),
        r4b(col("ks_num").cast("double") / (col("p") * col("n"))).as("ks"))
  }

  /** C19 — average precision: AP = (1/P) Σ_{k: truth@k=1} precision@k
    * over the rank order (score desc, key). precision@k = cum_pos(k)/k is
    * quantized to the integer floor(cum_pos·10⁶ div k) before summing, so
    * the aggregate is an order-independent integer sum — exact on any
    * engine — and AP carries one final division. Same window caveat and
    * DistRank scale path as C18.
    */
  def mlAucPr(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("score").desc, col("o_orderkey"))
    Metrics.labeled(spark, dir)
      .withColumn("k", row_number().over(w))
      .withColumn("cum_pos", sum(col("truth")).over(w))
      .select(col("truth"),
        when(col("truth") === 1, expr("cum_pos * 1000000 div k"))
          .otherwise(lit(0L)).as("prec_q"))
      .agg(sum(col("truth")).as("p"),
        sum(lit(1) - col("truth")).as("n"),
        sum(col("prec_q")).as("ap_q"))
      .select(col("p"), col("n"),
        r4b(col("ap_q").cast("double") / (lit(1000000.0) * col("p"))).as("ap"))
  }

  /** C20 — population stability index, train vs test (B6's Knuth-hash
    * split), over 10 fixed-width score bins (width 60000, top bin open).
    * PSI_i = (p_i − q_i)·ln(p_i/q_i) from exact per-bin integer counts;
    * bins empty on either side yield null (the standard eps-free
    * convention — at production scale a bin with zero traffic is the
    * alert itself, not a summand).
    *
    * Plan shape: one conditional-aggregate pass over the facts (map-side
    * partials, ≤10 groups), totals broadcast back — no window, no second
    * scan, the same shape at any scale.
    */
  def mlPsi(spark: SparkSession, dir: String): DataFrame = {
    val binned = Tables.orders(spark, dir).select(
      when(pmod(col("o_orderkey") * lit(2654435761L), lit(100)) < 80, lit("train"))
        .otherwise(lit("test")).as("split"),
      least(floor(col("o_totalprice") / 60000.0), lit(9.0)).cast("int").as("bin"))
    val counts = binned.groupBy("bin").agg(
      count(when(col("split") === "train", 1)).as("train_n"),
      count(when(col("split") === "test", 1)).as("test_n"))
    val tot = counts.agg(sum("train_n").as("train_tot"), sum("test_n").as("test_tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("p", col("train_n").cast("double") / col("train_tot"))
      .withColumn("q", col("test_n").cast("double") / col("test_tot"))
      .select(col("bin"), col("train_n"), col("test_n"),
        r4b(col("p")).as("train_frac"), r4b(col("q")).as("test_frac"),
        when(col("train_n") > 0 && col("test_n") > 0,
          r4b((col("p") - col("q")) * log(col("p") / col("q"))))
          .as("psi_term"))
      .orderBy("bin")
  }

  /** C21 — fold-wise accuracy confidence interval: the deterministic
    * answer to "bootstrap the metric". 10 disjoint Knuth-hash folds
    * (B19's assignment) each score the predictor; the CI is
    * mean ± 1.96·sd over the fold accuracies. No RNG state, stable
    * under reruns and repartitions — at 100 TB resampling WITH
    * replacement is a non-starter anyway, and disjoint-fold variance is
    * the standard substitute.
    *
    * Per-fold accuracy is quantized to floor(correct·10⁶ div n) so the
    * cross-fold mean and the exact integer second moment
    * k·Σa² − (Σa)² are order-independent; sqrt is IEEE-correctly-rounded
    * hence portable, and the three output doubles round via OracleRound.
    * Plan: one conditional-agg pass (10 groups, map-side partials) +
    * a 10-row final aggregate.
    */
  def mlBootstrapCi(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val folds = Metrics.labeled(spark, dir)
      .select(pmod(col("o_orderkey") * lit(2654435761L), lit(k.toLong)).as("fold"),
        (col("pred") === col("truth")).cast("int").as("correct"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n"), sum("correct").as("n_correct"))
      .select(expr("n_correct * 1000000 div n").as("acc_q"))
    folds.agg(count(lit(1)).as("k"),
        sum("acc_q").as("s1"), sum(col("acc_q") * col("acc_q")).as("s2"))
      .select(col("k"),
        r4b(col("s1").cast("double") / (lit(1000000.0) * col("k"))).as("acc_mean"),
        r4b(sqrt((col("k") * col("s2") - col("s1") * col("s1")).cast("double") /
          (col("k") * (col("k") - 1))) / lit(1000000.0)).as("acc_sd"),
        r4b(col("s1").cast("double") / (lit(1000000.0) * col("k")) -
          lit(1.96) * (sqrt((col("k") * col("s2") - col("s1") * col("s1")).cast("double") /
            (col("k") * (col("k") - 1))) / lit(1000000.0))).as("ci_lo"),
        r4b(col("s1").cast("double") / (lit(1000000.0) * col("k")) +
          lit(1.96) * (sqrt((col("k") * col("s2") - col("s1") * col("s1")).cast("double") /
            (col("k") * (col("k") - 1))) / lit(1000000.0))).as("ci_hi"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_ks_statistic" -> (mlKsStatistic _),
    "ml_auc_pr" -> (mlAucPr _),
    "ml_psi" -> (mlPsi _),
    "ml_bootstrap_ci" -> ((s, d) => mlBootstrapCi(s, d)))

  val oracles: Map[String, String] = Map(
    "ml_bootstrap_ci" -> {
      val mean = "CAST(s1 AS DOUBLE) / (1000000.0 * k)"
      val sd = "sqrt(CAST(k * s2 - s1 * s1 AS DOUBLE) / (k * (k - 1))) / 1000000.0"
      s"""WITH folds AS (
         |  SELECT (o_orderkey * 2654435761) % 10 AS fold,
         |         count(*) AS n,
         |         sum(CAST((CAST(o_totalprice > 150000.0 AS INT)) =
         |                  (CAST(o_orderpriority < '3' AS INT)) AS INT)) AS n_correct
         |  FROM orders GROUP BY 1),
         |q AS (SELECT n_correct * 1000000 // n AS acc_q FROM folds),
         |m AS (
         |  SELECT count(*) AS k, CAST(sum(acc_q) AS BIGINT) AS s1,
         |         CAST(sum(acc_q * acc_q) AS BIGINT) AS s2
         |  FROM q)
         |SELECT k,
         | ${OracleRound.sql4(mean)} AS acc_mean,
         | ${OracleRound.sql4(sd)} AS acc_sd,
         | ${OracleRound.sql4(s"$mean - 1.96 * ($sd)")} AS ci_lo,
         | ${OracleRound.sql4(s"$mean + 1.96 * ($sd)")} AS ci_hi
         |FROM m""".stripMargin
    },
    "ml_ks_statistic" ->
      """WITH l AS (
        |  SELECT o_orderkey, o_totalprice AS score,
        |         CAST(o_orderpriority < '3' AS INT) AS truth
        |  FROM orders),
        |tot AS (
        |  SELECT sum(truth) AS p_tot, sum(1 - truth) AS n_tot FROM l),
        |cum AS (
        |  SELECT truth,
        |         sum(truth) OVER (ORDER BY score, o_orderkey) AS cum_pos,
        |         sum(1 - truth) OVER (ORDER BY score, o_orderkey) AS cum_neg
        |  FROM l)
        |SELECT CAST(p AS BIGINT) AS p, CAST(n AS BIGINT) AS n,
        |       CAST(ks_num AS BIGINT) AS ks_num,
        |       floor((CAST(ks_num AS DOUBLE) / (p * n)) * 10000 + 0.5) / 10000 AS ks
        |FROM (
        |  SELECT max(t.p_tot) AS p, max(t.n_tot) AS n,
        |         max(abs(c.cum_pos * t.n_tot - c.cum_neg * t.p_tot)) AS ks_num
        |  FROM cum c CROSS JOIN tot t)""".stripMargin,
    "ml_auc_pr" ->
      """WITH l AS (
        |  SELECT o_orderkey, o_totalprice AS score,
        |         CAST(o_orderpriority < '3' AS INT) AS truth
        |  FROM orders),
        |r AS (
        |  SELECT truth,
        |         row_number() OVER (ORDER BY score DESC, o_orderkey) AS k,
        |         sum(truth) OVER (ORDER BY score DESC, o_orderkey) AS cum_pos
        |  FROM l)
        |SELECT CAST(p AS BIGINT) AS p, CAST(n AS BIGINT) AS n,
        |       floor((CAST(ap_q AS DOUBLE) / (1000000.0 * p)) * 10000 + 0.5) / 10000 AS ap
        |FROM (
        |  SELECT sum(truth) AS p, sum(1 - truth) AS n,
        |         sum(CASE WHEN truth = 1 THEN cum_pos * 1000000 // k ELSE 0 END) AS ap_q
        |  FROM r)""".stripMargin,
    "ml_psi" ->
      """WITH b AS (
        |  SELECT CASE WHEN (o_orderkey * 2654435761) % 100 < 80
        |              THEN 'train' ELSE 'test' END AS split,
        |         CAST(least(floor(o_totalprice / 60000.0), 9.0) AS INT) AS bin
        |  FROM orders),
        |c AS (
        |  SELECT bin,
        |         count(CASE WHEN split = 'train' THEN 1 END) AS train_n,
        |         count(CASE WHEN split = 'test' THEN 1 END) AS test_n
        |  FROM b GROUP BY bin),
        |tot AS (
        |  SELECT sum(train_n) AS train_tot, sum(test_n) AS test_tot FROM c)
        |SELECT bin, train_n, test_n,
        |  floor((CAST(train_n AS DOUBLE) / train_tot) * 10000 + 0.5) / 10000 AS train_frac,
        |  floor((CAST(test_n AS DOUBLE) / test_tot) * 10000 + 0.5) / 10000 AS test_frac,
        |  CASE WHEN train_n > 0 AND test_n > 0 THEN
        |    floor(((CAST(train_n AS DOUBLE) / train_tot - CAST(test_n AS DOUBLE) / test_tot) *
        |           ln((CAST(train_n AS DOUBLE) / train_tot) / (CAST(test_n AS DOUBLE) / test_tot)))
        |          * 10000 + 0.5) / 10000
        |  END AS psi_term
        |FROM c CROSS JOIN tot
        |ORDER BY bin""".stripMargin)
}
