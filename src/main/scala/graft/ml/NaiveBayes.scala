package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** C12 — Bernoulli Naive Bayes, closed form (round 3).
  *
  * The reference's model bench (modeling.ipynb) is all iterative fits —
  * rows-only checks. NB is the one classic classifier whose training IS a
  * single aggregation pass, so it gets a full DuckDB oracle: per-class
  * Laplace-smoothed token-presence probabilities are ratios of exact
  * integer counts, and the posterior is a FIXED-ORDER chain of IEEE
  * double divisions/multiplications — bit-identical on any engine, no
  * log-space (8 factors ≥ 1/(n+2) can't underflow), no rank-stability
  * assumption. Spark plan: one tiny groupBy(lang) aggregate (|classes|
  * rows) broadcast back over the corpus; single shuffle total.
  *
  * Both the Spark expression chain and the oracle SQL are generated from
  * the same token list so the multiplication order can never drift.
  */
object NaiveBayes {

  /** Fixed vocabulary — presence/absence features (order is part of the
    * operator's definition: posterior factors multiply in this order). */
  val vocab: Seq[String] = Seq("spark", "table", "query", "join", "scan", "value", "fast", "key")

  def mlNaiveBayes(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val feats = docs.select(
      (col("doc_id") +: col("lang") +:
        vocab.zipWithIndex.map { case (t, i) =>
          array_contains(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"), t).cast("int").as(s"x$i")
        }): _*)
    val cls = feats.groupBy(col("lang").as("c_lang"))
      .agg(count(lit(1)).as("n_j"),
        vocab.indices.map(i => sum(col(s"x$i")).as(s"m$i")): _*)
    val tot = docs.agg(count(lit(1)).as("n_total"))
    // posterior: prior × Π_t P(x_t | class), left-to-right over vocab
    val prior = col("n_j").cast("double") / col("n_total").cast("double")
    val score = vocab.indices.foldLeft(prior) { (acc, i) =>
      val hit = when(col(s"x$i") === 1, col(s"m$i") + 1)
        .otherwise(col("n_j") - col(s"m$i") + 1).cast("double")
      acc * (hit / (col("n_j") + 2).cast("double"))
    }
    val scored = feats.crossJoin(broadcast(cls)).crossJoin(broadcast(tot))
      .select(col("doc_id"), col("lang"), col("c_lang"), score.as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("c_lang"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("c_lang").as("pred_lang"))
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_naive_bayes" -> (mlNaiveBayes _))

  private val featSql: String = vocab.zipWithIndex
    .map { case (t, i) =>
      s"CAST(list_contains(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'), '$t') AS INT) AS x$i"
    }.mkString(",\n  ")
  private val clsSql: String = vocab.indices
    .map(i => s"CAST(sum(x$i) AS BIGINT) AS m$i").mkString(", ")
  private val scoreSql: String = vocab.indices.foldLeft(
    "(CAST(n_j AS DOUBLE) / CAST(n_total AS DOUBLE))") { (acc, i) =>
    s"$acc * (CAST(CASE WHEN x$i = 1 THEN m$i + 1 ELSE n_j - m$i + 1 END AS DOUBLE) / CAST(n_j + 2 AS DOUBLE))"
  }

  val oracles: Map[String, String] = Map(
    "ml_naive_bayes" ->
      s"""WITH feat AS (
         | SELECT doc_id, lang,
         |  $featSql
         | FROM documents),
         |cls AS (
         | SELECT lang AS c_lang, count(*) AS n_j, $clsSql
         | FROM feat GROUP BY 1),
         |tot AS (SELECT count(*) AS n_total FROM documents),
         |scored AS (
         | SELECT f.doc_id, f.lang, c.c_lang,
         |  $scoreSql AS score
         | FROM feat f CROSS JOIN cls c CROSS JOIN tot)
         |SELECT doc_id, lang, c_lang AS pred_lang FROM (
         | SELECT doc_id, lang, c_lang,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c_lang) AS rn
         | FROM scored)
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin)
}
