package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Text-analysis extensions (round 3) — SURVEY.md §2.F (F6).
  *
  * TF-IDF term salience per document — the last classic corpus statistic
  * missing from §2.F (token counts F1, quality F2, lang-id F3,
  * fingerprints F4, corpus n-grams F5).
  */
object Text2 {

  /** F6 — top-3 salient terms per document by quantized TF-IDF.
    *
    * Salience is tf·(N/df) quantized to the integer `(tf·10⁶·N) div df`
    * instead of tf·ln(N/df): inside one document the log is a monotone
    * transform of N/df, so the per-doc ranking is identical — and integer
    * arithmetic is exactly replayable cross-engine, where `ln` differs in
    * the last ulp between libm implementations (same reasoning as the
    * integer rank arithmetic in A21). Ties broken by term asc.
    *
    * Plan shape: explode → two partial-aggregated shuffles (tf on
    * (doc, term), df on term — AQE handles stopword skew) → broadcast of
    * the 1-row corpus count → per-doc top-k window. At 100 TB the window
    * would swap for the k-bounded TopK aggregator (A17); here per-doc
    * term counts are small enough that the window is the clearer plan.
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      explode(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // r14 (guide §2.4): df = distinct docs per term ≡ row count per term
    // over tf, whose (doc_id, term) grouping is already distinct — the
    // second explode scan and the countDistinct's two-phase aggregate
    // collapse onto tf's exchange (ReusedExchange in the plan)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val tot = docs.agg(count(lit(1)).as("n_total"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(tot))
      .withColumn("tfidf_q", expr("(tf * 1000000 * n_total) div df"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf_q").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("doc_id", "term", "tf", "df", "tfidf_q")
      .orderBy(col("doc_id"), col("tfidf_q").desc, col("term"))
  }

  /** F7 — readability scoring: a Flesch-reading-ease-shaped composite
    * from three regex counts (sentence terminator runs, whitespace
    * tokens, vowel-group "syllables" — the standard no-dictionary
    * syllable proxy). Quality filters for pretraining corpora gate on
    * exactly this family of scores. Pure codegen'd projection — zero
    * shuffles at any scale. The score is two IEEE divisions of exact
    * integers and a fixed-order linear combine of decimal literals, so
    * both engines produce bit-identical doubles before the §4 rounding.
    */
  def textReadability(spark: SparkSession, dir: String): DataFrame = {
    val nSent = greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1)).cast("double")
    val nWords = size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).cast("double")
    val nSyll = greatest(size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))), lit(1)).cast("double")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        nSent.cast("long").as("n_sent"),
        nWords.cast("long").as("n_words"),
        nSyll.cast("long").as("n_syll"),
        OracleRound.r4b(nWords / nSent).as("words_per_sent"),
        OracleRound.r4b(nSyll / nWords).as("syll_per_word"),
        OracleRound.r4b(lit(206.835) - lit(1.015) * (nWords / nSent) - lit(84.6) * (nSyll / nWords)).as("flesch"))
      .orderBy("doc_id")
  }

  /** F8 — character-class Shannon entropy: the distribution of
    * {lowercase, uppercase, digit, whitespace, other} characters per
    * document, H = −Σ p·ln(p) over non-empty classes. Low-entropy
    * documents (all caps, digit dumps, single-class runs) are classic
    * corpus-quality rejects; this complements F2's ratio gates with a
    * single scalar.
    *
    * Class counts are exact integers (length minus the class-stripped
    * length); each ln() term is the identical fixed-order IEEE
    * expression on both engines, rounded via OracleRound — the same §4
    * treatment as every computed double. Shuffle-free projection.
    */
  def textCharEntropy(spark: SparkSession, dir: String): DataFrame = {
    val n = length(col("text"))
    def cnt(re: String): Column =
      n - length(regexp_replace(col("text"), re, ""))
    val lo = cnt("[a-z]"); val up = cnt("[A-Z]")
    val di = cnt("[0-9]"); val sp = cnt("[ \\t\\n\\x0B\\f\\r]")
    def term(c: Column): Column = {
      val p = c.cast("double") / col("n_chars_t").cast("double")
      when(c > 0, p * log(p)).otherwise(lit(0.0))
    }
    Tables.documents(spark, dir)
      .withColumn("n_chars_t", n)
      .withColumn("c_lo", lo).withColumn("c_up", up)
      .withColumn("c_di", di).withColumn("c_sp", sp)
      .withColumn("c_ot", col("n_chars_t") - col("c_lo") - col("c_up") - col("c_di") - col("c_sp"))
      .select(col("doc_id"),
        col("n_chars_t").cast("long").as("n"),
        col("c_lo").cast("long").as("n_lower"),
        col("c_up").cast("long").as("n_upper"),
        col("c_di").cast("long").as("n_digit"),
        col("c_sp").cast("long").as("n_space"),
        col("c_ot").cast("long").as("n_other"),
        when(col("n_chars_t") > 0,
          OracleRound.r4b(-(term(col("c_lo")) + term(col("c_up")) + term(col("c_di")) +
            term(col("c_sp")) + term(col("c_ot")))))
          .as("entropy"))
      .orderBy("doc_id")
  }

  /** F9 — corpus bigram language-model statistics: the top-20 bigrams by
    * count with their conditional probability P(w₂|w₁) — the first pass
    * of every statistical LM and the basis of collocation scoring. The
    * conditional is quantized to the integer `(c₁₂·10⁶) div c₁` (TF-IDF's
    * F6 trick) so it replays exactly; c₁ is the count of bigrams
    * STARTING with w₁ (the proper LM denominator — per-document last
    * tokens don't emit).
    *
    * Plan shape: one tokenize+explode scan → (w₁,w₂) partial-aggregated
    * shuffle → per-w₁ totals as a window over the ALREADY-AGGREGATED
    * bigram table (vocabulary-sized, not corpus-sized) → global top-20.
    */
  def textBigramLm(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = Tables.documents(spark, dir)
      .select(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+").as("tokens"))
      .filter(size(col("tokens")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(tokens) - 2),
          |          i -> named_struct('w1', tokens[i], 'w2', tokens[i + 1]))""".stripMargin))
        .as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val counts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val w1Tot = Window.partitionBy("w1")
    counts
      .withColumn("c1", sum("c12").over(w1Tot))
      .withColumn("p_q6", expr("c12 * 1000000 div c1"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(20)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tfidf" -> (textTfidf _),
    "text_readability" -> (textReadability _),
    "text_char_entropy" -> (textCharEntropy _),
    "text_bigram_lm" -> (textBigramLm _))

  private val bigramLmSql: String =
    """WITH tok AS (
      |  SELECT string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS tokens FROM documents),
      |bg AS (
      |  SELECT unnest(tokens[1 : len(tokens) - 1]) AS w1,
      |         unnest(tokens[2 : len(tokens)]) AS w2
      |  FROM tok WHERE len(tokens) >= 2),
      |c AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
      |t AS (SELECT *, sum(c12) OVER (PARTITION BY w1) AS c1 FROM c)
      |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT) AS c1,
      |       CAST(c12 * 1000000 // c1 AS BIGINT) AS p_q6
      |FROM (SELECT * FROM t ORDER BY c12 DESC, w1, w2 LIMIT 20)
      |ORDER BY c12 DESC, w1, w2""".stripMargin

  private def entropyTermSql(c: String): String =
    s"(CASE WHEN $c > 0 THEN (CAST($c AS DOUBLE) / CAST(n AS DOUBLE)) * " +
      s"ln(CAST($c AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END)"

  val oracles: Map[String, String] = Map(
    "text_bigram_lm" -> bigramLmSql,
    "text_char_entropy" -> {
      val sum = Seq("c_lo", "c_up", "c_di", "c_sp", "c_ot")
        .map(entropyTermSql).mkString(" + ")
      s"""WITH c AS (
         | SELECT doc_id, length(text) AS n,
         |  length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS c_lo,
         |  length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS c_up,
         |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS c_di,
         |  length(text) - length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]', '', 'g')) AS c_sp
         | FROM documents),
         |c2 AS (SELECT *, n - c_lo - c_up - c_di - c_sp AS c_ot FROM c)
         |SELECT doc_id,
         | CAST(n AS BIGINT) AS n,
         | CAST(c_lo AS BIGINT) AS n_lower, CAST(c_up AS BIGINT) AS n_upper,
         | CAST(c_di AS BIGINT) AS n_digit, CAST(c_sp AS BIGINT) AS n_space,
         | CAST(c_ot AS BIGINT) AS n_other,
         | CASE WHEN n > 0 THEN ${OracleRound.sql4(s"-($sum)")} END AS entropy
         |FROM c2 ORDER BY doc_id""".stripMargin
    },
    "text_tfidf" ->
      """WITH toks AS (
        | SELECT doc_id, unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS term
        | FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS n_total FROM documents),
        |scored AS (
        | SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
        |  CAST(df.df AS BIGINT) AS df,
        |  CAST((tf.tf * 1000000 * t.n_total) // df.df AS BIGINT) AS tfidf_q
        | FROM tf JOIN df USING (term) CROSS JOIN tot t)
        |SELECT doc_id, term, tf, df, tfidf_q FROM (
        | SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_q DESC, term) AS rn
        | FROM scored)
        |WHERE rn <= 3
        |ORDER BY doc_id, tfidf_q DESC, term""".stripMargin,
    "text_readability" ->
      s"""WITH c AS (
        | SELECT doc_id,
        |  greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sent,
        |  len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS n_words,
        |  greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS n_syll
        | FROM documents)
        |SELECT doc_id,
        | CAST(n_sent AS BIGINT) AS n_sent,
        | CAST(n_words AS BIGINT) AS n_words,
        | CAST(n_syll AS BIGINT) AS n_syll,
        | ${OracleRound.sql4("CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE)")} AS words_per_sent,
        | ${OracleRound.sql4("CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)")} AS syll_per_word,
        | ${OracleRound.sql4("206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE)) - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))")} AS flesch
        |FROM c ORDER BY doc_id""".stripMargin)
}
