package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ml.{Irls, Metrics, Ml3, Ml4, Ml5, Models, NaiveBayes, Ols}
import graft.ops.{Analytics, AsOf, BandTune, BlockTune, Bpe, Corpus, Corpus2, Dedup, Dedup2, DistRank, Features, Features2, Features3, GraphAnn, Multimodal, Pipeline, Quality, QualityGate, Redact, Relational, Relational2, Relational3, Relational4, Relational5, Similarity, StatsPlan, Takedown, Text, Text2, Vacuum, VocabTrain}
import graft.plans.TopK
import graft.sources.SourceQueries
import graft.streaming.Events

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qMultiJoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ Relational2.all ++ Relational3.all ++ Relational4.all ++ Relational5.all ++ Analytics.all ++ Quality.all ++ AsOf.all ++ TopK.all ++ Features.all ++
      Features2.all ++ Features3.all ++ Models.all ++ Metrics.all ++ Ml3.all ++ Ml4.all ++ Ml5.all ++ Ols.all ++ Irls.all ++ NaiveBayes.all ++
      DistRank.all ++ Corpus.all ++ Corpus2.all ++ Dedup.all ++ Dedup2.all ++ Pipeline.all ++ Similarity.all ++ Text.all ++ Text2.all ++ Events.all ++
      Multimodal.all ++ SourceQueries.all ++ Redact.all ++ Bpe.all ++ QualityGate.all ++ GraphAnn.all ++ StatsPlan.all ++ BandTune.all ++ BlockTune.all ++ VocabTrain.all ++ Vacuum.all ++ Takedown.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Relational3.oracles ++ Relational4.oracles ++ Relational5.oracles ++ Analytics.oracles ++ Quality.oracles ++ AsOf.oracles ++ TopK.oracles ++
      Features.oracles ++ Features2.oracles ++ Features3.oracles ++ Models.oracles ++ Metrics.oracles ++ Ml3.oracles ++ Ml4.oracles ++ Ml5.oracles ++ Ols.oracles ++ Irls.oracles ++ NaiveBayes.oracles ++
      DistRank.oracles ++ Corpus.oracles ++ Corpus2.oracles ++ Dedup.oracles ++ Dedup2.oracles ++ Pipeline.oracles ++ Similarity.oracles ++ Text.oracles ++
      Text2.oracles ++ Events.oracles ++ Multimodal.oracles ++ SourceQueries.oracles ++ Redact.oracles ++ Bpe.oracles ++ QualityGate.oracles ++ GraphAnn.oracles ++ StatsPlan.oracles ++ BandTune.oracles ++ BlockTune.oracles ++ VocabTrain.oracles ++ Vacuum.oracles ++ Takedown.oracles
}
