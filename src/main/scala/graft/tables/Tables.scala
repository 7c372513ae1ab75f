package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Typed loaders for the driver-generated test tables (TESTDATA.md).
  *
  * One parquet file per table under `dir`. All operators take `dir` so the
  * same code runs at any scale factor; at cluster scale the same loaders
  * would point at a partitioned table root instead of a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(load(spark, dir, "events"))

  /** Engine contract: `events.ts` is BIGINT epoch-nanoseconds, so all
    * downstream event-time arithmetic (window buckets, session gaps,
    * as-of distances) is exact integer math with no float or timezone
    * behavior. Driver generations have stored ts as parquet
    * timestamp[ns] (surfaced as exact longs by `nanosAsLong`) or
    * timestamp[us] (surfaced as TIMESTAMP_NTZ; converted here — ×1000,
    * exact, no precision loss). The UTC session timezone (GraftSession)
    * makes the NTZ→instant cast the identity mapping, matching DuckDB's
    * `epoch_ns`/`epoch_us` on the same naive values in the oracles.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
