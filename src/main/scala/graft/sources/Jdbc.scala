package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink — SURVEY.md §2.I10/I11.
  *
  * The reference's system of record is a relational database: it opens a
  * connection at the top of every ETL run, INSERTs each day's rows, and
  * UPDATEs them the next day (straslerj/mlb-win-predictor
  * src/function.py:55, :552-649, :480). This is the Spark-native
  * counterpart: `spark.read.jdbc` / `DataFrameWriter.jdbc` against an
  * embedded Derby database (ships with Spark, zero egress), exercising
  * the same production surface a Postgres deployment uses — only the URL
  * and driver change.
  *
  * Scale notes: at 100 TB the JDBC side holds DIMENSIONS and run
  * metadata, never the facts. Reads must be range-partitioned
  * (`partitionColumn`/`numPartitions`) so every executor pulls its own
  * slice in parallel instead of funneling the table through one
  * connection; writes batch inserts per partition (Spark's JDBC sink
  * default). UPDATE-in-place doesn't scale — the merge query below lands
  * immutable batch appends and resolves latest-wins on read, the same
  * merge-on-read contract as the parquet I4 path.
  */
object Jdbc {

  /** Derby writes `derby.log` to `derby.system.home` (default: the
    * process cwd — the repo checkout under sbt). Pin home AND the error
    * stream to a scratch dir once. The pin must run EARLY: if something
    * else boots the embedded engine first (a Hive-enabled session's
    * metastore_db), the properties are read once at boot and a late set
    * is ignored — so [[GraftSession.builder]] calls [[pin]] before any
    * SparkSession exists, and the properties are only set if absent
    * (never clobbering an operator's deliberate configuration).
    */
  lazy val pin: Unit = {
    val home = graft.Scratch.dir("derby")
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", home)
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file", s"$home/derby.log")
  }

  /** Embedded (in-process) database URL; the directory must not yet
    * exist — Derby creates it.
    */
  def derbyUrl(dbDir: String): String = {
    pin
    s"jdbc:derby:$dbDir;create=true"
  }

  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  /** `mode=overwrite` drops and recreates the table (day-zero load);
    * `mode=append` is the daily INSERT.
    */
  def write(df: DataFrame, url: String, table: String,
            mode: String = "overwrite"): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** Single-connection read — only for tiny tables (run metadata). */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * connections each scan one `partitionColumn` stride — the only JDBC
    * read shape that survives a large table.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long,
                      upperBound: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)
}
