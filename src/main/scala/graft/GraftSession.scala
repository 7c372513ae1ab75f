package graft

import org.apache.spark.sql.SparkSession

/** Standard tuned SparkSession for the graft engine.
  *
  * Settings chosen for a multi-executor deployment and mirrored in local
  * mode: AQE on (runtime coalescing + skew-join splitting), shuffle
  * partitions sized to cores (not the 200 default), UTC session time, and
  * nanosecond parquet timestamps surfaced as exact Long nanos (Spark has
  * no nanos timestamp type; truncating would lose ordering information).
  * Micro-precision event timestamps are normalized to the same Long-nanos
  * contract at load time instead (`Tables.normalizeTs`) — the UTC session
  * timezone makes that conversion storage-independent.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)}]",
              shufflePartitions: Int = 32): SparkSession.Builder = {
    // before ANY session exists: a Hive-enabled session would boot the
    // embedded Derby metastore with cwd defaults, and Derby reads its
    // system properties only once at boot
    graft.sources.Jdbc.pin
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
  }

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
