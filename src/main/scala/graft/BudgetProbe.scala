package graft

/** One-off helper: measure per-query shuffle bytes to derive the pinned
  * budgets in [[ShuffleBudget]]. Not part of the driver contract.
  */
object BudgetProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    // probe under the SAME config the gate runs in: the sf0.001 table is
    // enforced by PlanAuditSpec under the 4-partition test session, the
    // sf0.1 table by the 32-partition bench session
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTITIONS", "32").toInt
    val spark = GraftSession.builder(shufflePartitions = parts).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val m = Telemetry.measure(SparkEntry.queries(name)(spark, dir))
      println(s"PROBE $name ${m.shuffleBytesWritten}")
    }
    spark.stop()
  }
}
