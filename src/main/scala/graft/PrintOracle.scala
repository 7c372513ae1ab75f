package graft

/** Dev tool: print the oracle SQL for the named queries (usage:
  * runMain graft.PrintOracle name [name ...]) — lets generated SQL be
  * tested in DuckDB without a full Verify run.
  */
object PrintOracle {
  def main(args: Array[String]): Unit =
    if (args.isEmpty || args.sameElements(Array("--stats"))) {
      val qs = SparkEntry.queries.keySet
      val os = SparkEntry.oracleSql.keySet
      println(s"STATS queries=${qs.size} oracled=${os.size}")
      println(s"STATS rows-only: ${(qs -- os).toSeq.sorted.mkString(", ")}")
    } else args.foreach { name =>
      println(s"-- $name")
      println(SparkEntry.oracleSql.getOrElse(name, s"(no oracle for $name)"))
      println(";")
    }
}
