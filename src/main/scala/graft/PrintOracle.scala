package graft

/** Dev tool: print the oracle SQL for the named queries (usage:
  * runMain graft.PrintOracle name [name ...]) — lets generated SQL be
  * tested in DuckDB without a full Verify run.
  */
object PrintOracle {
  def main(args: Array[String]): Unit =
    args.foreach { name =>
      println(s"-- $name")
      println(SparkEntry.oracleSql.getOrElse(name, s"(no oracle for $name)"))
      println(";")
    }
}
