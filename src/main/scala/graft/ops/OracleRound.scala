package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable rounding for COMPUTED doubles (SURVEY.md §4).
  *
  * `round(x, 4)` is not portable for hash comparison: Spark rounds the
  * double's SHORTEST DECIMAL representation (BigDecimal.valueOf →
  * HALF_UP) while DuckDB rounds in pure binary (x·10⁴ then half-away) —
  * whenever the shortest repr ends in an exact '5' at the 5th decimal the
  * two disagree by one ulp of the 4th decimal (observed on dozens of rows
  * per 600k at sf0.1). `floor(x·10⁴ + 0.5)/10⁴` is pure double
  * arithmetic, bit-identical on any IEEE engine; the SQL mirror is
  * [[sql4]]. Raw parquet values and exact-integer-derived values don't
  * need this (their reprs never land on the half boundary) — plain
  * `round` stays fine there.
  */
object OracleRound {
  /** Binary-deterministic round-half-up(+∞) to 4 decimals. */
  def r4b(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000.0

  /** DuckDB-side mirror of [[r4b]] — interpolate a SQL expression. */
  def sql4(expr: String): String = s"floor(($expr) * 10000 + 0.5) / 10000"
}
