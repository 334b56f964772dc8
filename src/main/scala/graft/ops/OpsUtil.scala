package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for oracle-comparable aggregates.
  *
  * The driver hash-compares our parquet output against DuckDB. Double
  * summation is order-dependent (shuffle order differs run to run and
  * engine to engine), so any SUM/AVG over a double column that lands in a
  * compared result goes through an exact decimal accumulation and is cast
  * back to double at the end — bit-identical in both engines. Scores that
  * are inherently float math (logs, cosines) are rounded to 6 places on
  * both sides instead.
  */
object OpsUtil {
  private val Dec = DecimalType(28, 4)

  /** Exact, order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact sum at unit scale (15 fractional digits) — for ratios, ranks,
    * and similarity scores where DECIMAL(28,4) would truncate. */
  def rsum(c: Column): Column = sum(c.cast("decimal(28,15)")).cast("double")

  /** Exact average: decimal sum divided (in double space) by count. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast("double") / count(lit(1))

  /** DuckDB-side SQL fragment matching [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,4))) AS DOUBLE)"

  /** DuckDB-side SQL fragment matching [[davg]]. */
  def davgSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*)"
}
