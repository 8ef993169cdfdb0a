package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact-arithmetic helpers for oracle parity.
  *
  * Summing doubles is order-dependent, and Spark's partial-aggregation
  * order differs from DuckDB's — so any double SUM over enough rows can
  * drift in the last ulp and fail a hash compare. The fix: cast the
  * inputs to DECIMAL (exact, associative), aggregate in decimal, and
  * cast the *final* result to double. Both engines then produce the
  * bit-identical double. This also mirrors what a production engine
  * does with money columns at 100 TB: decimal fixed-point, not float.
  */
object Exact {
  /** Money-ish columns in the test data carry at most 2 fractional digits. */
  val Money: DecimalType = DecimalType(18, 2)

  def dec(c: Column): Column = c.cast(Money)

  /** SUM in decimal, surfaced as double (bit-exact across engines). */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** SUM of a decimal-valued expression (already exact), as double. */
  def dsumExpr(c: Column): Column = sum(c).cast(DoubleType)

  /** Mean over ALL rows: exact decimal SUM cast to double, divided by
    * COUNT(*). NOTE this is NOT SQL AVG for nullable inputs — AVG
    * divides by the non-null count, this divides by the row count
    * (matching the SUM/COUNT(*) oracles it pairs with; the TPC-H money
    * columns are non-null, where the two coincide). For a nullable
    * column use sum(dec(c))/count(c). */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(lit(1))
}
