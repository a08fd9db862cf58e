package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-parity arithmetic helpers.
  *
  * Money columns in the test data carry exactly 2 decimal digits, so
  * casting to DECIMAL(18,2) is lossless and SUM over it is exact —
  * the same plan DuckDB runs for
  * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. This removes
  * float summation-order nondeterminism from the correctness gate
  * while the final DOUBLE keeps result schemas engine-neutral.
  * The reference applies the same trick: TiDB computes money aggs in
  * fixed-point MyDecimal (expression/builtin_arithmetic.go).
  */
object Exact {
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact SUM of a 2dp money column, surfaced as DOUBLE. */
  def sum2(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact SUM of a 2dp*2dp product (e.g. price*(1-disc)), as DOUBLE. */
  def sumProd2(a: Column, b: Column): Column =
    sum(dec2(a) * dec2(b)).cast(DoubleType)

  /** AVG as exact-decimal sum divided by count, in DOUBLE — matches
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)/COUNT(x)`. */
  def avg2(c: Column): Column = sum2(c) / count(c)
}
