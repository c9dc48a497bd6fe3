package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared across operators.
  *
  * Determinism policy: the raw tables store money/ratio columns as
  * doubles whose values are exact 2-decimal quantities. Summing doubles
  * is partition-order dependent, so every aggregation first casts to
  * DECIMAL (exact, order-independent) and only the final result is cast
  * back to double. That makes results bit-identical regardless of
  * parallelism — on 4 local threads or 1000 executors.
  */
object Cols {
  /** Exact 2-decimal view of a money-like double column. */
  def dec2(c: Column, precision: Int = 12): Column = c.cast(DecimalType(precision, 2))

  /** Order-independent SUM over a 2-decimal double column, as double. */
  def sumMoney(c: Column, precision: Int = 12): Column = sum(dec2(c, precision)).cast("double")

  /** Order-independent AVG (exact sum / count), as double. */
  def avgMoney(c: Column, precision: Int = 12): Column =
    sum(dec2(c, precision)).cast("double") / count(lit(1))

  /** COUNT of rows matching a predicate (BIGINT in both Spark and DuckDB). */
  def countIf(cond: Column): Column = count(when(cond, lit(1)))
}
