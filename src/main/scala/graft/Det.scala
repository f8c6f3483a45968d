package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers for oracle-comparable aggregates.
  *
  * Double-precision SUMs are order-dependent: Spark's partial/final
  * aggregation and DuckDB's sequential scan accumulate in different orders,
  * so raw `sum(double)` outputs can differ in the low bits (and, over
  * hundreds of thousands of rows, even past the 2nd decimal).  The fix used
  * throughout the declared queries: compute per-row values in double (IEEE —
  * bit-identical across engines), cast each row to an exact DECIMAL, sum
  * exactly (order-independent), and cast the final result back to double.
  * DuckDB mirror: `CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)`.
  */
object Det {

  /** Exact money/measure type: 19 integer digits, 6 fractional. */
  val Exact: DecimalType = DecimalType(25, 6)

  /** Per-row cast to exact decimal. */
  def dec(c: Column): Column = c.cast(Exact)

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Order-independent mean of a double column, returned as double. */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)

  /** DuckDB SQL fragment mirroring [[dsum]]. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(25,6))) AS DOUBLE)"

  /** DuckDB SQL fragment mirroring [[davg]]. */
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(25,6))) AS DOUBLE) / COUNT($expr)"
}
