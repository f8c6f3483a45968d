package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversions —
  * Spark 4 hid `Column.expr` behind `classic.ExpressionUtils`, which custom
  * Catalyst expressions (a supported extension point) still need. This is
  * the only file outside the `graft` namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (for embedding under custom
    * logical operators). */
  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** DataFrame over a custom logical plan (`Dataset.ofRows` is
    * private[sql]). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a SQL-callable function on an already-running session
    * (`sessionState` is private[sql]); used by GraftSession.tune so
    * driver-created sessions get the graft_* functions without needing
    * `--conf spark.sql.extensions`. */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!registry.functionExists(id)) {
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
