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

  /** Physical-row RDD of a DataFrame (`queryExecution.toRdd`) — the
    * unboxed InternalRow stream the vectorized Arrow writer consumes. */
  def toInternalRdd(df: DataFrame): org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.queryExecution.toRdd

  /** Spark's vectorized InternalRow→Arrow-batch serializer (the engine
    * behind toPandas/mapInArrow); private[sql], hence bridged. Emits
    * MessageSerializer-framed record-batch payloads. */
  def toArrowBatchIterator(
      rows: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      maxRecordsPerBatch: Long,
      ctx: org.apache.spark.TaskContext): Iterator[Array[Byte]] =
    org.apache.spark.sql.execution.arrow.ArrowConverters
      .toBatchIterator(rows, schema, maxRecordsPerBatch, "UTC",
        errorOnDuplicatedFieldNames = true, largeVarTypes = false, ctx)

  /** Inverse of [[toArrowBatchIterator]]: Arrow-batch payloads →
    * InternalRows, columnar until the row view. */
  def fromArrowBatchIterator(
      batches: Iterator[Array[Byte]],
      schema: org.apache.spark.sql.types.StructType,
      ctx: org.apache.spark.TaskContext): Iterator[org.apache.spark.sql.catalyst.InternalRow] =
    org.apache.spark.sql.execution.arrow.ArrowConverters
      .fromBatchIterator(batches, schema, "UTC",
        errorOnDuplicatedFieldNames = true, largeVarTypes = false, ctx)

  /** Spark schema → Arrow schema with Spark's own type mapping (nested
    * types included). */
  def toArrowSchema(schema: org.apache.spark.sql.types.StructType): org.apache.arrow.vector.types.pojo.Schema =
    org.apache.spark.sql.util.ArrowUtils.toArrowSchema(
      schema, "UTC", errorOnDuplicatedFieldNames = true, largeVarTypes = false)

  /** Arrow schema → Spark schema (footer-driven schema discovery). */
  def fromArrowSchema(schema: org.apache.arrow.vector.types.pojo.Schema): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.util.ArrowUtils.fromArrowSchema(schema)

  /** DataFrame over an InternalRow RDD without a Row conversion pass
    * (`internalCreateDataFrame` is private[sql]). */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

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
