package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native multi-table LSH bucketing: all `nTables` (table, bucket)
  * assignments of a vector in one fused loop.
  *
  * The composable formulation (VectorOps.lshBuckets) evaluates
  * nTables×nPlanes separate `aggregate(zip_with(...))` trees — each
  * allocates an intermediate array and a `sequence(...)` index array per
  * row, ~72 array allocations per input vector. The hyperplane components
  * are data-independent constants (derived from xxhash64(planeId, i)), so
  * this expression memoizes them process-wide and reduces the per-row work
  * to nTables×nPlanes×dim fused multiply-adds. Bucket values are
  * bit-identical to the HOF formulation (same hash, same `% 10007`
  * mapping, same ascending-index accumulation order) — asserted in
  * SimilaritySpec.
  */
object LshPlaneCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Double]()

  /** Component i of pseudo-random hyperplane `planeId`, identical to
    * `xxhash64(lit(planeId), i) % 10007 / 10007.0` (VectorOps.hyperplaneBit). */
  def component(planeId: Int, i: Int): Double = {
    val key = (planeId.toLong << 32) | (i.toLong & 0xFFFFFFFFL)
    var v = cache.get(key)
    if (v == null) {
      // seed 42 = the sql xxhash64() default
      val h = XxHash64(Seq(Literal(planeId), Literal(i)), 42L)
        .eval(InternalRow.empty).asInstanceOf[Long]
      v = java.lang.Double.valueOf((h % 10007L).toDouble / 10007.0)
      cache.put(key, v)
    }
    v.doubleValue()
  }
}

case class LshBucketsExpr(child: Expression, nPlanes: Int, nTables: Int)
  extends UnaryExpression with CodegenFallback {

  // `1L << p` wraps at 64 (Java shift is mod 64) and the plane-id scheme
  // `t * 1024 + p` aliases planes across tables past 1024 — either would
  // silently degrade bucket quality rather than error, so bound them here
  require(nPlanes >= 1 && nPlanes <= 64,
    s"nPlanes must be in [1, 64] (bucket bits are a Long), got $nPlanes")
  require(nTables >= 1, s"nTables must be >= 1, got $nTables")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("table", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_lsh_buckets"

  // fail at analysis, not with garbage buckets: the eval below reads the
  // element buffer with getFloat/getDouble, so any other element type
  // (e.g. int arrays) must be rejected or cast by the caller
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double>, got ${other.sql}")
    }

  private lazy val elementIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val vec = new Array[Double](n)
    var i = 0
    if (elementIsDouble) { while (i < n) { vec(i) = v.getDouble(i); i += 1 } }
    else { while (i < n) { vec(i) = v.getFloat(i).toDouble; i += 1 } }
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val pid = t * 1024 + p
        var proj = 0.0
        var j = 0
        while (j < n) {
          proj += vec(j) * LshPlaneCache.component(pid, j)
          j += 1
        }
        if (proj >= 0) bucket += 1L << p
        p += 1
      }
      out(t) = InternalRow(t, bucket)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

object LshBucketsExpr {
  def apply(v: Column, nPlanes: Int, nTables: Int): Column =
    Bridge.column(LshBucketsExpr(Bridge.expression(v), nPlanes, nTables))
}
