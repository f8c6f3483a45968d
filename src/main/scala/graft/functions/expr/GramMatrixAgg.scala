package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Exact second-moment (Gram) + first-moment accumulator over a vector
  * column — the ONE distributed pass dimensionality reduction needs
  * (covariance/PCA: the d×d matrix is tiny, the n×d data is not).
  * Every per-row term is scaled by 2⁴⁰ — a POWER OF TWO, so the scaling
  * multiply is IEEE-exact — and rounded half-away-from-zero to a long;
  * the cross-row sums are then pure integer addition: order-independent,
  * map-side combinable, and bit-replayable by any engine
  * (`SUM(CAST(round(x*2^40, 0) AS HUGEINT))` in DuckDB).
  *
  * State/result layout (longs): `[n, M_0..M_{d-1}, G_00..G_{d-1,d-1}]`
  * where `M_i = Σ round(x_i·2⁴⁰)` and `G_ij = Σ round(x_i·x_j·2⁴⁰)`
  * (row-major, symmetric — update fills the upper triangle and mirrors).
  * 1 + d + d² longs ≈ 33 KB at d = 64 — the bounded exchange a driver-
  * side eigen-solve is allowed to collect ([[graft.pipeline.Pca]]).
  *
  * Overflow is ENFORCED, not assumed: every term is range-checked
  * (finite, |term| < 2⁶²) and every accumulation goes through
  * `Math.addExact` in both `update` and `merge`, so exceeding the
  * documented envelope (|x_i·x_j| and n together driving |G_ij| past
  * 2⁶³) throws loudly instead of silently wrapping — PCA loadings can
  * be wrong only if the job failed, never quietly. `addExact` is a JIT
  * intrinsic (branch-on-overflow), so the hot loop stays tight.
  */
case class GramMatrixAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1 && dim <= 512, s"dim must be in [1, 512], got $dim")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_matrix"

  private def len = 1 + dim + dim * dim

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == dim,
      s"graft_gram_matrix: expected dim $dim, got ${arr.numElements()}")
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    buf(0) = Math.addExact(buf(0), 1L)
    i = 0
    while (i < dim) {
      buf(1 + i) = Math.addExact(buf(1 + i),
        GramMatrixAgg.rnd(x(i) * GramMatrixAgg.Scale))
      var j = i
      while (j < dim) {
        val t = GramMatrixAgg.rnd(x(i) * x(j) * GramMatrixAgg.Scale)
        val k = 1 + dim + i * dim + j
        buf(k) = Math.addExact(buf(k), t)
        if (j != i) {
          val k2 = 1 + dim + j * dim + i
          buf(k2) = Math.addExact(buf(k2), t)
        }
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(len)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrixAgg =
    copy(child = newChildren.head)
}

object GramMatrixAgg {
  /** 2⁴⁰ — a power of two, so `x·Scale` is IEEE-exact. */
  val Scale: Double = java.lang.Math.scalb(1.0, 40)

  /** Round half away from zero — `round(x, 0)` in both Spark and DuckDB.
    * Range-checked: NaN/Inf or |v| ≥ 2⁶² (i.e. |x_i·x_j| ≥ 2²²) throws
    * instead of letting `toLong` saturate silently. */
  def rnd(v: Double): Long = {
    if (v.isNaN || math.abs(v) >= MaxTerm)
      throw new ArithmeticException(
        s"graft_gram_matrix: term $v outside the exact-long envelope " +
          s"(non-finite or |x_i*x_j| >= 2^22) — normalize the input vectors")
    (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
  }

  /** 2⁶² — per-term bound leaving one doubling of headroom below 2⁶³. */
  private val MaxTerm: Double = java.lang.Math.scalb(1.0, 62)

  def apply(c: Column, dim: Int): Column =
    Bridge.column(GramMatrixAgg(Bridge.expression(c), dim).toAggregateExpression())
}
