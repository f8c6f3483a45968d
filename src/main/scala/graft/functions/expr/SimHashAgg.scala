package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** SimHash aggregate: given pre-hashed set elements (one long per row),
  * produce the 64-bit SimHash signature — per-bit signed counts folded to
  * a sign bitmap. Same TypedImperativeAggregate mechanism as
  * [[MinHashSketch]]: primitive int-array buffer, exact elementwise-sum
  * merge, map-side partials, one 64-int state per group over the shuffle.
  * Identical semantics to the 64-column sum formulation it replaces
  * (bit b set iff the signed count is > 0).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  // update() casts the evaluated child to Long — fail at analysis, not
  // per-row deep inside the aggregate (same rationale as TDigestAgg)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a BIGINT hash column (e.g. xxhash64), got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buffer(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (buffer(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  def apply(hashed: Column): Column =
    Bridge.column(SimHashAgg(Bridge.expression(hashed)).toAggregateExpression())
}
