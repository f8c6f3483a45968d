package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** MinHash sketch aggregate: given pre-hashed set elements (one long per
  * row, e.g. `xxhash64(shingle)`), produce the `nHashes`-long signature of
  * per-seed minima in one pass.
  *
  * A TypedImperativeAggregate with a primitive long-array buffer — the
  * mechanism the reference uses for its sketch aggregates (tdigest etc.,
  * cpp/src/arrow/compute/kernels/aggregate_tdigest.cc): mutable state per
  * group, exact merge of partials (elementwise min), so map-side partial
  * aggregation works and the shuffle carries one fixed-size sketch per
  * group instead of the element stream.
  *
  * Per-seed hashes are derived from the input hash by an avalanche mix
  * (splitmix64 finalizer) of `h ^ seededGolden(i)` — statistically
  * independent permutations without materializing per-seed rows.
  */
case class MinHashSketch(
    child: Expression,
    nHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sketch"

  // update() casts the evaluated child to Long — fail at analysis, not
  // per-row deep inside the aggregate (same rationale as TDigestAgg)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a BIGINT hash column (e.g. xxhash64), got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) MinHashSketch.updateWith(buffer, v.asInstanceOf[Long], nHashes)
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketch =
    copy(child = newChildren.head)
}

object MinHashSketch {
  def apply(hashed: Column, nHashes: Int): Column =
    Bridge.column(
      MinHashSketch(Bridge.expression(hashed), nHashes).toAggregateExpression())

  private val Golden = 0x9E3779B97F4A7C15L

  @inline private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline private[graft] def updateWith(
      buffer: Array[Long], h: Long, nHashes: Int): Unit = {
    var i = 0
    while (i < nHashes) {
      val hi = mix(h ^ (Golden * (i + 1)))
      if (hi < buffer(i)) buffer(i) = hi
      i += 1
    }
  }

  /** The aggregate's per-seed minima fold over an in-memory element
    * iterator — shared with the STREAMING twin
    * ([[graft.streaming.StreamingDedup]]) so a document's signature is
    * bit-identical whether it was aggregated in a batch group-by or
    * computed row-local inside a stateful processor. */
  private[graft] def signatureOf(hashes: Iterator[Long], nHashes: Int): Array[Long] = {
    val buf = Array.fill(nHashes)(Long.MaxValue)
    while (hashes.hasNext) updateWith(buf, hashes.next(), nHashes)
    buf
  }
}
