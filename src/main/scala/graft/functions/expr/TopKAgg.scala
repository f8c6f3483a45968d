package graft.functions.expr

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded-heap grouped top-k aggregate — the reference's `select_k`
  * (cpp/src/arrow/compute/kernels/vector_select_k.cc) as a MERGEABLE
  * aggregate instead of a per-group sort.
  *
  * Scale rationale: the window formulation (`row_number() over
  * (partition by g order by s desc) <= k`) shuffles EVERY row to its
  * group's reducer and sorts there; this aggregate keeps a k-entry heap
  * per group, combines map-side, and ships at most k (score, id) pairs
  * per group per map task across the exchange — at 100 TB the shuffle
  * shrinks from the corpus to k·groups. Spark's own
  * TakeOrderedAndProject does this for the GLOBAL top-k (q10); this is
  * the grouped version Catalyst lacks.
  *
  * Deterministic by construction: "better" is the total order
  * (score desc, id asc), and the top-k set under a total order is unique
  * — merge order cannot change it.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def children: Seq[Expression] = score :: id :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("rid", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_top_k"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (s, i) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (DOUBLE score, BIGINT id), got (${s.sql}, ${i.sql})")
    }

  // min-heap on the total order: the head is the WORST kept entry —
  // (higher score, then lower id) is better, so the ordering ranks
  // lower-score/higher-id entries as "largest"
  private def worstFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan[(Double, Long)]((a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def offer(
      buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (better(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN is skipped like null: every comparison against NaN is false, so
    // admitting one below capacity would break the heap invariant and make
    // the kept set merge-order-dependent — violating the determinism
    // contract above
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double]))
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortWith(better) // best first
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  def apply(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}
