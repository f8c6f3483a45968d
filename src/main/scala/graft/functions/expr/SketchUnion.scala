package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Union aggregate over SERIALIZED [[DistinctSketchAgg]] states — the
  * merge half of the sketch exposed as its own aggregate, so sketch
  * states can live in ordinary binary columns (parquet shards, graph
  * iteration frames) and be combined later without touching raw data.
  * This is the same contract as q39's `hll_union_agg` over persisted
  * Datasketches blobs, for the graft sketch; HyperBall's per-node
  * neighborhood balls ([[graft.pipeline.GraphOps.harmonicCentrality]])
  * iterate exactly this aggregate over the edge frame.
  *
  * Merge is set-union / register-max — order-independent in and across
  * both tiers, so partial aggregation is free and any shuffle order
  * gives identical bytes after [[DistinctSketchAgg.Buf.serialize]]'s
  * canonicalization (exact-tier serialization order is the hash set's
  * iteration order, so EQUALITY is asserted on estimates, not bytes).
  */
case class SketchUnionAgg(
    child: Expression,
    exactCap: Int = DistinctSketchAgg.DefaultExactCap,
    lgK: Int = DistinctSketchAgg.DefaultLgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DistinctSketchAgg.Buf] {

  import DistinctSketchAgg.Buf

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_sketch_union"

  override def createAggregationBuffer(): Buf = new Buf(exactCap, lgK)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null)
      buf.mergeIn(Buf.deserialize(v.asInstanceOf[Array[Byte]], exactCap, lgK))
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = { b1.mergeIn(b2); b1 }

  override def eval(buf: Buf): Any = buf.serialize()

  override def serialize(buf: Buf): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): Buf =
    Buf.deserialize(bytes, exactCap, lgK)

  override def withNewMutableAggBufferOffset(newOffset: Int): SketchUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SketchUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SketchUnionAgg =
    copy(child = newChildren.head)
}

object SketchUnionAgg {
  def apply(c: Column): Column =
    Bridge.column(SketchUnionAgg(Bridge.expression(c)).toAggregateExpression())

  def apply(c: Column, exactCap: Int, lgK: Int): Column =
    Bridge.column(
      SketchUnionAgg(Bridge.expression(c), exactCap, lgK).toAggregateExpression())
}

/** Distinct-count estimate of one serialized sketch state — exact below
  * the exact-tier cap (see [[DistinctSketchAgg]]). Codegen'd as a static
  * call, so it stays inside whole-stage codegen. */
case class DistinctSketchEstimate(
    child: Expression,
    exactCap: Int = DistinctSketchAgg.DefaultExactCap,
    lgK: Int = DistinctSketchAgg.DefaultLgK)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sketch_estimate"

  override def nullSafeEval(input: Any): Any =
    DistinctSketchAgg.estimateBytes(input.asInstanceOf[Array[Byte]], exactCap, lgK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.DistinctSketchAgg.estimateBytes(" +
        s"$c, $exactCap, $lgK);")

  override protected def withNewChildInternal(
      newChild: Expression): DistinctSketchEstimate = copy(child = newChild)
}

object DistinctSketchEstimate {
  def apply(c: Column): Column =
    Bridge.column(DistinctSketchEstimate(Bridge.expression(c)))

  def apply(c: Column, exactCap: Int, lgK: Int): Column =
    Bridge.column(DistinctSketchEstimate(Bridge.expression(c), exactCap, lgK))
}

/** Singleton sketch state for one 64-bit hash — the seed of HyperBall's
  * per-node ball. */
case class DistinctSketchSingleton(
    child: Expression,
    exactCap: Int = DistinctSketchAgg.DefaultExactCap,
    lgK: Int = DistinctSketchAgg.DefaultLgK)
  extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_sketch_singleton"

  override def nullSafeEval(input: Any): Any =
    DistinctSketchAgg.singleton(input.asInstanceOf[Long], exactCap, lgK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.DistinctSketchAgg.singleton(" +
        s"$c, $exactCap, $lgK);")

  override protected def withNewChildInternal(
      newChild: Expression): DistinctSketchSingleton = copy(child = newChild)
}

object DistinctSketchSingleton {
  def apply(c: Column): Column =
    Bridge.column(DistinctSketchSingleton(Bridge.expression(c)))

  def apply(c: Column, exactCap: Int, lgK: Int): Column =
    Bridge.column(DistinctSketchSingleton(Bridge.expression(c), exactCap, lgK))
}
