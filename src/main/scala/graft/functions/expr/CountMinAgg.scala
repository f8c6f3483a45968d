package graft.functions.expr

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Mergeable Count-Min frequency sketch with an EXACT sparse tier — the
  * point-frequency twin of [[DistinctSketchAgg]] (Cormode & Muthukrishnan
  * 2005), rounding out the sketch family next to the reference's
  * approximate aggregates (`tdigest`, `approx_count_distinct` —
  * reference: cpp/src/arrow/compute/api_aggregate.h:437-450). Heavy
  * hitters over a 100 TB key column is this sketch's home turf: the
  * state is a fixed `depth`×`width` long matrix no matter how many
  * distinct keys flow in, and states built per shard/day merge by
  * elementwise ADD — so frequency artifacts compose like q39/q48's
  * distinct sketches, without rescanning data.
  *
  * Mode 1 (exact): a hash→count map of 64-bit XxHash64(seed 42) keys —
  * the same hash Spark's builtin `xxhash64` computes, so probe columns
  * can be hashed with the codegen'd builtin. Below `exactCap` distinct
  * keys the point estimate IS the exact count (up to ~2⁻⁶⁴ collisions),
  * which is what lets a plain COUNT(*) GROUP BY oracle gate the sketch
  * path.
  *
  * Mode 2 (CMS matrix): crossing the cap folds the map into the matrix —
  * row i increments cell `mix(h, i) mod width` (Kirsch–Mitzenmacher
  * double hashing off the one 64-bit key hash). Point estimate = min
  * over rows: one-sided (never under-counts), overshoot ≤ 2eN/width with
  * probability 1−2^−depth.
  *
  * Merge is count-addition in both tiers and degrade distributes over
  * addition (the matrix fold is linear in counts), so partial
  * aggregation and any shuffle merge order give identical states.
  */
case class CountMinAgg(
    child: Expression,
    exactCap: Int = CountMinAgg.DefaultExactCap,
    depth: Int = CountMinAgg.DefaultDepth,
    width: Int = CountMinAgg.DefaultWidth,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinAgg.Buf] {

  require(exactCap >= 1, s"exactCap must be >= 1, got $exactCap")
  require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
  require(width >= 16, s"width must be >= 16, got $width")

  import CountMinAgg.Buf

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_count_min"

  override def createAggregationBuffer(): Buf = new Buf(exactCap, depth, width)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(XxHash64Function.hash(v, child.dataType, 42L), 1L)
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = { b1.mergeIn(b2); b1 }

  override def eval(buf: Buf): Any = buf.serialize()

  override def serialize(buf: Buf): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): Buf =
    Buf.deserialize(bytes, exactCap, depth, width)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {
  /** 64 Ki exact keys ≈ 1 MB worst-case partial; every gate cardinality
    * stays exact. */
  val DefaultExactCap: Int = 1 << 16
  /** depth 5 × width 2048 = 80 KB bounded state after degrade;
    * overshoot ≤ 2eN/2048 ≈ 0.27 % of stream mass w.p. 1 − 2⁻⁵. */
  val DefaultDepth: Int = 5
  val DefaultWidth: Int = 2048

  /** Row-i cell index: Kirsch–Mitzenmacher double hashing off the one
    * 64-bit key hash — h2 forced odd so all rows stay distinct. */
  private def cell(h: Long, row: Int, width: Int): Int = {
    val h2 = (h >>> 32) | 1L
    (java.lang.Long.remainderUnsigned(h + row.toLong * h2, width.toLong)).toInt
  }

  final class Buf(val exactCap: Int, val depth: Int, val width: Int) {
    // exact tier while `map` is non-null; matrix tier once degraded
    var map: mutable.HashMap[Long, Long] = mutable.HashMap.empty[Long, Long]
    var matrix: Array[Long] = _ // depth*width, row-major

    private def matrixAdd(h: Long, c: Long): Unit = {
      var i = 0
      while (i < depth) {
        matrix(i * width + cell(h, i, width)) += c
        i += 1
      }
    }

    private def degrade(): Unit = {
      matrix = new Array[Long](depth * width)
      map.foreach { case (h, c) => matrixAdd(h, c) }
      map = null
    }

    def add(h: Long, c: Long): Unit = {
      if (map != null) {
        map.update(h, map.getOrElse(h, 0L) + c)
        if (map.size > exactCap) degrade()
      } else matrixAdd(h, c)
    }

    def mergeIn(o: Buf): Unit = {
      if (o.map != null) o.map.foreach { case (h, c) => add(h, c) }
      else {
        if (map != null) degrade()
        var i = 0
        while (i < matrix.length) { matrix(i) += o.matrix(i); i += 1 }
      }
    }

    def estimate(h: Long): Long = {
      if (map != null) return map.getOrElse(h, 0L)
      var best = Long.MaxValue
      var i = 0
      while (i < depth) {
        val v = matrix(i * width + cell(h, i, width))
        if (v < best) best = v
        i += 1
      }
      best
    }

    /** Byte layout: tier byte, then an (exactCap, depth, width) header —
      * artifacts persisted with one dimensioning and probed/unioned with
      * another would silently misalign the element-wise matrix add, so
      * [[Buf.deserialize]] validates the header and fails fast instead. */
    def serialize(): Array[Byte] = {
      if (map != null) {
        val bb = ByteBuffer.allocate(13 + 4 + 16 * map.size)
        bb.put(0.toByte).putInt(exactCap).putInt(depth).putInt(width)
        bb.putInt(map.size)
        map.foreach { case (h, c) => bb.putLong(h).putLong(c) }
        bb.array()
      } else {
        val bb = ByteBuffer.allocate(13 + 8 * matrix.length)
        bb.put(1.toByte).putInt(exactCap).putInt(depth).putInt(width)
        matrix.foreach(bb.putLong)
        bb.array()
      }
    }
  }

  object Buf {
    def deserialize(bytes: Array[Byte], exactCap: Int, depth: Int, width: Int): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val tier = bb.get()
      val (ec, d, w) = (bb.getInt, bb.getInt, bb.getInt)
      require(ec == exactCap && d == depth && w == width,
        s"graft_count_min: state was built with (exactCap=$ec, depth=$d, " +
          s"width=$w) but is being read as (exactCap=$exactCap, " +
          s"depth=$depth, width=$width) — re-dimension the probe/union " +
          "to match the persisted artifact")
      val buf = new Buf(exactCap, depth, width)
      if (tier == 0.toByte) {
        val n = bb.getInt
        var i = 0
        while (i < n) { buf.map.update(bb.getLong, bb.getLong); i += 1 }
      } else {
        buf.map = null
        buf.matrix = new Array[Long](depth * width)
        var i = 0
        while (i < buf.matrix.length) { buf.matrix(i) = bb.getLong; i += 1 }
      }
      buf
    }
  }

  def apply(c: Column): Column =
    Bridge.column(CountMinAgg(Bridge.expression(c)).toAggregateExpression())

  def apply(c: Column, exactCap: Int, depth: Int, width: Int): Column =
    Bridge.column(CountMinAgg(
      Bridge.expression(c), exactCap, depth, width).toAggregateExpression())

  /** Static probe for codegen'd expressions: estimated count of the key
    * whose builtin-`xxhash64`(seed 42) hash is `h`.
    *
    * Probing N rows against ONE state (the q53 broadcast-state shape)
    * must not re-deserialize the whole sketch per row — a per-thread
    * one-entry cache reuses the decoded [[Buf]] when the incoming bytes
    * are the same array (identity) or byte-equal to the last state seen
    * (Arrays.equals is a vectorized scan, ~an order cheaper than
    * rebuilding the exact-tier hash map). Distinct states per row still
    * decode each time — correct, just uncached. */
  def estimateBytes(
      bytes: Array[Byte], h: Long, exactCap: Int, depth: Int, width: Int): Long = {
    val cached = lastDecoded.get()
    val buf =
      if (cached != null && cached._2.exactCap == exactCap &&
          cached._2.depth == depth && cached._2.width == width &&
          ((cached._1 eq bytes) || java.util.Arrays.equals(cached._1, bytes)))
        cached._2
      else {
        val b = Buf.deserialize(bytes, exactCap, depth, width)
        lastDecoded.set((bytes, b))
        b
      }
    buf.estimate(h)
  }

  private val lastDecoded = new ThreadLocal[(Array[Byte], Buf)]
}

/** Union aggregate over SERIALIZED [[CountMinAgg]] states — frequency
  * artifacts in ordinary binary columns (per-day shards, per-segment
  * snapshots) combine by count-addition without touching raw data, the
  * [[SketchUnionAgg]] contract for frequencies. */
case class CountMinUnionAgg(
    child: Expression,
    exactCap: Int = CountMinAgg.DefaultExactCap,
    depth: Int = CountMinAgg.DefaultDepth,
    width: Int = CountMinAgg.DefaultWidth,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinAgg.Buf] {

  import CountMinAgg.Buf

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_count_min_union"

  override def createAggregationBuffer(): Buf = new Buf(exactCap, depth, width)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null)
      buf.mergeIn(Buf.deserialize(v.asInstanceOf[Array[Byte]], exactCap, depth, width))
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = { b1.mergeIn(b2); b1 }

  override def eval(buf: Buf): Any = buf.serialize()

  override def serialize(buf: Buf): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): Buf =
    Buf.deserialize(bytes, exactCap, depth, width)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinUnionAgg =
    copy(child = newChildren.head)
}

object CountMinUnionAgg {
  def apply(c: Column): Column =
    Bridge.column(CountMinUnionAgg(Bridge.expression(c)).toAggregateExpression())

  def apply(c: Column, exactCap: Int, depth: Int, width: Int): Column =
    Bridge.column(CountMinUnionAgg(
      Bridge.expression(c), exactCap, depth, width).toAggregateExpression())
}

/** Point-frequency estimate of one serialized Count-Min state for a
  * probe key hashed with builtin `xxhash64` (seed 42 — Spark's default,
  * identical to the aggregate's update hash). Exact below the exact-tier
  * cap; one-sided (≥ true count) after degrade. Codegen'd static call —
  * stays inside whole-stage codegen. */
case class CountMinEstimate(
    left: Expression,
    right: Expression,
    exactCap: Int = CountMinAgg.DefaultExactCap,
    depth: Int = CountMinAgg.DefaultDepth,
    width: Int = CountMinAgg.DefaultWidth)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_min_estimate"

  override def nullSafeEval(state: Any, h: Any): Any =
    CountMinAgg.estimateBytes(
      state.asInstanceOf[Array[Byte]], h.asInstanceOf[Long], exactCap, depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, h) =>
      s"${ev.value} = graft.functions.expr.CountMinAgg.estimateBytes(" +
        s"$s, $h, $exactCap, $depth, $width);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMinEstimate {
  def apply(state: Column, hashed: Column): Column =
    Bridge.column(CountMinEstimate(
      Bridge.expression(state), Bridge.expression(hashed)))

  def apply(state: Column, hashed: Column,
      exactCap: Int, depth: Int, width: Int): Column =
    Bridge.column(CountMinEstimate(
      Bridge.expression(state), Bridge.expression(hashed), exactCap, depth, width))
}
