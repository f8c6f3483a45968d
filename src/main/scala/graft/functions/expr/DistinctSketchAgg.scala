package graft.functions.expr

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Mergeable distinct-count sketch with an EXACT sparse tier — the
  * two-mode design of the approximate-distinct family the reference
  * exposes (`approx_count_distinct` sketches in Datasketches layout;
  * Spark's builtin HLL++ is dense-only and approximate even at tiny
  * cardinalities, which makes it ungateable against COUNT(DISTINCT)).
  *
  * Mode 1 (exact): a set of 64-bit XxHash64 values. Below `exactCap` the
  * estimate IS the set size — exact up to the ~2⁻⁶⁴ hash-collision odds
  * (≈1e-11 even at the cap), which is what lets the same DuckDB
  * COUNT(DISTINCT) oracle gate the sketch path.
  *
  * Mode 2 (HLL registers): crossing the cap folds the hashes into 2^lgK
  * max-rank registers (top lgK bits address, leading-zero rank of the
  * rest) and the state is bounded at 2^lgK bytes forever after — the
  * reducer-memory contract a 100 TB profiling pass needs. Estimate is
  * standard bias-corrected HLL with small-range linear counting.
  *
  * Merge is order-independent in both tiers (set union / register max,
  * and the exact→register degrade commutes with both), so partial
  * aggregation and any shuffle merge order give identical results.
  */
case class DistinctSketchAgg(
    child: Expression,
    exactCap: Int = DistinctSketchAgg.DefaultExactCap,
    lgK: Int = DistinctSketchAgg.DefaultLgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DistinctSketchAgg.Buf] {

  require(exactCap >= 1, s"exactCap must be >= 1, got $exactCap")
  require(lgK >= 4 && lgK <= 18, s"lgK must be in [4, 18], got $lgK")

  import DistinctSketchAgg.Buf

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_distinct_sketch"

  override def createAggregationBuffer(): Buf = new Buf(exactCap, lgK)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = { b1.mergeIn(b2); b1 }

  override def eval(buf: Buf): Any = buf.estimate

  override def serialize(buf: Buf): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): Buf =
    Buf.deserialize(bytes, exactCap, lgK)

  override def withNewMutableAggBufferOffset(newOffset: Int): DistinctSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DistinctSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DistinctSketchAgg =
    copy(child = newChildren.head)
}

object DistinctSketchAgg {
  /** 64 Ki hashes ≈ 512 KB worst-case partial — small enough to ship
    * per map task, large enough that every gate cardinality stays in the
    * exact tier. */
  val DefaultExactCap: Int = 1 << 16
  /** 16 Ki registers = 16 KB bounded state, ~0.8 % RSE after degrade. */
  val DefaultLgK: Int = 14

  final class Buf(val exactCap: Int, val lgK: Int) {
    // exact tier while `set` is non-null; register tier once degraded
    var set: mutable.HashSet[Long] = mutable.HashSet.empty[Long]
    var regs: Array[Byte] = _

    private def regUpdate(h: Long): Unit = {
      val idx = (h >>> (64 - lgK)).toInt
      val w = h << lgK
      // rank of the first 1-bit in the non-address remainder, 1-based;
      // an all-zero remainder saturates at (64 - lgK + 1)
      val rank = if (w == 0L) 65 - lgK
        else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rank > regs(idx)) regs(idx) = rank.toByte
    }

    private def degrade(): Unit = {
      regs = new Array[Byte](1 << lgK)
      set.foreach(regUpdate)
      set = null
    }

    def add(h: Long): Unit = {
      if (set != null) {
        set += h
        if (set.size > exactCap) degrade()
      } else regUpdate(h)
    }

    def mergeIn(o: Buf): Unit = {
      if (o.set != null) o.set.foreach(add)
      else {
        if (set != null) degrade()
        var i = 0
        while (i < regs.length) {
          if (o.regs(i) > regs(i)) regs(i) = o.regs(i)
          i += 1
        }
      }
    }

    def estimate: Long = {
      if (set != null) return set.size.toLong
      val m = 1 << lgK
      // Flajolet et al. give exact alpha for the three smallest register
      // counts; the 0.7213/(1+1.079/m) form is the m >= 128 asymptote and
      // carries avoidable bias at m = 16/32/64 (lgK 4-6).
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _  => 0.7213 / (1.0 + 1.079 / m)
      }
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
        if (regs(i) == 0) zeros += 1
        i += 1
      }
      val raw = alpha * m * m / sum
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else raw
      math.rint(est).toLong
    }

    def serialize(): Array[Byte] = {
      if (set != null) {
        val bb = ByteBuffer.allocate(1 + 4 + 8 * set.size)
        bb.put(0.toByte).putInt(set.size)
        set.foreach(bb.putLong)
        bb.array()
      } else {
        val bb = ByteBuffer.allocate(1 + regs.length)
        bb.put(1.toByte).put(regs)
        bb.array()
      }
    }
  }

  object Buf {
    def deserialize(bytes: Array[Byte], exactCap: Int, lgK: Int): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Buf(exactCap, lgK)
      if (bb.get() == 0.toByte) {
        val n = bb.getInt
        var i = 0
        while (i < n) { buf.set += bb.getLong; i += 1 }
      } else {
        buf.set = null
        buf.regs = new Array[Byte](1 << lgK)
        bb.get(buf.regs)
      }
      buf
    }
  }

  def apply(c: Column): Column =
    Bridge.column(DistinctSketchAgg(Bridge.expression(c)).toAggregateExpression())

  def apply(c: Column, exactCap: Int, lgK: Int): Column =
    Bridge.column(
      DistinctSketchAgg(Bridge.expression(c), exactCap, lgK).toAggregateExpression())

  /** Serialized-state constructors for graph-shaped uses (HyperBall
    * balls): a singleton sketch for one hashed element, estimate of a
    * serialized state. Static so codegen'd expressions can call them. */
  def singleton(h: Long, exactCap: Int, lgK: Int): Array[Byte] = {
    val b = new Buf(exactCap, lgK)
    b.add(h)
    b.serialize()
  }

  def estimateBytes(bytes: Array[Byte], exactCap: Int, lgK: Int): Long =
    Buf.deserialize(bytes, exactCap, lgK).estimate
}
