package graft.functions.expr

import java.nio.ByteBuffer

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

  /** Exact-tier storage is a primitive open-addressing hash set of the
    * 64-bit hashes (boxing a `mutable.HashSet[Long]` dominated HyperBall's
    * merge CPU — hundreds of millions of boxed inserts per round). A buf
    * DESERIALIZED from a partial/ball state starts FROZEN: the longs are
    * bulk-copied, not re-hashed (serialized states are set iterations, so
    * they are already distinct and their count is the exact estimate);
    * the hash table is built lazily on first mutation. Semantics — set
    * union, degrade threshold, estimates — are IDENTICAL to the hash-set
    * form in every tier; only element ORDER inside `serialize()` may
    * differ, which the contract explicitly leaves free (equality is
    * asserted on estimates, never bytes). */
  final class Buf(val exactCap: Int, val lgK: Int) {
    // exact tier while `regs` is null: either `table` (live open-addressed
    // set; 0L tracked by `hasZero` since empty slots read 0) or `frozen`
    // (deserialized distinct longs, not yet hashed)
    private var table: Array[Long] = _
    private var mask = 0
    private var n = 0 // non-zero elements in `table`
    private var hasZero = false
    private var frozen: Array[Long] = _
    var regs: Array[Byte] = _

    private def exactSize: Int = n + (if (hasZero) 1 else 0)

    private def regUpdate(h: Long): Unit = {
      val idx = (h >>> (64 - lgK)).toInt
      val w = h << lgK
      // rank of the first 1-bit in the non-address remainder, 1-based;
      // an all-zero remainder saturates at (64 - lgK + 1)
      val rank = if (w == 0L) 65 - lgK
        else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rank > regs(idx)) regs(idx) = rank.toByte
    }

    /** Insert into the live table (no degrade check, h != 0). */
    private def insertNonZero(h: Long): Unit = {
      // xxhash64 values are already mixed; fold the high bits so the
      // probe index uses them all
      var i = (h ^ (h >>> 32)).toInt & mask
      var v = table(i)
      while (v != 0L) {
        if (v == h) return
        i = (i + 1) & mask
        v = table(i)
      }
      table(i) = h
      n += 1
      if (n + (n >> 1) > mask) grow() // load > ~2/3
    }

    private def grow(): Unit = {
      val old = table
      table = new Array[Long]((old.length << 1))
      mask = table.length - 1
      n = 0
      var i = 0
      while (i < old.length) {
        val v = old(i)
        if (v != 0L) insertNonZero(v)
        i += 1
      }
    }

    /** Build the live table from the frozen longs (first mutation). */
    private def thaw(): Unit = {
      val f = frozen
      frozen = null
      ensureTable(if (f == null) 0 else f.length)
      if (f != null) {
        var i = 0
        while (i < f.length) {
          val h = f(i)
          if (h == 0L) hasZero = true else insertNonZero(h)
          i += 1
        }
      }
    }

    private def ensureTable(minElems: Int): Unit = {
      if (table == null) {
        var cap = 64
        while (cap < minElems * 2) cap <<= 1
        table = new Array[Long](cap)
        mask = cap - 1
      }
    }

    private def degrade(): Unit = {
      regs = new Array[Byte](1 << lgK)
      if (frozen != null) {
        val f = frozen; frozen = null
        var i = 0
        while (i < f.length) { regUpdate(f(i)); i += 1 }
      } else if (table != null) {
        if (hasZero) regUpdate(0L)
        var i = 0
        while (i < table.length) {
          val v = table(i)
          if (v != 0L) regUpdate(v)
          i += 1
        }
        table = null
      }
      table = null; n = 0; hasZero = false
    }

    def add(h: Long): Unit = {
      if (regs == null) {
        if (frozen != null) thaw() else ensureTable(0)
        if (h == 0L) hasZero = true else insertNonZero(h)
        if (exactSize > exactCap) degrade()
      } else regUpdate(h)
    }

    def mergeIn(o: Buf): Unit = {
      if (o.regs == null) {
        if (o.frozen != null) {
          val f = o.frozen
          var i = 0
          while (i < f.length) { add(f(i)); i += 1 }
        } else if (o.table != null) {
          if (o.hasZero) add(0L)
          var i = 0
          while (i < o.table.length) {
            val v = o.table(i)
            if (v != 0L) add(v)
            i += 1
          }
        }
      } else {
        if (regs == null) degrade()
        var i = 0
        while (i < regs.length) {
          if (o.regs(i) > regs(i)) regs(i) = o.regs(i)
          i += 1
        }
      }
    }

    def estimate: Long = {
      if (regs == null) {
        return if (frozen != null) frozen.length.toLong else exactSize.toLong
      }
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
      if (regs == null) {
        if (frozen != null) {
          val bb = ByteBuffer.allocate(1 + 4 + 8 * frozen.length)
          bb.put(0.toByte).putInt(frozen.length)
          var i = 0
          while (i < frozen.length) { bb.putLong(frozen(i)); i += 1 }
          bb.array()
        } else {
          val sz = exactSize
          val bb = ByteBuffer.allocate(1 + 4 + 8 * sz)
          bb.put(0.toByte).putInt(sz)
          if (hasZero) bb.putLong(0L)
          if (table != null) {
            var i = 0
            while (i < table.length) {
              val v = table(i)
              if (v != 0L) bb.putLong(v)
              i += 1
            }
          }
          bb.array()
        }
      } else {
        val bb = ByteBuffer.allocate(1 + regs.length)
        bb.put(1.toByte).put(regs)
        bb.array()
      }
    }

    private[DistinctSketchAgg] def setFrozen(f: Array[Long]): Unit = { frozen = f }
  }

  object Buf {
    def deserialize(bytes: Array[Byte], exactCap: Int, lgK: Int): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Buf(exactCap, lgK)
      if (bb.get() == 0.toByte) {
        // FROZEN form: bulk-copy the (already-distinct) hashes; the hash
        // table is only built if this buf is later mutated
        val n = bb.getInt
        val f = new Array[Long](n)
        bb.asLongBuffer().get(f)
        buf.setFrozen(f)
      } else {
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
