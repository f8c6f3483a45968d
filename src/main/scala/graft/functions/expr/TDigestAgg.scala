package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning's k1 scale function), the sketch the
  * reference ships for `tdigest` / `approximate_median`
  * (reference: cpp/src/arrow/compute/kernels/aggregate_tdigest.cc, options
  * at cpp/src/arrow/compute/api_aggregate.h TDigestOptions: delta=100,
  * buffer_size=500).
  *
  * Distribution contract: per-partition digests are built map-side and
  * merged exactly like the reference's Consume→Merge→Finalize lifecycle —
  * the shuffle carries one ≤O(δ)-centroid digest per group instead of the
  * value stream, so a 100 TB column aggregates with the same network cost
  * as a count. Estimates are order-dependent (both engines document this);
  * accuracy is asserted against exact quantiles in ApproxAggSpec.
  */
final class TDigestBuffer(val compression: Int) extends Serializable {
  // merged centroids, sorted by mean
  var mean: Array[Double] = new Array[Double](0)
  var weight: Array[Double] = new Array[Double](0)
  // unmerged incoming points
  val bufCap: Int = math.max(4 * compression, 128)
  var buf: Array[Double] = new Array[Double](bufCap)
  var bufN: Int = 0
  var total: Double = 0.0
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  def add(x: Double): Unit = {
    if (bufN == bufCap) compress()
    buf(bufN) = x
    bufN += 1
    total += 1.0
    if (x < min) min = x
    if (x > max) max = x
  }

  /** Upper q-limit of the centroid starting at cumulative quantile q:
    * one unit step in k1 space, k(q) = δ/(2π)·asin(2q−1). */
  private def qLimit(q: Double): Double = {
    val k = math.asin(2.0 * q - 1.0) + 2.0 * math.Pi / compression
    if (k >= math.Pi / 2) 1.0 else (math.sin(k) + 1.0) / 2.0
  }

  /** Merge buffered points (and any pre-sorted centroid list) into a fresh
    * centroid array with the greedy single pass of the merging digest. */
  def compress(extraMean: Array[Double] = null, extraWeight: Array[Double] = null): Unit = {
    val nExtra = if (extraMean == null) 0 else extraMean.length
    val n = mean.length + bufN + nExtra
    if (n == 0) { bufN = 0; return }
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(mean, 0, ms, 0, mean.length)
    System.arraycopy(weight, 0, ws, 0, mean.length)
    var i = 0
    while (i < bufN) {
      ms(mean.length + i) = buf(i); ws(mean.length + i) = 1.0; i += 1
    }
    i = 0
    while (i < nExtra) {
      ms(mean.length + bufN + i) = extraMean(i)
      ws(mean.length + bufN + i) = extraWeight(i)
      i += 1
    }
    // sort the (mean, weight) pairs by mean
    val idx = Array.range(0, n).sortBy(ms(_))
    val sm = idx.map(ms(_)); val sw = idx.map(ws(_))

    val tot = sw.sum
    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var out = 0
    var curM = sm(0); var curW = sw(0)
    var qSoFar = 0.0
    var limit = tot * qLimit(0.0)
    i = 1
    while (i < n) {
      if (qSoFar + curW + sw(i) <= limit) {
        curM += (sm(i) - curM) * sw(i) / (curW + sw(i))
        curW += sw(i)
      } else {
        outM(out) = curM; outW(out) = curW; out += 1
        qSoFar += curW
        limit = tot * qLimit(qSoFar / tot)
        curM = sm(i); curW = sw(i)
      }
      i += 1
    }
    outM(out) = curM; outW(out) = curW; out += 1
    mean = java.util.Arrays.copyOf(outM, out)
    weight = java.util.Arrays.copyOf(outW, out)
    bufN = 0
    total = tot
  }

  def mergeIn(other: TDigestBuffer): Unit = {
    other.compress()
    compress(other.mean, other.weight)
    if (other.min < min) min = other.min
    if (other.max > max) max = other.max
  }

  /** Quantile by linear interpolation between centroid midpoints, clamped
    * to the observed min/max at the tails. */
  def quantile(q: Double): Double = {
    compress()
    val n = mean.length
    if (n == 0) return Double.NaN
    if (n == 1) return mean(0)
    val rank = q * total
    var cum = 0.0
    var i = 0
    var prevMid = 0.0
    var prevMean = min
    while (i < n) {
      val mid = cum + weight(i) / 2.0
      if (rank < mid) {
        val frac = if (mid - prevMid > 0) (rank - prevMid) / (mid - prevMid) else 0.0
        return prevMean + frac * (mean(i) - prevMean)
      }
      prevMid = mid; prevMean = mean(i)
      cum += weight(i)
      i += 1
    }
    max
  }
}

/** `graft_tdigest(x, percentages...)` → array<double> of estimated
  * quantiles at the given percentages (compression δ fixed per instance).
  */
case class TDigestAgg(
    child: Expression,
    percentages: Seq[Double],
    compression: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuffer] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_tdigest"

  // reject non-numeric inputs at analysis time — without this a string
  // column via the SQL surface fails per-row with NumberFormatException
  // deep inside the aggregate
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a numeric column, got ${other.sql}")
    }

  override def createAggregationBuffer(): TDigestBuffer =
    new TDigestBuffer(compression)

  override def update(buffer: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case s: Short => s.toDouble
        case b: Byte => b.toDouble
        // unreachable: checkInputDataTypes restricts child to NumericType
        case other =>
          throw new IllegalStateException(s"non-numeric tdigest input: $other")
      }
      buffer.add(x)
    }
    buffer
  }

  override def merge(b1: TDigestBuffer, b2: TDigestBuffer): TDigestBuffer = {
    b1.mergeIn(b2); b1
  }

  override def eval(buffer: TDigestBuffer): Any =
    new GenericArrayData(percentages.map(buffer.quantile).toArray)

  override def serialize(buffer: TDigestBuffer): Array[Byte] = {
    buffer.compress()
    val n = buffer.mean.length
    val bb = ByteBuffer.allocate(4 + 8 * 2 + 8 * 2 * n)
    bb.putInt(n)
    bb.putDouble(buffer.min)
    bb.putDouble(buffer.max)
    var i = 0
    while (i < n) { bb.putDouble(buffer.mean(i)); bb.putDouble(buffer.weight(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TDigestBuffer(compression)
    b.min = bb.getDouble
    b.max = bb.getDouble
    b.mean = new Array[Double](n)
    b.weight = new Array[Double](n)
    var i = 0
    var tot = 0.0
    while (i < n) {
      b.mean(i) = bb.getDouble; b.weight(i) = bb.getDouble; tot += b.weight(i); i += 1
    }
    b.total = tot
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestAgg =
    copy(child = newChildren.head)
}

object TDigestAgg {
  /** Column API: estimated quantiles of `x` at `ps`. */
  def quantiles(x: Column, ps: Seq[Double], compression: Int = 100): Column =
    Bridge.column(
      TDigestAgg(Bridge.expression(x), ps, compression).toAggregateExpression())
}
