package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.operators.TimeSeries.hampel]]: the rolling
  * median/MAD spike detector over a CENTERED ±k window. A centered
  * window on a stream means each row can only be scored once k
  * FOLLOWING rows have arrived, so the processor keeps the trailing
  * 2k+1 observations per key and, whenever the buffer is full, emits
  * the verdict for the buffer's CENTER element and slides — a built-in
  * k-row emission delay, which is exactly the batch edge contract
  * (rows without k neighbors on both sides are never scored; the first
  * and last k rows of each key never emit).
  *
  * Arithmetic is the batch operator verbatim: values scale to 1e9
  * longs with the same HALF_UP rounding the batch `round(x·1e9, 0)`
  * applies (and the same LOUD overflow contract — `longValueExact`
  * here, ANSI double→long there), the odd window makes median and MAD
  * single order statistics, and the decision rule |x−med|·10⁴ >
  * 44478·MAD runs in BigInt exactly like the batch side's
  * decimal(38,0) — the ×10⁴ can never silently wrap a long; the MAD
  * subtraction uses subtractExact/absExact so an out-of-envelope
  * window fails loudly like ANSI does. Parity is bit-exact
  * (StreamingSpec asserts it).
  *
  * Ordering contract mirrors [[StreamingEwma]]: rows sort within a
  * micro-batch by (ts, id); across batches the operator assumes
  * event-time-ordered arrival. NULLs must be filtered upstream. State
  * is a fixed 2k+1 longs+ids per key, forever — watermark-free by
  * construction.
  */
object StreamingHampel {

  case class HEv(key: String, ts_us: Long, id: Long, value: Double)
  case class HFlag(key: String, id: Long, med9: Long, mad9: Long,
      is_out: Int)
  case class HBuf(ids: Seq[Long], v9s: Seq[Long])

  private[streaming] def v9Of(value: Double): Long =
    BigDecimal(value * 1e9)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .underlying.longValueExact()

  class HampelProcessor(k: Int)
      extends StatefulProcessor[String, HEv, HFlag] {
    @transient private var st: ValueState[HBuf] = _
    private val width = 2 * k + 1

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[HBuf](
        "buf", Encoders.product[HBuf], TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[HEv],
        timerValues: TimerValues): Iterator[HFlag] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.id))
      var (ids, v9s) =
        if (st.exists()) (st.get().ids, st.get().v9s)
        else (Seq.empty[Long], Seq.empty[Long])
      val out = Seq.newBuilder[HFlag]
      sorted.foreach { e =>
        ids = (ids :+ e.id).takeRight(width)
        v9s = (v9s :+ v9Of(e.value)).takeRight(width)
        if (v9s.length == width) {
          // the batch operator's arithmetic verbatim: single order
          // statistics at rank k+1, denominator-cleared wide-integer
          // rule (BigInt ≡ the batch decimal(38,0)); exact subtraction
          // so overflow is loud, never a wrapped flag
          val med9 = v9s.sorted.apply(k)
          val mad9 = v9s.map(x =>
            Math.absExact(Math.subtractExact(x, med9))).sorted.apply(k)
          val center = v9s(k)
          val diff = Math.absExact(Math.subtractExact(center, med9))
          val isOut =
            if (BigInt(diff) * 10000 > BigInt(44478) * BigInt(mad9)) 1 else 0
          out += HFlag(key, ids(k), med9, mad9, isOut)
        }
      }
      st.update(HBuf(ids, v9s))
      out.result().iterator
    }
  }

  /** Wire the processor over a streaming frame with the batch
    * operator's column contract. */
  def hampelStream(
      spark: SparkSession, df: DataFrame,
      keyCol: String, tsCol: String, idCol: String, valCol: String,
      k: Int): Dataset[HFlag] = {
    import spark.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    df.filter(col(valCol).isNotNull)
      .select(
        col(keyCol).cast("string").as("key"),
        unix_micros(col(tsCol)).as("ts_us"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("value"))
      .as[HEv]
      .groupByKey(_.key)
      .transformWithState(
        new HampelProcessor(k), TimeMode.None(), OutputMode.Append())
  }
}
