package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.operators.TimeSeries.pageHinkley]] — the
  * detector Page–Hinkley exists FOR: the batch gate (q100) answers
  * "has the mean drifted" retrospectively over a table; this processor
  * answers it live, per arriving event, with O(1) state per key — four
  * longs and the alarm marker — where the batch form's window would
  * need the whole history. The per-row arithmetic is the batch
  * operator's verbatim (exact 1e6-scaled cumulative sum, one IEEE
  * deviation term rounded to a 1e-9 long, integer running sum/min and
  * λ comparison), so the final per-key readout matches the batch gate
  * bit-for-bit (StreamingSpec asserts it) — including the FIRST-alarm
  * index, which is the point of a monitor: the alarm fires at the same
  * event in both worlds.
  *
  * Ordering contract mirrors [[StreamingEwma]]: rows sort within a
  * micro-batch by (ts, id); across batches the operator assumes
  * event-time-ordered arrival. NULL values must be filtered upstream
  * (the batch operator drops them — same contract).
  */
object StreamingPageHinkley {

  case class PhState(n: Long, cs6: Long, m9: Long, min9: Long,
      alarmN: Long, alarmId: Long, alarmed: Boolean)

  case class SPh(key: String, id: Long, n: Long, ph: Double,
      first_alarm_n: Option[Long], first_alarm_id: Option[Long],
      alarmed: Boolean)

  class PageHinkleyProcessor(delta: Double, lambda: Double)
      extends StatefulProcessor[String, StreamingEwma.SEv, SPh] {
    private val lambda9 = math.round(lambda * 1e9)
    @transient private var st: ValueState[PhState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PhState](
        "ph", Encoders.product[PhState], TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[StreamingEwma.SEv],
        timerValues: TimerValues): Iterator[SPh] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.id))
      var s = if (st.exists()) st.get()
        else PhState(0L, 0L, 0L, 0L, 0L, 0L, alarmed = false)
      val out = sorted.map { e =>
        // the batch operator's v6: cast double -> decimal(25,6) (HALF_UP)
        // then an exact *1e6 (graft.Det.dec * 1000000L)
        val v6 = (BigDecimal(e.value)
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
          * BigDecimal(1000000L)).toLongExact
        val n = s.n + 1
        val cs6 = s.cs6 + v6
        // ONE IEEE expression over exact longs, rounded to a 1e-9 long —
        // the batch term9 verbatim
        val term = (v6.toDouble / 1e6 -
          cs6.toDouble / (n.toDouble * 1e6) - delta) * 1e9
        val term9 = BigDecimal(term)
          .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
        val m9 = s.m9 + term9
        val min9 = if (s.n == 0L) m9 else math.min(s.min9, m9)
        val ph9 = m9 - min9
        val fire = !s.alarmed && ph9 > lambda9
        s = PhState(n, cs6, m9, min9,
          if (fire) n else s.alarmN,
          if (fire) e.id else s.alarmId,
          s.alarmed || fire)
        SPh(key, e.id, n,
          BigDecimal(ph9.toDouble / 1e9)
            .setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble,
          if (s.alarmed) Some(s.alarmN) else None,
          if (s.alarmed) Some(s.alarmId) else None,
          s.alarmed)
      }
      st.update(s)
      out.iterator
    }
  }

  /** Live Page–Hinkley readout over a keyed value stream (RocksDB state
    * store required — Spark's own transformWithState constraint). `df`
    * must already exclude NULL values. Emits one row per event carrying
    * the statistic AFTER that event; the last row per key equals the
    * batch gate's row for the same prefix. */
  def monitorStream(
      spark: SparkSession, df: DataFrame,
      keyCol: String, tsCol: String, idCol: String, valCol: String,
      delta: Double, lambda: Double): Dataset[SPh] = {
    import spark.implicits._
    require(lambda > 0.0, s"lambda must be > 0, got $lambda")
    require(delta >= 0.0, s"delta must be >= 0, got $delta")
    df.select(
        col(keyCol).cast("string").as("key"),
        unix_micros(col(tsCol)).as("ts_us"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("value"))
      .as[StreamingEwma.SEv]
      .groupByKey(_.key)
      .transformWithState(
        new PageHinkleyProcessor(delta, lambda),
        TimeMode.None(), OutputMode.Append())
  }
}
