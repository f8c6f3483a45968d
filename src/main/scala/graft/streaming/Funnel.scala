package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch funnel (`events_funnel`): a per-user
  * three-stage state machine on `transformWithState`. The batch
  * formulation takes the chained window minima (first view → first
  * qualifying click within a day → first qualifying purchase within a
  * day); here the same minima fall out of a single forward pass because
  * events are processed in event-time order — once a stage slot is
  * filled it is final, so per-user state is three fixed longs no matter
  * how long the stream runs (contrast sessionization, whose open-session
  * state must eventually be timed out).
  *
  * Ordering contract: rows are sorted within each micro-batch; across
  * batches the operator assumes event-time-ordered arrival (the file
  * source replays in order; on a disordered transport, feed it from a
  * watermark-sorted upstream). A late-arriving EARLIER view could
  * otherwise retroactively change stage-1 — the parity spec feeds
  * in-order data, matching the batch definition exactly.
  */
object Funnel {

  case class FEv(event_id: Long, user_id: Long, ts_us: Long, event_type: String)
  /** Emitted whenever a user's funnel stage ADVANCES (1 = view,
    * 2 = view→click, 3 = view→click→purchase). Downstream consumers take
    * the per-user max. */
  case class StageAdvance(user_id: Long, stage: Int)
  /** −1 = slot unfilled; otherwise the µs timestamp that filled it. */
  case class FunnelState(v: Long, c: Long, p: Long)

  class FunnelProcessor(stepMicros: Long)
      extends StatefulProcessor[Long, FEv, StageAdvance] {
    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState](
        "funnel", Encoders.product[FunnelState], TTLConfig.NONE)

    private def stageOf(s: FunnelState): Int =
      if (s.p >= 0) 3 else if (s.c >= 0) 2 else if (s.v >= 0) 1 else 0

    override def handleInputRows(
        userId: Long, rows: Iterator[FEv],
        timerValues: TimerValues): Iterator[StageAdvance] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var s = if (st.exists()) st.get() else FunnelState(-1L, -1L, -1L)
      val out = Seq.newBuilder[StageAdvance]
      sorted.foreach { e =>
        val before = stageOf(s)
        e.event_type match {
          case "view" if s.v < 0 =>
            s = s.copy(v = e.ts_us)
          case "click" if s.c < 0 && s.v >= 0 &&
              e.ts_us >= s.v && e.ts_us <= s.v + stepMicros =>
            s = s.copy(c = e.ts_us)
          case "purchase" if s.p < 0 && s.c >= 0 &&
              e.ts_us >= s.c && e.ts_us <= s.c + stepMicros =>
            s = s.copy(p = e.ts_us)
          case _ =>
        }
        if (stageOf(s) > before) out += StageAdvance(userId, stageOf(s))
      }
      st.update(s)
      out.result().iterator
    }
  }

  /** Stage-advance stream for `events` (needs the RocksDB state store
    * provider, Spark's own transformWithState constraint). */
  def stagesStream(
      spark: SparkSession, events: DataFrame, stepDays: Int = 1): Dataset[StageAdvance] = {
    import spark.implicits._
    val stepMicros = stepDays * 86400L * 1000000L
    events
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[FEv]
      .groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor(stepMicros), TimeMode.None(), OutputMode.Append())
  }
}
