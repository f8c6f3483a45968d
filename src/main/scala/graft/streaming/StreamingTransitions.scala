package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch transition matrix (`events_transitions`):
  * each user's event stream emits its (prev type → next type) steps as
  * they happen, with per-user state of exactly ONE remembered event —
  * the (ts, id, type) of the latest processed row — no matter how long
  * the stream runs. Counting/normalizing the emitted steps downstream
  * reproduces the batch matrix (StreamingSpec asserts count parity).
  *
  * Ordering contract mirrors [[Funnel]]: rows sort within a micro-batch
  * by (ts, event_id); across batches the operator assumes
  * event-time-ordered arrival (the file source replays in order). */
object StreamingTransitions {

  case class TEv(event_id: Long, user_id: Long, ts_us: Long, event_type: String)
  case class Step(user_id: Long, prev_type: String, next_type: String)
  case class LastEv(ts_us: Long, event_id: Long, event_type: String)

  class TransitionProcessor
      extends StatefulProcessor[Long, TEv, Step] {
    @transient private var st: ValueState[LastEv] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[LastEv](
        "last_event", Encoders.product[LastEv], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long, rows: Iterator[TEv],
        timerValues: TimerValues): Iterator[Step] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var last = if (st.exists()) Option(st.get()) else None
      val out = Seq.newBuilder[Step]
      sorted.foreach { e =>
        last.foreach(l => out += Step(userId, l.event_type, e.event_type))
        last = Some(LastEv(e.ts_us, e.event_id, e.event_type))
      }
      last.foreach(st.update)
      out.result().iterator
    }
  }

  /** Per-user transition steps for `events` (RocksDB state store
    * required, Spark's own transformWithState constraint). */
  def stepsStream(spark: SparkSession, events: DataFrame): Dataset[Step] = {
    import spark.implicits._
    events
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[TEv]
      .groupByKey(_.user_id)
      .transformWithState(
        new TransitionProcessor, TimeMode.None(), OutputMode.Append())
  }
}
