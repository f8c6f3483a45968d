package graft.streaming

import graft.Det
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap-based sessionization, twice: a declarative batch formulation
  * (lag → new-session flag → running sum → group), and a stateful
  * streaming formulation over `flatMapGroupsWithState` (the reference has
  * no analogue — SURVEY.md §2.3 declares custom streaming state a
  * Spark-native extension). SessionizeSpec asserts the two agree.
  */
object Sessionize {

  /** Batch: sessions split where the gap to the previous event exceeds
    * `gapMinutes`; session ids are 1-based per user in time order. */
  def sessionsBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapMicros, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        Det.dsum(col("value")).as("sum_value"))
  }

  case class Ev(event_id: Long, user_id: Long, ts_us: Long, value: Double)
  /** Like [[Ev]] but keeping the watermarked timestamp column — the
    * event-time-timeout checker requires the EventTimeWatermark attribute
    * to reach the stateful operator. */
  case class EvT(
      event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, ts_us: Long, value: Double)
  case class Session(
      user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long)
  case class UserState(nextSessionId: Long, open: Option[Session])

  /** Streaming: per-user state holds the open session; closed sessions are
    * emitted as soon as a later event proves the gap. The open session per
    * user stays in state (no watermark on the input → nothing proves it
    * finished; [[sessionsStreamingFinalized]] is the production variant
    * that closes it by event-time timeout). */
  def sessionsStreaming(
      spark: SparkSession, events: DataFrame, gapMinutes: Int): Dataset[Session] = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Ev], state: GroupState[UserState]) => {
          val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var st = state.getOption.getOrElse(UserState(1L, None))
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            st.open match {
              case Some(s) if e.ts_us - s.end_us <= gapMicros =>
                st = st.copy(open = Some(s.copy(
                  n_events = s.n_events + 1, end_us = e.ts_us)))
              case Some(s) =>
                closed += s
                st = UserState(st.nextSessionId + 1,
                  Some(Session(userId, st.nextSessionId + 1, 1, e.ts_us, e.ts_us)))
              case None =>
                st = UserState(st.nextSessionId,
                  Some(Session(userId, st.nextSessionId, 1, e.ts_us, e.ts_us)))
            }
          }
          state.update(st)
          closed.result().iterator
        })
  }

  /** The SAME sessionization on `transformWithState` — Spark 4's
    * arbitrary-state API that supersedes `flatMapGroupsWithState`: the
    * per-key state is a typed named [[ValueState]] on an explicit handle
    * rather than one opaque GroupState blob, so real operators can hold
    * several independent states per key, set TTLs per state, and drive
    * timers explicitly. Semantics here are identical to
    * [[sessionsStreaming]] (closed sessions emitted once a later event
    * proves the gap; the open session stays in state) and SessionizeSpec
    * asserts output parity between the two APIs and the batch
    * formulation. Requires the RocksDB state store provider — Spark's
    * own constraint for transformWithState; see the spec for the
    * per-query conf. */
  class SessionProcessor(gapMicros: Long)
      extends StatefulProcessor[Long, Ev, Session] {
    @transient private var st: ValueState[UserState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserState](
        "session", Encoders.product[UserState], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var state = if (st.exists()) st.get() else UserState(1L, None)
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        state.open match {
          case Some(s) if e.ts_us - s.end_us <= gapMicros =>
            state = state.copy(open = Some(s.copy(
              n_events = s.n_events + 1, end_us = e.ts_us)))
          case Some(s) =>
            closed += s
            state = UserState(state.nextSessionId + 1,
              Some(Session(userId, state.nextSessionId + 1, 1, e.ts_us, e.ts_us)))
          case None =>
            state = UserState(state.nextSessionId,
              Some(Session(userId, state.nextSessionId, 1, e.ts_us, e.ts_us)))
        }
      }
      st.update(state)
      closed.result().iterator
    }
  }

  /** [[sessionsStreaming]] re-expressed on the transformWithState API. */
  def sessionsStreamingTws(
      spark: SparkSession, events: DataFrame, gapMinutes: Int): Dataset[Session] = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapMicros), TimeMode.None(), OutputMode.Append())
  }

  /** Production streaming sessionization: like [[sessionsStreaming]], but
    * the input carries a watermark and open sessions are finalized by an
    * event-time timeout — once the watermark passes `session_end + gap`,
    * no admissible event can extend the session (anything later starts a
    * new one), so it is emitted and its state dropped. This is the piece
    * the reference's ordered-stream model has no analogue for
    * (SURVEY.md §2.3: no watermarks, no late-data handling). */
  def sessionsStreamingFinalized(
      spark: SparkSession,
      events: DataFrame,
      gapMinutes: Int,
      watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[EvT], state: GroupState[UserState]) => {
          val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var st = state.getOption.getOrElse(UserState(1L, None))
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            st.open match {
              case Some(s) if e.ts_us - s.end_us <= gapMicros =>
                st = st.copy(open = Some(s.copy(
                  n_events = s.n_events + 1, end_us = e.ts_us)))
              case Some(s) =>
                closed += s
                st = UserState(st.nextSessionId + 1,
                  Some(Session(userId, st.nextSessionId + 1, 1, e.ts_us, e.ts_us)))
              case None =>
                st = UserState(st.nextSessionId,
                  Some(Session(userId, st.nextSessionId, 1, e.ts_us, e.ts_us)))
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          st.open match {
            case Some(s) if s.end_us + gapMicros < wmUs =>
              // watermark proves the gap: finalize the open session;
              // numbering state stays so a returning user continues it
              closed += s
              st = UserState(st.nextSessionId + 1, None)
              state.update(st)
            case Some(s) =>
              state.update(st)
              val wake = (s.end_us + gapMicros) / 1000L + 1L
              state.setTimeoutTimestamp(
                math.max(wake, state.getCurrentWatermarkMs() + 1L))
            case None =>
              // nothing open: no timeout needed, new data wakes the key
              state.update(st)
          }
          closed.result().iterator
        })
  }
}
