package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch cohort-retention table (`events_cohorts`):
  * each user emits a (cohort_week, offset_week) row the FIRST time they
  * are active in a given week offset; counting the emissions downstream
  * reproduces the batch matrix. Per-user state is FIXED-SIZE forever — a
  * cohort anchor (µs of the user's first week) plus a 64-bit bitmap of
  * already-emitted offsets — so the state store scales with users, not
  * with stream lifetime (offsets ≥ 64 weeks re-emit and are deduped by
  * the counting sink; retention analyses rarely look past week 63, and
  * the cap is the documented contract).
  *
  * Ordering contract mirrors [[Funnel]]: in-order event-time arrival
  * (a late EARLIER event could otherwise re-anchor the cohort). */
object StreamingCohorts {

  case class CEv(user_id: Long, ts_us: Long)
  case class Retention(cohort_wk_us: Long, offset_wk: Int)
  case class CohortState(anchor_us: Long, seen: Long)

  private val WeekUs = 7L * 86400L * 1000000L

  /** Monday-start week truncation in µs, mirroring date_trunc('week'):
    * 1970-01-01 was a Thursday, so the epoch grid is offset by 3 days. */
  private[streaming] def weekStartUs(us: Long): Long = {
    val shift = 3L * 86400L * 1000000L // to a Monday-aligned grid
    ((us + shift) / WeekUs) * WeekUs - shift
  }

  class CohortProcessor
      extends StatefulProcessor[Long, CEv, Retention] {
    @transient private var st: ValueState[CohortState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CohortState](
        "cohort", Encoders.product[CohortState], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long, rows: Iterator[CEv],
        timerValues: TimerValues): Iterator[Retention] = {
      val sorted = rows.toSeq.sortBy(_.ts_us)
      var s = if (st.exists()) st.get() else CohortState(-1L, 0L)
      val out = Seq.newBuilder[Retention]
      sorted.foreach { e =>
        val wk = weekStartUs(e.ts_us)
        if (s.anchor_us < 0) s = CohortState(wk, 0L)
        val off = ((wk - s.anchor_us) / WeekUs).toInt
        if (off >= 64 || (s.seen & (1L << off)) == 0L) {
          out += Retention(s.anchor_us, off)
          if (off < 64) s = s.copy(seen = s.seen | (1L << off))
        }
      }
      st.update(s)
      out.result().iterator
    }
  }

  /** Retention-emission stream for `events` (RocksDB state store
    * required). Downstream: count DISTINCT-per-user emissions grouped by
    * (cohort, offset) — within the 64-week bitmap horizon emissions are
    * already unique per user. */
  def retentionStream(spark: SparkSession, events: DataFrame): Dataset[Retention] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[CEv]
      .groupByKey(_.user_id)
      .transformWithState(
        new CohortProcessor, TimeMode.None(), OutputMode.Append())
  }
}
