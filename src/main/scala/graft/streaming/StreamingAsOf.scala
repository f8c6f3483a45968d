package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of join (SURVEY.md §7 hard part #3): for each
  * left event, the latest right event of the same by-key at or before it,
  * within a tolerance — the reference's asofjoin node
  * (cpp/src/arrow/acero/asof_join_node.cc) lifted onto unbounded streams.
  *
  * The reference relies on its inputs being globally ordered; Spark
  * streams are not, so correctness comes from the watermark instead: a
  * left row is answered only once the watermark has passed its event
  * time — at that point every right row at-or-before it is guaranteed to
  * have arrived (rights later than that can't match it backward). Per-key
  * state holds (a) left rows newer than the watermark and (b) right rows
  * within `tolerance` of it; both are evicted monotonically as the
  * watermark advances, so state is bounded by key activity × tolerance —
  * the same bound the reference's `min_ts` eviction gives its queues.
  * An event-time timeout flushes keys that stop receiving data.
  */
object StreamingAsOf {

  /** Unioned input row (side 0 = left, 1 = right). `ts` carries the
    * watermark through to the stateful operator (projecting it away would
    * strip the EventTimeWatermark the timeout needs); `ts_us` is the same
    * instant as an exact microsecond long for the join arithmetic. */
  case class Tagged(
      side: Int, id: Long, by: Long,
      ts: java.sql.Timestamp, ts_us: Long, value: Double)

  /** One output row per left input row (left-outer semantics, matching
    * [[graft.operators.AsOfJoin.backward]]). */
  case class AsOfMatch(
      left_id: Long, by: Long, left_ts_us: Long, left_value: Double,
      right_id: Option[Long], right_ts_us: Option[Long], right_value: Option[Double])

  case class AsOfState(lefts: List[Tagged], rights: List[Tagged])

  /** Both inputs must expose columns (id: long, by: long, ts: timestamp,
    * value: double); `watermarkDelay` bounds how late data may arrive. */
  def backward(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      toleranceMicros: Long,
      watermarkDelay: String = "10 minutes"): Dataset[AsOfMatch] = {
    import spark.implicits._
    val tag = (df: DataFrame, side: Int) =>
      df.select(
        lit(side).as("side"), col("id"), col("by"),
        col("ts"), col("value"))
    tag(left, 0).unionByName(tag(right, 1))
      .withWatermark("ts", watermarkDelay)
      .select(
        col("side"), col("id"), col("by"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Tagged]
      .groupByKey(_.by)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (by: Long, rows: Iterator[Tagged], state: GroupState[AsOfState]) =>
          advance(by, rows, state, toleranceMicros))
  }

  private def advance(
      by: Long,
      rows: Iterator[Tagged],
      state: GroupState[AsOfState],
      tolUs: Long): Iterator[AsOfMatch] = {
    val st = state.getOption.getOrElse(AsOfState(Nil, Nil))
    val incoming = rows.toList
    var lefts = st.lefts ++ incoming.filter(_.side == 0)
    var rights = st.rights ++ incoming.filter(_.side == 1)

    val wmUs = state.getCurrentWatermarkMs() * 1000L
    // flush lefts proven complete by the watermark, oldest first. Strict
    // `<`: Spark's late-data filter only drops rows strictly older than
    // the watermark, so a right row with event time exactly equal to the
    // watermark may still arrive — a left at that same instant is not yet
    // complete (mirrors Sessionize.sessionsStreamingFinalized).
    val (ready, pending) = lefts.partition(_.ts_us < wmUs)
    val out = ready.sortBy(l => (l.ts_us, l.id)).map { l =>
      val m = rights.iterator
        .filter(r => r.ts_us <= l.ts_us && l.ts_us - r.ts_us <= tolUs)
        .foldLeft(Option.empty[Tagged]) { (best, r) =>
          best match {
            case Some(b)
              if b.ts_us > r.ts_us || (b.ts_us == r.ts_us && b.id >= r.id) => best
            case _ => Some(r)
          }
        }
      AsOfMatch(l.id, by, l.ts_us, l.value, m.map(_.id), m.map(_.ts_us), m.map(_.value))
    }
    lefts = pending
    // pending lefts all have ts_us >= wmUs, so a right can still match
    // only if its ts_us >= wmUs - tolerance
    rights = rights.filter(_.ts_us >= wmUs - tolUs)

    if (lefts.isEmpty && rights.isEmpty) {
      state.remove()
    } else {
      state.update(AsOfState(lefts, rights))
      // wake this key when the watermark passes its oldest pending left
      // (or the eviction horizon of its buffered rights)
      val nextUs =
        if (lefts.nonEmpty) lefts.map(_.ts_us).min
        else rights.map(_.ts_us).min + tolUs
      val nextMs = nextUs / 1000L + 1L
      if (nextMs > state.getCurrentWatermarkMs()) state.setTimeoutTimestamp(nextMs)
      else state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
    }
    out.iterator
  }
}
