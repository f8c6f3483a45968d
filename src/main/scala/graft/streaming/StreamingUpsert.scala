package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming CDC upsert — the incremental twin of
  * [[graft.pipeline.Maintenance.upsert]], for the maintenance pattern a
  * living 100 TB corpus actually runs: change rows (new versions of
  * existing ids, brand-new ids) arrive continuously and the table's
  * current row per id must advance latest-version-wins, without ever
  * re-windowing the full corpus.
  *
  * Shape: each change row is keyed on its id by a `transformWithState`
  * processor whose per-key state is the CURRENT winner — (version, src,
  * payload), one row, nothing else. An arrival strictly better under the
  * batch operator's exact total order (version DESC, then src DESC —
  * update beats base on version ties) replaces the state and emits the
  * new current row; a stale arrival emits nothing. The emitted stream is
  * the table's change log: the LAST emission per id IS the batch
  * `upsert` result on everything seen so far, which is the parity
  * StreamingSpec asserts against `Maintenance.upsert` on the same rows.
  *
  * Scale: state is one narrow row per LIVE id (ids with no in-flight
  * updates cost nothing to process — only arrivals touch state), and
  * `stateTtl` bounds the horizon in processing time for change streams
  * where ids go cold, exactly as [[StreamingDedup]]'s bucket TTL.
  *
  * Requires the RocksDB state store provider, Spark's own constraint for
  * `transformWithState` (see StreamingSpec for the per-query conf).
  */
object StreamingUpsert {

  /** One CDC change: src 0 = base load, 1 = update (the batch operator's
    * tie-break tag). */
  final case class ChangeRow(id: Long, version: Long, src: Int, payload: String)

  /** The current winner for an id, re-emitted whenever it advances. */
  final case class CurrentRow(id: Long, version: Long, payload: String)

  /** Per-id state row. Public: Spark's codegen'd encoder accesses the
    * accessors from generated classes, and a private case class forces a
    * per-batch Janino compile failure + interpreted fallback. */
  final case class CurState(version: Long, src: Int, payload: String)

  class UpsertProcessor(stateTtl: Option[java.time.Duration])
      extends StatefulProcessor[Long, ChangeRow, CurrentRow] {
    @transient private var cur: ValueState[CurState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[CurState]("cur", Encoders.product[CurState],
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    // the batch window's total order: version DESC, src DESC; a full tie
    // keeps the incumbent (first-arrival-wins, deterministic per replay
    // order exactly like the batch row_number over equal sort keys)
    private def beats(v: Long, s: Int, o: CurState): Boolean =
      v > o.version || (v == o.version && s > o.src)

    override def handleInputRows(
        key: Long, rows: Iterator[ChangeRow],
        timerValues: TimerValues): Iterator[CurrentRow] = {
      var state = Option(cur.get())
      var advanced = false
      rows.foreach { r =>
        if (state.forall(beats(r.version, r.src, _))) {
          state = Some(CurState(r.version, r.src, r.payload))
          advanced = true
        }
      }
      state match {
        case Some(s) if advanced =>
          cur.update(s)
          Iterator.single(CurrentRow(key, s.version, s.payload))
        case _ => Iterator.empty
      }
    }
  }

  /** One SCD-2 history emission: `valid_to` empty on an OPEN (the
    * version became current), set on a CLOSE (a newer version ended its
    * validity). `src` disambiguates same-version re-opens (the
    * update-beats-base tie): the max-src open per (id, version) is the
    * one that stood. */
  final case class Scd2Ev(id: Long, version: Long, src: Int,
      payload: String, valid_to: Option[Long])

  /** Streaming twin of [[graft.pipeline.Maintenance.scd2]]: per-id state
    * is ONE current row (exactly [[UpsertProcessor]]'s bound — never the
    * history, which lives in the emitted log); each strictly newer
    * version CLOSES the incumbent (emitting its finished interval) and
    * OPENS itself; an equal-version arrival that wins the src tie
    * re-opens the version with the corrected payload. Reconstructing
    * per (id, version) — the close emission if one exists, else the
    * max-src open — reproduces the batch scd2 exactly on
    * version-ordered arrival (StreamingSpec asserts it). Arrivals OLDER
    * than the current version are outside the ordered-arrival contract
    * and are dropped: splicing mid-history would require carrying the
    * history as state, defeating the bound. */
  class Scd2Processor(stateTtl: Option[java.time.Duration])
      extends StatefulProcessor[Long, ChangeRow, Scd2Ev] {
    @transient private var cur: ValueState[CurState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[CurState]("cur", Encoders.product[CurState],
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(
        key: Long, rows: Iterator[ChangeRow],
        timerValues: TimerValues): Iterator[Scd2Ev] = {
      val sorted = rows.toSeq.sortBy(r => (r.version, r.src))
      var state = Option(cur.get())
      val out = Seq.newBuilder[Scd2Ev]
      sorted.foreach { r =>
        state match {
          case None =>
            state = Some(CurState(r.version, r.src, r.payload))
            out += Scd2Ev(key, r.version, r.src, r.payload, None)
          case Some(s) if r.version > s.version =>
            out += Scd2Ev(key, s.version, s.src, s.payload, Some(r.version))
            state = Some(CurState(r.version, r.src, r.payload))
            out += Scd2Ev(key, r.version, r.src, r.payload, None)
          case Some(s) if r.version == s.version && r.src > s.src =>
            state = Some(CurState(r.version, r.src, r.payload))
            out += Scd2Ev(key, r.version, r.src, r.payload, None)
          case _ => // stale or tie-losing arrival: no emission
        }
      }
      state.foreach(cur.update)
      out.result().iterator
    }
  }

  /** SCD-2 history log over a CDC stream — same column contract as
    * [[upsertStream]]. */
  def scd2Stream(
      spark: SparkSession, changes: DataFrame,
      idCol: String, versionCol: String, srcCol: String, payloadCol: String,
      stateTtl: Option[java.time.Duration] = None): Dataset[Scd2Ev] = {
    import spark.implicits._
    changes
      .select(col(idCol).cast("long").as("id"),
        col(versionCol).cast("long").as("version"),
        col(srcCol).cast("int").as("src"),
        col(payloadCol).as("payload"))
      .as[ChangeRow]
      .groupByKey(_.id)
      .transformWithState(
        new Scd2Processor(stateTtl),
        if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Current-row change log over a CDC stream. `changes` must carry
    * `idCol` (long), `versionCol` (long), `srcCol` (int: 0 base / 1
    * update) and `payloadCol` (string); emits the new current row each
    * time an id advances, in append mode. Column contract matches
    * [[graft.pipeline.Maintenance.upsert]] so the two are
    * interchangeable twins. */
  def upsertStream(
      spark: SparkSession, changes: DataFrame,
      idCol: String, versionCol: String, srcCol: String, payloadCol: String,
      stateTtl: Option[java.time.Duration] = None): Dataset[CurrentRow] = {
    import spark.implicits._
    changes
      .select(col(idCol).cast("long").as("id"),
        col(versionCol).cast("long").as("version"),
        col(srcCol).cast("int").as("src"),
        col(payloadCol).as("payload"))
      .as[ChangeRow]
      .groupByKey(_.id)
      .transformWithState(
        new UpsertProcessor(stateTtl),
        if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
