package graft.streaming

import graft.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming extensions (SURVEY.md §2.3): the reference streams
  * ordered batches with segmented aggregation but has no watermarks or
  * event-time windows; here the same transformations run unchanged on
  * batch DataFrames and on streams (tested both ways in StreamingSpec).
  */
object StreamingOps {

  /** Raw schema of the events table as stored (ts = µs TIMESTAMP_NTZ in
    * the current fixture generation; streams need an explicit schema). */
  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stored `ts` → session-zone µs timestamp, dispatching on the stored
    * type exactly like Tables.events (ns long fixtures truncate; NTZ
    * fixtures cast under the pinned-UTC session zone). */
  def withEventTime(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
    case _ => raw
  }

  /** Hourly tumbling-window aggregate per event type. Works identically on
    * batch and streaming inputs; on a stream, pair with
    * [[withWatermarkedEventTime]] so state for closed windows is evicted. */
  def hourlyTypeAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming windowed approx-distinct: per (1-hour window, event_type),
    * the HLL-sketched distinct user count — q39's mergeable-sketch
    * machinery (`hll_sketch_agg`, Apache DataSketches) on the ingest
    * path. The sketch registers are the ONLY per-group state, so a
    * window with a billion distinct users carries kilobytes instead of a
    * distinct-set; the register state is order-insensitive, which is what
    * makes the streaming result EQUAL the batch result rather than merely
    * approximate-close (the parity spec asserts equality). */
  def hourlyDistinctUsers(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(14))).as("nd_users"))
      .select(
        col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("nd_users"))

  /** Streaming PAIRED-CONVERSION state — the ingest half of a live
    * McNemar A/B monitor ([[graft.operators.StatTests.mcNemar]]): one
    * streaming aggregation keyed by subject maintains the pair of
    * binary outcomes as two max-flags (max is order-insensitive and
    * merge-exact, so the state equals the batch rollup bit-for-bit at
    * any micro-batch cut). The χ² itself is a 4-counter fold over this
    * frame — the batch operator runs on the sink table (the q39/CMS
    * persisted-state convention: stream maintains the mergeable state,
    * the statistic reads it), asserted equal to the all-batch path by
    * StreamingSpec. `firstFlag`/`secondFlag` are 0/1 expressions over
    * the raw event columns. */
  def pairedConversionState(events: DataFrame, subjectCol: String,
      firstFlag: org.apache.spark.sql.Column,
      secondFlag: org.apache.spark.sql.Column): DataFrame =
    events
      .groupBy(col(subjectCol))
      .agg(max(firstFlag.cast("long")).as("f1"),
        max(secondFlag.cast("long")).as("f2"))

  /** Windowed streaming quantiles via the merging t-digest
    * ([[graft.functions.expr.TDigestAgg]]) — per (hour, event_type) the
    * ONLY state is one O(δ)-centroid digest, incrementally merged across
    * micro-batches by the state store exactly like the HLL state of
    * [[hourlyDistinctUsers]]. Unlike HLL registers a t-digest is
    * order-SENSITIVE at the centroid level, so batch ≡ stream parity is
    * rank accuracy (both land within the digest's documented error of
    * the exact quantiles), not bit equality — StreamingSpec asserts
    * exactly that. */
  def hourlyQuantiles(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(graft.functions.expr.TDigestAgg
        .quantiles(col("value"), Seq(0.5, 0.9)).as("qs"))
      .select(
        col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"),
        element_at(col("qs"), 1).as("p50"),
        element_at(col("qs"), 2).as("p90"))

  /** Event-time + watermark for streaming inputs: late data beyond the
    * delay is dropped and window state is bounded — the knob the
    * reference's backpressure/ordering machinery has no analogue for. */
  def withWatermarkedEventTime(raw: DataFrame, delay: String = "1 hour"): DataFrame =
    withEventTime(raw).withWatermark("ts", delay)

  /** Stream-static enrichment join: each streaming row joined against a
    * STATIC dimension frame (profile table, dedup-cluster map, model
    * registry…). Spark re-plans the static side per micro-batch with no
    * streaming state at all — and broadcasts it when small, so at
    * 100 TB/day of stream the dimension never shuffles the stream side.
    * Unlike stream-stream joins this needs no watermark; inner and
    * left_outer are supported on the stream side. Works identically when
    * `stream` is a batch frame, which is what the parity spec asserts. */
  def enrichWithStatic(
      stream: DataFrame, static: DataFrame, key: String,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer")(joinType),
      s"unsupported joinType '$joinType' for a stream-side-preserving join")
    stream.join(static.withColumnRenamed(key, s"${key}_s"),
      col(key) === col(s"${key}_s"), joinType)
  }

  /** Streaming exact dedup — the unbounded twin of
    * [[graft.pipeline.Dedup.exactKeepFirst]]: emit the first document seen
    * per distinct content, where "distinct" is a sha256 content key (the
    * state store holds 32-byte keys, not documents) and the watermark
    * bounds how long each key is remembered. At 100 TB/day this is the
    * correct shape: dedup state scales with the distinct-content rate
    * inside the horizon, not with stream lifetime. Requires a `ts`
    * timestamp column on the input. */
  def dedupExactStream(
      docs: DataFrame, textCol: String, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", sha2(col(textCol), 256))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-stream interval join — the streaming analogue of a bounded
    * range join: every (left, right) pair with equal `key` and the right
    * event time inside [left.ts − tolerance, left.ts]. Works identically
    * on batch frames (no watermark needed there), which is what the
    * parity spec asserts.
    *
    * Both sides are watermarked, and the time-range conjuncts are what
    * make the state BOUNDED: Spark derives each side's state TTL from the
    * other side's watermark plus the range (a buffered right row is
    * dropped once the left watermark passes rts + tolerance). Without the
    * range condition a stream-stream join must buffer both streams
    * forever — the difference between a demo and a 100 TB/day join.
    *
    * Column contract: left carries event time `ts`, right carries `rts`,
    * and the key columns are `key` (left) / `key + "_r"` (right) so the
    * joined schema never collides.
    *
    * `joinType` "inner" (default) or "left_outer": the outer variant emits
    * a left row with null right columns once the watermark proves no
    * in-range right row can still arrive — so outer results trail the
    * watermark by design (a left row younger than the final watermark
    * stays withheld, which the parity spec accounts for). Both watermarks
    * plus the range conjuncts are exactly what Spark requires to run an
    * outer stream-stream join with bounded state. */
  def intervalJoinStream(
      left: DataFrame, right: DataFrame, key: String,
      tolerance: String = "10 minutes",
      watermarkDelay: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer")(joinType),
      s"unsupported joinType '$joinType'")
    val l = if (left.isStreaming) left.withWatermark("ts", watermarkDelay) else left
    val r0 = right.withColumnRenamed(key, s"${key}_r")
    val r = if (right.isStreaming) r0.withWatermark("rts", watermarkDelay) else r0
    l.join(r,
      col(key) === col(s"${key}_r") &&
        col("rts") >= col("ts") - expr(s"INTERVAL $tolerance") &&
        col("rts") <= col("ts"),
      joinType)
  }
}
