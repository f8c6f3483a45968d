package graft

import graft.operators.AsOfJoin
import graft.streaming.{Sessionize, StreamingAsOf, StreamingOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming as-of join and watermark-finalized sessionization against
  * their batch twins. Events arrive over several micro-batches (file
  * sources), out of per-key order across batches; a far-future sentinel
  * event pushes the watermark past all real data so every pending row
  * flushes through the event-time-timeout path.
  */
class StreamingAsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Write the sf events as N chronological parquet chunks plus a
    * far-future sentinel, so a file stream replays them in order with an
    * advancing watermark. Returns (dir, sentinelUserId). */
  private def chunkedEventsDir(chunks: Int): (String, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toFile
    // collect ts as raw micros — Timestamp.getTime would truncate to ms
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      .orderBy(col("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val sentinelUser = 999999L
    val per = math.max(1, ev.length / chunks)
    import spark.implicits._
    def write(rows: Seq[(Long, Long, Long, String, Double)], i: Int): Unit =
      rows.toDF("event_id", "user_id", "ts_us", "event_type", "value")
        .select(col("event_id"), col("user_id"),
          timestamp_micros(col("ts_us")).as("ts"), col("event_type"), col("value"))
        .coalesce(1)
        .write.parquet(f"$dir/c$i%03d") // no '=' in the name: not a partition dir
    ev.grouped(per).zipWithIndex.foreach { case (rows, i) => write(rows.toSeq, i) }
    // sentinel: one event a year after the last, pushes the watermark
    write(Seq((99999999L, sentinelUser,
      ev.last._3 + 365L * 86400L * 1000000L, "click", 0.0)), chunks + 1)
    (dir.getAbsolutePath, sentinelUser)
  }

  test("streaming as-of join equals the batch operator once the watermark passes") {
    val (dir, sentinelUser) = chunkedEventsDir(chunks = 3)
    val schema = spark.read.parquet(s"$dir/c000").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/c*")

    val left = stream.filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), col("user_id").as("by"), col("ts"), col("value"))
    val right = stream.filter(col("event_type") === "click")
      .select(col("event_id").as("id"), col("user_id").as("by"), col("ts"), col("value"))
    val tolUs = 3600L * 1000000L

    val q = StreamingAsOf.backward(spark, left, right, tolUs, "10 minutes")
      .writeStream.format("memory").queryName("graft_stream_asof")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_stream_asof")
        .filter(col("by") =!= sentinelUser)
        .select(col("left_id"), col("right_id"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap

      val ev = Tables.events(spark, sf)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
          col("ts").as("click_ts"), col("value").as("click_value"))
      val batch = AsOfJoin.backward(
        left = purchases, right = clicks,
        onLeft = purchases("ts"), onRight = clicks("click_ts"),
        by = Seq(purchases("user_id") -> clicks("c_user_id")),
        tolerance = expr("INTERVAL 1 HOUR"),
        leftId = purchases("event_id"), tieBreak = clicks("click_id"))
        .select(col("event_id"), col("click_id"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap

      assert(streamed.size == batch.size,
        s"streamed ${streamed.size} vs batch ${batch.size}")
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("watermark-finalized sessions equal the full batch sessionization") {
    val (dir, sentinelUser) = chunkedEventsDir(chunks = 3)
    val schema = spark.read.parquet(s"$dir/c000").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/c*")

    val q = Sessionize
      .sessionsStreamingFinalized(spark, stream, gapMinutes = 30, "10 minutes")
      .writeStream.format("memory").queryName("graft_final_sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_final_sessions")
        .filter(col("user_id") =!= sentinelUser)
        .select(col("user_id"), col("session_id"), col("n_events"),
          col("start_us"), col("end_us"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet

      val batch = Sessionize.sessionsBatch(Tables.events(spark, sf), 30)
        .select(col("user_id"), col("session_id"), col("n_events"),
          unix_micros(col("session_start")).as("s"),
          unix_micros(col("session_end")).as("e"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet

      assert(streamed == batch,
        s"streamed ${streamed.size} vs batch ${batch.size}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
