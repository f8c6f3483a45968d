package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("streaming hourly aggregation equals the batch result") {
    // stage the events file into a directory (file stream sources read dirs)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))

    val stream = spark.readStream
      .schema(StreamingOps.rawEventSchema)
      .parquet(dir.getAbsolutePath)
    val agg = StreamingOps.hourlyTypeAgg(
      StreamingOps.withWatermarkedEventTime(stream))

    val query = agg.writeStream
      .format("memory").queryName("graft_stream_agg")
      .outputMode("complete")
      .start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("graft_stream_agg")
        .orderBy(col("ws"), col("event_type")).collect().toSeq
      val batch = Registry.byName("q22_window_agg").run(spark, sf).collect().toSeq
      assert(streamed == batch)
    } finally {
      query.stop()
    }
  }
}
