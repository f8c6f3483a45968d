package graft

import graft.pipeline.Drift
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bucketed drift of a corpus against its own distribution is zero") {
    val docs = Tables.documents(spark, sf)
    val ref = Drift.refProbs(docs, "text")
    val whole = docs.withColumn("all", lit("all"))
    val jsd = Drift.bucketJsd(whole, Seq("all"), "text", ref)
      .head().getDouble(1)
    assert(jsd == 0.0, s"self-drift must be 0, got $jsd")
  }

  test("bucketed JSD lower-bounds vocabulary JSD (data-processing inequality)") {
    val docs = Tables.documents(spark, sf)
    val ref = Drift.refProbs(docs, "text")
    val bucketed = Drift.bucketJsd(docs, Seq("source"), "text", ref)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = graft.pipeline.TextQueries.sliceDrift(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bucketed.keySet == exact.keySet)
    bucketed.foreach { case (s, b) =>
      assert(b <= exact(s) + 1e-4,
        s"bucketing must not invent divergence: $s bucketed=$b exact=${exact(s)}")
    }
    assert(bucketed.values.exists(_ > 0.0), "vacuous: all slices identical")
  }

  test("windowed bucketed drift on a stream equals the batch computation") {
    // synthetic event time from the doc id: four 1-hour windows
    val docs = Tables.documents(spark, sf)
      .withColumn("ts",
        timestamp_seconds(lit(1700000000L) + (col("doc_id") % 4) * 3600))
    val ref = Drift.refProbs(docs, "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_driftstream").toFile
    docs.select("doc_id", "text", "ts").write.mode("overwrite")
      .parquet(dir.getAbsolutePath)
    def windowed(df: org.apache.spark.sql.DataFrame) =
      Drift.bucketJsd(
        df.withColumn("win", window(col("ts"), "1 hour")), Seq("win"), "text", ref)
        .select(col("win.start").as("ws"), col("jsd"))
    val stream = spark.readStream
      .schema(docs.select("doc_id", "text", "ts").schema)
      .parquet(dir.getAbsolutePath)
    val query = windowed(stream).writeStream
      .format("memory").queryName("graft_drift_win")
      .outputMode("complete").start()
    val streamed =
      try {
        query.processAllAvailable()
        spark.table("graft_drift_win")
          .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
      } finally query.stop()
    val batch = windowed(docs)
      .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
    assert(streamed == batch)
    assert(streamed.size == 4)
  }
}
