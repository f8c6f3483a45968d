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

  test("windowed Wasserstein on a stream equals the batch computation; " +
      "self-reference reads zero") {
    import spark.implicits._
    // reference: a fixed value spread per key; stream: four 1-hour
    // windows, two repeating the reference exactly (w1 = 0) and two
    // shifted (w1 > 0)
    def ts(h: Int, i: Int) =
      new java.sql.Timestamp(1700000000000L + h * 3600000L + i * 1000L)
    val refRows = (0 until 100).map(i => ("m", 1.0 + i % 10))
    val ref = graft.pipeline.Drift.w1Ref(refRows.toDF("k", "v"), "k", "v")
    val curRows = (0 until 4).flatMap { h =>
      (0 until 100).map { i =>
        val v = if (h % 2 == 0) 1.0 + i % 10 else 6.0 + i % 10
        ("m", ts(h, i), v)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_w1stream").toFile
    val cur = curRows.toDF("k", "ts", "v")
    cur.write.mode("overwrite").parquet(dir.getAbsolutePath)
    def windowed(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.Drift.binW1(
          df.withColumn("win", window(col("ts"), "1 hour")),
          ref, "k", Seq("win"), "v")
        .select(col("win.start").as("ws"), col("n_cur"), col("w1"))
    val stream = spark.readStream.schema(cur.schema)
      .parquet(dir.getAbsolutePath)
    val query = windowed(stream).writeStream
      .format("memory").queryName("graft_w1_win")
      .outputMode("complete").start()
    val streamed =
      try {
        query.processAllAvailable()
        spark.table("graft_w1_win").collect()
          .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getDouble(2))).toMap
      } finally query.stop()
    val batch = windowed(cur).collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed == batch)
    assert(streamed.size == 4)
    val byHour = batch.toSeq.sortBy(_._1.getTime).map(_._2._2)
    assert(byHour(0) == 0.0 && byHour(2) == 0.0,
      "self-reference windows read exactly 0")
    assert(byHour(1) > 1.0 && byHour(3) > 1.0,
      "a +5 shift clamps into the upper bins and reads > 1 unit")
  }

  test("windowed PSI on a stream equals the batch computation; " +
      "bands follow the share movement") {
    import spark.implicits._
    def ts(h: Int, i: Int) =
      new java.sql.Timestamp(1700000000000L + h * 3600000L + i * 1000L)
    val refRows = (0 until 100).map(i => ("m", 1.0 + i % 10))
    val ref = graft.pipeline.Drift.psiRefFixed(refRows.toDF("k", "v"),
      "k", "v")
    val curRows = (0 until 4).flatMap { h =>
      (0 until 100).map { i =>
        val v = if (h % 2 == 0) 1.0 + i % 10 else 6.0 + i % 10
        ("m", ts(h, i), v)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_psistream").toFile
    val cur = curRows.toDF("k", "ts", "v")
    cur.write.mode("overwrite").parquet(dir.getAbsolutePath)
    def windowed(df: org.apache.spark.sql.DataFrame) =
      graft.pipeline.Drift.binPsi(
          df.withColumn("win", window(col("ts"), "1 hour")),
          ref, "k", Seq("win"), "v")
        .select(col("win.start").as("ws"), col("psi"), col("shift"))
    val stream = spark.readStream.schema(cur.schema)
      .parquet(dir.getAbsolutePath)
    val query = windowed(stream).writeStream
      .format("memory").queryName("graft_psi_win")
      .outputMode("complete").start()
    val streamed =
      try {
        query.processAllAvailable()
        spark.table("graft_psi_win").collect()
          .map(r => r.getTimestamp(0) -> (r.getDouble(1), r.getString(2)))
          .toMap
      } finally query.stop()
    val batch = windowed(cur).collect()
      .map(r => r.getTimestamp(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(streamed == batch)
    assert(streamed.size == 4)
    val byHour = batch.toSeq.sortBy(_._1.getTime).map(_._2)
    assert(byHour(0) == (0.0, "stable") && byHour(2) == (0.0, "stable"),
      "identical shares read exactly 0/stable")
    assert(byHour(1)._2 == "shifted" && byHour(3)._2 == "shifted",
      "half the mass clamping into the top bin reads shifted")
  }
}
