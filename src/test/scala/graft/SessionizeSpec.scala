package graft

import graft.streaming.{Sessionize, StreamingOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("streaming stateful sessionization agrees with the batch formulation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))

    val stream = spark.readStream
      .schema(StreamingOps.rawEventSchema)
      .parquet(dir.getAbsolutePath)
    val sessions = Sessionize.sessionsStreaming(
      spark, StreamingOps.withEventTime(stream), gapMinutes = 30)
    val q = sessions.writeStream
      .format("memory").queryName("graft_sessions").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_sessions")
        .select(col("user_id"), col("session_id"), col("n_events"),
          col("start_us"), col("end_us"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet

      // batch sessions, minus each user's final session (which the
      // streaming side still holds open in state)
      val batchAll = Sessionize.sessionsBatch(Tables.events(spark, sf), 30)
        .select(col("user_id"), col("session_id"), col("n_events"),
          unix_micros(col("session_start")).as("s"),
          unix_micros(col("session_end")).as("e"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val lastPerUser = batchAll.groupBy(_._1).map { case (_, g) => g.maxBy(_._2) }.toSet
      val batchClosed = batchAll.toSet -- lastPerUser

      assert(streamed == batchClosed,
        s"streamed ${streamed.size} vs batch-closed ${batchClosed.size}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("transformWithState sessionization matches flatMapGroupsWithState") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_tws").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))
    // Spark's own constraint: transformWithState runs only on the RocksDB
    // state store provider — set it for this query, restore afterwards so
    // the other streaming suites keep the default provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(StreamingOps.rawEventSchema)
        .parquet(dir.getAbsolutePath)
      val sessions = Sessionize.sessionsStreamingTws(
        spark, StreamingOps.withEventTime(stream), gapMinutes = 30)
      val q = sessions.writeStream
        .format("memory").queryName("graft_sessions_tws").outputMode("append").start()
      try {
        q.processAllAvailable()
        val tws = spark.table("graft_sessions_tws")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toSet
        // same closed-session contract as the flatMapGroupsWithState twin:
        // batch sessions minus each user's final (still-open) session
        val batchAll = Sessionize.sessionsBatch(Tables.events(spark, sf), 30)
          .select(col("user_id"), col("session_id"), col("n_events"),
            unix_micros(col("session_start")).as("s"),
            unix_micros(col("session_end")).as("e"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        val lastPerUser = batchAll.groupBy(_._1).map { case (_, g) => g.maxBy(_._2) }.toSet
        assert(tws == batchAll.toSet -- lastPerUser)
        assert(tws.nonEmpty)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
