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

  test("streaming paired-conversion state feeds McNemar to exact batch parity") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_mcn").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))
    def f1 = col("event_type") === "purchase" && col("event_id") % 2 === 0
    def f2 = col("event_type") === "purchase" && col("event_id") % 2 === 1
    val stream = spark.readStream
      .schema(StreamingOps.rawEventSchema)
      .parquet(dir.getAbsolutePath)
    val state = StreamingOps.pairedConversionState(
      StreamingOps.withEventTime(stream), "user_id", f1, f2)
    val query = state.writeStream
      .format("memory").queryName("graft_stream_mcnemar")
      .outputMode("complete")
      .start()
    try {
      query.processAllAvailable()
      // the statistic reads the maintained state (the persisted-sketch
      // convention): max-flag state is merge-exact, so the chain equals
      // the all-batch q87 path bit-for-bit
      val streamed = graft.operators.StatTests
        .mcNemar(spark.table("graft_stream_mcnemar"), "user_id", "f1", "f2")
        .collect().toSeq
      val batch = Registry.byName("q87_mcnemar").run(spark, sf).collect().toSeq
      assert(streamed == batch)
    } finally {
      query.stop()
    }
  }

  test("streaming windowed HLL distinct-count equals the batch sketch exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_hll").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))

    val stream = spark.readStream
      .schema(StreamingOps.rawEventSchema)
      .parquet(dir.getAbsolutePath)
    val agg = StreamingOps.hourlyDistinctUsers(
      StreamingOps.withWatermarkedEventTime(stream))

    val query = agg.writeStream
      .format("memory").queryName("graft_stream_hll")
      .outputMode("complete")
      .start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("graft_stream_hll")
        .orderBy(col("ws"), col("event_type")).collect().toSeq
      val batch = StreamingOps.hourlyDistinctUsers(Tables.events(spark, sf))
        .orderBy(col("ws"), col("event_type")).collect().toSeq
      // HLL register state is order-insensitive, so batch and stream agree
      // bit-for-bit, not just within sketch error
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally {
      query.stop()
    }
  }

  test("streaming windowed expectations equal the batch rule report exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dq").toFile
    val ev = Tables.events(spark, sf)
    ev.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    ev.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    import graft.pipeline.Expectations._
    val rules = Seq(
      NotNull("value"),
      InRange("value", 0.0, 100.0, threshold = 0.8),
      Unique("event_id"),
      Unique("user_id"))
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath)
    val agg = checkWindowed(stream.withWatermark("ts", "1 hour"), "ts", "1 day", rules)
    val query = agg.writeStream
      .format("memory").queryName("graft_stream_dq")
      .outputMode("complete")
      .start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("graft_stream_dq")
        .orderBy(col("ws"), col("rule"), col("column")).collect().toSeq
      // scalar counters AND the uniqueness sketch state merge across
      // micro-batches to the batch answer: exact, not approximate —
      // row-for-row equality including metric doubles
      val batch = checkWindowed(ev, "ts", "1 day", rules)
        .orderBy(col("ws"), col("rule"), col("column")).collect().toSeq
      assert(batch.nonEmpty)
      assert(streamed == batch)
      // the planted failing rule fails in EVERY window in both worlds
      assert(spark.table("graft_stream_dq")
        .filter(col("rule") === "unique" && col("column") === "user_id")
        .collect().forall(!_.getBoolean(6)))
    } finally query.stop()
  }

  test("streaming windowed t-digest quantiles land at the right ranks per window") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_td").toFile
    // two files -> at least two micro-batches: digests really merge
    // across state-store updates, not inside one batch
    val ev = Tables.events(spark, sf)
    ev.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    ev.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath)
    val agg = StreamingOps.hourlyQuantiles(stream.withWatermark("ts", "1 hour"))
    val query = agg.writeStream
      .format("memory").queryName("graft_stream_td")
      .outputMode("complete")
      .start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("graft_stream_td").collect()
        .map(r => (r.getTimestamp(0), r.getString(2)) ->
          ((r.getDouble(3), r.getDouble(4)))).toMap
      assert(streamed.nonEmpty)
      // t-digest centroids are merge-order-sensitive, so parity with the
      // batch digest is RANK accuracy against the exact per-window sorted
      // values, the digest's own contract (ApproxAggSpec precedent)
      val groups = ev
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(sort_array(collect_list(col("value"))).as("vs"))
        .select(col("window.start"), col("event_type"), col("vs"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
          r.getSeq[Double](2)).toMap
      assert(groups.keySet == streamed.keySet)
      groups.foreach { case (key, vs) =>
        val (p50, p90) = streamed(key)
        def rankOf(q: Double): Double = {
          val below = vs.count(_ <= q)
          below.toDouble / vs.length
        }
        // generous window-level bound: small windows quantize coarsely
        assert(math.abs(rankOf(p50) - 0.5) <= 0.25 + 1.0 / vs.length,
          s"$key p50=$p50 rank=${rankOf(p50)} n=${vs.length}")
        assert(rankOf(p90) >= 0.6,
          s"$key p90=$p90 rank=${rankOf(p90)} n=${vs.length}")
        assert(p50 <= p90)
      }
    } finally query.stop()
  }

  test("restart from checkpoint resumes exactly-once (no dupes, no gaps)") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_ckpt_src").toFile
    val sink = java.nio.file.Files.createTempDirectory("graft_ckpt_sink").toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_meta").toString
    def writeBatchFile(name: String, from: Long, until: Long): Unit =
      (from until until).map(i => (i, s"v$i")).toDF("id", "v")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"${src.getAbsolutePath}/$name")
    def start() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
      .option("recursiveFileLookup", "true")
      .parquet(src.getAbsolutePath)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .start()

    writeBatchFile("b1", 0L, 100L)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // second file arrives while the query is DOWN; the restarted query
    // must pick it up from the checkpoint without re-emitting file 1
    writeBatchFile("b2", 100L, 150L)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(sink).collect()
      .map(r => r.getLong(0)).sorted.toSeq
    assert(out == (0L until 150L), // exactly once: every id, once each
      s"got ${out.size} rows, dupes=${out.groupBy(identity).count(_._2.size > 1)}")
  }

  test("streaming continuous top-k (heap aggregate) equals the batch result") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_topk").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))
    val stream = spark.readStream
      .schema(StreamingOps.rawEventSchema)
      .parquet(dir.getAbsolutePath)
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("event_type"))
        .agg(graft.functions.expr.TopKAgg(col("value"), col("event_id"), 5).as("tk"))
    val q = topk(StreamingOps.withEventTime(stream)).writeStream
      .format("memory").queryName("graft_stream_topk").outputMode("complete").start()
    try {
      q.processAllAvailable()
      def flat(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getDouble(0), e.getLong(1)))
      }.toMap
      val streamed = flat(spark.table("graft_stream_topk").collect())
      val batch = flat(topk(Tables.events(spark, sf)).collect())
      // the top-k set under a total order is unique, so the heap state
      // merged across micro-batches equals the batch aggregate exactly
      assert(streamed == batch)
      assert(batch.nonEmpty && batch.values.forall(_.size == 5))
    } finally q.stop()
  }

  test("streaming cohort emissions count up to the batch retention matrix") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_cohort").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(StreamingOps.rawEventSchema)
        .parquet(dir.getAbsolutePath)
      val ret = graft.streaming.StreamingCohorts.retentionStream(
        spark, StreamingOps.withEventTime(stream))
      val q = ret.writeStream
        .format("memory").queryName("graft_stream_cohort").outputMode("append").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("graft_stream_cohort")
          .select(
            to_date(timestamp_micros(col("cohort_wk_us"))).as("cohort_wk"),
            col("offset_wk"))
          .groupBy(col("cohort_wk"), col("offset_wk"))
          .agg(count(lit(1)).as("n_users"))
          .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2))
          .toMap
        val batch = Registry.byName("events_cohorts").run(spark, sf)
          .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2))
          .toMap
        assert(streamed == batch, s"stream $streamed vs batch $batch")
        assert(streamed.nonEmpty)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming transition steps count up to the batch transition matrix") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_trans").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(StreamingOps.rawEventSchema)
        .parquet(dir.getAbsolutePath)
      val steps = graft.streaming.StreamingTransitions.stepsStream(
        spark, StreamingOps.withEventTime(stream))
      val q = steps.writeStream
        .format("memory").queryName("graft_stream_trans").outputMode("append").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("graft_stream_trans")
          .groupBy(col("prev_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
          .toMap
        val batch = Registry.byName("events_transitions").run(spark, sf)
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
          .toMap
        assert(streamed == batch, s"stream $streamed vs batch $batch")
        assert(streamed.nonEmpty)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming funnel state machine reaches the batch stages exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_funnel").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(StreamingOps.rawEventSchema)
        .parquet(dir.getAbsolutePath)
      val advances = graft.streaming.Funnel.stagesStream(
        spark, StreamingOps.withEventTime(stream))
      val q = advances.writeStream
        .format("memory").queryName("graft_stream_funnel").outputMode("append").start()
      try {
        q.processAllAvailable()
        // per-user deepest stage reached on the stream side...
        val streamedStages = spark.table("graft_stream_funnel")
          .collect().map(r => (r.getLong(0), r.getInt(1)))
          .groupBy(_._1).map { case (u, g) => u -> g.map(_._2).max }
        val streamedCounts = streamedStages.values
          .groupBy(identity).map { case (s, g) => s.toLong -> g.size.toLong }
        // ...must reproduce the batch funnel's per-stage counts (stage 0
        // users never emit an advance, so compare stages 1-3 only)
        val batchCounts = Registry.byName("events_funnel").run(spark, sf)
          .collect().map(r => r.getInt(0).toLong -> r.getLong(1))
          .filter(_._1 > 0).toMap
        assert(streamedCounts == batchCounts,
          s"stream $streamedCounts vs batch $batchCounts")
        assert(streamedCounts.nonEmpty)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("streaming exact dedup keeps one row per distinct content (batch parity)") {
    import org.apache.spark.sql.types._
    // documents have no event time — synthesize one (doc_id seconds after
    // a fixed epoch) and stage as a file stream
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toFile
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"))
      .write.mode("overwrite").parquet(dir.getAbsolutePath)

    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("ts", TimestampType)))
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
    val deduped = graft.streaming.StreamingOps.dedupExactStream(stream, "text")

    val query = deduped.writeStream
      .format("memory").queryName("graft_dedup_stream")
      .outputMode("append")
      .start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("graft_dedup_stream")
      val batchDistinct = Tables.documents(spark, sf)
        .select(sha2(col("text"), 256).as("h")).distinct()
      // one survivor per distinct content, and exactly the same content set
      assert(streamed.count() == batchDistinct.count())
      assert(streamed.select(col("content_hash")).distinct().count() == batchDistinct.count())
      assert(streamed.join(batchDistinct, streamed("content_hash") === batchDistinct("h"))
        .count() == batchDistinct.count())
    } finally {
      query.stop()
    }
  }

  test("streaming minhash near-dup candidates equal the batch LSH operator") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_minhash_stream").toFile
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // transformWithState runs only on the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // several micro-batches → state is real
        .parquet(dir.getAbsolutePath)
      val cands = graft.streaming.StreamingDedup
        .minhashCandidatesStream(spark, stream, "doc_id", "text")
      val query = cands.writeStream
        .format("memory").queryName("graft_minhash_stream")
        .outputMode("append")
        .start()
      try {
        query.processAllAvailable()
        val streamed = spark.table("graft_minhash_stream").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val batchCands = graft.pipeline.Dedup
          .minhashCandidates(Tables.documents(spark, sf), "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(batchCands.nonEmpty)
        assert(streamed == batchCands,
          s"stream-only: ${(streamed -- batchCands).take(5)}, " +
            s"batch-only: ${(batchCands -- streamed).take(5)}")
        // verifying the streamed candidates reproduces the batch near-dup
        // PAIRS — the full minhashPairs contract, not just candidacy
        import spark.implicits._
        val streamedPairsDf = streamed.toSeq.toDF("da", "db")
        val verified = graft.pipeline.Dedup
          .jaccardForPairs(Tables.documents(spark, sf), "doc_id", "text", streamedPairsDf)
          .filter(col("jaccard") >= 0.8)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val batchPairs = graft.pipeline.Dedup
          .minhashPairs(Tables.documents(spark, sf), "doc_id", "text", threshold = 0.8)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(verified == batchPairs)
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming hampel equals the batch centered window bit-for-bit") {
    // the centered +/-k window forces a k-row emission delay on a
    // stream; the trailing-buffer processor must reproduce the batch
    // verdicts exactly, including across a micro-batch boundary
    val ev = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val split = ev.agg(expr("percentile_approx(unix_micros(ts), 0.5)"))
      .head().getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_hampel_stream").toFile
    ev.filter(expr("unix_micros(ts)") < split)
      .coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)
    ev.filter(expr("unix_micros(ts)") >= split)
      .coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        ev.schema("ts").dataType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getAbsolutePath)
      val flagged = graft.streaming.StreamingHampel.hampelStream(
        spark, stream, "event_type", "ts", "event_id", "value", k = 5)
      val query = flagged.writeStream
        .format("memory").queryName("graft_hampel_stream")
        .outputMode("append")
        .start()
      try {
        query.processAllAvailable()
        val streamed = spark.table("graft_hampel_stream")
          .collect()
          .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getInt(4))))
          .toMap
        val batch = graft.operators.TimeSeries.hampel(
            ev, "event_type", "ts", "event_id", "value", k = 5)
          .collect()
          .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getInt(4))))
          .toMap
        assert(batch.nonEmpty)
        assert(streamed.size == batch.size,
          s"stream ${streamed.size} rows vs batch ${batch.size}")
        val diff = batch.collect {
          case (id, v) if streamed.get(id) != Some(v) =>
            id -> (v, streamed.get(id))
        }
        assert(diff.isEmpty, s"first diffs: ${diff.take(5)}")
        // the flags are not all zero (the corpus has spikes to find)
        assert(streamed.values.exists(_._3 == 1))
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming EWMA equals the batch windowed smoother bit-for-bit") {
    // two TIME-SLICED files written sequentially → two micro-batches in
    // event-time order (the operator's cross-batch ordering contract);
    // per-key state carries the trailing window across the boundary
    val ev = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val split = ev.agg(expr("percentile_approx(unix_micros(ts), 0.5)"))
      .head().getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ewma_stream").toFile
    ev.filter(expr("unix_micros(ts)") < split)
      .coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)
    ev.filter(expr("unix_micros(ts)") >= split)
      .coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        ev.schema("ts").dataType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getAbsolutePath)
      val smoothed = graft.streaming.StreamingEwma.smoothStream(
        spark, stream, "event_type", "ts", "event_id", "value",
        alpha = 0.5, window = 8)
      val query = smoothed.writeStream
        .format("memory").queryName("graft_ewma_stream")
        .outputMode("append")
        .start()
      try {
        query.processAllAvailable()
        val streamed = spark.table("graft_ewma_stream")
          .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
        val batch = graft.operators.Ewma.smooth(
            ev.withColumn("__us", expr("unix_micros(ts)")),
            "event_type", "__us", "event_id", "value",
            alpha = 0.5, window = 8)
          .collect().map(r => r.getLong(0) -> r.getAs[Double]("ewma")).toMap
        assert(batch.nonEmpty)
        assert(streamed.size == batch.size,
          s"stream ${streamed.size} rows vs batch ${batch.size}")
        val diff = batch.collect {
          case (id, v) if streamed.get(id) != Some(v) =>
            id -> (v, streamed.get(id))
        }
        assert(diff.isEmpty, s"first diffs: ${diff.take(5)}")
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming Page-Hinkley equals the batch monitor bit-for-bit, " +
      "including the first-alarm event") {
    val ev = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val split = ev.agg(expr("percentile_approx(unix_micros(ts), 0.5)"))
      .head().getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ph_stream").toFile
    ev.filter(expr("unix_micros(ts)") < split)
      .coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)
    ev.filter(expr("unix_micros(ts)") >= split)
      .coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        ev.schema("ts").dataType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getAbsolutePath)
      // lambda low enough that SOME keys alarm at this SF (sf0.001
      // max_ph spans ~300-1230) — the parity must cover both branches
      val monitored = graft.streaming.StreamingPageHinkley.monitorStream(
        spark, stream, "event_type", "ts", "event_id", "value",
        delta = 0.05, lambda = 800.0)
      val query = monitored.writeStream
        .format("memory").queryName("graft_ph_stream")
        .outputMode("append")
        .start()
      try {
        query.processAllAvailable()
        // the LAST emitted row per key is the full-prefix readout
        val streamed = spark.table("graft_ph_stream")
          .collect().groupBy(_.getString(0))
          .map { case (k, rows) =>
            val last = rows.maxBy(_.getLong(2))
            k -> ((last.getLong(2), last.getDouble(3),
              Option(last.get(4)).map(_.asInstanceOf[Long]),
              Option(last.get(5)).map(_.asInstanceOf[Long]),
              last.getBoolean(6)))
          }
        val batch = graft.operators.TimeSeries.pageHinkley(
            ev.withColumn("__us", expr("unix_micros(ts)")),
            "event_type", "__us", "event_id", "value",
            delta = 0.05, lambda = 800.0)
          .collect().map { r =>
            r.getString(0) -> ((r.getLong(1), r.getDouble(2),
              Option(r.get(3)).map(_.asInstanceOf[Int].toLong),
              Option(r.get(4)).map(_.asInstanceOf[Long]),
              r.getBoolean(5)))
          }.toMap
        assert(batch.nonEmpty && streamed.size == batch.size)
        assert(batch.values.exists(_._5) && batch.values.exists(!_._5),
          s"fixture must exercise both branches: $batch")
        val diff = batch.collect {
          case (k, v) if streamed.get(k) != Some(v) =>
            k -> (v, streamed.get(k))
        }
        assert(diff.isEmpty, s"diffs: $diff")
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming EWMA anomalies equal the batch rule across batch boundaries") {
    val ev = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val split = ev.agg(expr("percentile_approx(unix_micros(ts), 0.5)"))
      .head().getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_anom_stream").toFile
    ev.filter(expr("unix_micros(ts)") < split)
      .coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)
    ev.filter(expr("unix_micros(ts)") >= split)
      .coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        ev.schema("ts").dataType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getAbsolutePath)
      val flagged = graft.streaming.StreamingEwma.anomalyStream(
        spark, stream, "event_type", "ts", "event_id", "value",
        alpha = 0.5, window = 8, k = 2.0, minObs = 4)
      val query = flagged.writeStream
        .format("memory").queryName("graft_anom_stream")
        .outputMode("append")
        .start()
      try {
        query.processAllAvailable()
        val streamed = spark.table("graft_anom_stream")
          .collect().map(r => r.getLong(1) ->
            ((Option(r.get(3)).map(_.asInstanceOf[Double]),
              Option(r.get(4)).map(_.asInstanceOf[Boolean])))).toMap
        val batch = graft.operators.Ewma.anomalies(
            ev.withColumn("__us", expr("unix_micros(ts)")),
            "event_type", "__us", "event_id", "value",
            alpha = 0.5, window = 8, k = 2.0, minObs = 4)
          .collect().map(r => r.getLong(0) ->
            ((Option(r.getAs[Any]("score")).map(_.asInstanceOf[Double]),
              Option(r.getAs[Any]("anomaly")).map(_.asInstanceOf[Boolean]))))
          .toMap
        assert(batch.nonEmpty && streamed.size == batch.size)
        // some flags genuinely fire in both worlds
        assert(batch.values.exists(_._2 == Some(true)))
        val diff = batch.collect {
          case (id, v) if streamed.get(id) != Some(v) =>
            id -> (v, streamed.get(id))
        }
        assert(diff.isEmpty, s"first diffs: ${diff.take(5)}")
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming CDC upsert: last emission per id equals the batch upsert") {
    import org.apache.spark.sql.types._
    // the pipeline_upsert fixture as a change stream: base load (src 0,
    // v0), then every-7th-doc revisions + every-13th-doc new ids (src 1,
    // v1), then a second revision wave (v2) — three files, three
    // micro-batches, state must advance across them
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val base = docs.select(col("doc_id").as("id"), lit(0L).as("version"),
      lit(0).as("src"), col("text").as("payload"))
    val upd1 = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("id"), lit(1L).as("version"), lit(1).as("src"),
        concat(col("text"), lit(" rev")).as("payload"))
      .unionByName(docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 10000000L).as("id"), lit(1L).as("version"),
          lit(1).as("src"), col("text").as("payload")))
    val upd2 = docs.filter(col("doc_id") % 21 === 0)
      .select(col("doc_id").as("id"), lit(2L).as("version"), lit(1).as("src"),
        concat(col("text"), lit(" rev2")).as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_stream").toFile
    base.coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)
    upd1.coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
    upd2.coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("version", LongType),
      StructField("src", IntegerType), StructField("payload", StringType)))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getAbsolutePath)
      val current = graft.streaming.StreamingUpsert
        .upsertStream(spark, stream, "id", "version", "src", "payload")
      val query = current.writeStream
        .format("memory").queryName("graft_upsert_stream")
        .outputMode("append")
        .start()
      try {
        query.processAllAvailable()
        // last emission per id = highest version emitted (emissions per id
        // advance strictly)
        val streamed = spark.table("graft_upsert_stream")
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
              .orderBy(col("version").desc)))
          .filter(col("rn") === 1)
          .select(col("id"), col("version"), col("payload"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
        val batch = graft.pipeline.Maintenance
          .upsert(
            base.drop("src"), upd1.unionByName(upd2).drop("src"),
            "id", "version")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
        assert(batch.nonEmpty)
        assert(streamed == batch,
          s"stream-only: ${(streamed -- batch).take(3)}, " +
            s"batch-only: ${(batch -- streamed).take(3)}")
        // a genuinely revised id advanced twice: one emission per version
        val emissions = spark.table("graft_upsert_stream")
          .groupBy(col("id")).agg(count(lit(1)).as("n"))
        assert(emissions.filter(col("n") === 3).count() > 0,
          "every-21st ids must emit v0, v1 and v2 current rows")
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming SCD-2 log reconstructs the batch history exactly") {
    import org.apache.spark.sql.types._
    // the scd2 gate fixture as a version-ordered change stream: base
    // (v0), then v1 revisions + new ids + v0 COLLISIONS (the tie path),
    // then a v2 wave — three files, three micro-batches
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val base = docs.select(col("doc_id").as("id"), lit(0L).as("version"),
      lit(0).as("src"), col("text").as("payload"))
    val w1 = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("id"), lit(1L).as("version"), lit(1).as("src"),
        concat(col("text"), lit(" rev")).as("payload"))
      .unionByName(docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 10000000L).as("id"), lit(1L).as("version"),
          lit(1).as("src"), col("text").as("payload")))
      .unionByName(docs.filter(col("doc_id") % 17 === 0)
        .select(col("doc_id").as("id"), lit(0L).as("version"), lit(1).as("src"),
          concat(col("text"), lit(" r0")).as("payload")))
    val w2 = docs.filter(col("doc_id") % 21 === 0)
      .select(col("doc_id").as("id"), lit(2L).as("version"), lit(1).as("src"),
        concat(col("text"), lit(" rev2")).as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_stream").toFile
    base.coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)
    w1.coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
    w2.coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("version", LongType),
      StructField("src", IntegerType), StructField("payload", StringType)))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getAbsolutePath)
      val log = graft.streaming.StreamingUpsert
        .scd2Stream(spark, stream, "id", "version", "src", "payload")
      val query = log.writeStream
        .format("memory").queryName("graft_scd2_stream")
        .outputMode("append")
        .start()
      try {
        query.processAllAvailable()
        // reconstruct per (id, version): the close emission if one
        // exists (a version closes at most once), else the max-src open
        val streamed = spark.table("graft_scd2_stream")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
            r.getString(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
          .groupBy(t => (t._1, t._2))
          .map { case (k, evs) =>
            val row = evs.find(_._5.isDefined)
              .getOrElse(evs.maxBy(_._3))
            k -> ((row._4.length, row._5, row._5.isEmpty))
          }
        val batch = graft.pipeline.Maintenance
          .scd2(base.drop("src"), w1.unionByName(w2).drop("src"),
            "id", "version")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            ((r.getString(2).length, Option(r.get(4)).map(_.asInstanceOf[Long]),
              r.getBoolean(5))))
          .toMap
        assert(batch.nonEmpty)
        assert(streamed.size == batch.size,
          s"stream ${streamed.size} vs batch ${batch.size}")
        val diff = batch.collect {
          case (k, v) if streamed.get(k) != Some(v) => k -> (v, streamed.get(k))
        }
        assert(diff.isEmpty, s"first diffs: ${diff.take(5)}")
        // three-row histories exist and closed twice
        val closes = spark.table("graft_scd2_stream")
          .filter(col("valid_to").isNotNull)
          .groupBy(col("id")).agg(count(lit(1)).as("n"))
        assert(closes.filter(col("n") === 2).count() > 0,
          "every-21st ids must close v0 and v1")
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming decontamination flag: batch parity and no false negatives") {
    // stage train docs as a file stream; eval docs are the static side
    val docs = Tables.documents(spark, sf)
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
    val evalDocs = docs.filter(bucket >= "e6").select("text")
    val train = docs.filter(bucket < "cc").select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_decontam_stream").toFile
    train.write.mode("overwrite").parquet(dir.getAbsolutePath)

    val stream = spark.readStream.schema(train.schema).parquet(dir.getAbsolutePath)
    val flagged = graft.streaming.StreamingDecontam
      .flagStream(stream, "text", evalDocs, "text", n = 8)
    val query = flagged.writeStream
      .format("memory").queryName("graft_decontam_flags")
      .outputMode("append").start()
    val streamedFlagged =
      try {
        query.processAllAvailable()
        spark.table("graft_decontam_flags")
          .filter(col("contaminated")).select("doc_id")
          .collect().map(_.getLong(0)).toSet
      } finally query.stop()

    // bit-parity: the same predicate evaluated in batch flags the same docs
    val batchFlagged = graft.streaming.StreamingDecontam
      .flagStream(train, "text", evalDocs, "text", n = 8)
      .filter(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamedFlagged == batchFlagged)

    // candidate-tier contract: every truly contaminated doc is flagged
    // (false positives allowed at fpp, false negatives never)
    val exact = graft.pipeline.TextQueries.decontaminate(
        docs, "doc_id", "text",
        isEval = bucket >= "e6", isTrain = bucket < "cc", n = 8,
        hashKeys = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(streamedFlagged),
      s"missed ${(exact -- streamedFlagged).size} contaminated docs")
    assert(exact.nonEmpty, "vacuous gate: no contamination planted in corpus")
  }

  test("stream-stream interval join equals the batch interval join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssjoin").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))

    def sides(events: org.apache.spark.sql.DataFrame) = {
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ts"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"), col("ts").as("rts"))
      (purchases, clicks)
    }

    val stream = StreamingOps.withEventTime(
      spark.readStream.schema(StreamingOps.rawEventSchema).parquet(dir.getAbsolutePath))
    val (sp, sc) = sides(stream)
    val joined = StreamingOps.intervalJoinStream(sp, sc, "user_id")
      .select(col("pid"), col("cid"))

    val query = joined.writeStream
      .format("memory").queryName("graft_ssjoin")
      .outputMode("append")
      .start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("graft_ssjoin")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val (bp, bc) = sides(
        StreamingOps.withEventTime(spark.read.parquet(s"$sf/events.parquet")))
      val batch = StreamingOps.intervalJoinStream(bp, bc, "user_id")
        .select(col("pid"), col("cid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch)
    } finally {
      query.stop()
    }
  }

  test("stream-static enrichment join equals the batch join (broadcast dimension)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sstatic").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))

    // static dimension: each user's first event id + event count (derived
    // once, from batch — the "profile table" a stream enriches against)
    val profile = StreamingOps.withEventTime(
      spark.read.parquet(s"$sf/events.parquet"))
      .groupBy(col("user_id"))
      .agg(min(col("event_id")).as("first_event"), count(lit(1)).as("n_events"))

    val stream = StreamingOps.withEventTime(
      spark.readStream.schema(StreamingOps.rawEventSchema).parquet(dir.getAbsolutePath))
      .filter(col("event_type") === "purchase")
    val joined = StreamingOps.enrichWithStatic(stream, profile, "user_id")
      .select(col("event_id"), col("first_event"), col("n_events"))

    val query = joined.writeStream
      .format("memory").queryName("graft_sstatic")
      .outputMode("append")
      .start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("graft_sstatic").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = StreamingOps.enrichWithStatic(
        StreamingOps.withEventTime(spark.read.parquet(s"$sf/events.parquet"))
          .filter(col("event_type") === "purchase"),
        profile, "user_id")
        .select(col("event_id"), col("first_event"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch)
    } finally {
      query.stop()
    }
  }

  test("streaming cluster assignment equals the batch assignment (stateless narrow)") {
    // train once on the static corpus, then classify a STREAM of arriving
    // vectors against the frozen centroids — the "train rarely, assign
    // continuously" operating mode
    val e = Tables.embeddings(spark, sf)
    val (_, centroids) =
      graft.pipeline.ClusterOps.kmeans(e, "vec_id", "embedding", 4, 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_kmstream").toFile
    e.select("vec_id", "embedding").write.mode("overwrite")
      .parquet(dir.getAbsolutePath)
    val stream = spark.readStream
      .schema(e.select("vec_id", "embedding").schema)
      .parquet(dir.getAbsolutePath)
    val assigned = graft.pipeline.ClusterOps.assign(stream, "embedding", centroids)
    val query = assigned.select("vec_id", "cid").writeStream
      .format("memory").queryName("graft_km_stream")
      .outputMode("append").start()
    val streamed =
      try {
        query.processAllAvailable()
        spark.table("graft_km_stream")
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      } finally query.stop()
    val batch = graft.pipeline.ClusterOps
      .assign(e.select("vec_id", "embedding"), "embedding", centroids)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(streamed == batch)
    assert(streamed.size == e.count())
  }

  test("left-outer stream-stream interval join: matches ≡ batch, null rows trail the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssloj").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "events.parquet"))

    def sides(events: org.apache.spark.sql.DataFrame) = {
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ts"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"), col("ts").as("rts"))
      (purchases, clicks)
    }

    val stream = StreamingOps.withEventTime(
      spark.readStream.schema(StreamingOps.rawEventSchema).parquet(dir.getAbsolutePath))
    val (sp, sc) = sides(stream)
    val joined = StreamingOps
      .intervalJoinStream(sp, sc, "user_id", joinType = "left_outer")
      .select(col("pid"), col("cid"), col("ts"))
    val query = joined.writeStream
      .format("memory").queryName("graft_ssloj")
      .outputMode("append")
      .start()
    try {
      query.processAllAvailable()
      val out = spark.table("graft_ssloj").collect()
      val streamedPairs = out.filter(!_.isNullAt(1))
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val streamedNullPids = out.filter(_.isNullAt(1)).map(_.getLong(0)).toSet

      val batchEvents = StreamingOps.withEventTime(
        spark.read.parquet(s"$sf/events.parquet"))
      val (bp, bc) = sides(batchEvents)
      val batchOuter = StreamingOps
        .intervalJoinStream(bp, bc, "user_id", joinType = "left_outer")
        .select(col("pid"), col("cid"), col("ts")).collect()
      val batchPairs = batchOuter.filter(!_.isNullAt(1))
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // matched pairs are identical to batch — outer-ness changes nothing
      assert(streamedPairs == batchPairs)

      // null (unmatched) lefts: the stream emits exactly the batch-unmatched
      // rows the final watermark has proven complete (wm = max event time −
      // 30 min delay); rows inside the final watermark window stay withheld
      // the global watermark is the MIN of the two sides' watermarks, each
      // tracking its own (filtered) stream's max event time
      val maxP = bp.agg(max(col("ts"))).head().getTimestamp(0).getTime
      val maxC = bc.agg(max(col("rts"))).head().getTimestamp(0).getTime
      val wmMs = math.min(maxP, maxC) - 30L * 60 * 1000
      val tolMs = 10L * 60 * 1000
      val epsMs = 5000L
      val batchUnmatched = batchOuter.filter(_.isNullAt(1))
        .map(r => r.getLong(0) -> r.getTimestamp(2).getTime).toMap
      assert(streamedNullPids.subsetOf(batchUnmatched.keySet))
      // Spark evicts left state from the conjunct `ts <= rts + tol`, so an
      // unmatched left is only proven complete once wm passes ts + tol
      val provenComplete = batchUnmatched.collect {
        case (pid, ts) if ts + tolMs < wmMs - epsMs => pid
      }.toSet
      assert(provenComplete.subsetOf(streamedNullPids),
        s"${(provenComplete -- streamedNullPids).size} watermark-complete unmatched lefts were never emitted; " +
          (provenComplete -- streamedNullPids).take(5)
            .map(p => s"pid=$p tsMinusWm=${batchUnmatched(p) - wmMs}ms").mkString(", "))
      val mustWithhold = batchUnmatched.collect {
        case (pid, ts) if ts > wmMs + epsMs => pid
      }.toSet
      assert((streamedNullPids & mustWithhold).isEmpty,
        "rows inside the watermark window must stay withheld")
      assert(provenComplete.nonEmpty, "fixture should exercise emitted outer rows")
    } finally {
      query.stop()
    }
  }

  test("streaming CMS shard states union to the batch frequency sketch") {
    import org.apache.spark.sql.types._
    import graft.functions.expr.{CountMinAgg, CountMinEstimate, CountMinUnionAgg}
    val dir = java.nio.file.Files.createTempDirectory("graft_cms_stream").toFile
    val ev = Tables.events(spark, sf).select(col("user_id"))
    // two files → two micro-batches, so shard states really accumulate
    val half = ev.filter(col("user_id") % 2 === 0)
    half.coalesce(1).write.mode("overwrite").parquet(dir.getAbsolutePath)
    ev.filter(col("user_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(dir.getAbsolutePath)

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(StructType(Seq(StructField("user_id", LongType))))
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.getAbsolutePath)
      val states = graft.streaming.StreamingCms
        .sketchStream(spark, stream, "user_id", numShards = 4)
      val query = states.writeStream
        .format("memory").queryName("graft_cms_stream")
        .outputMode("append")
        .start()
      try {
        query.processAllAvailable()
        import spark.implicits._
        // latest state per shard → union → one merged artifact
        val latest = spark.table("graft_cms_stream")
          .orderBy(col("shard"), col("seq").desc)
          .collect().groupBy(_.getLong(0))
          .map { case (_, rows) => rows.head.getAs[Array[Byte]]("state") }
          .toSeq.toDF("state")
        val merged = latest.agg(CountMinUnionAgg(col("state")).as("s"))
        val batchState = ev.agg(CountMinAgg(col("user_id")).as("s"))
        def estimates(stateDf: org.apache.spark.sql.DataFrame) =
          ev.distinct().crossJoin(broadcast(stateDf))
            .select(col("user_id"),
              CountMinEstimate(col("s"), xxhash64(col("user_id"))).as("est"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val se = estimates(merged)
        val be = estimates(batchState)
        assert(se.nonEmpty && se == be,
          s"streamed-union estimates diverge: ${se.toSeq.diff(be.toSeq).take(5)}")
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
