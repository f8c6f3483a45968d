package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("decode emits the typed feature schema over the sampled corpus") {
    val out = Registry.byName("mm_decode").run(spark, sf)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_bytes", "kind", "width", "height",
        "n_samples", "sample_rate", "f0", "feature_sum"))
    val expected = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0).count()
    assert(out.count() == expected && expected > 0)
  }

  test("corrupt payloads with valid magic degrade to opaque, not task failure") {
    import spark.implicits._
    val goodPng = Multimodal.syntheticPng(9L, 8, 8)
    val truncatedPng = goodPng.take(30) // PNG magic intact, body gone
    val goodWav = Multimodal.syntheticWav(9L, 500)
    val brokenWav = goodWav.take(20) // RIFF/WAVE magic intact, fmt gone
    val df = Seq((1L, truncatedPng), (2L, brokenWav), (3L, goodPng))
      .toDF("doc_id", "media")
    val rows = Multimodal.decode(spark, df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("kind")).toMap
    assert(rows(1L) == "opaque" && rows(2L) == "opaque" && rows(3L) == "image")
  }

  test("PNG payloads decode to their real generated dimensions and stats") {
    import spark.implicits._
    val media = Multimodal.synthesize(
      spark, Tables.documents(spark, sf), "doc_id", "text")
    val rows = Multimodal.decode(spark, media)
      .filter(col("doc_id") % 2 === 0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("kind") == "image")
      // javax.imageio really parsed the PNG: dimensions are the
      // generator's, not derived from the bytes by any shortcut
      assert(r.getAs[Int]("width") == 16 + (id % 32).toInt)
      assert(r.getAs[Int]("height") == 12 + (id % 24).toInt)
      val f = r.getSeq[Double](r.fieldIndex("feature"))
      assert(f.length == 8)
      // channel means of RGB noise sit well inside (0,1); lum std > 0
      assert(f(0) > 0.2 && f(0) < 0.8, s"meanR=${f(0)}")
      assert(f(4) > 0.0, "luminance std must be positive for noise")
      assert(math.abs(f(7) - (16 + (id % 32).toInt).toDouble / (12 + (id % 24).toInt)) < 1e-9)
    }
  }

  test("WAV payloads decode to their real frame counts and sine statistics") {
    val media = Multimodal.synthesize(
      spark, Tables.documents(spark, sf), "doc_id", "text")
    val rows = Multimodal.decode(spark, media)
      .filter(col("doc_id") % 2 === 1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("kind") == "audio")
      // javax.sound.sampled really parsed the RIFF header
      assert(r.getAs[Int]("n_samples") == 2000 + (id % 6000).toInt)
      assert(r.getAs[Int]("sample_rate") == 8000)
      val f = r.getSeq[Double](r.fieldIndex("feature"))
      // a 12000/32768-amplitude sine has RMS ≈ 0.366 * 0.707 ≈ 0.259
      assert(f(0) > 0.15 && f(0) < 0.3, s"rms=${f(0)}")
      assert(f(1) > 0.0, "sine must cross zero")
      assert(f(2) > 0.3 && f(2) <= 12000.0 / 32768.0 + 1e-6, s"peak=${f(2)}")
    }
  }

  test("decode matches an independent single-payload reference") {
    // one PNG decoded outside Spark with the same JDK codec must agree
    // with the pipeline's row for the same payload
    val png = Multimodal.syntheticPng(42L, 20, 10)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 20 && img.getHeight == 10)
    import spark.implicits._
    val df = Seq(Multimodal.MediaRow(7L, png)).toDS().toDF()
    val row = Multimodal.decode(spark, df).collect().head
    assert(row.getAs[Int]("width") == 20 && row.getAs[Int]("height") == 10)
    var sum = 0L
    for (y <- 0 until 10; x <- 0 until 20) sum += (img.getRGB(x, y) >> 16) & 0xFF
    val meanR = sum.toDouble / 200 / 255.0
    assert(math.abs(row.getSeq[Double](row.fieldIndex("feature"))(0) - meanR) < 1e-12)
  }

  test("decode is deterministic and degrades unknown containers to opaque") {
    val a = Registry.byName("mm_decode").run(spark, sf).collect().toSeq
    val b = Registry.byName("mm_decode").run(spark, sf).collect().toSeq
    assert(a == b)
    import spark.implicits._
    val junk = Seq(Multimodal.MediaRow(1L, Array[Byte](1, 2, 3, 4))).toDS().toDF()
    val row = Multimodal.decode(spark, junk).collect().head
    assert(row.getAs[String]("kind") == "opaque")
    assert(row.getAs[Int]("n_bytes") == 4)
  }

  test("decodeBatch runs per-partition (batch shape, not per-row driver calls)") {
    import spark.implicits._
    val df = Seq(
      (2L, Multimodal.syntheticPng(1L, 8, 8)),
      (3L, Multimodal.syntheticWav(2L, 1000))).toDF("doc_id", "media")
    val out = Multimodal.decode(spark, df).collect()
    assert(out.map(_.getAs[String]("kind")).toSet == Set("image", "audio"))
  }

  test("binaryFile ingest: real files on disk decode identically to in-memory payloads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    val payloads = Map(
      10L -> Multimodal.syntheticPng(3L, 14, 9),
      11L -> Multimodal.syntheticWav(4L, 1500),
      12L -> Array[Byte](9, 9, 9)) // opaque
    payloads.foreach { case (id, bytes) =>
      java.nio.file.Files.write(dir.resolve(s"$id.bin"), bytes)
    }
    val out = Multimodal.decode(spark, Multimodal.readMediaDir(spark, dir.toString))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("kind"), r.getAs[Int]("width"), r.getAs[Int]("n_samples")))
      .toMap
    assert(out == Map(
      10L -> ("image", 14, 0),
      11L -> ("audio", 0, 1500),
      12L -> ("opaque", 0, 0)))
  }

  test("frame-sampling takes every step-th frame, resized to the target dims") {
    import spark.implicits._
    // 7 frames of 20×10 → sampled indices 0,2,4,6; resized to 8×6
    val video = Multimodal.syntheticVideo(99L, nFrames = 7, w = 20, h = 10)
    val df = Seq(Multimodal.MediaRow(5L, video)).toDS().toDF()
    val out = Multimodal.frameSample(spark, df, step = 2, w = 8, h = 6)
      .collect().sortBy(_.getAs[Int]("frame_idx"))
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2, 4, 6))
    out.foreach { r =>
      assert(r.getAs[Int]("width") == 8 && r.getAs[Int]("height") == 6)
      val lum = r.getAs[Double]("mean_lum")
      assert(lum > 0.0 && lum < 1.0) // real pixels, not a constant fill
    }
    // resize really resampled: the resized mean tracks the source frame's
    // own mean (nearest-neighbor of uniform noise), so frames differ
    assert(out.map(_.getAs[Double]("mean_lum")).distinct.length == out.length)
  }

  test("corrupt video containers degrade to no frames, never a dead task") {
    import spark.implicits._
    val good = Multimodal.syntheticVideo(1L, nFrames = 3, w = 10, h = 8)
    val truncated = good.take(good.length / 2)          // EOF mid-frame
    val badMagic = Array[Byte]('G', 'F', 'T', 'V')      // header only
    val df = Seq(
      Multimodal.MediaRow(1L, good),
      Multimodal.MediaRow(2L, truncated),
      Multimodal.MediaRow(3L, badMagic),
      Multimodal.MediaRow(4L, Array[Byte](1, 2, 3))     // not a container
    ).toDS().toDF()
    val out = Multimodal.frameSample(spark, df, step = 1, w = 4, h = 4).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length).toMap
    assert(byDoc.getOrElse(1L, 0) == 3, s"good video must fully decode: $byDoc")
    // truncated container: frames before the cut may decode; no crash
    assert(!byDoc.contains(3L) && !byDoc.contains(4L))
  }

  test("truncated payload under a SKIPPED frame terminates (no skipBytes spin)") {
    import spark.implicits._
    // Hand-built container: frame 0 intact, frame 1 declares 1000 bytes
    // but the payload is cut 10 bytes in. With step=2 frame 1 takes the
    // skipBytes path — before the EOF guard this spun forever (skipBytes
    // returns 0 at EOF); now it must raise EOFException and degrade the
    // row to zero frames.
    val f0 = Multimodal.syntheticPng(7L, 10, 8)
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeBytes("GFTV"); dos.writeInt(2)
    dos.writeInt(f0.length); dos.write(f0)
    dos.writeInt(1000); dos.write(Array.fill[Byte](10)(1))
    dos.flush()
    val truncatedSkip = out.toByteArray
    val df = Seq(
      Multimodal.MediaRow(1L, truncatedSkip),
      Multimodal.MediaRow(2L, Multimodal.syntheticVideo(2L, nFrames = 3, w = 10, h = 8))
    ).toDS().toDF()
    val rows = Multimodal.frameSample(spark, df, step = 2, w = 4, h = 4).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length).toMap
    // corrupt container contributes nothing — even its intact frame 0
    assert(!byDoc.contains(1L), s"corrupt container must yield no frames: $byDoc")
    assert(byDoc.getOrElse(2L, 0) == 2, s"good video sampled 0,2: $byDoc")
    // direct library callers see the documented EOFException
    intercept[java.io.EOFException] {
      Multimodal.videoFrames(truncatedSkip, keep = _ % 2 == 0).toList
    }
  }

  test("mm_frames query: counts match generator params, deterministic") {
    val a = Registry.byName("mm_frames").run(spark, sf).collect().toSeq
    val b = Registry.byName("mm_frames").run(spark, sf).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // per doc: nFrames = 4 + id%5 sampled at step 2 → ceil(nFrames/2)
    val perDoc = a.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.size).toMap
    perDoc.foreach { case (id, n) =>
      val nFrames = 4 + (id % 5).toInt
      assert(n == (nFrames + 1) / 2, s"doc $id: $n frames for nFrames=$nFrames")
    }
    assert(a.forall(r => r.getAs[Int]("width") == 8 && r.getAs[Int]("height") == 6))
  }

  test("aHash: identical images equal, one-pixel edits near, other seeds far") {
    import graft.pipeline.Multimodal
    val png = Multimodal.syntheticPng(7L, 24, 18)
    val same = Multimodal.syntheticPng(7L, 24, 18)
    val tweaked = Multimodal.tweakPixel(png, 3, 5)
    val other = Multimodal.syntheticPng(8L, 24, 18)
    val Seq(h1, h2, ht, ho) = Seq(png, same, tweaked, other).map(Multimodal.aHash(_).get)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h1 == h2, "same pixels must hash equal")
    assert(hamming(h1, ht) <= 8, s"one-pixel edit drifted ${hamming(h1, ht)} bits")
    assert(hamming(h1, ho) > 8, s"unrelated image too close: ${hamming(h1, ho)} bits")
    assert(Multimodal.aHash(Array[Byte](1, 2, 3)).isEmpty, "undecodable → None")
  }

  test("audio fingerprint: identical equal, dropouts cluster, other audio far") {
    import graft.pipeline.Multimodal
    val wav = Multimodal.syntheticWav(11L, 4000)
    val same = Multimodal.syntheticWav(11L, 4000)
    val dropped = Multimodal.tweakWavSamples(wav, 600, 100)
    val other = Multimodal.syntheticWav(12L, 4000)
    val Seq(h1, h2, hd, ho) =
      Seq(wav, same, dropped, other).map(Multimodal.audioFingerprint(_).get)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h1 == h2, "same samples must fingerprint equal")
    // a 100-sample dropout in 4000 samples touches at most 3 of 64 windows
    assert(hamming(h1, hd) <= 3, s"dropout drifted ${hamming(h1, hd)} bits")
    assert(hamming(h1, ho) > 8, s"unrelated audio too close: ${hamming(h1, ho)} bits")
    assert(Multimodal.audioFingerprint(Array[Byte](9, 9)).isEmpty, "undecodable → None")
    // the dropout really zeroed the samples (RIFF walk found the payload)
    assert(!dropped.sameElements(wav))
  }

  test("video frame-hash sets: identical match fully, edits drop at most the edited frame") {
    import graft.pipeline.Multimodal
    val frames = (0 until 6).map(i => Multimodal.syntheticPng(100L + i * 7, 16, 12))
    val vA = Multimodal.videoFromFrames(frames)
    val vB = Multimodal.videoFromFrames(
      frames.updated(2, Multimodal.tweakPixel(frames(2), 1, 1)))
    val vC = Multimodal.videoFromFrames(
      (0 until 6).map(i => Multimodal.syntheticPng(900L + i * 7, 16, 12)))
    def hashes(v: Array[Byte]) = Multimodal
      .videoFrames(v, keep = _ % 2 == 0)
      .flatMap { case (_, png) => Multimodal.aHash(png) }.toSet
    val (ha, hb, hc) = (hashes(vA), hashes(vB), hashes(vC))
    assert(ha.size == 3 && ha == hashes(vA))
    assert((ha intersect hb).size >= 2, "one edited frame must not break the other samples")
    assert((ha intersect hc).isEmpty, "unrelated videos must share no frames")
  }
}
