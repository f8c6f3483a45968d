package graft.pipeline

import graft.{Capability, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/featurized in partition-sized batches.
  *
  * Both the Spark-side mechanics AND the codecs are real: payloads are
  * actual PNG images (decoded with `javax.imageio` — libpng-equivalent,
  * bundled with the JDK) and actual RIFF/WAVE PCM audio (decoded with
  * `javax.sound.sampled`). [[Multimodal.decodeBatch]] sniffs the container
  * magic, runs the matching decoder over a whole partition's iterator (the
  * batch shape a vectorized decoder needs: amortized codec init,
  * sequential IO — the Scala analogue of `mapInPandas`), and emits typed
  * metadata plus an 8-wide feature vector of real pixel / sample
  * statistics. Payloads that match no known container degrade to
  * `kind = "opaque"` with byte-level features instead of failing the
  * batch. No shuffle anywhere: generate → decode → featurize is a chain
  * of narrow per-partition transforms.
  */
object Multimodal {

  // ImageIO defaults to a disk-backed stream cache: every encode/decode
  // creates and deletes a temp file, which dominates small-image cost.
  // These payloads are in-memory byte arrays — cache in heap.
  ImageIO.setUseCache(false)

  /** Input: one media payload with its id. */
  final case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Output: typed metadata + a fixed-width feature vector.
    * width/height are image pixels (0 for audio/opaque); n_samples /
    * sample_rate are audio frames (0 for image/opaque). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      kind: String,
      width: Int,
      height: Int,
      n_samples: Int,
      sample_rate: Int,
      feature: Array[Double])

  // ---- deterministic synthetic payload generators (the test corpus) ----

  private def xorshift(s: Long): Long = {
    var x = if (s == 0L) 0x9E3779B97F4A7C15L else s
    x ^= x << 13; x ^= x >>> 7; x ^= x << 17
    x
  }

  /** A real PNG: deterministic RGB noise pattern seeded by `seed`. */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var s = seed
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        s = xorshift(s)
        img.setRGB(x, y, (s & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A real RIFF/WAVE file: 16-bit PCM mono sine wave whose frequency and
    * length derive from `seed`. */
  def syntheticWav(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val freq = 100.0 + math.abs(xorshift(seed) % 3000L).toDouble // 100..3100 Hz
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (math.sin(2.0 * math.Pi * freq * i / sampleRate) * 12000.0).toInt
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val dataLen = pcm.length
    val out = new ByteArrayOutputStream(44 + dataLen)
    def le32(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF); out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF) }
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("RIFF".getBytes); le32(36 + dataLen); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le32(16); le16(1) /* PCM */ ; le16(1) /* mono */
    le32(sampleRate); le32(sampleRate * 2); le16(2); le16(16)
    out.write("data".getBytes); le32(dataLen)
    out.write(pcm)
    out.toByteArray
  }

  // ---- real decoders ----

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  private def isWav(b: Array[Byte]): Boolean =
    b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def decodeImage(r: MediaRow): MediaFeatures = {
    val img = ImageIO.read(new ByteArrayInputStream(r.media))
    if (img == null) return opaque(r) // matched magic but undecodable
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L; var sLum = 0L; var sLum2 = 0L
    var minLum = 255; var maxLum = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val cr = (rgb >> 16) & 0xFF; val cg = (rgb >> 8) & 0xFF; val cb = rgb & 0xFF
        sr += cr; sg += cg; sb += cb
        val lum = (cr * 299 + cg * 587 + cb * 114) / 1000
        sLum += lum; sLum2 += lum.toLong * lum
        if (lum < minLum) minLum = lum
        if (lum > maxLum) maxLum = lum
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    val meanLum = sLum / n
    MediaFeatures(r.doc_id, r.media.length, "image", w, h, 0, 0,
      Array(
        sr / n / 255.0, sg / n / 255.0, sb / n / 255.0,
        meanLum / 255.0,
        math.sqrt(math.max(0.0, sLum2 / n - meanLum * meanLum)) / 255.0,
        minLum / 255.0, maxLum / 255.0,
        w.toDouble / h.toDouble))
  }

  private def decodeAudio(r: MediaRow): MediaFeatures = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.media))
    try {
      val fmt = in.getFormat
      // the sample loop below reads 16-bit little-endian signed mono PCM;
      // any other layout would produce silently-wrong statistics, so
      // degrade it to opaque instead of mis-decoding
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 || fmt.isBigEndian)
        return opaque(r)
      val nFrames = in.getFrameLength.toInt
      val bytes = in.readAllBytes()
      val n = bytes.length / 2
      var sum2 = 0.0; var zc = 0; var prevNeg = false
      var peak = 0
      var i = 0
      while (i < n) {
        val v = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toShort.toInt
        sum2 += v.toDouble * v
        val neg = v < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        if (math.abs(v) > peak) peak = math.abs(v)
        i += 1
      }
      val rms = if (n == 0) 0.0 else math.sqrt(sum2 / n) / 32768.0
      val sr = fmt.getSampleRate.toInt
      MediaFeatures(r.doc_id, r.media.length, "audio", 0, 0, nFrames, sr,
        Array(
          rms,
          if (n > 1) zc.toDouble / (n - 1) else 0.0,
          peak / 32768.0,
          n.toDouble / sr, // duration seconds
          fmt.getChannels.toDouble,
          fmt.getSampleSizeInBits.toDouble / 32.0,
          sr / 48000.0,
          1.0))
    } finally in.close()
  }

  /** Unknown container: byte-level stats instead of a decode failure. */
  private def opaque(r: MediaRow): MediaFeatures = {
    var sum = 0L; var sum2 = 0L
    var i = 0
    while (i < r.media.length) {
      val v = r.media(i) & 0xFF
      sum += v; sum2 += v.toLong * v
      i += 1
    }
    val n = math.max(1, r.media.length).toDouble
    val mean = sum / n
    MediaFeatures(r.doc_id, r.media.length, "opaque", 0, 0, 0, 0,
      Array(mean / 255.0,
        math.sqrt(math.max(0.0, sum2 / n - mean * mean)) / 255.0,
        0, 0, 0, 0, 0, 0))
  }

  /** Real batch decoder: container sniff → javax.imageio (PNG et al) or
    * javax.sound.sampled (WAV) → typed metadata + feature vector. Operates
    * on a whole partition's iterator. Corrupt payloads — including ones
    * whose magic matches but whose body fails to decode — degrade to
    * `opaque` rather than failing the batch: one bad file must not kill a
    * 100 TB ingest task. */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      try {
        if (isPng(r.media)) decodeImage(r)
        else if (isWav(r.media)) decodeAudio(r)
        else opaque(r)
      } catch {
        case scala.util.control.NonFatal(_) => opaque(r)
      }
    }

  /** Binary column + metadata → decoded features, partition-parallel. */
  def decode(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(decodeBatch).toDF()
  }

  /** Ingest real media FILES through Spark's `binaryFile` source — the
    * production entry point the synthetic generators stand in for: each
    * file becomes one (doc_id, media) row (id parsed from the
    * `<id>.bin` filename), split-planned and distributed by the source
    * like any other scan, ready for [[decode]] / [[frameSample]].
    * `binaryFile` never splits a file across tasks, which is exactly
    * right for opaque codec payloads. */
  def readMediaDir(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("content").as("media"))
      // degrade, don't fail: a stray non-media file (README, tmp file, id
      // out of Long range) yields a null id, which would kill the job at
      // the non-nullable MediaRow encoder — drop it here instead
      .filter(col("doc_id").isNotNull)

  // ---- video (multi-frame) container + resize / frame-sample ----

  /** One decoded, optionally-resized video frame. */
  final case class FrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      mean_lum: Double)

  /** Deterministic multi-frame container — the "video" stand-in: real
    * PNG frames, length-prefixed behind a 4-byte magic + frame count.
    * (No video codec ships with the JDK; the container is ours, the
    * frames are genuine PNGs, so frame extraction, per-frame decode and
    * resize all exercise real codec work.) */
  def syntheticVideo(seed: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeBytes("GFTV"); dos.writeInt(nFrames)
    var i = 0
    while (i < nFrames) {
      val png = syntheticPng(seed + i, w, h)
      dos.writeInt(png.length); dos.write(png)
      i += 1
    }
    dos.flush()
    out.toByteArray
  }

  private def isVideo(b: Array[Byte]): Boolean =
    b.length > 8 && b(0) == 'G' && b(1) == 'F' && b(2) == 'T' && b(3) == 'V'

  /** The container's frames as (index, png bytes) — no decode yet.
    * `keep` skips the payload COPY of unwanted frames (skipBytes, no
    * allocation), so sampling every k-th frame reads headers only for the
    * rest. Length prefixes are untrusted: a corrupt length (negative, or
    * running past the remaining payload) raises `EOFException` mid-
    * iteration instead of attempting an unbounded allocation or an
    * unbounded skip loop — OutOfMemoryError is fatal and a skipBytes
    * spin at EOF is a permanent task wedge, and neither would reach the
    * NonFatal degrade catch downstream. Direct callers must expect
    * `EOFException` from a corrupt container; [[frameSampleBatch]] maps
    * it to zero frames for that row (already-yielded frames of the same
    * container are discarded with it — a corrupt container contributes
    * nothing, by contract). */
  def videoFrames(
      media: Array[Byte],
      keep: Int => Boolean = _ => true): Iterator[(Int, Array[Byte])] = {
    if (!isVideo(media)) return Iterator.empty
    val in = new java.io.DataInputStream(new ByteArrayInputStream(media))
    in.skipBytes(4)
    val n = in.readInt()
    if (n < 0) return Iterator.empty
    (0 until n).iterator.flatMap { i =>
      val len = in.readInt()
      // `available` is exact on ByteArrayInputStream: a declared length
      // past the remaining payload is a truncated/corrupt container, and
      // catching it here keeps both branches below from running off the
      // end (readFully would throw anyway; skipBytes would return 0
      // forever and spin).
      if (len < 0 || len > in.available()) throw new java.io.EOFException(
        s"frame $i declares $len bytes with ${in.available()} remaining " +
          s"in a ${media.length}-byte container")
      if (keep(i)) {
        val buf = new Array[Byte](len)
        in.readFully(buf)
        Some((i, buf))
      } else {
        var toSkip = len
        while (toSkip > 0) {
          val s = in.skipBytes(toSkip)
          // a short skip means EOF on this stream — bail, never spin
          if (s <= 0) throw new java.io.EOFException(
            s"frame $i truncated: ${toSkip} of $len skip bytes missing")
          toSkip -= s
        }
        None
      }
    }
  }

  /** Real image resize: decode → `Graphics2D.drawImage` with
    * nearest-neighbor interpolation (deterministic across runs) →
    * re-encode PNG. Returns the input unchanged if it isn't a decodable
    * image — same degrade-don't-fail contract as [[decodeBatch]]. */
  def resizePng(png: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = ImageIO.read(new ByteArrayInputStream(png))
    if (src == null) return png
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(dst, "png", out)
    out.toByteArray
  }

  /** Frame-sample + resize + per-frame decode, batch-shaped like
    * [[decodeBatch]]: every `step`-th frame of each video payload is
    * resized to `w`×`h` and featurized (mean luminance of the REAL
    * resized pixels). One input row fans out to its sampled frames — a
    * narrow flatMap, no shuffle; at 100 TB the fan-out stays inside each
    * ingest partition. */
  def frameSampleBatch(
      rows: Iterator[MediaRow], step: Int, w: Int, h: Int): Iterator[FrameFeatures] = {
    // caller misuse must fail loudly — the per-row degrade catches below
    // would otherwise convert it into silently empty output
    require(step >= 1, s"step must be >= 1, got $step")
    require(w >= 1 && h >= 1, s"target dims must be >= 1, got ${w}x$h")
    rows.flatMap { r =>
      // materialize inside the try: the container iterator reads lazily,
      // so a truncated payload throws during iteration, not construction.
      // Degrade contract (same as decodeBatch): a corrupt frame is
      // skipped, a corrupt container yields no frames — never a dead task.
      try {
        videoFrames(r.media, keep = _ % step == 0)
          .flatMap { case (i, png) =>
            try {
              val resized = resizePng(png, w, h)
              val img = ImageIO.read(new ByteArrayInputStream(resized))
              if (img == null) None
              else {
                var sLum = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val rgb = img.getRGB(x, y)
                    sLum += (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
                      (rgb & 0xFF) * 114) / 1000
                    x += 1
                  }
                  y += 1
                }
                Some(FrameFeatures(r.doc_id, i, img.getWidth, img.getHeight,
                  sLum.toDouble / (img.getWidth * img.getHeight) / 255.0))
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          }
          .toList
      } catch { case scala.util.control.NonFatal(_) => Nil }
    }
  }

  /** Binary video column → sampled, resized, featurized frames. */
  def frameSample(
      spark: SparkSession, media: DataFrame,
      step: Int = 2, w: Int = 8, h: Int = 6): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(frameSampleBatch(_, step, w, h)).toDF()
  }

  /** Deterministic media corpus over any (id, text) frame: even ids get a
    * PNG (dims derived from the id, pixels seeded by the text hash), odd
    * ids a WAV (length/frequency likewise). Generation is a narrow
    * per-partition transform — at 100 TB this stage is the ingest that
    * reads real media files alongside the metadata table. */
  // ---- perceptual image hashing (average hash) -------------------------

  /** 64-bit average-hash (aHash — the public pHash family's simplest
    * member): downscale to 8×8 (nearest-neighbor, same policy as
    * [[resizePng]]), integer luminance per cell, bit i set iff cell i is
    * at or above the image mean (`lum·64 >= Σlum` — pure integer math, no
    * float threshold). Visually identical images hash equal; small edits
    * flip few bits, so near-duplicate detection is a small-Hamming search
    * — the image-space sibling of SimHash over text. None for undecodable
    * payloads. */
  def aHash(png: Array[Byte]): Option[Long] = {
    // ImageIO.read throws (not just returns null) on a truncated payload
    // with a recognized magic — both shapes are "undecodable" here, same
    // guard as audioFingerprint
    val src = try ImageIO.read(new ByteArrayInputStream(png))
    catch { case scala.util.control.NonFatal(_) => return None }
    if (src == null) return None
    val dst = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(src, 0, 0, 8, 8, null)
    } finally g.dispose()
    val lum = new Array[Long](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      val rgb = dst.getRGB(i % 8, i / 8)
      lum(i) = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
        (rgb & 0xFF) * 114) / 1000
      sum += lum(i)
      i += 1
    }
    var bits = 0L
    i = 0
    while (i < 64) {
      if (lum(i) * 64 >= sum) bits |= (1L << i)
      i += 1
    }
    Some(bits)
  }

  /** One-pixel edit (XOR of the RGB channels) — the spec/gate's planted
    * "near duplicate": decode, flip, re-encode. */
  def tweakPixel(png: Array[Byte], x: Int, y: Int): Array[Byte] = {
    val img = try ImageIO.read(new ByteArrayInputStream(png))
    catch { case scala.util.control.NonFatal(_) => return png }
    if (img == null) return png
    img.setRGB(x, y, img.getRGB(x, y) ^ 0xFFFFFF)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** (doc_id, phash) for every decodable image payload — narrow
    * per-partition decode, one long per image on the wire. */
  def imageHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions(_.flatMap(r => aHash(r.media).map(h => (r.doc_id, h))))
      .toDF("doc_id", "phash")
  }

  /** Banded small-Hamming pair search over a (doc_id, hash int64) frame —
    * shared by the image and audio fingerprint paths, same shape as the
    * text SimHash gate. Candidates come from a (band, value) equi-join
    * over 4 disjoint 16-bit bands; exact popcount verifies candidates
    * only — never an all-pairs scan. Pigeonhole GUARANTEES recovery at
    * Hamming ≤ 3 (each flipped bit ruins at most one band); above that,
    * recall is probabilistic exactly as in LSH — real edits flip
    * clustered probes, so in practice small-Hamming pairs still agree on
    * a band, and the planted gates verify recovery deterministically on
    * the fixed corpus. */
  private def bandedHammingPairs(
      hashes: DataFrame, hashCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3 * 16,
      s"4x16-bit banding guarantees recall only to Hamming 48, got $maxHamming")
    val bands = hashes.select(col("doc_id"), col(hashCol),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col(hashCol), b * 16).bitwiseAND(lit(0xFFFFL)).as("v"))
      }: _*)).as("bv"))
      .select(col("doc_id"), col(hashCol), col("bv.band").as("band"), col("bv.v").as("v"))
    val a = bands.select(col("doc_id").as("da"), col(hashCol).as("ha"),
      col("band"), col("v"))
    val b = bands.select(col("doc_id").as("db"), col(hashCol).as("hb"),
      col("band"), col("v"))
    a.join(b, Seq("band", "v"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  def imageNearDupPairs(
      spark: SparkSession, media: DataFrame, maxHamming: Int = 8): DataFrame =
    bandedHammingPairs(imageHashes(spark, media), "phash", maxHamming)

  // ---- audio fingerprinting --------------------------------------------

  /** 64-bit audio dropout fingerprint: the PCM stream splits into 64
    * equal windows and bit i is the PARITY of window i's L1 energy
    * (Σ|sample| & 1). Identical audio fingerprints equal; a localized
    * edit (dropout, clipped span, spliced region) flips only the bits of
    * the windows it touches — clustered bits, which is exactly what the
    * banded search recovers — while any two different recordings disagree
    * on ~half the parities. Parity of exact integer sums, not a
    * float threshold: steady signals (sine fixtures, room tone) have FLAT
    * energy profiles that make mean-threshold bases degenerate, and sign
    * probes correlate between near-frequency tones; exact-sum parity is
    * content-chaotic for any difference yet perfectly local for edits.
    * None for undecodable or sub-64-sample payloads. */
  def audioFingerprint(wav: Array[Byte]): Option[Long] = {
    val in = try AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    catch { case scala.util.control.NonFatal(_) => return None }
    try {
      val fmt = in.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 || fmt.isBigEndian)
        return None
      val bytes = in.readAllBytes()
      val n = bytes.length / 2
      if (n < 64) return None
      var bits = 0L
      var w = 0
      while (w < 64) {
        val from = (n.toLong * w / 64).toInt
        val until = (n.toLong * (w + 1) / 64).toInt
        var sum = 0L
        var p = from
        while (p < until) {
          val v = ((bytes(2 * p + 1) << 8) | (bytes(2 * p) & 0xFF)).toShort.toInt
          sum += math.abs(v)
          p += 1
        }
        if ((sum & 1L) == 1L) bits |= (1L << w)
        w += 1
      }
      Some(bits)
    } finally in.close()
  }

  /** Zero out `count` PCM samples starting at `fromSample` — the planted
    * "dropout" edit. Walks the RIFF chunks to the data payload, so it
    * works on any canonical PCM WAV, not just [[syntheticWav]]'s. */
  def tweakWavSamples(wav: Array[Byte], fromSample: Int, count: Int): Array[Byte] = {
    val out = wav.clone()
    var off = 12 // past RIFF header
    while (off + 8 <= out.length) {
      val id = new String(out.slice(off, off + 4), "US-ASCII")
      val size = (out(off + 4) & 0xFF) | ((out(off + 5) & 0xFF) << 8) |
        ((out(off + 6) & 0xFF) << 16) | ((out(off + 7) & 0xFF) << 24)
      if (id == "data") {
        var i = 0
        while (i < count && off + 8 + 2 * (fromSample + i) + 1 < out.length) {
          out(off + 8 + 2 * (fromSample + i)) = 0
          out(off + 8 + 2 * (fromSample + i) + 1) = 0
          i += 1
        }
        return out
      }
      off += 8 + size + (size & 1)
    }
    out
  }

  /** Build a GFTV container from explicit frame payloads — the
    * construction twin of [[syntheticVideo]] for planting edited
    * variants (replace one frame, keep the rest). */
  def videoFromFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeBytes("GFTV"); dos.writeInt(frames.length)
    frames.foreach { png => dos.writeInt(png.length); dos.write(png) }
    dos.flush()
    out.toByteArray
  }

  /** DISTINCT sampled-frame aHashes per video — the video fingerprint: a
    * set of 64-bit image hashes, one per every `step`-th frame. Videos
    * sharing ≥ m frame hashes are near-duplicates (re-encodes, trims and
    * single-frame edits keep most sampled frames identical), and the
    * frame hash itself is the join key — no extra banding needed. Narrow
    * per-partition decode; only (doc_id, hash) longs leave the task. */
  def videoFrameHashes(spark: SparkSession, media: DataFrame, step: Int = 2): DataFrame = {
    import spark.implicits._
    require(step >= 1, s"step must be >= 1, got $step")
    media.as[MediaRow]
      .mapPartitions(_.flatMap { r =>
        videoFrames(r.media, keep = _ % step == 0)
          .flatMap { case (_, png) => aHash(png).map(h => (r.doc_id, h)) }
          .toList
      })
      .toDF("doc_id", "fhash").distinct()
  }

  /** Video near-duplicate pairs: equi-join on sampled-frame hashes, count
    * distinct shared frames, keep pairs sharing ≥ `minShared`. At corpus
    * scale a boilerplate frame (black/title card) is a hot key — df-cap
    * the hash side first exactly as the shingle pipelines do. */
  def videoNearDupPairs(
      spark: SparkSession, media: DataFrame,
      step: Int = 2, minShared: Int = 2): DataFrame = {
    val h = videoFrameHashes(spark, media, step)
    val a = h.select(col("doc_id").as("da"), col("fhash"))
    val b = h.select(col("doc_id").as("db"), col("fhash"))
    a.join(b, "fhash")
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** (doc_id, afp) for every decodable audio payload. */
  def audioFingerprints(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions(_.flatMap(r => audioFingerprint(r.media).map(h => (r.doc_id, h))))
      .toDF("doc_id", "afp")
  }

  /** Audio near-duplicate pairs by the same banded Hamming search as
    * [[imageNearDupPairs]]. */
  def audioNearDupPairs(
      spark: SparkSession, media: DataFrame, maxHamming: Int = 8): DataFrame =
    bandedHammingPairs(audioFingerprints(spark, media), "afp", maxHamming)

  def synthesize(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"), xxhash64(col(textCol)).as("seed"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, seed) =>
        val media =
          if (id % 2 == 0) syntheticPng(seed, 16 + (id % 32).toInt, 12 + (id % 24).toInt)
          else syntheticWav(seed, 2000 + (id % 6000).toInt)
        MediaRow(id, media)
      })
      .toDF()
  }
}

object MultimodalQueries {

  /** Real decode pipeline over synthesized-but-real containers: PNG and
    * WAV payloads generated per document, decoded by the JDK's actual
    * image/audio codecs, featurized to pixel/sample statistics. Feature
    * values are codec-derived → no SQL oracle; MultimodalSpec asserts the
    * decoded dimensions/frames equal the generator's parameters and the
    * statistics match independently computed values. */
  private def features(s: SparkSession, d: String): DataFrame = {
    // deterministic 1-in-5 sample (ids ≡ 0 mod 5 alternate parity, so
    // both codecs appear): decode cost is per-payload codec work (no plan
    // to optimize away), so the gate needs breadth across both codecs,
    // not the full corpus volume
    val docs = graft.Tables.spread( // codec work per row: guide §2.5 spread
      Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text")), col("doc_id"))
    val media = Multimodal.synthesize(s, docs, "doc_id", "text")
    Multimodal.decode(s, media)
      .select(col("doc_id"), col("n_bytes"), col("kind"),
        col("width"), col("height"), col("n_samples"), col("sample_rate"),
        // feature vector surfaced as scalars — the driver's comparator
        // sorts rows in pandas, which cannot order array-typed cells
        // (MultimodalSpec asserts the full vector)
        round(element_at(col("feature"), 1), 6).as("f0"),
        round(aggregate(col("feature"), lit(0.0), (a, x) => a + x), 6)
          .as("feature_sum"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic video corpus: one multi-frame container per selected
    * document (frame count and source dims derived from the id, pixels
    * from the text hash). */
  def synthesizeVideos(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"), xxhash64(col("text")).as("seed"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, seed) =>
        Multimodal.MediaRow(id, Multimodal.syntheticVideo(
          seed, 4 + (id % 5).toInt, 12 + (id % 8).toInt, 10 + (id % 6).toInt))
      })
      .toDF()
  }

  /** Frame-sampling + resize over the synthetic video corpus: every 2nd
    * frame of each container, resized to 8×6 through a real decode →
    * Graphics2D → re-encode round-trip, with the mean luminance of the
    * RESIZED pixels as the per-frame feature. Codec-derived values → no
    * SQL oracle; MultimodalSpec asserts frame counts/indices against the
    * generator parameters, the resized dimensions, and determinism. */
  private def frames(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.spread( // codec work per row: guide §2.5 spread
      Tables.documents(s, d).filter(col("doc_id") % 7 === 1)
        .select(col("doc_id"), col("text")), col("doc_id"))
    Multimodal.frameSample(s, synthesizeVideos(s, docs), step = 2, w = 8, h = 6)
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        round(col("mean_lum"), 6).as("mean_lum"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Decode METADATA gate: the generator's dims/sample counts/rates are
    * pure functions of doc_id ([[Multimodal.synthesize]]: even ids → PNG
    * 16+id%32 × 12+id%24, odd ids → WAV of 2000+id%6000 frames at 8 kHz),
    * so the REAL decode path — synthesize → actual PNG/WAV encode → JDK
    * codec parse → typed metadata — is driver-gated end-to-end against a
    * DuckDB oracle that predicts the metadata independently from the
    * documents table. Pixel/sample STATISTICS stay codec-derived and
    * rows-only (mm_decode + MultimodalSpec). */
  private def decodeMeta(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.spread( // codec work per row: guide §2.5 spread
      Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text")), col("doc_id"))
    val media = Multimodal.synthesize(s, docs, "doc_id", "text")
    Multimodal.decode(s, media)
      .select(col("doc_id"), col("kind"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_samples").cast("long").as("n_samples"),
        col("sample_rate").cast("long").as("sample_rate"))
      .orderBy(col("doc_id"))
  }

  private val decodeMetaSql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
      |  CASE WHEN doc_id % 2 = 0 THEN 16 + doc_id % 32 ELSE 0 END AS width,
      |  CASE WHEN doc_id % 2 = 0 THEN 12 + doc_id % 24 ELSE 0 END AS height,
      |  CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 2000 + doc_id % 6000 END AS n_samples,
      |  CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 8000 END AS sample_rate
      |FROM documents WHERE doc_id % 5 = 0
      |ORDER BY doc_id""".stripMargin

  /** Frame-sampling gate, same idea: sampled frame indices and resized
    * dims are generator-determined (containers of 4+id%5 frames, every
    * 2nd kept, resized to 8×6), so frame extraction + per-frame decode +
    * resize plumbing is driver-gated; per-frame luminance stays rows-only
    * (mm_frames + MultimodalSpec). */
  private def framesMeta(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.spread( // codec work per row: guide §2.5 spread
      Tables.documents(s, d).filter(col("doc_id") % 7 === 1)
        .select(col("doc_id"), col("text")), col("doc_id"))
    Multimodal.frameSample(s, synthesizeVideos(s, docs), step = 2, w = 8, h = 6)
      .select(col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val framesMetaSql =
    """SELECT * FROM (
      |  SELECT doc_id, unnest(range(0, 4 + doc_id % 5, 2)) AS frame_idx,
      |    CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height
      |  FROM documents WHERE doc_id % 7 = 1)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Perceptual-hash image dedup over a planted corpus: every even doc id
    * gets a fixed-size PNG seeded by `id / 4`, so consecutive even ids
    * (4k, 4k+2) render the SAME image — and the 4k+2 copy additionally
    * has one pixel flipped ([[Multimodal.tweakPixel]]), making it a true
    * NEAR-duplicate (small aHash Hamming), not a byte copy. The banded
    * Hamming search must recover exactly those planted pairs, which a
    * closed-form oracle predicts without ever seeing a hash value — the
    * image twin of the text dedup gates. */
  private def phashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = graft.Tables.spread( // codec work per row: guide §2.5 spread
        Tables.documents(s, d)
          .filter(col("doc_id") % 2 === 0).select(col("doc_id")),
        col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val png = Multimodal.syntheticPng(id / 4, 24, 18)
        Multimodal.MediaRow(id,
          if (id % 4 == 2) Multimodal.tweakPixel(png, 3, 5) else png)
      }).toDF()
    Multimodal.imageNearDupPairs(s, media, maxHamming = 8)
      .select(col("da"), col("db"))
      .orderBy(col("da"), col("db"))
  }

  private val phashPairsSql =
    """SELECT a.doc_id AS da, b.doc_id AS db
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 2
      |WHERE a.doc_id % 4 = 0
      |ORDER BY da, db""".stripMargin

  /** Audio near-dup over a planted corpus, mirroring [[phashPairs]]: odd
    * ids 4k+1 and 4k+3 synthesize the SAME WAV (seed and length keyed on
    * id/4) and the 4k+3 copy carries a 100-sample dropout
    * ([[Multimodal.tweakWavSamples]]) — a true near-duplicate whose
    * fingerprint differs only in the windows the dropout touches. The
    * banded search must recover exactly the planted pairs; the closed-form
    * oracle predicts them without seeing a fingerprint. */
  private def audioPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = graft.Tables.spread( // codec work per row: guide §2.5 spread
        Tables.documents(s, d)
          .filter(col("doc_id") % 2 === 1).select(col("doc_id")),
        col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val g = id / 4
        val wav = Multimodal.syntheticWav(g, 2000 + (g % 499).toInt * 4)
        Multimodal.MediaRow(id,
          if (id % 4 == 3) Multimodal.tweakWavSamples(wav, 600, 100) else wav)
      }).toDF()
    Multimodal.audioNearDupPairs(s, media, maxHamming = 8)
      .select(col("da"), col("db"))
      .orderBy(col("da"), col("db"))
  }

  private val audioPairsSql =
    """SELECT a.doc_id AS da, b.doc_id AS db
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 2
      |WHERE a.doc_id % 4 = 1
      |ORDER BY da, db""".stripMargin

  /** Video near-dup over a planted corpus, completing the image/audio
    * pattern: even ids 4k and 4k+2 build the SAME six-frame container
    * (frames seeded on id/4) and the 4k+2 copy carries a one-pixel edit
    * in frame 2 — a sampled frame, so its hash may drift, while sampled
    * frames 0 and 4 stay identical and carry the match. minShared = 2 of
    * 3 sampled frames; the closed-form oracle predicts the exact pairs. */
  private def videoPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = graft.Tables.spread( // codec work per row: guide §2.5 spread
        Tables.documents(s, d)
          .filter(col("doc_id") % 2 === 0).select(col("doc_id")),
        col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val g = id / 4
        // frame seeds spaced far beyond the frame count so no two GROUPS
        // can share a frame (g+i seeding would give groups g and g+2 two
        // common sampled frames — false pairs)
        val frames = (0 until 6).map(i =>
          Multimodal.syntheticPng(g * 1000003L + i, 16, 12))
        val payload =
          if (id % 4 == 2)
            Multimodal.videoFromFrames(
              frames.updated(2, Multimodal.tweakPixel(frames(2), 1, 1)))
          else Multimodal.videoFromFrames(frames)
        Multimodal.MediaRow(id, payload)
      }).toDF()
    Multimodal.videoNearDupPairs(s, media, step = 2, minShared = 2)
      .select(col("da"), col("db"))
      .orderBy(col("da"), col("db"))
  }

  private val videoPairsSql =
    """SELECT a.doc_id AS da, b.doc_id AS db
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 2
      |WHERE a.doc_id % 4 = 0
      |ORDER BY da, db""".stripMargin

  val caps: Seq[Capability] = Seq(
    Capability("mm_decode", "binary media (real PNG/WAV) → batch-decoded typed features",
      features),
    Capability("mm_video_pairs",
      "video near-dup pairs via shared sampled-frame hashes",
      videoPairs, Some(videoPairsSql), bench = true),
    Capability("mm_phash_pairs",
      "perceptual-hash (aHash) image near-dup pairs, banded Hamming search",
      phashPairs, Some(phashPairsSql)),
    Capability("mm_audio_fp_pairs",
      "audio dropout-fingerprint near-dup pairs, banded Hamming search",
      audioPairs, Some(audioPairsSql)),
    Capability("mm_frames", "video frame-sampling + resize (real per-frame PNG decode)",
      frames),
    Capability("mm_decode_meta", "decoded media metadata vs generator-predicting oracle",
      decodeMeta, Some(decodeMetaSql)),
    Capability("mm_frames_meta", "sampled frame indices + resized dims vs predicting oracle",
      framesMeta, Some(framesMetaSql)),
  )
}
