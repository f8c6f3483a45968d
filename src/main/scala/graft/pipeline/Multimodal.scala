package graft.pipeline

import graft.{Capability, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/featurized in partition-sized batches.
  *
  * The Spark-side mechanics are real and tested — binary column handling,
  * case-class schemas, `mapPartitions` batch shape (the Scala analogue of
  * `mapInPandas`), partition-parallel execution with no shuffle. The
  * actual media decode is a STUB: image/audio codecs are not available in
  * this environment, so [[Multimodal.decodeBatch]] derives deterministic
  * fake features from a CRC of the bytes. Swapping in a real decoder
  * changes only the body of `decodeBatch`; every schema, batch and
  * partitioning decision stays.
  */
object Multimodal {

  /** Input: one media payload with its id. */
  final case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Output: typed metadata + a fixed-width feature vector. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      kind: String,
      width: Int,
      height: Int,
      feature: Array[Double])

  /** STUB decoder — deterministic fake standing in for a real image/audio
    * decode + feature extraction. Operates on a whole partition's iterator
    * (the batch shape a vectorized decoder needs: amortized codec init,
    * sequential IO). */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val crc = new java.util.zip.CRC32()
      crc.update(r.media)
      val h = crc.getValue
      MediaFeatures(
        doc_id = r.doc_id,
        n_bytes = r.media.length,
        kind = if (h % 2 == 0) "image" else "audio",
        width = (h % 640).toInt + 1,
        height = (h % 480).toInt + 1,
        feature = Array.tabulate(8)(i => ((h >> (4 * i)) & 0xF).toDouble / 15.0))
    }

  /** Binary column + metadata → decoded features, partition-parallel. */
  def decode(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(decodeBatch).toDF()
  }
}

object MultimodalQueries {

  /** The documents' UTF-8 bytes stand in for media payloads; the pipeline
    * (binary ingest → batch decode → typed features) is the capability
    * under test. Hash-derived fake features → no SQL oracle; determinism
    * and schema are asserted in MultimodalSpec. */
  private def features(s: SparkSession, d: String): DataFrame = {
    val media = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
    Multimodal.decode(s, media)
      .select(col("doc_id"), col("n_bytes"), col("kind"),
        col("width"), col("height"),
        // feature vector surfaced as scalars — the driver's comparator
        // sorts rows in pandas, which cannot order array-typed cells
        // (MultimodalSpec asserts the full vector)
        element_at(col("feature"), 1).as("f0"),
        round(aggregate(col("feature"), lit(0.0), (a, x) => a + x), 6)
          .as("feature_sum"))
      .orderBy(col("doc_id"))
  }

  val caps: Seq[Capability] = Seq(
    Capability("mm_decode_stub", "binary media → batch-decoded typed features (stub codec)",
      features),
  )
}
