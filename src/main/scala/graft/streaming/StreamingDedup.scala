package graft.streaming

import graft.functions.TextOps
import graft.functions.expr.MinHashSketch
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Streaming MinHash near-duplicate detection — the incremental twin of
  * [[graft.pipeline.Dedup.minhashCandidates]], for the pipeline a 100 TB
  * corpus actually runs: documents arrive continuously and each new one
  * must be checked against what the stream has already seen, without ever
  * re-sharding the full corpus (the reference's batch-only exec model has
  * no analogue — SURVEY.md §2.3 declares streaming state a Spark-native
  * extension).
  *
  * Shape: per document the `nHashes`-long MinHash signature is computed
  * ROW-LOCALLY with the exact fold the batch aggregate uses
  * ([[MinHashSketch.signatureOf]] — bit-identical signatures by
  * construction), cut into `nHashes / rowsPerBand` band signatures, and
  * each (band, band-signature) becomes a STATE KEY of a
  * `transformWithState` processor. The per-key state is the list of doc
  * ids seen in that bucket; a new arrival emits one candidate pair per
  * buffered doc and appends itself. Exactly the batch LSH contract — a
  * pair is a candidate iff some band signature matches — so on a replay of
  * a static corpus the candidate set equals the batch operator's (the
  * parity case in StreamingSpec asserts set equality, and that verifying
  * the streamed candidates reproduces `Dedup.minhashPairs`).
  *
  * Scale: state is per-bucket doc-id lists — ids only, never text or
  * signatures — and `stateTtl` bounds it in processing time (the
  * processing-time analogue of [[StreamingOps.dedupExactStream]]'s
  * watermark horizon): a candidate is only found among documents that
  * arrived within the TTL. Candidates for a pair sharing several bands are
  * emitted once per shared band (the batch twin ends with `.distinct()`);
  * dedup downstream where it is cheap — at the verification join, which is
  * keyed on the pair anyway.
  *
  * Requires the RocksDB state store provider, Spark's own constraint for
  * `transformWithState` (see StreamingSpec for the per-query conf).
  */
object StreamingDedup {

  final case class BandRow(band_key: String, doc_id: Long)
  final case class CandidatePair(da: Long, db: Long)

  /** Per-bucket state: doc ids seen under one (band, band-signature) key.
    * New arrivals pair with every buffered id, then join the buffer. */
  class BucketProcessor(stateTtl: Option[java.time.Duration])
      extends StatefulProcessor[String, BandRow, CandidatePair] {
    @transient private var seen: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Long]("docs", Encoders.scalaLong,
        stateTtl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(
        key: String, rows: Iterator[BandRow],
        timerValues: TimerValues): Iterator[CandidatePair] = {
      // sorted + distinct: deterministic emission order and no self-pairs
      // when a doc appears twice in one micro-batch
      val newIds = rows.map(_.doc_id).toArray.distinct.sorted
      if (newIds.isEmpty) return Iterator.empty
      var known = seen.get().toArray
      val out = Seq.newBuilder[CandidatePair]
      newIds.foreach { id =>
        known.foreach { o =>
          if (o != id)
            out += (if (o < id) CandidatePair(o, id) else CandidatePair(id, o))
        }
        known :+= id
        seen.appendValue(id)
      }
      out.result().iterator
    }
  }

  /** LSH candidate pairs over a document stream. `docs` must carry
    * `idCol` (long) and `textCol`; emits (da < db) candidate pairs in
    * append mode, possibly repeated across shared bands. Parameters match
    * [[graft.pipeline.Dedup.minhashCandidates]] so the two are
    * interchangeable twins. */
  def minhashCandidatesStream(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, nHashes: Int = 64, rowsPerBand: Int = 4,
      stateTtl: Option[java.time.Duration] = None): Dataset[CandidatePair] = {
    import spark.implicits._
    require(nHashes % rowsPerBand == 0,
      s"nHashes ($nHashes) must be a multiple of rowsPerBand ($rowsPerBand)")
    val nBands = nHashes / rowsPerBand
    val shingled = docs
      .select(col(idCol).as("doc_id"),
        transform(TextOps.shingles(col(textCol), n), s => xxhash64(s)).as("sh"))
      // a doc too short to shingle has no signature and can never be a
      // candidate — same as the batch path, where it vanishes at explode
      .filter(size(col("sh")) > 0)
      .as[(Long, Seq[Long])]
    val bands = shingled.flatMap { case (id, sh) =>
      val sig = MinHashSketch.signatureOf(sh.iterator, nHashes)
      (0 until nBands).map { b =>
        val bandSig = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand).mkString(",")
        BandRow(s"$b|$bandSig", id)
      }
    }
    bands.groupByKey(_.band_key)
      .transformWithState(
        new BucketProcessor(stateTtl),
        if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
