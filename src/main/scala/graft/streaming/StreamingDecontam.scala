package graft.streaming

import graft.functions.TextOps
import graft.pipeline.TextQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming decontamination — the incremental twin of
  * [[TextQueries.decontaminateBloom]], for the ingest topology a 100 TB
  * corpus actually runs: train documents arrive continuously and each
  * must be checked against a FIXED benchmark/eval set before it enters
  * the training mix.
  *
  * Shape: the eval set's shingle keys are folded ONCE into a literal
  * Bloom filter ([[TextQueries.literalBloomPredicate]] — kilobytes,
  * baked into the streaming plan), and every arriving document is
  * flagged by an `exists` over its own shingles probing that filter — a
  * PURE NARROW transformation: no streaming state, no shuffle, no
  * watermark needed, each micro-batch flags its rows in place. That is
  * the property that makes it deployable in front of any sink at any
  * rate.
  *
  * Contract: the flag is the CANDIDATE tier — false positives at the
  * filter's fpp, never false negatives (every truly contaminated doc is
  * flagged; StreamingSpec asserts the superset against the exact batch
  * operator and bit-parity with the batch evaluation of the same
  * predicate). The exact scrub of false positives is the downstream
  * batch semi-join exactly as in [[TextQueries.decontaminateBloom]] —
  * run it in `foreachBatch` or over the flagged partition at compaction
  * time, where it touches only the ~(contamination rate + fpp) fraction
  * that was flagged.
  */
object StreamingDecontam {

  /** Add a `contaminated` flag to a (streaming or batch) frame of
    * documents: true iff any word `n`-gram of `textCol` might be in
    * `evalDocs`' shingle set. `evalDocs` must be a STATIC frame (it is
    * aggregated eagerly to build the filter). */
  def flagStream(stream: DataFrame, textCol: String,
      evalDocs: DataFrame, evalTextCol: String, n: Int,
      fpp: Double = 0.01): DataFrame = {
    val evalKeys = evalDocs
      .select(explode(TextOps.shingles(col(evalTextCol), n)).as("__sh"))
      .select(xxhash64(col("__sh")).as("sh")).distinct()
      .localCheckpoint(true)
    TextQueries.literalBloomPredicate(evalKeys, "sh", fpp) match {
      case None => stream.withColumn("contaminated", lit(false))
      case Some(mightContain) =>
        stream.withColumn("contaminated",
          exists(TextOps.shingles(col(textCol), n),
            s => mightContain(xxhash64(s))))
    }
  }
}
