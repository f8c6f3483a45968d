package graft.pipeline

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget document chunking — the standard pre-tokenizer splitting
  * pass of an LLM training pipeline: each document becomes overlapping
  * windows of at most `maxTokens` whitespace tokens with stride
  * `maxTokens - overlap`, so every token appears in at least one chunk
  * and window boundaries share `overlap` tokens of context.
  *
  * Scale shape: pure codegen column expressions
  * (`sequence`/`transform`/`slice`/`posexplode`) — a narrow per-row
  * fan-out. Chunks never leave the partition that read the document, so
  * the op shuffles nothing at any corpus size; downstream repartitioning
  * (e.g. [[Sharding]]'s pack/shuffle) decides chunk placement.
  */
object Chunking {

  /** One row per (document, chunk): `(idCol, n_doc_tokens, chunk_idx,
    * chunk_text, n_chunk_tokens)`. A document with `n <= maxTokens`
    * tokens yields exactly one chunk; otherwise `ceil((n - maxTokens) /
    * stride) + 1` chunks, the last possibly shorter than `maxTokens` but
    * never empty (the final window start is always <= n).
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    val toks = TextOps.words(col(textCol))
    // exact ceil-div in doubles (token counts are far below 2^53)
    val nChunks = when(col("__n") <= maxTokens, lit(1L))
      .otherwise(floor((col("__n") - maxTokens + (stride - 1))
        .cast("double") / stride).cast("long") + 1L)
    docs
      .select(col(idCol), toks.as("__toks"), size(toks).as("__n"))
      .select(col(idCol), col("__n"), col("__toks"), nChunks.as("__nc"))
      .select(col(idCol), col("__n").as("n_doc_tokens"),
        posexplode(transform(sequence(lit(0L), col("__nc") - 1), i =>
          struct(
            concat_ws(" ",
              slice(col("__toks"), (i * stride + 1).cast("int"), lit(maxTokens)))
              .as("chunk_text"),
            least(lit(maxTokens), col("__n") - i.cast("int") * stride)
              .as("n_chunk_tokens")))))
      .select(col(idCol), col("n_doc_tokens"),
        col("pos").cast("int").as("chunk_idx"),
        col("col.chunk_text").as("chunk_text"),
        col("col.n_chunk_tokens").as("n_chunk_tokens"))
  }
}
