package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combine per-query ranked lists from
  * heterogeneous rankers (sparse BM25, dense cosine, ...) into one
  * ranking with Reciprocal Rank Fusion (Cormack, Clarke & Buettcher
  * 2009) — `score(d) = Σ_r 1/(k0 + rank_r(d))`, the standard fusion in
  * production retrieval stacks because it needs no score calibration
  * across rankers: only RANKS enter, so a BM25 log-score and a cosine in
  * [-1,1] fuse without normalization. `k0` (conventionally 60) damps the
  * head so one ranker's #1 cannot dominate everything below it.
  *
  * Determinism contract: each reciprocal term is rounded at 9 dp and the
  * per-document sum runs in exact 1e-9-unit longs (the [[Drift]]
  * contract — order-independent), so the fused ordering is a pure
  * function of the input ranks; ties break by neighbor id.
  *
  * Scale shape: input lists are top-`depth` per query (each ranker's own
  * scale path bounds them); fusion is one (query, neighbor)-keyed
  * aggregate with map-side combine over ≤ rankers·depth rows per query,
  * then a per-query window over the same bounded set — nothing here
  * touches corpus-sized data. */
object Hybrid {

  /** Fuse ranked lists, each `(query_id, rank, neighbor_id, ...)` with
    * rank 1-based, into the fused top-`topK` per query:
    * `(query_id, rank, neighbor_id, score)`. A document missing from a
    * ranker's list simply contributes no term for it. */
  def rrf(rankings: Seq[DataFrame], topK: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    val terms = rankings
      .map(_.select(col("query_id"), col("neighbor_id"),
        round(lit(1.0) / (lit(k0) + col("rank")), 9).as("term")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    terms
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg((sum(round(col("term") * lit(1e9), 0).cast("long")).cast("double")
        / lit(1e9)).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
  }
}
