package graft.pipeline

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame-parametric nearest-neighbor search over `array<float>`
  * embedding columns.
  */
object Ann {

  /** Exact top-k by cosine: broadcast the (small) query set against the
    * full candidate table — O(Q·N) work that distributes over N with no
    * shuffle of the big side; the per-query window dedup shuffles only
    * Q·N score rows keyed by query. */
  def bruteTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qe"))
    val cand = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(cand, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorOps.cosine(col("qe"), col("ne")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Multi-table LSH top-k: `nTables` independent hyperplane families of
    * `nPlanes` bits each; a candidate is scored if it shares a bucket with
    * the query in ANY table. The 100 TB path — (table, bucket)-keyed
    * shuffle join instead of a quadratic scan; recall ≈
    * 1-(1-p^nPlanes)^nTables with p the per-plane agreement probability. */
  def lshTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 6, nTables: Int = 12): DataFrame = {
    // native fused bucketing (graft.functions.expr.LshBucketsExpr) —
    // bit-identical to VectorOps.lshBuckets, one loop instead of
    // nTables×nPlanes HOF trees per row
    def bucketed(df: DataFrame, id: String, vec: String) = df.select(
      col(idCol).as(id), col(vecCol).as(vec),
      explode(graft.functions.expr.LshBucketsExpr(
        col(vecCol), nPlanes, nTables)).as("tb"))
    val q = bucketed(queries, "query_id", "qe")
    val cand = bucketed(candidates, "neighbor_id", "ne")
    // score at join time so the bucket-collision dedup shuffles three
    // scalar columns, not two 64-float vectors per pair (the cosine is
    // deterministic, so duplicate collisions agree and max() is a no-op
    // combine — re-scoring a duplicate is cheaper than shuffling vectors)
    val pairs = q.join(cand,
        q("tb.table") === cand("tb.table") && q("tb.bucket") === cand("tb.bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorOps.cosine(col("qe"), col("ne")), 6).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
