package graft.pipeline

import graft.{Capability, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - `ann_brute`: exact top-k by cosine — the correctness baseline. A
  *    broadcast nested-loop join; O(Q·N) but Q (query set) is small and
  *    broadcast, so it distributes over N. This is the oracle twin.
  *  - `ann_lsh`: random-hyperplane LSH — the 100 TB path. Vectors are
  *    bucketed by sign-bit signature; only same-bucket pairs are scored,
  *    turning the quadratic scan into a bucket-local shuffle join. Planes
  *    are derived from xxhash64 (deterministic, no RNG state to ship).
  *    Recall vs brute is asserted in SimilaritySpec.
  */
object SimilarityQueries {

  private val K = 5
  private val NQueries = 20

  private def brute(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cand = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(cand, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorOps.cosine(col("qe"), col("ne")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val bruteSql =
    s"""SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(
       |      list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
       |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos,
       |    row_number() OVER (PARTITION BY q.vec_id
       |                       ORDER BY round(list_cosine_similarity(
       |                         list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
       |                         list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 6) DESC,
       |                       c.vec_id) AS rank
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < $NQueries
       |) WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  /** LSH-bucketed ANN: 8 hyperplane bits → 256 buckets; queries probe only
    * their own bucket. Output shape matches `ann_brute`; recall is
    * data-dependent (asserted ≥ threshold in SimilaritySpec, not
    * oracle-gated). */
  private def lsh(s: SparkSession, d: String): DataFrame = {
    val nPlanes = 8
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        VectorOps.lshBucket(col("embedding"), nPlanes).as("bucket"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val cand = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(cand, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorOps.cosine(col("qe"), col("ne")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  val caps: Seq[Capability] = Seq(
    Capability("ann_brute", s"exact top-$K cosine neighbors for $NQueries queries", brute,
      Some(bruteSql), bench = true),
    Capability("ann_lsh", s"hyperplane-LSH bucketed top-$K (scale path)", lsh),
  )
}
