package graft.pipeline

import graft.{Capability, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared ANN capabilities: [[Ann]] bound to the `embeddings` table.
  * `ann_brute` is the exact baseline (and DuckDB-oracled); `ann_lsh` is
  * the bucketed scale path, recall-asserted in SimilaritySpec.
  */
object SimilarityQueries {

  private val K = 5
  private val NQueries = 20

  private def brute(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Ann.bruteTopK(e.filter(col("vec_id") < NQueries), e, "vec_id", "embedding", K)
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

  private def lsh(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Ann.lshTopK(e.filter(col("vec_id") < NQueries), e, "vec_id", "embedding", K)
      .orderBy(col("query_id"), col("rank"))
  }

  private def ivf(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Ann.ivfTopK(e.filter(col("vec_id") < NQueries), e, "vec_id", "embedding", K)
      .orderBy(col("query_id"), col("rank"))
  }

  val caps: Seq[Capability] = Seq(
    Capability("ann_brute", s"exact top-$K cosine neighbors for $NQueries queries", brute,
      Some(bruteSql), bench = true),
    Capability("ann_lsh", s"hyperplane-LSH bucketed top-$K (scale path)", lsh),
    Capability("ann_ivf", s"IVF coarse-quantizer top-$K (scale path, nProbe cells)", ivf),
  )
}
