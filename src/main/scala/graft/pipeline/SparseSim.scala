package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-vector similarity over text corpora: each document becomes a
  * sparse lexical vector (dimension = token, weight = term frequency) and
  * neighbors are ranked by the EXACT integer dot product — the classic
  * information-retrieval design (TF / SPLADE-style sparse embeddings)
  * that complements the dense [[Ann]] family.
  *
  * Scale shape — this is a sparse-matrix product (the [[graft.types
  * .SparseMatrix]] CSR picture: queries · corpusᵀ) restricted to the
  * query rows, computed as an INVERTED DIMENSION INDEX join: only
  * (query, doc) pairs that SHARE a dimension ever materialize, so work is
  * Σ_tok df_q(tok)·df_d(tok) instead of |Q|·|N|·dims. The query side is
  * tiny and broadcast; the corpus side stays narrow until one grouped
  * aggregate with map-side combine shuffles (query, neighbor, partial
  * dot) triples — document text never crosses the network.
  *
  * The scale lever is `maxDfFrac`, the same hot-key cap as
  * [[TextQueries.decontaminate]]'s `maxTrainDf`: a dimension present in
  * more than that fraction of documents (stopwords — "the", boilerplate)
  * contributes df² pairs to the join while carrying no discriminative
  * signal; dropping such dimensions bounds the per-token fan-out, which
  * is what makes the inverted index survive 100 TB. Dropping is the
  * DESIRED semantics for near-neighbor ranking (it is IDF taken to its
  * limit), and the cap is part of the declared output contract: the
  * oracle applies the identical rule.
  */
object SparseSim {

  /** Sparse lexical vectors as (id, tok, tf) triples — COO by another
    * name, one row per nonzero. Tokenization matches the corpus-wide
    * convention ([[graft.functions.TextOps.words]]: single-space split,
    * empties dropped) so the DuckDB oracle expresses it verbatim. */
  def tfVectors(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("id"), col("tok"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k neighbors of each query document by exact sparse dot product.
    *
    * @param queryPred  which documents are queries (e.g. `col("id") < 10`
    *                   over the renamed `id` column) — the query set must
    *                   be small relative to the corpus (it is broadcast)
    * @param maxDfFrac  drop dimensions present in more than this fraction
    *                   of documents (None = keep all; see class doc)
    */
  def topKDot(docs: DataFrame, idCol: String, textCol: String, k: Int,
      queryPred: Column, maxDfFrac: Option[Double] = None): DataFrame = {
    val tf = tfVectors(docs, idCol, textCol)
    val kept = maxDfFrac match {
      case Some(frac) =>
        // document frequency per dimension via a window over the same
        // (tok)-partitioning the inverted join consumes; the corpus size
        // is one broadcast scalar
        val nDocs = docs.agg(countDistinct(col(idCol)).as("__n_docs"))
        tf.withColumn("__df", count(lit(1)).over(Window.partitionBy(col("tok"))))
          .crossJoin(broadcast(nDocs))
          .filter(col("__df") <= col("__n_docs") * frac)
          .drop("__df", "__n_docs")
      case None => tf
    }
    val q = kept.filter(queryPred)
      .select(col("id").as("query_id"), col("tok"), col("tf").as("qtf"))
    val d = kept.select(col("id").as("neighbor_id"), col("tok"),
      col("tf").as("ntf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    broadcast(q).join(d, Seq("tok"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("qtf") * col("ntf")).as("dot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
  }

  /** Top-k neighbors by BM25 — the IR-standard ranking on the same
    * inverted dimension index as [[topKDot]]: per shared token the
    * contribution is `qtf · idf(tok) · ntf(k1+1)/(ntf + k1(1−b+b·dl/avgdl))`
    * with the Lucene/ATIRE positive idf `ln(1 + (N − df + 0.5)/(df + 0.5))`,
    * tf saturation `k1` and length normalization `b`. Same scale shape as
    * the dot-product variant (broadcast query side, token-keyed join,
    * grouped aggregate with map-side combine) plus two tiny broadcast
    * sides: per-document lengths join the postings, and (N, avgdl) is one
    * broadcast scalar row.
    *
    * Oracle-exactness: per-element scores are one IEEE double expression
    * (evaluated in identical textual order in the DuckDB mirror), rounded
    * to 9 decimals, summed as exact decimals (order-independent), rounded
    * to 6 — so grouped float addition order can never flip a rank.
    *
    * `maxDfFrac` keeps its inverted-index-survival role; BM25 already
    * DOWNWEIGHTS hot dimensions (idf → ~0), so the cap changes scores
    * only marginally while cutting Σdf² join pairs — the cap is part of
    * the declared contract here exactly as in [[topKDot]]. */
  def topKBm25(docs: DataFrame, idCol: String, textCol: String, k: Int,
      queryPred: Column, k1: Double = 1.2, b: Double = 0.75,
      maxDfFrac: Option[Double] = None): DataFrame = {
    val tf = tfVectors(docs, idCol, textCol)
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("tok"))))
    val kept = maxDfFrac match {
      case Some(frac) =>
        withDf.crossJoin(broadcast(stats))
          .filter(col("df") <= col("n_docs") * frac)
          .drop("n_docs", "avgdl")
      case None => withDf
    }
    val q = kept.filter(queryPred)
      .select(col("id").as("query_id"), col("tok"), col("tf").as("qtf"))
    val d = kept.select(col("id").as("neighbor_id"), col("tok"),
        col("tf").as("ntf"), col("df"))
      .join(broadcast(dl.select(col("id").as("neighbor_id"), col("dl"))),
        Seq("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    val elem = round(
      col("qtf") * log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        col("ntf") * lit(k1 + 1) /
        (col("ntf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))), 9)
    broadcast(q).join(d, Seq("tok"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("neighbor_id"), elem.as("e"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(round(sum(col("e").cast(org.apache.spark.sql.types.DecimalType(38, 12)))
        .cast("double"), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
  }
}
