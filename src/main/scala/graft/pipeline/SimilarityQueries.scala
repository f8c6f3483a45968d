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

  /** PQ gate: refine=8 shortlists 8·K candidates per query by ADC before
    * the exact re-rank — measured recall ≈ 0.75 on this corpus (random
    * synthetic embeddings are ANN-hostile; real embedding manifolds do
    * far better), gate threshold 0.45 with the family's usual margin. */
  private def pq(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Ann.pqTopK(e.filter(col("vec_id") < NQueries), e, "vec_id", "embedding", K,
        refine = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  /** recall@K of an ANN scale path against the in-Spark exact baseline,
    * emitted as a THRESHOLDED deterministic scalar so the driver's DuckDB
    * gate (constant oracle) — not just ScalaTest — covers the ANN paths:
    * seeds, sampling and tie-breaks are all fixed, so the hit count is a
    * pure function of the corpus and `recall_ok` is 1 on any healthy
    * build. Thresholds carry a wide margin under the measured recalls
    * (LSH ≈ 0.5, IVF ≈ 0.6 on this corpus; SimilaritySpec asserts the
    * tighter moving bounds). */
  private def recallGate(
      approx: (SparkSession, String) => DataFrame, threshold: Double)(
      s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val exact = Ann.bruteTopK(e.filter(col("vec_id") < NQueries), e,
      "vec_id", "embedding", K).select(col("query_id"), col("neighbor_id"))
    exact.join(approx(s, d).select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("__hits"))
      .select(
        lit(NQueries).as("n_queries"),
        lit(K).as("k"),
        (col("__hits") >= lit((threshold * NQueries * K).toInt)).cast("int")
          .as("recall_ok"))
  }

  private val recallGateSql = s"SELECT $NQueries AS n_queries, $K AS k, 1 AS recall_ok"

  /** Incremental IVF: centroids trained ONLY on the 75 % "existing"
    * corpus slice (vec_id % 4 != 0), then the FULL corpus — existing plus
    * the 25 % that "arrived" after training — is cell-assigned and
    * searched against those stale centroids ([[Ann.ivfTopKWith]], no
    * retraining). The recall gate proves the operational claim: an
    * incrementally-growing corpus keeps its index quality without
    * re-clustering. */
  private def ivfIncremental(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val existing = e.filter(col("vec_id") % 4 =!= 0)
    val centroids = Ann.trainCentroids(existing, "vec_id", "embedding")
    Ann.ivfTopKWith(centroids,
      e.filter(col("vec_id") < NQueries), e, "vec_id", "embedding", K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Int8-quantized top-k ([[Ann.int8TopK]]): fully oracle-gated — the
    * integer dot product is exact, the dequantized score is one IEEE
    * division, and the tie-break is total. The recall twin below asserts
    * the SEMANTIC property (int8-of-cosine ranking ≈ float cosine
    * ranking). */
  private def int8(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Ann.int8TopK(e.filter(col("vec_id") < NQueries), e, "vec_id", "embedding", K)
      .orderBy(col("query_id"), col("rank"))
  }

  private val int8Sql =
    s"""WITH uv AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
       |      sqrt(list_sum(list_transform(embedding,
       |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
       |  FROM embeddings),
       |qv AS (
       |  SELECT vec_id,
       |    127.0 / list_max(list_transform(u, x -> abs(x))) AS s,
       |    list_transform(u, x -> CAST(floor(
       |      x * (127.0 / list_max(list_transform(u, y -> abs(y)))) + 0.5)
       |      AS BIGINT)) AS q
       |  FROM uv),
       |dots AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    round(CAST(list_sum(list_transform(range(1, len(a.q)+1),
       |      i -> a.q[i] * b.q[i])) AS DOUBLE) / (a.s * b.s), 6) AS score
       |  FROM qv a JOIN qv b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < $NQueries)
       |SELECT query_id, rank, neighbor_id, score FROM (
       |  SELECT query_id, neighbor_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS INT) AS rank
       |  FROM dots) t
       |WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  /** Sparse lexical top-k ([[SparseSim]]): exact integer dot products via
    * an inverted dimension index, hot dimensions (>75 % document
    * frequency) dropped — fully oracle-gated because every quantity is an
    * integer and the tie-break is total. 0.75 makes the cap FIRE on this
    * corpus (the synthetic vocabulary is tiny and hot: dropping df>0.75
    * dims cuts Σdf² join pairs 32×) while leaving every query a full
    * top-k; the cap's exact semantics are spec'd on planted corpora in
    * SparseSimSpec. */
  private val SparseK = 5
  private val SparseNQ = 10
  private val SparseDfFrac = 0.75

  private def sparseTopK(s: SparkSession, d: String): DataFrame =
    SparseSim.topKDot(Tables.documents(s, d), "doc_id", "text", SparseK,
        col("id") < SparseNQ, maxDfFrac = Some(SparseDfFrac))
      .orderBy(col("query_id"), col("rank"))

  private val sparseTopKSql =
    s"""WITH tf AS (
       |  SELECT id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok
       |    FROM documents)
       |  WHERE tok <> '' GROUP BY 1, 2),
       |kept AS (
       |  SELECT tf.* FROM tf
       |  WHERE tok IN (
       |    SELECT tok FROM tf GROUP BY tok
       |    HAVING COUNT(*) <= $SparseDfFrac *
       |      (SELECT COUNT(DISTINCT doc_id) FROM documents))),
       |dots AS (
       |  SELECT q.id AS query_id, d.id AS neighbor_id,
       |    CAST(SUM(q.tf * d.tf) AS BIGINT) AS dot
       |  FROM kept q JOIN kept d USING (tok)
       |  WHERE q.id < $SparseNQ AND d.id <> q.id
       |  GROUP BY 1, 2)
       |SELECT query_id, rank, neighbor_id, dot FROM (
       |  SELECT query_id, neighbor_id, dot,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY dot DESC, neighbor_id) AS INT) AS rank
       |  FROM dots) t
       |WHERE rank <= $SparseK
       |ORDER BY query_id, rank""".stripMargin

  /** Binary-quantized Hamming top-k ([[Ann.binaryTopK]]): integer output,
    * total tie-break — fully oracle-gated. The oracle computes Hamming
    * from UNPACKED sign bits (the semantic definition); the engine packs
    * 32 bits per word and XOR/popcounts — the gate proves the packing. */
  private def binary(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Ann.binaryTopK(e.filter(col("vec_id") < NQueries), e, "vec_id", "embedding", K)
      .orderBy(col("query_id"), col("rank"))
  }

  private val binarySql =
    s"""WITH bits AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CASE WHEN CAST(x AS DOUBLE) >= 0 THEN 1 ELSE 0 END) AS s
       |  FROM embeddings),
       |d AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(a.s)+1),
       |      i -> CASE WHEN a.s[i] <> b.s[i] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
       |  FROM bits a JOIN bits b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < $NQueries)
       |SELECT query_id, rank, neighbor_id, hamming FROM (
       |  SELECT query_id, neighbor_id, hamming,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY hamming, neighbor_id) AS INT) AS rank
       |  FROM d) t
       |WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  private val LadderFactor = 4

  /** Quantization-ladder composition ([[Ann.ladderTopK]]): binary
    * Hamming candidate tier → exact float-cosine re-rank of the
    * surviving `K·$LadderFactor` candidates. Deterministic end to end
    * (Hamming and cosine ties both break by neighbor id), so the FULL
    * pipeline is oracle-gated — the DuckDB mirror computes Hamming from
    * unpacked sign bits, takes the same candidate cut, and re-ranks with
    * list_cosine_similarity. */
  private def ladder(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Ann.ladderTopK(e.filter(col("vec_id") < NQueries), e, "vec_id", "embedding",
        K, candFactor = LadderFactor)
      .orderBy(col("query_id"), col("rank"))
  }

  private val ladderSql =
    s"""WITH bits AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CASE WHEN CAST(x AS DOUBLE) >= 0 THEN 1 ELSE 0 END) AS s
       |  FROM embeddings),
       |d AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(a.s)+1),
       |      i -> CASE WHEN a.s[i] <> b.s[i] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
       |  FROM bits a JOIN bits b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < $NQueries),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY hamming, neighbor_id) AS crank
       |    FROM d) t
       |  WHERE crank <= ${K * LadderFactor}),
       |r AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    round(list_cosine_similarity(
       |      list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
       |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
       |  FROM cand
       |  JOIN embeddings q ON q.vec_id = cand.query_id
       |  JOIN embeddings c ON c.vec_id = cand.neighbor_id)
       |SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS INT) AS rank
       |  FROM r) t
       |WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  /** BM25 top-k ([[SparseSim.topKBm25]]) on the same inverted index and
    * query/corpus split as `sparse_topk` — fully oracle-gated (per-element
    * IEEE score in identical textual order, decimal-summed, total
    * tie-break). */
  private def bm25(s: SparkSession, d: String): DataFrame =
    SparseSim.topKBm25(Tables.documents(s, d), "doc_id", "text", SparseK,
        col("id") < SparseNQ, maxDfFrac = Some(SparseDfFrac))
      .orderBy(col("query_id"), col("rank"))

  private val bm25Sql =
    s"""WITH tf AS (
       |  SELECT id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok
       |    FROM documents)
       |  WHERE tok <> '' GROUP BY 1, 2),
       |dl AS (SELECT id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY id),
       |stats AS (SELECT COUNT(*) AS n_docs,
       |  CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
       |dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
       |kept AS (
       |  SELECT tf.id, tf.tok, tf.tf, dfreq.df FROM tf
       |  JOIN dfreq USING (tok), stats
       |  WHERE dfreq.df <= $SparseDfFrac * stats.n_docs),
       |elems AS (
       |  SELECT q.id AS query_id, d.id AS neighbor_id,
       |    round(q.tf * ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
       |      d.tf * (1.2 + 1) / (d.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)),
       |      9) AS e
       |  FROM kept q JOIN kept d USING (tok) JOIN dl ON dl.id = d.id, stats s
       |  WHERE q.id < $SparseNQ AND d.id <> q.id),
       |scores AS (
       |  SELECT query_id, neighbor_id,
       |    round(CAST(SUM(CAST(e AS DECIMAL(38,12))) AS DOUBLE), 6) AS score
       |  FROM elems GROUP BY 1, 2)
       |SELECT query_id, rank, neighbor_id, score FROM (
       |  SELECT query_id, neighbor_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS INT) AS rank
       |  FROM scores) t
       |WHERE rank <= $SparseK
       |ORDER BY query_id, rank""".stripMargin

  /** Hybrid retrieval ([[Hybrid.rrf]]): BM25 over `documents` fused with
    * dense cosine over `embeddings` (vector `vec_id` = document `doc_id`,
    * the usual keying of document embeddings) by Reciprocal Rank Fusion —
    * each ranker contributes its top-$RrfDepth, the fusion keeps the
    * top-$SparseK. Fully oracle-gated: both rankers' lists are already
    * deterministic (the sparse_bm25 / ann_brute contracts), and the
    * fused score is a 1e-9-unit scaled-long sum of rounded reciprocal
    * terms, so DuckDB mirrors rank-for-rank. */
  private val RrfDepth = 10
  private val RrfK0 = 60

  private def hybridRrf(s: SparkSession, d: String): DataFrame = {
    val sparse = SparseSim.topKBm25(Tables.documents(s, d), "doc_id", "text",
      RrfDepth, col("id") < SparseNQ, maxDfFrac = Some(SparseDfFrac))
    val e = Tables.embeddings(s, d)
    val dense = Ann.bruteTopK(e.filter(col("vec_id") < SparseNQ), e,
      "vec_id", "embedding", RrfDepth)
    Hybrid.rrf(Seq(sparse, dense), topK = SparseK, k0 = RrfK0)
      .orderBy(col("query_id"), col("rank"))
  }

  private val hybridRrfSql =
    s"""WITH tf AS (
       |  SELECT id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok
       |    FROM documents)
       |  WHERE tok <> '' GROUP BY 1, 2),
       |dl AS (SELECT id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY id),
       |stats AS (SELECT COUNT(*) AS n_docs,
       |  CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
       |dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
       |kept AS (
       |  SELECT tf.id, tf.tok, tf.tf, dfreq.df FROM tf
       |  JOIN dfreq USING (tok), stats
       |  WHERE dfreq.df <= $SparseDfFrac * stats.n_docs),
       |elems AS (
       |  SELECT q.id AS query_id, d.id AS neighbor_id,
       |    round(q.tf * ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
       |      d.tf * (1.2 + 1) / (d.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)),
       |      9) AS e
       |  FROM kept q JOIN kept d USING (tok) JOIN dl ON dl.id = d.id, stats s
       |  WHERE q.id < $SparseNQ AND d.id <> q.id),
       |bscores AS (
       |  SELECT query_id, neighbor_id,
       |    round(CAST(SUM(CAST(e AS DECIMAL(38,12))) AS DOUBLE), 6) AS score
       |  FROM elems GROUP BY 1, 2),
       |sp AS (
       |  SELECT query_id, rank, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, neighbor_id) AS INT) AS rank
       |    FROM bscores) t
       |  WHERE rank <= $RrfDepth),
       |dn AS (
       |  SELECT query_id, rank, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(list_cosine_similarity(
       |          list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
       |          list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 6) DESC,
       |        c.vec_id) AS INT) AS rank
       |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id < $SparseNQ) t
       |  WHERE rank <= $RrfDepth),
       |fused AS (
       |  SELECT query_id, neighbor_id,
       |    CAST(SUM(CAST(round(round(1.0 / ($RrfK0 + rank), 9) * 1e9, 0)
       |      AS BIGINT)) AS DOUBLE) / 1e9 AS score
       |  FROM (SELECT * FROM sp UNION ALL SELECT * FROM dn)
       |  GROUP BY 1, 2)
       |SELECT query_id, rank, neighbor_id, score FROM (
       |  SELECT query_id, neighbor_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS INT) AS rank
       |  FROM fused) t
       |WHERE rank <= $SparseK
       |ORDER BY query_id, rank""".stripMargin

  /** Per-label embedding centroids — the grouped element-wise vector mean
    * behind clustering, IVF coarse training and per-source drift checks.
    *
    * Scale shape: `posexplode` turns (vector) rows into (label, pos,
    * value) triples, so the mean is an ordinary grouped aggregate with
    * map-side partial sums — the shuffle carries one (label, pos, sum,
    * count) per partition per key, never the vectors. The array is
    * reassembled only for the final tiny per-label result (sort_array on
    * (pos, mean) structs — pos is unique, so the order is total).
    * Per-element sums go through [[graft.Det]] decimals so the grouped
    * float mean is order-independent and oracle-exact. */
  private def centroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      // 0-based pos → 1-based to match the oracle's generate_subscripts
      .select(col("label"), (col("pos") + 1).cast("long").as("pos"), col("v"))
      .groupBy(col("label"), col("pos"))
      .agg(round(
        sum(col("v").cast("double").cast(graft.Det.Exact)).cast("double")
          / count(lit(1)), 6).as("c"))
      // long format (one row per (label, dimension)) — the driver's
      // comparator sorts rows in pandas, which cannot order array cells
      .orderBy(col("label"), col("pos"))

  private val centroidsSql =
    """WITH x AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS pos,
      |    unnest(embedding) AS v
      |  FROM embeddings)
      |SELECT label, pos,
      |  round(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE)
      |    / COUNT(*), 6) AS c
      |FROM x GROUP BY label, pos
      |ORDER BY label, pos""".stripMargin

  /** Filtered vector search — top-k under a metadata predicate (the
    * vector-database problem every RAG stack hits). Strategy by filter
    * selectivity, both ends already present: a SELECTIVE predicate
    * pre-filters the candidate frame and searches exactly (this gated
    * query — correct top-k by construction, and the filter pushes down
    * to the parquet scan); a WIDE predicate keeps the IVF/LSH index and
    * post-filters its candidates, paying recall instead (compose
    * `Ann.ivfTopK` + a filter — same recall gate as unfiltered). */
  private def filtered(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Ann.bruteTopK(
      e.filter(col("vec_id") < NQueries),
      e.filter(col("label").isin(0, 1, 2)), "vec_id", "embedding", K)
      .orderBy(col("query_id"), col("rank"))
  }

  private val filteredSql =
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
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id <> c.vec_id AND c.label IN (0, 1, 2)
       |  WHERE q.vec_id < $NQueries
       |) WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  /** Semantic decontamination gate: label 9 plays the eval set (~10 %
    * of the corpus — small, broadcastable, the realistic shape), every
    * other label is train; tau 0.35 flags ~10 % of train on this
    * corpus, so both branches of the flag are exercised. */
  private def semDecontam(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Ann.semanticDecontam(
      e.filter(col("label") =!= 9), e.filter(col("label") === 9),
      "vec_id", "embedding", tau = 0.35)
      .orderBy(col("vec_id"))
  }

  private val semDecontamSql =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |         label
      |  FROM embeddings)
      |SELECT t.vec_id,
      |  max(round(list_cosine_similarity(t.v, q.v), 6)) AS max_eval_cos,
      |  (max(round(list_cosine_similarity(t.v, q.v), 6)) >= 0.35)
      |    AS contaminated
      |FROM e t JOIN e q ON q.label = 9 AND t.label <> 9
      |GROUP BY t.vec_id ORDER BY t.vec_id""".stripMargin

  // ---- distributed k-means + SemDeDup ([[ClusterOps]]) ----------------
  // Gate geometry: k=8 seeds, 2 Lloyd iterations, final assignment. The
  // oracle replays the exact loop as chained CTEs: every centroid
  // component is an exact-decimal mean rounded at 6 dp and every distance
  // a sequential within-row double fold rounded at 6 dp, so both engines
  // walk bit-identical centroids and assignments (the int8 precedent).
  private val KmK = 8
  private val KmIters = 2
  // the synthetic embeddings are near-isotropic (within-cluster cosine to
  // the representative tops out ~0.34), so the gate runs the semantic cut
  // at tau=0.2 to make the drop branch FIRE on real data; realistic-tau
  // behavior on planted near-dups is ClusterSpec's job
  private val KmTau = 0.2

  private def kmeansAssign(s: SparkSession, d: String): DataFrame =
    ClusterOps.kmeans(Tables.embeddings(s, d), "vec_id", "embedding",
      KmK, KmIters)._1
      .select(col("vec_id"), col("cid"))
      .orderBy(col("vec_id"))

  /** One Lloyd iteration as two chained CTEs (assign `aN` from `cPrev`,
    * means `mN`, next centroids `cN`); `u`/`e` are shared unnested and
    * list views of the embeddings. */
  private def kmeansCtes(iters: Int): String = {
    def assign(a: String, c: String) =
      s"""$a AS (
         |  SELECT e.vec_id, $c.cid FROM e CROSS JOIN $c
         |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |    round(list_sum(list_transform(range(1, len(e.v)+1),
         |      i -> (e.v[i] - $c.c[i]) * (e.v[i] - $c.c[i]))), 6), $c.cid) = 1)"""
        .stripMargin
    val chain = (1 to iters).map { n =>
      s"""${assign(s"a$n", s"c${n - 1}")},
         |m$n AS (
         |  SELECT cid, list(c ORDER BY pos) AS c FROM (
         |    SELECT a$n.cid, u.pos,
         |      round(CAST(SUM(CAST(ev AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6) AS c
         |    FROM a$n JOIN u USING (vec_id) GROUP BY a$n.cid, u.pos) GROUP BY cid),
         |c$n AS (SELECT c${n - 1}.cid, coalesce(m$n.c, c${n - 1}.c) AS c
         |        FROM c${n - 1} LEFT JOIN m$n USING (cid))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |u AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
       |         CAST(unnest(embedding) AS DOUBLE) AS ev
       |  FROM embeddings),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS cid,
       |         v AS c
       |  FROM e
       |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= $KmK),
       |$chain,
       |${assign("afinal", s"c$iters")}""".stripMargin
  }

  private val kmeansSql =
    s"""${kmeansCtes(KmIters)}
       |SELECT vec_id, cid FROM afinal ORDER BY vec_id""".stripMargin

  /** Cluster-quality summary over the same k-means geometry as
    * ann_kmeans: per-cluster size, inertia, and the simplified
    * (centroid-based) silhouette — the QA readout that tells an
    * operator whether k was sane before anything trusts the clusters. */
  private def kmeansQuality(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val (_, centroids) = ClusterOps.kmeans(e, "vec_id", "embedding", KmK, KmIters)
    ClusterOps.silhouette(e, "vec_id", "embedding", centroids)
      .orderBy(col("cid"))
  }

  private val kmeansQualitySql =
    s"""${kmeansCtes(KmIters)},
       |pairs AS (
       |  SELECT e.vec_id, c.cid,
       |    round(list_sum(list_transform(range(1, len(e.v)+1),
       |      i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))), 6) AS d2
       |  FROM e CROSS JOIN c$KmIters c),
       |ranked AS (
       |  SELECT vec_id, cid, d2,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |  FROM pairs),
       |per_vec AS (
       |  SELECT vec_id,
       |    MIN(CASE WHEN rn = 1 THEN cid END) AS cid,
       |    sqrt(MIN(CASE WHEN rn = 1 THEN d2 END)) AS a,
       |    sqrt(MIN(CASE WHEN rn > 1 THEN d2 END)) AS b
       |  FROM ranked GROUP BY vec_id),
       |scored AS (
       |  SELECT cid, a,
       |    CASE WHEN greatest(a, b) = 0 THEN 0.0
       |         ELSE (b - a) / greatest(a, b) END AS s
       |  FROM per_vec)
       |SELECT cid, COUNT(*) AS n,
       |  round(CAST(SUM(CAST(a AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6)
       |    AS mean_dist,
       |  round(CAST(SUM(CAST(s AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6)
       |    AS mean_silhouette
       |FROM scored GROUP BY cid ORDER BY cid""".stripMargin

  private def semanticDedup(s: SparkSession, d: String): DataFrame =
    ClusterOps.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
      KmK, KmIters, KmTau)
      .orderBy(col("vec_id"))

  private val semanticDedupSql =
    s"""${kmeansCtes(KmIters)},
       |reps AS (SELECT cid, min(vec_id) AS rep_id FROM afinal GROUP BY cid),
       |cosed AS (
       |  SELECT afinal.vec_id, afinal.cid, reps.rep_id,
       |    round(list_sum(list_transform(range(1, len(m.v)+1), i -> m.v[i] * r.v[i])) /
       |      (sqrt(list_sum(list_transform(m.v, x -> x*x))) *
       |       sqrt(list_sum(list_transform(r.v, x -> x*x)))), 6) AS rep_cos
       |  FROM afinal JOIN reps USING (cid)
       |  JOIN e m ON m.vec_id = afinal.vec_id
       |  JOIN e r ON r.vec_id = reps.rep_id)
       |SELECT vec_id, cid, rep_id, rep_cos FROM cosed
       |WHERE vec_id = rep_id OR rep_cos < $KmTau
       |ORDER BY vec_id""".stripMargin

  private val PcaDim = 64
  private val PcaIters = 10

  /** ann_pca: dominant principal component of the embedding covariance —
    * one exact integer Gram/moment pass ([[graft.functions.expr.
    * GramMatrixAgg]]) + a driver-side power iteration whose every float
    * op the oracle replays in the same within-row fold order (the
    * ann_kmeans determinism pattern). The synthetic embeddings are
    * near-isotropic (leading eigenvalues within ~1.3 %), so after the
    * fixed $PcaIters iterations both engines sit on the SAME point of
    * the convergence path — the gate asserts the method, PcaSpec proves
    * convergence on an anisotropic fixture. */
  private def pcaQ(s: SparkSession, d: String): DataFrame =
    Pca.topComponent(Tables.embeddings(s, d), "embedding", PcaDim, PcaIters)
      .orderBy(col("i"))

  /** The full exact-scatter + power-iteration CTE chain (shared by the
    * ann_pca gate and the ann_pca_project composition gate — lazy so the
    * composing SQL never sees an uninitialized fragment). */
  private lazy val pcaCtes: String = {
    val S = "1099511627776" // 2^40
    val iters = (1 to PcaIters).map { k =>
      s"""it$k AS (
         |  SELECT list_transform(w, x -> x / nrm) AS v FROM (
         |    SELECT w, sqrt(list_sum(list_transform(w, x -> x * x))) AS nrm FROM (
         |      SELECT list_transform(range($PcaDim), i ->
         |        list_sum(list_transform(range($PcaDim), j -> cm[i+1][j+1] * v[j+1]))) AS w
         |      FROM cmat, it${k - 1})))""".stripMargin
    }.mkString(",\n")
    s"""WITH terms AS (
       |  SELECT i.i AS i, j.j AS j,
       |    SUM(CAST(round(e.embedding[i.i+1]::DOUBLE * e.embedding[j.j+1]::DOUBLE * $S, 0) AS HUGEINT)) AS g
       |  FROM embeddings e, range($PcaDim) i(i), range($PcaDim) j(j)
       |  GROUP BY 1, 2),
       |mom AS (
       |  SELECT i.i AS i,
       |    SUM(CAST(round(e.embedding[i.i+1]::DOUBLE * $S, 0) AS HUGEINT)) AS m
       |  FROM embeddings e, range($PcaDim) i(i) GROUP BY 1),
       |nn AS (SELECT COUNT(*) AS n FROM embeddings),
       |a AS (
       |  SELECT t.i, t.j, CAST(nn.n * t.g * $S - mi.m * mj.m AS DOUBLE) AS c
       |  FROM terms t JOIN mom mi ON mi.i = t.i JOIN mom mj ON mj.i = t.j
       |  CROSS JOIN nn),
       |crows AS (SELECT i, list(c ORDER BY j) AS cr FROM a GROUP BY i),
       |cmat AS (SELECT list(cr ORDER BY i) AS cm FROM crows),
       |it0 AS (SELECT list_transform(range($PcaDim), x -> 0.125) AS v),
       |$iters,
       |rq AS (
       |  SELECT round((list_sum(list_transform(range($PcaDim), i ->
       |      v[i+1] * list_sum(list_transform(range($PcaDim), j -> cm[i+1][j+1] * v[j+1]))))
       |    / 1208925819614629174706176.0) / CAST(nn.n * (nn.n - 1) AS DOUBLE), 9) AS eigval
       |  FROM cmat, it$PcaIters, nn)""".stripMargin
  }

  private lazy val pcaSql: String =
    s"""$pcaCtes
       |SELECT i.i AS i, round(v[i.i+1], 9) AS loading, rq.eigval AS eigval
       |FROM it$PcaIters, rq, range($PcaDim) i(i) ORDER BY i""".stripMargin

  /** ann_pca_project: the "apply the artifact" half — every embedding
    * projected onto the trained component. The loadings (the SAME
    * round@9 values ann_pca emits) fold in as literals, so the plan is
    * a narrow zero-shuffle projection over the scan; the oracle replays
    * training AND projection in one query (composition gate). */
  private def pcaProjectQ(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val loadings = Pca.topComponent(e, "embedding", PcaDim, PcaIters)
      .orderBy(col("i")).collect().map(_.getDouble(1))
    Project.pcaProject(e, "vec_id", "embedding", loadings)
      .orderBy(col("vec_id"))
  }

  private lazy val pcaProjectSql: String =
    s"""$pcaCtes
       |SELECT e.vec_id, round(list_sum(list_transform(range($PcaDim),
       |    j -> e.embedding[j+1]::DOUBLE * round(v[j+1], 9))), 6) AS proj
       |FROM embeddings e, it$PcaIters ORDER BY e.vec_id""".stripMargin

  private val RpK = 16

  /** ann_rp: Johnson–Lindenstrauss sign projection 64 → 16 dims — the
    * cheap pre-ANN dimensionality cut whose projection matrix BOTH
    * engines derive from md5(j_k) parity (no artifact to ship). */
  private def rpQ(s: SparkSession, d: String): DataFrame =
    Project.randomProject(Tables.embeddings(s, d), "vec_id", "embedding",
        PcaDim, RpK)
      .orderBy(col("vec_id"), col("k"))

  private val rpSql =
    // the degenerate-vector guard mirrors MatVecFold's NULL contract:
    // Spark nulls ALL 16 projections when the embedding is NULL, the
    // wrong length, or carries a NULL element, whereas a bare list_sum
    // would SKIP the null terms (SUM semantics) and emit a partial sum
    s"""SELECT e.vec_id, k.k::INT AS k,
       |  CASE WHEN e.embedding IS NULL OR len(e.embedding) <> $PcaDim
       |         OR len(list_filter(e.embedding, x -> x IS NULL)) > 0
       |    THEN NULL
       |    ELSE round(list_sum(list_transform(range($PcaDim), j ->
       |      e.embedding[j+1]::DOUBLE *
       |      (CASE WHEN ('0x' || substring(md5(j || '_' || k.k), 1, 1))::INT % 2 = 0
       |            THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END))) / 4.0, 6)
       |  END AS proj
       |FROM embeddings e, range($RpK) k(k)
       |ORDER BY e.vec_id, k""".stripMargin

  val caps: Seq[Capability] = Seq(
    Capability("ann_pca",
      s"dominant principal component: one exact Gram pass + $PcaIters deterministic power iterations",
      pcaQ, Some(pcaSql)),
    Capability("ann_pca_project",
      "projection onto the trained component (literal-folded, zero-shuffle apply)",
      pcaProjectQ, Some(pcaProjectSql)),
    Capability("ann_rp",
      s"Johnson-Lindenstrauss sign projection $PcaDim->$RpK (md5-derived matrix, no artifact)",
      rpQ, Some(rpSql)),
    Capability("ann_kmeans",
      s"distributed Lloyd k-means (k=$KmK, $KmIters iterations, narrow literal-folded assignment)",
      kmeansAssign, Some(kmeansSql), bench = true),
    Capability("dedup_semantic",
      s"SemDeDup: cluster-local near-dup drop vs cluster representatives (tau=$KmTau)",
      semanticDedup, Some(semanticDedupSql)),
    Capability("ann_filtered",
      s"filtered vector search: top-$K under a metadata predicate (pre-filter exact tier)",
      filtered, Some(filteredSql)),
    Capability("pipeline_decontam_semantic",
      "embedding-level eval decontamination (broadcast eval, max-cosine flag)",
      semDecontam, Some(semDecontamSql)),
    Capability("ann_kmeans_quality",
      "per-cluster size/inertia/simplified-silhouette QA over the ann_kmeans geometry",
      kmeansQuality, Some(kmeansQualitySql)),
    // headline tracks the SCALE paths (lsh/ivf); the O(Q·N) brute
    // baseline stays a correctness gate only — a metric that dies at
    // 100× scale-up must not be the number the engine is graded on
    Capability("ann_brute", s"exact top-$K cosine neighbors for $NQueries queries", brute,
      Some(bruteSql)),
    Capability("ann_lsh", s"hyperplane-LSH bucketed top-$K (scale path)", lsh, bench = true),
    Capability("ann_ivf", s"IVF coarse-quantizer top-$K (scale path, nProbe cells)", ivf,
      bench = true),
    Capability("ann_centroids", "per-label embedding centroids (grouped element-wise mean)", centroids,
      Some(centroidsSql)),
    Capability("ann_lsh_recall", "LSH recall@k gate vs the exact baseline (constant oracle)",
      recallGate(lsh, 0.25), Some(recallGateSql)),
    Capability("ann_ivf_incremental",
      "IVF search after corpus growth on stale centroids (no retraining)",
      ivfIncremental),
    Capability("ann_ivf_incremental_recall",
      "stale-centroid IVF recall@k gate vs the exact baseline (constant oracle)",
      recallGate(ivfIncremental, 0.4), Some(recallGateSql)),
    Capability("ann_ivf_recall", "IVF recall@k gate vs the exact baseline (constant oracle)",
      recallGate(ivf, 0.35), Some(recallGateSql)),
    Capability("sparse_topk",
      s"sparse lexical top-$SparseK by exact dot product (inverted dimension index, df-capped)",
      sparseTopK, Some(sparseTopKSql), bench = true),
    Capability("ann_int8", s"int8-quantized exact top-$K (4x-memory scale path, oracle-exact)",
      int8, Some(int8Sql)),
    Capability("sparse_bm25",
      s"BM25 top-$SparseK ranking on the inverted dimension index (k1=1.2, b=0.75)",
      bm25, Some(bm25Sql)),
    Capability("ann_binary",
      s"binary sign-bit top-$K by packed XOR/popcount Hamming (32x-memory tier)",
      binary, Some(binarySql)),
    Capability("hybrid_rrf",
      s"hybrid retrieval: BM25 + dense cosine fused by reciprocal-rank fusion (k0=$RrfK0)",
      hybridRrf, Some(hybridRrfSql)),
    Capability("ann_int8_recall", "int8 recall@k gate vs the float-cosine baseline (constant oracle)",
      recallGate(int8, 0.8), Some(recallGateSql)),
    Capability("ann_ladder",
      s"quantization ladder: binary candidate tier → float re-rank, top-$K (fully gated)",
      ladder, Some(ladderSql), bench = true),
    Capability("ann_pq",
      s"product-quantization ADC top-$K + exact re-rank (compressed-domain tier)",
      pq),
    Capability("ann_pq_recall", "PQ recall@k gate vs the exact baseline (constant oracle)",
      recallGate(pq, 0.45), Some(recallGateSql)),
  )
}
