package graft.pipeline

import graft.{Capability, Tables}
import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication pipelines over the `documents` / `embeddings` tables —
  * the training-data-curation capabilities layered on top of the
  * relational core.
  *
  * Scale design: every variant is driven by a shuffle on a *content-derived
  * key* (hash, shingle, band signature), never an O(n²) comparison:
  *  - exact: hash-groupBy on sha256(text);
  *  - n-gram Jaccard: inverted shingle index self-join (pairs only form
  *    where a shingle is shared);
  *  - MinHash+LSH: banded signature equality generates candidates, exact
  *    Jaccard verifies — at 100 TB only the LSH path survives, the exact
  *    index is the small-scale oracle twin;
  *  - SimHash: 16-bit band buckets + popcount Hamming verify;
  *  - embedding near-dup: top-k closest pairs (brute at test SF; the
  *    LSH-bucketed scale path lives in SimilarityQueries).
  */
object DedupQueries {

  /** Exact dedup: content-hash groupBy keeping the lowest doc_id.
    * (Grouping by sha256 ≡ grouping by text, which is what the DuckDB
    * oracle does.) */
  private def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  private val exactSql =
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  /** Shared: (doc_id, shingle) inverted index + per-doc shingle counts →
    * exact pairwise Jaccard for pairs sharing ≥1 shingle. */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
    val inv = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val inter = inv.as("a")
      .join(inv.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("n_sh").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n_sh").as("nb")), "db")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
  }

  private def jaccardPairsSql(minJ: Double): String =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(string_split(text, ' ')) - 1),
       |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS shingle
       |  FROM documents),
       |sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
       |SELECT a.doc_id AS da, b.doc_id AS db,
       |  round(COUNT(*)::DOUBLE /
       |        (any_value(sa.n_sh) + any_value(sb.n_sh) - COUNT(*)), 6) AS jaccard
       |FROM sh a
       |JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |JOIN sz sa ON sa.doc_id = a.doc_id
       |JOIN sz sb ON sb.doc_id = b.doc_id
       |GROUP BY a.doc_id, b.doc_id
       |HAVING COUNT(*)::DOUBLE /
       |       (any_value(sa.n_sh) + any_value(sb.n_sh) - COUNT(*)) >= $minJ
       |ORDER BY da, db""".stripMargin

  /** n-gram Jaccard near-dup pairs (threshold 0.5) via the exact inverted
    * index. */
  private def ngram(s: SparkSession, d: String): DataFrame =
    jaccardPairs(s, d)
      .filter(col("jaccard") >= 0.5)
      .select(col("da"), col("db"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("da"), col("db"))

  /** MinHash + LSH near-dup pairs: 64-hash signature, 16 bands × 4 rows →
    * candidates where any band matches → exact-Jaccard verification at
    * threshold 0.8. With this banding, a true 0.8-Jaccard pair is missed
    * with p < 2e-4 (and the planted ~0.97 dups with p < 1e-7), so the
    * output equals the exact-threshold oracle. */
  private def minhash(s: SparkSession, d: String): DataFrame = {
    val nHashes = 64
    val rowsPerBand = 4
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
    val inv = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
    // signature: per (doc, hash-seed) minimum of seeded xxhash64 over shingles
    val sig = inv
      .select(
        col("doc_id"),
        explode(transform(sequence(lit(0), lit(nHashes - 1)), i =>
          struct(i.as("pos"), xxhash64(col("shingle"), i).as("h")))).as("ph"))
      .groupBy(col("doc_id"), col("ph.pos").as("pos"))
      .agg(min(col("ph.h")).as("mh"))
    val bands = sig
      .withColumn("band", floor(col("pos") / rowsPerBand))
      .groupBy(col("doc_id"), col("band"))
      .agg(concat_ws(",",
        transform(sort_array(collect_list(struct(col("pos"), col("mh")))),
          s => s.getField("mh").cast("string"))).as("band_sig"))
    val candidates = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    jaccardPairs(s, d)
      .join(candidates, Seq("da", "db"), "left_semi")
      .filter(col("jaccard") >= 0.8)
      .select(col("da"), col("db"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("da"), col("db"))
  }

  /** SimHash near-dup pairs: 64-bit shingle-level simhash, candidates via
    * 4×16-bit band buckets (pigeonhole: catches every pair with Hamming
    * distance < 4 exactly; most below 8), verified with popcount ≤ 8.
    * Hash-based → no SQL oracle; asserted against the Jaccard pairs in
    * DedupSpec. */
  private def simhash(s: SparkSession, d: String): DataFrame = {
    // per (doc, word-hash): one struct per bit with its ±1 contribution and
    // the bit's weight (computed Scala-side — bit index is static)
    val bitStructs = (0 until 64).map { bit =>
      struct(
        lit(bit).as("bit"),
        lit(1L << bit).as("weight"),
        when(shiftright(col("h"), bit).bitwiseAND(lit(1L)) =!= 0, 1)
          .otherwise(-1).as("contrib"))
    }
    // shingle-level (not word-level): the synthetic docs all draw from the
    // same small vocabulary, so word sets are near-identical corpus-wide —
    // 3-gram shingles actually separate unrelated documents
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(TextOps.shingles(col("text"), 3)).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
      .select(col("doc_id"), explode(array(bitStructs: _*)).as("bc"))
      .groupBy(col("doc_id"), col("bc.bit").as("bit"))
      .agg(sum(col("bc.contrib")).as("score"), max(col("bc.weight")).as("weight"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("score") > 0, col("weight")).otherwise(0L)).as("simhash"))
    // candidate generation: 4 × 16-bit band buckets
    val bandStructs = (0 until 4).map { k =>
      struct(lit(k).as("k"),
        shiftright(col("simhash"), 16 * k).bitwiseAND(lit(0xFFFFL)).as("bv"))
    }
    val bands = sigs.select(col("doc_id"), col("simhash"),
      explode(array(bandStructs: _*)).as("bd"))
    val candidates = bands.as("a")
      .join(bands.as("b"),
        col("a.bd.k") === col("b.bd.k") &&
          col("a.bd.bv") === col("b.bd.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .distinct()
    candidates
      .withColumn("hamming", expr("bit_count(sa ^ sb)"))
      .filter(col("hamming") <= 8)
      .select(col("da"), col("db"), col("hamming"))
      .orderBy(col("da"), col("db"))
  }

  /** Embedding near-dup: top-50 closest pairs by cosine. Brute pairwise at
    * test SF (the LSH-bucketed scale path is `ann_lsh`); ordering uses the
    * rounded cosine + ids so the cut is engine-deterministic. */
  private def embed(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    a.join(b, col("va") < col("vb"))
      .select(col("va"), col("vb"),
        round(VectorOps.cosine(col("ea"), col("eb")), 6).as("cos"))
      .orderBy(col("cos").desc, col("va"), col("vb"))
      .limit(50)
  }

  private val embedSql =
    """SELECT a.vec_id AS va, b.vec_id AS vb,
      |  round(list_cosine_similarity(
      |    list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
      |    list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |ORDER BY cos DESC, va, vb
      |LIMIT 50""".stripMargin

  val caps: Seq[Capability] = Seq(
    Capability("dedup_exact", "exact dedup via content-hash groupBy", exact, Some(exactSql)),
    Capability("dedup_ngram_jaccard", "n-gram Jaccard near-dup pairs (inverted index)", ngram,
      Some(jaccardPairsSql(0.5)), bench = true),
    Capability("dedup_minhash_lsh", "MinHash+LSH candidates, exact-verified at 0.8", minhash,
      Some(jaccardPairsSql(0.8)), bench = true),
    Capability("dedup_simhash", "SimHash band-bucketed near-dup pairs (Hamming ≤ 8)", simhash),
    Capability("dedup_embedding", "top-50 embedding pairs by cosine", embed, Some(embedSql)),
  )
}
