package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column, and the
  * SemDeDup-style semantic dedup built on top of it (Abbas et al. 2023:
  * cluster the corpus, then drop near-duplicate members inside each
  * cluster — the scale path for embedding-level dedup, because the
  * quadratic candidate search is confined to cluster-local pairs).
  *
  * This is the FULL-CORPUS counterpart of [[Ann.trainCentroids]] (which
  * trains on a bounded driver-side sample): every assignment pass sees
  * every vector, so the centroids converge on the true cluster structure
  * rather than the sample's. The per-iteration shape is built for 100 TB:
  *
  *  - **assignment is narrow** — the k centroids fold into the projection
  *    as literals (same stance as the PQ codebook, `Ann.pqTopK`), so the
  *    k squared-L2 distances and the argmin are whole-stage-codegen'd
  *    per row with NO shuffle and NO join;
  *  - **update is one exchange** — members posexplode to (cid, pos, v)
  *    and the element-wise mean aggregates with map-side combine
  *    (the ann_centroids shape: partials carry (cid, pos, sum, count),
  *    never vectors);
  *  - the k·dim rounded centroid components are the loop's bounded,
  *    documented driver exchange per iteration (≤ a few KB — the same
  *    stance as [[Bpe.train]]'s per-round argmax row).
  *
  * Determinism (the oracle contract): seeds are the k vectors first in
  * `(md5(id), id)` order; element means go through the exact-decimal sum
  * (`Det`) and round at 6 dp, so every centroid component is the
  * identical double in Spark and DuckDB; distances fold sequentially in
  * array order per row (bit-identical IEEE across engines, the int8
  * precedent) and round at 6 dp before the argmin with a cid tie-break.
  */
object ClusterOps {

  /** Rounded squared-L2 distances to every centroid as ONE fused codegen
    * loop ([[graft.functions.expr.MatVecFold]]) — bit-identical to the k
    * separate `aggregate(zip_with(...))` folds it replaced (sequential
    * in-array-order accumulation, 6 dp round per element) but compiled
    * once per JVM: the centroid matrix rides in `references`, so Lloyd
    * iterations reuse the same generated class instead of re-deriving k
    * literal subtrees per pass (the r12 ann_kmeans bench-swing fix). */
  private def dist2All(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.expr.MatVecFold.distances2(vec, centroids)

  /** Nearest-centroid id (argmin of [[dist2All]], ties to the lower cid)
    * as a narrow literal-folded projection — no join, no shuffle. */
  private def assignExpr(vec: Column, centroids: Array[Array[Double]]): Column = {
    val ds = dist2All(vec, centroids)
    (array_position(ds, array_min(ds)) - 1).cast("int")
  }

  /** Deterministic seed centroids: the k vectors first in
    * `(md5(id), id)` order — uniform pseudo-random yet reproducible in
    * any engine (first-k-by-id would seed on the corpus head). Bounded
    * driver exchange: k rows. */
  private def seeds(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Array[Array[Double]] =
    df.orderBy(md5(col(idCol).cast("string")), col(idCol))
      .select(col(vecCol)).limit(k)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** One centroid-update pass: element-wise exact-decimal mean of each
    * cluster's members, rounded at 6 dp; clusters that lost every member
    * keep their previous centroid (the standard Lloyd convention, same
    * as [[Ann.trainCentroids]]). Bounded driver exchange: k·dim rows. */
  private def updateCentroids(assigned: DataFrame, vecCol: String,
      prev: Array[Array[Double]]): Array[Array[Double]] = {
    val dim = prev.head.length
    val rows = assigned
      // a vector whose length differs from the seeds' has NULL distances
      // to every centroid and therefore a NULL cid (zip_with pads with
      // nulls): such rows are visibly unassigned in the output and must
      // not poison the centroid means here
      .filter(col("cid").isNotNull)
      .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg((graft.Det.dsum(col("v").cast("double")) / count(lit(1))).as("m"))
      .select(col("cid"), col("pos"), round(col("m"), 6).as("c"))
      .collect()
    val next = prev.map(_.clone())
    rows.foreach { r =>
      next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    require(rows.isEmpty || rows.map(_.getInt(1)).max < dim,
      "updateCentroids: vector dimension exceeds the seed dimension")
    next
  }

  /** Distributed Lloyd's k-means: returns (assignments, centroids) where
    * assignments is the input frame plus a `cid` column (narrow — safe to
    * keep in a longer pipeline) and centroids is the final k×dim array.
    * `iterations` counts UPDATE passes; the returned assignment is
    * against the final centroids (so `iterations = 0` is pure
    * seed-assignment). */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int): (DataFrame, Array[Array[Double]]) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    var centroids = seeds(df, idCol, vecCol, k)
    require(centroids.nonEmpty, "kmeans: empty input")
    var it = 0
    while (it < iterations) {
      val assigned = df.withColumn("cid", assignExpr(col(vecCol), centroids))
      centroids = updateCentroids(assigned, vecCol, centroids)
      it += 1
    }
    (df.withColumn("cid", assignExpr(col(vecCol), centroids)), centroids)
  }

  /** Nearest-centroid assignment against an ALREADY-TRAINED centroid
    * array — the "train rarely, assign continuously" half of the k-means
    * family (the [[Ann.ivfAssign]] stance, minus its join: the centroids
    * fold into the projection as literals). Being a pure narrow
    * stateless transform, the same call classifies a STREAMING frame of
    * arriving vectors with no state, watermark, or shuffle —
    * StreamingSpec asserts batch bit-parity. */
  def assign(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "assign: empty centroid set")
    df.withColumn("cid", assignExpr(col(vecCol), centroids))
  }

  /** Per-cluster quality summary: size, mean within-cluster distance
    * (inertia), and the mean simplified SILHOUETTE — per point,
    * `(b − a) / max(a, b)` where `a` is the distance to the OWN centroid
    * and `b` the distance to the nearest OTHER centroid (the
    * centroid-based simplification every large-scale clustering QA uses;
    * the pairwise original is O(n²) and exists only as a spec check).
    * Distances are sqrt of the 6-dp-rounded squared folds (identical
    * IEEE in any engine); the means follow the exact-decimal contract.
    *
    * Everything per-row is literal-folded and narrow — the only
    * exchange carries (cid, partial sums). */
  def silhouette(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.length >= 2, "silhouette needs at least 2 centroids")
    val d2 = dist2All(col(vecCol), centroids)
    val ds = centroids.indices.map(i => sqrt(element_at(d2, i + 1)))
    val own = assignExpr(col(vecCol), centroids)
    // distance to own centroid, and min over the others
    val a = ds.zipWithIndex.foldLeft(lit(Double.NaN)) { case (acc, (d, i)) =>
      when(own === i, d).otherwise(acc)
    }
    val b = ds.zipWithIndex.map { case (d, i) =>
      when(own === i, lit(Double.PositiveInfinity)).otherwise(d)
    }.reduce((x, y) => least(x, y))
    val s = when(greatest(a, b) === 0.0, lit(0.0))
      .otherwise((b - a) / greatest(a, b))
    df.select(own.as("cid"), a.as("__a"), s.as("__s"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"),
        round(graft.Det.dsum(col("__a")) / count(lit(1)), 6).as("mean_dist"),
        round(graft.Det.dsum(col("__s")) / count(lit(1)), 6).as("mean_silhouette"))
  }

  /** Sequential-fold cosine between two array<float> columns, rounded at
    * 6 dp — [[graft.functions.expr.CosineSimilarity]] accumulates its
    * three sums in array order (same fold order as the HOF formulation,
    * fused codegen loop). One DOCUMENTED divergence from the HOF form on
    * degenerate input: a NULL element inside an array reads as 0.0
    * (the expression's dense-embedding contract) instead of nulling the
    * score — SemDedup's inputs are dense by contract ([[semanticDedup]]
    * feeds raw embedding columns), and NULL inputs / length mismatches
    * still yield NULL. */
  private def cosine6(a: Column, b: Column): Column =
    round(graft.functions.expr.CosineSimilarity(a, b), 6)

  /** SemDeDup: k-means the corpus, keep each cluster's representative
    * (the lowest id), drop every other member whose cosine to its
    * cluster's representative is >= `tau`, keep the rest. Output: one row
    * per SURVIVING vector with its cluster and its cosine to the
    * representative (the representative itself scores 1.0 by definition
    * but keeps its computed value for honesty).
    *
    * Scale shape: the candidate search is cluster-local BY CONSTRUCTION —
    * each member is compared against exactly ONE representative row
    * (k rows total, broadcast), so the per-member cost is O(dim), not
    * O(n·dim) like [[Dedup.embeddingPairs]]'s banded search. The price is
    * recall at cluster boundaries (a near-dup pair split across clusters
    * is missed) — the standard SemDeDup trade, spec'd in ClusterSpec. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int, tau: Double): DataFrame = {
    val (assigned, _) = kmeans(df, idCol, vecCol, k, iterations)
    val reps = assigned
      .groupBy(col("cid")).agg(min(col(idCol)).as("rep_id"))
    val repVecs = reps
      .join(assigned.select(col(idCol).as("rep_id"), col(vecCol).as("rep_vec")),
        Seq("rep_id"))
    assigned
      .join(broadcast(repVecs), Seq("cid"))
      .withColumn("rep_cos", cosine6(col(vecCol), col("rep_vec")))
      .filter(col(idCol) === col("rep_id") || col("rep_cos") < tau)
      .select(col(idCol), col("cid"), col("rep_id"), col("rep_cos"))
  }
}
