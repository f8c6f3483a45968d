package graft.pipeline

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding projections — the narrow "apply the trained artifact"
  * half of dimensionality reduction (the [[graft.pipeline.Ann]]
  * train-rarely / assign-continuously stance):
  *
  *  - [[pcaProject]] folds a TRAINED component (e.g. [[Pca]]'s emitted
  *    loadings) into each row as literals — zero shuffle, pure codegen;
  *  - [[randomProject]] is the Johnson–Lindenstrauss sign projection:
  *    the R matrix is derived from md5 of the (row, col) index pair, so
  *    BOTH engines can materialize the identical matrix from nothing
  *    (no artifact to ship at all) — the classic cheap pre-ANN
  *    dimensionality cut.
  *
  * All folds walk the vector in ascending index order (`aggregate` over
  * `zip_with` — the engine-deterministic within-row formulation), so
  * projections hash-match DuckDB's `list_sum(list_transform(...))`.
  */
object Project {

  /** Sequential within-row dot products of a vector column against each
    * row of a literal matrix, in ascending index order —
    * [[graft.functions.expr.MatVecFold]]'s fused codegen loop,
    * bit-identical to the `aggregate(zip_with(...))` folds it replaced
    * (and compiled once per JVM regardless of the matrix values). */
  private def dotsLit(vec: Column, w: Array[Array[Double]]): Column =
    graft.functions.expr.MatVecFold.dots(vec, w)

  /** Projection of each row onto one trained component: (idCol, proj)
    * with proj = Σ_j vec_j·w_j rounded at 6 dp. The component rides in
    * as a reference constant — the plan is a narrow projection over the
    * scan. */
  def pcaProject(
      df: DataFrame, idCol: String, vecCol: String,
      loadings: Array[Double]): DataFrame =
    df.select(col(idCol),
      round(element_at(dotsLit(col(vecCol), Array(loadings)), 1), 6).as("proj"))

  /** JL sign of matrix cell (j, k): +1 when the first hex digit of
    * md5("j_k") is even — `('0x' || substring(md5(j || '_' || k), 1, 1))
    * ::INT % 2` in DuckDB. */
  def jlSign(j: Int, k: Int): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"${j}_$k".getBytes(StandardCharsets.UTF_8))
    val first = (hex(0) >> 4) & 0xf
    if (first % 2 == 0) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss random sign projection from `dim` to `k`
    * dimensions: out_k = (Σ_j vec_j·sign(j,k)) / √k, rounded at 6 dp.
    * Output: (idCol, k, proj) — one row per (vector, output dim).
    * `k` must be a perfect square of a power of two so √k is exact and
    * the division stays IEEE-trivial in any engine. */
  def randomProject(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int): DataFrame = {
    require(k >= 1 && (k & (k - 1)) == 0 && (Integer.numberOfTrailingZeros(k) % 2 == 0),
      s"k must be an even power of two (1, 4, 16, 64...), got $k")
    val rootK = math.sqrt(k.toDouble) // exact for even powers of two
    val signs = Array.tabulate(k, dim)((kk, j) => jlSign(j, kk))
    // an invalid vector (NULL, wrong length, NULL element) folds to a
    // NULL array — coalesce to k NULL projections so posexplode still
    // emits the row's k output rows with NULL proj (the cardinality the
    // pre-fused per-component formulation had; a silent row drop would
    // hide the degenerate input from the caller)
    val dots = coalesce(dotsLit(col(vecCol), signs),
      array_repeat(lit(null).cast("double"), k))
    df.select(col(idCol), posexplode(dots))
      .select(col(idCol), col("pos").cast("int").as("k"),
        round(col("col") / rootK, 6).as("proj"))
  }
}
