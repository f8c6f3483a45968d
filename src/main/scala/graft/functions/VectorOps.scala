package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector primitives over `array<float>` embedding
  * columns. Computation folds in double (float inputs upcast per element)
  * so results are engine-deterministic; all pure `functions._`
  * compositions — codegen'd, no UDFs, no driver-side collect.
  */
object VectorOps {

  /** Dot product of two equal-length numeric arrays, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double — native codegen'd expression (one fused
    * loop, no intermediate arrays). Bit-identical to [[cosineHof]]. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expr.CosineSimilarity(a, b)

  /** Cosine via composable higher-order functions — the pure-builtin
    * formulation, kept as the reference twin for [[cosine]]. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Sign bit of the projection of `v` onto a deterministic pseudo-random
    * hyperplane (`planeId`). The plane's components are derived per
    * dimension from xxhash64 — reproducible across runs and executors with
    * no RNG state to ship. Used by LSH bucketing. */
  def hyperplaneBit(v: Column, planeId: Int): Column = {
    val proj = aggregate(
      zip_with(
        v,
        sequence(lit(0), size(v) - 1),
        (x, i) => {
          // hash -> [-0.5, 0.5) pseudo-uniform component
          val h = xxhash64(lit(planeId), i)
          x.cast("double") * ((h % 10007L).cast("double") / 10007.0)
        }),
      lit(0.0),
      (acc, x) => acc + x)
    (proj >= 0).cast("int")
  }

  /** LSH bucket id from `nPlanes` hyperplane sign bits, with a
    * `tableId`-seeded plane family so multiple independent hash tables can
    * be built (multi-table LSH is what lifts recall on near-orthogonal
    * high-dimensional data — one table's recall decays as cos^planes). */
  def lshBucket(v: Column, nPlanes: Int, tableId: Int = 0): Column = {
    require(nPlanes >= 1 && nPlanes <= 64,
      s"nPlanes must be in [1, 64] (bucket bits are a Long), got $nPlanes")
    (0 until nPlanes)
      .map(p => hyperplaneBit(v, tableId * 1024 + p) * lit(1L << p))
      .reduce(_ + _)
  }

  /** All `nTables` bucket assignments as an array of (table, bucket)
    * structs — explode + equi-join on both fields gives the multi-table
    * candidate set. */
  def lshBuckets(v: Column, nPlanes: Int, nTables: Int): Column =
    array((0 until nTables).map(t =>
      struct(lit(t).as("table"), lshBucket(v, nPlanes, t).as("bucket"))): _*)
}
