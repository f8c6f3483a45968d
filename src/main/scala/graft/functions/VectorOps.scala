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

  /** Unit-normalized copy of a numeric array (double). Zero vectors map
    * to zeros rather than NaN so downstream quantization stays total. */
  def unit(a: Column): Column = {
    val n = norm(a)
    transform(a, x =>
      when(n === 0.0, lit(0.0)).otherwise(x.cast("double") / n))
  }

  /** Per-vector symmetric int8 quantization scale for a UNIT vector:
    * `127 / max_i |u_i|` — uses the full signed-byte range regardless of
    * dimensionality (a fixed 127 scale would waste most of the 8 bits at
    * high dim, where unit components are ~1/√dim). Stored alongside the
    * codes; dequantization divides by it. */
  def int8Scale(a: Column): Column = {
    val m = array_max(transform(unit(a), x => abs(x)))
    when(m === 0.0, lit(1.0)).otherwise(lit(127.0) / m)
  }

  /** Int8 codes of the unit-normalized vector: `floor(u_i·scale + 0.5)`
    * (half-up — the same closed form evaluates identically on IEEE
    * doubles in any engine, unlike banker's rounding). Values land in
    * [-127, 127]; kept as longs so downstream integer dot products are
    * exact without overflow concern (127²·dim ≪ 2⁶³). The memory story
    * at scale is 4 bytes → 1 byte per dimension plus one double scale
    * per vector.
    *
    * NOTE: as a single composed Column the scale/norm subtrees re-evaluate
    * per ELEMENT (O(dim³) per row) — fine for specs and small frames; bulk
    * paths must stage norm/unit/scale as their own projected columns the
    * way `Ann.int8Encoded` does. */
  def quantizeInt8(a: Column): Column = {
    val s = int8Scale(a)
    transform(unit(a), x => floor(x * s + lit(0.5)).cast("long"))
  }

  /** Exact integer dot product of two equal-length integer arrays. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

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
