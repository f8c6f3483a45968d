package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimensional data clustering — the
  * layout tool for when scans filter on TWO columns: sorting by the
  * interleaved-bit key keeps rows close in BOTH dimensions inside each
  * file, so parquet footer min/max statistics prune files for box
  * predicates where a single-column sort only prunes its own column.
  *
  * Built entirely from Spark's bitwise built-ins (shiftleft / & / |),
  * so the key is whole-stage-codegen'd straight into the scan-side
  * projection — no UDF, no custom expression needed (the reference has
  * no clustering writer at all; dataset writes preserve input order,
  * cpp/src/arrow/dataset/file_base.h:389).
  *
  * Inputs are reduced mod 2^16; the production path at 100 TB first
  * range-ranks each dimension into 16-bit buckets (e.g. with
  * [[graft.operators.Quantiles]] boundaries) so arbitrary domains and
  * skew map onto the full bucket space. The gate-scale keys here are
  * already < 2^16, where mod is the identity.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so consecutive input bits land two
    * apart: 0bABCD -> 0b0A0B0C0D (classic Morton magic-mask ladder). */
  private def spread16(c: Column): Column = {
    val x0 = c.cast("bigint").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key interleaving the low 16 bits of `x` and `y`:
    * bit i of x lands at position 2i, bit i of y at 2i+1. */
  def mortonKey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** N-dimensional Morton key: bit i of dimension d lands at position
    * i*n + d, so a box predicate on ANY subset of the n columns prunes
    * files of the sorted layout — the 3-4-column generalization of
    * [[mortonKey]] (for n = 2 the bit layout is identical).
    *
    * The 62-bit sign-safe budget splits evenly across dimensions, capped
    * at 16 bits each: 2-3 dims keep the full 16-bit domain of
    * [[mortonKey]]; at 4+ dims per-dim resolution shrinks (15 bits at 4,
    * 10 at 6) — prep wide or skewed domains with [[rankBucket]] first so
    * the reduction keeps curve locality instead of wrapping. Same
    * pure-bitwise construction: ~3 codegen ops per (dim, bit), all
    * whole-stage-codegen'd into the write-side projection. */
  def mortonKeyN(cols: Seq[Column]): Column = {
    require(cols.size >= 2 && cols.size <= 8,
      s"need 2..8 dimensions to interleave, got ${cols.size}")
    val n = cols.size
    val bits = math.min(16, 62 / n)
    cols.zipWithIndex.map { case (c, d) =>
      val x = c.cast("bigint").bitwiseAND(lit((1L << bits) - 1L))
      (0 until bits).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), i * n + d)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** Range-rank `c` onto `0..boundaries.size` given ascending quantile
    * boundaries — the production prep for [[mortonKey]] on arbitrary or
    * skewed domains: boundaries from
    * [[graft.operators.Quantiles.exact]] at evenly spaced quantiles make
    * the bucket ids uniform BY CONSTRUCTION, so the interleave spreads a
    * skewed dimension evenly along the curve instead of collapsing onto
    * a few prefixes. The rank is a fold over a literal boundary array
    * (`functions.aggregate`), evaluated entirely executor-side — the
    * only driver action is computing the boundaries once per write. */
  def rankBucket(c: Column, boundaries: Seq[Double]): Column = {
    require(boundaries.nonEmpty && boundaries.size <= 65535,
      s"need 1..65535 boundaries for a 16-bit bucket id, got ${boundaries.size}")
    require(boundaries == boundaries.sorted, "boundaries must be ascending")
    aggregate(
      lit(boundaries.toArray),
      lit(0),
      (acc, b) => acc + when(c.cast("double") >= b, 1).otherwise(0))
  }
}
