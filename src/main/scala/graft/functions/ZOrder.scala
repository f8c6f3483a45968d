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
}
