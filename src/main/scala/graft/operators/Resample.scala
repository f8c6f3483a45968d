package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with linear interpolation — the
  * kdb/pandas-style `resample`: irregular samples become a fixed-step
  * series per key, each grid point interpolated between its bracketing
  * observations.
  *
  * Shape: per-key (min, max) bounds (one aggregate) expand into the grid
  * via `sequence` (narrow explode). Bracket search is a BINNED range
  * join, not an as-of theta join: resample keys are typically FEW and
  * HUGE (five event types here — a per-key as-of cross costs
  * |grid|·|events| per key), so observations bin by the `maxGap`
  * horizon and each grid point equi-joins its two adjacent bins —
  * candidates per point are bounded by the observations inside
  * 2·maxGap, regardless of how many rows share a key (the same
  * quantize-the-axis trick as [[RangeJoin]], with the key folded into
  * the join). A window argmax/argmin picks the latest at-or-before and
  * earliest at-or-after observation; ties on an equal timestamp break
  * by `idCol` (latest for backward, earliest for forward), mirroring
  * the as-of tie rules. A grid point missing either bracket within
  * `maxGap` is a GAP and yields NULL — resampling across unbounded
  * holes is a lie, so the horizon is explicit.
  *
  * Determinism: interpolation runs on microsecond longs,
  * `(g−tb)/(tf−tb)` as one long/long→double division — arithmetic a
  * SQL oracle reproduces bit-for-bit. */
object Resample {

  private def micros(spec: String): Long = {
    val parts = spec.trim.toLowerCase.split("\\s+")
    require(parts.length == 2, s"expected '<n> <unit>', got '$spec'")
    val base = parts(1) match {
      case "day" | "days"         => 86400000000L
      case "hour" | "hours"       => 3600000000L
      case "minute" | "minutes"   => 60000000L
      case "second" | "seconds"   => 1000000L
      case other => throw new IllegalArgumentException(
        s"unsupported maxGap unit '$other'")
    }
    parts(0).toLong * base
  }

  def linear(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      idCol: String, step: String, maxGap: String): DataFrame = {
    val binW = micros(maxGap)
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__mn"), max(col(tsCol)).as("__mx"))
    val grid = bounds.select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"),
          expr(s"INTERVAL $step"))).as("g"))
      .withColumn("__gt", unix_micros(col("g")))
      .withColumn("__gbin", floor(col("__gt") / binW))
    val ev = df.select(col(keyCol).as("__k"),
        unix_micros(col(tsCol)).as("__t"),
        col(valCol).as("__v"), col(idCol).as("__i"))
      .withColumn("__bin", floor(col("__t") / binW))

    // one banded bracket search; backward keeps the latest observation in
    // [g - maxGap, g], forward the earliest in [g, g + maxGap]
    def bracket(backward: Boolean, tAs: String, vAs: String): DataFrame = {
      val bins =
        if (backward) array(col("__gbin") - 1, col("__gbin"))
        else array(col("__gbin"), col("__gbin") + 1)
      val range =
        if (backward) col("__t") <= col("__gt") && col("__t") >= col("__gt") - binW
        else col("__t") >= col("__gt") && col("__t") <= col("__gt") + binW
      // nulls last on BOTH directions: the left join emits null-extended
      // rows for empty bins, and asc's default nulls-first would let one
      // outrank a real candidate
      val order: Seq[Column] =
        if (backward) Seq(col("__t").desc_nulls_last, col("__i").desc_nulls_last)
        else Seq(col("__t").asc_nulls_last, col("__i").asc_nulls_last)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(keyCol), col("g")).orderBy(order: _*)
      grid
        .withColumn("__gb", explode(bins))
        .join(ev, col(keyCol) === col("__k") && col("__gb") === col("__bin") &&
          range, "left")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col(keyCol), col("g"), col("__gt"),
          col("__t").as(tAs), col("__v").as(vAs))
    }

    val back = bracket(backward = true, "__tb", "__vb")
    val fwd = bracket(backward = false, "__tf", "__vf")
      .select(col(keyCol), col("g"), col("__tf"), col("__vf"))
    back.join(fwd, Seq(keyCol, "g"))
      .select(col(keyCol), col("g"),
        when(col("__tb").isNotNull && col("__tf").isNotNull,
          when(col("__tf") === col("__tb"), col("__vb"))
            .otherwise(col("__vb") + (col("__vf") - col("__vb")) *
              ((col("__gt") - col("__tb")) / (col("__tf") - col("__tb")))))
          .as("value"))
  }
}
