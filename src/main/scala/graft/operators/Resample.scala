package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with linear interpolation — the
  * kdb/pandas-style `resample` the as-of family naturally composes into:
  * irregular samples become a fixed-step series per key, each grid point
  * interpolated between its bracketing observations.
  *
  * Shape: per-key (min, max) bounds (one aggregate) expand into the grid
  * via `sequence` (narrow explode); a BACKWARD as-of join fetches the
  * latest observation at-or-before each grid point and a FORWARD as-of
  * the earliest at-or-after ([[AsOfJoin]] — both are the gated range +
  * window-dedup operators, so the candidate volume is bounded by
  * `maxGap`, never per-key quadratics). A grid point missing either
  * bracket within `maxGap` is a GAP and yields NULL — resampling across
  * unbounded holes is a lie, so the horizon is explicit.
  *
  * Determinism: interpolation runs on microsecond longs
  * (`unix_micros`), `(g−tb)/(tf−tb)` as one long/long→double division —
  * arithmetic a SQL oracle reproduces bit-for-bit; observation ties on
  * an equal timestamp break by `idCol` (latest for backward, earliest
  * for forward), mirroring the as-of tie rules. */
object Resample {

  def linear(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      idCol: String, step: String, maxGap: String): DataFrame = {
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__mn"), max(col(tsCol)).as("__mx"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__mn"), col("__mx"),
        expr(s"INTERVAL $step"))).as("g"))
    val gid = struct(col(keyCol), col("g"))
    val tol = expr(s"INTERVAL $maxGap")
    val back = AsOfJoin.backward(
      grid,
      df.select(col(keyCol).as("__kb"), col(tsCol).as("__tb"),
        col(valCol).as("__vb"), col(idCol).as("__ib")),
      onLeft = col("g"), onRight = col("__tb"),
      by = Seq((col(keyCol), col("__kb"))),
      tolerance = tol, leftId = gid, tieBreak = col("__ib"))
    val both = AsOfJoin.forward(
      back,
      df.select(col(keyCol).as("__kf"), col(tsCol).as("__tf"),
        col(valCol).as("__vf"), col(idCol).as("__if")),
      onLeft = col("g"), onRight = col("__tf"),
      by = Seq((col(keyCol), col("__kf"))),
      tolerance = tol, leftId = gid, tieBreak = col("__if"))
    both.select(col(keyCol), col("g"),
      when(col("__tb").isNotNull && col("__tf").isNotNull,
        when(col("__tf") === col("__tb"), col("__vb"))
          .otherwise(col("__vb") + (col("__vf") - col("__vb")) *
            ((unix_micros(col("g")) - unix_micros(col("__tb"))) /
              (unix_micros(col("__tf")) - unix_micros(col("__tb"))))))
        .as("value"))
  }
}
