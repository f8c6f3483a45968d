package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed exponentially-weighted moving average — the kdb/pandas
  * `ewm(span=...).mean()` smoother over per-key event streams (metric
  * smoothing, trend extraction, anomaly baselines). The classic
  * recursive form `y_i = α·x_i + (1−α)·y_{i−1}` carries unbounded
  * history, which neither a bounded-state stream nor an engine-portable
  * oracle can mirror; this operator computes the WINDOWED (normalized)
  * form over the trailing `window` observations:
  *
  *   ewma_i = Σ_{j=0..n−1} (1−α)^{n−1−j} · x_j  /  Σ_j (1−α)^{n−1−j}
  *
  * (x_0 oldest in the frame, x_{n−1} current; pandas' `adjust=True` over
  * a bounded window). Truncation error vs the unbounded form is
  * (1−α)^window — at α=0.5, window=8 that is 0.4 %, and the state is
  * bounded by construction.
  *
  * Determinism contract: the frame array is collected in window order,
  * both the weighted sum and the weight total are SEQUENTIAL within-row
  * folds (bit-identical across engines — the k-means precedent), and
  * the final quotient rounds at 9 dp. With α a dyadic rational (0.5,
  * 0.25, ...) the weights are exact binary doubles, so even `pow`
  * carries no cross-engine risk. NULL values are excluded before
  * windowing (an unobserved sample neither contributes mass nor decays
  * its neighbors).
  *
  * Scale shape: one key-partitioned window whose frame is capped at
  * `window` rows — per-row state is a ≤window-element array, the same
  * bound a streaming twin would carry; no global sort, no unbounded
  * frame. */
object Ewma {

  def smooth(
      df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, alpha: Double, window: Int): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1), got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    val decay = lit(1.0 - alpha)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(window - 1), 0)
    val arr = collect_list(col(valCol).cast("double")).over(w)
    def wexp(n: Column, i: Column): Column =
      pow(decay, (n - lit(1) - i).cast("double"))
    val num = (a: Column) => aggregate(
      transform(a, (x, i) => x * wexp(size(a), i)), lit(0.0), (acc, x) => acc + x)
    val den = (a: Column) => aggregate(
      transform(a, (_, i) => wexp(size(a), i)), lit(0.0), (acc, x) => acc + x)
    df.filter(col(valCol).isNotNull)
      .withColumn("__arr", arr)
      .withColumn("ewma", round(num(col("__arr")) / den(col("__arr")), 9))
      .drop("__arr")
  }

  /** EWMA-baseline anomaly detection — the standard metrics-monitoring
    * rule: each observation compares against the exponentially-weighted
    * mean and standard deviation of the PRECEDING `window` observations
    * (current row excluded — a spike must not dampen its own baseline):
    * `anomaly = |x − m| > k·s`. Weighted variance is the weighted mean
    * of squares minus the squared weighted mean, floored at 0 (exact
    * arithmetic can dip epsilon-negative).
    *
    * Conventions (mirroring [[graft.pipeline.Expectations]]'s MAD rule):
    * rows with fewer than `minObs` prior observations emit NULL flag and
    * score (insufficient history is not "normal"); a zero-variance
    * baseline flags ANY deviation and emits a NULL score (no finite
    * z-score exists). `sqrt` is exactly rounded under IEEE-754, so the
    * whole rule carries no cross-engine risk beyond the dyadic-alpha
    * contract of [[smooth]].
    *
    * Output adds `score` (round@6 z-score) and `anomaly` (boolean). Same
    * bounded-frame scale shape as [[smooth]]. */
  def anomalies(
      df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, alpha: Double, window: Int,
      k: Double = 3.0, minObs: Int = 4): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1), got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    require(minObs >= 1 && minObs <= window,
      s"minObs in [1, window], got $minObs")
    val decay = lit(1.0 - alpha)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-window, -1)
    def wexp(n: Column, i: Column): Column =
      pow(decay, (n - lit(1) - i).cast("double"))
    def wsum(a: Column, f: Column => Column): Column = aggregate(
      transform(a, (x, i) => f(x) * wexp(size(a), i)), lit(0.0),
      (acc, x) => acc + x)
    val den = (a: Column) => aggregate(
      transform(a, (_, i) => wexp(size(a), i)), lit(0.0), (acc, x) => acc + x)
    val x = col(valCol).cast("double")
    // guard the divisions behind the history check: an empty/short frame
    // would divide by a zero weight total (an ANSI error, not a NaN) and
    // its outputs are NULL anyway
    val enough = size(col("__arr")) >= minObs
    val m = when(enough, wsum(col("__arr"), identity) / den(col("__arr")))
    val s = when(enough, sqrt(greatest(
      wsum(col("__arr"), v => v * v) / den(col("__arr")) - col("__m") * col("__m"),
      lit(0.0))))
    df.filter(col(valCol).isNotNull)
      .withColumn("__arr", collect_list(x).over(w))
      .withColumn("__m", m)
      .withColumn("__s", s)
      .withColumn("score",
        when(size(col("__arr")) >= minObs && col("__s") > 0.0,
          round((x - col("__m")) / col("__s"), 6)))
      .withColumn("anomaly",
        when(size(col("__arr")) < minObs, lit(null).cast("boolean"))
          .otherwise(when(col("__s") === 0.0, x =!= col("__m"))
            .otherwise(abs(x - col("__m")) > lit(k) * col("__s"))))
      .drop("__arr", "__m", "__s")
  }
}
