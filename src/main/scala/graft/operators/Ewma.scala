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
}
