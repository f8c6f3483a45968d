package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) per-group outlier detection — the
  * data-cleaning companion to mean/stddev z-scores, which a single
  * extreme value can drag far enough to hide itself (the classic
  * masking failure). Median and MAD have a 50 % breakdown point, so the
  * flag survives grossly contaminated groups.
  *
  * Both location (per-group median) and scale (median absolute
  * deviation) come from [[Quantiles.exactGrouped]] — the single-shuffle
  * window rank selection, no per-group value buffers — and ride back on
  * group-keyed joins (one row per group each; Spark broadcasts them).
  * The row-level deviation, score, and flag are narrow IEEE expressions,
  * so the whole operator is two grouped quantile passes + two broadcast
  * joins regardless of corpus size.
  *
  * A zero MAD (more than half the group identical) makes the score
  * undefined: by convention any row OFF the median is then flagged with
  * a NULL score (infinitely many MADs away), and median rows pass. */
object Robust {

  /** Rows of `df` whose |value − group median| exceeds `k` × group MAD.
    * Output: every input column plus (med, mad, mad_score) where
    * mad_score = |v − med| / mad rounded at 6 dp (NULL when mad = 0). */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      k: Double): DataFrame = {
    require(k > 0.0, s"k must be positive, got $k")
    val med = Quantiles.exactGrouped(df, groupCol, valCol, Seq(0.5))
      .select(col(groupCol), col("q0").as("med"))
    val withDev = df
      .filter(col(valCol).isNotNull)
      .join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valCol).cast("double") - col("med")))
    val mad = Quantiles.exactGrouped(withDev, groupCol, "__dev", Seq(0.5))
      .select(col(groupCol), col("q0").as("mad"))
    withDev
      .join(broadcast(mad), Seq(groupCol))
      .filter(when(col("mad") === 0.0, col("__dev") > 0.0)
        .otherwise(col("__dev") > lit(k) * col("mad")))
      .withColumn("mad_score",
        when(col("mad") === 0.0, lit(null).cast("double"))
          .otherwise(round(col("__dev") / col("mad"), 6)))
      .drop("__dev")
  }
}
