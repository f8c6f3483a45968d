package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Spearman rank correlation — the rank-based dependence measure next to
  * the moment-based `corr` (reference exposes the rank half as the
  * `rank` vector kernel family, `vector_rank.cc`; combining ranks with
  * Pearson is the standard composition).
  *
  * Scale shape: a global ranking is unavoidable (that is the statistic),
  * but it is a RANGE-PARTITIONED sort, never a single-partition window:
  * each column is `orderBy`'d (distributed), ranks come from
  * `zipWithIndex` (one extra job to count partition sizes, then a narrow
  * per-partition offset add), ties collapse to their average rank via a
  * value-keyed aggregate, and the fractional ranks join back on the
  * value. The final Pearson over ranks is one scalar aggregate. Nothing
  * ever concentrates on one task, so the operator survives a 100×
  * scale-up where `Window.orderBy` (no partition key) would not.
  *
  * Null rows (either column) are excluded pairwise — the same contract
  * as `corr`. */
object Spearman {

  /** Fractional (average-on-ties) ranks of `valueCol`: returns
    * (value, frac_rank) with one row per DISTINCT value. 1-based. */
  private def fracRanks(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .orderBy(col("__v"))
    val ranked = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row(r.getDouble(0), i + 1L)
    }
    spark.createDataFrame(ranked, StructType(Seq(
        StructField("__v", DoubleType), StructField("__r", LongType))))
      .groupBy(col("__v"))
      .agg((sum(col("__r")).cast("double") / count(lit(1))).as("__fr"))
  }

  /** GROUPED Spearman's rho — one coefficient per group. Unlike the
    * global statistic this needs no zipWithIndex trick: the ranks come
    * from group-PARTITIONED windows (each group's rows sort within its
    * own partition, the shape every grouped window in the engine uses),
    * tie-averaged via the fractional-rank closed form
    * `rank() + (peers − 1) / 2`. Null rows drop pairwise per group. */
  def rhoGrouped(df: DataFrame, groupCol: String, colA: String,
      colB: String, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = df.select(col(groupCol),
        col(colA).cast("double").as("__a"), col(colB).cast("double").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
    def fr(c: String) = {
      val w = Window.partitionBy(col(groupCol)).orderBy(col(c))
      val peers = Window.partitionBy(col(groupCol), col(c))
      rank().over(w) + (count(lit(1)).over(peers) - 1) / 2.0
    }
    pairs
      .withColumn("__ra", fr("__a"))
      .withColumn("__rb", fr("__b"))
      .groupBy(col(groupCol))
      .agg(guardedCorr(scale).as("rho"), count(lit(1)).as("n"))
  }

  /** Pearson over the rank columns via explicit moments: builtin `corr`
    * DIVIDES BY ZERO inside its own evaluation when a side has zero
    * variance, which under ANSI mode (Spark 4's default) THROWS where
    * DuckDB's corr returns NULL — a zero-variance (constant or
    * fully-tied) column must yield a NULL coefficient in both engines.
    * covar_samp/(stddev_samp·stddev_samp) is the identical ratio. */
  private def guardedCorr(scale: Int) = {
    val sa = stddev_samp(col("__ra"))
    val sb = stddev_samp(col("__rb"))
    when(sa > 0.0 && sb > 0.0,
      round(covar_samp(col("__ra"), col("__rb")) / (sa * sb), scale))
  }

  /** Spearman's rho between two numeric columns, rounded at `scale` dp.
    * Returns a 1-row frame (rho, n) where n is the pairwise-complete
    * count. */
  def rho(df: DataFrame, colA: String, colB: String,
      scale: Int = 6): DataFrame = {
    val pairs = df.select(
        col(colA).cast("double").as("__a"), col(colB).cast("double").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
    val ra = fracRanks(pairs, "__a")
      .select(col("__v").as("__a"), col("__fr").as("__ra"))
    val rb = fracRanks(pairs, "__b")
      .select(col("__v").as("__b"), col("__fr").as("__rb"))
    pairs
      .join(ra, Seq("__a"))
      .join(rb, Seq("__b"))
      .agg(guardedCorr(scale).as("rho"), count(lit(1)).as("n"))
  }
}
