package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — the right-censored time-to-event
  * readout (user lifetimes, session durations, hardware survival)
  * classical engines ship in their stats extensions and this registry
  * was missing. The estimator is a running PRODUCT over event times of
  * (1 − d/n); to stay engine-exact the product is carried as a SUM of
  * per-row rounded `ln` terms in 1e-9-scaled longs (the text_pmi
  * pattern) — `log_surv_9` is an EXACT long, and the human-readable
  * S(t) is one `exp` + round@6 on top of it.
  *
  * All heavy work is value-keyed: per-subject (duration, censored)
  * rows collapse to distinct-duration counts, and the only
  * unpartitioned window runs over that duration-cardinality-bounded
  * frame (the Mann–Whitney shape). A time where the whole risk set
  * dies drives survival to exactly 0 (log undefined → NULL log column,
  * 0.0 survival) for that and all later times.
  */
object Survival {

  /** KM curve from per-subject rows (durationCol long, censoredCol
    * boolean): one row per DEATH time — (t, n_risk, d, log_surv_9,
    * survival). Censored subjects leave the risk set at their duration
    * without creating a step (the standard right-censoring rule). */
  def kaplanMeier(df: DataFrame, durationCol: String,
      censoredCol: String): DataFrame = {
    val vc = df.select(col(durationCol).cast("long").as("t"),
        col(censoredCol).cast("boolean").as("__c"))
      .filter(col("t").isNotNull)
      .groupBy(col("t"))
      .agg(count(when(!col("__c"), 1)).as("d"),
        count(when(col("__c"), 1)).as("cens"))
    val tot = vc.agg(sum(col("d") + col("cens")).as("n_all"))
    val before = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def dD(c: Column) = c.cast("double")
    val staged = vc.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_all") - coalesce(sum(col("d") + col("cens")).over(before), lit(0L)))
      // ln(1 - d/n) as an exact scaled long; NULL at full-wipe times
      .withColumn("__l9",
        when(col("d") > 0 && col("d") < col("n_risk"),
          round(log((col("n_risk") - col("d")).cast("double") / dD(col("n_risk"))) *
            1e9, 0).cast("long"))
          .when(col("d") === 0, lit(0L)))
      .withColumn("__wiped",
        max(when(col("d") >= col("n_risk") && col("d") > 0, 1).otherwise(0))
          .over(upTo))
      .withColumn("log_surv_9",
        when(col("__wiped") === 0, sum(col("__l9")).over(upTo)))
    staged.filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d"), col("log_surv_9"),
        when(col("__wiped") === 1, lit(0.0))
          .otherwise(round(exp(col("log_surv_9").cast("double") / 1e9), 6))
          .as("survival"))
  }
}
