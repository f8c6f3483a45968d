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

  /** Nelson–Aalen cumulative hazard — [[kaplanMeier]]'s additive twin:
    * H(t) = Σ_{tⱼ≤t} dⱼ/nⱼ. Where KM multiplies survival factors, NA
    * sums hazard increments — which is exactly why it's the
    * engine-exact formulation of choice: each increment dⱼ/nⱼ is one
    * IEEE division over exact integers, rounded@9 to a long, and the
    * cumulative sum is an EXACT LONG at every step (no ln/exp bridge
    * needed at all — `h9` hash-gates directly; the Fleming–Harrington
    * survival exp(−H) is one rounded readout on top). Full-wipe times
    * (d = n) are fine here — the hazard increment is 1, not a log of
    * zero. Same distinct-duration frame and censoring rule as KM.
    * Output: one row per death time (t, n_risk, d, h9, cum_hazard
    * round@6, s_fh round@6). */
  def nelsonAalen(df: DataFrame, durationCol: String,
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
    vc.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_all") - coalesce(sum(col("d") + col("cens")).over(before),
          lit(0L)))
      .withColumn("__i9",
        round(col("d").cast("double") / col("n_risk").cast("double") * 1e9,
          0).cast("long"))
      .withColumn("h9", sum(col("__i9")).over(upTo))
      .filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d"), col("h9"),
        round(col("h9").cast("double") / 1e9, 6).as("cum_hazard"),
        round(exp(col("h9").cast("double") / -1e9), 6).as("s_fh"))
  }

  /** Two-sample log-rank test (Mantel–Cox) — THE comparison that goes
    * with a [[kaplanMeier]] curve pair: "do cohort A's lifetimes differ
    * from cohort B's?", censoring-correct where a t-test on durations
    * is simply wrong (censored subjects are neither short nor long —
    * they're unfinished). Groups are 0/1 in `groupCol`.
    *
    * At each pooled death time: E₁ += d_j·n₁ⱼ/n_j and
    * V += d_j·(n₁ⱼ/n_j)(1−n₁ⱼ/n_j)(n_j−d_j)/(n_j−1); the statistic is
    * (O₁−E₁)²/V ~ χ²₁. Every per-time term is one IEEE expression over
    * EXACT integer counts, rounded@9 to a scaled long and summed
    * exactly (the KM ln-term pattern); risk sets come from cumulative
    * counts over the distinct-duration frame — the Mann–Whitney shape,
    * no subject row is ever sorted globally. Single-subject risk sets
    * (n_j = 1) contribute zero variance by the guard; V = 0 overall
    * (no comparable death time) → NULL χ².
    * Output: 1 row (n_times, o1, e1, v round@6, chi2 round@6). */
  def logRank(df: DataFrame, groupCol: String, durationCol: String,
      censoredCol: String): DataFrame = {
    val s = df.select(col(groupCol).cast("long").as("g"),
        col(durationCol).cast("long").as("t"),
        col(censoredCol).cast("boolean").as("c"))
      .filter(col("t").isNotNull && (col("g") === 0L || col("g") === 1L))
    val vc = s.groupBy(col("t")).agg(
      count(when(col("g") === 0L && !col("c"), 1)).as("d1"),
      count(when(col("g") === 1L && !col("c"), 1)).as("d2"),
      count(when(col("g") === 0L, 1)).as("a1"),
      count(when(col("g") === 1L, 1)).as("a2"))
    val tot = vc.agg(sum(col("a1")).as("t1"), sum(col("a2")).as("t2"))
    val wb = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = vc
      .withColumn("cb1", coalesce(sum(col("a1")).over(wb), lit(0L)))
      .withColumn("cb2", coalesce(sum(col("a2")).over(wb), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("n1", col("t1") - col("cb1"))
      .withColumn("n2", col("t2") - col("cb2"))
      .filter(col("d1") + col("d2") > 0L)
    def dd(c: Column) = c.cast("double")
    val nj = dd(col("n1")) + dd(col("n2"))
    val dj = dd(col("d1")) + dd(col("d2"))
    val frac = dd(col("n1")) / nj
    val e9 = round(dj * frac * 1e9, 0).cast("long")
    val v9 = when(col("n1") + col("n2") > 1L,
      round(dj * frac * (lit(1.0) - frac) * (nj - dj) / (nj - 1.0) * 1e9, 0)
        .cast("long")).otherwise(0L)
    val sums = r.select(col("d1"), e9.as("__e9"), v9.as("__v9"))
      .agg(count(lit(1)).as("n_times"), sum(col("d1")).as("o1"),
        sum(col("__e9")).as("se9"), sum(col("__v9")).as("sv9"))
    val e1 = col("se9").cast("double") / 1e9
    val v = col("sv9").cast("double") / 1e9
    val chi = (col("o1").cast("double") - e1) *
      (col("o1").cast("double") - e1) / v
    sums.select(col("n_times"), col("o1"),
      round(e1, 6).as("e1"), round(v, 6).as("v"),
      when(col("sv9") > 0L, round(chi, 6)).as("chi2"))
  }
}
