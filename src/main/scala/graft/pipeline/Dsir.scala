package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling" — the
  * standard method for tilting a raw web corpus toward a high-quality
  * target domain without training a classifier).
  *
  * Both "language models" are bag-of-hashed-bigram models: bigrams hash
  * into [[Drift.Buckets]] md5 buckets (the same fixed-width trick as
  * [[Drift]] — the feature space is 64 counters regardless of
  * vocabulary, so the target and raw models are bounded artifacts, and
  * hashed features are exactly what the paper uses). With add-one
  * smoothing, each document's importance log-weight is
  * `Σ_b n_b(x) · (ln p̂_target(b) − ln p̂_raw(b))`; selection then draws
  * without replacement with probability ∝ the weight via the
  * Gumbel-top-k trick, using the engine-portable 48-bit md5 uniform of
  * [[Sharding.weightedTopN]] so any engine reproduces the draw.
  *
  * Determinism contract (the gate mirrors it in DuckDB): per-bucket
  * log-ratios are IEEE doubles rounded at 9 dp; per-doc terms
  * `n_b · lr_b` scale to exact 1e-9-unit longs and sum
  * order-independently (the [[Drift]] contract); the Gumbel term is the
  * only other transcendental and is rounded at 9 dp before the final
  * rounded add. Documents with fewer than two tokens have no bigram
  * evidence and drop from scoring — by construction in both engines.
  *
  * Scale shape: the two bucket-count models are ONE 64-row aggregate
  * over the exploded bigrams (map-side combined — (bucket, count) pairs
  * shuffle, never text) joined broadcast into the per-doc scoring; the
  * per-doc counts are (doc, bucket)-keyed with map-side combine, ≤64
  * rows per doc; selection is a TakeOrderedAndProject top-k, never a
  * global sort.
  */
object Dsir {

  /** Hashed-bigram bucket of a text's adjacent word pairs. */
  private def bigramBuckets(textCol: String): Column =
    graft.functions.TextOps.ngrams(col(textCol), 2)

  /** Per-bucket importance log-ratios `(b, lr)`: one corpus pass counts
    * every bucket for the raw corpus and (via `targetPred`, a boolean
    * over the corpus columns) for the target slice, then
    * `lr_b = round(ln((ct_b+1)/(Ct+B)) − ln((cr_b+1)/(Cr+B)), 9)`.
    * 64-row output — broadcast it into [[logWeights]]. Buckets absent
    * from the raw corpus are absent here, which is sound because no raw
    * document can produce them. */
  def bucketLogRatios(
      docs: DataFrame, textCol: String, targetPred: Column): DataFrame = {
    val b = Drift.Buckets
    val bg = docs
      .select(targetPred.cast("int").as("t"),
        explode(bigramBuckets(textCol)).as("bg"))
    val c = bg.groupBy(Drift.bucketOf(col("bg")).as("b"))
      .agg(count(lit(1)).as("cr"), sum(col("t")).as("ct"))
    val tot = c.agg(sum(col("cr")).as("rtot"), sum(col("ct")).as("ttot"))
    c.crossJoin(broadcast(tot))
      .select(col("b"),
        round(
          log((col("ct") + lit(1.0)) / (col("ttot") + lit(b.toDouble))) -
            log((col("cr") + lit(1.0)) / (col("rtot") + lit(b.toDouble))),
          9).as("lr"))
  }

  /** Per-document importance log-weights `(id, n_bigrams, logw)` against
    * a broadcast `(b, lr)` ratio table from [[bucketLogRatios]]. */
  def logWeights(
      docs: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame): DataFrame = {
    val nb = docs
      .select(col(idCol), explode(bigramBuckets(textCol)).as("bg"))
      .groupBy(col(idCol), Drift.bucketOf(col("bg")).as("b"))
      .agg(count(lit(1)).as("n"))
    nb.join(broadcast(ratios), Seq("b"))
      .select(col(idCol), col("n"),
        round(col("n") * col("lr") * lit(1e9), 0).cast("long").as("e"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_bigrams"),
        (sum(col("e")).cast("double") / lit(1e9)).as("logw"))
  }

  /** Gumbel-top-`n` importance resample: each scored document draws the
    * deterministic 48-bit md5 uniform `u = (prefix48 + 0.5) / 2^48` and
    * competes on `key = logw + Gumbel(u)` with `Gumbel(u) =
    * −ln(−ln u)` — the classic reparameterization of sampling without
    * replacement ∝ exp(logw). The `n` LARGEST keys win (ties break by
    * id); resampling is changing nothing — the draw is a pure function
    * of the id, reproducible on any engine. */
  def selectTopN(
      docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val b = Drift.Buckets
    // ONE corpus pass: the (doc, bucket) counts are the shared partials —
    // both bucket models AND the per-doc scoring derive from them (the
    // unigram-LM trick), so the text explodes once, not once per model;
    // the (id, b) exchange is reused by Spark across the two consumers.
    // Arithmetic is identical to composing bucketLogRatios + logWeights
    // (cr/ct are the same sums, grouped differently).
    val nb = docs
      .select(col(idCol), targetPred.cast("int").as("__t"),
        explode(bigramBuckets(textCol)).as("bg"))
      .groupBy(col(idCol), Drift.bucketOf(col("bg")).as("b"))
      .agg(count(lit(1)).as("n"), max(col("__t")).as("t"))
    val c = nb.groupBy(col("b"))
      .agg(sum(col("n")).as("cr"), sum(col("n") * col("t")).as("ct"))
    val tot = c.agg(sum(col("cr")).as("rtot"), sum(col("ct")).as("ttot"))
    val ratios = c.crossJoin(broadcast(tot))
      .select(col("b"),
        round(
          log((col("ct") + lit(1.0)) / (col("ttot") + lit(b.toDouble))) -
            log((col("cr") + lit(1.0)) / (col("rtot") + lit(b.toDouble))),
          9).as("lr"))
    val lw = nb.join(broadcast(ratios), Seq("b"))
      .select(col(idCol), col("n"),
        round(col("n") * col("lr") * lit(1e9), 0).cast("long").as("e"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_bigrams"),
        (sum(col("e")).cast("double") / lit(1e9)).as("logw"))
    val u = (graft.functions.expr.Md5Prefix(col(idCol).cast("string"), 12)
      .cast("double") + lit(0.5)) / lit(281474976710656.0) // 2^48
    val gum = round(-log(-log(u)), 9)
    lw.withColumn("skey", round(col("logw") + gum, 9))
      .orderBy(col("skey").desc, col(idCol))
      .limit(n)
  }
}
