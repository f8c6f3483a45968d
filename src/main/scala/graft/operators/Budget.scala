package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SHARED quadratic-estimator surface: every pairwise-by-definition
  * statistic (Theil–Sen slopes, Mann–Kendall / Kendall-τ sign pairs,
  * Hodges–Lehmann shifts, Rousseeuw–Croux Qn differences — and the next
  * one) builds from these three pieces instead of hand-tuning its own
  * sample threshold or pair join. Promoted from StatTests' private
  * internals per the round-12 verdict so a future estimator CANNOT
  * regress to a hand constant (q67's '20'→'08' lottery constant cost
  * 453 s and an OOM at just 10× before the budget form replaced it).
  *
  * **The constant-size-by-construction guarantee.** [[points]] keeps an
  * EXPECTED ~`targetPoints` rows per group at ANY corpus size, so the
  * strict pair frame [[orderedPairs]] builds over it is expected
  * O(targetPoints²) per group FOREVER — scale-factor-invariant with no
  * re-tuning, measured flat across two decades (sf0.1→sf10: q67 8.8×,
  * q72 13.3×, q84 1.12× — data grew 100×, the pair frames did not).
  * The guarantee is per-GROUP and probabilistic (md5 is uniform), with
  * graceful degradation at the clamps: groups at or under budget keep
  * everything (τ clamps to 2³², never 0 — no group empties), and only
  * beyond n ≈ 1.7e12 rows per group does the τ = 1 clamp bind (keep
  * degrades to n/2³², never to the raw quadratic).
  *
  * Determinism (the oracle-replay contract): selection depends only on
  * md5(id) and the per-group count — pure integer threshold arithmetic
  * both engines compute bit-identically (count CTE + the same clamp in
  * DuckDB; `div` on both sides). No RNG, no sampling operator, no
  * partition-order dependence.
  */
object Budget {

  /** Budget-adaptive md5 lottery: each group's keep threshold is
    * τ = clamp(⌊2³²·targetPoints / n⌋, 1, 2³²) over the EIGHT-hex
    * md5(id) prefix read as an integer — expected ~targetPoints kept
    * rows per group at any corpus size (see the object scaladoc for the
    * full guarantee). The 2³² granularity matters: a 4-hex lottery
    * floors τ to its clamp at n > 65536·targetPoints and the kept
    * sample would grow as n/65536 again. One cheap count pass; the
    * 1-row-per-group count frame is broadcast.
    * Output: (g, t = unix_micros(tsCol), i = id, v = value double). */
  def points(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valCol: String, targetPoints: Int): DataFrame = {
    require(targetPoints >= 2, s"targetPoints must be >= 2, got $targetPoints")
    // NOT spread (Tables.spread): the lottery filter drops ~all rows, so
    // exchanging the corpus to parallelize the hash would cost more than
    // the single-task hash pass it saves — the zero-shuffle-selection
    // property IS this operator's scale contract (measured: q67 3.0 →
    // 4.4 s with a spread here; reverted)
    val base = df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("g"),
        expr(s"unix_micros($tsCol)").as("t"),
        col(idCol).as("i"), col(valCol).cast("double").as("v"),
        graft.functions.expr.Md5Prefix(col(idCol).cast("string"), 8)
          .as("__lot"))
    val cnt = base.groupBy(col("g")).agg(count(lit(1)).as("__n_all"))
    base.join(broadcast(cnt), Seq("g"))
      .filter(col("__lot") < least(lit(4294967296L), greatest(lit(1L),
        expr(s"CAST(4294967296 AS BIGINT) * CAST($targetPoints AS BIGINT)" +
          " div __n_all"))))
      .drop("__lot", "__n_all")
  }

  /** The strict lower-triangle pair frame over a [[points]]-shaped
    * frame: g-keyed self-join filtered to `key`1 < `key`2 (key ∈
    * {"t", "i"} — time-ordered pairs for trend estimators, id-ordered
    * for symmetric ones), carrying (t, i, v) doubled as (t1, i1, v1,
    * t2, i2, v2); Catalyst prunes whatever a caller does not read.
    * Equal-key pairs are EXCLUDED — ties are each estimator's business
    * (Theil–Sen drops them, τ-b prices them via tie sums). Expected
    * O(targetPoints²) rows per group by the [[points]] guarantee. */
  def orderedPairs(pts: DataFrame, key: String): DataFrame = {
    require(key == "t" || key == "i", s"pair key must be t or i, got $key")
    val a = pts.select(col("g"), col("t").as("t1"), col("i").as("i1"),
      col("v").as("v1"))
    val b = pts.select(col("g"), col("t").as("t2"), col("i").as("i2"),
      col("v").as("v2"))
    a.join(b, Seq("g")).filter(col(s"${key}1") < col(s"${key}2"))
  }

  /** EXACT per-group size of [[orderedPairs]]'s output — computed from
    * the SMALL point frame ((k² − Σ_key tc²)/2 over key-multiplicities),
    * never from a count window over the quadratic pair frame: an
    * unordered `count(*) OVER (PARTITION BY g)` buffers the whole pair
    * partition per task, which at the sf1 rehearsal was an OOM, not a
    * slowdown. 1 row per group — broadcast it into rank filters.
    * Output: (g, m). */
  def pairCount(pts: DataFrame, key: String): DataFrame = {
    require(key == "t" || key == "i", s"pair key must be t or i, got $key")
    pts.groupBy(col("g"), col(key))
      .agg(count(lit(1)).as("tc"))
      .groupBy(col("g"))
      .agg(sum(col("tc")).as("k"), sum(col("tc") * col("tc")).as("t2"))
      .select(col("g"), expr("(k * k - t2) div 2").as("m"))
  }
}
