package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Det

/** Poisson bootstrap — the resampling scheme that actually works at
  * 100 TB (sampling WITH replacement needs the row count up front and a
  * global shuffle per replicate; independent per-row Poisson(1) weights
  * need neither — Chamandy et al.'s "Estimating Uncertainty for Massive
  * Data Streams", the standard large-scale formulation). Each (row,
  * replicate) draws a deterministic Poisson(1) weight from the md5 hash
  * of (id, replicate): the 48-bit uniform is compared against EXACT
  * integer CDF thresholds, so weight assignment is pure integer
  * arithmetic — bit-identical in any engine — and the replicate means
  * are exact decimal sums with one rounded division each.
  *
  * Plan shape: an R-way in-partition fan-out (narrow — one long weight
  * per emitted row) and ONE replicate-keyed aggregate; no global sort,
  * no per-replicate pass over the data.
  */
object Bootstrap {

  /** floor(CDF_Poisson(1)(k) · 2⁴⁸) for k = 0..5; a uniform above the
    * last threshold takes weight 6 (P ≈ 6e-4, folded into the tail). */
  val Thresholds: Seq[Long] = Seq(
    103548857136060L, 207097714272121L, 258872142840152L,
    276130285696162L, 280444821410164L, 281307728552965L)

  /** The deterministic 48-bit uniform of (id, replicate) — DuckDB:
    * `('0x' || substring(md5(id || '_' || r), 1, 12))::BIGINT`. */
  def u48(id: Column, r: Column): Column =
    graft.functions.expr.Md5Prefix(
      concat(id.cast("string"), lit("_"), r.cast("string")), 12)

  /** Poisson(1) weight from an ALREADY-MATERIALIZED uniform column —
    * keep the md5 in its own projection so the hash computes ONCE per
    * row, not once per threshold branch (a 6× md5 blow-up otherwise:
    * the CASE branches defeat common-subexpression elimination). */
  def weightOf(u: Column): Column =
    Thresholds.zipWithIndex.foldRight(lit(Thresholds.length): Column) {
      case ((t, k), acc) => when(u < t, lit(k)).otherwise(acc)
    }.cast("long")

  /** `replicates` bootstrap means of `valCol`: (r, n_eff, mean) with
    * n_eff = Σ weights and mean the weighted decimal mean round@9.
    * NULL values drop before weighting. */
  def meansCI(df: DataFrame, idCol: String, valCol: String,
      replicates: Int): DataFrame = {
    require(replicates >= 1 && replicates <= 1024,
      s"replicates must be in [1, 1024], got $replicates")
    // spread before the R-way fan-out: the md5 draw per (row, replicate)
    // is the dominant cost and would otherwise run on the scan's single
    // fixture task (guide §2.5; graft.Tables.spread scaladoc). The id is
    // stringified ONCE here rather than once per replicate inside u48.
    val fan = graft.Tables.spread(
        df.filter(col(valCol).isNotNull)
          .select(col(idCol).cast("string").as("__id"),
            col(valCol).cast("double").as("__x")),
        col("__id"))
      .select(col("__id"), col("__x"),
        explode(array((0 until replicates).map(lit(_)): _*)).as("r"))
    fan.select(col("r"), col("__x"), u48(col("__id"), col("r")).as("__u"))
      .select(col("r"), col("__x"), weightOf(col("__u")).as("__w"))
      .groupBy(col("r"))
      .agg(sum(col("__w")).as("n_eff"),
        round(Det.dsum(col("__w").cast("double") * col("__x")) /
          sum(col("__w")).cast("double"), 9).as("mean"))
  }
}
