package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (binned) range joins — point-in-interval and interval-overlap.
  *
  * Spark has no native inequality-join operator: a join whose only
  * condition is `start <= point AND point <= end` is planned as a
  * BroadcastNestedLoopJoin (or a CartesianProduct + filter), which is
  * O(|L|·|R|) and dies at scale. The reference engine has the same gap (its
  * hash join requires at least one equi key — cpp/src/arrow/acero/
  * hash_join_node.cc; the only ordered-condition operator is the as-of
  * join, asof_join_node.cc, which picks ONE closest match rather than all
  * matches in range).
  *
  * The classic distributed formulation used here: quantize the join axis
  * into fixed-width bins, turning the inequality into an equi-join on the
  * bin id.
  *
  *  - a point belongs to exactly one bin: `binOf(p, w)`;
  *  - an interval [s, e] is exploded to every bin it touches:
  *    `sequence(binOf(s, w), binOf(e, w), step = w)`;
  *  - the equi-join on bin id is a plain shuffled hash / sort-merge join
  *    (scales horizontally, AQE skew-split applies), with the original
  *    range predicate kept as a residual filter.
  *
  * Each matching (point, interval) pair meets in exactly one bin — the
  * point's — so no post-join dedup is needed. For interval × interval
  * overlap both sides explode and a pair would meet in every shared bin;
  * the pair is attributed to the single bin containing the overlap start
  * `max(lStart, rStart)`, which restores exactly-once output without a
  * window dedup.
  *
  * Cost model: an interval of length `len` replicates to
  * `len/binWidth + 1` bins, so `binWidth` ≈ the typical interval length
  * bounds the blow-up at ~2× while keeping bins selective. All axis
  * columns must be integral (epoch days / unix micros / any long); both
  * interval bounds are inclusive.
  */
object RangeJoin {

  /** Bin id of `x` for width `w` — the bin's LOWER BOUND, not its ordinal.
    * Only bin equality matters to the join, so `x - pmod(x, w)` (exact
    * long arithmetic, floor semantics for negatives too since `pmod` is
    * always in [0, w)) avoids a division entirely; `Column./` would go
    * through double and lose exactness past 2^53 (unix-micros territory). */
  private def binOf(x: Column, w: Long): Column =
    (x - pmod(x, lit(w))).cast("long")

  /** Join of `points` to every row of `intervals` whose
    * `[startCol, endCol]` contains `pointCol`. The two frames must have
    * disjoint column names (rename before the call — the join axis columns
    * are referenced by name on their own side).
    *
    * `joinType` may be `"inner"` (default), `"left"`/`"left_outer"` (keep
    * unmatched points with null interval columns — correct because a point
    * occupies exactly ONE bin, so the left join sees each point's full
    * candidate set in a single bin partition), or `"left_semi"`/
    * `"left_anti"` (points that fall in ≥1 / no interval — the anti case
    * is the "outside every maintenance window" filter).
    *
    * Intervals with `end < start` are dropped (they can contain nothing,
    * and `sequence` would reject the reversed bounds).
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long,
      joinType: String = "inner"): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(
      Set("inner", "left", "left_outer", "left_semi", "left_anti")(joinType),
      s"unsupported joinType '$joinType' (a right/full variant would need " +
        "interval-side dedup across bins — not provided)")
    val p = points.withColumn("__rj_bin", binOf(col(pointCol), binWidth))
    val iv = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn(
        "__rj_bin",
        explode(sequence(
          binOf(col(startCol), binWidth),
          binOf(col(endCol), binWidth),
          lit(binWidth))))
    p.join(
        iv,
        p("__rj_bin") === iv("__rj_bin") &&
          col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol),
        joinType)
      .drop("__rj_bin")
  }

  /** Inner join of `left` intervals to every `right` interval they overlap
    * (closed bounds: `[ls, le]` and `[rs, re]` overlap iff
    * `ls <= re AND rs <= le`). Column names must be disjoint across the
    * two frames. Exactly-once: a pair is emitted only in the bin holding
    * `greatest(ls, rs)` (the overlap start). */
  def intervalOverlap(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) >= col(s))
        .withColumn(
          "__rj_bin",
          explode(sequence(
            binOf(col(s), binWidth),
            binOf(col(e), binWidth),
            lit(binWidth))))
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)
    l.join(
        r,
        l("__rj_bin") === r("__rj_bin") &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          l("__rj_bin") === binOf(greatest(col(lStart), col(rStart)), binWidth))
      .drop("__rj_bin")
  }
}
