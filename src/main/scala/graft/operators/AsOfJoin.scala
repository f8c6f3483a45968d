package graft.operators

import graft.plans.{AsOfJoinNode, MultiAsOfJoinNode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** As-of (inexact temporal) join — the one reference operator with no direct
  * Spark counterpart (reference: cpp/src/arrow/acero/asof_join_node.cc;
  * semantics at cpp/src/arrow/acero/options.h:692-738: for each left row,
  * match right rows with `right.on - left.on ∈ [min(0,tol), max(0,tol)]` and
  * equal `by` keys, picking the closest).
  *
  * Spark-first formulation: an equi-join on the `by` keys with a range
  * predicate on the `on` column, then a per-left-row window dedup keeping
  * the closest right match. Catalyst plans the equi+range join as a shuffled
  * hash / sort-merge join on the `by` keys with the range as a residual
  * filter, so it scales horizontally by key cardinality; AQE's skew-join
  * splitting handles hot keys. For a small right side, `broadcast(right)`
  * turns it into a map-side join with no shuffle at all.
  */
object AsOfJoin {

  /** Backward as-of left join: for each left row, the latest right row with
    * `right(onRight) <= left(onLeft)` within `tolerance`, matching on the
    * `by` key columns (same names both sides).
    *
    * @param leftId    column uniquely identifying left rows (used for the
    *                  dedup window — supplying it beats synthesizing a
    *                  nondeterministic row id)
    * @param tieBreak  right-side column ordering ties on equal `on` values
    *                  (latest wins), keeping the result deterministic
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      onLeft: Column,
      onRight: Column,
      by: Seq[(Column, Column)],
      tolerance: Column,
      leftId: Column,
      tieBreak: Column): DataFrame = {
    val byCond = by
      .map { case (l, r) => l === r }
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    val cond = byCond && onRight <= onLeft && onRight >= onLeft - tolerance
    val joined = left.join(right, cond, "left")
    val w = Window.partitionBy(leftId).orderBy(onRight.desc_nulls_last, tieBreak.desc_nulls_last)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** Forward as-of left join: for each left row, the EARLIEST right row
    * with `right(onRight) >= left(onLeft)` within `tolerance` — the
    * reference's positive-tolerance mode (options.h:692-738:
    * `right.on - left.on ∈ [0, tol]`). Ties on the `on` value break by
    * `tieBreak` ascending (earliest wins), mirroring [[backward]]. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      onLeft: Column,
      onRight: Column,
      by: Seq[(Column, Column)],
      tolerance: Column,
      leftId: Column,
      tieBreak: Column): DataFrame = {
    val byCond = by
      .map { case (l, r) => l === r }
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    val cond = byCond && onRight >= onLeft && onRight <= onLeft + tolerance
    val joined = left.join(right, cond, "left")
    val w = Window.partitionBy(leftId).orderBy(onRight.asc_nulls_last, tieBreak.asc_nulls_last)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** Nearest as-of left join: for each left row, the right row whose `on`
    * value is CLOSEST in either direction within `tolerance` (pandas
    * `merge_asof(direction="nearest")`; the reference exposes only the
    * signed-tolerance single-direction modes at options.h:692-738, so this
    * is the natural completion of the family). Ties on equal distance
    * prefer the backward match (earlier right), then break by `tieBreak`
    * ascending — pinned so the result is deterministic and the oracle can
    * mirror the exact ordering. Same join shape as [[backward]]: equi-join
    * on the `by` keys with a symmetric range residual, then one window
    * dedup per left row. Unlike [[backward]]/[[forward]] (which only
    * compare), nearest measures the distance, so the `on` columns must be
    * timestamps (µs distance via unix_micros). */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      onLeft: Column,
      onRight: Column,
      by: Seq[(Column, Column)],
      tolerance: Column,
      leftId: Column,
      tieBreak: Column): DataFrame = {
    val byCond = by
      .map { case (l, r) => l === r }
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    val cond =
      byCond && onRight >= onLeft - tolerance && onRight <= onLeft + tolerance
    val joined = left.join(right, cond, "left")
    val dist = abs(unix_micros(onRight) - unix_micros(onLeft))
    val w = Window.partitionBy(leftId)
      .orderBy(dist.asc_nulls_last, onRight.asc_nulls_last, tieBreak.asc_nulls_last)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** Backward as-of left join through the dedicated physical operator
    * ([[graft.plans.AsOfJoinExec]] — one sort-merge pass per co-partitioned
    * sorted partition, no row-multiplying range join). Semantics match
    * [[backward]]; `onLeft`/`onRight` must evaluate to LongType (e.g.
    * `unix_micros(ts)`). Requires the graft strategy to be registered
    * (GraftSession does this; or `GraftSession.tune(spark)`). */
  def backwardExec(
      left: DataFrame,
      right: DataFrame,
      onLeft: Column,
      onRight: Column,
      by: Seq[(Column, Column)],
      tieBreak: Seq[Column],
      toleranceMicros: Long): DataFrame =
    execImpl(left, right, onLeft, onRight, by, tieBreak, toleranceMicros,
      forward = false)

  /** FORWARD as-of join through the physical operator — the reference's
    * positive-tolerance mode in the same one-pass merge (earliest right
    * at-or-after each left within `toleranceMicros`; ties by smallest
    * tieBreak). Semantics match [[forward]], the compositional twin. */
  def forwardExec(
      left: DataFrame,
      right: DataFrame,
      onLeft: Column,
      onRight: Column,
      by: Seq[(Column, Column)],
      tieBreak: Seq[Column],
      toleranceMicros: Long): DataFrame =
    execImpl(left, right, onLeft, onRight, by, tieBreak, toleranceMicros,
      forward = true)

  private def execImpl(
      left: DataFrame,
      right: DataFrame,
      onLeft: Column,
      onRight: Column,
      by: Seq[(Column, Column)],
      tieBreak: Seq[Column],
      toleranceMicros: Long,
      forward: Boolean): DataFrame = {
    // Materialize the on/by/tie expressions as columns of the children so
    // the custom node only references resolved attributes (expressions
    // inside a custom logical node bypass the analyzer).
    val lByNames = by.indices.map(i => s"__asof_by_l_$i")
    val rByNames = by.indices.map(i => s"__asof_by_r_$i")
    val l2 = by.zip(lByNames).foldLeft(left.withColumn("__asof_on_l", onLeft.cast("long"))) {
      case (df, ((lCol, _), n)) => df.withColumn(n, lCol)
    }
    val r2 = by.zip(rByNames).foldLeft(right.withColumn("__asof_on_r", onRight.cast("long"))) {
      case (df, ((_, rCol), n)) => df.withColumn(n, rCol)
    }
    val node = AsOfJoinNode(
      left = Bridge.logicalPlan(l2),
      right = Bridge.logicalPlan(r2),
      leftOn = Bridge.expression(l2("__asof_on_l")),
      rightOn = Bridge.expression(r2("__asof_on_r")),
      leftBy = lByNames.map(n => Bridge.expression(l2(n))),
      rightBy = rByNames.map(n => Bridge.expression(r2(n))),
      rightTieBreak = tieBreak.map(Bridge.expression),
      toleranceMicros = toleranceMicros,
      forward = forward)
    Bridge.ofRows(left.sparkSession, node)
      .drop("__asof_on_l" +: "__asof_on_r" +: (lByNames ++ rByNames): _*)
  }

  /** One right input of [[backwardExecMulti]]: its event-time column
    * (LongType after cast), the `by` key columns matching the left's
    * `leftBy` positionally, and tie-break columns (max wins on equal
    * `on`). */
  final case class AsOfRight(
      df: DataFrame, on: Column, by: Seq[Column], tieBreak: Seq[Column])

  /** Backward as-of left join against N right tables in ONE pass — the
    * reference's multi-input mode (acero/asof_join_node.cc:1106 takes one
    * left and any number of sorted rights; each right is matched
    * independently against the same left `on`/`by` keys). Output is
    * left ++ right_1 ++ … ++ right_n columns, unmatched rights null.
    *
    * Physically each child is hash-clustered on its `by` keys once and the
    * rights merge in a chain of narrow per-partition passes inside a
    * single stage — adding a right adds one clustered exchange of that
    * right, never a re-shuffle of the accumulated left. */
  def backwardExecMulti(
      left: DataFrame,
      onLeft: Column,
      leftBy: Seq[Column],
      rights: Seq[AsOfRight],
      toleranceMicros: Long): DataFrame =
    execMulti(left, onLeft, leftBy, rights, toleranceMicros, forward = false)

  /** FORWARD N-right as-of (positive tolerance): each right contributes
    * its EARLIEST row at-or-after the left `on` within tolerance, all in
    * the same one-pass chained merge as [[backwardExecMulti]]. */
  def forwardExecMulti(
      left: DataFrame,
      onLeft: Column,
      leftBy: Seq[Column],
      rights: Seq[AsOfRight],
      toleranceMicros: Long): DataFrame =
    execMulti(left, onLeft, leftBy, rights, toleranceMicros, forward = true)

  private def execMulti(
      left: DataFrame,
      onLeft: Column,
      leftBy: Seq[Column],
      rights: Seq[AsOfRight],
      toleranceMicros: Long,
      forward: Boolean): DataFrame = {
    require(rights.nonEmpty, "execMulti: at least one right table")
    require(rights.forall(_.by.length == leftBy.length),
      "execMulti: every right needs one by-column per left by-column")
    val lByNames = leftBy.indices.map(i => s"__asof_by_l_$i")
    val l2 = leftBy.zip(lByNames).foldLeft(
      left.withColumn("__asof_on_l", onLeft.cast("long"))) {
      case (df, (c, n)) => df.withColumn(n, c)
    }
    val rByNames = leftBy.indices.map(i => s"__asof_by_r_$i")
    val r2s = rights.map { r =>
      r.by.zip(rByNames).foldLeft(
        r.df.withColumn("__asof_on_r", r.on.cast("long"))) {
        case (df, (c, n)) => df.withColumn(n, c)
      }
    }
    val node = MultiAsOfJoinNode(
      left = Bridge.logicalPlan(l2),
      rights = r2s.map(Bridge.logicalPlan),
      leftOn = Bridge.expression(l2("__asof_on_l")),
      rightOns = r2s.map(r => Bridge.expression(r("__asof_on_r"))),
      leftBy = lByNames.map(n => Bridge.expression(l2(n))),
      rightBys = r2s.map(r => rByNames.map(n => Bridge.expression(r(n)))),
      rightTieBreaks = rights.map(_.tieBreak.map(Bridge.expression)),
      toleranceMicros = toleranceMicros,
      forward = forward)
    Bridge.ofRows(left.sparkSession, node)
      .drop("__asof_on_l" +: lByNames: _*)
      .drop("__asof_on_r")       // duplicate name across rights: drop all
      .drop(rByNames: _*)
  }
}
