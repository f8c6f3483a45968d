package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class operator: logical node + planner strategy +
  * sort-merge physical operator (reference:
  * cpp/src/arrow/acero/asof_join_node.cc — semantics at
  * cpp/src/arrow/acero/options.h:692-738). This is the
  * `LogicalPlan`+`Strategy`+`SparkPlan` path of SURVEY.md §2.3's
  * preference ladder; the compositional rewrite
  * (graft.operators.AsOfJoin.backward) stays as its differential twin.
  *
  * Physical contract: both sides hash-clustered on the `by` keys (so the
  * shuffle distributes by key — skew aside, scales with key cardinality)
  * and sorted by (by, on, tieBreak...). One forward pass per partition:
  * right rows never re-read, state is a single buffered candidate per
  * in-flight key. For equal `on` values the last row in sort order wins —
  * i.e. the max of the tie-break columns, matching the compositional
  * twin's `ORDER BY on DESC, tieBreak DESC ... rn = 1`.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftOn: Expression,   // LongType (e.g. unix_micros of the event time)
    rightOn: Expression,  // LongType
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    rightTieBreak: Seq[Expression],
    toleranceMicros: Long,
    forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** 1 left + N rights matched in one stage (reference:
  * acero/asof_join_node.cc:1106 — the asof node takes one left and any
  * number of sorted right inputs, all matched against the same left `on`
  * value; options at acero/options.h:692-738). Every child is
  * hash-clustered on its `by` keys and sorted by (by, on, tie), and the
  * matching is a chain of narrow per-partition merges — no shuffle between
  * rights, each input read exactly once, so the cost is the N+1 clustered
  * exchanges and one streaming pass. */
case class MultiAsOfJoinNode(
    left: LogicalPlan,
    rights: Seq[LogicalPlan],
    leftOn: Expression,
    rightOns: Seq[Expression],
    leftBy: Seq[Expression],
    rightBys: Seq[Seq[Expression]],
    rightTieBreaks: Seq[Seq[Expression]],
    toleranceMicros: Long,
    forward: Boolean = false) extends LogicalPlan {

  require(rights.nonEmpty && rights.length == rightOns.length &&
    rights.length == rightBys.length && rights.length == rightTieBreaks.length,
    "MultiAsOfJoinNode: rights/rightOns/rightBys/rightTieBreaks must align")

  override def children: Seq[LogicalPlan] = left +: rights

  override def output: Seq[Attribute] =
    left.output ++ rights.flatMap(_.output.map(_.withNullability(true)))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): MultiAsOfJoinNode =
    copy(left = newChildren.head, rights = newChildren.tail)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lOn, rOn, lBy, rBy, tie, tol, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lOn, rOn, lBy, rBy, tie, tol, fwd) :: Nil
    case MultiAsOfJoinNode(l, rs, lOn, rOns, lBy, rBys, ties, tol, fwd) =>
      MultiAsOfJoinExec(planLater(l), rs.map(planLater), lOn, rOns, lBy, rBys, ties, tol, fwd) :: Nil
    case _ => Nil
  }
}

/** The shared per-partition merges. Inputs must be sorted by
  * (by, on[, tie]) ascending; output preserves the left stream's order,
  * so merges compose without re-sorting.
  *
  * NULL semantics match the compositional twins (and SQL equality): a
  * null in ANY by-key column never matches — `l === r` is null-rejecting,
  * so a null-keyed left always emits the null right row and a null-keyed
  * right is dead weight (consumed, never buffered). Null `on` values
  * likewise never match. Both streams sort nulls first (ascending
  * nulls-first), so null-keyed rows cluster at the partition head and
  * consuming them is always safe. */
private[plans] object AsOfMerge {

  /** Saturating `a - b` / `a + b`: a sentinel tolerance near Long.MaxValue
    * ("unbounded") must clamp to the domain edge, not wrap around and
    * silently reject every match. */
  private def satSub(a: Long, b: Long): Long = {
    val s = a - b
    if (((a ^ b) & (a ^ s)) < 0) { if (a >= 0) Long.MaxValue else Long.MinValue } else s
  }
  private def satAdd(a: Long, b: Long): Long = {
    val s = a + b
    if (((a ^ s) & (b ^ s)) < 0) { if (a >= 0) Long.MaxValue else Long.MinValue } else s
  }

  /** Projections/orderings shared by both merge directions. */
  private final class Ctx(
      leftOutput: Seq[Attribute], rightOutput: Seq[Attribute],
      lOnExpr: Expression, rOnExpr: Expression,
      lByExprs: Seq[Expression], rByExprs: Seq[Expression]) {
    val lOnProj = UnsafeProjection.create(lOnExpr :: Nil, leftOutput)
    val rOnProj = UnsafeProjection.create(rOnExpr :: Nil, rightOutput)
    val lByProj = UnsafeProjection.create(lByExprs, leftOutput)
    val rByProj = UnsafeProjection.create(rByExprs, rightOutput)
    val keyOrdering =
      RowOrdering.createNaturalAscendingOrdering(lByExprs.map(_.dataType))
    // right side must bind nullable: unmatched lefts pair with a null row
    val outAttrs = leftOutput ++ rightOutput.map(_.withNullability(true))
    val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
    val nullRight = new GenericInternalRow(rightOutput.length)
    val joined = new JoinedRow
  }

  /** BACKWARD merge: for each left row, buffer the latest right row (by
    * (on, tieBreak) sort order) with the same non-null `by` key at or
    * before the left `on`; emit left ++ (match | nulls). Rows are never
    * revisited — both streams move forward only. */
  def merge(
      lIter: Iterator[InternalRow],
      rIter0: Iterator[InternalRow],
      leftOutput: Seq[Attribute],
      rightOutput: Seq[Attribute],
      lOnExpr: Expression,
      rOnExpr: Expression,
      lByExprs: Seq[Expression],
      rByExprs: Seq[Expression],
      tol: Long): Iterator[InternalRow] = {
    val c = new Ctx(leftOutput, rightOutput, lOnExpr, rOnExpr, lByExprs, rByExprs)
    val rIter = rIter0.buffered

    // per-key state: the latest right row at or before the current left time
    var candRow: InternalRow = null
    var candKey: InternalRow = null
    var candOn: Long = 0L

    lIter.map { lRow =>
      val lKey = c.lByProj(lRow)
      val lOnRow = c.lOnProj(lRow)
      if (lOnRow.isNullAt(0) || lKey.anyNull) {
        // null event time or null by-key: SQL equality never matches. The
        // right stream is NOT advanced for a null-keyed left (null keys
        // sort first, so nothing is lost for later lefts).
        c.resultProj(c.joined(lRow, c.nullRight))
      } else {
        val lOn = lOnRow.getLong(0)
        var advancing = true
        while (advancing && rIter.hasNext) {
          val rKey = c.rByProj(rIter.head)
          val keyCmp = c.keyOrdering.compare(rKey, lKey)
          if (keyCmp < 0) {
            rIter.next() // right key behind every remaining left key pass
          } else if (keyCmp == 0) {
            val rOnRow = c.rOnProj(rIter.head)
            if (rKey.anyNull) {
              rIter.next() // null by-key compares equal only to nulls — dead
            } else if (!rOnRow.isNullAt(0) && rOnRow.getLong(0) <= lOn) {
              val r = rIter.next()
              candRow = r.copy()
              candKey = c.rByProj(candRow).copy()
              candOn = c.rOnProj(candRow).getLong(0)
            } else if (rOnRow.isNullAt(0)) {
              rIter.next() // null event times never match
            } else {
              advancing = false
            }
          } else {
            advancing = false
          }
        }
        val matched = candRow != null &&
          c.keyOrdering.compare(candKey, lKey) == 0 &&
          candOn >= satSub(lOn, tol)
        c.resultProj(c.joined(lRow, if (matched) candRow else c.nullRight))
      }
    }
  }

  /** FORWARD merge (reference positive-tolerance mode: match the EARLIEST
    * right with `right.on ∈ [left.on, left.on + tol]`). One pass, no
    * buffering at all: rights strictly before the current left time are
    * dead for every later left too (lefts only move forward), so they are
    * consumed; the earliest still-live right is the stream head, which is
    * peeked — never consumed — because one right may match many lefts.
    * Equal-`on` ties resolve to the smallest (on, tieBreak) in sort order,
    * matching the compositional twin's `ORDER BY on ASC, tie ASC rn=1`. */
  def mergeForward(
      lIter: Iterator[InternalRow],
      rIter0: Iterator[InternalRow],
      leftOutput: Seq[Attribute],
      rightOutput: Seq[Attribute],
      lOnExpr: Expression,
      rOnExpr: Expression,
      lByExprs: Seq[Expression],
      rByExprs: Seq[Expression],
      tol: Long): Iterator[InternalRow] = {
    val c = new Ctx(leftOutput, rightOutput, lOnExpr, rOnExpr, lByExprs, rByExprs)
    val rIter = rIter0.buffered

    lIter.map { lRow =>
      val lKey = c.lByProj(lRow)
      val lOnRow = c.lOnProj(lRow)
      if (lOnRow.isNullAt(0) || lKey.anyNull) {
        c.resultProj(c.joined(lRow, c.nullRight)) // see null semantics above
      } else {
        val lOn = lOnRow.getLong(0)
        var advancing = true
        while (advancing && rIter.hasNext) {
          val rKey = c.rByProj(rIter.head)
          val keyCmp = c.keyOrdering.compare(rKey, lKey)
          if (keyCmp < 0) {
            rIter.next() // right key behind every remaining left
          } else if (keyCmp == 0) {
            val rOnRow = c.rOnProj(rIter.head)
            if (rKey.anyNull) rIter.next() // null-keyed: dead for everyone
            else if (rOnRow.isNullAt(0)) rIter.next() // nulls sort first, never match
            else if (rOnRow.getLong(0) < lOn) rIter.next() // dead for all later lefts
            else advancing = false
          } else {
            advancing = false
          }
        }
        val matched = rIter.hasNext &&
          c.keyOrdering.compare(c.rByProj(rIter.head), lKey) == 0 &&
          c.rOnProj(rIter.head).getLong(0) <= satAdd(lOn, tol)
        c.resultProj(c.joined(lRow, if (matched) rIter.head else c.nullRight))
      }
    }
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftOn: Expression,
    rightOn: Expression,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    rightTieBreak: Seq[Expression],
    toleranceMicros: Long,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    // ClusteredDistribution rejects an empty key list — a no-by-keys
    // as-of join is a GLOBAL merge, which needs both sides whole
    if (leftBy.isEmpty) AllTuples :: AllTuples :: Nil
    else ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ leftOn).map(SortOrder(_, Ascending)),
    (rightBy ++ (rightOn +: rightTieBreak)).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftBy :+ leftOn).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val lOnExpr = leftOn
    val rOnExpr = rightOn
    val lByExprs = leftBy
    val rByExprs = rightBy
    val tol = toleranceMicros
    val fwd = forward
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (fwd)
        AsOfMerge.mergeForward(
          lIter, rIter, leftOutput, rightOutput,
          lOnExpr, rOnExpr, lByExprs, rByExprs, tol)
      else
        AsOfMerge.merge(
          lIter, rIter, leftOutput, rightOutput,
          lOnExpr, rOnExpr, lByExprs, rByExprs, tol)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Physical N-right as-of join: all children co-clustered on their `by`
  * keys, then a chain of narrow per-partition merges — left × right1,
  * (that) × right2, … All merges run inside one task per partition
  * (zipPartitions is narrow), so rights never wait on each other and no
  * intermediate result ever hits a shuffle. */
case class MultiAsOfJoinExec(
    left: SparkPlan,
    rights: Seq[SparkPlan],
    leftOn: Expression,
    rightOns: Seq[Expression],
    leftBy: Seq[Expression],
    rightBys: Seq[Seq[Expression]],
    rightTieBreaks: Seq[Seq[Expression]],
    toleranceMicros: Long,
    forward: Boolean = false) extends SparkPlan {

  override def children: Seq[SparkPlan] = left +: rights

  override def output: Seq[Attribute] =
    left.output ++ rights.flatMap(_.output.map(_.withNullability(true)))

  override def requiredChildDistribution: Seq[Distribution] =
    if (leftBy.isEmpty) children.map(_ => AllTuples)
    else ClusteredDistribution(leftBy) +: rightBys.map(ClusteredDistribution(_))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    (leftBy :+ leftOn).map(SortOrder(_, Ascending)) +:
      rights.indices.map(i =>
        (rightBys(i) ++ (rightOns(i) +: rightTieBreaks(i))).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftBy :+ leftOn).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val tol = toleranceMicros
    var acc: RDD[InternalRow] = left.execute()
    var accOutput: Seq[Attribute] = left.output
    rights.indices.foreach { i =>
      val lOut = accOutput
      val rOut = rights(i).output
      val lOn = leftOn
      val rOn = rightOns(i)
      val lBy = leftBy
      val rBy = rightBys(i)
      val fwd = forward
      acc = acc.zipPartitions(rights(i).execute()) { (lIter, rIter) =>
        if (fwd) AsOfMerge.mergeForward(lIter, rIter, lOut, rOut, lOn, rOn, lBy, rBy, tol)
        else AsOfMerge.merge(lIter, rIter, lOut, rOut, lOn, rOn, lBy, rBy, tol)
      }
      accOutput = accOutput ++ rOut.map(_.withNullability(true))
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): MultiAsOfJoinExec =
    copy(left = newChildren.head, rights = newChildren.tail)
}
