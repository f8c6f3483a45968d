package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests for the custom as-of physical operator against the
  * compositional rewrite, plus plan-shape assertions. */
class AsOfExecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("exec semantics on hand-built data (match, tolerance edge, tie, miss)") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 150L), (4L, 10L, 300L)
    ).toDF("id", "uid", "t")
    val right = Seq(
      (101L, 10L, 95L), (102L, 10L, 180L), (103L, 10L, 199L),
      (104L, 30L, 100L), (105L, 10L, 180L) // tie with 102 at t=180
    ).toDF("rid", "ruid", "rt")
    val out = AsOfJoin.backwardExec(
      left, right,
      onLeft = left("t"), onRight = right("rt"),
      by = Seq(left("uid") -> right("ruid")),
      tieBreak = Seq(right("rid")),
      toleranceMicros = 50L)
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(1L -> 101L, 2L -> 103L, 3L -> -1L, 4L -> -1L))
  }

  test("unbounded sentinel tolerance saturates instead of overflowing") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 150L), (4L, 10L, 300L)
    ).toDF("id", "uid", "t")
    val right = Seq(
      (101L, 10L, 95L), (102L, 10L, 180L), (103L, 10L, 199L),
      (104L, 30L, 100L), (105L, 10L, 180L)
    ).toDF("rid", "ruid", "rt")
    // Long.MaxValue as "no tolerance bound": lOn - tol must clamp, not
    // wrap positive and reject every candidate
    val back = AsOfJoin.backwardExec(
      left, right,
      onLeft = left("t"), onRight = right("rt"),
      by = Seq(left("uid") -> right("ruid")),
      tieBreak = Seq(right("rid")),
      toleranceMicros = Long.MaxValue)
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(back == Map(1L -> 101L, 2L -> 103L, 3L -> -1L, 4L -> 103L))
    val fwd = AsOfJoin.forwardExec(
      left, right,
      onLeft = left("t"), onRight = right("rt"),
      by = Seq(left("uid") -> right("ruid")),
      tieBreak = Seq(right("rid")),
      toleranceMicros = Long.MaxValue)
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(fwd == Map(1L -> 102L, 2L -> -1L, 3L -> -1L, 4L -> -1L))
  }

  test("exec output equals the compositional rewrite on real events") {
    val viaExec = Registry.byName("q21b_asof_exec").run(spark, sf).collect().toSeq
    val viaRewrite = Registry.byName("q21_asof_join").run(spark, sf).collect().toSeq
    assert(viaExec == viaRewrite)
    assert(viaExec.nonEmpty)
  }

  test("exec equals the rewrite under heavy by-key skew (AQE on)") {
    // one user owns ~90% of all events — the shape that breaks naive
    // co-partitioning at cluster scale. AsOfJoinExec declares
    // ClusteredDistribution on the by-keys, so EnsureRequirements plans
    // hash exchanges; this asserts the operator stays correct when one
    // partition is pathologically large (AQE cannot split a skewed
    // partition for a custom binary exec, so the cost is latency, not
    // wrong answers — the salting helper in graft.operators.Skew is the
    // mitigation at true scale).
    import spark.implicits._
    val hot = (1 to 20000).map(i => (i.toLong, 0L, i.toLong * 7L))
    val cold = (1 to 2000).map(i => (100000L + i, (i % 50 + 1).toLong, i.toLong * 11L))
    val left = (hot ++ cold).toDF("id", "uid", "t")
    val rhot = (1 to 20000).map(i => (200000L + i, 0L, i.toLong * 5L))
    val rcold = (1 to 2000).map(i => (300000L + i, (i % 50 + 1).toLong, i.toLong * 13L))
    val right = (rhot ++ rcold).toDF("rid", "ruid", "rt")

    val exec = AsOfJoin.backwardExec(
      left, right,
      onLeft = left("t"), onRight = right("rt"),
      by = Seq(left("uid") -> right("ruid")),
      tieBreak = Seq(right("rid")),
      toleranceMicros = 1000L)
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val rewrite = AsOfJoin.backward(
      left, right,
      onLeft = left("t"), onRight = right("rt"),
      by = Seq(left("uid") -> right("ruid")),
      tolerance = expr("1000"),
      leftId = left("id"),
      tieBreak = right("rid"))
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(exec.size == 22000)
    assert(exec == rewrite)
  }

  test("no-by-keys global as-of join plans (AllTuples) and matches the rewrite") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = Seq((1L, 100L), (2L, 250L), (3L, 40L)).toDF("id", "t")
    val right = Seq((10L, 90L), (11L, 200L), (12L, 260L)).toDF("rid", "rt")
    val exec = graft.operators.AsOfJoin.backwardExec(
      left, right, left("t"), right("rt"),
      by = Seq.empty, tieBreak = Seq(right("rid")), toleranceMicros = 1000L)
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val rewrite = graft.operators.AsOfJoin.backward(
      left, right, left("t"), right("rt"),
      by = Seq.empty, tolerance = lit(1000L), leftId = left("id"), tieBreak = right("rid"))
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(exec == Map(1L -> 10L, 2L -> 11L, 3L -> -1L))
    assert(exec == rewrite)
  }

  test("multi-right exec (2 rights) equals two composed binary rewrites") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 150L), (4L, 10L, 300L)
    ).toDF("id", "uid", "t")
    val r1 = Seq(
      (101L, 10L, 95L), (102L, 10L, 180L), (103L, 10L, 199L),
      (104L, 30L, 100L), (105L, 10L, 180L)
    ).toDF("rid1", "ruid1", "rt1")
    val r2 = Seq(
      (201L, 10L, 60L), (202L, 20L, 149L), (203L, 10L, 290L), (204L, 20L, 40L)
    ).toDF("rid2", "ruid2", "rt2")

    val multi = AsOfJoin.backwardExecMulti(
      left, onLeft = left("t"), leftBy = Seq(left("uid")),
      rights = Seq(
        AsOfJoin.AsOfRight(r1, r1("rt1"), Seq(r1("ruid1")), Seq(r1("rid1"))),
        AsOfJoin.AsOfRight(r2, r2("rt2"), Seq(r2("ruid2")), Seq(r2("rid2")))),
      toleranceMicros = 50L)
      .select("id", "rid1", "rid2").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
         (if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    // r1 matches mirror the binary case; r2: id=1 t=100 ← 201@60 (tol 50
    // → 100-60=40 ok), id=2 t=200 ← nothing within 50 (201@60 too old),
    // id=3 t=150 ← 202@149, id=4 t=300 ← 203@290
    assert(multi == Map(
      1L -> (101L, 201L), 2L -> (103L, -1L), 3L -> (-1L, 202L), 4L -> (-1L, 203L)))

    // and the exec output matches folding the compositional rewrite
    val step1 = AsOfJoin.backward(
      left, r1, left("t"), r1("rt1"),
      by = Seq(left("uid") -> r1("ruid1")), tolerance = lit(50L),
      leftId = left("id"), tieBreak = r1("rid1"))
    val step2 = AsOfJoin.backward(
      step1, r2, step1("t"), r2("rt2"),
      by = Seq(step1("uid") -> r2("ruid2")), tolerance = lit(50L),
      leftId = step1("id"), tieBreak = r2("rid2"))
      .select("id", "rid1", "rid2").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
         (if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    assert(multi == step2)
  }

  test("multi-right exec on real events equals composed binary execs (q21d shape)") {
    val out = Registry.byName("q21d_asof_multi").run(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // the click columns must agree exactly with the single-right q21 gate
    val viaSingle = Registry.byName("q21_asof_join").run(spark, sf)
      .select("event_id", "click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val clicksOfMulti = rows
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(clicksOfMulti == viaSingle)
    // plan: ONE MultiAsOfJoin stage, no row-multiplying join anywhere,
    // and exactly one clustered exchange PER CHILD (left + 2 rights) —
    // adding a right must never re-shuffle the accumulated left
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("MultiAsOfJoin"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    // AQE's toString prints Final AND Initial plans — count the final only
    val finalPlan = plan.split("== Initial Plan ==").head
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(hashExchanges == 3, s"expected 3 clustered exchanges, got $hashExchanges:\n${finalPlan.take(2000)}")
  }

  test("forward exec semantics on hand-built data (peek, shared match, tie, miss)") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 110L), (3L, 10L, 300L), (4L, 20L, 50L)
    ).toDF("id", "uid", "t")
    val right = Seq(
      (101L, 10L, 120L), (102L, 10L, 120L), // tie at 120: smallest rid wins
      (103L, 10L, 290L),                    // behind left 3 — dead, never matches
      (104L, 30L, 60L)
    ).toDF("rid", "ruid", "rt")
    val out = AsOfJoin.forwardExec(
      left, right,
      onLeft = left("t"), onRight = right("rt"),
      by = Seq(left("uid") -> right("ruid")),
      tieBreak = Seq(right("rid")),
      toleranceMicros = 30L)
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // left 1 (t=100) and left 2 (t=110) SHARE right 101@120 (peek, not
    // consume); left 3 (t=300) has no right at-or-after within 30;
    // left 4 has no key match
    assert(out == Map(1L -> 101L, 2L -> 101L, 3L -> -1L, 4L -> -1L))
  }

  test("forward exec equals the forward rewrite on real events (q21e shape)") {
    val viaExec = Registry.byName("q21e_asof_forward_exec").run(spark, sf).collect().toSeq
    val viaRewrite = Registry.byName("q21c_asof_forward").run(spark, sf).collect().toSeq
    assert(viaExec.nonEmpty)
    assert(viaExec == viaRewrite)
  }

  test("multi-right FORWARD exec equals two composed forward rewrites") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 110L), (3L, 20L, 50L)
    ).toDF("id", "uid", "t")
    val r1 = Seq(
      (101L, 10L, 120L), (102L, 10L, 200L), (103L, 30L, 60L)
    ).toDF("rid1", "ruid1", "rt1")
    val r2 = Seq(
      (201L, 20L, 70L), (202L, 10L, 130L)
    ).toDF("rid2", "ruid2", "rt2")
    val multi = AsOfJoin.forwardExecMulti(
      left, onLeft = left("t"), leftBy = Seq(left("uid")),
      rights = Seq(
        AsOfJoin.AsOfRight(r1, r1("rt1"), Seq(r1("ruid1")), Seq(r1("rid1"))),
        AsOfJoin.AsOfRight(r2, r2("rt2"), Seq(r2("ruid2")), Seq(r2("rid2")))),
      toleranceMicros = 30L)
      .select("id", "rid1", "rid2").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
         (if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    // id=1 t=100: r1 ← 101@120 (within 30), r2 ← 202@130 at exactly +30;
    // id=2 t=110: r1 ← 101@120 (shared), r2 ← 202@130; id=3 t=50: r2 ← 201@70
    assert(multi == Map(
      1L -> (101L, 202L), 2L -> (101L, 202L), 3L -> (-1L, 201L)))

    val step1 = AsOfJoin.forward(
      left, r1, left("t"), r1("rt1"),
      by = Seq(left("uid") -> r1("ruid1")), tolerance = lit(30L),
      leftId = left("id"), tieBreak = r1("rid1"))
    val step2 = AsOfJoin.forward(
      step1, r2, step1("t"), r2("rt2"),
      by = Seq(step1("uid") -> r2("ruid2")), tolerance = lit(30L),
      leftId = step1("id"), tieBreak = r2("rid2"))
      .select("id", "rid1", "rid2").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
         (if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    assert(multi == step2)
  }

  test("null by-keys never match (SQL === semantics), both directions, exec == rewrite") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(10L), 100L), (2L, None, 100L), (3L, Some(20L), 100L)
    ).toDF("id", "uid", "t")
    val right = Seq(
      (101L, Some(10L), 95L), (102L, None, 95L), (103L, None, 105L),
      (104L, Some(20L), 105L)
    ).toDF("rid", "ruid", "rt")
    def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select("id", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val back = toMap(AsOfJoin.backwardExec(
      left, right, left("t"), right("rt"),
      by = Seq(left("uid") -> right("ruid")),
      tieBreak = Seq(right("rid")), toleranceMicros = 50L))
    val backRw = toMap(AsOfJoin.backward(
      left, right, left("t"), right("rt"),
      by = Seq(left("uid") -> right("ruid")),
      tolerance = lit(50L), leftId = left("id"), tieBreak = right("rid")))
    // null-keyed left 2 matches nothing; null-keyed rights 102/103 match no one
    assert(back == Map(1L -> 101L, 2L -> -1L, 3L -> -1L))
    assert(back == backRw)

    val fwd = toMap(AsOfJoin.forwardExec(
      left, right, left("t"), right("rt"),
      by = Seq(left("uid") -> right("ruid")),
      tieBreak = Seq(right("rid")), toleranceMicros = 50L))
    val fwdRw = toMap(AsOfJoin.forward(
      left, right, left("t"), right("rt"),
      by = Seq(left("uid") -> right("ruid")),
      tolerance = lit(50L), leftId = left("id"), tieBreak = right("rid")))
    assert(fwd == Map(1L -> -1L, 2L -> -1L, 3L -> 104L))
    assert(fwd == fwdRw)
  }

  test("plan uses AsOfJoinExec with clustered exchanges, not a range join") {
    val df = Registry.byName("q21b_asof_exec").run(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }
}
