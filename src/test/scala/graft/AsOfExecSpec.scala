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

  test("exec output equals the compositional rewrite on real events") {
    val viaExec = Registry.byName("q21b_asof_exec").run(spark, sf).collect().toSeq
    val viaRewrite = Registry.byName("q21_asof_join").run(spark, sf).collect().toSeq
    assert(viaExec == viaRewrite)
    assert(viaExec.nonEmpty)
  }

  test("plan uses AsOfJoinExec with clustered exchanges, not a range join") {
    val df = Registry.byName("q21b_asof_exec").run(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }
}
