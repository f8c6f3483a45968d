package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("backward as-of join picks latest within tolerance, per by-key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L),  // matches right t=95 (within [50,100])
      (2L, 10L, 200L),  // matches right t=199 (latest of 180,199)
      (3L, 20L, 150L),  // no right rows for uid=20 → null
      (4L, 10L, 300L)   // right 199 is outside tolerance 50 → null
    ).toDF("id", "uid", "t")
    val right = Seq(
      (101L, 10L, 95L),
      (102L, 10L, 180L),
      (103L, 10L, 199L),
      (104L, 30L, 100L)
    ).toDF("rid", "ruid", "rt")

    val out = AsOfJoin.backward(
      left, right,
      onLeft = left("t"), onRight = right("rt"),
      by = Seq(left("uid") -> right("ruid")),
      tolerance = lit(50L),
      leftId = left("id"),
      tieBreak = right("rid"))
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    assert(out == Map(1L -> 101L, 2L -> 103L, 3L -> -1L, 4L -> -1L))
  }

  test("exact-boundary match (rt == t - tol) is included") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("id", "uid", "t")
    val right = Seq((9L, 1L, 50L)).toDF("rid", "ruid", "rt")
    val out = AsOfJoin.backward(left, right, left("t"), right("rt"),
      Seq(left("uid") -> right("ruid")), lit(50L), left("id"), right("rid"))
      .select("rid").collect()
    assert(out.head.getLong(0) == 9L)
  }

  test("forward as-of picks the earliest within tolerance, per by-key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // next right at 105
      (2L, 10L, 190L), // rights at 195 and 195 (tie) -> lowest rid
      (3L, 20L, 150L), // wrong by-key only -> miss
      (4L, 10L, 300L)  // next right beyond tolerance -> miss
    ).toDF("id", "uid", "t")
    val right = Seq(
      (101L, 10L, 105L), (102L, 10L, 195L), (103L, 10L, 195L),
      (104L, 30L, 151L), (105L, 10L, 400L)
    ).toDF("rid", "ruid", "rt")
    val out = graft.operators.AsOfJoin.forward(
      left, right,
      onLeft = left("t"), onRight = right("rt"),
      by = Seq(left("uid") -> right("ruid")),
      tolerance = lit(50L),
      leftId = left("id"), tieBreak = right("rid"))
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(1L -> 101L, 2L -> 102L, 3L -> -1L, 4L -> -1L))
  }

  test("ties on the on-column break by tieBreak descending") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("id", "uid", "t")
    val right = Seq((7L, 1L, 90L), (8L, 1L, 90L)).toDF("rid", "ruid", "rt")
    val out = AsOfJoin.backward(left, right, left("t"), right("rt"),
      Seq(left("uid") -> right("ruid")), lit(50L), left("id"), right("rid"))
      .select("rid").collect()
    assert(out.length == 1 && out.head.getLong(0) == 8L)
  }
}
