package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.BasketQueries

/** Hand fixture for the association-rule metrics. */
class BasketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("support/confidence/lift match the hand-computed basket values") {
    import spark.implicits._
    // u1={A,B}, u2={A,B}, u3={A}, u4={B,C}; duplicates must collapse
    val df = Seq(
      (1L, "A"), (1L, "B"), (1L, "B"),
      (2L, "A"), (2L, "B"),
      (3L, "A"),
      (4L, "B"), (4L, "C")
    ).toDF("u", "t")
    val out = BasketQueries.rules(df, "u", "t")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("A", "B"))
    assert(ab.getLong(2) == 2L && ab.getLong(3) == 3L && ab.getLong(4) == 3L)
    assert(ab.getDouble(5) == 0.5)                       // 2/4
    assert(math.abs(ab.getDouble(6) - 2.0 / 3.0) < 1e-9) // conf
    assert(math.abs(ab.getDouble(7) - 8.0 / 9.0) < 1e-9) // lift < 1
    val cb = out(("C", "B"))
    assert(cb.getDouble(6) == 1.0)                       // C always with B
    assert(math.abs(cb.getDouble(7) - 4.0 / 3.0) < 1e-9) // lift > 1
    // no self-rules, no (A,C) rule (never co-occur)
    assert(!out.contains(("A", "A")) && !out.contains(("A", "C")))
    // symmetry of counts: n_ab == n_ba
    assert(out(("B", "A")).getLong(2) == 2L)
  }
}
