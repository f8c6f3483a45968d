package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide cross-run determinism sweep: every declared capability
  * is executed TWICE and must produce byte-identical row sequences. The
  * driver's oracle hash covers row order within one run; this catches
  * the failure mode it cannot — a query that is stable within a run but
  * flaps across runs (an ordering tie without a tiebreak, an unstable
  * sample, a time- or partitioning-dependent expression). Runs at
  * sf0.001 so the whole sweep stays cheap.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("every registry query returns identical rows on a second run") {
    val flaky = Registry.all.flatMap { cap =>
      def rows() = cap.run(spark, sf).collect().map(_.toString).toSeq
      val a = rows()
      val b = rows()
      if (a == b) None
      else Some(s"${cap.name}: run1 ${a.size} rows, run2 ${b.size} rows, " +
        s"first diff at ${a.zip(b).indexWhere { case (x, y) => x != y }}")
    }
    assert(flaky.isEmpty, flaky.mkString("\n"))
  }
}
