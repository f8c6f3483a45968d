package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rank-selection exact quantiles vs Spark's buffer-everything
  * `percentile()` — same definition (interpolation at (n-1)·q), different
  * execution: distributed sort + targeted fetch instead of one
  * full-column aggregation buffer. */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("interpolation modes bracket correctly and coincide on exact ranks") {
    val li = Tables.lineitem(spark, sf)
    val modes = Quantiles.interpolations
    val mid = Quantiles.exactMulti(li, "l_extendedprice", Seq(0.1, 0.5, 0.77), modes)
    mid.foreach { m =>
      assert(m("lower") <= m("linear") && m("linear") <= m("higher"))
      assert(m("lower") <= m("midpoint") && m("midpoint") <= m("higher"))
      assert(m("nearest") == m("lower") || m("nearest") == m("higher"))
    }
    // q = 0 and q = 1 land exactly on an order statistic — every mode agrees
    val ends = Quantiles.exactMulti(li, "l_extendedprice", Seq(0.0, 1.0), modes)
    ends.foreach(m => assert(m.values.toSet.size == 1))
  }

  test("rank-selection quantiles equal percentile() on real data") {
    val li = Tables.lineitem(spark, sf)
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val viaSort = Quantiles.exact(li, "l_extendedprice", qs)
    val viaBuffer = li
      .agg(percentile(col("l_extendedprice"),
        array(qs.map(lit): _*)).as("p"))
      .head().getSeq[Double](0)
    qs.indices.foreach { i =>
      assert(math.abs(viaSort(i) - viaBuffer(i)) <= math.ulp(viaBuffer(i)) * 4,
        s"q=${qs(i)}: sort=${viaSort(i)} buffer=${viaBuffer(i)}")
    }
  }

  test("handles duplicates, single row and empty input") {
    import spark.implicits._
    val dups = Seq(5.0, 5.0, 5.0, 5.0).toDF("x")
    assert(Quantiles.exact(dups, "x", Seq(0.5)) == Seq(5.0))
    val one = Seq(42.0).toDF("x")
    assert(Quantiles.exact(one, "x", Seq(0.0, 0.5, 1.0)) == Seq(42.0, 42.0, 42.0))
    val empty = Seq.empty[Double].toDF("x")
    assert(Quantiles.exact(empty, "x", Seq(0.5)).forall(_.isNaN))
  }

  test("nulls are ignored like percentile()") {
    import spark.implicits._
    val df = Seq[java.lang.Double](1.0, null, 3.0, null, 2.0).toDF("x")
    assert(Quantiles.exact(df, "x", Seq(0.5)) == Seq(2.0))
  }
}
