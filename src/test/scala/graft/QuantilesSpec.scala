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

  test("weighted quantiles: hand mass, unit-weight degeneration, bounds, exclusions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // values 1..4 with weights 1,1,2,6 (W=10): half the mass sits on 4
    val df = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 2.0), (4.0, 6.0))
      .toDF("v", "w")
    val qs = graft.operators.Quantiles
      .weightedExact(df, "v", "w", Seq(0.0, 0.2, 0.4, 0.5, 1.0))
    assert(qs == Seq(1.0, 2.0, 3.0, 4.0, 4.0), qs.toString)
    // unit weights degenerate to the plain inverted CDF: the smallest v
    // with cum >= q*n is the 1-based-rank ceil(q*n) order statistic
    val li = Tables.lineitem(spark, sf).limit(5000)
      .withColumn("one", lit(1.0))
    val w = graft.operators.Quantiles
      .weightedExact(li, "l_extendedprice", "one", Seq(0.25, 0.5, 0.75))
    val vals = li.select(col("l_extendedprice").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val u = Seq(0.25, 0.5, 0.75)
      .map(q => vals(math.ceil(q * vals.length).toInt - 1))
    assert(w == u, s"$w vs $u")
    // null and non-positive weights are excluded from the mass
    val mixed = Seq((1.0, Some(0.0)), (2.0, None), (3.0, Some(5.0)))
      .toDF("v", "w")
    assert(graft.operators.Quantiles
      .weightedExact(mixed, "v", "w", Seq(0.5)) == Seq(3.0))
    // all mass excluded -> NaN
    val none = Seq((1.0, 0.0)).toDF("v", "w")
    assert(graft.operators.Quantiles
      .weightedExact(none, "v", "w", Seq(0.5)).head.isNaN)
  }

  test("grouped weighted quantiles equal the global operator per group slice") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val grouped = graft.operators.Quantiles
      .weightedExactGrouped(li, "l_returnflag", "l_extendedprice",
        "l_quantity", qs)
      .collect()
      .map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1)))
      .toMap
    assert(grouped.nonEmpty)
    grouped.keys.foreach { flag =>
      val slice = li.filter(col("l_returnflag") === flag)
      val global = graft.operators.Quantiles
        .weightedExact(slice, "l_extendedprice", "l_quantity", qs)
      assert(grouped(flag) == global, s"$flag: ${grouped(flag)} vs $global")
    }
  }

  test("grouped quantiles equal grouped percentile() on real data") {
    val li = Tables.lineitem(spark, sf)
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val viaWindow = Quantiles
      .exactGrouped(li, "l_returnflag", "l_extendedprice", qs)
      .collect()
      .map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1)))
      .toMap
    val viaBuffer = li
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), array(qs.map(lit): _*)).as("p"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1))
      .toMap
    assert(viaWindow.keySet == viaBuffer.keySet)
    viaWindow.foreach { case (g, vs) =>
      qs.indices.foreach { i =>
        assert(math.abs(vs(i) - viaBuffer(g)(i)) <= math.ulp(viaBuffer(g)(i)) * 4,
          s"group=$g q=${qs(i)}: window=${vs(i)} buffer=${viaBuffer(g)(i)}")
      }
    }
  }

  test("grouped quantiles: modes, single-row groups, all-null groups") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", 2.0), ("a", 10.0),  // h(0.5)=1 exact → 2.0
      ("b", 7.0),                           // single row
      ("c", null), ("c", null)              // all null → group dropped
    ).toDF("g", "x")
    def q(mode: String): Map[String, Double] =
      Quantiles.exactGrouped(df, "g", "x", Seq(0.5), mode)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(q("linear") == Map("a" -> 2.0, "b" -> 7.0))
    // a fractional rank: q=0.25 on [1,2,10] → h=0.5 between 1 and 2
    val frac = Quantiles.exactGrouped(df.filter(col("g") === "a"), "g", "x", Seq(0.25), "linear")
      .head().getDouble(1)
    assert(frac == 1.5)
    assert(Quantiles.exactGrouped(df.filter(col("g") === "a"), "g", "x", Seq(0.25), "lower")
      .head().getDouble(1) == 1.0)
    assert(Quantiles.exactGrouped(df.filter(col("g") === "a"), "g", "x", Seq(0.25), "higher")
      .head().getDouble(1) == 2.0)
    assert(Quantiles.exactGrouped(df.filter(col("g") === "a"), "g", "x", Seq(0.25), "nearest")
      .head().getDouble(1) == 2.0) // frac 0.5 ties to hi
    assert(Quantiles.exactGrouped(df.filter(col("g") === "a"), "g", "x", Seq(0.25), "midpoint")
      .head().getDouble(1) == 1.5)
  }

  test("grouped quantile plan has one exchange and no Percentile buffer") {
    val li = Tables.lineitem(spark, sf)
    val plan = Quantiles
      .exactGrouped(li, "l_returnflag", "l_extendedprice", Seq(0.25, 0.5))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Percentile"), s"percentile buffer leaked into:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single hash shuffle, got $exchanges:\n$plan")
  }
}
