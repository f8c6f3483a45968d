package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The binned range join must equal the naive nested-loop formulation
  * (cartesian + filter) pair-for-pair — including bin-boundary points,
  * intervals spanning many bins, negative axis values, and degenerate
  * (end < start) intervals.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairs(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(col(a), col(b)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("point-in-interval: binned == nested-loop on an adversarial fixture") {
    import spark.implicits._
    val pts = Seq(
      (1L, -65L), (2L, -64L), (3L, -1L), (4L, 0L), (5L, 31L), (6L, 32L),
      (7L, 33L), (8L, 100L), (9L, 1000L)
    ).toDF("pt_key", "pt_x")
    val iv = Seq(
      (10L, -70L, -60L),   // straddles a negative bin edge (-64)
      (11L, -5L, 5L),      // straddles zero
      (12L, 0L, 31L),      // exactly one bin [0,32)
      (13L, 32L, 32L),     // single point on a bin edge
      (14L, 0L, 200L),     // spans 7 bins
      (15L, 50L, 40L),     // degenerate: end < start → matches nothing
      (16L, 900L, 1100L)
    ).toDF("iv_key", "iv_s", "iv_e")

    val binned = RangeJoin.pointInInterval(pts, "pt_x", iv, "iv_s", "iv_e", binWidth = 32)
    val naive = pts.crossJoin(iv)
      .filter(col("pt_x") >= col("iv_s") && col("pt_x") <= col("iv_e"))

    assert(pairs(binned, "pt_key", "iv_key") == pairs(naive, "pt_key", "iv_key"))
    // exactly-once: no pair may be emitted twice
    assert(binned.count() == binned.select("pt_key", "iv_key").distinct().count())
  }

  test("left/semi/anti variants agree with the nested-loop reference") {
    import spark.implicits._
    val pts = Seq((1L, 5L), (2L, 40L), (3L, 500L)).toDF("pt_key", "pt_x")
    val iv = Seq((10L, 0L, 10L), (11L, 3L, 50L)).toDF("iv_key", "iv_s", "iv_e")

    val leftJ = RangeJoin.pointInInterval(pts, "pt_x", iv, "iv_s", "iv_e", 32, "left")
    // matched pairs + the unmatched point once with nulls
    val got = leftJ.select(col("pt_key"), col("iv_key")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 11L), (3L, -1L)))

    val semi = RangeJoin.pointInInterval(pts, "pt_x", iv, "iv_s", "iv_e", 32, "left_semi")
      .select("pt_key").collect().map(_.getLong(0)).toSet
    assert(semi == Set(1L, 2L))
    val anti = RangeJoin.pointInInterval(pts, "pt_x", iv, "iv_s", "iv_e", 32, "left_anti")
      .select("pt_key").collect().map(_.getLong(0)).toSet
    assert(anti == Set(3L))
  }

  test("interval-overlap: binned == nested-loop, exactly once per pair") {
    import spark.implicits._
    val l = Seq(
      (1L, -10L, 5L), (2L, 0L, 100L), (3L, 31L, 33L), (4L, 64L, 64L),
      (5L, 200L, 150L) // degenerate
    ).toDF("l_key", "l_s", "l_e")
    val r = Seq(
      (10L, -64L, -11L),  // touches l1 at nothing (ends at -11 < -10) → no overlap
      (11L, -11L, -10L),  // closed-bound touch with l1 at -10
      (12L, 5L, 5L),      // single-point overlap with l1 and l2
      (13L, 33L, 64L),    // overlaps l2, l3, l4
      (14L, 90L, 300L)
    ).toDF("r_key", "r_s", "r_e")

    val binned = RangeJoin.intervalOverlap(l, "l_s", "l_e", r, "r_s", "r_e", binWidth = 32)
    val naive = l.crossJoin(r)
      .filter(col("l_s") <= col("r_e") && col("r_s") <= col("l_e") &&
        col("l_e") >= col("l_s") && col("r_e") >= col("r_s"))

    assert(pairs(binned, "l_key", "r_key") == pairs(naive, "l_key", "r_key"))
    assert(binned.count() == naive.count()) // exactly-once, not just same set
  }

  test("binned == nested-loop on real data (sf0.001 orders windows)") {
    val od = Tables.orders(spark, "/root/testdata/sf0.001")
    val pts = od.select(
      col("o_orderkey").as("pt_key"),
      unix_date(to_date(col("o_orderdate"))).cast("long").as("pt_day"))
    val iv = od.filter(pmod(col("o_orderkey"), lit(97)) === 0)
      .select(
        col("o_orderkey").as("iv_key"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("iv_start"))
      .withColumn("iv_end", col("iv_start") + pmod(col("iv_key"), lit(29)) + lit(1))

    val binned = RangeJoin.pointInInterval(pts, "pt_day", iv, "iv_start", "iv_end", 32)
    val naive = pts.crossJoin(iv)
      .filter(col("pt_day") >= col("iv_start") && col("pt_day") <= col("iv_end"))
    assert(pairs(binned, "pt_key", "iv_key") == pairs(naive, "pt_key", "iv_key"))
    assert(binned.count() == naive.count())
  }

  test("plan is an equi-join on the bin, not a nested loop") {
    import spark.implicits._
    val pts = (0L until 1000L).map(i => (i, i % 500)).toDF("pt_key", "pt_x")
    val iv = (0L until 50L).map(i => (i, i * 7, i * 7 + 40)).toDF("iv_key", "iv_s", "iv_e")
    val planned = RangeJoin.pointInInterval(pts, "pt_x", iv, "iv_s", "iv_e", 64)
    val phys = planned.queryExecution.executedPlan.toString()
    assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$phys")
    assert(phys.contains("HashJoin") || phys.contains("SortMergeJoin"),
      s"expected a hash/sort-merge equi-join on the bin:\n$phys")

    // the overlap join's extra bin-attribution equality references both
    // sides, so it must stay a residual — only the __rj_bin === __rj_bin
    // conjunct is the extractable equi-key; pin that it stays extracted
    val l = (0L until 200L).map(i => (i, i * 3, i * 3 + 20)).toDF("l_key", "l_s", "l_e")
    val r = (0L until 40L).map(i => (i, i * 11, i * 11 + 30)).toDF("r_key", "r_s", "r_e")
    val ovPhys = RangeJoin.intervalOverlap(l, "l_s", "l_e", r, "r_s", "r_e", 32)
      .queryExecution.executedPlan.toString()
    assert(!ovPhys.contains("BroadcastNestedLoopJoin") && !ovPhys.contains("CartesianProduct"),
      s"interval-overlap join fell back to a nested loop:\n$ovPhys")
    assert(ovPhys.contains("HashJoin") || ovPhys.contains("SortMergeJoin"),
      s"expected a hash/sort-merge equi-join on the bin:\n$ovPhys")
  }
}
