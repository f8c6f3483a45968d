package graft

import graft.plans.Lint
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    Lint.lint(df).map(_.rule).toSet

  test("lint flags a cartesian join") {
    import spark.implicits._
    val a = Seq(1, 2, 3).toDF("a")
    val b = Seq(4, 5).toDF("b")
    assert(rules(a.crossJoin(b)).contains("cartesian"))
  }

  test("lint flags a global (no PARTITION BY) window") {
    import spark.implicits._
    val df = Seq(3, 1, 2).toDF("v")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v"))))
    assert(rules(df).contains("global-window"))
  }

  test("lint flags the multi-distinct Expand shape") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    val multi = li.agg(
      countDistinct(col("l_orderkey")),
      countDistinct(col("l_partkey")),
      countDistinct(col("l_suppkey")))
    assert(rules(multi).contains("expand-distinct"))
  }

  test("lint flags a filter the scan could not push down") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    // a cast inside the predicate defeats parquet pushdown
    val defeated = li.filter(
      col("l_returnflag").cast("binary") === lit("A".getBytes("UTF-8")))
    assert(rules(defeated).contains("unpushed-filter"),
      defeated.queryExecution.executedPlan.toString.take(1500))
  }

  test("clean declarative plans produce no findings") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    val good = li.filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
    assert(Lint.lint(good).isEmpty, Lint.report(good))
    // the house queries should be lint-clean too
    val q03 = Registry.byName("q03_group_agg").run(spark, TestSpark.sf)
    assert(Lint.lint(q03).isEmpty, Lint.report(q03))
  }
}
