package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 and README.
  *
  * `queries` exposes one deterministic query per declared capability
  * (SURVEY.md §2.5 + the training-data pipeline ops); `oracleSql` the
  * DuckDB-equivalent SQL for every SQL-expressible one. Column names are
  * identical on both sides; every output is totally ordered.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    Registry.byName("q03_group_agg").run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented capability from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { c =>
      c.name -> { (s: SparkSession, dir: String) =>
        c.run(GraftSession.tune(s), dir)
      }
    }.toMap

  /** DuckDB-runnable oracle SQL for each SQL-expressible capability. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(c => c.oracle.map(c.name -> _)).toMap
}
