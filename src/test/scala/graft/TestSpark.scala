package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites (sbt forks a single test JVM). */
object TestSpark {
  lazy val spark: SparkSession =
    GraftSession.local(cores = 8, shufflePartitions = 8, appName = "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
