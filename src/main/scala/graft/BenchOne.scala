package graft

import org.apache.spark.sql.SparkSession

/** Targeted benchmark: run ONLY the named queries (args), in order, with
  * the same session/materialization methodology as [[Bench]] — for
  * isolating one query's cost or a suspected cross-query interaction
  * without paying a full registry pass.
  *
  * Usage: `runMain graft.BenchOne q03_group_agg dedup_cc dedup_cc_stars`
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPS).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "BenchOne: pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    GraftSession.runtimeConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      Registry.byName(name).run(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    runOnce(args.head) // warmup
    (1 to reps).foreach { pass =>
      args.foreach { n =>
        val t = runOnce(n)
        println(f"[benchone] pass $pass $n%-28s $t%8.3f s")
      }
    }
    spark.stop()
  }
}
