package graft

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for the named queries into
  * `plans/r14/<query>_<suffix>.txt` — the before/after plan evidence the
  * optimization round commits.
  *
  * Usage: `runMain graft.PlanDump before q16_math graph_pagerank ...`
  * (env: SPARK_GRAFT_SF_DIR — defaults to sf0.1 so plan shapes match the
  * bench scale; SPARK_GRAFT_CPUS.)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <suffix> <query>...")
    val suffix = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    GraftSession.runtimeConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    Files.createDirectories(Paths.get("plans/r14"))
    args.tail.foreach { name =>
      val df = Registry.byName(name).run(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r14/${name}_$suffix.txt"), txt)
      println(s"[plandump] plans/r14/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
