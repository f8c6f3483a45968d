package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every declared capability query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query and total
  * wall seconds.
  *
  * Methodology: each query is fully materialized through the `noop` sink
  * (a `count()` would let Catalyst drop sorts/projections and
  * under-measure); one flagship warmup run first pays the JVM/codegen
  * startup cost so per-query numbers reflect steady state.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    GraftSession.runtimeConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark) // graft_* functions + as-of planner strategy

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try Registry.byName(name).run(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: flagship query pays codegen/classload once
    runOnce("q03_group_agg")

    val results = Registry.all.map(c => c.name -> runOnce(c.name))
    val ok = results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    val headline = Registry.all.filter(_.bench).map(_.name).toSet
    val headlineTotal = ok.collect { case (n, t) if headline(n) => t }.sum
    // locale-pinned formatting: f"" uses the default locale, which on
    // comma-decimal locales would emit invalid JSON ("13,700")
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val totalS = num(total)
    val headS = num(headlineTotal)
    println(s"""{"metric":"total","value":$totalS,"unit":"sec","headline_sec":$headS,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
