package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins: salt the skewed (large) side
  * with a deterministic pseudo-random salt and replicate the build side
  * across all salts, turning one hot shuffle partition into `nSalts`.
  *
  * AQE's skew-join splitting (on in GraftSession) handles most cases at
  * runtime; this helper is the explicit fallback for planners that need a
  * fixed layout (e.g. writing a salted bucketed table once and joining it
  * repeatedly). The salt is a hash of the whole probe row — deterministic
  * across runs and executors, uniform across salt values.
  */
object Skew {

  def saltedJoin(
      probe: DataFrame,      // large, skewed side
      build: DataFrame,      // replicated side
      probeKey: Column,
      buildKey: Column,
      nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    require(!(probe.columns ++ build.columns).contains("__salt"),
      "saltedJoin reserves the __salt column; rename it on the input first")
    val saltedProbe = probe.withColumn(
      "__salt",
      pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(nSalts.toLong)))
    val replicatedBuild = build.withColumn(
      "__salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    saltedProbe
      .join(replicatedBuild,
        probeKey === buildKey &&
          saltedProbe("__salt") === replicatedBuild("__salt"))
      .drop("__salt")
  }
}
