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
  * repeatedly).
  *
  * Salt choice: the default hashes the whole probe row PLUS a
  * within-partition sequence number (`monotonically_increasing_id`, which
  * encodes partition id + partition-local counter), so even billions of
  * BYTE-IDENTICAL hot rows — the realistic 100 TB skew case, e.g.
  * null-ish default keys — spread across all `nSalts` buckets instead of
  * reproducing the hot partition. The join RESULT never depends on which
  * salt a row draws (the build side is replicated across every salt), so
  * output determinism is unaffected; the salt assignment itself is stable
  * only for a fixed scan layout. Callers that need a layout-independent,
  * run-stable assignment (e.g. writing a salted bucketed table once)
  * should pass `saltExpr = Some(...)` keyed on a row-unique column —
  * and note that a PURE row-hash salt cannot split byte-identical rows.
  */
object Skew {

  def saltedJoin(
      probe: DataFrame,      // large, skewed side
      build: DataFrame,      // replicated side
      probeKey: Column,
      buildKey: Column,
      nSalts: Int,
      saltExpr: Option[Column] = None): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    require(!(probe.columns ++ build.columns).contains("__salt"),
      "saltedJoin reserves the __salt column; rename it on the input first")
    val salt = saltExpr.getOrElse(
      xxhash64(struct(probe.columns.map(col): _*),
        monotonically_increasing_id()))
    val saltedProbe = probe.withColumn(
      "__salt", pmod(salt, lit(nSalts.toLong)))
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
