package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Capability, Tables}
import graft.functions.expr.{CountMinAgg, CountMinEstimate, CountMinUnionAgg}

/** Declared frequency-sketch capabilities: Count-Min heavy hitters over
  * merged per-day artifacts ([[graft.functions.expr.CountMinAgg]]) —
  * the point-frequency counterpart of the q39/q48 distinct-sketch
  * algebra. The gate runs in the sketch's exact tier, so the same
  * COUNT(*) GROUP BY oracle that defines "heavy hitter" gates the
  * sketch path bit-for-bit.
  */
object SketchQueries {

  private val TopK = 20

  /** Q53: heavy hitters by Count-Min artifact algebra — build one
    * frequency sketch per event DAY (the shard artifact a 100 TB ingest
    * would persist), merge the day states by count-addition WITHOUT
    * rescanning events, then rank a probe set of user ids by estimated
    * count. The probe hash is builtin `xxhash64` (seed 42), identical to
    * the aggregate's update hash, so probing stays in whole-stage
    * codegen. Top-20 with id tie-break; estimates are exact below the
    * sketch's exact-tier cap. */
  private def cmsTopkQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
    val daily = ev.groupBy(to_date(col("ts")).as("__day"))
      .agg(CountMinAgg(col("user_id")).as("__state"))
    val global = daily.agg(CountMinUnionAgg(col("__state")).as("__state"))
    val probes = ev.select(col("user_id")).distinct()
    probes.crossJoin(broadcast(global))
      .select(col("user_id"),
        CountMinEstimate(col("__state"), xxhash64(col("user_id"))).as("est_cnt"))
      .orderBy(col("est_cnt").desc, col("user_id"))
      .limit(TopK)
  }

  private val cmsTopkSql =
    s"""SELECT user_id, count(*) AS est_cnt
       |FROM events WHERE user_id IS NOT NULL
       |GROUP BY 1 ORDER BY est_cnt DESC, user_id LIMIT $TopK""".stripMargin

  val caps: Seq[Capability] = Seq(
    Capability("q53_cms_topk",
      "heavy hitters via merged per-day Count-Min artifacts (exact at gate tier)",
      cmsTopkQ, Some(cmsTopkSql)),
  )
}
