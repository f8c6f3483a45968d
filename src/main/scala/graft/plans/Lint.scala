package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan lint — the automated form of this project's "is this
  * the plan you'd want at 100 TB" review (PLANS.md / PlanSpec): walks a
  * query's executed plan and reports the antipatterns that are invisible
  * at test scale and fatal at cluster scale. A finding is advice, not an
  * error — some plans legitimately cross joins a 1-row bound frame (the
  * broadcast-bounds pattern) — but every finding is something a reviewer
  * should be able to JUSTIFY.
  *
  * Rules:
  *  - `cartesian`: CartesianProduct / BroadcastNestedLoopJoin — O(n·m)
  *    pair generation; at scale only acceptable against a bounded side.
  *  - `global-window`: a Window with an EMPTY partition spec — every row
  *    flows to ONE task (the single-reducer sort); rank via a
  *    range-partitioned sort instead (see operators.Spearman).
  *  - `expand-distinct`: Expand feeding an aggregate — multi-distinct
  *    row multiplication; swap exact distincts for mergeable sketches
  *    (profile_stats → profile_stats_sketch).
  *  - `unpushed-filter`: a parquet scan whose pushed-filter list is
  *    empty while a Filter sits above it — the predicate shape defeated
  *    pushdown (casts or UDFs over the column are the usual cause).
  *  - `single-partition-shuffle`: an exchange whose target partitioning
  *    has 1 partition (global sort/limit funnels everything through one
  *    task).
  */
object Lint {

  final case class Finding(rule: String, node: String, detail: String)

  def lint(df: DataFrame): Seq[Finding] = lintPlan(df.queryExecution.executedPlan)

  /** Flatten the plan INCLUDING wrapper nodes `collect` cannot see
    * through: the AQE root holds its current plan as a member, not a
    * child, and query stages / reused exchanges wrap theirs the same
    * way. */
  private def expand(p: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val inner: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: inner.flatMap(expand)
  }

  def lintPlan(root: SparkPlan): Seq[Finding] = {
    def name(p: SparkPlan): String = p.getClass.getSimpleName
    def head(p: SparkPlan): String = p.toString.linesIterator.next().take(160)
    expand(root).collect {
      case p if name(p) == "CartesianProductExec" ||
          name(p) == "BroadcastNestedLoopJoinExec" =>
        Seq(Finding("cartesian", name(p), head(p)))
      case p: org.apache.spark.sql.execution.window.WindowExec
          if p.partitionSpec.isEmpty =>
        Seq(Finding("global-window", name(p),
          "window with no PARTITION BY: all rows sort on one task"))
      case p: org.apache.spark.sql.execution.ExpandExec
          if p.projections.length > 1 =>
        Seq(Finding("expand-distinct", name(p),
          s"row multiplication x${p.projections.length} (multi-distinct shape)"))
      case p: org.apache.spark.sql.execution.FileSourceScanExec
          if {
            // a substantive (non-IsNotNull) predicate reached the scan,
            // but only derived null checks — or nothing — got pushed:
            // the predicate shape defeated parquet pushdown
            val substantiveData = p.dataFilters.exists(f =>
              !f.toString.toLowerCase.startsWith("isnotnull"))
            val substantivePushed = p.metadata.get("PushedFilters")
              .exists(_.stripPrefix("[").stripSuffix("]").split(",")
                .map(_.trim).exists(t => t.nonEmpty && !t.startsWith("IsNotNull")))
            substantiveData && !substantivePushed
          } =>
        Seq(Finding("unpushed-filter", name(p),
          s"substantive filters not pushed: ${p.dataFilters.mkString(", ").take(120)}"))
      case p: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if p.outputPartitioning.numPartitions == 1 &&
            // a scalar aggregate's final exchange is single-partition BY
            // DESIGN and bounded (one partial row per map task crosses) —
            // flag only exchanges that funnel unbounded row streams
            !p.child.getClass.getSimpleName.contains("Aggregate") =>
        Seq(Finding("single-partition-shuffle", name(p),
          "exchange funnels every row into one partition"))
    }.flatten
  }

  /** Render findings the way a reviewer reads them. */
  def report(df: DataFrame): String = {
    val fs = lint(df)
    if (fs.isEmpty) "no findings"
    else fs.map(f => s"[${f.rule}] ${f.node}: ${f.detail}").mkString("\n")
  }
}
