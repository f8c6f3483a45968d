package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a corpus table — the
  * validation pass a 100 TB ingest runs BEFORE anything downstream
  * trusts the data (the Deequ-style "unit tests for data" pattern;
  * complements [[graft.queries.AnalyticsQueries]]'s profiling, which
  * DESCRIBES a table where this one JUDGES it against a contract).
  *
  * Every rule compiles to aggregate expressions evaluated in ONE pass —
  * a single scan and a single 1-row aggregate no matter how many rules,
  * then a narrow unpivot to one row per rule. Uniqueness runs on the
  * exact-tier mergeable distinct sketch ([[graft.functions.expr.DistinctSketchAgg]])
  * rather than `count(DISTINCT)`, so adding uniqueness rules never
  * re-introduces the Expand row-multiplication or unbounded reducer
  * state (same contract as profile_stats_sketch).
  *
  * Output: (rule, column, metric, threshold, pass) — `metric` is the
  * VIOLATION measure (fraction or count, per rule doc), `pass` is
  * `metric <= threshold`.
  */
object Expectations {

  sealed trait Rule {
    /** Stable rule id shown in the report. */
    def name: String
    def column: String
    def threshold: Double
  }

  /** Fraction of NULL values in `column` must be <= `threshold`. */
  final case class NotNull(column: String, threshold: Double = 0.0)
    extends Rule { val name = "not_null" }

  /** Fraction of DUPLICATED rows on `column` (1 − distinct/total,
    * null-bearing rows excluded from both counts) must be <= `threshold`.
    *
    * The distinct count comes from [[graft.functions.expr.DistinctSketchAgg]]:
    * EXACT up to `exactCap` distinct values, approximate (HLL at `lgK`)
    * above it — so a threshold-0 uniqueness rule is only a hard guarantee
    * while the column's cardinality fits the exact tier. Raise `exactCap`
    * (state cost: 8 bytes/value per partial) when you need the exact
    * guarantee on a higher-cardinality column; above the cap the metric
    * is clamped at 0 (HLL may over-estimate distinct > total). */
  final case class Unique(column: String, threshold: Double = 0.0,
      exactCap: Int = graft.functions.expr.DistinctSketchAgg.DefaultExactCap,
      lgK: Int = graft.functions.expr.DistinctSketchAgg.DefaultLgK)
    extends Rule { val name = "unique" }

  /** Fraction of non-null values outside [lo, hi] must be <= `threshold`. */
  final case class InRange(column: String, lo: Double, hi: Double,
      threshold: Double = 0.0) extends Rule { val name = "in_range" }

  /** Fraction of non-null values NOT matching `regex` (RLIKE semantics)
    * must be <= `threshold`. */
  final case class Matches(column: String, regex: String,
      threshold: Double = 0.0) extends Rule { val name = "matches" }

  /** Fraction of non-null values outside the allowed set must be
    * <= `threshold`. */
  final case class IsIn(column: String, allowed: Seq[String],
      threshold: Double = 0.0) extends Rule { val name = "is_in" }

  /** Row count must be >= `minRows` (metric = shortfall in rows). */
  final case class MinRows(minRows: Long) extends Rule {
    val name = "min_rows"; val column = "*"; val threshold = 0.0
  }

  /** Robust-outlier rule: the fraction of non-null values more than `k`
    * MADs from the column median must be <= `threshold` (see
    * [[graft.operators.Robust]] — median/MAD have a 50 % breakdown
    * point, so a contaminated column cannot mask its own outliers the
    * way a stddev rule lets it). Like [[RefIntegrity]] this is not a
    * pure single-pass rule: it costs two exact-quantile passes
    * ([[graft.operators.Quantiles.exact]] — median, then MAD, inherently
    * sequential) over the projected column BEFORE the shared scan; the
    * cutoffs ride into the shared aggregate as literals, so the
    * violation count itself is free. A zero MAD flags any off-median
    * value (the Robust convention). */
  final case class Outliers(column: String, k: Double = 6.0,
      threshold: Double = 0.0) extends Rule {
    val name = "outliers"
  }

  /** Referential integrity: the fraction of non-null values in `column`
    * absent from `ref`'s `refCol` must be <= `threshold` — the
    * foreign-key containment check. Unlike the scalar rules this needs a
    * second input, so it costs one LEFT ANTI equi-join per rule (the
    * reference side is typically a dimension table Spark broadcasts);
    * the scalar rules still share their single pass. */
  final case class RefIntegrity(column: String, ref: DataFrame,
      refCol: String, threshold: Double = 0.0) extends Rule {
    val name = "ref_integrity"
  }

  private def frac(violations: Column, denom: Column): Column =
    when(denom === 0L, lit(0.0))
      .otherwise(violations.cast("double") / denom.cast("double"))

  // one aggregate column per rule, shared by the global and windowed paths.
  // `outlierCuts(i)` = (median, MAD) computed by check() BEFORE the shared
  // scan, so the outlier violation count folds into the same single pass
  // (only the two quantile passes run outside it); RefIntegrity folds its
  // TOTAL into the scan too — only the anti-join count stays external.
  private def aggsFor(
      rules: Seq[Rule],
      outlierCuts: Map[Int, (Double, Double)] = Map.empty): Seq[Column] =
    count(lit(1)).as("__n") +: rules.zipWithIndex.flatMap {
      case (r: NotNull, i) =>
        Seq(count(when(col(r.column).isNull, 1)).as(s"__m$i"))
      case (r: Unique, i) => Seq(
        count(col(r.column)).as(s"__c$i"),
        graft.functions.expr.DistinctSketchAgg(col(r.column), r.exactCap, r.lgK)
          .as(s"__d$i"))
      case (r: InRange, i) => Seq(
        count(col(r.column)).as(s"__c$i"),
        count(when(col(r.column) < r.lo || col(r.column) > r.hi, 1)).as(s"__m$i"))
      case (r: Matches, i) => Seq(
        count(col(r.column)).as(s"__c$i"),
        count(when(!col(r.column).rlike(r.regex), 1)).as(s"__m$i"))
      case (r: IsIn, i) => Seq(
        count(col(r.column)).as(s"__c$i"),
        count(when(!col(r.column).isin(r.allowed: _*), 1)).as(s"__m$i"))
      case (_: MinRows, _) => Seq.empty
      case (r: RefIntegrity, i) =>
        Seq(count(col(r.column)).as(s"__c$i"))
      case (r: Outliers, i) =>
        val (med, mad) = outlierCuts(i)
        val dev = abs(col(r.column).cast("double") - lit(med))
        val viol = if (mad == 0.0) dev > 0.0 else dev > lit(r.k * mad)
        Seq(count(col(r.column)).as(s"__c$i"),
          count(when(viol, 1)).as(s"__m$i"))
    }

  // metric structs over the aggregate columns; `refMissing` carries the
  // anti-join violation counts (empty when those rules are disallowed)
  private def metricsFor(
      rules: Seq[Rule], refMissing: Map[Int, Long]): Seq[Column] =
    rules.zipWithIndex.map {
      case (r: NotNull, i) =>
        struct(lit(r.name).as("rule"), lit(r.column).as("column"),
          frac(col(s"__m$i"), col("__n")).as("metric"),
          lit(r.threshold).as("threshold"))
      case (r: Unique, i) =>
        // clamp at 0: above the exact tier the HLL distinct estimate can
        // exceed the true count, and a negative "duplicate fraction" would
        // read as a pass with spurious precision
        struct(lit(r.name).as("rule"), lit(r.column).as("column"),
          greatest(lit(0.0),
            frac(col(s"__c$i") - col(s"__d$i"), col(s"__c$i"))).as("metric"),
          lit(r.threshold).as("threshold"))
      case (r: InRange, i) =>
        struct(lit(r.name).as("rule"), lit(r.column).as("column"),
          frac(col(s"__m$i"), col(s"__c$i")).as("metric"),
          lit(r.threshold).as("threshold"))
      case (r: Matches, i) =>
        struct(lit(r.name).as("rule"), lit(r.column).as("column"),
          frac(col(s"__m$i"), col(s"__c$i")).as("metric"),
          lit(r.threshold).as("threshold"))
      case (r: IsIn, i) =>
        struct(lit(r.name).as("rule"), lit(r.column).as("column"),
          frac(col(s"__m$i"), col(s"__c$i")).as("metric"),
          lit(r.threshold).as("threshold"))
      case (r: MinRows, _) =>
        struct(lit(r.name).as("rule"), lit(r.column).as("column"),
          greatest(lit(0.0), lit(r.minRows).cast("double") - col("__n"))
            .as("metric"),
          lit(r.threshold).as("threshold"))
      case (r: RefIntegrity, i) =>
        struct(lit(r.name).as("rule"), lit(r.column).as("column"),
          frac(lit(refMissing(i)), col(s"__c$i")).as("metric"),
          lit(r.threshold).as("threshold"))
      case (r: Outliers, i) =>
        struct(lit(r.name).as("rule"), lit(r.column).as("column"),
          frac(col(s"__m$i"), col(s"__c$i")).as("metric"),
          lit(r.threshold).as("threshold"))
    }

  private def report(prefix: Seq[Column]): Seq[Column] =
    prefix ++ Seq(col("r.rule").as("rule"), col("r.column").as("column"),
      col("r.metric").as("metric"), col("r.threshold").as("threshold"),
      (col("r.metric") <= col("r.threshold")).as("pass"))

  /** Evaluate `rules` in one pass; see the object doc for the shape.
    * Rule-conditional extra cost: each [[Outliers]] rule pays its two
    * exact-quantile passes (median, then MAD — inherently sequential)
    * over the ONE projected column before the shared scan; each
    * [[RefIntegrity]] rule pays one LEFT ANTI join count. Everything
    * else — including the outlier violation count and every rule's
    * total — folds into the single shared aggregate. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expectations.check needs at least one rule")
    // (median, MAD) per outlier rule — the only per-rule passes left;
    // an all-null column yields no quantile (empty exact() input), cut
    // at (0,0) with a 0-count shared-scan denominator → metric 0
    val outlierCuts: Map[Int, (Double, Double)] = rules.zipWithIndex.collect {
      case (r: Outliers, i) =>
        val vals = df.select(col(r.column).cast("double").as("__v"))
          .filter(col("__v").isNotNull)
        if (vals.isEmpty) i -> ((0.0, 0.0))
        else {
          val med = graft.operators.Quantiles.exact(vals, "__v", Seq(0.5)).head
          val dev = vals.select(abs(col("__v") - lit(med)).as("__d"))
          val mad = graft.operators.Quantiles.exact(dev, "__d", Seq(0.5)).head
          i -> ((med, mad))
        }
    }.toMap
    // anti-join violation counts; totals come from the shared scan
    val refMissing: Map[Int, Long] = rules.zipWithIndex.collect {
      case (r: RefIntegrity, i) =>
        i -> df.select(col(r.column)).filter(col(r.column).isNotNull)
          .join(r.ref.select(col(r.refCol).as(r.column)).distinct(),
            Seq(r.column), "left_anti")
          .count()
    }.toMap
    val aggs = aggsFor(rules, outlierCuts)
    val one = df.agg(aggs.head, aggs.tail: _*)
    val metrics = metricsFor(rules, refMissing)
    one
      .select(explode(array(metrics: _*)).as("r"))
      .select(report(Seq.empty): _*)
  }

  /** Per-event-time-window expectations — continuous data-quality
    * monitoring over a (possibly streaming) event frame: the same rule
    * set judged independently inside every `windowDur` window of
    * `tsCol`. Works identically on a batch frame and a watermarked
    * stream (the aggregate state per window is the scalar counters plus
    * any uniqueness rule's sketch — bounded, watermark-evictable; the
    * StreamingSpec parity case runs exactly that). Join-backed rules
    * ([[RefIntegrity]]) are global by nature and rejected here.
    * Output: (ws, we, rule, column, metric, threshold, pass). */
  def checkWindowed(df: DataFrame, tsCol: String, windowDur: String,
      rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expectations.checkWindowed needs at least one rule")
    require(!rules.exists(_.isInstanceOf[RefIntegrity]),
      "RefIntegrity is a global rule — run it via check(), not per window")
    require(!rules.exists(_.isInstanceOf[Outliers]),
      "Outliers needs global quantile passes — run it via check(), not per window")
    val aggs = aggsFor(rules)
    val metrics = metricsFor(rules, Map.empty)
    df.groupBy(window(col(tsCol), windowDur))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        explode(array(metrics: _*)).as("r"))
      .select(report(Seq(col("ws"), col("we"))): _*)
  }
}
