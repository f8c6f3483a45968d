package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Capability, Det, Tables}
import graft.operators.TimeSeries

/** Declared time-series analytics capabilities over the `events` table
  * (operators: [[graft.operators.TimeSeries]]) — autocorrelation,
  * interval merging, CUSUM change-point location. Complements the
  * EWMA/anomaly/resample/inter-arrival family in
  * [[AnalyticsQueries]]; the reference's own vector surface stops at
  * cumulative_* and pairwise_diff (SURVEY §2.2).
  */
object TimeSeriesQueries {

  private val AcfMaxLag = 3

  /** Q50: sample autocorrelation at lags 1..3 per event type — the
    * seasonality/memory fingerprint of each event stream. Exact decimal
    * moments, guarded Pearson, one window + one aggregate exchange for
    * all lags. */
  private def acfQ(s: SparkSession, d: String): DataFrame =
    TimeSeries.acf(
        Tables.events(s, d)
          .select(col("event_type"), expr("unix_micros(ts)").as("__us"),
            col("event_id"), col("value")),
        "event_type", "__us", "event_id", "value", maxLag = AcfMaxLag)
      .withColumnRenamed("lag", "lg")
      .orderBy(col("event_type"), col("lg"))

  /** The lag-pair/moment/guarded-Pearson CTE chain — shared verbatim by
    * the q50 and q83 gates so PACF runs on EXACTLY q50's r values. */
  private val acfCtes =
    s"""WITH src AS (
       |  SELECT event_type, epoch_us(ts) AS us, event_id,
       |    CAST(value AS DOUBLE) AS x
       |  FROM events WHERE value IS NOT NULL),
       |l AS (
       |  SELECT event_type, x,
       |    lag(x, 1) OVER w AS y1, lag(x, 2) OVER w AS y2,
       |    lag(x, 3) OVER w AS y3
       |  FROM src WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id)),
       |p AS (
       |  SELECT event_type, 1 AS lg, x, y1 AS y FROM l WHERE y1 IS NOT NULL
       |  UNION ALL
       |  SELECT event_type, 2, x, y2 FROM l WHERE y2 IS NOT NULL
       |  UNION ALL
       |  SELECT event_type, 3, x, y3 FROM l WHERE y3 IS NOT NULL),
       |m AS (
       |  SELECT event_type, lg, COUNT(*) AS n_pairs,
       |    ${Det.sqlSum("x")} AS sx, ${Det.sqlSum("y")} AS sy,
       |    ${Det.sqlSum("x * x")} AS sxx, ${Det.sqlSum("y * y")} AS syy,
       |    ${Det.sqlSum("x * y")} AS sxy
       |  FROM p GROUP BY 1, 2),
       |r0 AS (
       |  SELECT event_type, lg, n_pairs,
       |    CASE WHEN n_pairs >= 2
       |          AND (CAST(n_pairs AS DOUBLE) * sxx - sx * sx) > 0
       |          AND (CAST(n_pairs AS DOUBLE) * syy - sy * sy) > 0
       |         THEN round((CAST(n_pairs AS DOUBLE) * sxy - sx * sy) /
       |           sqrt((CAST(n_pairs AS DOUBLE) * sxx - sx * sx) *
       |                (CAST(n_pairs AS DOUBLE) * syy - sy * sy)), 9)
       |    END AS acf
       |  FROM m)""".stripMargin

  private lazy val acfSql =
    s"""$acfCtes
       |SELECT event_type, lg, n_pairs, acf
       |FROM r0 ORDER BY event_type, lg""".stripMargin

  /** q83_pacf: partial autocorrelation to lag 3 ([[TimeSeries.pacf3]]) —
    * the Box–Jenkins order-identification companion of q50 (ACF tails
    * off for an AR process, PACF CUTS OFF at the true order; neither
    * plot alone identifies it). Durbin–Levinson unrolled over q50's own
    * round@9 r values — the shared-artifact contract: both engines feed
    * bit-identical r into the same fixed-order expressions, and the
    * oracle literally reuses q50's CTE chain. Adds ZERO data passes
    * beyond the ACF's own; degenerate denominators NULL by mirrored
    * guards. */
  private def pacfQ(s: SparkSession, d: String): DataFrame =
    TimeSeries.pacf3(
        Tables.events(s, d)
          .select(col("event_type"), expr("unix_micros(ts)").as("__us"),
            col("event_id"), col("value")),
        "event_type", "__us", "event_id", "value")
      .orderBy(col("event_type"))

  private lazy val pacfSql =
    s"""$acfCtes,
       |rv AS (
       |  SELECT event_type,
       |    MIN(CASE WHEN lg = 1 THEN acf END) AS r1,
       |    MIN(CASE WHEN lg = 2 THEN acf END) AS r2,
       |    MIN(CASE WHEN lg = 3 THEN acf END) AS r3
       |  FROM r0 GROUP BY event_type),
       |s1 AS (SELECT *, (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22 FROM rv),
       |s2 AS (SELECT *, r1 - p22 * r1 AS p21 FROM s1),
       |s3 AS (SELECT *, 1.0 - p21 * r1 - p22 * r2 AS p33den FROM s2)
       |SELECT event_type, r1, r2, r3,
       |  round(r1, 6) AS pacf1,
       |  CASE WHEN (1.0 - r1 * r1) > 0 THEN round(p22, 6) END AS pacf2,
       |  CASE WHEN (1.0 - r1 * r1) > 0 AND p33den > 0 THEN
       |    round((r3 - p21 * r2 - p22 * r1) / p33den, 6) END AS pacf3
       |FROM s3 ORDER BY event_type""".stripMargin

  /** Interval half-width: each event claims [ts, ts + 30 min]. */
  private val IvUs = 1800L * 1000000L

  /** Q51: gaps-and-islands per user — merge each user's overlapping
    * 30-minute activity intervals into islands, then roll up to
    * (n_islands, covered_us, longest_us). Integer-exact µs arithmetic;
    * O(1) per-row window state (no arrays). */
  private def intervalsQ(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      expr("unix_micros(ts)").as("s"),
      (expr("unix_micros(ts)") + lit(IvUs)).as("e"))
    TimeSeries.mergeIntervals(iv, "user_id", "event_id", "s", "e")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("island_end") - col("island_start")).as("covered_us"),
        max(col("island_end") - col("island_start")).as("longest_us"))
      .orderBy(col("user_id"))
  }

  private val intervalsSql =
    s"""WITH iv AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS s,
       |    epoch_us(ts) + $IvUs AS e
       |  FROM events),
       |f AS (
       |  SELECT user_id, event_id, s, e,
       |    CASE WHEN max(e) OVER wp IS NULL OR s > max(e) OVER wp
       |         THEN 1 ELSE 0 END AS brk
       |  FROM iv WINDOW wp AS (PARTITION BY user_id ORDER BY s, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |isl AS (
       |  SELECT user_id, s, e,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM f),
       |g AS (
       |  SELECT user_id, island, min(s) AS island_start, max(e) AS island_end
       |  FROM isl GROUP BY 1, 2)
       |SELECT user_id, COUNT(*) AS n_islands,
       |  CAST(sum(island_end - island_start) AS BIGINT) AS covered_us,
       |  max(island_end - island_start) AS longest_us
       |FROM g GROUP BY 1 ORDER BY user_id""".stripMargin

  /** Q52: CUSUM change-point per event type — the position where the
    * centered cumulative sum peaks (Page's statistic / binary
    * segmentation step). Pure scaled-long integer arithmetic locates
    * the argmax; the reported |S| divides out as the single float op. */
  private def cusumQ(s: SparkSession, d: String): DataFrame =
    TimeSeries.cusum(
        Tables.events(s, d)
          .select(col("event_type"), expr("unix_micros(ts)").as("__us"),
            col("event_id"), col("value")),
        "event_type", "__us", "event_id", "value")
      .orderBy(col("event_type"))

  private val cusumSql =
    """WITH src AS (
      |  SELECT event_type, epoch_us(ts) AS us, event_id,
      |    CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS v6
      |  FROM events WHERE value IS NOT NULL),
      |run AS (
      |  SELECT event_type, event_id, us,
      |    row_number() OVER w AS i,
      |    sum(v6) OVER (PARTITION BY event_type ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
      |  FROM src WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id)),
      |tot AS (
      |  SELECT event_type, COUNT(*) AS n, sum(v6) AS t
      |  FROM src GROUP BY 1),
      |ns AS (
      |  SELECT r.event_type, r.i, r.event_id, t.n,
      |    abs(CAST(t.n AS DECIMAL(38,0)) * CAST(r.cs AS DECIMAL(38,0)) -
      |        CAST(r.i AS DECIMAL(38,0)) * CAST(t.t AS DECIMAL(38,0))) AS sc
      |  FROM run r JOIN tot t USING (event_type)
      |  WHERE r.i < t.n),
      |best AS (
      |  SELECT event_type, n, i, event_id, sc,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY sc DESC, i ASC) AS rn
      |  FROM ns)
      |SELECT event_type, n, i AS cp_idx, event_id AS cp_id,
      |  round(CAST(sc AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6) AS cusum_stat
      |FROM best WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** q105_adf: Augmented Dickey–Fuller unit-root test per event type
    * ([[TimeSeries.adf]]; constant, no trend, lag 1) — the
    * stationarity verdict the correlogram family (q50/q74/q83) and
    * trend tests (q72) presuppose: a unit root makes level statistics
    * spurious. The synthetic value series is stationary noise, so
    * every type rejects hard (adf_t ≪ −3.43) — the estimator visibly
    * working; the planted random-walk branch is spec-pinned
    * (TimeSeriesSpec). ols2's Cramer solve on per-key exact decimal
    * moments, SE from the 2,2 cofactor, bands on the round@6 t. */
  private def adfQ(s: SparkSession, d: String): DataFrame =
    TimeSeries.adf(
        Tables.events(s, d)
          .select(col("event_type"), expr("unix_micros(ts)").as("__us"),
            col("event_id"), col("value")),
        "event_type", "__us", "event_id", "value")
      .orderBy(col("event_type"))

  /** q105b_adf_hourly: the q105 scale note made executable (the
    * q81b/q100b/q99b precedent): the per-key total order the ADF
    * window needs bounds parallelism at the key count, so at 100× the
    * raw-series form pays the per-key-sort bill (22.5× measured);
    * running the SAME test on hourly mean values reduces map-side
    * FIRST — the series length is the hour count, the window input is
    * a bucket frame, and the scan is the only thing that grows. The
    * hourly mean is itself the standard deployment (unit-root checks
    * run on the aggregated metric being monitored, not raw ticks). */
  private def adfHourlyQ(s: SparkSession, d: String): DataFrame =
    TimeSeries.adf(
        Tables.events(s, d).filter(col("value").isNotNull)
          .groupBy(col("event_type"),
            expr("unix_micros(date_trunc('hour', ts))").as("__b"))
          .agg((sum(graft.Det.dec(col("value"))).cast("double") /
            count(lit(1)).cast("double")).as("__v")),
        "event_type", "__b", "__b", "__v")
      .orderBy(col("event_type"))

  private lazy val adfHourlySql = adfSqlChain(
    """src AS (
      |  SELECT event_type AS k, epoch_us(date_trunc('hour', ts)) AS t,
      |    epoch_us(date_trunc('hour', ts)) AS i,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) /
      |      CAST(COUNT(*) AS DOUBLE) AS v
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3)""".stripMargin)

  private lazy val adfSql = adfSqlChain(
    """src AS (
      |  SELECT event_type AS k, epoch_us(ts) AS t, event_id AS i,
      |    CAST(value AS DOUBLE) AS v
      |  FROM events WHERE value IS NOT NULL)""".stripMargin)

  /** Shared trivariate-Cramer oracle fragments over generic moment
    * names (n, s2, s3, sy, s22, s23, s33, s2y, s3y, syy) and the b0/b1/
    * b2 coefficient names — ONE definition for the ADF and Granger
    * chains, mirroring [[TimeSeries]]'s cramer3 operand for operand
    * (the q59-gated order): a reorder applied to one chain can no
    * longer silently diverge the other. */
  private val c3Det =
    """(n * (s22 * s33 - s23 * s23) - s2 * (s2 * s33 - s23 * s3)
      | + s3 * (s2 * s23 - s22 * s3))""".stripMargin.replace("\n", "")
  private val c3Det1 =
    """(sy * (s22 * s33 - s23 * s23) - s2 * (s2y * s33 - s23 * s3y)
      | + s3 * (s2y * s23 - s22 * s3y))""".stripMargin.replace("\n", "")
  private val c3Det2 =
    """(n * (s2y * s33 - s23 * s3y) - sy * (s2 * s33 - s23 * s3)
      | + s3 * (s2 * s3y - s2y * s3))""".stripMargin.replace("\n", "")
  private val c3Det3 =
    """(n * (s22 * s3y - s2y * s23) - s2 * (s2 * s3y - s2y * s3)
      | + sy * (s2 * s23 - s22 * s3))""".stripMargin.replace("\n", "")
  private val c3Sse =
    """syy - 2.0 * (b0 * sy + b1 * s2y + b2 * s3y) +
      |      (b0 * b0 * n + b1 * b1 * s22 + b2 * b2 * s33 +
      |       2.0 * b0 * b1 * s2 + 2.0 * b0 * b2 * s3 +
      |       2.0 * b1 * b2 * s23)""".stripMargin

  /** The ADF oracle chain over any `src` CTE shaped (k, t, i, v) — one
    * definition for the raw-series and hourly-mean gates. */
  private def adfSqlChain(srcCte: String) = {
    val det = c3Det
    val det1 = c3Det1
    val det2 = c3Det2
    val det3 = c3Det3
    def ds(e: String) = graft.Det.sqlSum(e)
    s"""WITH $srcCte,
       |l1 AS (
       |  SELECT k, t, i, v,
       |    lag(v) OVER (PARTITION BY k ORDER BY t, i) AS vl
       |  FROM src),
       |l2 AS (
       |  SELECT k, vl, v - vl AS dy,
       |    lag(v - vl) OVER (PARTITION BY k ORDER BY t, i) AS dyl
       |  FROM l1),
       |pts AS (
       |  SELECT k, vl AS x2, dyl AS x3, dy AS y FROM l2
       |  WHERE vl IS NOT NULL AND dyl IS NOT NULL),
       |m AS (
       |  SELECT k, CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${ds("x2")} AS s2, ${ds("x3")} AS s3,
       |    ${ds("x2 * x2")} AS s22, ${ds("x2 * x3")} AS s23,
       |    ${ds("x3 * x3")} AS s33, ${ds("y")} AS sy,
       |    ${ds("x2 * y")} AS s2y, ${ds("x3 * y")} AS s3y,
       |    ${ds("y * y")} AS syy
       |  FROM pts GROUP BY 1),
       |b AS (
       |  SELECT *, $det AS dt,
       |    $det1 / (CASE WHEN abs($det) > 0.0 THEN $det END) AS b0,
       |    $det2 / (CASE WHEN abs($det) > 0.0 THEN $det END) AS b1,
       |    $det3 / (CASE WHEN abs($det) > 0.0 THEN $det END) AS b2
       |  FROM m),
       |e AS (
       |  SELECT *,
       |    $c3Sse AS sse
       |  FROM b),
       |f AS (
       |  SELECT *, sse / (n - 3.0) * (n * s33 - s3 * s3) / dt AS varg
       |  FROM e),
       |g AS (
       |  SELECT k, n,
       |    CASE WHEN n > 3.0 AND abs(dt) > 0.0 AND varg > 0.0
       |      THEN round(b1, 9) END AS gamma,
       |    CASE WHEN n > 3.0 AND abs(dt) > 0.0 AND varg > 0.0
       |      THEN round(b1 / sqrt(varg), 6) END AS adf_t
       |  FROM f)
       |SELECT k AS event_type, CAST(n AS BIGINT) AS n, gamma, adf_t,
       |  CASE WHEN adf_t IS NULL THEN 'undefined'
       |       WHEN adf_t < -3.43 THEN 'stationary_1pct'
       |       WHEN adf_t < -2.86 THEN 'stationary_5pct'
       |       WHEN adf_t < -2.57 THEN 'stationary_10pct'
       |       ELSE 'unit_root' END AS verdict
       |FROM g ORDER BY event_type""".stripMargin
  }

  /** q106_granger: pairwise lag-1 Granger causality click ↔ purchase
    * over hourly mean values ([[TimeSeries.granger]]) — q74's CCF says
    * the series co-move; this asks the inferential question (does click
    * history improve purchase prediction beyond purchase's own?), both
    * directions from one moment pass, F banded on χ²₁ at round@6. */
  private def grangerQ(s: SparkSession, d: String): DataFrame =
    TimeSeries.granger(Tables.events(s, d),
        "event_type", "ts", "value", "click", "purchase")
      .orderBy(col("direction"))

  private lazy val grangerSql = {
    def ser(t: String, out: String) =
      s"""SELECT epoch_us(date_trunc('hour', ts)) AS b,
         |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) /
         |      CAST(COUNT(*) AS DOUBLE) AS $out
         |  FROM events WHERE event_type = '$t' AND value IS NOT NULL
         |  GROUP BY 1""".stripMargin
    def ds(e: String) = graft.Det.sqlSum(e)
    val det = c3Det
    val det1 = c3Det1
    val det2 = c3Det2
    val det3 = c3Det3
    s"""WITH xs AS (
       |  ${ser("click", "x")}),
       |ys AS (
       |  ${ser("purchase", "y")}),
       |cur AS (SELECT b, x, y FROM xs JOIN ys USING (b)),
       |prv AS (SELECT b + 3600000000 AS b, x AS xl, y AS yl FROM cur),
       |pts AS (SELECT c.x, c.y, p.xl, p.yl
       |  FROM cur c JOIN prv p USING (b)),
       |m AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${ds("x")} AS sx, ${ds("y")} AS sy,
       |    ${ds("xl")} AS sxl, ${ds("yl")} AS syl,
       |    ${ds("xl * xl")} AS sxl2, ${ds("yl * yl")} AS syl2,
       |    ${ds("yl * xl")} AS sylxl, ${ds("yl * y")} AS syly,
       |    ${ds("xl * y")} AS sxly, ${ds("xl * x")} AS sxlx,
       |    ${ds("yl * x")} AS sylx,
       |    ${ds("x * x")} AS sxx, ${ds("y * y")} AS syy
       |  FROM pts),
       |dirs AS (
       |  SELECT 'click->purchase' AS direction, n, syl AS s2, sxl AS s3,
       |    sy AS sy, syl2 AS s22, sylxl AS s23, sxl2 AS s33,
       |    syly AS s2y, sxly AS s3y, syy AS syy
       |  FROM m
       |  UNION ALL
       |  SELECT 'purchase->click', n, sxl, syl, sx, sxl2, sylxl, syl2,
       |    sxlx, sylx, sxx
       |  FROM m),
       |bb AS (
       |  SELECT *, $det AS det, (n * s22 - s2 * s2) AS drs,
       |    $det1 / (CASE WHEN abs($det) > 0.0 THEN $det END) AS b0,
       |    $det2 / (CASE WHEN abs($det) > 0.0 THEN $det END) AS b1,
       |    $det3 / (CASE WHEN abs($det) > 0.0 THEN $det END) AS b2
       |  FROM dirs),
       |ee AS (
       |  SELECT *,
       |    $c3Sse AS sseu,
       |    (n * s2y - s2 * sy) /
       |      (CASE WHEN abs(n * s22 - s2 * s2) > 0.0
       |        THEN n * s22 - s2 * s2 END) AS br
       |  FROM bb),
       |ff AS (
       |  SELECT *, syy - ((sy - br * s2) / n) * sy - br * s2y AS sser
       |  FROM ee),
       |gg AS (
       |  SELECT direction, CAST(n AS BIGINT) AS n,
       |    CASE WHEN n > 3.0 AND abs(det) > 0.0 AND abs(drs) > 0.0
       |        AND sseu > 0.0
       |      THEN round((sser - sseu) / (sseu / (n - 3.0)), 6)
       |    END AS f_stat
       |  FROM ff)
       |SELECT direction, n, f_stat,
       |  CASE WHEN f_stat IS NULL THEN 'undefined'
       |       WHEN f_stat > 6.634897 THEN 'causal_1pct'
       |       WHEN f_stat > 3.841459 THEN 'causal_5pct'
       |       ELSE 'none' END AS verdict
       |FROM gg ORDER BY direction""".stripMargin
  }

  private val PhDelta = 0.05
  private val PhLambda = 2000.0

  /** Q100: Page–Hinkley mean-drift monitor per event type — the
    * sequential "has the mean drifted up yet, and when could we first
    * have said so" readout over the per-type value series ([[TimeSeries
    * .pageHinkley]]; q52's CUSUM locates a change retrospectively, this
    * one monitors). δ=0.05, λ=2000 — at the gate's sf0.01 three of the
    * five types alarm and two do not, so both decision branches are
    * oracle-exercised. */
  private def pageHinkleyQ(s: SparkSession, d: String): DataFrame =
    TimeSeries.pageHinkley(
        Tables.events(s, d)
          .select(col("event_type"), expr("unix_micros(ts)").as("__us"),
            col("event_id"), col("value")),
        "event_type", "__us", "event_id", "value",
        delta = PhDelta, lambda = PhLambda)
      .select(col("event_type"), col("n"), col("ph_stat"),
        col("first_alarm_n").cast("long").as("first_alarm_n"),
        col("first_alarm_id"), col("alarmed"))
      .orderBy(col("event_type"))

  private val pageHinkleySql =
    s"""WITH src AS (
       |  SELECT event_type, epoch_us(ts) AS us, event_id,
       |    CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS v6
       |  FROM events WHERE value IS NOT NULL),
       |run AS (
       |  SELECT event_type, event_id,
       |    row_number() OVER w AS i,
       |    sum(v6) OVER (PARTITION BY event_type ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs6, v6
       |  FROM src WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id)),
       |term AS (
       |  SELECT event_type, event_id, i,
       |    CAST(round((CAST(v6 AS DOUBLE)/1e6 -
       |      CAST(cs6 AS DOUBLE)/(CAST(i AS DOUBLE)*1e6) -
       |      $PhDelta)*1e9, 0) AS BIGINT) AS t9
       |  FROM run),
       |mm AS (
       |  SELECT event_type, event_id, i, sum(t9) OVER w AS m9
       |  FROM term WINDOW w AS (PARTITION BY event_type ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |ph AS (
       |  SELECT event_type, event_id, i, m9,
       |    m9 - min(m9) OVER w AS ph9
       |  FROM mm WINDOW w AS (PARTITION BY event_type ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT event_type, count(*) AS n,
       |  round(CAST(arg_max(ph9, i) AS DOUBLE) / 1e9, 9) AS ph_stat,
       |  min(CASE WHEN ph9 > ${math.round(PhLambda * 1e9)} THEN i END)
       |    AS first_alarm_n,
       |  arg_min(event_id, CASE WHEN ph9 > ${math.round(PhLambda * 1e9)}
       |    THEN i END) AS first_alarm_id,
       |  count(CASE WHEN ph9 > ${math.round(PhLambda * 1e9)} THEN 1 END) > 0
       |    AS alarmed
       |FROM ph GROUP BY 1 ORDER BY event_type""".stripMargin

  private val PhHourlyLambda = 700.0

  /** Q100b: the executable form of [[TimeSeries.pageHinkley]]'s scale
    * note (the q99b precedent) — the monitor runs over per-HOUR mean
    * values, so the per-key cumulative window covers #hours bounded
    * rows (720 at sf0.1) while the event stream reduces with an
    * ordinary map-side-combined aggregate first; parallelism no longer
    * degrades to the key count as rows grow. This is the standard
    * metric-monitoring deployment: the statistic is Page–Hinkley ON THE
    * HOURLY-MEAN SERIES (each bucket one observation) — a coarser,
    * variance-damped signal than q100's row-level trajectory, hence its
    * own λ. Bucket means round@6 before the 1e6 scaling so both engines
    * feed the detector identical longs. */
  private def pageHinkleyHourlyQ(s: SparkSession, d: String): DataFrame =
    TimeSeries.pageHinkley(
        Tables.events(s, d)
          .filter(col("value").isNotNull)
          .groupBy(col("event_type"),
            expr("unix_micros(date_trunc('hour', ts))").as("b"))
          .agg(round(graft.Det.dsum(col("value")) / count(lit(1)), 6)
            .as("mv")),
        "event_type", "b", "b", "mv",
        delta = PhDelta, lambda = PhHourlyLambda)
      .select(col("event_type"), col("n"), col("ph_stat"),
        col("first_alarm_n").cast("long").as("first_alarm_n"),
        col("first_alarm_id").as("first_alarm_bucket"), col("alarmed"))
      .orderBy(col("event_type"))

  private val pageHinkleyHourlySql =
    s"""WITH buckets AS (
       |  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS b,
       |    round(${Det.sqlSum("CAST(value AS DOUBLE)")} / COUNT(*), 6) AS mv
       |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
       |src AS (
       |  SELECT event_type, b,
       |    CAST(CAST(mv AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS v6
       |  FROM buckets),
       |run AS (
       |  SELECT event_type, b, row_number() OVER w AS i,
       |    sum(v6) OVER (PARTITION BY event_type ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs6, v6
       |  FROM src WINDOW w AS (PARTITION BY event_type ORDER BY b)),
       |term AS (
       |  SELECT event_type, b, i,
       |    CAST(round((CAST(v6 AS DOUBLE)/1e6 -
       |      CAST(cs6 AS DOUBLE)/(CAST(i AS DOUBLE)*1e6) -
       |      $PhDelta)*1e9, 0) AS BIGINT) AS t9
       |  FROM run),
       |mm AS (
       |  SELECT event_type, b, i, sum(t9) OVER w AS m9
       |  FROM term WINDOW w AS (PARTITION BY event_type ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |ph AS (
       |  SELECT event_type, b, i, m9,
       |    m9 - min(m9) OVER w AS ph9
       |  FROM mm WINDOW w AS (PARTITION BY event_type ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT event_type, count(*) AS n,
       |  round(CAST(arg_max(ph9, i) AS DOUBLE) / 1e9, 9) AS ph_stat,
       |  min(CASE WHEN ph9 > ${math.round(PhHourlyLambda * 1e9)} THEN i END)
       |    AS first_alarm_n,
       |  arg_min(b, CASE WHEN ph9 > ${math.round(PhHourlyLambda * 1e9)}
       |    THEN i END) AS first_alarm_bucket,
       |  count(CASE WHEN ph9 > ${math.round(PhHourlyLambda * 1e9)} THEN 1 END)
       |    > 0 AS alarmed
       |FROM ph GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Q103: the drift CONSOLE — the monitoring composition gate (the
    * pipeline_e2e_v4 discipline applied to the time-series family):
    * per event type, in ONE lazy plan, the three complementary drift
    * readouts a metric owner actually pages on — HOW MUCH the
    * distribution moved (q101b's fixed-bin PSI + band), WHEN the mean
    * drift became detectable (q100's Page–Hinkley first alarm) and
    * WHERE the single most likely level shift sits (q52's CUSUM
    * argmax). Each component keeps its standalone gated shape; the
    * console is three key-aligned joins of 5-row frames. The oracle
    * composes the three components' own CTE chains verbatim. */
  private def driftConsoleQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), expr("unix_micros(ts)").as("__us"),
        col("event_id"), col("value"))
    val psiF = graft.operators.StatTests.psiFixed(
      ev.select(col("event_type"), col("__us"), col("value")),
      "event_type", "__us", "value")
    val ph = TimeSeries.pageHinkley(ev,
        "event_type", "__us", "event_id", "value",
        delta = PhDelta, lambda = PhLambda)
      .select(col("event_type"), col("n").as("n_events"),
        col("ph_stat"), col("first_alarm_n").cast("long").as("first_alarm_n"),
        col("alarmed"))
    val cp = TimeSeries.cusum(ev, "event_type", "__us", "event_id", "value")
      .select(col("event_type"), col("cp_idx"), col("cp_id"),
        col("cusum_stat"))
    psiF.join(ph, Seq("event_type")).join(cp, Seq("event_type"))
      .orderBy(col("event_type"))
  }

  private lazy val driftConsoleSql =
    s"""WITH psi AS (${StatsQueries.psiFixedSql}),
       |ph AS ($pageHinkleySql),
       |cp AS ($cusumSql)
       |SELECT p.event_type, p.n_ref, p.n_cur, p.psi, p.shift,
       |  h.n AS n_events, h.ph_stat, h.first_alarm_n, h.alarmed,
       |  c.cp_idx, c.cp_id, c.cusum_stat
       |FROM psi p JOIN ph h USING (event_type) JOIN cp c USING (event_type)
       |ORDER BY p.event_type""".stripMargin

  private val SeasonalHalf = 12

  /** Q60: classical additive seasonal decomposition of the per-type
    * hourly value series — level / centered-25 trend / hour-of-day
    * seasonal / residual, all in 1e-9-scaled integer arithmetic between
    * roundings. */
  private def seasonalQ(s: SparkSession, d: String): DataFrame =
    TimeSeries.seasonalDecompose(
        Tables.events(s, d), "event_type", "ts", "value", SeasonalHalf)
      .orderBy(col("event_type"), col("b"))

  private val seasonalSql = {
    val width = 2 * SeasonalHalf + 1
    s"""WITH buckets AS (
       |  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS b,
       |    CAST(round(${Det.sqlSum("CAST(value AS DOUBLE)")} / COUNT(*) * 1e9, 0)
       |      AS BIGINT) AS l9
       |  FROM events WHERE value IS NOT NULL
       |  GROUP BY 1, 2),
       |tr AS (
       |  SELECT event_type, b, l9,
       |    CASE WHEN COUNT(*) OVER w = $width
       |          AND MAX(b) OVER w - MIN(b) OVER w = ${(width - 1).toLong * 3600000000L}
       |         THEN CAST(round(CAST(SUM(l9) OVER w AS DOUBLE) /
       |           ${width.toDouble}, 0) AS BIGINT) END AS t9
       |  FROM buckets
       |  WINDOW w AS (PARTITION BY event_type ORDER BY b
       |    ROWS BETWEEN $SeasonalHalf PRECEDING AND $SeasonalHalf FOLLOWING)),
       |se AS (
       |  SELECT event_type, hour(make_timestamp(b)) AS h,
       |    CAST(round(CAST(SUM(l9 - t9) AS DOUBLE) /
       |      CAST(COUNT(*) AS DOUBLE), 0) AS BIGINT) AS s9
       |  FROM tr WHERE t9 IS NOT NULL GROUP BY 1, 2)
       |SELECT tr.event_type, tr.b,
       |  round(CAST(tr.l9 AS DOUBLE) / 1e9, 9) AS level,
       |  round(CAST(tr.t9 AS DOUBLE) / 1e9, 9) AS trend,
       |  round(CAST(se.s9 AS DOUBLE) / 1e9, 9) AS seasonal,
       |  round(CAST(tr.l9 - tr.t9 - se.s9 AS DOUBLE) / 1e9, 9) AS residual
       |FROM tr LEFT JOIN se
       |  ON se.event_type = tr.event_type AND se.h = hour(make_timestamp(tr.b))
       |ORDER BY tr.event_type, tr.b""".stripMargin
  }

  /** q69_hampel: rolling median/MAD outlier flags over each event
    * type's value series ([[TimeSeries.hampel]], ±5-row window). The
    * per-window robust twin of q52's global CUSUM: a spike is flagged
    * against its LOCAL neighborhood, so a level shift upstream doesn't
    * mask it. Integer-exact end to end: 1e9-scaled longs, odd window ⇒
    * single-order-statistic median/MAD, denominator-cleared
    * decimal/HUGEINT inequality (|x−med|·10⁴ > 44478·MAD — wide
    * integers so the ×10⁴ can never wrap a long). One key exchange. */
  private def hampelQ(s: SparkSession, d: String): DataFrame =
    TimeSeries.hampel(Tables.events(s, d),
        "event_type", "ts", "event_id", "value", k = 5)
      .orderBy(col("event_type"), col("event_id"))

  private val hampelSql =
    """WITH src AS (
      |  SELECT event_type, ts, event_id,
      |    CAST(round(CAST(value AS DOUBLE) * 1e9, 0) AS BIGINT) AS v9
      |  FROM events WHERE value IS NOT NULL),
      |w AS (
      |  SELECT event_type, event_id, v9,
      |    list(v9) OVER (PARTITION BY event_type ORDER BY ts, event_id
      |      ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS arr
      |  FROM src),
      |s AS (
      |  SELECT event_type, event_id, v9, arr, list_sort(arr)[6] AS med9
      |  FROM w WHERE len(arr) = 11),
      |m AS (
      |  SELECT event_type, event_id, v9, med9,
      |    list_sort(list_transform(arr, x -> abs(x - med9)))[6] AS mad9
      |  FROM s)
      |SELECT event_type, event_id, med9, mad9,
      |  CAST(abs(CAST(v9 AS HUGEINT) - med9) * 10000 >
      |    44478 * CAST(mad9 AS HUGEINT) AS INTEGER) AS is_out
      |FROM m ORDER BY event_type, event_id""".stripMargin

  /** q74_ccf: lead/lag cross-correlation click→purchase at lags 0..3
    * hours ([[TimeSeries.ccf]]) — the two-series sibling of q50's ACF,
    * answering "does click volume predict purchase value an hour
    * later". Hourly means from exact decimal sums; guarded Pearson per
    * lag, round@9. */
  private def ccfQ(s: SparkSession, d: String): DataFrame =
    TimeSeries.ccf(Tables.events(s, d),
        "event_type", "ts", "value", "click", "purchase", maxLag = 3)
      .orderBy(col("lag"))

  private val ccfSql = {
    def ser(t: String) =
      s"""SELECT epoch_us(date_trunc('hour', ts)) AS b,
         |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) /
         |      CAST(COUNT(*) AS DOUBLE) AS v
         |  FROM events WHERE event_type = '$t' AND value IS NOT NULL
         |  GROUP BY 1""".stripMargin
    val varx = "(CAST(n_pairs AS DOUBLE) * sxx - sx * sx)"
    val vary = "(CAST(n_pairs AS DOUBLE) * syy - sy * sy)"
    s"""WITH xs AS (
       |  ${ser("click").replace("AS v", "AS x")}),
       |ys0 AS (
       |  ${ser("purchase").replace("AS v", "AS y")}),
       |ys AS (
       |  SELECT l.lag, ys0.b - l.lag * 3600000000 AS b, ys0.y
       |  FROM ys0 CROSS JOIN (SELECT unnest(range(0, 4)) AS lag) l),
       |p AS (SELECT ys.lag, xs.x, ys.y FROM xs JOIN ys USING (b)),
       |m AS (
       |  SELECT lag, COUNT(*) AS n_pairs,
       |    ${graft.Det.sqlSum("x")} AS sx, ${graft.Det.sqlSum("y")} AS sy,
       |    ${graft.Det.sqlSum("x * x")} AS sxx,
       |    ${graft.Det.sqlSum("y * y")} AS syy,
       |    ${graft.Det.sqlSum("x * y")} AS sxy
       |  FROM p GROUP BY lag)
       |SELECT CAST(lag AS INTEGER) AS lag, n_pairs,
       |  CASE WHEN n_pairs >= 2 AND $varx > 0.0 AND $vary > 0.0
       |    THEN round((CAST(n_pairs AS DOUBLE) * sxy - sx * sy) /
       |      sqrt($varx * $vary), 9) END AS ccf
       |FROM m ORDER BY lag""".stripMargin
  }

  /** q75_dispersion: variance-to-mean ratio + Goh–Barabási burstiness
    * of the hourly event counts per type ([[TimeSeries.dispersion]]) —
    * the Poisson-or-bursty traffic readout that decides whether rate
    * alerts need a clumping correction. Integer-exact count moments. */
  private def dispersionQ(s: SparkSession, d: String): DataFrame =
    TimeSeries.dispersion(Tables.events(s, d), "event_type", "ts")
      .orderBy(col("event_type"))

  private val dispersionSql =
    """WITH c AS (
      |  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS b,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, COUNT(*) AS n_buckets,
      |    CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c * c) AS BIGINT) AS s2
      |  FROM c GROUP BY 1)
      |SELECT event_type, n_buckets, s1, s2,
      |  round(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) /
      |      CAST(n_buckets AS DOUBLE)) / (CAST(n_buckets AS DOUBLE) - 1.0)) /
      |    (CAST(s1 AS DOUBLE) / CAST(n_buckets AS DOUBLE)), 9) AS dispersion,
      |  round((sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) *
      |      CAST(s1 AS DOUBLE) / CAST(n_buckets AS DOUBLE)) /
      |      (CAST(n_buckets AS DOUBLE) - 1.0)) -
      |    CAST(s1 AS DOUBLE) / CAST(n_buckets AS DOUBLE)) /
      |    (sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) *
      |      CAST(s1 AS DOUBLE) / CAST(n_buckets AS DOUBLE)) /
      |      (CAST(n_buckets AS DOUBLE) - 1.0)) +
      |    CAST(s1 AS DOUBLE) / CAST(n_buckets AS DOUBLE)), 9) AS burstiness
      |FROM m WHERE n_buckets >= 2 ORDER BY event_type""".stripMargin

  val caps: Seq[Capability] = Seq(
    Capability("q50_acf",
      "autocorrelation at lags 1-3 per series: exact-moment guarded Pearson",
      acfQ, Some(acfSql)),
    Capability("q83_pacf",
      "partial autocorrelation: Durbin-Levinson unrolled over the q50 r values",
      pacfQ, Some(pacfSql)),
    Capability("q51_intervals",
      "gaps-and-islands interval merge per user (O(1) window state, integer-exact)",
      intervalsQ, Some(intervalsSql)),
    Capability("q52_cusum",
      "CUSUM change-point location per series (scaled-long exact argmax)",
      cusumQ, Some(cusumSql)),
    Capability("q105_adf",
      "augmented Dickey-Fuller unit-root test per series (lag 1, DF bands)",
      adfQ, Some(adfSql)),
    Capability("q105b_adf_hourly",
      "ADF over hourly means: map-side-first reduction, the scale path",
      adfHourlyQ, Some(adfHourlySql)),
    Capability("q106_granger",
      "pairwise lag-1 Granger causality over hourly series, both directions",
      grangerQ, Some(grangerSql)),
    Capability("q100_page_hinkley",
      "Page-Hinkley mean-drift monitor per series: first-alarm index, scaled-long exact",
      pageHinkleyQ, Some(pageHinkleySql)),
    Capability("q100b_page_hinkley_hourly",
      "Page-Hinkley over hourly mean increments: bounded window, the scale path",
      pageHinkleyHourlyQ, Some(pageHinkleyHourlySql)),
    Capability("q103_drift_console",
      "monitoring composition: PSI amount + PH onset + CUSUM location, one lazy plan",
      driftConsoleQ, Some(driftConsoleSql)),
    Capability("q60_seasonal",
      "additive seasonal decomposition: level/trend/seasonal/residual, integer-exact",
      seasonalQ, Some(seasonalSql)),
    Capability("q69_hampel",
      "Hampel filter: rolling median/MAD outlier flags (odd window, long-exact rule)",
      hampelQ, Some(hampelSql)),
    Capability("q74_ccf",
      "cross-correlation click->purchase at hour lags (exact-moment Pearson)",
      ccfQ, Some(ccfSql)),
    Capability("q75_dispersion",
      "index of dispersion + burstiness of hourly counts (exact count moments)",
      dispersionQ, Some(dispersionSql)),
  )
}
