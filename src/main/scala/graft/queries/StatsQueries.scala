package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Capability, Det, Tables}
import graft.operators.StatTests

/** Declared statistical-test capabilities ([[graft.operators.
  * StatTests]]): Welch's t, Mann–Whitney U, chi-squared homogeneity —
  * the A/B-experiment and drift-QA readouts over the events/documents
  * tables.
  */
object StatsQueries {

  /** q55_welch: pairwise Welch's t between all event-type value
    * distributions — exact decimal moments, one fixed-order IEEE
    * formula per pair, round@6. */
  private def welchQ(s: SparkSession, d: String): DataFrame =
    StatTests.welchPairs(Tables.events(s, d), "event_type", "value")
      .orderBy(col("g_a"), col("g_b"))

  private val welchSql =
    s"""WITH m AS (
       |  SELECT event_type AS g, COUNT(*) AS n,
       |    ${Det.sqlSum("CAST(value AS DOUBLE)")} AS sx,
       |    ${Det.sqlSum("CAST(value AS DOUBLE) * CAST(value AS DOUBLE)")} AS sxx
       |  FROM events WHERE value IS NOT NULL GROUP BY 1),
       |v AS (
       |  SELECT g, n, sx / CAST(n AS DOUBLE) AS mean,
       |    ((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
       |      / CAST(n AS DOUBLE) AS vn
       |  FROM m)
       |SELECT a.g AS g_a, b.g AS g_b, a.n AS n_a, b.n AS n_b,
       |  round((a.mean - b.mean) / sqrt(a.vn + b.vn), 6) AS t_stat,
       |  round(((a.vn + b.vn) * (a.vn + b.vn)) /
       |    (a.vn * a.vn / (CAST(a.n AS DOUBLE) - 1.0) +
       |     b.vn * b.vn / (CAST(b.n AS DOUBLE) - 1.0)), 6) AS t_df
       |FROM v a JOIN v b ON a.g < b.g
       |ORDER BY g_a, g_b""".stripMargin

  private val MwA = "click"
  private val MwB = "purchase"

  /** q56_mannwhitney: Mann–Whitney U between the $MwA and $MwB value
    * distributions — exact ×2-scaled U from per-value counts (no row
    * ever ranked), tie-corrected normal z round@6. */
  private def mwQ(s: SparkSession, d: String): DataFrame =
    StatTests.mannWhitney(Tables.events(s, d), "event_type", "value", MwA, MwB)

  /** The exact cohort per-value count CTE (q56/q58/q58b) — pooled
    * distinct values of the two event-type cohorts. */
  private val mwVcExact =
    s"""vc AS (
       |  SELECT CAST(value AS DOUBLE) AS v,
       |    COUNT(*) FILTER (event_type = '$MwA') AS c1,
       |    COUNT(*) FILTER (event_type = '$MwB') AS c2
       |  FROM events
       |  WHERE value IS NOT NULL AND event_type IN ('$MwA', '$MwB')
       |  GROUP BY 1)""".stripMargin

  /** The fixed-grid twin of [[mwVcExact]] (q56b/q58c/q58d): same
    * cohorts, values quantized to the [[StatTests.clampBinOf]] grid
    * (bin = floor(clamp((v−lo)/w)) over the pooled (min, max) support)
    * BEFORE counting — mirrors
    * [[StatTests.quantizedSrc]] text-for-text so both engines bin
    * identically; the statistic tails below are then literally shared
    * with the exact forms. */
  private def mwVcBinned(nBins: Int) =
    s"""src0 AS (
       |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
       |  FROM events
       |  WHERE value IS NOT NULL AND event_type IN ('$MwA', '$MwB')),
       |bnd AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM src0),
       |srcb AS (
       |  SELECT g, CASE WHEN hi = lo THEN 0.0 ELSE
       |    CAST(floor(least(${nBins - 1}.0, greatest(0.0,
       |      (v - lo) / ((hi - lo) / ${nBins}.0)))) AS DOUBLE) END AS v
       |  FROM src0, bnd),
       |vc AS (
       |  SELECT v,
       |    COUNT(*) FILTER (g = '$MwA') AS c1,
       |    COUNT(*) FILTER (g = '$MwB') AS c2
       |  FROM srcb GROUP BY 1)""".stripMargin

  /** Shared MW statistic tail: everything after the per-value count
    * frame `vc` — one text for the exact and binned gates. */
  private val mwSqlTail =
    s"""p AS (
       |  SELECT c1 * coalesce(SUM(c2) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
       |    + c1 * c2 AS p2, c1, c2
       |  FROM vc),
       |s AS (
       |  SELECT CAST(SUM(p2) AS BIGINT) AS u1x2,
       |    CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
       |    CAST(SUM((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS BIGINT) AS tsum
       |  FROM p)
       |SELECT n1, n2, u1x2, CAST(n1 * n2 * 2 - u1x2 AS BIGINT) AS u2x2,
       |  round((CAST(u1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) /
       |    (sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
       |      ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0) -
       |       CAST(tsum AS DOUBLE) /
       |       ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) *
       |        (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))) * 2.0), 6) AS z,
       |  round(CAST(u1x2 AS DOUBLE) /
       |    CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) - 1.0, 9)
       |    AS rank_biserial
       |FROM s""".stripMargin

  private val mwSql = s"WITH $mwVcExact,\n$mwSqlTail"

  /** q56b_mannwhitney_binned: [[StatTests.mannWhitneyBinned]] on the
    * same cohorts — the continuous-domain scale path: events.value is
    * near-continuous (distinct ≈ N), so the exact form's global
    * distinct-value window grows with the corpus while this one is
    * capped at 64 rows forever; the statistic is the exact U of the
    * grid-quantized sample (≤ one binwidth value perturbation). */
  private def mwBinnedQ(s: SparkSession, d: String): DataFrame =
    StatTests.mannWhitneyBinned(Tables.events(s, d), "event_type",
      "value", MwA, MwB, nBins = 64)

  private val mwBinnedSql = s"WITH ${mwVcBinned(64)},\n$mwSqlTail"

  private val FdrAlpha = 0.05

  /** q66_fdr: every pairwise Mann–Whitney comparison of the event-type
    * value distributions under Benjamini–Hochberg FDR control — the
    * multiple-testing discipline a drift dashboard needs the moment it
    * runs more than one test. z per pair is exactly q56's statistic;
    * the two-sided p and the BH step-up run on shared SQL text (the
    * q19b cross-engine contract). */
  private def fdrQ(s: SparkSession, d: String): DataFrame =
    StatTests.mannWhitneyPairsFdr(
        Tables.events(s, d), "event_type", "value", FdrAlpha)
      .orderBy(col("g_a"), col("g_b"))

  private val fdrSql = {
    val zExpr =
      """round((CAST(u1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) /
        |    (sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |      ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0) -
        |       CAST(tsum AS DOUBLE) /
        |       ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) *
        |        (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))) * 2.0), 6)""".stripMargin
    s"""WITH vc AS (
       |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v, COUNT(*) AS c
       |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
       |gs AS (SELECT DISTINCT g FROM vc),
       |pairs AS (SELECT a.g AS g_a, b.g AS g_b FROM gs a JOIN gs b ON a.g < b.g),
       |pv AS (
       |  SELECT p.g_a, p.g_b, v.v,
       |    SUM(CASE WHEN v.g = p.g_a THEN v.c ELSE 0 END) AS c1,
       |    SUM(CASE WHEN v.g = p.g_b THEN v.c ELSE 0 END) AS c2
       |  FROM pairs p JOIN vc v ON v.g IN (p.g_a, p.g_b)
       |  GROUP BY 1, 2, 3),
       |pre AS (
       |  SELECT g_a, g_b, c1, c2,
       |    c1 * coalesce(SUM(c2) OVER (PARTITION BY g_a, g_b ORDER BY v
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2
       |      + c1 * c2 AS p2
       |  FROM pv),
       |s AS (
       |  SELECT g_a, g_b, CAST(SUM(p2) AS BIGINT) AS u1x2,
       |    CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
       |    CAST(SUM((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS BIGINT)
       |      AS tsum
       |  FROM pre GROUP BY 1, 2),
       |zz AS (SELECT g_a, g_b, $zExpr AS z FROM s),
       |pp AS (SELECT g_a, g_b, z, ${StatTests.pTwoSidedSql("z")} AS p FROM zz),
       |rk AS (
       |  SELECT g_a, g_b, z, p,
       |    row_number() OVER (ORDER BY p, g_a, g_b) AS bh_rank,
       |    COUNT(*) OVER () AS m
       |  FROM pp),
       |th AS (
       |  SELECT g_a, g_b, z, p, bh_rank,
       |    CAST(bh_rank AS DOUBLE) * $FdrAlpha / CAST(m AS DOUBLE) AS bh_thresh
       |  FROM rk),
       |k AS (SELECT MAX(CASE WHEN p <= bh_thresh THEN bh_rank END) AS kk FROM th)
       |SELECT g_a, g_b, z, p, bh_rank, bh_thresh,
       |  (k.kk IS NOT NULL AND bh_rank <= k.kk) AS reject
       |FROM th CROSS JOIN k ORDER BY g_a, g_b""".stripMargin
  }

  /** q67_theil_sen: robust Theil–Sen line fit per event type (lower
    * medians of 1e-9-scaled pairwise slopes / residuals over a
    * budget-thinned point set —
    * [[graft.operators.StatTests.theilSenBudget]]). The
    * 29.3%-breakdown complement to q59's OLS.
    *
    * Lottery history — the operator's scale lesson in two rounds: the
    * first sf0.1 bench at the '20' hand constant measured 87 s (the
    * sorted slope frame is quadratic in the kept sample), round 11
    * re-tuned to '08' (5 s at sf0.1) — and the round-12 sf1 rehearsal
    * showed '08' itself blowing the envelope at the next decade (453 s
    * at 10×; before the bounded-memory median fix it OOMed outright).
    * The gate therefore runs the SCALE-ADAPTIVE lottery: each group
    * keeps ~[[TheilSenBudgetPts]] points via the integer threshold
    * τ = clamp(⌊2³²·T/n⌋, 1, 2³²) over the 8-hex md5 prefix, so a
    * 10× corpus keeps the SAME sample and the rehearsal measures 6.6 s
    * at sf1 — flat by construction, no per-SF re-tuning ever again.
    * The oracle replays the count CTE and the clamp verbatim. The
    * fixed-threshold `theilSen(sampleUpper)` API remains for callers
    * who want an explicit keep fraction. */
  private def theilSenQ(s: SparkSession, d: String): DataFrame =
    StatTests.theilSenBudget(
        Tables.events(s, d), "event_type", "ts", "event_id", "value",
        targetPoints = TheilSenBudgetPts)
      .orderBy(col("g"))

  private val TheilSenBudgetPts = 400

  /** The budget-lottery point selection as oracle SQL — shared by the
    * Theil–Sen and Mann–Kendall gates so the two run on the SAME
    * points (one estimator/test pair, the published pairing). */
  private lazy val budgetPtsSql =
    s"""allp AS (
       |  SELECT event_type AS g, epoch_us(ts) AS t, event_id AS i,
       |    CAST(value AS DOUBLE) AS v,
       |    ('0x' || substring(md5(event_id::VARCHAR), 1, 8))::BIGINT AS lot
       |  FROM events WHERE value IS NOT NULL),
       |cnt AS (SELECT g, COUNT(*) AS n_all FROM allp GROUP BY g),
       |pts AS (
       |  SELECT allp.g, t, i, v FROM allp JOIN cnt USING (g)
       |  WHERE lot < least(4294967296, greatest(1,
       |    4294967296 * $TheilSenBudgetPts // n_all)))""".stripMargin

  private lazy val theilSenSql =
    s"""WITH $budgetPtsSql,
      |sl AS (
      |  SELECT a.g,
      |    CAST(round((b.v - a.v) /
      |      (CAST(b.t - a.t AS DOUBLE) / 3600000000.0) * 1e9, 0) AS BIGINT) AS s9
      |  FROM pts a JOIN pts b ON b.g = a.g AND a.t < b.t),
      |ms AS (
      |  SELECT g, s9, row_number() OVER (PARTITION BY g ORDER BY s9) AS rn,
      |    COUNT(*) OVER (PARTITION BY g) AS m
      |  FROM sl),
      |med AS (SELECT g, s9, m AS n_slopes FROM ms WHERE rn = (m + 1) // 2),
      |res AS (
      |  SELECT p.g,
      |    CAST(round((p.v - CAST(med.s9 AS DOUBLE) / 1e9 *
      |      (CAST(p.t AS DOUBLE) / 3600000000.0)) * 1e9, 0) AS BIGINT) AS r9
      |  FROM pts p JOIN med ON med.g = p.g),
      |mr AS (
      |  SELECT g, r9, row_number() OVER (PARTITION BY g ORDER BY r9) AS rn,
      |    COUNT(*) OVER (PARTITION BY g) AS m
      |  FROM res),
      |ic AS (SELECT g, r9, m AS n_pts FROM mr WHERE rn = (m + 1) // 2)
      |SELECT med.g, ic.n_pts, med.n_slopes,
      |  CAST(med.s9 AS DOUBLE) / 1e9 AS slope,
      |  CAST(ic.r9 AS DOUBLE) / 1e9 AS intercept
      |FROM med JOIN ic ON ic.g = med.g ORDER BY med.g""".stripMargin

  /** q64_mutual_info: mutual information (bits) between document source
    * and md5 token bucket — the feature-relevance twin of q57's X² over
    * the SAME contingency table (observed cells only: 0·log0 = 0). */
  private def miQ(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"),
        explode(graft.functions.TextOps.words(col("text"))).as("__w"))
      .select(col("source"), graft.pipeline.Drift.bucketOf(col("__w")).as("b"))
    StatTests.mutualInfo(toks, "source", "b")
  }

  private val miSql =
    s"""WITH toks AS (
       |  SELECT source AS r,
       |    (('0x' || substring(md5(w), 1, 4))::INT % ${graft.pipeline.Drift.Buckets}) AS c
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)),
       |o AS (SELECT r, c, COUNT(*) AS o FROM toks GROUP BY 1, 2),
       |rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS rtot FROM o GROUP BY 1),
       |ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS ctot FROM o GROUP BY 1),
       |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS ntot FROM o),
       |cell AS (
       |  SELECT CAST(round(CAST(o.o AS DOUBLE) / CAST(nn.ntot AS DOUBLE) *
       |      log2(CAST(o.o AS DOUBLE) * CAST(nn.ntot AS DOUBLE) /
       |        (CAST(rt.rtot AS DOUBLE) * CAST(ct.ctot AS DOUBLE))) * 1e9, 0)
       |    AS BIGINT) AS t9, nn.ntot
       |  FROM o JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN nn)
       |SELECT CAST(SUM(t9) AS BIGINT) AS mi_9, CAST(MAX(ntot) AS BIGINT) AS n
       |FROM cell""".stripMargin

  /** q58_ks: two-sample Kolmogorov–Smirnov between the $MwA and $MwB
    * value distributions — the D location is pure integer arithmetic
    * over per-value counts (exact d_num = max|cum1·n2 − cum2·n1|), one
    * division at the end. */
  private def ksQ(s: SparkSession, d: String): DataFrame =
    StatTests.ksTest(Tables.events(s, d), "event_type", "value", MwA, MwB)

  /** Shared KS statistic tail over the `vc` count frame (exact q58 and
    * binned q58c gates). */
  private val ksSqlTail =
    s"""cums AS (
       |  SELECT
       |    SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
       |    SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
       |  FROM vc),
       |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM vc),
       |top AS (
       |  SELECT t.n1, t.n2,
       |    CAST(MAX(abs(cum1 * t.n2 - cum2 * t.n1)) AS BIGINT) AS d_num
       |  FROM cums, tot t GROUP BY 1, 2)
       |SELECT n1, n2, d_num,
       |  round(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 9) AS d,
       |  round(sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) /
       |      (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) *
       |    (CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))), 6) AS ks_stat
       |FROM top""".stripMargin

  private val ksSql = s"WITH $mwVcExact,\n$ksSqlTail"

  /** q58c_ks_binned: [[StatTests.ksTestBinned]] — D on the 64-bin
    * grid CDF (|D_binned − D_exact| ≤ the largest pooled CDF mass in
    * any bin); the distinct-value window is capped at 64 rows at any
    * corpus size. */
  private def ksBinnedQ(s: SparkSession, d: String): DataFrame =
    StatTests.ksTestBinned(Tables.events(s, d), "event_type", "value",
      MwA, MwB, nBins = 64)

  private val ksBinnedSql = s"WITH ${mwVcBinned(64)},\n$ksSqlTail"

  /** q58b_cvm: two-sample Cramér–von Mises between the same cohorts as
    * q58 ([[StatTests.cvmTest]]) — the L² member of the distance trio
    * (q58 sup / q104 L¹ / this L²), more sensitive than KS to
    * distributed differences. Same distinct-value frame; rounded
    * 1e-9 terms summed in decimal/HUGEINT; T round@6. */
  private def cvmQ(s: SparkSession, d: String): DataFrame =
    StatTests.cvmTest(Tables.events(s, d), "event_type", "value",
      MwA, MwB)

  /** Shared CvM statistic tail over the `vc` count frame (exact q58b
    * and binned q58d gates). */
  private lazy val cvmSqlTail = {
    def dd(x: String) = s"CAST($x AS DOUBLE)"
    val diff = s"(${dd("cum1")} / ${dd("t.n1")} - ${dd("cum2")} / ${dd("t.n2")})"
    s"""cums AS (
       |  SELECT c1, c2,
       |    SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
       |    SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
       |  FROM vc),
       |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
       |  CAST(SUM(c2) AS BIGINT) AS n2 FROM vc),
       |ag AS (
       |  SELECT t.n1, t.n2,
       |    SUM(CASE WHEN t.n1 > 0 AND t.n2 > 0 THEN
       |      CAST(round($diff * $diff * ${dd("c1 + c2")} * 1e9, 0)
       |        AS BIGINT) ELSE 0 END) AS s9
       |  FROM cums, tot t GROUP BY 1, 2)
       |SELECT n1, n2,
       |  CASE WHEN n1 > 0 AND n2 > 0 THEN
       |    round(${dd("n1")} * ${dd("n2")} /
       |      ((${dd("n1")} + ${dd("n2")}) * (${dd("n1")} + ${dd("n2")})) *
       |      (${dd("s9")} / 1e9), 6) END AS cvm_t
       |FROM ag""".stripMargin
  }

  private lazy val cvmSql = s"WITH $mwVcExact,\n$cvmSqlTail"

  /** q58d_cvm_binned: [[StatTests.cvmTestBinned]] — the L² CDF
    * distance on the 64-bin grid; same scan-floor scale shape as
    * q56b/q58c. */
  private def cvmBinnedQ(s: SparkSession, d: String): DataFrame =
    StatTests.cvmTestBinned(Tables.events(s, d), "event_type", "value",
      MwA, MwB, nBins = 64)

  private lazy val cvmBinnedSql = s"WITH ${mwVcBinned(64)},\n$cvmSqlTail"

  /** q107_cochran_q: Cochran's Q across the five event types on the
    * same users ([[StatTests.cochranQ]]) — "does the lean-toward-this-
    * type proportion differ across types for the SAME user base", the
    * k-condition McNemar / binary Friedman that q57's unpaired
    * chi-squared cannot answer. The binary outcome is SCALE-INVARIANT
    * (an absolute count bar saturates to all-1s as rows/user grow —
    * the degenerate NULL the first cut hit): x = 1 when the user's
    * count for the type exceeds their own per-type average (5·c >
    * user total; the corpus has exactly 5 types). Exact integer
    * totals, decimal/HUGEINT products, one division round@6. */
  private def cochranQQ(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(col("user_id"))
      .agg(sum(col("__c")).as("__tot"))
    val x = counts.join(totals, Seq("user_id"))
      .select(col("user_id"), col("event_type"),
        (lit(5L) * col("__c") > col("__tot")).cast("long").as("x"))
    StatTests.cochranQ(x, "user_id", "event_type", "x")
  }

  private lazy val cochranQSql =
    """WITH counts AS (
      |  SELECT user_id, event_type, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |totals AS (
      |  SELECT user_id, CAST(SUM(c) AS BIGINT) AS tot
      |  FROM counts GROUP BY 1),
      |x AS (
      |  SELECT counts.user_id AS b, event_type AS cnd,
      |    CASE WHEN 5 * c > tot THEN 1 ELSE 0 END AS x
      |  FROM counts JOIN totals USING (user_id)),
      |kk AS (SELECT CAST(COUNT(DISTINCT cnd) AS BIGINT) AS k FROM x),
      |cj AS (
      |  SELECT CAST(SUM(cjj) AS BIGINT) AS nn,
      |    SUM(CAST(cjj AS HUGEINT) * CAST(cjj AS HUGEINT)) AS sc2
      |  FROM (SELECT cnd, CAST(SUM(x) AS BIGINT) AS cjj
      |        FROM x GROUP BY 1)),
      |ri AS (
      |  SELECT COUNT(*) AS n_blocks,
      |    SUM(CAST(rii AS HUGEINT) * CAST(rii AS HUGEINT)) AS sr2
      |  FROM (SELECT b, CAST(SUM(x) AS BIGINT) AS rii
      |        FROM x GROUP BY 1))
      |SELECT n_blocks, k, nn AS n_success,
      |  CASE WHEN CAST(k AS HUGEINT) * CAST(nn AS HUGEINT) - sr2 > 0 THEN
      |    round(CAST((CAST(k AS HUGEINT) - 1) *
      |        (CAST(k AS HUGEINT) * sc2 -
      |         CAST(nn AS HUGEINT) * CAST(nn AS HUGEINT)) AS DOUBLE) /
      |      CAST(CAST(k AS HUGEINT) * CAST(nn AS HUGEINT) - sr2
      |        AS DOUBLE), 6) END AS q_stat
      |FROM cj, ri, kk""".stripMargin

  /** q108_jonckheere: Jonckheere–Terpstra ordered trend of purchase
    * VALUES across the 0-based weekday dose
    * ([[StatTests.jonckheereTerpstra]]) — the value-distribution
    * sibling of q96's proportion trend and the ordered version of
    * q78's KW. Exact 2J over the distinct-value frame, full
    * tie-corrected variance, z round@6, shared-text p. */
  private def jtQ(s: SparkSession, d: String): DataFrame =
    StatTests.jonckheereTerpstra(
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .select((dayofweek(col("ts")) - 1).as("dose"), col("value")),
      "dose", "value", doses = (0 to 6))

  /** JT statistic SQL parameterized on the source CTE chain (must end
    * with a relation `src(g, v)`) — one text for the exact q108 and
    * the binned q108b gates. */
  private def jtSqlFrom(srcCtes: String) = {
    val doses = 0 to 6
    def h(x: String) = s"CAST($x AS HUGEINT)"
    val cs = doses.map(d =>
      s"SUM(CASE WHEN g = $d THEN 1 ELSE 0 END) AS c$d").mkString(",\n    ")
    val cums = doses.map(d =>
      s"COALESCE(SUM(c$d) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED " +
        s"PRECEDING AND 1 PRECEDING), 0) AS cum$d").mkString(",\n    ")
    val pairs = (for {
      (i, ix) <- doses.zipWithIndex; j <- doses.drop(ix + 1)
    } yield s"${h("2")} * ${h(s"cum$i")} * ${h(s"c$j")} + " +
        s"${h(s"c$i")} * ${h(s"c$j")}").mkString(" +\n      ")
    val tc = doses.map(d => s"c$d").mkString(" + ")
    val p = StatTests.pTwoSidedSql("z")
    s"""WITH $srcCtes,
       |vc AS (
       |  SELECT v, $cs
       |  FROM src GROUP BY 1),
       |cums AS (
       |  SELECT *, $cums
       |  FROM vc),
       |ra AS (
       |  SELECT SUM($pairs) AS j2,
       |    SUM(${h(s"($tc) * (($tc) - 1) * (2 * ($tc) + 5)")}) AS st1,
       |    SUM(${h(s"($tc) * (($tc) - 1) * (($tc) - 2)")}) AS st2,
       |    SUM(${h(s"($tc) * (($tc) - 1)")}) AS st3
       |  FROM cums),
       |pd AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
       |    SUM(${h("n")} * ${h("n")}) AS sq,
       |    SUM(${h("n")} * ${h("n - 1")} * ${h("2 * n + 5")}) AS sn1,
       |    SUM(${h("n")} * ${h("n - 1")} * ${h("n - 2")}) AS sn2,
       |    SUM(${h("n")} * ${h("n - 1")}) AS sn3
       |  FROM (SELECT g, COUNT(*) AS n FROM src GROUP BY 1)),
       |zf AS (
       |  SELECT nn, CAST(j2 AS BIGINT) AS j2,
       |    CASE WHEN nn > 2 AND (
       |      CAST(${h("nn")} * (${h("nn")} - 1) * (2 * ${h("nn")} + 5)
       |        - sn1 - st1 AS DOUBLE) / 72.0 +
       |      CAST(sn2 * st2 AS DOUBLE) /
       |        (36.0 * CAST(${h("nn")} * (${h("nn")} - 1) *
       |          (${h("nn")} - 2) AS DOUBLE)) +
       |      CAST(sn3 * st3 AS DOUBLE) /
       |        (8.0 * CAST(${h("nn")} * (${h("nn")} - 1) AS DOUBLE))) > 0.0
       |    THEN round((CAST(j2 AS DOUBLE) -
       |      CAST(${h("nn")} * ${h("nn")} - sq AS DOUBLE) / 2.0) /
       |      (2.0 * sqrt(
       |      CAST(${h("nn")} * (${h("nn")} - 1) * (2 * ${h("nn")} + 5)
       |        - sn1 - st1 AS DOUBLE) / 72.0 +
       |      CAST(sn2 * st2 AS DOUBLE) /
       |        (36.0 * CAST(${h("nn")} * (${h("nn")} - 1) *
       |          (${h("nn")} - 2) AS DOUBLE)) +
       |      CAST(sn3 * st3 AS DOUBLE) /
       |        (8.0 * CAST(${h("nn")} * (${h("nn")} - 1) AS DOUBLE)))), 6)
       |    END AS z
       |  FROM ra, pd)
       |SELECT nn AS n, j2, z, $p AS p
       |FROM zf""".stripMargin
  }

  private val jtSrcExact =
    """src AS (
      |  SELECT dayofweek(ts) AS g, CAST(value AS DOUBLE) AS v
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL)"""
      .stripMargin

  private lazy val jtSql = jtSqlFrom(jtSrcExact)

  /** q108b_jonckheere_binned: [[StatTests.jonckheereTerpstraBinned]] —
    * the JT trend on the 64-bin grid: per-dose sample sizes are
    * binning-invariant, so only the tie structure sees the grid, and
    * the distinct-value frame is capped at 64 rows at any scale. */
  private def jtBinnedQ(s: SparkSession, d: String): DataFrame =
    StatTests.jonckheereTerpstraBinned(
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .select((dayofweek(col("ts")) - 1).as("dose"), col("value")),
      "dose", "value", doses = (0 to 6), nBins = 64)

  private def jtSrcBinned(nBins: Int) =
    s"""src0 AS (
       |  SELECT dayofweek(ts) AS g, CAST(value AS DOUBLE) AS v
       |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
       |bnd AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM src0),
       |src AS (
       |  SELECT g, CASE WHEN hi = lo THEN 0.0 ELSE
       |    CAST(floor(least(${nBins - 1}.0, greatest(0.0,
       |      (v - lo) / ((hi - lo) / ${nBins}.0)))) AS DOUBLE) END AS v
       |  FROM src0, bnd)""".stripMargin

  private lazy val jtBinnedSql = jtSqlFrom(jtSrcBinned(64))

  /** q109_partial_corr: partial correlation of the discounted revenue
    * and the taxed charge CONTROLLING the base price
    * ([[StatTests.partialCorr]]) — the confounder-adjusted
    * association q02b's raw Pearson cannot give, on a triple where
    * the confounding is REAL: both derived amounts share
    * l_extendedprice as a common factor, so their raw r reads ≈ 1
    * while the partial — the base price held fixed — collapses toward
    * the (independent) discount/tax association ≈ 0. The gate shows
    * the estimator doing its one job. Ten exact decimal moments in
    * one exchange, pairwise r round@9 artifacts, partial round@6,
    * normal-approximation p on the t. */
  private def partialCorrQ(s: SparkSession, d: String): DataFrame =
    StatTests.partialCorr(
      Tables.lineitem(s, d).select(
        (col("l_extendedprice").cast("double") *
          (lit(1.0) - col("l_discount").cast("double"))).as("rev"),
        (col("l_extendedprice").cast("double") *
          (lit(1.0) + col("l_tax").cast("double"))).as("charge"),
        col("l_extendedprice").cast("double").as("base")),
      "rev", "charge", "base")

  private lazy val partialCorrSql = {
    def ds(e: String) = graft.Det.sqlSum(e)
    val p = StatTests.pTwoSidedSql("t_stat")
    def vr(ss: String, sv: String) = s"(n * $ss - $sv * $sv)"
    def r(sab: String, sa: String, sb: String, va: String, vb: String) =
      s"""CASE WHEN $va > 0.0 AND $vb > 0.0 THEN
         |      round((n * $sab - $sa * $sb) / sqrt($va * $vb), 9) END"""
        .stripMargin
    s"""WITH src AS (
       |  SELECT
       |    CAST(l_extendedprice AS DOUBLE) *
       |      (1.0 - CAST(l_discount AS DOUBLE)) AS x,
       |    CAST(l_extendedprice AS DOUBLE) *
       |      (1.0 + CAST(l_tax AS DOUBLE)) AS y,
       |    CAST(l_extendedprice AS DOUBLE) AS z
       |  FROM lineitem
       |  WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
       |    AND l_tax IS NOT NULL),
       |m AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${ds("x")} AS sx, ${ds("y")} AS sy, ${ds("z")} AS sz,
       |    ${ds("x * x")} AS sxx, ${ds("y * y")} AS syy,
       |    ${ds("z * z")} AS szz, ${ds("x * y")} AS sxy,
       |    ${ds("x * z")} AS sxz, ${ds("y * z")} AS syz
       |  FROM src),
       |rr AS (
       |  SELECT n,
       |    ${r("sxy", "sx", "sy", vr("sxx", "sx"), vr("syy", "sy"))} AS r_xy,
       |    ${r("sxz", "sx", "sz", vr("sxx", "sx"), vr("szz", "sz"))} AS r_xz,
       |    ${r("syz", "sy", "sz", vr("syy", "sy"), vr("szz", "sz"))} AS r_yz
       |  FROM m),
       |pp AS (
       |  SELECT *, CASE WHEN
       |      (1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz) > 0.0 THEN
       |    round((r_xy - r_xz * r_yz) /
       |      sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)), 6) END
       |    AS partial_r
       |  FROM rr),
       |tt AS (
       |  SELECT *, CASE WHEN n > 3.0
       |      AND 1.0 - partial_r * partial_r > 0.0 THEN
       |    round(partial_r *
       |      sqrt((n - 3.0) / (1.0 - partial_r * partial_r)), 6) END
       |    AS t_stat
       |  FROM pp)
       |SELECT CAST(n AS BIGINT) AS n, r_xy, r_xz, r_yz, partial_r,
       |  t_stat, $p AS p
       |FROM tt""".stripMargin
  }

  /** q57_chisq: chi-squared homogeneity of the (source × md5-token-
    * bucket) contingency table — "do sources share one token
    * distribution", the test-statistic twin of text_drift's JSD. */
  private def chisqQ(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"),
        explode(graft.functions.TextOps.words(col("text"))).as("__w"))
      .select(col("source"), graft.pipeline.Drift.bucketOf(col("__w")).as("b"))
    StatTests.chiSquared(toks, "source", "b")
  }

  private val chisqSql =
    s"""WITH toks AS (
       |  SELECT source AS r,
       |    (('0x' || substring(md5(w), 1, 4))::INT % ${graft.pipeline.Drift.Buckets}) AS c
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)),
       |o AS (SELECT r, c, COUNT(*) AS o FROM toks GROUP BY 1, 2),
       |rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS rtot FROM o GROUP BY 1),
       |ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS ctot FROM o GROUP BY 1),
       |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS ntot FROM o),
       |grid AS (
       |  SELECT rt.r, ct.c, rt.rtot, ct.ctot, coalesce(o.o, 0) AS o
       |  FROM rt CROSS JOIN ct LEFT JOIN o USING (r, c)),
       |cell AS (
       |  SELECT g.r, g.c,
       |    CAST(round((CAST(g.o AS DOUBLE) -
       |        CAST(g.rtot AS DOUBLE) * CAST(g.ctot AS DOUBLE) / CAST(nn.ntot AS DOUBLE)) *
       |      (CAST(g.o AS DOUBLE) -
       |        CAST(g.rtot AS DOUBLE) * CAST(g.ctot AS DOUBLE) / CAST(nn.ntot AS DOUBLE)) /
       |      (CAST(g.rtot AS DOUBLE) * CAST(g.ctot AS DOUBLE) / CAST(nn.ntot AS DOUBLE))
       |      * 1e9, 0) AS BIGINT) AS c9,
       |    nn.ntot
       |  FROM grid g, nn)
       |SELECT CAST(SUM(c9) AS BIGINT) AS x2_9,
       |  CAST((COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT c) - 1) AS BIGINT) AS dof,
       |  CAST(MAX(ntot) AS BIGINT) AS n
       |FROM cell""".stripMargin

  /** q73_cramers_v: effect size over the q57 contingency table
    * ([[StatTests.cramersV]]) — X² scales with n, so at corpus scale
    * everything is "significant"; V ∈ [0,1] says whether the
    * source↔token-bucket association is actually BIG. Same exact-long
    * cell sum; V and the contingency coefficient are one rounded IEEE
    * expression each. */
  private def cramersQ(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"),
        explode(graft.functions.TextOps.words(col("text"))).as("__w"))
      .select(col("source"), graft.pipeline.Drift.bucketOf(col("__w")).as("b"))
    StatTests.cramersV(toks, "source", "b")
  }

  private val cramersSql =
    s"""WITH toks AS (
       |  SELECT source AS r,
       |    (('0x' || substring(md5(w), 1, 4))::INT % ${graft.pipeline.Drift.Buckets}) AS c
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)),
       |o AS (SELECT r, c, COUNT(*) AS o FROM toks GROUP BY 1, 2),
       |rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS rtot FROM o GROUP BY 1),
       |ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS ctot FROM o GROUP BY 1),
       |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS ntot FROM o),
       |grid AS (
       |  SELECT rt.r, ct.c, rt.rtot, ct.ctot, coalesce(o.o, 0) AS o
       |  FROM rt CROSS JOIN ct LEFT JOIN o USING (r, c)),
       |cell AS (
       |  SELECT g.r, g.c,
       |    CAST(round((CAST(g.o AS DOUBLE) -
       |        CAST(g.rtot AS DOUBLE) * CAST(g.ctot AS DOUBLE) / CAST(nn.ntot AS DOUBLE)) *
       |      (CAST(g.o AS DOUBLE) -
       |        CAST(g.rtot AS DOUBLE) * CAST(g.ctot AS DOUBLE) / CAST(nn.ntot AS DOUBLE)) /
       |      (CAST(g.rtot AS DOUBLE) * CAST(g.ctot AS DOUBLE) / CAST(nn.ntot AS DOUBLE))
       |      * 1e9, 0) AS BIGINT) AS c9,
       |    nn.ntot
       |  FROM grid g, nn),
       |agg AS (
       |  SELECT CAST(SUM(c9) AS BIGINT) AS x2_9,
       |    CAST(COUNT(DISTINCT r) AS BIGINT) AS r_cats,
       |    CAST(COUNT(DISTINCT c) AS BIGINT) AS c_cats,
       |    CAST(MAX(ntot) AS BIGINT) AS n
       |  FROM cell)
       |SELECT x2_9, n, r_cats, c_cats,
       |  round(sqrt(CAST(x2_9 AS DOUBLE) / 1e9 /
       |    (CAST(n AS DOUBLE) *
       |     CAST(least(r_cats - 1, c_cats - 1) AS DOUBLE))), 6) AS v,
       |  round(sqrt(CAST(x2_9 AS DOUBLE) / 1e9 /
       |    (CAST(x2_9 AS DOUBLE) / 1e9 + CAST(n AS DOUBLE))), 6) AS cc
       |FROM agg""".stripMargin

  /** q59_ols_multi: MULTIVARIATE least squares — price on (1, quantity,
    * discount) — solved in closed form from exact decimal moments via
    * Cramer's rule on the 3×3 normal equations (the builtin regr_*
    * family is single-feature only; q02g). Every moment is an exact
    * decimal sum, the determinants and R² are ONE fixed-order IEEE
    * expression tree each, mirrored verbatim in the oracle — no
    * iterative solver, no per-row residual pass. One scalar-aggregate
    * exchange; the model is 1 row no matter the table size. */
  private def olsQ(s: SparkSession, d: String): DataFrame =
    StatTests.ols2(Tables.lineitem(s, d),
      "l_quantity", "l_discount", "l_extendedprice")

  /** The OLS moment/solve CTE chain (src → m → b) over lineitem rows
    * matching `where` — shared by the q59 gate and the conformal gate. */
  private def olsCtes(where: String): String = {
    val det =
      """(n * (s22 * s33 - s23 * s23) - s2 * (s2 * s33 - s23 * s3)
        | + s3 * (s2 * s23 - s22 * s3))""".stripMargin.replace("\n", "")
    val det1 =
      """(sy * (s22 * s33 - s23 * s23) - s2 * (s2y * s33 - s23 * s3y)
        | + s3 * (s2y * s23 - s22 * s3y))""".stripMargin.replace("\n", "")
    val det2 =
      """(n * (s2y * s33 - s23 * s3y) - sy * (s2 * s33 - s23 * s3)
        | + s3 * (s2 * s3y - s2y * s3))""".stripMargin.replace("\n", "")
    val det3 =
      """(n * (s22 * s3y - s2y * s23) - s2 * (s2 * s3y - s2y * s3)
        | + sy * (s2 * s23 - s22 * s3))""".stripMargin.replace("\n", "")
    s"""WITH src AS (
       |  SELECT CAST(l_quantity AS DOUBLE) AS x2,
       |    CAST(l_discount AS DOUBLE) AS x3,
       |    CAST(l_extendedprice AS DOUBLE) AS y
       |  FROM lineitem$where),
       |m AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${Det.sqlSum("x2")} AS s2, ${Det.sqlSum("x3")} AS s3,
       |    ${Det.sqlSum("x2 * x2")} AS s22, ${Det.sqlSum("x2 * x3")} AS s23,
       |    ${Det.sqlSum("x3 * x3")} AS s33, ${Det.sqlSum("y")} AS sy,
       |    ${Det.sqlSum("x2 * y")} AS s2y, ${Det.sqlSum("x3 * y")} AS s3y,
       |    ${Det.sqlSum("y * y")} AS syy
       |  FROM src),
       |b AS (
       |  SELECT n, sy, s2y, s3y, syy, s2, s3, s22, s23, s33,
       |    $det1 / $det AS b0, $det2 / $det AS b1, $det3 / $det AS b2
       |  FROM m)""".stripMargin
  }

  private lazy val olsSql =
    s"""${olsCtes("")}
       |SELECT CAST(n AS BIGINT) AS n,
       |  round(b0, 9) AS b0, round(b1, 9) AS b1, round(b2, 9) AS b2,
       |  round(1.0 - (syy - 2.0 * (b0 * sy + b1 * s2y + b2 * s3y) +
       |    (b0 * b0 * n + b1 * b1 * s22 + b2 * b2 * s33 +
       |     2.0 * b0 * b1 * s2 + 2.0 * b0 * b2 * s3 + 2.0 * b1 * b2 * s23)) /
       |    (syy - sy * sy / n), 9) AS r2
       |FROM b""".stripMargin

  /** q68_ridge: Tikhonov-regularized least squares on the SAME
    * exact-moment normal equations as q59 — λ on the slope diagonal
    * only (intercept unpenalized), Cramer closed form, one
    * scalar-aggregate exchange. λ = 1e6 sits at the s22-moment scale at
    * the gate tier so the shrinkage is visible in the gated
    * coefficients (b1/b2 pulled toward 0, R² strictly below q59's);
    * λ = 0 reproduces q59 bit-for-bit (StatsSpec pins both ends). The
    * scale story is the operator's point: regularization costs ZERO
    * extra passes — the penalty lands in the driver-side solve over
    * moments the OLS already aggregates. */
  private def ridgeQ(s: SparkSession, d: String): DataFrame =
    StatTests.ridge2(Tables.lineitem(s, d),
      "l_quantity", "l_discount", "l_extendedprice", RidgeLambda)

  private val RidgeLambda = 1e6

  private lazy val ridgeSql = {
    val lam = "1000000.0"
    val det =
      s"""(n * ((s22 + $lam) * (s33 + $lam) - s23 * s23)
         | - s2 * (s2 * (s33 + $lam) - s23 * s3)
         | + s3 * (s2 * s23 - (s22 + $lam) * s3))""".stripMargin
        .replace("\n", "")
    val det1 =
      s"""(sy * ((s22 + $lam) * (s33 + $lam) - s23 * s23)
         | - s2 * (s2y * (s33 + $lam) - s23 * s3y)
         | + s3 * (s2y * s23 - (s22 + $lam) * s3y))""".stripMargin
        .replace("\n", "")
    val det2 =
      s"""(n * (s2y * (s33 + $lam) - s23 * s3y)
         | - sy * (s2 * (s33 + $lam) - s23 * s3)
         | + s3 * (s2 * s3y - s2y * s3))""".stripMargin.replace("\n", "")
    val det3 =
      s"""(n * ((s22 + $lam) * s3y - s2y * s23)
         | - s2 * (s2 * s3y - s2y * s3)
         | + sy * (s2 * s23 - (s22 + $lam) * s3))""".stripMargin
        .replace("\n", "")
    s"""WITH src AS (
       |  SELECT CAST(l_quantity AS DOUBLE) AS x2,
       |    CAST(l_discount AS DOUBLE) AS x3,
       |    CAST(l_extendedprice AS DOUBLE) AS y
       |  FROM lineitem),
       |m AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${Det.sqlSum("x2")} AS s2, ${Det.sqlSum("x3")} AS s3,
       |    ${Det.sqlSum("x2 * x2")} AS s22, ${Det.sqlSum("x2 * x3")} AS s23,
       |    ${Det.sqlSum("x3 * x3")} AS s33, ${Det.sqlSum("y")} AS sy,
       |    ${Det.sqlSum("x2 * y")} AS s2y, ${Det.sqlSum("x3 * y")} AS s3y,
       |    ${Det.sqlSum("y * y")} AS syy
       |  FROM src),
       |b AS (
       |  SELECT n, sy, s2y, s3y, syy, s2, s3, s22, s23, s33,
       |    $det1 / $det AS b0, $det2 / $det AS b1, $det3 / $det AS b2
       |  FROM m)
       |SELECT CAST(n AS BIGINT) AS n,
       |  round(b0, 9) AS b0, round(b1, 9) AS b1, round(b2, 9) AS b2,
       |  round(1.0 - (syy - 2.0 * (b0 * sy + b1 * s2y + b2 * s3y) +
       |    (b0 * b0 * n + b1 * b1 * s22 + b2 * b2 * s33 +
       |     2.0 * b0 * b1 * s2 + 2.0 * b0 * b2 * s3 + 2.0 * b1 * b2 * s23)) /
       |    (syy - sy * sy / n), 9) AS r2
       |FROM b""".stripMargin
  }

  /** q70_isotonic: PAVA-fitted monotone calibration of the per-type
    * daily mean value ([[StatTests.isotonic]] — minimax closed form,
    * provably the PAVA output). Day buckets keep the per-key pair
    * frame B²-bounded (~30 buckets at the gate tier); interval means
    * are exact-decimal differences over integer counts, so the min/max
    * lattice resolves identically in both engines and only the output
    * rounds (round@9). */
  private def isotonicQ(s: SparkSession, d: String): DataFrame =
    StatTests.isotonic(
        Tables.events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"), col("value")),
        "event_type", "day", "value")
      .orderBy(col("event_type"), col("x"))

  private val isotonicSql =
    """WITH b AS (
      |  SELECT event_type AS k, epoch_us(ts) // 86400000000 AS x,
      |    SUM(CAST(value AS DECIMAL(25,6))) AS s, COUNT(*) AS c
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |pre AS (
      |  SELECT k, x, s, c, SUM(s) OVER w AS rs, SUM(c) OVER w AS rc
      |  FROM b WINDOW w AS (PARTITION BY k ORDER BY x
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |pairs AS (
      |  SELECT a.k, a.x AS xj, p.x AS xk,
      |    CAST(p.rs - (a.rs - a.s) AS DOUBLE) /
      |      CAST(p.rc - (a.rc - a.c) AS DOUBLE) AS mean
      |  FROM pre a JOIN pre p ON a.k = p.k AND a.x <= p.x),
      |sm AS (
      |  SELECT k, xj, xk, MIN(mean) OVER (PARTITION BY k, xj ORDER BY xk DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      |  FROM pairs),
      |fit AS (SELECT k, xk, MAX(m) AS fitraw FROM sm GROUP BY k, xk)
      |SELECT f.k AS event_type, f.xk AS x, b.c AS n,
      |  round(CAST(b.s AS DOUBLE) / CAST(b.c AS DOUBLE), 9) AS y_mean,
      |  round(f.fitraw, 9) AS y_fit
      |FROM fit f JOIN b ON f.k = b.k AND f.xk = b.x
      |ORDER BY event_type, x""".stripMargin

  /** q63_conformal: split-conformal prediction interval for the q59 OLS
    * model — train on even order keys, calibrate on odd: q̂ is the
    * ⌈0.9·(m+1)⌉-th smallest |residual| (the distribution-free 90 %
    * coverage guarantee). Residuals rank as 1e-9-scaled longs and the
    * rank index k = (9(m+1)+9) DIV 10 is pure integer arithmetic (a
    * float 0.9·(m+1) differs between engines exactly when the true
    * value is an integer); the trained coefficients ride in as the SAME
    * round@9 artifact q59 emits. Output: (m, k, qhat, coverage). */
  private def conformalQ(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, d)
    val beta = StatTests.ols2(li.filter(col("l_orderkey") % 2 === 0),
        "l_quantity", "l_discount", "l_extendedprice")
      .select(col("b0"), col("b1"), col("b2"))
    val resid = li.filter(col("l_orderkey") % 2 === 1)
      .select(col("l_quantity").cast("double").as("x2"),
        col("l_discount").cast("double").as("x3"),
        col("l_extendedprice").cast("double").as("y"))
      .crossJoin(broadcast(beta))
      .select(round(abs(col("y") -
        (col("b0") + col("b1") * col("x2") + col("b2") * col("x3"))) * 1e9, 0)
        .cast("long").as("r9"))
    val vc = resid.groupBy(col("r9")).agg(count(lit(1)).as("c"))
    val tot = vc.agg(sum(col("c")).as("m"))
    val w = Window.orderBy(col("r9"))
      .rowsBetween(Window.unboundedPreceding, 0)
    vc.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("k", expr("(9 * (m + 1) + 9) DIV 10"))
      .filter(col("cum") >= col("k"))
      .groupBy(col("m"), col("k"))
      .agg(min(struct(col("r9").as("r"), col("cum").as("cv"))).as("b"))
      .select(col("m"), col("k"),
        round(col("b.r").cast("double") / 1e9, 9).as("qhat"),
        round(col("b.cv").cast("double") / col("m").cast("double"), 9)
          .as("coverage"))
  }

  private lazy val conformalSql =
    s"""${olsCtes(" WHERE l_orderkey % 2 = 0")},
       |calib AS (
       |  SELECT CAST(l_quantity AS DOUBLE) AS x2,
       |    CAST(l_discount AS DOUBLE) AS x3,
       |    CAST(l_extendedprice AS DOUBLE) AS y
       |  FROM lineitem WHERE l_orderkey % 2 = 1),
       |res AS (
       |  SELECT CAST(round(abs(y - (round(b.b0, 9) +
       |    round(b.b1, 9) * x2 + round(b.b2, 9) * x3)) * 1e9, 0) AS BIGINT) AS r9
       |  FROM calib, b),
       |vc AS (SELECT r9, COUNT(*) AS c FROM res GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS m FROM vc),
       |cum AS (
       |  SELECT r9, SUM(c) OVER (ORDER BY r9
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM vc),
       |sel AS (
       |  SELECT t.m, (9 * (t.m + 1) + 9) // 10 AS k, c.r9, c.cum,
       |    row_number() OVER (ORDER BY c.r9) AS rn
       |  FROM cum c, tot t
       |  WHERE c.cum >= (9 * (t.m + 1) + 9) // 10)
       |SELECT CAST(m AS BIGINT) AS m, CAST(k AS BIGINT) AS k,
       |  round(CAST(r9 AS DOUBLE) / 1e9, 9) AS qhat,
       |  round(CAST(cum AS DOUBLE) / CAST(m AS DOUBLE), 9) AS coverage
       |FROM sel WHERE rn = 1""".stripMargin

  private val BootstrapR = 32

  /** q61_bootstrap: Poisson-bootstrap uncertainty for the mean event
    * value — $BootstrapR deterministic replicates whose spread IS the
    * sampling distribution of the mean. Weight assignment is exact
    * integer threshold comparison on md5 uniforms; one replicate-keyed
    * aggregate, no per-replicate pass. */
  private def bootstrapQ(s: SparkSession, d: String): DataFrame =
    graft.operators.Bootstrap.meansCI(
        Tables.events(s, d), "event_id", "value", BootstrapR)
      .orderBy(col("r"))

  private val bootstrapSql = {
    val ts = graft.operators.Bootstrap.Thresholds
    val wCase = ts.zipWithIndex.reverse.foldLeft(s"${ts.length}") {
      case (acc, (t, k)) => s"CASE WHEN u < $t THEN $k ELSE $acc END"
    }
    s"""WITH fan AS (
       |  SELECT r.range AS r, CAST(value AS DOUBLE) AS x,
       |    ('0x' || substring(md5(event_id || '_' || r.range), 1, 12))::BIGINT AS u
       |  FROM events, range($BootstrapR) r
       |  WHERE value IS NOT NULL),
       |w AS (SELECT r, x, CAST($wCase AS BIGINT) AS w FROM fan)
       |SELECT r, CAST(SUM(w) AS BIGINT) AS n_eff,
       |  round(${Det.sqlSum("CAST(w AS DOUBLE) * x")} /
       |    CAST(SUM(w) AS DOUBLE), 9) AS mean
       |FROM w GROUP BY r ORDER BY r""".stripMargin
  }

  /** Session gap threshold for the KM subjects: 12 h splits the
    * synthetic per-user event streams into a real mix of singleton and
    * multi-event sessions. */
  private val KmIvUs = 12L * 3600L * 1000000L

  /** q65_kaplan_meier: KM survival of SESSION durations — subjects are
    * the gaps-and-islands sessions (q51's operator, 12 h gap), duration
    * = the exact µs event span of the session, right-censored when the
    * session's last event is within one gap of the global end (the
    * session is plausibly still open). Composes interval merging into
    * survival analysis; every duration is an exact integer. */
  private def kmQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      expr("unix_micros(ts)").as("us"),
      (expr("unix_micros(ts)") + lit(KmIvUs)).as("e"))
    val gmax = ev.agg(max(col("us")).as("tmax"))
    val subjects = graft.operators.TimeSeries
      .mergeIntervals(ev, "user_id", "event_id", "us", "e")
      .crossJoin(broadcast(gmax))
      .select(
        (col("island_end") - col("island_start") - lit(KmIvUs)).as("dur"),
        (col("island_end") >= col("tmax")).as("cens"))
    graft.operators.Survival.kaplanMeier(subjects, "dur", "cens")
      .orderBy(col("t"))
  }

  private val kmSql =
    s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |gmax AS (SELECT MAX(us) AS tmax FROM ev),
      |f AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN MAX(us + $KmIvUs) OVER wp IS NULL
      |           OR us > MAX(us + $KmIvUs) OVER wp
      |         THEN 1 ELSE 0 END AS brk
      |  FROM ev WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |isl AS (
      |  SELECT user_id, us,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM f),
      |subj AS (
      |  SELECT MAX(i.us) - MIN(i.us) AS dur,
      |    MAX(i.us) + $KmIvUs >= g.tmax AS cens
      |  FROM isl i CROSS JOIN gmax g
      |  GROUP BY i.user_id, i.island, g.tmax),
      |vc AS (
      |  SELECT dur AS t,
      |    COUNT(*) FILTER (NOT cens) AS d, COUNT(*) FILTER (cens) AS cens
      |  FROM subj GROUP BY 1),
      |tot AS (SELECT CAST(SUM(d + cens) AS BIGINT) AS n_all FROM vc),
      |st AS (
      |  SELECT t, d, cens,
      |    n_all - coalesce(SUM(d + cens) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      |  FROM vc CROSS JOIN tot),
      |lg AS (
      |  SELECT t, d, n_risk,
      |    CASE WHEN d > 0 AND d < n_risk
      |         THEN CAST(round(ln(CAST(n_risk - d AS DOUBLE) /
      |           CAST(n_risk AS DOUBLE)) * 1e9, 0) AS BIGINT)
      |         WHEN d = 0 THEN 0 END AS l9,
      |    MAX(CASE WHEN d >= n_risk AND d > 0 THEN 1 ELSE 0 END) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wiped
      |  FROM st),
      |acc AS (
      |  SELECT t, d, n_risk, wiped,
      |    CASE WHEN wiped = 0 THEN CAST(SUM(l9) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    END AS log_surv_9
      |  FROM lg)
      |SELECT t, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
      |  log_surv_9,
      |  CASE WHEN wiped = 1 THEN 0.0
      |       ELSE round(exp(CAST(log_surv_9 AS DOUBLE) / 1e9), 6) END AS survival
      |FROM acc WHERE d > 0 ORDER BY t""".stripMargin

  /** q71_anderson: Anderson–Darling normality per event type
    * ([[StatTests.andersonDarling]]) — the tail-sensitive
    * distribution-shape member of the battery (KS is middle-sensitive
    * by construction). Shared-text Φ polynomial, round@6 long terms,
    * exact cross-row sum; two exchanges. */
  private def andersonQ(s: SparkSession, d: String): DataFrame =
    StatTests.andersonDarling(Tables.events(s, d), "event_type", "value")
      .orderBy(col("g"))
      .withColumnRenamed("g", "event_type")

  private lazy val andersonSql = {
    val term = StatTests.adTermSql("zz", "i", "n")
    s"""WITH src AS (
       |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
       |  FROM events WHERE value IS NOT NULL),
       |m AS (
       |  SELECT g, COUNT(*) AS n, ${Det.sqlSum("v")} AS sx,
       |    ${Det.sqlSum("v * v")} AS sxx
       |  FROM src GROUP BY g),
       |r AS (
       |  SELECT s.g, s.v, m.n, m.sx, m.sxx,
       |    CAST(row_number() OVER (PARTITION BY s.g ORDER BY s.v)
       |      AS BIGINT) AS i
       |  FROM src s JOIN m USING (g)
       |  WHERE m.n >= 8 AND (m.sxx - m.sx * m.sx / CAST(m.n AS DOUBLE)) > 0.0),
       |z AS (
       |  SELECT g, n, i,
       |    (v - sx / CAST(n AS DOUBLE)) /
       |      sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) /
       |        (CAST(n AS DOUBLE) - 1.0)) AS zz
       |  FROM r),
       |t AS (SELECT g, n, $term AS t6 FROM z)
       |SELECT g AS event_type, n,
       |  round(-1.0 * CAST(n AS DOUBLE) -
       |    (CAST(SUM(t6) AS DOUBLE) / 1e6) / CAST(n AS DOUBLE), 6) AS a2
       |FROM t GROUP BY g, n ORDER BY event_type""".stripMargin
  }

  /** q72_mann_kendall: monotone-trend significance per event type
    * ([[StatTests.mannKendallBudget]]) — the classical companion to
    * q67's Theil–Sen slope, on the SAME budget-lottery points
    * ([[budgetPtsSql]]) so the two operators describe one
    * estimator/test pair at every scale factor (the sf1 rehearsal
    * measured the '08' hand constant at 4× — inside the envelope, but
    * the pairing with q67's adaptive lottery is the contract worth
    * keeping). Integer-exact S and tie-corrected variance; z round@6;
    * shared-text p. */
  private def mkQ(s: SparkSession, d: String): DataFrame =
    StatTests.mannKendallBudget(Tables.events(s, d),
        "event_type", "ts", "event_id", "value",
        targetPoints = TheilSenBudgetPts)
      .orderBy(col("g"))
      .withColumnRenamed("g", "event_type")

  /** q72b_seasonal_mk: Hirsch–Slack seasonal Mann–Kendall per event
    * type ([[StatTests.seasonalMannKendallBudget]]) — the trend test
    * that survives weekly seasonality: S and the tie-corrected
    * variance compute within each day-of-week season (Monday compares
    * to Monday) and sum across seasons, so a weekly cycle can neither
    * read as trend nor drown one. Same budget-lottery points as
    * q67/q72 (one replay contract); integer-exact sums; z round@6;
    * shared-text p. */
  private def seasonalMkQ(s: SparkSession, d: String): DataFrame =
    StatTests.seasonalMannKendallBudget(Tables.events(s, d),
        "event_type", "ts", "event_id", "value",
        targetPoints = TheilSenBudgetPts)
      .orderBy(col("g"))
      .withColumnRenamed("g", "event_type")

  private lazy val seasonalMkSql = {
    val p = StatTests.pTwoSidedSql("z")
    s"""WITH $budgetPtsSql,
       |ps AS (
       |  SELECT g, t, i, v, dayofweek(make_timestamp(t)) AS season
       |  FROM pts),
       |sp AS (
       |  SELECT a.g, a.season, CAST(SUM(CASE WHEN b.v > a.v THEN 1
       |    WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
       |  FROM ps a JOIN ps b
       |    ON b.g = a.g AND b.season = a.season AND a.t < b.t
       |  GROUP BY 1, 2),
       |np AS (SELECT g, season, COUNT(*) AS n FROM ps GROUP BY 1, 2),
       |tp AS (
       |  SELECT g, season,
       |    CAST(SUM(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tcorr
       |  FROM (SELECT g, season, v, COUNT(*) AS tc
       |        FROM ps GROUP BY 1, 2, 3)
       |  GROUP BY 1, 2),
       |per AS (
       |  SELECT sp.g, sp.season, np.n, sp.s,
       |    np.n * (np.n - 1) * (2 * np.n + 5) - tp.tcorr AS varnum
       |  FROM sp JOIN np USING (g, season) JOIN tp USING (g, season)),
       |roll AS (
       |  SELECT g, CAST(SUM(n) AS BIGINT) AS n, COUNT(*) AS n_seasons,
       |    CAST(SUM(s) AS BIGINT) AS s,
       |    CAST(SUM(varnum) AS BIGINT) AS varnum
       |  FROM per GROUP BY 1),
       |zf AS (
       |  SELECT g, n, n_seasons, s,
       |    round(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) /
       |        sqrt(CAST(varnum AS DOUBLE) / 18.0)
       |      WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) /
       |        sqrt(CAST(varnum AS DOUBLE) / 18.0)
       |      ELSE 0.0 END, 6) AS z
       |  FROM roll)
       |SELECT g AS event_type, n, n_seasons, s, z, $p AS p
       |FROM zf ORDER BY event_type""".stripMargin
  }

  private lazy val mkSql = {
    val p = StatTests.pTwoSidedSql("z")
    s"""WITH $budgetPtsSql,
       |sp AS (
       |  SELECT a.g, CAST(SUM(CASE WHEN b.v > a.v THEN 1
       |    WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
       |  FROM pts a JOIN pts b ON b.g = a.g AND a.t < b.t
       |  GROUP BY a.g),
       |np AS (SELECT g, COUNT(*) AS n FROM pts GROUP BY g),
       |tp AS (
       |  SELECT g, CAST(SUM(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tcorr
       |  FROM (SELECT g, v, COUNT(*) AS tc FROM pts GROUP BY g, v)
       |  GROUP BY g),
       |zf AS (
       |  SELECT sp.g, np.n, sp.s,
       |    round(CASE WHEN sp.s > 0 THEN (CAST(sp.s AS DOUBLE) - 1.0) /
       |        sqrt(CAST(np.n * (np.n - 1) * (2 * np.n + 5) - tp.tcorr
       |          AS DOUBLE) / 18.0)
       |      WHEN sp.s < 0 THEN (CAST(sp.s AS DOUBLE) + 1.0) /
       |        sqrt(CAST(np.n * (np.n - 1) * (2 * np.n + 5) - tp.tcorr
       |          AS DOUBLE) / 18.0)
       |      ELSE 0.0 END, 6) AS z
       |  FROM sp JOIN np USING (g) JOIN tp USING (g))
       |SELECT g AS event_type, n, s, z, $p AS p
       |FROM zf ORDER BY event_type""".stripMargin
  }

  /** q76_two_proportion: A/B conversion test ([[StatTests
    * .twoProportion]]) — users split by id parity, success = a
    * power-user purchase pattern (≥ 12 purchase events; the ≥ 1 bar
    * saturates at 100% in this corpus, which would make the test
    * degenerate by construction). Exact counts; pooled-SE z +
    * shared-text p + unpooled Wald CI. */
  private def twoPropQ(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("pc"))
      .select((col("user_id") % 2).as("variant"),
        when(col("pc") >= 12, 1L).otherwise(0L).as("converted"))
    StatTests.twoProportion(users, "variant", "converted")
  }

  private lazy val twoPropSql = {
    val pa = "(CAST(a.k AS DOUBLE) / CAST(a.n AS DOUBLE))"
    val pb = "(CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE))"
    val pp = "(CAST(a.k + b.k AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))"
    val seU = s"sqrt($pa * (1.0 - $pa) / CAST(a.n AS DOUBLE) + " +
      s"$pb * (1.0 - $pb) / CAST(b.n AS DOUBLE))"
    val p = StatTests.pTwoSidedSql("z")
    s"""WITH u AS (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pc
       |  FROM events GROUP BY 1),
       |m AS (
       |  SELECT user_id % 2 AS v, COUNT(*) AS n,
       |    CAST(SUM(CASE WHEN pc >= 12 THEN 1 ELSE 0 END) AS BIGINT) AS k
       |  FROM u GROUP BY 1),
       |pair AS (
       |  SELECT a.v AS v_a, b.v AS v_b, a.n AS n_a, a.k AS k_a,
       |    b.n AS n_b, b.k AS k_b,
       |    $pa AS pa, $pb AS pb, $pp AS pp,
       |    sqrt($pp * (1.0 - $pp) *
       |      (1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE))) AS sep,
       |    $seU AS seu
       |  FROM m a JOIN m b ON a.v < b.v),
       |gz AS (
       |  SELECT v_a, v_b, n_a, k_a, n_b, k_b,
       |    round(pa, 6) AS p_a, round(pb, 6) AS p_b,
       |    CASE WHEN n_a > 0 AND n_b > 0 AND pp > 0.0 AND pp < 1.0
       |      THEN round((pa - pb) / sep, 6) END AS z,
       |    CASE WHEN n_a > 0 AND n_b > 0 AND pp > 0.0 AND pp < 1.0
       |      THEN round((pa - pb) - 1.959963985 * seu, 6) END AS ci_lo,
       |    CASE WHEN n_a > 0 AND n_b > 0 AND pp > 0.0 AND pp < 1.0
       |      THEN round((pa - pb) + 1.959963985 * seu, 6) END AS ci_hi
       |  FROM pair)
       |SELECT v_a, v_b, n_a, k_a, n_b, k_b, p_a, p_b, z, ci_lo, ci_hi,
       |  $p AS p_value
       |FROM gz""".stripMargin
  }

  /** q77_cohens_d: effect sizes over the q55 Welch pairs
    * ([[StatTests.cohensD]]) — t grows with √n, so significance says
    * nothing about SIZE at corpus scale; d (pooled-SD standardized
    * difference) and the bias-corrected Hedges' g are the readouts a
    * dashboard should alert on. Same exact-moment frame as q55. */
  private def cohensQ(s: SparkSession, d: String): DataFrame =
    StatTests.cohensD(Tables.events(s, d), "event_type", "value")
      .orderBy(col("g_a"), col("g_b"))

  // The pair CTE carries mean-difference / pooled-variance / correction
  // as columns so the degenerate guard (either side n <= 1, or pooled
  // variance 0 — the Spark-side `ok` in StatTests.cohensD) can gate the
  // readouts as CASE WHEN, mirroring the welchPairs convention: a
  // degenerate pair is NULL in BOTH engines, never NaN-vs-NULL.
  private val cohensSql =
    s"""WITH m AS (
       |  SELECT event_type AS g, COUNT(*) AS n,
       |    ${Det.sqlSum("CAST(value AS DOUBLE)")} AS sx,
       |    ${Det.sqlSum("CAST(value AS DOUBLE) * CAST(value AS DOUBLE)")} AS sxx
       |  FROM events WHERE value IS NOT NULL GROUP BY 1),
       |pair AS (
       |  SELECT a.g AS g_a, b.g AS g_b, a.n AS n_a, b.n AS n_b,
       |    a.sx / CAST(a.n AS DOUBLE) - b.sx / CAST(b.n AS DOUBLE) AS md,
       |    ((a.sxx - a.sx * a.sx / CAST(a.n AS DOUBLE)) +
       |      (b.sxx - b.sx * b.sx / CAST(b.n AS DOUBLE))) /
       |      (CAST(a.n AS DOUBLE) + CAST(b.n AS DOUBLE) - 2.0) AS pooled,
       |    1.0 - 3.0 / (4.0 * (CAST(a.n AS DOUBLE) + CAST(b.n AS DOUBLE))
       |      - 9.0) AS corr
       |  FROM m a JOIN m b ON a.g < b.g)
       |SELECT g_a, g_b, n_a, n_b,
       |  CASE WHEN n_a > 1 AND n_b > 1 AND pooled > 0.0
       |    THEN round(md / sqrt(pooled), 6) END AS cohens_d,
       |  CASE WHEN n_a > 1 AND n_b > 1 AND pooled > 0.0
       |    THEN round(md / sqrt(pooled) * corr, 6) END AS hedges_g
       |FROM pair ORDER BY g_a, g_b""".stripMargin

  /** q78_kruskal_wallis: the k-group rank ANOVA ([[StatTests
    * .kruskalWallis]]) across ALL event-type value distributions — the
    * omnibus question q56/q66 answer pairwise ("is ANY group shifted?"
    * before "which pairs?"). Midranks stay ×2-scaled exact longs over
    * the distinct-value frame (2-decimal measure ⇒ bounded at any
    * corpus size); per-group H terms round to 1e6-scaled decimal(38,0)
    * and sum exactly; the tie correction divides once. */
  private def kwQ(s: SparkSession, d: String): DataFrame =
    StatTests.kruskalWallis(Tables.events(s, d), "event_type", "value")
      .orderBy(col("g"))
      .withColumnRenamed("g", "event_type")

  private lazy val kwSql = {
    val rbar = "CAST(r2sum AS DOUBLE) / (CAST(n_g AS DOUBLE) * 2.0)"
    val dev = s"($rbar - (CAST(n_tot AS DOUBLE) + 1.0) / 2.0)"
    val h = "12.0 / (CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) + 1.0))" +
      " * (s6 / 1e6)"
    val corr = "(1.0 - CAST(tsum AS DOUBLE) / (CAST(n_tot AS DOUBLE) * " +
      "CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE) - CAST(n_tot AS DOUBLE)))"
    s"""WITH gv AS (
       |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v, COUNT(*) AS c
       |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
       |vt AS (SELECT v, CAST(SUM(c) AS BIGINT) AS ct FROM gv GROUP BY v),
       |rk AS (
       |  SELECT v, 2 * coalesce(SUM(ct) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + ct + 1
       |    AS r2
       |  FROM vt),
       |gr AS (
       |  SELECT gv.g, CAST(SUM(gv.c * rk.r2) AS BIGINT) AS r2sum,
       |    CAST(SUM(gv.c) AS BIGINT) AS n_g
       |  FROM gv JOIN rk ON gv.v = rk.v GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot, COUNT(*) AS k
       |  FROM gr),
       |tie AS (SELECT CAST(SUM(CAST(ct AS HUGEINT) * ct * ct - ct)
       |  AS HUGEINT) AS tsum FROM vt),
       |term AS (
       |  SELECT CAST(round(CAST(n_g AS DOUBLE) * $dev * $dev * 1e6, 0)
       |    AS HUGEINT) AS t6
       |  FROM gr, tot),
       |s AS (SELECT CAST(SUM(t6) AS DOUBLE) AS s6 FROM term)
       |SELECT g AS event_type, n_g, r2sum,
       |  round($rbar, 9) AS mean_rank,
       |  round($h, 6) AS h,
       |  CASE WHEN tsum < CAST(n_tot AS HUGEINT) * n_tot * n_tot - n_tot
       |    THEN round($h / $corr, 6) END AS h_corr
       |FROM gr, tot, s, tie ORDER BY event_type""".stripMargin
  }

  /** q79_brown_forsythe: equality-of-VARIANCES test ([[StatTests
    * .brownForsythe]]) across the event-type value distributions —
    * Levene with median centering, the check Welch/ANOVA readouts
    * lean on ("is the spread itself drifting?"). Group medians ride
    * the q27g-proven exact rank-selection path; z-moments are exact
    * decimals; per-group F terms round to 1e6-scaled decimal(38,0)
    * and sum exactly. */
  private def bfQ(s: SparkSession, d: String): DataFrame =
    StatTests.brownForsythe(Tables.events(s, d), "event_type", "value")
      .orderBy(col("g"))
      .withColumnRenamed("g", "event_type")

  private lazy val bfSql = {
    val zbarG = "CAST(szd AS DOUBLE) / CAST(n_g AS DOUBLE)"
    val devE = s"($zbarG - szall / CAST(n_tot AS DOUBLE))"
    s"""WITH base AS (
       |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
       |  FROM events WHERE value IS NOT NULL),
       |med AS (SELECT g, quantile_cont(v, 0.5) AS med FROM base GROUP BY g),
       |z AS (
       |  SELECT base.g, med.med, abs(v - med.med) AS z
       |  FROM base JOIN med ON base.g = med.g),
       |m AS (
       |  SELECT g, COUNT(*) AS n_g, MIN(med) AS med,
       |    SUM(CAST(z AS DECIMAL(25,6))) AS szd,
       |    SUM(CAST(z * z AS DECIMAL(25,6))) AS szzd
       |  FROM z GROUP BY g),
       |tot AS (
       |  SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot, COUNT(*) AS k,
       |    CAST(SUM(szd) AS DOUBLE) AS szall
       |  FROM m),
       |term AS (
       |  SELECT
       |    CAST(round(CAST(n_g AS DOUBLE) * $devE * $devE * 1e6, 0)
       |      AS HUGEINT) AS n6,
       |    CAST(round((CAST(szzd AS DOUBLE) - CAST(szd AS DOUBLE) *
       |      CAST(szd AS DOUBLE) / CAST(n_g AS DOUBLE)) * 1e6, 0)
       |      AS HUGEINT) AS d6
       |  FROM m, tot),
       |s AS (SELECT CAST(SUM(n6) AS DOUBLE) AS sn,
       |  CAST(SUM(d6) AS DOUBLE) AS sd FROM term)
       |SELECT g AS event_type, n_g, round(med, 9) AS med,
       |  round($zbarG, 9) AS z_mean,
       |  CASE WHEN k > 1 AND sd > 0.0 THEN
       |    round((CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE)) /
       |      (CAST(k AS DOUBLE) - 1.0) * (sn / sd), 6) END AS f_bf,
       |  CAST(k - 1 AS BIGINT) AS df1,
       |  CAST(n_tot - k AS BIGINT) AS df2
       |FROM m, tot, s ORDER BY event_type""".stripMargin
  }

  /** q80_gtest: likelihood-ratio independence test ([[StatTests
    * .gTest]]) over q57's source × token-bucket table — the statistic
    * information theory prefers (G = 2n·MI·ln2, additive across
    * partitions) and the one that needs NO dense grid: absent cells
    * contribute exactly 0, so a sparse high-cardinality table never
    * materializes r×c rows. Cell terms O·ln(O/E) round@9 to longs (the
    * q64 log-term convention) and sum exactly. */
  private def gtestQ(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"),
        explode(graft.functions.TextOps.words(col("text"))).as("__w"))
      .select(col("source"), graft.pipeline.Drift.bucketOf(col("__w")).as("b"))
    StatTests.gTest(toks, "source", "b")
  }

  private lazy val gtestSql =
    s"""WITH toks AS (
       |  SELECT source AS r,
       |    (('0x' || substring(md5(w), 1, 4))::INT % ${graft.pipeline.Drift.Buckets}) AS c
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)),
       |o AS (SELECT r, c, COUNT(*) AS o FROM toks GROUP BY 1, 2),
       |rt AS (SELECT r, CAST(SUM(o) AS BIGINT) AS rtot FROM o GROUP BY 1),
       |ct AS (SELECT c, CAST(SUM(o) AS BIGINT) AS ctot FROM o GROUP BY 1),
       |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS ntot FROM o),
       |cell AS (
       |  SELECT CAST(round(CAST(o.o AS DOUBLE) * ln(CAST(o.o AS DOUBLE) /
       |      (CAST(rt.rtot AS DOUBLE) * CAST(ct.ctot AS DOUBLE) /
       |       CAST(nn.ntot AS DOUBLE))) * 1e9, 0) AS BIGINT) AS t9
       |  FROM o JOIN rt USING (r) JOIN ct USING (c), nn),
       |sg AS (SELECT CAST(SUM(t9) AS BIGINT) AS g9 FROM cell),
       |rk AS (SELECT COUNT(*) AS r_card FROM rt),
       |ck AS (SELECT COUNT(*) AS c_card FROM ct)
       |SELECT nn.ntot AS n, (rk.r_card - 1) * (ck.c_card - 1) AS dof,
       |  round(CAST(g9 AS DOUBLE) * 2.0 / 1e9, 6) AS g_stat
       |FROM sg, nn, rk, ck""".stripMargin

  /** q81_durbin_watson: serial-correlation diagnostic ([[StatTests
    * .durbinWatson]]) on the q59 OLS residuals in per-returnflag
    * ship-date order — the check that says whether q59's R² can be
    * trusted on time-ordered data (d ≈ 2 independent; → 0/4 positive/
    * negative autocorrelation). A COMPOSITION gate like q63: the
    * round@9 model artifact q59 emits rides in as a 1-row broadcast,
    * residuals are one narrow IEEE expression per row, and the lag
    * window runs on ONE key-partitioned exchange ordered by
    * (shipdate, orderkey, linenumber) — a key this synthetic table does
    * NOT keep unique, which is exactly why [[StatTests.durbinWatson]]
    * appends the residual value as the tie-breaking last sort key
    * (equal residuals commute under the lag difference, so d stays
    * order-invariant). */
  private def dwQ(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val beta = StatTests.ols2(li,
        "l_quantity", "l_discount", "l_extendedprice")
      .select(col("b0"), col("b1"), col("b2"))
    val resid = li.select(col("l_returnflag").as("g"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("x2"),
        col("l_discount").cast("double").as("x3"),
        col("l_extendedprice").cast("double").as("y"))
      .crossJoin(broadcast(beta))
      .select(col("g"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"),
        (col("y") - (col("b0") + col("b1") * col("x2") +
          col("b2") * col("x3"))).as("e"))
    StatTests.durbinWatson(resid, "g",
        Seq("l_shipdate", "l_orderkey", "l_linenumber"), "e")
      .orderBy(col("g"))
      .withColumnRenamed("g", "l_returnflag")
  }

  private lazy val dwSql =
    s"""${olsCtes("")},
       |bq AS (SELECT round(b0, 9) AS b0, round(b1, 9) AS b1,
       |  round(b2, 9) AS b2 FROM b),
       |r AS (
       |  SELECT l_returnflag AS g, l_shipdate, l_orderkey, l_linenumber,
       |    CAST(l_extendedprice AS DOUBLE) -
       |      (b0 + b1 * CAST(l_quantity AS DOUBLE) +
       |       b2 * CAST(l_discount AS DOUBLE)) AS e
       |  FROM lineitem, bq),
       |l AS (
       |  SELECT g, e, e - lag(e) OVER (PARTITION BY g
       |    ORDER BY l_shipdate, l_orderkey, l_linenumber, e) AS de
       |  FROM r),
       |s AS (
       |  SELECT g, COUNT(*) AS n,
       |    CAST(SUM(CAST(de * de AS DECIMAL(25,6))) AS DOUBLE) AS num,
       |    CAST(SUM(CAST(e * e AS DECIMAL(25,6))) AS DOUBLE) AS den
       |  FROM l GROUP BY g)
       |SELECT g AS l_returnflag, n, round(num / den, 6) AS dw
       |FROM s ORDER BY l_returnflag""".stripMargin

  /** q81b_durbin_watson_fine: the SAME diagnostic under the finer
    * (returnflag, ship-year) series key — the executable form of
    * [[StatTests.durbinWatson]]'s scale note (the q27a/RFM precedent:
    * scale advice as a gated query, not prose). Parallelism rises from
    * the 3 coarse groups to 3×|years| bounded per-year sorts while
    * every other contract (deterministic order + residual tie-break,
    * exact-decimal sums, round@6) is identical — at 100 TB this is the
    * variant you run, reading d per series-shard. */
  private def dwFineQ(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val beta = StatTests.ols2(li,
        "l_quantity", "l_discount", "l_extendedprice")
      .select(col("b0"), col("b1"), col("b2"))
    val resid = li.select(col("l_returnflag").as("g"),
        year(col("l_shipdate")).as("l_year"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("x2"),
        col("l_discount").cast("double").as("x3"),
        col("l_extendedprice").cast("double").as("y"))
      .crossJoin(broadcast(beta))
      .select(col("g"), col("l_year"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"),
        (col("y") - (col("b0") + col("b1") * col("x2") +
          col("b2") * col("x3"))).as("e"))
    StatTests.durbinWatsonKeys(resid, Seq("g", "l_year"),
        Seq("l_shipdate", "l_orderkey", "l_linenumber"), "e")
      .orderBy(col("g"), col("l_year"))
      .withColumnRenamed("g", "l_returnflag")
  }

  private lazy val dwFineSql =
    s"""${olsCtes("")},
       |bq AS (SELECT round(b0, 9) AS b0, round(b1, 9) AS b1,
       |  round(b2, 9) AS b2 FROM b),
       |r AS (
       |  SELECT l_returnflag AS g, CAST(year(l_shipdate) AS INT) AS l_year,
       |    l_shipdate, l_orderkey, l_linenumber,
       |    CAST(l_extendedprice AS DOUBLE) -
       |      (b0 + b1 * CAST(l_quantity AS DOUBLE) +
       |       b2 * CAST(l_discount AS DOUBLE)) AS e
       |  FROM lineitem, bq),
       |l AS (
       |  SELECT g, l_year, e, e - lag(e) OVER (PARTITION BY g, l_year
       |    ORDER BY l_shipdate, l_orderkey, l_linenumber, e) AS de
       |  FROM r),
       |s AS (
       |  SELECT g, l_year, COUNT(*) AS n,
       |    CAST(SUM(CAST(de * de AS DECIMAL(25,6))) AS DOUBLE) AS num,
       |    CAST(SUM(CAST(e * e AS DECIMAL(25,6))) AS DOUBLE) AS den
       |  FROM l GROUP BY g, l_year)
       |SELECT g AS l_returnflag, l_year, n, round(num / den, 6) AS dw
       |FROM s ORDER BY l_returnflag, l_year""".stripMargin

  /** q82_kendall_tau: Kendall's τ-b ([[StatTests.kendallTauBudget]]) on
    * the SAME budget-lottery points as q67/q72 — the rank-correlation
    * EFFECT SIZE next to Mann–Kendall's significance (the d-vs-t
    * pattern: at corpus scale z says "a trend exists", τ says how
    * strong). S, n₀ and both tie sums are exact longs; one division,
    * round@6. */
  private def ktQ(s: SparkSession, d: String): DataFrame =
    StatTests.kendallTauBudget(Tables.events(s, d),
        "event_type", "ts", "event_id", "value",
        targetPoints = TheilSenBudgetPts)
      .orderBy(col("g"))
      .withColumnRenamed("g", "event_type")

  private lazy val ktSql = {
    val n0 = "np.n * (np.n - 1) // 2"
    s"""WITH $budgetPtsSql,
       |sp AS (
       |  SELECT a.g, CAST(SUM(CASE WHEN b.v > a.v THEN 1
       |    WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
       |  FROM pts a JOIN pts b ON b.g = a.g AND a.t < b.t
       |  GROUP BY a.g),
       |np AS (SELECT g, COUNT(*) AS n FROM pts GROUP BY g),
       |tt AS (SELECT g, CAST(SUM(tc * (tc - 1) // 2) AS BIGINT) AS tt
       |  FROM (SELECT g, t, COUNT(*) AS tc FROM pts GROUP BY g, t)
       |  GROUP BY g),
       |tv AS (SELECT g, CAST(SUM(tc * (tc - 1) // 2) AS BIGINT) AS tv
       |  FROM (SELECT g, v, COUNT(*) AS tc FROM pts GROUP BY g, v)
       |  GROUP BY g)
       |SELECT np.g AS event_type, np.n, sp.s,
       |  CASE WHEN ($n0 - tt.tt) > 0 AND ($n0 - tv.tv) > 0 THEN
       |    round(CAST(sp.s AS DOUBLE) /
       |      sqrt(CAST($n0 - tt.tt AS DOUBLE) *
       |           CAST($n0 - tv.tv AS DOUBLE)), 6) END AS tau_b
       |FROM np JOIN sp USING (g) JOIN tt USING (g) JOIN tv USING (g)
       |ORDER BY event_type""".stripMargin
  }

  /** q84_hodges_lehmann: the robust shift MAGNITUDE between the $MwA and
    * $MwB value distributions ([[StatTests.hodgesLehmannBudget]]) — q56
    * says whether they differ, HL says by how much in VALUE units
    * (lower median of all cross-pair differences, 29%-breakdown-per-side
    * where the difference of means has zero). Same budget lottery as
    * q67/q72/q82 (per-group thresholds depend only on per-group counts,
    * so the kept points are identical across the estimator family);
    * 1e9-scaled exact differences, rank-selected median. */
  private def hlQ(s: SparkSession, d: String): DataFrame =
    StatTests.hodgesLehmannBudget(Tables.events(s, d),
      "event_type", "ts", "event_id", "value", MwA, MwB,
      targetPoints = TheilSenBudgetPts)

  private lazy val hlSql =
    s"""WITH $budgetPtsSql,
       |a AS (SELECT CAST(round(v * 1e9, 0) AS BIGINT) AS va FROM pts
       |  WHERE g = '$MwA'),
       |b AS (SELECT CAST(round(v * 1e9, 0) AS BIGINT) AS vb FROM pts
       |  WHERE g = '$MwB'),
       |na AS (SELECT COUNT(*) AS n_a FROM a),
       |nb AS (SELECT COUNT(*) AS n_b FROM b),
       |vc AS (SELECT va - vb AS d9, COUNT(*) AS c FROM a, b GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS m FROM vc),
       |cum AS (SELECT d9, SUM(c) OVER (ORDER BY d9
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM vc),
       |pick AS (SELECT MIN(d9) AS d9 FROM cum, tot
       |  WHERE cum >= (m + 1) // 2)
       |SELECT n_a, n_b, m, round(CAST(d9 AS DOUBLE) / 1e9, 9) AS hl_shift
       |FROM pick, na, nb, tot""".stripMargin

  /** q101b_psi_fixed: [[StatTests.psiFixed]] — the executable scale
    * path of q101 (the q81b/q100b precedent): equi-width bins from the
    * reference window's (min, max) replace the decile edges, so the
    * per-key SORT disappears — one map-side-combined aggregate + narrow
    * binning arithmetic, the shape that holds at any corpus size. Same
    * eps floor, rounded ln terms and bands. */
  private def psiFixedQ(s: SparkSession, d: String): DataFrame =
    StatTests.psiFixed(
        Tables.events(s, d)
          .select(col("event_type"), expr("unix_micros(ts)").as("__us"),
            col("value")),
        "event_type", "__us", "value")
      .orderBy(col("event_type"))

  // exposed to TimeSeriesQueries' drift-console composition (q103)
  private[queries] lazy val psiFixedSql =
    // clamp on the DOUBLE ratio before floor/cast (mirrors psiFixed): a
    // far-out-of-range current value must land in an edge bin, never
    // overflow an integer cast
    s"""WITH $psiSqlHead,
       |bounds AS (
       |  SELECT k, min(v) AS lo, max(v) AS hi
       |  FROM sided WHERE ref = 1 GROUP BY 1),
       |binned AS (
       |  SELECT s.k, s.ref,
       |    CASE WHEN b.hi = b.lo THEN 0
       |      ELSE CAST(floor(least(9.0, greatest(0.0,
       |        (s.v - b.lo) / ((b.hi - b.lo) / 10.0)))) AS INT)
       |    END AS bin
       |  FROM sided s JOIN bounds b USING (k)),
       |$psiSqlTail""".stripMargin

  /** q102_energy: energy distance between the $MwA and $MwB value
    * distributions ([[StatTests.energyDistanceBudget]]) — completes the
    * cohort-pair battery: q56 says WHETHER they differ (ranks), q84 by
    * HOW MUCH (robust shift), q102 how different the WHOLE
    * distributions are (D² = 2E|X−Y| − E|X−X'| − E|Y−Y'|, zero iff
    * equal, V-statistic convention). Same budget lottery as
    * q67/q72/q82/q84/q90; exact 1e9-long pair sums, three rounded IEEE
    * divisions, D² composed from the rounded terms. */
  private def energyQ(s: SparkSession, d: String): DataFrame =
    StatTests.energyDistanceBudget(Tables.events(s, d),
      "event_type", "ts", "event_id", "value", MwA, MwB,
      targetPoints = TheilSenBudgetPts)

  private lazy val energySql = {
    def dd(x: String) = s"CAST($x AS DOUBLE)"
    s"""WITH $budgetPtsSql,
       |p AS (SELECT g, i, round(v * 1e9, 0) AS v9 FROM pts
       |  WHERE g IN ('$MwA', '$MwB')),
       |sides AS (
       |  SELECT CAST(SUM(CASE WHEN g = '$MwA' THEN 1 END) AS BIGINT) AS n_a,
       |         CAST(SUM(CASE WHEN g = '$MwB' THEN 1 END) AS BIGINT) AS n_b
       |  FROM p),
       |wg AS (
       |  SELECT a.g, SUM(CAST(abs(a.v9 - b.v9) AS HUGEINT)) AS s
       |  FROM p a JOIN p b ON b.g = a.g AND a.i < b.i GROUP BY a.g),
       |w AS (
       |  SELECT MAX(CASE WHEN g = '$MwA' THEN s END) AS s_aa,
       |         MAX(CASE WHEN g = '$MwB' THEN s END) AS s_bb
       |  FROM wg),
       |x AS (
       |  SELECT SUM(CAST(abs(a.v9 - b.v9) AS HUGEINT)) AS s_ab
       |  FROM (SELECT v9 FROM p WHERE g = '$MwA') a,
       |       (SELECT v9 FROM p WHERE g = '$MwB') b),
       |e AS (
       |  SELECT n_a, n_b,
       |    CASE WHEN n_a > 0 AND n_b > 0 THEN
       |      round(${dd("s_ab")} / (${dd("n_a")} * ${dd("n_b")}) / 1e9, 9)
       |    END AS e_xy,
       |    CASE WHEN n_a >= 1 THEN
       |      round(${dd("COALESCE(s_aa, 0)")} * 2.0 /
       |        (${dd("n_a")} * ${dd("n_a")}) / 1e9, 9) END AS e_xx,
       |    CASE WHEN n_b >= 1 THEN
       |      round(${dd("COALESCE(s_bb, 0)")} * 2.0 /
       |        (${dd("n_b")} * ${dd("n_b")}) / 1e9, 9) END AS e_yy
       |  FROM sides, w, x)
       |SELECT n_a, n_b, e_xy, e_xx, e_yy,
       |  CASE WHEN e_xy IS NOT NULL AND e_xx IS NOT NULL
       |        AND e_yy IS NOT NULL THEN
       |    round(2.0 * e_xy - e_xx - e_yy, 9) END AS energy_d2
       |FROM e""".stripMargin
  }

  /** q85_welch_anova: classic AND Welch one-way F across the event-type
    * value distributions in one pass ([[StatTests.oneWayAnova]]) —
    * completes the k-group battery: q78 ranks, q79 variances, q85
    * means (classic assumes what q79 tests; Welch doesn't). Exact
    * decimal moments; every cross-group reduction is a rounded-scaled
    * decimal sum, mirrored term for term in the oracle. */
  private def anovaQ(s: SparkSession, d: String): DataFrame =
    StatTests.oneWayAnova(Tables.events(s, d), "event_type", "value")

  private lazy val anovaSql = {
    val nD = "CAST(n_g AS DOUBLE)"
    val mean = s"(CAST(sxd AS DOUBLE) / $nD)"
    val ss = s"(CAST(sxxd AS DOUBLE) - CAST(sxd AS DOUBLE) * " +
      s"CAST(sxd AS DOUBLE) / $nD)"
    val w = s"($nD / ($ss / ($nD - 1.0)))"
    val bigW = "(CAST(w6t AS DOUBLE) / 1e6)"
    val xw = s"((CAST(wx6t AS DOUBLE) / 1e6) / $bigW)"
    val meanAll = "(sxall / CAST(n_tot AS DOUBLE))"
    s"""WITH m0 AS (
       |  SELECT event_type AS g, COUNT(*) AS n_g,
       |    SUM(CAST(CAST(value AS DOUBLE) AS DECIMAL(25,6))) AS sxd,
       |    SUM(CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
       |      AS DECIMAL(25,6))) AS sxxd
       |  FROM events WHERE value IS NOT NULL GROUP BY 1),
       |s1c AS (
       |  SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot, COUNT(*) AS k,
       |    CAST(SUM(sxd) AS DOUBLE) AS sxall
       |  FROM m0),
       |termc AS (
       |  SELECT
       |    CAST(round($nD * ($mean - $meanAll) * ($mean - $meanAll) * 1e6, 0)
       |      AS HUGEINT) AS cb6,
       |    CAST(round($ss * 1e6, 0) AS HUGEINT) AS cw6
       |  FROM m0, s1c),
       |s2c AS (
       |  SELECT CAST(SUM(cb6) AS DOUBLE) AS scb,
       |    CAST(SUM(cw6) AS DOUBLE) AS scw
       |  FROM termc),
       |m AS (SELECT * FROM m0 WHERE n_g >= 2 AND $ss > 0.0),
       |t1 AS (
       |  SELECT g, n_g, sxd, sxxd,
       |    CAST(round($w * 1e6, 0) AS HUGEINT) AS w6,
       |    CAST(round($w * $mean * 1e6, 0) AS HUGEINT) AS wx6
       |  FROM m),
       |s1w AS (
       |  SELECT COUNT(*) AS kw, SUM(w6) AS w6t, SUM(wx6) AS wx6t
       |  FROM t1),
       |termw AS (
       |  SELECT
       |    CAST(round($w * ($mean - $xw) * ($mean - $xw) * 1e6, 0)
       |      AS HUGEINT) AS wb6,
       |    CAST(round((1.0 - $w / $bigW) * (1.0 - $w / $bigW) /
       |      ($nD - 1.0) * 1e9, 0) AS HUGEINT) AS lam9
       |  FROM t1, s1w),
       |s2w AS (
       |  SELECT CAST(SUM(wb6) AS DOUBLE) AS swb,
       |    CAST(SUM(lam9) AS DOUBLE) AS slam
       |  FROM termw)
       |SELECT k, n_tot AS n, kw AS k_welch,
       |  CASE WHEN k > 1 AND n_tot > k AND scw > 0.0 THEN
       |    round((CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE)) /
       |      (CAST(k AS DOUBLE) - 1.0) * ((scb / 1e6) / (scw / 1e6)), 6)
       |  END AS f_anova,
       |  CASE WHEN kw > 1 AND slam > 0.0 THEN
       |    round((swb / 1e6) / (CAST(kw AS DOUBLE) - 1.0) /
       |      (1.0 + 2.0 * (CAST(kw AS DOUBLE) - 2.0) /
       |        (CAST(kw AS DOUBLE) * CAST(kw AS DOUBLE) - 1.0) * (slam / 1e9)),
       |      6)
       |  END AS f_welch,
       |  CASE WHEN kw > 1 AND slam > 0.0 THEN
       |    round((CAST(kw AS DOUBLE) * CAST(kw AS DOUBLE) - 1.0) /
       |      (3.0 * (slam / 1e9)), 6)
       |  END AS df2_welch
       |FROM s1c, s2c, s1w, s2w""".stripMargin
  }

  // experiment period split for CUPED: pre-period covariate before
  // 2024-01-16T00:00:00Z, experiment metric from then on (the events
  // table spans 2024-01-01..30)
  private val CupedCutUs = 1705363200000000L

  /** q97_cuped: CUPED variance-reduced A/B readout
    * ([[StatTests.cuped]]) — each user's first-half activity is the
    * pre-period covariate for their second-half metric, variant =
    * user_id parity; the synthetic corpus has correlated user activity
    * levels, so the gate exercises a real ρ² > 0 reduction. */
  private def cupedQ(s: SparkSession, d: String): DataFrame = {
    val us = expr("unix_micros(ts)")
    val subj = Tables.events(s, d).groupBy(col("user_id"))
      .agg(
        coalesce(sum(Det.dec(when(us < CupedCutUs, col("value"))))
          .cast("double"), lit(0.0)).as("x"),
        coalesce(sum(Det.dec(when(us >= CupedCutUs, col("value"))))
          .cast("double"), lit(0.0)).as("y"))
      .select((col("user_id") % 2).as("variant"), col("x"), col("y"))
    StatTests.cuped(subj, "variant", "x", "y")
  }

  /** Shared SQL builder for the two-cohort moment aggregates (q97/q98):
    * per side, (n, Sx, Sy, Sxx, Syy, Sxy) as DECIMAL(25,6) conditional
    * sums — must stay in lock-step with StatTests.twoSidedMoments. */
  private def twoSidedMomentsSql(vv: Int, sfx: String): String = {
    def s6(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(25,6))) AS DOUBLE)"
    Seq(
      s"CAST(SUM(CASE WHEN v = $vv THEN 1 END) AS BIGINT) AS n$sfx",
      s"${s6(s"CASE WHEN v = $vv THEN x END")} AS sx$sfx",
      s"${s6(s"CASE WHEN v = $vv THEN y END")} AS sy$sfx",
      s"${s6(s"CASE WHEN v = $vv THEN x * x END")} AS sxx$sfx",
      s"${s6(s"CASE WHEN v = $vv THEN y * y END")} AS syy$sfx",
      s"${s6(s"CASE WHEN v = $vv THEN x * y END")} AS sxy$sfx").mkString(",\n    ")
  }

  private lazy val cupedSql = {
    def d(x: String) = s"CAST($x AS DOUBLE)"
    def side(vv: Int, sfx: String) = twoSidedMomentsSql(vv, sfx)
    val nT = s"(${d("na")} + ${d("nb")})"
    val sxT = "(sxa + sxb)"
    val syT = "(sya + syb)"
    val sxxT = "(sxxa + sxxb)"
    val sxyT = "(sxya + sxyb)"
    val syyT = "(syya + syyb)"
    val theta = s"round(($nT * $sxyT - $sxT * $syT) / ($nT * $sxxT - $sxT * $sxT), 9)"
    def mean(c: String, sfx: String) = s"($c$sfx / ${d(s"n$sfx")})"
    def varOf(cc: String, c: String, sfx: String) =
      s"(($cc$sfx - $c$sfx * $c$sfx / ${d(s"n$sfx")}) / (${d(s"n$sfx")} - 1.0))"
    def covOf(sfx: String) =
      s"((sxy$sfx - sx$sfx * sy$sfx / ${d(s"n$sfx")}) / (${d(s"n$sfx")} - 1.0))"
    def varAdj(sfx: String) = s"(${varOf("syy", "sy", sfx)} - 2.0 * th * ${covOf(sfx)}" +
      s" + th * th * ${varOf("sxx", "sx", sfx)})"
    val diffRaw = s"(${mean("sy", "a")} - ${mean("sy", "b")})"
    val diffAdj = s"($diffRaw - th * (${mean("sx", "a")} - ${mean("sx", "b")}))"
    val seRaw = s"sqrt(${varOf("syy", "sy", "a")} / ${d("na")} + ${varOf("syy", "sy", "b")} / ${d("nb")})"
    val seAdj = s"sqrt(${varAdj("a")} / ${d("na")} + ${varAdj("b")} / ${d("nb")})"
    val varXT = s"(($sxxT - $sxT * $sxT / $nT) / ($nT - 1.0))"
    val varYT = s"(($syyT - $syT * $syT / $nT) / ($nT - 1.0))"
    s"""WITH subj AS (
       |  SELECT user_id % 2 AS v,
       |    COALESCE(CAST(SUM(CASE WHEN epoch_us(ts) < $CupedCutUs
       |      THEN CAST(CAST(value AS DOUBLE) AS DECIMAL(25,6)) END) AS DOUBLE), 0.0) AS x,
       |    COALESCE(CAST(SUM(CASE WHEN epoch_us(ts) >= $CupedCutUs
       |      THEN CAST(CAST(value AS DOUBLE) AS DECIMAL(25,6)) END) AS DOUBLE), 0.0) AS y
       |  FROM events GROUP BY user_id),
       |a AS (
       |  SELECT
       |    ${side(0, "a")},
       |    ${side(1, "b")}
       |  FROM subj),
       |t AS (
       |  SELECT a.*, CASE WHEN na >= 2 AND nb >= 2
       |    AND ($nT * $sxxT - $sxT * $sxT) > 0.0 THEN $theta END AS th
       |  FROM a)
       |SELECT na AS n_a, nb AS n_b, th AS theta,
       |  CASE WHEN na >= 1 AND nb >= 1 THEN round($diffRaw, 9) END AS diff_raw,
       |  round($diffAdj, 9) AS diff_adj,
       |  CASE WHEN th IS NOT NULL AND $seRaw > 0.0 THEN
       |    round($diffRaw / $seRaw, 6) END AS z_raw,
       |  CASE WHEN th IS NOT NULL AND $seAdj > 0.0 THEN
       |    round($diffAdj / $seAdj, 6) END AS z_adj,
       |  CASE WHEN th IS NOT NULL AND $varYT > 0.0 THEN
       |    round(th * th * $varXT / $varYT, 6) END AS var_reduction
       |FROM t""".stripMargin
  }

  // SPRT gate hypotheses: purchase share ~0.198 in the synthetic events;
  // test H0 p=0.18 vs H1 p=0.22 so the trajectory genuinely wanders
  // before deciding
  private val SprtP0 = 0.18
  private val SprtP1 = 0.22
  private val SprtAlpha = 0.05
  private val SprtBeta = 0.2

  /** q99_sprt: Wald sequential probability-ratio trajectory of the
    * purchase rate per variant cohort ([[StatTests.sprtBernoulli]]) —
    * the "when could we have stopped" readout a fixed-horizon z (q76)
    * cannot give. All ln() terms are DRIVER-computed double literals
    * emitted verbatim into both engines (the shared-text convention:
    * engine ln agrees only to the ulp, a literal is bit-identical). */
  private def sprtQ(s: SparkSession, d: String): DataFrame =
    StatTests.sprtBernoulli(
      Tables.events(s, d).select((col("user_id") % 2).as("variant"),
        col("ts"), col("event_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("hit")),
      "variant", "ts", "event_id", "hit",
      SprtP0, SprtP1, SprtAlpha, SprtBeta)
      .orderBy(col("g"))

  private lazy val sprtSql = {
    val lWin = math.log(SprtP1 / SprtP0)
    val lLose = math.log((1.0 - SprtP1) / (1.0 - SprtP0))
    val a = math.log((1.0 - SprtBeta) / SprtAlpha)
    val b = math.log(SprtBeta / (1.0 - SprtAlpha))
    val a9 = BigDecimal(a).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val b9 = BigDecimal(b).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    s"""WITH base AS (
       |  SELECT user_id % 2 AS g, ts, event_id,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
       |  FROM events),
       |traj AS (
       |  SELECT g,
       |    SUM(s) OVER w AS k, COUNT(*) OVER w AS n,
       |    round(CAST(SUM(s) OVER w AS DOUBLE) * $lWin +
       |      CAST(COUNT(*) OVER w - SUM(s) OVER w AS DOUBLE) * $lLose, 9)
       |      AS llr
       |  FROM base
       |  WINDOW w AS (PARTITION BY g ORDER BY ts, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |agg AS (
       |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
       |    MIN(CASE WHEN llr >= $a THEN n END) AS up_n,
       |    MIN(CASE WHEN llr <= $b THEN n END) AS dn_n
       |  FROM traj GROUP BY g),
       |tot AS (
       |  SELECT g, CAST(SUM(s) AS BIGINT) AS k FROM base GROUP BY g),
       |fin AS (
       |  SELECT agg.g, agg.n, tot.k, agg.up_n, agg.dn_n,
       |    round(CAST(tot.k AS DOUBLE) * $lWin +
       |      CAST(agg.n - tot.k AS DOUBLE) * $lLose, 9) AS llr
       |  FROM agg JOIN tot USING (g))
       |SELECT g, n, k, llr,
       |  $a9 AS upper_a, $b9 AS lower_b,
       |  CASE WHEN llr >= $a THEN 'accept_h1'
       |    WHEN llr <= $b THEN 'accept_h0'
       |    ELSE 'continue' END AS decision,
       |  CASE WHEN up_n IS NULL THEN dn_n WHEN dn_n IS NULL THEN up_n
       |    ELSE least(up_n, dn_n) END AS first_cross_n,
       |  CASE WHEN up_n IS NULL AND dn_n IS NULL THEN 'continue'
       |    WHEN up_n <= coalesce(dn_n, 9223372036854775807) THEN 'accept_h1'
       |    ELSE 'accept_h0' END AS first_cross_decision
       |FROM fin ORDER BY g""".stripMargin
  }

  /** q99b_sprt_hourly: the SAME sequential test over PRE-AGGREGATED
    * hourly (k, n) increments ([[StatTests.sprtIncrements]]) — the
    * scale note made executable (the q81b precedent): the trajectory
    * window runs over ~720 interval rows per cohort instead of every
    * event, so at 100 TB the event stream reduces with one ordinary
    * aggregate and only interval rows sort. Coarsening can only delay
    * a crossing to its interval boundary, never invent one. */
  private def sprtHourlyQ(s: SparkSession, d: String): DataFrame =
    StatTests.sprtIncrements(
      Tables.events(s, d)
        .groupBy((col("user_id") % 2).as("variant"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("ik"), count(lit(1)).as("n_i")),
      "variant", "h", "ik", "n_i", SprtP0, SprtP1, SprtAlpha, SprtBeta)
      .orderBy(col("g"))

  private lazy val sprtHourlySql = {
    val lWin = math.log(SprtP1 / SprtP0)
    val lLose = math.log((1.0 - SprtP1) / (1.0 - SprtP0))
    val a = math.log((1.0 - SprtBeta) / SprtAlpha)
    val b = math.log(SprtBeta / (1.0 - SprtAlpha))
    val a9 = BigDecimal(a).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val b9 = BigDecimal(b).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    s"""WITH inc AS (
       |  SELECT user_id % 2 AS g, date_trunc('hour', ts) AS o,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ik,
       |    COUNT(*) AS n_i
       |  FROM events GROUP BY 1, 2),
       |traj AS (
       |  -- windowed SUM is HUGEINT in DuckDB: pin BIGINT so the MIN'd
       |  -- crossing column dtype-matches Spark's long
       |  SELECT g, CAST(SUM(ik) OVER w AS BIGINT) AS k,
       |    CAST(SUM(n_i) OVER w AS BIGINT) AS n,
       |    round(CAST(SUM(ik) OVER w AS DOUBLE) * $lWin +
       |      CAST(SUM(n_i) OVER w - SUM(ik) OVER w AS DOUBLE) * $lLose, 9)
       |      AS llr
       |  FROM inc
       |  WINDOW w AS (PARTITION BY g ORDER BY o
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |agg AS (
       |  SELECT g,
       |    MIN(CASE WHEN llr >= $a THEN n END) AS up_n,
       |    MIN(CASE WHEN llr <= $b THEN n END) AS dn_n
       |  FROM traj GROUP BY g),
       |tot AS (
       |  SELECT g, CAST(SUM(n_i) AS BIGINT) AS n, CAST(SUM(ik) AS BIGINT) AS k
       |  FROM inc GROUP BY g),
       |fin AS (
       |  SELECT tot.g, tot.n, tot.k, agg.up_n, agg.dn_n,
       |    round(CAST(tot.k AS DOUBLE) * $lWin +
       |      CAST(tot.n - tot.k AS DOUBLE) * $lLose, 9) AS llr
       |  FROM tot JOIN agg USING (g))
       |SELECT g, n, k, llr,
       |  $a9 AS upper_a, $b9 AS lower_b,
       |  CASE WHEN llr >= $a THEN 'accept_h1'
       |    WHEN llr <= $b THEN 'accept_h0'
       |    ELSE 'continue' END AS decision,
       |  CASE WHEN up_n IS NULL THEN dn_n WHEN dn_n IS NULL THEN up_n
       |    ELSE least(up_n, dn_n) END AS first_cross_n,
       |  CASE WHEN up_n IS NULL AND dn_n IS NULL THEN 'continue'
       |    WHEN up_n <= coalesce(dn_n, 9223372036854775807) THEN 'accept_h1'
       |    ELSE 'accept_h0' END AS first_cross_decision
       |FROM fin ORDER BY g""".stripMargin
  }

  /** q98_ratio_metric: delta-method A/B on revenue per EVENT
    * ([[StatTests.ratioMetric]]) — the ratio-of-sums metric whose
    * variance the naive per-user t-test gets wrong; same cohorts as
    * q94/q97. */
  private def ratioQ(s: SparkSession, d: String): DataFrame = {
    val subj = Tables.events(s, d).groupBy(col("user_id"))
      .agg(
        coalesce(sum(Det.dec(when(col("event_type") === "purchase",
          col("value")))).cast("double"), lit(0.0)).as("rev"),
        count(lit(1)).cast("double").as("cnt"))
      .select((col("user_id") % 2).as("variant"), col("rev"), col("cnt"))
    StatTests.ratioMetric(subj, "variant", "rev", "cnt")
  }

  private lazy val ratioSql = {
    def d(x: String) = s"CAST($x AS DOUBLE)"
    def side(vv: Int, sfx: String) = twoSidedMomentsSql(vv, sfx)
    def r(sfx: String) = s"(CASE WHEN n$sfx >= 2 AND sx$sfx > 0.0 THEN " +
      s"round(sy$sfx / sx$sfx, 9) END)"
    def varR(sfx: String) = {
      val n = d(s"n$sfx")
      val xbar = s"(sx$sfx / $n)"
      val vy = s"((syy$sfx - sy$sfx * sy$sfx / $n) / ($n - 1.0))"
      val vx = s"((sxx$sfx - sx$sfx * sx$sfx / $n) / ($n - 1.0))"
      val cxy = s"((sxy$sfx - sx$sfx * sy$sfx / $n) / ($n - 1.0))"
      s"(($vy - 2.0 * ${r(sfx)} * $cxy + ${r(sfx)} * ${r(sfx)} * $vx) / ($n * $xbar * $xbar))"
    }
    val se = s"sqrt(${varR("a")} + ${varR("b")})"
    s"""WITH subj AS (
       |  SELECT user_id % 2 AS v,
       |    COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
       |      THEN CAST(CAST(value AS DOUBLE) AS DECIMAL(25,6)) END) AS DOUBLE), 0.0) AS y,
       |    CAST(COUNT(*) AS DOUBLE) AS x
       |  FROM events GROUP BY user_id),
       |a AS (
       |  SELECT
       |    ${side(0, "a")},
       |    ${side(1, "b")}
       |  FROM subj)
       |SELECT na AS n_a, nb AS n_b,
       |  ${r("a")} AS r_a, ${r("b")} AS r_b,
       |  round(${r("a")} - ${r("b")}, 9) AS diff,
       |  CASE WHEN $se > 0.0 THEN
       |    round((${r("a")} - ${r("b")}) / $se, 6) END AS z
       |FROM a""".stripMargin
  }

  /** q96_cochran_armitage: is the purchase PROPORTION monotone across
    * the week ([[StatTests.cochranArmitage]])? Dose = 0-based weekday of
    * the event (Spark `dayofweek(ts) − 1` ≡ DuckDB's 0-based
    * `dayofweek`), success = the event being a purchase — the trend
    * question q57's "any difference" chi² cannot answer. */
  private def caQ(s: SparkSession, d: String): DataFrame =
    StatTests.cochranArmitage(
      Tables.events(s, d).select(
        (dayofweek(col("ts")) - 1).as("dose"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("hit")),
      "dose", "hit")

  private lazy val caSql =
    """WITH m AS (
      |  SELECT dayofweek(ts) AS w, COUNT(*) AS n,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r
      |  -- NULL-ts rows drop, mirroring the operator's NULL-dose filter:
      |  -- a NULL dose group would count into k/n/r while its w-terms
      |  -- silently vanished from the trend sums
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
      |a AS (
      |  SELECT COUNT(*) AS k,
      |    CAST(SUM(n) AS BIGINT) AS n_tot, CAST(SUM(r) AS BIGINT) AS r_tot,
      |    SUM(CAST(w AS HUGEINT) * n) AS wn,
      |    SUM(CAST(w AS HUGEINT) * r) AS wr,
      |    SUM(CAST(w AS HUGEINT) * w * n) AS w2n
      |  FROM m)
      |SELECT k, n_tot AS n, r_tot AS r,
      |  CASE WHEN r_tot > 0 AND r_tot < n_tot
      |    AND CAST(n_tot AS HUGEINT) * w2n - wn * wn > 0 THEN
      |    round(CAST(CAST(n_tot AS HUGEINT) * wr - wn * r_tot AS DOUBLE) *
      |      sqrt(CAST(n_tot AS DOUBLE)) /
      |      (sqrt(CAST(CAST(r_tot AS HUGEINT) *
      |         (CAST(n_tot AS HUGEINT) - r_tot) AS DOUBLE)) *
      |       sqrt(CAST(CAST(n_tot AS HUGEINT) * w2n - wn * wn AS DOUBLE))), 6)
      |  END AS z
      |FROM a""".stripMargin

  /** q95_tukey_hsd: Tukey–Kramer studentized-range statistics for every
    * event-type pair ([[StatTests.tukeyHsd]]) — the post-hoc "WHICH
    * groups differ" that q85's omnibus F only gates; same all-groups
    * MSW as the classic decomposition, k(k−1)/2 broadcast-sized pairs. */
  private def tukeyQ(s: SparkSession, d: String): DataFrame =
    StatTests.tukeyHsd(Tables.events(s, d), "event_type", "value")
      .orderBy(col("g_a"), col("g_b"))

  private lazy val tukeySql = {
    val nD = "CAST(n_g AS DOUBLE)"
    val mean = s"(CAST(sxd AS DOUBLE) / $nD)"
    val ss = s"(CAST(sxxd AS DOUBLE) - CAST(sxd AS DOUBLE) * " +
      s"CAST(sxd AS DOUBLE) / $nD)"
    s"""WITH m0 AS (
       |  SELECT event_type AS g, COUNT(*) AS n_g,
       |    SUM(CAST(CAST(value AS DOUBLE) AS DECIMAL(25,6))) AS sxd,
       |    SUM(CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
       |      AS DECIMAL(25,6))) AS sxxd
       |  FROM events WHERE value IS NOT NULL GROUP BY 1),
       |ws AS (
       |  SELECT g, n_g, $mean AS m,
       |    CAST(round($ss * 1e6, 0) AS HUGEINT) AS cw6
       |  FROM m0),
       |tot AS (
       |  SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot, COUNT(*) AS k,
       |    CAST(SUM(cw6) AS DOUBLE) / 1e6 AS ssw
       |  FROM ws)
       |SELECT a.g AS g_a, b.g AS g_b,
       |  a.n_g AS n_a, b.n_g AS n_b,
       |  round(a.m - b.m, 9) AS mean_diff,
       |  CASE WHEN n_tot > k AND ssw > 0.0 THEN
       |    round((a.m - b.m) / sqrt(ssw /
       |      (CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE)) / 2.0 *
       |      (1.0 / CAST(a.n_g AS DOUBLE) + 1.0 / CAST(b.n_g AS DOUBLE))), 6)
       |  END AS q_stat
       |FROM ws a JOIN ws b ON a.g < b.g, tot
       |ORDER BY g_a, g_b""".stripMargin
  }

  /** q86_runs_test: Wald–Wolfowitz runs on the above/below-median sign
    * sequence per event type ([[StatTests.runsTest]]) — regimes clump
    * the signs, overcorrection alternates them; the assumption-free
    * randomness partner of q81's lag-1 Durbin–Watson. */
  private def runsQ(s: SparkSession, d: String): DataFrame =
    StatTests.runsTest(
        Tables.events(s, d)
          .select(col("event_type"), expr("unix_micros(ts)").as("__us"),
            col("event_id"), col("value")),
        "event_type", "__us", "event_id", "value")
      .orderBy(col("g"))
      .withColumnRenamed("g", "event_type")

  private lazy val runsSql = {
    val n1 = "CAST(n1 AS DOUBLE)"
    val n0 = "CAST(n0 AS DOUBLE)"
    val n = s"($n1 + $n0)"
    val p2 = s"(2.0 * $n1 * $n0)"
    s"""WITH base AS (
       |  SELECT event_type AS g, epoch_us(ts) AS t, event_id AS i,
       |    CAST(value AS DOUBLE) AS v
       |  FROM events WHERE value IS NOT NULL),
       |med AS (SELECT g, quantile_cont(v, 0.5) AS med FROM base GROUP BY g),
       |signs AS (
       |  SELECT base.g, t, i, CASE WHEN v > med THEN 1 ELSE 0 END AS s
       |  FROM base JOIN med ON base.g = med.g WHERE v <> med),
       |ch AS (
       |  SELECT g, s,
       |    CASE WHEN lag(s) OVER (PARTITION BY g ORDER BY t, i) IS NULL
       |      THEN 0
       |      WHEN lag(s) OVER (PARTITION BY g ORDER BY t, i) <> s THEN 1
       |      ELSE 0 END AS chg
       |  FROM signs),
       |r AS (
       |  SELECT g, CAST(SUM(s) AS BIGINT) AS n1,
       |    CAST(SUM(1 - s) AS BIGINT) AS n0,
       |    CAST(SUM(chg) + 1 AS BIGINT) AS runs
       |  FROM ch GROUP BY g)
       |SELECT g AS event_type, n1, n0, runs,
       |  CASE WHEN n1 > 0 AND n0 > 0 AND (n1 + n0) > 1
       |      AND CAST(2 AS HUGEINT) * n1 * n0 > n1 + n0 THEN
       |    round((CAST(runs AS DOUBLE) - ($p2 / $n + 1.0)) /
       |      sqrt($p2 * ($p2 - $n) / ($n * $n * ($n - 1.0))), 6)
       |  END AS z
       |FROM r ORDER BY event_type""".stripMargin
  }

  /** q87_mcnemar: paired conversion change ([[StatTests.mcNemar]]) —
    * each user observed under BOTH exposures (purchases among even vs
    * odd event ids), where q76's independent-samples z is simply the
    * wrong test. Only discordant pairs carry information; both χ²
    * forms are exact integer ratios until one division. */
  private def mcnemarQ(s: SparkSession, d: String): DataFrame = {
    val flags = Tables.events(s, d).select(col("user_id"),
      when(col("event_type") === "purchase" && col("event_id") % 2 === 0,
        1L).otherwise(0L).as("f1"),
      when(col("event_type") === "purchase" && col("event_id") % 2 === 1,
        1L).otherwise(0L).as("f2"))
    StatTests.mcNemar(flags, "user_id", "f1", "f2")
  }

  private lazy val mcnemarSql = {
    val bD = "CAST(b AS DOUBLE)"
    val cD = "CAST(c AS DOUBLE)"
    s"""WITH f AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN event_type = 'purchase' AND event_id % 2 = 0
       |      THEN 1 ELSE 0 END) AS a1,
       |    MAX(CASE WHEN event_type = 'purchase' AND event_id % 2 = 1
       |      THEN 1 ELSE 0 END) AS a2
       |  FROM events GROUP BY 1),
       |m AS (
       |  SELECT COUNT(*) AS n_pairs,
       |    CAST(SUM(CASE WHEN a1 = 1 AND a2 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS b,
       |    CAST(SUM(CASE WHEN a1 = 0 AND a2 = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c
       |  FROM f)
       |SELECT n_pairs, b, c,
       |  CASE WHEN b + c > 0 THEN
       |    round(($bD - $cD) * ($bD - $cD) / ($bD + $cD), 9) END AS chi2,
       |  CASE WHEN b + c > 0 THEN
       |    round((abs($bD - $cD) - 1.0) * (abs($bD - $cD) - 1.0) /
       |      ($bD + $cD), 9) END AS chi2_cc
       |FROM m""".stripMargin
  }

  /** Censoring horizon for q88: a user whose last event falls within
    * 24 h of the corpus end may still be active — right-censored. */
  private val LrHorizonUs = 86400000000L

  /** q88_logrank: Mantel–Cox log-rank between the even/odd user cohorts'
    * lifetimes ([[graft.operators.Survival.logRank]]) — the
    * censoring-correct "do the cohorts' survival curves differ?" a
    * t-test on durations gets wrong (censored users are neither short
    * nor long — they're unfinished). Lifetime = last − first event µs;
    * censored at the 24 h corpus-end horizon. */
  private def logrankQ(s: SparkSession, d: String): DataFrame = {
    val us = expr("unix_micros(ts)")
    val ev = Tables.events(s, d)
    val mx = ev.agg(max(us).as("mx"))
    val subj = ev.groupBy(col("user_id"))
      .agg(min(us).as("f"), max(us).as("l"))
      .crossJoin(broadcast(mx))
      .select((col("user_id") % 2).as("g"), (col("l") - col("f")).as("dur"),
        (col("l") > col("mx") - lit(LrHorizonUs)).as("cens"))
    graft.operators.Survival.logRank(subj, "g", "dur", "cens")
  }

  private lazy val logrankSql = {
    val n1 = "CAST(n1 AS DOUBLE)"
    val nj = s"($n1 + CAST(n2 AS DOUBLE))"
    val dj = "(CAST(d1 AS DOUBLE) + CAST(d2 AS DOUBLE))"
    val frac = s"($n1 / $nj)"
    s"""WITH mx AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
       |subj AS (
       |  SELECT user_id % 2 AS g,
       |    MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS t,
       |    MAX(epoch_us(ts)) > (SELECT mx FROM mx) - $LrHorizonUs AS c
       |  FROM events GROUP BY user_id),
       |vc AS (
       |  SELECT t,
       |    COUNT(*) FILTER (g = 0 AND NOT c) AS d1,
       |    COUNT(*) FILTER (g = 1 AND NOT c) AS d2,
       |    COUNT(*) FILTER (g = 0) AS a1,
       |    COUNT(*) FILTER (g = 1) AS a2
       |  FROM subj GROUP BY t),
       |tot AS (SELECT CAST(SUM(a1) AS BIGINT) AS t1,
       |  CAST(SUM(a2) AS BIGINT) AS t2 FROM vc),
       |r AS (
       |  SELECT d1, d2,
       |    t1 - coalesce(SUM(a1) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
       |    t2 - coalesce(SUM(a2) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n2
       |  FROM vc, tot),
       |dt AS (
       |  SELECT d1,
       |    CAST(round($dj * $frac * 1e9, 0) AS BIGINT) AS e9,
       |    CASE WHEN n1 + n2 > 1 THEN
       |      CAST(round($dj * $frac * (1.0 - $frac) * ($nj - $dj) /
       |        ($nj - 1.0) * 1e9, 0) AS BIGINT)
       |    ELSE 0 END AS v9
       |  FROM r WHERE d1 + d2 > 0),
       |sums AS (
       |  SELECT COUNT(*) AS n_times, CAST(SUM(d1) AS BIGINT) AS o1,
       |    CAST(SUM(e9) AS BIGINT) AS se9, CAST(SUM(v9) AS BIGINT) AS sv9
       |  FROM dt)
       |SELECT n_times, o1,
       |  round(CAST(se9 AS DOUBLE) / 1e9, 6) AS e1,
       |  round(CAST(sv9 AS DOUBLE) / 1e9, 6) AS v,
       |  CASE WHEN sv9 > 0 THEN
       |    round((CAST(o1 AS DOUBLE) - CAST(se9 AS DOUBLE) / 1e9) *
       |      (CAST(o1 AS DOUBLE) - CAST(se9 AS DOUBLE) / 1e9) /
       |      (CAST(sv9 AS DOUBLE) / 1e9), 6) END AS chi2
       |FROM sums""".stripMargin
  }

  /** q89_friedman: repeated-measures rank ANOVA ([[StatTests.friedman]])
    * — blocks = users, conditions = event types, value = the user's
    * mean value per type. Ranking WITHIN each user cancels between-user
    * level differences entirely (q78 pools and would read user effects
    * as type effects); only users observing all k types participate. */
  private def friedmanQ(s: SparkSession, d: String): DataFrame =
    StatTests.friedman(Tables.events(s, d), "user_id", "event_type", "value")
      .orderBy(col("cond"))
      .withColumnRenamed("cond", "event_type")

  private lazy val friedmanSql = {
    val nD = "CAST(n_blocks AS DOUBLE)"
    val kD = "CAST(k AS DOUBLE)"
    val chi = s"(12.0 / ($nD * $kD * ($kD + 1.0)) * (s6 / 1e6) - " +
      s"3.0 * $nD * ($kD + 1.0))"
    val corr = s"(1.0 - CAST(tsum AS DOUBLE) / " +
      "CAST(CAST(n_blocks AS HUGEINT) * k * (k * k - 1) AS DOUBLE))"
    s"""WITH cell AS (
       |  SELECT user_id AS b, event_type AS cond,
       |    ${Det.sqlAvg("CAST(value AS DOUBLE)")} AS v
       |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
       |kt AS (SELECT COUNT(DISTINCT cond) AS k FROM cell),
       |bc AS (SELECT b, COUNT(*) AS c FROM cell GROUP BY b),
       |complete AS (
       |  SELECT cell.b, cond, v FROM cell JOIN bc USING (b), kt
       |  WHERE bc.c = kt.k),
       |ranked AS (
       |  SELECT b, cond, v,
       |    rank() OVER (PARTITION BY b ORDER BY v) AS mr,
       |    COUNT(*) OVER (PARTITION BY b, v) AS tc
       |  FROM complete),
       |bycond AS (
       |  SELECT cond, CAST(SUM(2 * mr + tc - 1) AS BIGINT) AS r2sum,
       |    COUNT(*) AS n_blocks
       |  FROM ranked GROUP BY cond),
       |ties AS (SELECT CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS tsum
       |  FROM (SELECT b, v, COUNT(*) AS tc FROM complete GROUP BY 1, 2)),
       |term AS (
       |  SELECT CAST(round(CAST(r2sum AS DOUBLE) / 2.0 *
       |    (CAST(r2sum AS DOUBLE) / 2.0) * 1e6, 0) AS HUGEINT) AS t6
       |  FROM bycond),
       |s AS (SELECT CAST(SUM(t6) AS DOUBLE) AS s6 FROM term)
       |SELECT cond AS event_type, n_blocks, k, r2sum,
       |  round(CAST(r2sum AS DOUBLE) / ($nD * 2.0), 9) AS mean_rank,
       |  round($chi, 6) AS chi2,
       |  CASE WHEN tsum < CAST(n_blocks AS HUGEINT) * k * (k * k - 1) THEN
       |    round($chi / $corr, 6) END AS chi2_corr
       |FROM bycond, kt, s, ties ORDER BY event_type""".stripMargin
  }

  /** q110_page_trend: Page's L across the ordered weekday conditions
    * on the same users ([[StatTests.pageL]]) — q89's Friedman asks
    * "any difference across the week"; Page asks the DIRECTIONAL
    * question "does each user's value level trend from Sunday to
    * Saturday", exactly as q108's JT sharpens q78's KW. Same
    * complete-block ×2-midrank frame as Friedman (one shared
    * definition); exact decimal 2L; classical-variance z round@6. */
  private def pageQ(s: SparkSession, d: String): DataFrame =
    StatTests.pageL(
      Tables.events(s, d)
        .select(col("user_id"), (dayofweek(col("ts")) - 1).as("cond"),
          col("value")),
      "user_id", "cond", "value")

  private lazy val pageSql = {
    val p = StatTests.pTwoSidedSql("z")
    def h(x: String) = s"CAST($x AS HUGEINT)"
    val num = s"${h("2")} * l2 - ${h("b")} * ${h("k")} * " +
      s"((${h("k")} + 1) * (${h("k")} + 1))"
    val varl = s"${h("b")} * (${h("k")} * ${h("k")}) * " +
      s"((${h("k")} + 1) * (${h("k")} + 1)) * (${h("k")} - 1)"
    s"""WITH cell AS (
       |  SELECT user_id AS b, dayofweek(ts) AS cond,
       |    ${Det.sqlAvg("CAST(value AS DOUBLE)")} AS v
       |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
       |kt AS (SELECT COUNT(DISTINCT cond) AS k FROM cell),
       |bc AS (SELECT b, COUNT(*) AS c FROM cell GROUP BY b),
       |complete AS (
       |  SELECT cell.b, cond, v FROM cell JOIN bc USING (b), kt
       |  WHERE bc.c = kt.k),
       |ranked AS (
       |  SELECT b, cond, v,
       |    rank() OVER (PARTITION BY b ORDER BY v) AS mr,
       |    COUNT(*) OVER (PARTITION BY b, v) AS tc
       |  FROM complete),
       |bycond AS (
       |  SELECT cond, CAST(SUM(2 * mr + tc - 1) AS BIGINT) AS r2sum,
       |    COUNT(*) AS n_blocks
       |  FROM ranked GROUP BY cond),
       |idx AS (
       |  SELECT r2sum, n_blocks,
       |    row_number() OVER (ORDER BY cond) AS j
       |  FROM bycond),
       |agg AS (
       |  SELECT SUM(${h("j")} * ${h("r2sum")}) AS l2,
       |    MAX(n_blocks) AS b
       |  FROM idx),
       |zf AS (
       |  SELECT b AS n_blocks, k, CAST(l2 AS BIGINT) AS l2,
       |    CASE WHEN k >= 3 AND b >= 1 THEN
       |      round(CAST($num AS DOUBLE) /
       |        (4.0 * sqrt(CAST($varl AS DOUBLE) / 144.0)), 6) END AS z
       |  FROM agg, kt)
       |SELECT n_blocks, k, l2, z, $p AS p
       |FROM zf""".stripMargin
  }

  /** q90_qn_scale: Rousseeuw–Croux Qn per event type ([[StatTests
    * .qnScaleBudget]]) — 50%-breakdown spread with no location estimate
    * needed (MAD requires the median first; Qn doesn't), the robust-
    * scale companion of q84's robust shift. Same budget lottery; the
    * order statistic is a per-group distinct-difference rank pick. */
  private def qnQ(s: SparkSession, d: String): DataFrame =
    StatTests.qnScaleBudget(Tables.events(s, d),
        "event_type", "ts", "event_id", "value",
        targetPoints = TheilSenBudgetPts)
      .orderBy(col("g"))
      .withColumnRenamed("g", "event_type")

  private lazy val qnSql =
    s"""WITH $budgetPtsSql,
       |d AS (
       |  SELECT a.g, CAST(round(abs(a.v - b.v) * 1e9, 0) AS BIGINT) AS d9
       |  FROM pts a JOIN pts b ON b.g = a.g AND a.i < b.i),
       |np AS (SELECT g, COUNT(*) AS n FROM pts GROUP BY g),
       |vc AS (SELECT g, d9, COUNT(*) AS c FROM d GROUP BY 1, 2),
       |cum AS (
       |  SELECT g, d9, SUM(c) OVER (PARTITION BY g ORDER BY d9
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM vc),
       |kf AS (
       |  SELECT g, n, ((n // 2 + 1) * (n // 2)) // 2 AS k
       |  FROM np WHERE n >= 2),
       |pick AS (
       |  SELECT kf.g, n, k, MIN(d9) AS d9
       |  FROM cum JOIN kf ON kf.g = cum.g AND cum.cum >= kf.k
       |  GROUP BY 1, 2, 3)
       |SELECT g AS event_type, n, k,
       |  round(CAST(d9 AS DOUBLE) / 1e9, 9) AS qn_raw,
       |  round(2.2219 * (CAST(d9 AS DOUBLE) / 1e9), 6) AS qn
       |FROM pick ORDER BY event_type""".stripMargin

  /** q91_nelson_aalen: cumulative hazard of the user lifetimes
    * ([[graft.operators.Survival.nelsonAalen]], the q88 subjects) —
    * KM's additive twin and the engine-exact formulation: hazard
    * increments d/n round@9 to longs, so the cumulative H is an EXACT
    * LONG at every step (`h9` hash-gates directly, no ln/exp bridge);
    * Fleming–Harrington survival is one rounded readout on top. */
  private def naQ(s: SparkSession, d: String): DataFrame = {
    val us = expr("unix_micros(ts)")
    val ev = Tables.events(s, d)
    val mx = ev.agg(max(us).as("mx"))
    val subj = ev.groupBy(col("user_id"))
      .agg(min(us).as("f"), max(us).as("l"))
      .crossJoin(broadcast(mx))
      .select((col("l") - col("f")).as("dur"),
        (col("l") > col("mx") - lit(LrHorizonUs)).as("cens"))
    graft.operators.Survival.nelsonAalen(subj, "dur", "cens")
      .orderBy(col("t"))
  }

  private lazy val naSql =
    s"""WITH mx AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
       |subj AS (
       |  SELECT MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS t,
       |    MAX(epoch_us(ts)) > (SELECT mx FROM mx) - $LrHorizonUs AS c
       |  FROM events GROUP BY user_id),
       |vc AS (
       |  SELECT t, COUNT(*) FILTER (NOT c) AS d, COUNT(*) FILTER (c) AS cens
       |  FROM subj GROUP BY t),
       |tot AS (SELECT CAST(SUM(d + cens) AS BIGINT) AS n_all FROM vc),
       |staged AS (
       |  SELECT t, d,
       |    n_all - coalesce(SUM(d + cens) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
       |  FROM vc, tot),
       |acc AS (
       |  SELECT t, n_risk, d,
       |    SUM(CAST(round(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) * 1e9,
       |      0) AS BIGINT)) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h9
       |  FROM staged)
       |SELECT t, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
       |  CAST(h9 AS BIGINT) AS h9,
       |  round(CAST(h9 AS DOUBLE) / 1e9, 6) AS cum_hazard,
       |  round(exp(CAST(h9 AS DOUBLE) / -1e9), 6) AS s_fh
       |FROM acc WHERE d > 0 ORDER BY t""".stripMargin

  /** q92_wilson_ci: Wilson score intervals for the q76 conversion per
    * variant ([[StatTests.wilsonCi]]) — the binomial CI that holds
    * coverage where q76's Wald interval collapses at p̂ ∈ {0,1}
    * (Brown/Cai/DasGupta 2001). Same user rollup as q76. */
  private def wilsonQ(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("pc"))
      .select((col("user_id") % 2).as("variant"),
        when(col("pc") >= 12, 1L).otherwise(0L).as("converted"))
    StatTests.wilsonCi(users, "variant", "converted")
      .orderBy(col("g"))
      .withColumnRenamed("g", "variant")
  }

  private lazy val wilsonSql = {
    val nD = "CAST(n AS DOUBLE)"
    val p = s"(CAST(k AS DOUBLE) / $nD)"
    val z2 = "3.8415999999999997"
    val denom = s"(1.0 + $z2 / $nD)"
    val center = s"(($p + $z2 / (2.0 * $nD)) / $denom)"
    val half = s"(1.96 * sqrt($p * (1.0 - $p) / $nD + " +
      s"$z2 / (4.0 * $nD * $nD)) / $denom)"
    s"""WITH u AS (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pc
       |  FROM events GROUP BY 1),
       |m AS (
       |  SELECT user_id % 2 AS variant, COUNT(*) AS n,
       |    CAST(SUM(CASE WHEN pc >= 12 THEN 1 ELSE 0 END) AS BIGINT) AS k
       |  FROM u GROUP BY 1)
       |SELECT variant, n, k,
       |  round($p, 9) AS p_hat,
       |  round($center - $half, 6) AS wilson_lo,
       |  round($center + $half, 6) AS wilson_hi
       |FROM m ORDER BY variant""".stripMargin
  }

  /** q93_chapman: capture–recapture population estimate ([[StatTests
    * .chapman]]) over two deterministic document "crawls" (doc_id % 3
    * ≠ 0 and doc_id % 2 = 0) — "two passes share m docs: how big is
    * the whole corpus?", the mark-recapture question a crawl-coverage
    * dashboard asks. The slices are independent by construction
    * (mod-3 vs mod-2 residues), so N̂ lands near the true count — and
    * the TRUE count is gated right beside it (n_true), making the
    * estimator's accuracy part of the oracle check. */
  private def chapmanQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(
      (col("doc_id") % 3 =!= 0).as("in_a"),
      (col("doc_id") % 2 === 0).as("in_b"))
    StatTests.chapman(docs, "in_a", "in_b")
      .crossJoin(broadcast(
        Tables.documents(s, d).agg(count(lit(1)).as("n_true"))))
  }

  private lazy val chapmanSql = {
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val nHat = s"((${d("n1")} + 1.0) * (${d("n2")} + 1.0) / " +
      s"(${d("m")} + 1.0) - 1.0)"
    val se = s"sqrt((${d("n1")} + 1.0) * (${d("n2")} + 1.0) * " +
      s"(${d("n1")} - ${d("m")}) * (${d("n2")} - ${d("m")}) / " +
      s"((${d("m")} + 1.0) * (${d("m")} + 1.0) * (${d("m")} + 2.0)))"
    s"""WITH f AS (
       |  SELECT doc_id % 3 <> 0 AS a, doc_id % 2 = 0 AS b FROM documents),
       |agg AS (
       |  SELECT CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |    CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS m
       |  FROM f),
       |t AS (SELECT COUNT(*) AS n_true FROM documents)
       |SELECT n1, n2, m, round($nHat, 6) AS n_hat, round($se, 6) AS se,
       |  n_true
       |FROM agg, t""".stripMargin
  }

  /** q94_poisson_rate: purchases per observed user-hour, even vs odd
    * cohorts ([[StatTests.poissonRate]]) — the A/B for INTENSITY, where
    * q76's per-user binary collapses "how often" to "whether". Exposure
    * = each user's observed lifetime (last − first event µs), the q88
    * subjects; the conditional binomial form needs no rate variance
    * estimate: k₁ | K ~ Bin(K, t₁/(t₁+t₂)) under equal rates. */
  private def poissonQ(s: SparkSession, d: String): DataFrame = {
    val us = expr("unix_micros(ts)")
    val subj = Tables.events(s, d).groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("k"),
        (max(us) - min(us)).as("t"))
      .select((col("user_id") % 2).as("variant"), col("k"), col("t"))
    StatTests.poissonRate(subj, "variant", "k", "t")
  }

  private lazy val poissonSql = {
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val bigK = s"(${d("k_a")} + ${d("k_b")})"
    val p = s"(${d("t_a")} / (${d("t_a")} + ${d("t_b")}))"
    s"""WITH subj AS (
       |  SELECT user_id % 2 AS v,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k,
       |    MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS t
       |  FROM events GROUP BY user_id),
       |j AS (
       |  SELECT CAST(SUM(CASE WHEN v = 0 THEN k END) AS BIGINT) AS k_a,
       |         CAST(SUM(CASE WHEN v = 0 THEN t END) AS BIGINT) AS t_a,
       |         CAST(SUM(CASE WHEN v = 1 THEN k END) AS BIGINT) AS k_b,
       |         CAST(SUM(CASE WHEN v = 1 THEN t END) AS BIGINT) AS t_b
       |  FROM subj)
       |SELECT k_a AS k1, k_b AS k2, t_a AS t1_us, t_b AS t2_us,
       |  CASE WHEN t_a > 0 THEN
       |    round(${d("k_a")} / (${d("t_a")} / 3.6E9), 6) END AS rate1_h,
       |  CASE WHEN t_b > 0 THEN
       |    round(${d("k_b")} / (${d("t_b")} / 3.6E9), 6) END AS rate2_h,
       |  CASE WHEN k_a + k_b > 0 AND t_a > 0 AND t_b > 0 THEN
       |    round((${d("k_a")} - $bigK * $p) /
       |      sqrt($bigK * $p * (1.0 - $p)), 6) END AS z
       |FROM j""".stripMargin
  }

  /** q101_psi: Population Stability Index of the per-type value
    * distribution, first half of the time range (reference) vs second
    * (current) — the scorecard-governance drift readout
    * ([[StatTests.psi]]): reference deciles become 10 bins, PSI =
    * Σ (p'−q')·ln(p'/q') with the 1e-4 zero-count floor, banded
    * stable/moderate/shifted on the round@6 value. The synthetic
    * stream is stationary so all five types read stable at the gate —
    * the planted-shift label branches are spec-pinned
    * (StatTestsSpec). */
  private def psiQ(s: SparkSession, d: String): DataFrame =
    StatTests.psi(
        Tables.events(s, d)
          .select(col("event_type"), expr("unix_micros(ts)").as("__us"),
            col("value")),
        "event_type", "__us", "value")
      .orderBy(col("event_type"))

  /** The shared oracle head (midpoint split) and tail (eps floor,
    * rounded ln terms, bands) both PSI variants compose — one
    * definition, mirroring the operators' shared psiSided/psiFromBins
    * so the conventions cannot fork on either engine. */
  private val psiSqlHead =
    """src AS (
      |  SELECT event_type AS k, epoch_us(ts) AS us,
      |    CAST(value AS DOUBLE) AS v
      |  FROM events WHERE value IS NOT NULL),
      |mid AS (SELECT (min(us) + max(us)) // 2 AS m FROM src),
      |sided AS (
      |  SELECT k, v,
      |    CASE WHEN us <= (SELECT m FROM mid) THEN 1 ELSE 0 END AS ref
      |  FROM src)""".stripMargin

  private val psiSqlTail = {
    def share(c: String, n: String) =
      s"greatest(CAST($c AS DOUBLE)/CAST($n AS DOUBLE), 0.0001)"
    val pS = share("c.cr", "t.n_ref")
    val qS = s"(CASE WHEN t.n_cur > 0 THEN ${share("c.cc", "t.n_cur")}" +
      " ELSE 0.0001 END)"
    s"""cells AS (
       |  SELECT k, bin, CAST(SUM(ref) AS BIGINT) AS cr,
       |    CAST(SUM(1-ref) AS BIGINT) AS cc
       |  FROM binned GROUP BY 1, 2),
       |tot AS (
       |  SELECT k, CAST(SUM(cr) AS BIGINT) AS n_ref,
       |    CAST(SUM(cc) AS BIGINT) AS n_cur
       |  FROM cells GROUP BY 1),
       |agg AS (
       |  SELECT c.k, t.n_ref, t.n_cur,
       |    round(CAST(SUM(CAST(round(($pS - $qS) * ln($pS / $qS) * 1e9, 0)
       |      AS BIGINT)) AS DOUBLE) / 1e9, 6) AS psi
       |  FROM cells c JOIN tot t USING (k) GROUP BY 1, 2, 3)
       |SELECT k AS event_type, n_ref, n_cur, psi,
       |  CASE WHEN psi < 0.1 THEN 'stable'
       |       WHEN psi < 0.25 THEN 'moderate'
       |       ELSE 'shifted' END AS shift
       |FROM agg ORDER BY event_type""".stripMargin
  }

  private lazy val psiSql = {
    // (n-1)*0.k must multiply in DOUBLE: a bare 0.7 literal is DECIMAL in
    // DuckDB and floor((91-1)*0.7) = 63 exact vs 62 in IEEE — the edge
    // rank would silently diverge from Quantiles.exactGrouped's double
    // arithmetic on ~2% of reference sizes
    val edges = (1 to 9).map { k =>
      s"""min(CASE WHEN rn = CAST(floor((n-1)*CAST(0.$k AS DOUBLE))
         |      AS BIGINT)+1 THEN v END) AS e$k""".stripMargin
    }.mkString(",\n    ")
    s"""WITH $psiSqlHead,
       |ranked AS (
       |  SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) AS rn,
       |    count(*) OVER (PARTITION BY k) AS n
       |  FROM sided WHERE ref = 1),
       |edges AS (
       |  SELECT k,
       |    $edges
       |  FROM ranked GROUP BY 1),
       |binned AS (
       |  SELECT s.k, s.ref,
       |    len(list_filter([e.e1,e.e2,e.e3,e.e4,e.e5,e.e6,e.e7,e.e8,e.e9],
       |      x -> x <= s.v)) AS bin
       |  FROM sided s JOIN edges e USING (k)),
       |$psiSqlTail""".stripMargin
  }

  /** q104_wasserstein: 1-D Wasserstein-1 distance of the per-type
    * value distribution, first half of the time range vs second
    * ([[StatTests.wasserstein1]]) — the drift readout in METRIC UNITS
    * next to q101's unitless divergence: "the purchase-value
    * distribution moved W1 dollars". Exact CDF-difference integral
    * over the per-(type, value) count frame; rounded 1e-9 segment
    * terms, final round@9. */
  private def wassersteinQ(s: SparkSession, d: String): DataFrame =
    StatTests.wasserstein1(
        Tables.events(s, d)
          .select(col("event_type"), expr("unix_micros(ts)").as("__us"),
            col("value")),
        "event_type", "__us", "value")
      .orderBy(col("event_type"))

  /** The shared W1 tail both variants compose: the cumulative-CDF
    * window, the per-segment rounded 1e-9 term (guarded per ROW so an
    * empty side can never push NaN/Inf into the BIGINT cast on either
    * engine), the exact sum and the NULL-on-empty-side readout — one
    * definition, the psiSqlHead/psiSqlTail convention. `binCol` orders
    * the window; `segW` is the segment-width SQL expression. */
  private def w1SqlTail(binCol: String, segW: String) = {
    def dd(x: String) = s"CAST($x AS DOUBLE)"
    val diff = s"abs(${dd("fr")} / ${dd("n_ref")} - ${dd("fc")} / ${dd("n_cur")})"
    s"""tot AS (
       |  SELECT k, CAST(SUM(cr) AS BIGINT) AS n_ref,
       |    CAST(SUM(cc) AS BIGINT) AS n_cur
       |  FROM cells GROUP BY 1),
       |seg AS (
       |  SELECT c.k, t.n_ref, t.n_cur,
       |    SUM(cr) OVER (PARTITION BY c.k ORDER BY $binCol
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fr,
       |    SUM(cc) OVER (PARTITION BY c.k ORDER BY $binCol
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fc,
       |    $segW AS wseg
       |  FROM cells c JOIN tot t USING (k)),
       |agg AS (
       |  SELECT k, n_ref, n_cur,
       |    SUM(CASE WHEN n_ref > 0 AND n_cur > 0 AND wseg IS NOT NULL
       |      THEN CAST(round($diff * wseg * 1e9, 0) AS BIGINT)
       |      ELSE 0 END) AS t9
       |  FROM seg GROUP BY 1, 2, 3)
       |SELECT k AS event_type, n_ref, n_cur,
       |  CASE WHEN n_ref > 0 AND n_cur > 0
       |    THEN round(${dd("t9")} / 1e9, 9) END AS w1
       |FROM agg ORDER BY event_type""".stripMargin
  }

  private lazy val wassersteinSql =
    s"""WITH $psiSqlHead,
       |cells AS (
       |  SELECT k, v, CAST(SUM(ref) AS BIGINT) AS cr,
       |    CAST(SUM(1-ref) AS BIGINT) AS cc
       |  FROM sided GROUP BY 1, 2),
       |${w1SqlTail("v",
        "lead(v) OVER (PARTITION BY c.k ORDER BY v) - v")}""".stripMargin

  /** q104b_wasserstein_fixed: [[StatTests.wasserstein1Fixed]] — the
    * executable scale path of q104 (the q101b precedent): fixed-width
    * bins from ONE union-support (min, max) aggregate replace the
    * distinct-value sort; the CDF window runs over ≤ 10 rows per key
    * and |W1_binned − W1| ≤ binwidth. Bounds span BOTH halves (W1
    * integrates over the union support — ref-only clamping would
    * discard current-mass displacement). */
  private def wassersteinFixedQ(s: SparkSession, d: String): DataFrame =
    StatTests.wasserstein1Fixed(
        Tables.events(s, d)
          .select(col("event_type"), expr("unix_micros(ts)").as("__us"),
            col("value")),
        "event_type", "__us", "value")
      .orderBy(col("event_type"))

  private lazy val wassersteinFixedSql =
    s"""WITH $psiSqlHead,
       |bounds AS (
       |  SELECT k, min(v) AS lo, max(v) AS hi
       |  FROM sided GROUP BY 1),
       |cells AS (
       |  SELECT s.k, CASE WHEN b.hi = b.lo THEN 0
       |      ELSE CAST(floor(least(9.0, greatest(0.0,
       |        (s.v - b.lo) / ((b.hi - b.lo) / 10.0)))) AS INT)
       |    END AS bin,
       |    b.lo AS lo, b.hi AS hi,
       |    CAST(SUM(ref) AS BIGINT) AS cr,
       |    CAST(SUM(1-ref) AS BIGINT) AS cc
       |  FROM sided s JOIN bounds b USING (k) GROUP BY 1, 2, 3, 4),
       |${w1SqlTail("bin",
        "(CAST(lead(bin) OVER (PARTITION BY c.k ORDER BY bin) - bin AS DOUBLE)" +
          " * ((hi - lo) / 10.0))")}""".stripMargin

  /** q104c_wasserstein_windowed: [[graft.pipeline.Drift.binW1]] — the
    * STREAMING-shaped form of the W1 family: per (type, 1-hour window)
    * drift of the second half against the first half's fixed-bin
    * reference CDF. State is 10 cumulative counters per group (the
    * bucketJsd discipline applied to a numeric column); the identical
    * code runs on a watermarked stream — DriftSpec asserts batch ≡
    * stream bit-parity; this gate anchors the batch side in DuckDB. */
  private def wassersteinWindowedQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts"),
        expr("unix_micros(ts)").as("__us"), col("value"))
    val mid = ev.agg(expr("(min(__us) + max(__us)) div 2").as("__mid"))
    val sided = ev.crossJoin(broadcast(mid))
    val ref = sided.filter(col("__us") <= col("__mid"))
    val cur = sided.filter(col("__us") > col("__mid"))
      .withColumn("win", window(col("ts"), "1 hour"))
    graft.pipeline.Drift.binW1(cur,
        graft.pipeline.Drift.w1Ref(ref, "event_type", "value"),
        "event_type", Seq("win"), "value")
      .select(col("event_type"), col("win.start").as("ws"),
        col("n_cur"), col("w1"))
      .orderBy(col("event_type"), col("ws"))
  }

  private lazy val wassersteinWindowedSql = {
    val bin =
      """CASE WHEN b.hi = b.lo THEN 0
        |      ELSE CAST(floor(least(9.0, greatest(0.0,
        |        (%s - b.lo) / ((b.hi - b.lo) / 10.0)))) AS INT) END""".stripMargin
    val fs = (0 until 9).map(i =>
      s"CAST(SUM(CASE WHEN bin <= $i THEN 1 ELSE 0 END) AS DOUBLE) / " +
        s"CAST(COUNT(*) AS DOUBLE) AS f$i").mkString(",\n    ")
    val ccs = (0 until 9).map(i =>
      s"SUM(CASE WHEN bin <= $i THEN 1 ELSE 0 END) AS cc$i")
      .mkString(",\n    ")
    val terms = (0 until 9).map(i =>
      s"CAST(round(abs(CAST(cc$i AS DOUBLE) / CAST(n_cur AS DOUBLE) - f$i)" +
        s" * ((hi - lo) / 10.0) * 1e9, 0) AS BIGINT)").mkString(" +\n      ")
    s"""WITH src AS (
       |  SELECT event_type AS k, ts, epoch_us(ts) AS us,
       |    CAST(value AS DOUBLE) AS v
       |  FROM events WHERE value IS NOT NULL),
       |mid AS (SELECT (min(us) + max(us)) // 2 AS m FROM src),
       |ref AS (SELECT k, v FROM src WHERE us <= (SELECT m FROM mid)),
       |bounds AS (SELECT k, min(v) AS lo, max(v) AS hi FROM ref GROUP BY 1),
       |rbin AS (
       |  SELECT r.k, ${bin.format("r.v")} AS bin
       |  FROM ref r JOIN bounds b USING (k)),
       |rf AS (
       |  SELECT k, $fs FROM rbin GROUP BY 1),
       |cur AS (
       |  SELECT k, date_trunc('hour', ts) AS ws, v
       |  FROM src WHERE us > (SELECT m FROM mid)),
       |cbin AS (
       |  SELECT c.k, c.ws, ${bin.format("c.v")} AS bin, b.lo AS lo, b.hi AS hi
       |  FROM cur c JOIN bounds b USING (k)),
       |g AS (
       |  SELECT k, ws, lo, hi, COUNT(*) AS n_cur, $ccs
       |  FROM cbin GROUP BY 1, 2, 3, 4),
       |jj AS (
       |  SELECT g.*, ${(0 until 9).map(i => s"rf.f$i").mkString(", ")}
       |  FROM g JOIN rf USING (k))
       |SELECT k AS event_type, ws, n_cur,
       |  CASE WHEN hi <> lo
       |    THEN round(CAST(($terms) AS DOUBLE) / 1e9, 9) END AS w1
       |FROM jj ORDER BY event_type, ws""".stripMargin
  }

  /** q101c_psi_windowed: [[graft.pipeline.Drift.binPsi]] — the
    * windowed/STREAMING form of the PSI family (the q104c counter
    * machinery applied to the share divergence): per (type, 1-hour
    * window) PSI of the second half against the first half's fixed-bin
    * reference shares, 10 counters of state per group, the same eps
    * floor / rounded ln terms / bands as q101b. Identical code runs on
    * a watermarked stream (DriftSpec batch ≡ stream); this gate
    * anchors the batch side in DuckDB. */
  private def psiWindowedQ(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts"),
        expr("unix_micros(ts)").as("__us"), col("value"))
    val mid = ev.agg(expr("(min(__us) + max(__us)) div 2").as("__mid"))
    val sided = ev.crossJoin(broadcast(mid))
    val ref = sided.filter(col("__us") <= col("__mid"))
    val cur = sided.filter(col("__us") > col("__mid"))
      .withColumn("win", window(col("ts"), "1 hour"))
    graft.pipeline.Drift.binPsi(cur,
        graft.pipeline.Drift.psiRefFixed(ref, "event_type", "value"),
        "event_type", Seq("win"), "value")
      .select(col("event_type"), col("win.start").as("ws"),
        col("n_cur"), col("psi"), col("shift"))
      .orderBy(col("event_type"), col("ws"))
  }

  private lazy val psiWindowedSql = {
    val bin =
      """CASE WHEN b.hi = b.lo THEN 0
        |      ELSE CAST(floor(least(9.0, greatest(0.0,
        |        (%s - b.lo) / ((b.hi - b.lo) / 10.0)))) AS INT) END""".stripMargin
    val ps = (0 until 10).map(i =>
      s"CAST(SUM(CASE WHEN bin = $i THEN 1 ELSE 0 END) AS DOUBLE) / " +
        s"CAST(COUNT(*) AS DOUBLE) AS p$i").mkString(",\n    ")
    val cs = (0 until 10).map(i =>
      s"SUM(CASE WHEN bin = $i THEN 1 ELSE 0 END) AS c$i")
      .mkString(",\n    ")
    def gp(i: Int) = s"greatest(p$i, 0.0001)"
    def gq(i: Int) =
      s"greatest(CAST(c$i AS DOUBLE) / CAST(n_cur AS DOUBLE), 0.0001)"
    val terms = (0 until 10).map(i =>
      s"CAST(round((${gp(i)} - ${gq(i)}) * ln(${gp(i)} / ${gq(i)})" +
        s" * 1e9, 0) AS BIGINT)").mkString(" +\n      ")
    s"""WITH src AS (
       |  SELECT event_type AS k, ts, epoch_us(ts) AS us,
       |    CAST(value AS DOUBLE) AS v
       |  FROM events WHERE value IS NOT NULL),
       |mid AS (SELECT (min(us) + max(us)) // 2 AS m FROM src),
       |ref AS (SELECT k, v FROM src WHERE us <= (SELECT m FROM mid)),
       |bounds AS (SELECT k, min(v) AS lo, max(v) AS hi FROM ref GROUP BY 1),
       |rbin AS (
       |  SELECT r.k, ${bin.format("r.v")} AS bin
       |  FROM ref r JOIN bounds b USING (k)),
       |rf AS (
       |  SELECT k, $ps FROM rbin GROUP BY 1),
       |cur AS (
       |  SELECT k, date_trunc('hour', ts) AS ws, v
       |  FROM src WHERE us > (SELECT m FROM mid)),
       |cbin AS (
       |  SELECT c.k, c.ws, ${bin.format("c.v")} AS bin
       |  FROM cur c JOIN bounds b USING (k)),
       |g AS (
       |  SELECT k, ws, COUNT(*) AS n_cur, $cs
       |  FROM cbin GROUP BY 1, 2),
       |jj AS (
       |  SELECT g.*, ${(0 until 10).map(i => s"rf.p$i").mkString(", ")}
       |  FROM g JOIN rf USING (k)),
       |res AS (
       |  SELECT k, ws, n_cur,
       |    round(CAST(($terms) AS DOUBLE) / 1e9, 6) AS psi
       |  FROM jj)
       |SELECT k AS event_type, ws, n_cur, psi,
       |  CASE WHEN psi < 0.1 THEN 'stable'
       |       WHEN psi < 0.25 THEN 'moderate'
       |       ELSE 'shifted' END AS shift
       |FROM res ORDER BY event_type, ws""".stripMargin
  }

  val caps: Seq[Capability] = Seq(
    Capability("q101_psi",
      "Population Stability Index per series: ref-decile bins, banded drift label",
      psiQ, Some(psiSql)),
    Capability("q101b_psi_fixed",
      "PSI with equi-width reference bins: no per-key sort, the scale path",
      psiFixedQ, Some(psiFixedSql)),
    Capability("q101c_psi_windowed",
      "windowed PSI vs static reference shares: 10-counter state, stream-shaped",
      psiWindowedQ, Some(psiWindowedSql)),
    Capability("q104_wasserstein",
      "1-D Wasserstein-1 drift per series: exact CDF-difference integral, metric units",
      wassersteinQ, Some(wassersteinSql)),
    Capability("q104b_wasserstein_fixed",
      "Wasserstein-1 over fixed-width union-support bins: no per-key sort, the scale path",
      wassersteinFixedQ, Some(wassersteinFixedSql)),
    Capability("q104c_wasserstein_windowed",
      "windowed W1 vs a static reference CDF: 10-counter state, stream-shaped",
      wassersteinWindowedQ, Some(wassersteinWindowedSql)),
    Capability("q102_energy",
      "energy distance between two cohorts (whole-distribution two-sample readout)",
      energyQ, Some(energySql)),
    Capability("q55_welch",
      "pairwise Welch's t-test between group value distributions (exact moments)",
      welchQ, Some(welchSql)),
    Capability("q56_mannwhitney",
      "Mann-Whitney U from per-value counts (exact 2x-scaled U, tie-corrected z)",
      mwQ, Some(mwSql)),
    Capability("q56b_mannwhitney_binned",
      "Mann-Whitney on the 64-bin fixed grid: distinct-value frame capped, continuous-domain scale path",
      mwBinnedQ, Some(mwBinnedSql)),
    Capability("q57_chisq",
      "chi-squared homogeneity over the source x token-bucket contingency table",
      chisqQ, Some(chisqSql)),
    Capability("q110_page_trend",
      "Page's L ordered repeated-measures trend on the Friedman rank frame",
      pageQ, Some(pageSql)),
    Capability("q109_partial_corr",
      "first-order partial correlation: confounder-adjusted Pearson, one exchange",
      partialCorrQ, Some(partialCorrSql)),
    Capability("q108_jonckheere",
      "Jonckheere-Terpstra ordered k-sample trend: exact 2J, tie-corrected z",
      jtQ, Some(jtSql)),
    Capability("q108b_jonckheere_binned",
      "Jonckheere-Terpstra on the 64-bin fixed grid (binning-invariant dose sizes)",
      jtBinnedQ, Some(jtBinnedSql)),
    Capability("q107_cochran_q",
      "Cochran's Q: k matched binary conditions on the same blocks",
      cochranQQ, Some(cochranQSql)),
    Capability("q58b_cvm",
      "two-sample Cramer-von Mises: L2 CDF distance over the distinct-value frame",
      cvmQ, Some(cvmSql)),
    Capability("q58d_cvm_binned",
      "Cramer-von Mises on the 64-bin fixed grid: scan-floor scale shape",
      cvmBinnedQ, Some(cvmBinnedSql)),
    Capability("q58_ks",
      "two-sample Kolmogorov-Smirnov D (integer-exact numerator, one division)",
      ksQ, Some(ksSql)),
    Capability("q58c_ks_binned",
      "Kolmogorov-Smirnov D on the 64-bin grid CDF (error <= largest per-bin mass)",
      ksBinnedQ, Some(ksBinnedSql)),
    Capability("q59_ols_multi",
      "multivariate OLS: Cramer closed form on exact-moment normal equations + R2",
      olsQ, Some(olsSql)),
    Capability("q61_bootstrap",
      s"Poisson bootstrap: $BootstrapR deterministic replicate means (exact integer weights)",
      bootstrapQ, Some(bootstrapSql)),
    Capability("q63_conformal",
      "split-conformal 90% prediction interval for the OLS model (integer rank index)",
      conformalQ, Some(conformalSql)),
    Capability("q64_mutual_info",
      "mutual information (bits) of the source x token-bucket table (observed cells)",
      miQ, Some(miSql)),
    Capability("q65_kaplan_meier",
      "Kaplan-Meier survival of censored user lifetimes (exact log-survival longs)",
      kmQ, Some(kmSql)),
    Capability("q66_fdr",
      "all-pairs Mann-Whitney under Benjamini-Hochberg FDR control (shared-text p)",
      fdrQ, Some(fdrSql)),
    Capability("q67_theil_sen",
      "Theil-Sen robust line fit: lower-median slopes on the budget-lottery points",
      theilSenQ, Some(theilSenSql)),
    Capability("q68_ridge",
      "ridge regression: Cramer closed form on penalized exact-moment normal equations",
      ridgeQ, Some(ridgeSql)),
    Capability("q70_isotonic",
      "isotonic (PAVA) calibration of daily means via the exact minimax closed form",
      isotonicQ, Some(isotonicSql)),
    Capability("q71_anderson",
      "Anderson-Darling normality per group (shared-text Phi, exact term sum)",
      andersonQ, Some(andersonSql)),
    Capability("q72b_seasonal_mk",
      "Hirsch-Slack seasonal Mann-Kendall: within-season pairs, summed S/variance",
      seasonalMkQ, Some(seasonalMkSql)),
    Capability("q72_mann_kendall",
      "Mann-Kendall trend test on the Theil-Sen points (exact S, tie-corrected z)",
      mkQ, Some(mkSql)),
    Capability("q73_cramers_v",
      "Cramer's V + contingency coefficient: effect size over the q57 table",
      cramersQ, Some(cramersSql)),
    Capability("q76_two_proportion",
      "A/B two-proportion z-test + Wald CI on a power-user conversion",
      twoPropQ, Some(twoPropSql)),
    Capability("q77_cohens_d",
      "Cohen's d + Hedges' g effect sizes over the Welch pairs",
      cohensQ, Some(cohensSql)),
    Capability("q78_kruskal_wallis",
      "Kruskal-Wallis k-group rank ANOVA (exact x2-scaled midranks, tie-corrected H)",
      kwQ, Some(kwSql)),
    Capability("q79_brown_forsythe",
      "Brown-Forsythe variance-equality test (median-centered Levene, exact z-moments)",
      bfQ, Some(bfSql)),
    Capability("q80_gtest",
      "G-test of independence: observed-cells-only likelihood ratio (rounded ln terms)",
      gtestQ, Some(gtestSql)),
    Capability("q81_durbin_watson",
      "Durbin-Watson serial-correlation diagnostic on the q59 OLS residuals",
      dwQ, Some(dwSql)),
    Capability("q81b_durbin_watson_fine",
      "Durbin-Watson under the finer (returnflag, ship-year) series key (scale path)",
      dwFineQ, Some(dwFineSql)),
    Capability("q82_kendall_tau",
      "Kendall's tau-b on the q67/q72 budget-lottery points (exact tie sums)",
      ktQ, Some(ktSql)),
    Capability("q84_hodges_lehmann",
      "Hodges-Lehmann shift: lower-median cross-pair difference (budget lottery)",
      hlQ, Some(hlSql)),
    Capability("q85_welch_anova",
      "one-way ANOVA, classic + Welch heteroscedastic F in one grouped pass",
      anovaQ, Some(anovaSql)),
    Capability("q99b_sprt_hourly",
      "SPRT over pre-aggregated hourly increments (the scale-path twin of q99)",
      sprtHourlyQ, Some(sprtHourlySql)),
    Capability("q99_sprt",
      "Wald SPRT trajectory per variant: LLR bands, end decision, first crossing",
      sprtQ, Some(sprtSql)),
    Capability("q97_cuped",
      "CUPED variance-reduced A/B: pooled theta, adjusted diff/z, rho^2 reduction",
      cupedQ, Some(cupedSql)),
    Capability("q98_ratio_metric",
      "delta-method ratio-metric A/B (revenue per event): R, diff, z",
      ratioQ, Some(ratioSql)),
    Capability("q96_cochran_armitage",
      "Cochran-Armitage dose-trend z for purchase proportion across weekdays",
      caQ, Some(caSql)),
    Capability("q95_tukey_hsd",
      "Tukey-Kramer HSD studentized-range q per pair (post-hoc to q85's omnibus F)",
      tukeyQ, Some(tukeySql)),
    Capability("q86_runs_test",
      "Wald-Wolfowitz runs: above/below-median sign-sequence randomness per type",
      runsQ, Some(runsSql)),
    Capability("q87_mcnemar",
      "McNemar paired-binary test: discordant-pair chi2, plain + continuity form",
      mcnemarQ, Some(mcnemarSql)),
    Capability("q88_logrank",
      "Mantel-Cox log-rank between cohort survival curves (censoring-correct)",
      logrankQ, Some(logrankSql)),
    Capability("q89_friedman",
      "Friedman repeated-measures rank ANOVA over complete user blocks",
      friedmanQ, Some(friedmanSql)),
    Capability("q90_qn_scale",
      "Rousseeuw-Croux Qn robust scale: rank-picked pairwise |difference|",
      qnQ, Some(qnSql)),
    Capability("q91_nelson_aalen",
      "Nelson-Aalen cumulative hazard: exact-long h9 steps, FH survival readout",
      naQ, Some(naSql)),
    Capability("q92_wilson_ci",
      "Wilson score intervals: the binomial CI that holds where Wald collapses",
      wilsonQ, Some(wilsonSql)),
    Capability("q93_chapman",
      "Chapman capture-recapture corpus-size estimate from two crawl slices",
      chapmanQ, Some(chapmanSql)),
    Capability("q94_poisson_rate",
      "two-sample Poisson rate test: conditional binomial on exact exposures",
      poissonQ, Some(poissonSql)),
  )
}
