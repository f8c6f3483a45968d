package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Det

/** Two-sample statistical tests — the drift/experiment QA surface next
  * to the moment aggregates (the reference stops at variance/stddev;
  * `compute.rst` has no test statistics): Welch's unequal-variance t,
  * Mann–Whitney U, and the chi-squared homogeneity statistic. Every
  * statistic is derived from EXACT integer/decimal aggregates with one
  * fixed-order IEEE formula at the end (round@6/9), so all three gate
  * against DuckDB bit-for-bit.
  */
object StatTests {

  /** Pairwise Welch's t-test between every pair of groups: per pair
    * (group_a < group_b lexicographically) the t statistic and the
    * Welch–Satterthwaite degrees of freedom, both round@6. Moments are
    * exact decimal sums; the moment frame is #groups rows (broadcast
    * both sides of the pair cross join). NULL values drop per group.
    * Degenerate pairs — either side n = 1, or both variances zero — emit
    * NULL t_stat/t_df instead of NaN/Infinity (the guarded-Pearson
    * convention [[TimeSeries.acf]] uses). */
  def welchPairs(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val m = df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("__x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        Det.dsum(col("__x")).as("sx"),
        Det.dsum(col("__x") * col("__x")).as("sxx"))
    def side(s: String) = m.select(
      col("g").as(s"g_$s"), col("n").as(s"n_$s"),
      col("sx").as(s"sx_$s"), col("sxx").as(s"sxx_$s"))
    def nD(s: String) = col(s"n_$s").cast("double")
    def mean(s: String) = col(s"sx_$s") / nD(s)
    // sample variance over n: (sxx - sx*sx/n) / (n-1)
    def v(s: String) =
      (col(s"sxx_$s") - col(s"sx_$s") * col(s"sx_$s") / nD(s)) / (nD(s) - 1.0)
    def vn(s: String) = v(s) / nD(s)
    val se2 = vn("a") + vn("b")
    val t = (mean("a") - mean("b")) / sqrt(se2)
    val wdf = (se2 * se2) /
      (vn("a") * vn("a") / (nD("a") - 1.0) + vn("b") * vn("b") / (nD("b") - 1.0))
    // n = 1 makes (n-1) = 0 a divide-by-zero; two zero-variance groups
    // make se2 = 0 — both degenerate, both NULL by the guard
    val ok = col("n_a") > 1 && col("n_b") > 1 && se2 > 0.0
    broadcast(side("a")).join(broadcast(side("b")), col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        when(ok, round(t, 6)).as("t_stat"), when(ok, round(wdf, 6)).as("t_df"))
  }

  /** Cohen's d + Hedges' g between all group pairs — the EFFECT SIZE
    * companion to [[welchPairs]]: t grows with √n, so at corpus scale
    * every difference is "significant"; d = (m̄_a − m̄_b)/s_pooled is
    * what says whether it is BIG (0.2/0.5/0.8 small/medium/large), and
    * g applies the small-sample bias correction 1 − 3/(4(n_a+n_b)−9).
    * Same exact-decimal moment frame as Welch; d and g are one
    * fixed-order IEEE expression each, round@6; the Welch degenerate
    * guard applies (NULL for n ≤ 1 sides or zero pooled variance). */
  def cohensD(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val m = df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("__x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        Det.dsum(col("__x")).as("sx"),
        Det.dsum(col("__x") * col("__x")).as("sxx"))
    def side(s: String) = m.select(
      col("g").as(s"g_$s"), col("n").as(s"n_$s"),
      col("sx").as(s"sx_$s"), col("sxx").as(s"sxx_$s"))
    def nD(s: String) = col(s"n_$s").cast("double")
    def mean(s: String) = col(s"sx_$s") / nD(s)
    def ss(s: String) =
      col(s"sxx_$s") - col(s"sx_$s") * col(s"sx_$s") / nD(s)
    val pooled = (ss("a") + ss("b")) / (nD("a") + nD("b") - 2.0)
    val d = (mean("a") - mean("b")) / sqrt(pooled)
    val corr = lit(1.0) - lit(3.0) / (lit(4.0) * (nD("a") + nD("b")) - 9.0)
    val ok = col("n_a") > 1 && col("n_b") > 1 && pooled > 0.0
    broadcast(side("a")).join(broadcast(side("b")), col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        when(ok, round(d, 6)).as("cohens_d"),
        when(ok, round(d * corr, 6)).as("hedges_g"))
  }

  /** Two-proportion z-test (A/B conversion): the product-analytics
    * primitive — variant assignment vs a binary outcome, pooled-SE z,
    * shared-text p, and the UNPOOLED-SE 95% Wald interval for the
    * difference. Counts (n per variant, k converters) are exact longs;
    * z and the CI bounds are one fixed-order IEEE expression each,
    * round@6, with the p-value from [[pTwoSidedSql]] on the rounded z.
    * Input: one row per unit with (variantCol, successCol 1/0). One
    * 2-row aggregate; the compare is a broadcast self-pair. */
  def twoProportion(df: DataFrame, variantCol: String,
      successCol: String): DataFrame = {
    val m = df.groupBy(col(variantCol).as("v"))
      .agg(count(lit(1)).as("n"), sum(col(successCol)).as("k"))
    def side(s: String) = m.select(col("v").as(s"v_$s"),
      col("n").as(s"n_$s"), col("k").as(s"k_$s"))
    def nD(s: String) = col(s"n_$s").cast("double")
    def p(s: String) = col(s"k_$s").cast("double") / nD(s)
    val pPool = (col("k_a") + col("k_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val sePool = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / nD("a") + lit(1.0) / nD("b")))
    val seUnpooled = sqrt(p("a") * (lit(1.0) - p("a")) / nD("a") +
      p("b") * (lit(1.0) - p("b")) / nD("b"))
    val diff = p("a") - p("b")
    val ok = col("n_a") > 0 && col("n_b") > 0 && pPool > 0.0 && pPool < 1.0
    broadcast(side("a")).join(broadcast(side("b")), col("v_a") < col("v_b"))
      .select(col("v_a"), col("v_b"), col("n_a"), col("k_a"),
        col("n_b"), col("k_b"),
        round(p("a"), 6).as("p_a"), round(p("b"), 6).as("p_b"),
        when(ok, round(diff / sePool, 6)).as("z"),
        when(ok, round(diff - lit(1.959963985) * seUnpooled, 6)).as("ci_lo"),
        when(ok, round(diff + lit(1.959963985) * seUnpooled, 6)).as("ci_hi"))
      .withColumn("p_value", expr(pTwoSidedSql("z")))
  }

  /** Mann–Whitney U between groups `ga` and `gb` of `groupCol`: exact
    * U statistics kept ×2 so tie half-ranks stay integers (`u1x2 =
    * 2·U1`), the tie-corrected normal z round@6, and the directional
    * rank-biserial correlation (≡ Cliff's delta, 2U₁/(n₁n₂) − 1,
    * round@9) — the effect size the test needs at corpus scale, where
    * n makes everything "significant" and only r says if it matters.
    *
    * The rank sum never ranks rows: U1 = Σ_v c1(v)·C2(<v) + c1·c2/2
    * over per-VALUE counts, so the only window runs over the
    * distinct-value frame (bounded by value cardinality, already
    * aggregated — the profile_eq_histogram shape; for unbounded-
    * cardinality columns, [[Spearman]]'s range-sorted zipWithIndex
    * ranking is the alternative formulation). */
  def mannWhitney(df: DataFrame, groupCol: String, valCol: String,
      ga: String, gb: String): DataFrame = {
    val vc = df.filter(col(valCol).isNotNull &&
        (col(groupCol) === ga || col(groupCol) === gb))
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("__v"))
      .groupBy(col("__v"))
      .agg(count(when(col("g") === ga, 1)).as("c1"),
        count(when(col("g") === gb, 1)).as("c2"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val parts = vc
      .withColumn("__p2",
        col("c1") * coalesce(sum(col("c2")).over(w), lit(0L)) * 2 +
          col("c1") * col("c2"))
      .agg(sum(col("__p2")).as("u1x2"),
        sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum((col("c1") + col("c2")) * (col("c1") + col("c2")) *
          (col("c1") + col("c2")) - (col("c1") + col("c2"))).as("tsum"))
    def d(c: Column) = c.cast("double")
    val nn = d(col("n1")) + d(col("n2"))
    val sigma = sqrt(d(col("n1")) * d(col("n2")) / 12.0 *
      ((nn + 1.0) - d(col("tsum")) / (nn * (nn - 1.0))))
    parts.select(col("n1"), col("n2"), col("u1x2"),
      (col("n1") * col("n2") * 2 - col("u1x2")).as("u2x2"),
      // all-tied input (e.g. a constant column) has sigma = 0: ANSI
      // would throw on the division where DuckDB reads NULL — guard to
      // the oracle's NULL (no effect when any two values differ)
      when(sigma > 0.0,
        round((d(col("u1x2")) - d(col("n1")) * d(col("n2"))) /
          (sigma * 2.0), 6)).as("z"),
      // directional rank-biserial correlation ≡ Cliff's delta:
      // r = 2U₁/(n₁n₂) − 1 = (#(a>b) − #(a<b))/(n₁n₂) — the EFFECT SIZE
      // a significance-only U hides (at corpus scale everything is
      // "significant"; r says whether it matters). u1x2 is the exact
      // integer 2U₁ (ties counted once), so r is one division, round@9;
      // n₁n₂ in decimal(38,0) per the 100 TB product-wrap rule.
      round((d(col("u1x2")) /
        (col("n1").cast("decimal(38,0)") * col("n2")).cast("double")) -
        lit(1.0), 9).as("rank_biserial"))
  }

  /** All-pairs Mann-Whitney z with Benjamini–Hochberg FDR control — the
    * multiple-testing layer every drift/experiment dashboard needs once
    * it runs MORE than one comparison: at 10 pairwise tests a naive 0.05
    * cut expects a false positive every other refresh; BH (1995) keeps
    * the expected false-discovery RATE at `alpha` by the step-up rule
    * (reject the `i`-smallest p-values where `p_(i) ≤ i·alpha/m`).
    *
    * Per pair the statistic is EXACTLY [[mannWhitney]]'s (per-value
    * counts, integer 2×U, tie-corrected z round@6). The two-sided p
    * comes from the Abramowitz–Stegun 26.2.17 tail polynomial emitted
    * as shared SQL TEXT (the q19b Acklam pattern — both engines
    * evaluate the identical IEEE expression tree), rounded@9 before any
    * threshold comparison so a last-ulp `exp` divergence between
    * engines cannot flip a rejection.
    *
    * Shape: one (group, value) count pass; the pair fan-out joins those
    * counts to the broadcast pair list, so the exchange carries
    * (pair, value, count) rows bounded by pairs × distinct values — the
    * documented bounded-frame pattern ([[mannWhitney]], KS); the BH
    * cutoff is a 1-row broadcast, never a global sort of data.
    * Output: (g_a, g_b, z, p, bh_rank, bh_thresh, reject). */
  def mannWhitneyPairsFdr(df: DataFrame, groupCol: String, valCol: String,
      alpha: Double = 0.05): DataFrame = {
    val vc = df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("__v"))
      .groupBy(col("g"), col("__v"))
      .agg(count(lit(1)).as("c"))
    val gs = vc.select(col("g")).distinct()
    val pairs = broadcast(gs.select(col("g").as("g_a")))
      .join(broadcast(gs.select(col("g").as("g_b"))), col("g_a") < col("g_b"))
    val av = vc.select(col("g").as("g_a"), col("__v"), col("c").as("c1"))
      .join(broadcast(pairs), Seq("g_a"))
    val bv = vc.select(col("g").as("g_b"), col("__v"), col("c").as("c2"))
      .join(broadcast(pairs), Seq("g_b"))
    val pv = av.select(col("g_a"), col("g_b"), col("__v"), col("c1"))
      .join(bv.select(col("g_a"), col("g_b"), col("__v"), col("c2")),
        Seq("g_a", "g_b", "__v"), "full_outer")
      .na.fill(0L, Seq("c1", "c2"))
    val w = Window.partitionBy(col("g_a"), col("g_b")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val parts = pv
      .withColumn("__p2",
        col("c1") * coalesce(sum(col("c2")).over(w), lit(0L)) * 2 +
          col("c1") * col("c2"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(sum(col("__p2")).as("u1x2"),
        sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum((col("c1") + col("c2")) * (col("c1") + col("c2")) *
          (col("c1") + col("c2")) - (col("c1") + col("c2"))).as("tsum"))
    def d(c: Column) = c.cast("double")
    val nn = d(col("n1")) + d(col("n2"))
    val sigma = sqrt(d(col("n1")) * d(col("n2")) / 12.0 *
      ((nn + 1.0) - d(col("tsum")) / (nn * (nn - 1.0))))
    val scored = parts.select(col("g_a"), col("g_b"),
      round((d(col("u1x2")) - d(col("n1")) * d(col("n2"))) / (sigma * 2.0), 6)
        .as("z"))
      .withColumn("p", expr(StatTests.pTwoSidedSql("z")))
    // the unpartitioned rank runs over the PAIR frame — C(groups, 2)
    // rows, bounded by construction (the KM/Mann-Whitney small-frame
    // convention), never over data rows
    val ranked = scored
      .withColumn("bh_rank", row_number().over(
        Window.orderBy(col("p"), col("g_a"), col("g_b"))))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("__m"))))
      .withColumn("bh_thresh",
        d(col("bh_rank")) * lit(alpha) / d(col("__m")))
    val cutoff = ranked
      .agg(max(when(col("p") <= col("bh_thresh"), col("bh_rank"))).as("__k"))
    ranked.crossJoin(broadcast(cutoff))
      .select(col("g_a"), col("g_b"), col("z"), col("p"),
        col("bh_rank").cast("long").as("bh_rank"), col("bh_thresh"),
        (col("__k").isNotNull && col("bh_rank") <= col("__k")).as("reject"))
  }

  /** Theil–Sen robust regression per group: slope = the LOWER MEDIAN of
    * all pairwise slopes (v_j−v_i)/(x_j−x_i) over time-distinct point
    * pairs, intercept = the lower median of v_i − slope·x_i — the
    * classical 29.3%-breakdown line fit (Sen 1968), immune to the
    * outliers that drag OLS ([[q59]]'s Cramer fit) arbitrarily far. The
    * x axis is HOURS since epoch (µs/3.6e9, one IEEE division).
    *
    * Exactness: every slope/residual is ONE rounded IEEE expression
    * scaled to a 1e-9-unit long (`round(x·1e9, 0)` — the house scaled-
    * long contract), and the median is rank selection at index
    * `(m+1) div 2` over those longs — the picked VALUE at a rank is
    * unique in the sorted multiset, so row_number ties cannot change
    * the output. Equal-time pairs are excluded (no slope), matching
    * the classical definition.
    *
    * Scale shape: the pairwise frame is quadratic BY DEFINITION, so the
    * operator samples each group first by a deterministic md5 lottery
    * (`sampleUpper` two-hex threshold — the pipeline_mix contract; at
    * '08' a 12k-row group thins to ~375 points / ~70k slopes, and the
    * slope frame is the ONE cost quadratic in scale factor — the
    * lottery is the lever that keeps it bounded). The
    * self-join is g-keyed over the thinned frame (the q62
    * basket-bounded precedent, never all-rows); the two medians are
    * group-partitioned rank selections. For full-data robust fits at
    * scale, the repeated-median / binary-search formulations are the
    * published successors — this is the exact estimator on a bounded
    * deterministic sample, which is how Theil-Sen is actually run on
    * big series. Output: (g, n_pts, n_slopes, slope, intercept). */
  def theilSen(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valCol: String, sampleUpper: String = "20"): DataFrame =
    theilSenOn(lotteryPoints(df, groupCol, tsCol, idCol, valCol, sampleUpper))

  /** [[theilSen]] with a SCALE-ADAPTIVE lottery: instead of a
    * hand-picked two-hex threshold (which must be re-tuned per scale
    * factor — the q67 '20'→'08' lesson), the keep threshold derives
    * from a target per-group POINT budget via [[budgetPoints]], so a
    * 10× corpus keeps the same ~`targetPoints` sample and the quadratic
    * slope frame stays the same size at ANY scale factor. Same md5
    * determinism, same oracle replay (the threshold formula is pure
    * integer arithmetic over the group count, expressible in the gate
    * SQL verbatim). */
  def theilSenBudget(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valCol: String, targetPoints: Int = 400): DataFrame =
    theilSenOn(budgetPoints(df, groupCol, tsCol, idCol, valCol, targetPoints))

  /** The fixed-threshold md5 lottery both pairwise estimators
    * historically run on: keep rows whose two-hex md5(id) prefix is
    * below `sampleUpper` (expected keep fraction = 0x`sampleUpper`/256
    * — the pipeline_mix contract). */
  private def lotteryPoints(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valCol: String, sampleUpper: String): DataFrame =
    df.filter(col(valCol).isNotNull &&
        substring(md5(col(idCol).cast("string")), 1, 2) < lit(sampleUpper))
      .select(col(groupCol).as("g"),
        expr(s"unix_micros($tsCol)").as("t"),
        col(idCol).as("i"), col(valCol).cast("double").as("v"))

  /** The scale-adaptive lottery every quadratic estimator here thins
    * through — now the SHARED public operator [[Budget.points]] (see its
    * scaladoc for the constant-size-by-construction guarantee and the
    * oracle-replay contract); this alias keeps the family's internal
    * call sites uniform. */
  private def budgetPoints(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valCol: String, targetPoints: Int): DataFrame =
    Budget.points(df, groupCol, tsCol, idCol, valCol, targetPoints)

  private def theilSenOn(pts: DataFrame): DataFrame = {
    val slopes = Budget.orderedPairs(pts, "t")
      .select(col("g"),
        round((col("v2") - col("v1")) /
          ((col("t2") - col("t1")).cast("double") / 3600000000.0) * 1e9, 0)
          .cast("long").as("s9"))
    // Group sizes come from the THINNED POINT frame, never from a
    // whole-partition count window over the slopes — Budget.pairCount's
    // scaladoc records why (the unordered-frame OOM from the sf1
    // rehearsal); 1 row per group, broadcast into the rank filter; the
    // row_number sort itself spills gracefully, so memory stays bounded
    // at any slope-frame size.
    val mSlopes = Budget.pairCount(pts, "t")
    val mPts = pts.groupBy(col("g")).agg(count(lit(1)).as("m"))
    def lowerMedian(f: DataFrame, c: String, m: DataFrame): DataFrame = f
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col(c))))
      .join(broadcast(m), Seq("g"))
      .filter(col("rn") === expr("(m + 1) div 2"))
    val med = lowerMedian(slopes, "s9", mSlopes)
      .select(col("g"), col("s9"), col("m").as("n_slopes"))
    val resid = pts.join(med.select(col("g"), col("s9")), Seq("g"))
      .select(col("g"),
        round((col("v") - col("s9").cast("double") / 1e9 *
          (col("t").cast("double") / 3600000000.0)) * 1e9, 0)
          .cast("long").as("r9"))
    val icept = lowerMedian(resid, "r9", mPts)
      .select(col("g"), col("r9"), col("m").as("n_pts"))
    med.join(icept, Seq("g"))
      .select(col("g"), col("n_pts"), col("n_slopes"),
        (col("s9").cast("double") / 1e9).as("slope"),
        (col("r9").cast("double") / 1e9).as("intercept"))
  }

  /** Two-sided normal p-value of a z-score column as SQL text — the
    * Abramowitz–Stegun 26.2.17 five-term tail polynomial (|error| <
    * 7.5e-8), Horner form, rounded@9: emitted identically into Spark
    * (`expr`) and the DuckDB oracle so both engines evaluate the same
    * IEEE tree (the q19b Acklam-PPF precedent). */
  def pTwoSidedSql(z: String): String = {
    val t = s"(1.0/(1.0+0.2316419*abs($z)))"
    s"round(2.0*((exp(-abs($z)*abs($z)/2.0)/2.5066282746310002)*" +
      s"(((((1.330274429*$t-1.821255978)*$t+1.781477937)*$t-0.356563782)*$t+0.319381530)*$t)), 9)"
  }

  /** The Anderson–Darling per-row term as SQL text — the full
    * standardized-normal A² summand for the row at ascending rank `i`
    * of `n`, REARRANGED to need only one rank per row: substituting
    * j = n+1−i in the classical Σ(2i−1)[lnΦ(z_i) + ln(1−Φ(z_{n+1−i}))]
    * gives Σ_i [(2i−1)·lnΦ(z_i) + (2(n−i)+1)·ln(1−Φ(z_i))] — so no
    * self-join pairing row i with row n+1−i is ever needed. Φ comes
    * from the same Abramowitz–Stegun 26.2.17 tail polynomial as
    * [[pTwoSidedSql]]; the whole term is emitted as ONE shared text
    * into both engines (ln/exp agree only to the ulp, so the identical
    * IEEE tree + round@6 scaling is what makes the cross-engine sum
    * exact). Tied values permute only equal terms, so rank tie-breaks
    * cannot move the sum. */
  def adTermSql(z: String, i: String, n: String): String = {
    val az = s"abs($z)"
    val t = s"(1.0/(1.0+0.2316419*$az))"
    val tail = s"((exp(-$az*$az/2.0)/2.5066282746310002)*" +
      s"(((((1.330274429*$t-1.821255978)*$t+1.781477937)*$t-0.356563782)*$t+0.319381530)*$t))"
    val phi = s"(CASE WHEN $z < 0.0 THEN $tail ELSE 1.0 - $tail END)"
    val phic = s"(CASE WHEN $z < 0.0 THEN 1.0 - $tail ELSE $tail END)"
    s"CAST(round(((2*$i-1)*ln($phi) + (2*($n-$i)+1)*ln($phic)) * 1e6, 0) " +
      "AS BIGINT)"
  }

  /** Anderson–Darling normality test per group — the stats battery's
    * distribution-shape member: unlike KS (sup-norm, middle-sensitive),
    * A² integrates squared CDF distance with 1/(F(1−F)) weighting, so
    * it is the test that actually notices heavy/thin TAILS. Sample-
    * standardized (the "case 3" composite-hypothesis form — mean and
    * variance estimated, the usual d'Agostino table applies).
    *
    * Exactness: moments are exact decimals; z, Φ and the per-row term
    * are the SAME fixed-order IEEE tree in both engines (shared SQL
    * text, [[adTermSql]]), each term rounds@6 to a long and the
    * cross-row sum is exact. Groups need n ≥ 8 and positive variance
    * (degenerate groups are dropped loudly by the documented filter,
    * the Welch-guard convention).
    *
    * Scale shape: one grouped moment aggregate (broadcast back), one
    * key-partitioned rank window, one grouped sum — two exchanges
    * total, nothing global. */
  def andersonDarling(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val src = df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
    val m = src.groupBy(col("g")).agg(
      count(lit(1)).as("n"),
      graft.Det.dsum(col("v")).as("sx"),
      graft.Det.dsum(col("v") * col("v")).as("sxx"))
    val nD = col("n").cast("double")
    val mean = col("sx") / nD
    val sd = sqrt((col("sxx") - col("sx") * col("sx") / nD) / (nD - lit(1.0)))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    src.join(broadcast(m), "g")
      .filter(col("n") >= 8 &&
        (col("sxx") - col("sx") * col("sx") / nD) > 0.0)
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__z", (col("v") - mean) / sd)
      .withColumn("__t6", expr(adTermSql("__z", "__i", "n")))
      .groupBy(col("g"))
      .agg(max(col("n")).as("nn"), sum(col("__t6")).as("s6"))
      .select(col("g"), col("nn").as("n"),
        round(lit(-1.0) * col("nn").cast("double") -
          (col("s6").cast("double") / 1e6) / col("nn").cast("double"), 6)
          .as("a2"))
  }

  /** Mutual information of the (rowCol, colCol) contingency table in
    * bits: I = Σ p(r,c)·log2(p(r,c)/(p(r)·p(c))) over OBSERVED cells
    * (empty cells contribute zero by the 0·log0 = 0 convention, so no
    * dense grid is needed — unlike [[chiSquared]]). Counts are exact;
    * each cell term is ONE rounded IEEE expression scaled to a long
    * (round@9), so the cross-cell sum is exact. Returns 1 row:
    * (mi_9 = I·1e9 as a long, n). The natural feature-relevance twin
    * of the chi-squared statistic. */
  def mutualInfo(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val o = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o"))
    val rt = o.groupBy(col("r")).agg(sum(col("o")).as("rtot"))
    val ct = o.groupBy(col("c")).agg(sum(col("o")).as("ctot"))
    val n1 = o.agg(sum(col("o")).as("ntot"))
    def d(c: Column) = c.cast("double")
    val term9 = round(d(col("o")) / d(col("ntot")) *
      log2(d(col("o")) * d(col("ntot")) / (d(col("rtot")) * d(col("ctot")))) *
      1e9, 0).cast("long")
    o.join(broadcast(rt), "r").join(broadcast(ct), "c")
      .crossJoin(broadcast(n1))
      .select(term9.as("__t9"), col("ntot"))
      .agg(sum(col("__t9")).as("mi_9"), max(col("ntot")).as("n"))
  }

  /** Two-sample Kolmogorov–Smirnov: D = max_v |F1(v) − F2(v)| located in
    * PURE INTEGER arithmetic — over per-value counts, the numerator
    * |cum1·n2 − cum2·n1| is an exact long and D divides out once at the
    * end (round@9), with the √(n1·n2/(n1+n2))·D significance statistic
    * round@6. Same distinct-value-frame shape as [[mannWhitney]]; no
    * row is ever ranked or sorted globally. */
  def ksTest(df: DataFrame, groupCol: String, valCol: String,
      ga: String, gb: String): DataFrame = {
    val vc = df.filter(col(valCol).isNotNull &&
        (col(groupCol) === ga || col(groupCol) === gb))
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("__v"))
      .groupBy(col("__v"))
      .agg(count(when(col("g") === ga, 1)).as("c1"),
        count(when(col("g") === gb, 1)).as("c2"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = vc.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val top = vc
      .withColumn("__cum1", sum(col("c1")).over(w))
      .withColumn("__cum2", sum(col("c2")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs(col("__cum1") * col("n2") - col("__cum2") * col("n1")).as("__dn"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("__dn")).as("d_num"))
    def dD(c: Column) = c.cast("double")
    val d = dD(col("d_num")) / (dD(col("n1")) * dD(col("n2")))
    top.select(col("n1"), col("n2"), col("d_num"),
      round(d, 9).as("d"),
      round(sqrt(dD(col("n1")) * dD(col("n2")) /
        (dD(col("n1")) + dD(col("n2")))) * d, 6).as("ks_stat"))
  }

  /** Two-sample Cramér–von Mises statistic — the L² member of the
    * two-sample distance trio (KS takes the sup, W1 the L¹ integral,
    * CvM the variance-weighted L²): T = n₁n₂/(n₁+n₂)² · Σ over the
    * POOLED observations of (F1 − F2)², more sensitive than KS to
    * distributed (non-localized) differences. Over the same
    * distinct-value count frame as [[ksTest]]: each value's term
    * weights its squared CDF gap by its pooled multiplicity
    * (c1 + c2). Terms round to 1e-9 longs and sum in decimal(38,0)
    * (HUGEINT in the oracle — Σ c·diff² ≤ n, so the scaled sum passes
    * a long only beyond ~10⁹ rows per pair; decimal keeps it exact at
    * any scale); T is one IEEE expression round@6. Either side empty
    * → NULL. */
  def cvmTest(df: DataFrame, groupCol: String, valCol: String,
      ga: String, gb: String): DataFrame = {
    val vc = df.filter(col(valCol).isNotNull &&
        (col(groupCol) === ga || col(groupCol) === gb))
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("__v"))
      .groupBy(col("__v"))
      .agg(count(when(col("g") === ga, 1)).as("c1"),
        count(when(col("g") === gb, 1)).as("c2"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = vc.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    def dD(c: Column) = c.cast("double")
    val diff = dD(col("__cum1")) / dD(col("n1")) -
      dD(col("__cum2")) / dD(col("n2"))
    val term9 = when(col("n1") > 0L && col("n2") > 0L,
      round(diff * diff * dD(col("c1") + col("c2")) * 1e9, 0)
        .cast("long")).otherwise(lit(0L))
    val agg = vc
      .withColumn("__cum1", sum(col("c1")).over(w))
      .withColumn("__cum2", sum(col("c2")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        term9.cast("decimal(38,0)").as("__t9"))
      .groupBy(col("n1"), col("n2"))
      .agg(sum(col("__t9")).as("s9"))
    agg.select(col("n1"), col("n2"),
      when(col("n1") > 0L && col("n2") > 0L,
        round(dD(col("n1")) * dD(col("n2")) /
          ((dD(col("n1")) + dD(col("n2"))) *
            (dD(col("n1")) + dD(col("n2")))) *
          (dD(col("s9")) / 1e9), 6)).as("cvm_t"))
  }

  /** Fixed-grid quantization shared by the binned rank-test twins
    * ([[mannWhitneyBinned]], [[ksTestBinned]], [[cvmTestBinned]],
    * [[jonckheereTerpstraBinned]]) — the q101b/q104b fixed-bin lever
    * applied to the inferential family: the exact forms rank over the
    * POOLED distinct-value frame through one global window, which is
    * bounded-cardinality-cheap on discrete domains but degrades to a
    * single-partition sort of ~N rows on a continuous metric column.
    * Quantizing first caps that frame at `nBins` rows FOREVER: bounds
    * are ONE map-side-combined (min, max) aggregate, the bin map is
    * narrow arithmetic on a broadcast 1-row frame, and every downstream
    * window runs over ≤ nBins rows at any corpus size — the scan-floor
    * shape.
    *
    * Error contract: the binned statistic IS the exact statistic of the
    * grid-quantized sample — each value moves < one binwidth
    * ((hi−lo)/nBins) to its bin, values within a bin collapse to ties.
    * Since MW/KS/CvM/JT depend only on the value ORDERING, the result
    * equals running the exact test after that ≤-one-binwidth
    * perturbation (for KS: |D_binned − D_exact| ≤ the largest pooled
    * CDF mass inside any bin). Bin = [[clampBinOf]] — the same clamped
    * double-ratio contract as psiFixed/wasserstein1Fixed, so batch,
    * stream and oracle forms can never fork; a zero-width support
    * (constant column) collapses to one tie, which the exact tests
    * already define (NULL z / 0 distance). */
  private def quantizedSrc(src: DataFrame, valCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val bounds = src.agg(min(col(valCol)).as("__lo"),
      max(col(valCol)).as("__hi"))
    src.crossJoin(broadcast(bounds))
      .withColumn(valCol,
        clampBinOf(col(valCol), col("__lo"), col("__hi"), nBins)
          .cast("double"))
      .drop("__lo", "__hi")
  }

  /** [[mannWhitney]] on the [[quantizedSrc]] fixed grid — the
    * continuous-domain scale path (see quantizedSrc for the shape and
    * the ≤-one-binwidth error contract). */
  def mannWhitneyBinned(df: DataFrame, groupCol: String, valCol: String,
      ga: String, gb: String, nBins: Int = 64): DataFrame = {
    val src = df.filter(col(valCol).isNotNull &&
        (col(groupCol) === ga || col(groupCol) === gb))
      .select(col(groupCol), col(valCol).cast("double").as(valCol))
    mannWhitney(quantizedSrc(src, valCol, nBins), groupCol, valCol, ga, gb)
  }

  /** [[ksTest]] on the [[quantizedSrc]] fixed grid — D evaluated on the
    * bin-edge CDF; |D_binned − D_exact| ≤ the largest pooled CDF mass
    * inside any bin. */
  def ksTestBinned(df: DataFrame, groupCol: String, valCol: String,
      ga: String, gb: String, nBins: Int = 64): DataFrame = {
    val src = df.filter(col(valCol).isNotNull &&
        (col(groupCol) === ga || col(groupCol) === gb))
      .select(col(groupCol), col(valCol).cast("double").as(valCol))
    ksTest(quantizedSrc(src, valCol, nBins), groupCol, valCol, ga, gb)
  }

  /** [[cvmTest]] on the [[quantizedSrc]] fixed grid. */
  def cvmTestBinned(df: DataFrame, groupCol: String, valCol: String,
      ga: String, gb: String, nBins: Int = 64): DataFrame = {
    val src = df.filter(col(valCol).isNotNull &&
        (col(groupCol) === ga || col(groupCol) === gb))
      .select(col(groupCol), col(valCol).cast("double").as(valCol))
    cvmTest(quantizedSrc(src, valCol, nBins), groupCol, valCol, ga, gb)
  }

  /** [[jonckheereTerpstra]] on the [[quantizedSrc]] fixed grid —
    * per-dose sample sizes are binning-invariant, so only the tie
    * structure (and through it J and the variance) sees the grid. */
  def jonckheereTerpstraBinned(df: DataFrame, doseCol: String,
      valCol: String, doses: Seq[Int], nBins: Int = 64): DataFrame = {
    val src = df.filter(col(valCol).isNotNull &&
        col(doseCol).isin(doses.map(Integer.valueOf): _*))
      .select(col(doseCol), col(valCol).cast("double").as(valCol))
    jonckheereTerpstra(quantizedSrc(src, valCol, nBins), doseCol, valCol,
      doses)
  }

  /** Mann–Kendall trend test per group — the nonparametric "is there a
    * monotone trend" SIGNIFICANCE companion to [[theilSen]]'s slope
    * estimate (the two are always published together: MK says whether,
    * Theil–Sen says how much). S = Σ_{time i<j} sign(v_j − v_i); the
    * variance carries the standard tie correction
    * [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, and z applies the ±1
    * continuity correction (0 when S = 0).
    *
    * Exactness: S, n and both variance terms are pure long arithmetic;
    * z is ONE fixed-order IEEE expression round@6; the p-value reuses
    * the shared-text tail polynomial ([[pTwoSidedSql]]) on the rounded
    * z. Equal-time pairs are excluded, matching [[theilSen]].
    *
    * Scale shape: the SAME md5-lottery thinning and g-keyed
    * basket-bounded self-join as [[theilSen]] (pairs are quadratic by
    * definition — the estimator runs exactly on a bounded deterministic
    * sample); the sign pairs collapse via map-side partial sums, ties
    * via one (g, v) count pass. */
  def mannKendall(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valCol: String, sampleUpper: String = "20"): DataFrame =
    mannKendallOn(lotteryPoints(df, groupCol, tsCol, idCol, valCol,
      sampleUpper))

  /** [[mannKendall]] on the scale-adaptive [[budgetPoints]] lottery —
    * see [[theilSenBudget]]: same ~targetPoints per group at any scale
    * factor, same determinism/replay contract. */
  def mannKendallBudget(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valCol: String, targetPoints: Int = 400): DataFrame =
    mannKendallOn(budgetPoints(df, groupCol, tsCol, idCol, valCol,
      targetPoints))

  /** Seasonal Mann–Kendall (Hirsch–Slack 1984) on the scale-adaptive
    * budget lottery — the trend test that survives SEASONALITY, the
    * regime where plain MK ([[mannKendall]]) reads the cycle as trend
    * or drowns a real trend in cyclic variance: S and the tie-corrected
    * variance compute WITHIN each season (pairs never cross seasons —
    * Monday compares to Monday), then sum across seasons; z applies
    * the ±1 continuity correction to the summed S over the summed
    * variance. Season = 0-based day-of-week of the µs timestamp (the
    * q96 parity convention: Spark `dayofweek − 1` ≡ DuckDB's 0-based
    * `dayofweek`).
    *
    * The composite (group, season) key simply rides the SAME
    * [[kendallSFrame]]/tie machinery as plain MK via a struct key —
    * one definition of the pairing. Seasons with fewer than 2 points
    * have no pairs and drop from both S and the variance (and from
    * the reported n — both engines mirror the inner-join semantics);
    * the per-group lottery thresholds are the q67/q72 replay contract.
    * Scale shape: identical to [[mannKendallBudget]] — the pair join
    * is budget-bounded per group, everything else is map-side partial
    * sums. Output: (g, n, n_seasons, s, z round@6, p). */
  def seasonalMannKendallBudget(df: DataFrame, groupCol: String,
      tsCol: String, idCol: String, valCol: String,
      targetPoints: Int = 400): DataFrame = {
    val pts = budgetPoints(df, groupCol, tsCol, idCol, valCol,
      targetPoints)
    val comp = pts
      .withColumn("__season",
        (dayofweek(expr("timestamp_micros(t)")) - lit(1)).cast("int"))
      .select(struct(col("g").as("g0"), col("__season").as("ss")).as("g"),
        col("t"), col("i"), col("v"))
    val s = kendallSFrame(comp)
    val n = comp.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val ties = comp.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("tc"))
      .groupBy(col("g"))
      .agg(sum(col("tc") * (col("tc") - 1L) * (lit(2L) * col("tc") + 5L))
        .as("tcorr"))
    val per = s.join(n, Seq("g")).join(ties, Seq("g"))
      .withColumn("__varnum",
        col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L) -
          col("tcorr"))
    val roll = per.groupBy(col("g.g0").as("g"))
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_seasons"),
        sum(col("s")).as("s"), sum(col("__varnum")).as("__varnum"))
    val sigma = sqrt(col("__varnum").cast("double") / 18.0)
    roll
      .withColumn("z", round(
        when(col("s") > 0, (col("s").cast("double") - 1.0) / sigma)
          .when(col("s") < 0, (col("s").cast("double") + 1.0) / sigma)
          .otherwise(0.0), 6))
      .withColumn("p", expr(pTwoSidedSql("z")))
      .select(col("g"), col("n"), col("n_seasons"), col("s"), col("z"),
        col("p"))
  }

  /** The Kendall S frame both [[mannKendallOn]] and [[kendallTauOn]]
    * read: per group, Σ sign(v₂−v₁) over strict t₁ < t₂ pairs. One
    * definition, used by the test AND the correlation — the published
    * pairing holds by construction, not by parallel maintenance. */
  private def kendallSFrame(pts: DataFrame): DataFrame = {
    Budget.orderedPairs(pts, "t")
      .select(col("g"),
        when(col("v2") > col("v1"), 1L)
          .when(col("v2") < col("v1"), -1L).otherwise(0L).as("sgn"))
      .groupBy(col("g")).agg(sum(col("sgn")).as("s"))
  }

  private def mannKendallOn(pts0: DataFrame): DataFrame = {
    val pts = pts0.select(col("g"), col("t"), col("i"), col("v"))
    val s = kendallSFrame(pts)
    val n = pts.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val ties = pts.groupBy(col("g"), col("v")).agg(count(lit(1)).as("tc"))
      .groupBy(col("g"))
      .agg(sum(col("tc") * (col("tc") - 1L) * (lit(2L) * col("tc") + 5L))
        .as("tcorr"))
    val varNum = col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L) -
      col("tcorr")
    val sigma = sqrt(varNum.cast("double") / 18.0)
    s.join(n, Seq("g")).join(ties, Seq("g"))
      .withColumn("z", round(
        when(col("s") > 0, (col("s").cast("double") - 1.0) / sigma)
          .when(col("s") < 0, (col("s").cast("double") + 1.0) / sigma)
          .otherwise(0.0), 6))
      .withColumn("p", expr(pTwoSidedSql("z")))
      .select(col("g"), col("n"), col("s"), col("z"), col("p"))
  }

  /** Two-regressor least squares with intercept: y on (1, x2, x3),
    * solved in closed form from exact decimal moments via Cramer's rule
    * on the 3×3 normal equations (the builtin regr_* family is
    * single-feature). Determinants, coefficients and R² are each ONE
    * fixed-order IEEE expression over the exact moments — no iterative
    * solver, no residual pass; ONE scalar-aggregate exchange and a
    * 1-row model regardless of input size.
    * Output: (n, b0, b1, b2, r2), coefficients round@9. */
  def ols2(df: DataFrame, x2Col: String, x3Col: String, yCol: String): DataFrame = {
    // spread: ten decimal accumulators per row, single fixture scan task
    // otherwise (guide §2.5; graft.Tables.spread scaladoc)
    val src = graft.Tables.spread(
      df.select(
        col(x2Col).cast("double").as("x2"),
        col(x3Col).cast("double").as("x3"),
        col(yCol).cast("double").as("y")),
      col("x2"), col("x3"), col("y"))
    val m = src.agg(
      count(lit(1)).cast("double").as("n"),
      Det.dsum(col("x2")).as("s2"), Det.dsum(col("x3")).as("s3"),
      Det.dsum(col("x2") * col("x2")).as("s22"),
      Det.dsum(col("x2") * col("x3")).as("s23"),
      Det.dsum(col("x3") * col("x3")).as("s33"),
      Det.dsum(col("y")).as("sy"),
      Det.dsum(col("x2") * col("y")).as("s2y"),
      Det.dsum(col("x3") * col("y")).as("s3y"),
      Det.dsum(col("y") * col("y")).as("syy"))
    def c(s: String): Column = col(s)
    val det = c("n") * (c("s22") * c("s33") - c("s23") * c("s23")) -
      c("s2") * (c("s2") * c("s33") - c("s23") * c("s3")) +
      c("s3") * (c("s2") * c("s23") - c("s22") * c("s3"))
    val det1 = c("sy") * (c("s22") * c("s33") - c("s23") * c("s23")) -
      c("s2") * (c("s2y") * c("s33") - c("s23") * c("s3y")) +
      c("s3") * (c("s2y") * c("s23") - c("s22") * c("s3y"))
    val det2 = c("n") * (c("s2y") * c("s33") - c("s23") * c("s3y")) -
      c("sy") * (c("s2") * c("s33") - c("s23") * c("s3")) +
      c("s3") * (c("s2") * c("s3y") - c("s2y") * c("s3"))
    val det3 = c("n") * (c("s22") * c("s3y") - c("s2y") * c("s23")) -
      c("s2") * (c("s2") * c("s3y") - c("s2y") * c("s3")) +
      c("sy") * (c("s2") * c("s23") - c("s22") * c("s3"))
    val b0 = det1 / det
    val b1 = det2 / det
    val b2 = det3 / det
    val sse = c("syy") -
      lit(2.0) * (b0 * c("sy") + b1 * c("s2y") + b2 * c("s3y")) +
      (b0 * b0 * c("n") + b1 * b1 * c("s22") + b2 * b2 * c("s33") +
        lit(2.0) * b0 * b1 * c("s2") + lit(2.0) * b0 * b2 * c("s3") +
        lit(2.0) * b1 * b2 * c("s23"))
    val sst = c("syy") - c("sy") * c("sy") / c("n")
    m.select(c("n").cast("long").as("n"),
      round(b0, 9).as("b0"), round(b1, 9).as("b1"), round(b2, 9).as("b2"),
      round(lit(1.0) - sse / sst, 9).as("r2"))
  }

  /** Ridge (Tikhonov) regression on the SAME exact-moment normal
    * equations as [[ols2]], with the penalty λ added to the slope
    * diagonal only — the matrix is X'X + λ·diag(0, 1, 1), the standard
    * formulation that leaves the intercept unpenalized (penalizing it
    * would make the fit depend on the y origin). λ = 0 reproduces
    * [[ols2]] bit-for-bit (same expression tree, same operand order);
    * λ → ∞ shrinks both slopes to 0 and the intercept to ȳ. One
    * scalar-aggregate exchange, Cramer closed form — no iterative
    * solver, no extra pass over the data vs OLS, which is the point:
    * regularization at 100 TB costs nothing beyond the moments you
    * already have. R² is reported for the penalized coefficients (it
    * can only be ≤ the OLS R²; at large λ it approaches 0). λ is a raw
    * (unscaled) penalty — callers wanting the per-row convention pass
    * λ·n themselves. */
  def ridge2(df: DataFrame, x2Col: String, x3Col: String, yCol: String,
      lambda: Double): DataFrame = {
    // spread: ten decimal accumulators per row, single fixture scan task
    // otherwise (guide §2.5; graft.Tables.spread scaladoc)
    val src = graft.Tables.spread(
      df.select(
        col(x2Col).cast("double").as("x2"),
        col(x3Col).cast("double").as("x3"),
        col(yCol).cast("double").as("y")),
      col("x2"), col("x3"), col("y"))
    val m = src.agg(
      count(lit(1)).cast("double").as("n"),
      Det.dsum(col("x2")).as("s2"), Det.dsum(col("x3")).as("s3"),
      Det.dsum(col("x2") * col("x2")).as("s22"),
      Det.dsum(col("x2") * col("x3")).as("s23"),
      Det.dsum(col("x3") * col("x3")).as("s33"),
      Det.dsum(col("y")).as("sy"),
      Det.dsum(col("x2") * col("y")).as("s2y"),
      Det.dsum(col("x3") * col("y")).as("s3y"),
      Det.dsum(col("y") * col("y")).as("syy"))
    def c(s: String): Column = col(s)
    // the ONLY delta vs ols2: the penalized slope diagonal
    val p22 = c("s22") + lit(lambda)
    val p33 = c("s33") + lit(lambda)
    val det = c("n") * (p22 * p33 - c("s23") * c("s23")) -
      c("s2") * (c("s2") * p33 - c("s23") * c("s3")) +
      c("s3") * (c("s2") * c("s23") - p22 * c("s3"))
    val det1 = c("sy") * (p22 * p33 - c("s23") * c("s23")) -
      c("s2") * (c("s2y") * p33 - c("s23") * c("s3y")) +
      c("s3") * (c("s2y") * c("s23") - p22 * c("s3y"))
    val det2 = c("n") * (c("s2y") * p33 - c("s23") * c("s3y")) -
      c("sy") * (c("s2") * p33 - c("s23") * c("s3")) +
      c("s3") * (c("s2") * c("s3y") - c("s2y") * c("s3"))
    val det3 = c("n") * (p22 * c("s3y") - c("s2y") * c("s23")) -
      c("s2") * (c("s2") * c("s3y") - c("s2y") * c("s3")) +
      c("sy") * (c("s2") * c("s23") - p22 * c("s3"))
    val b0 = det1 / det
    val b1 = det2 / det
    val b2 = det3 / det
    // SSE of the PENALIZED coefficients against the raw (unpenalized)
    // moments — the fit quality a user of the shrunk model actually gets
    val sse = c("syy") -
      lit(2.0) * (b0 * c("sy") + b1 * c("s2y") + b2 * c("s3y")) +
      (b0 * b0 * c("n") + b1 * b1 * c("s22") + b2 * b2 * c("s33") +
        lit(2.0) * b0 * b1 * c("s2") + lit(2.0) * b0 * b2 * c("s3") +
        lit(2.0) * b1 * b2 * c("s23"))
    val sst = c("syy") - c("sy") * c("sy") / c("n")
    m.select(c("n").cast("long").as("n"),
      round(b0, 9).as("b0"), round(b1, 9).as("b1"), round(b2, 9).as("b2"),
      round(lit(1.0) - sse / sst, 9).as("r2"))
  }

  /** AUC by the exact rank-sum identity (AUC = U/(n₁·n₀) — the
    * Mann–Whitney connection), NOT trapezoid-integrating an ROC curve:
    * over per-score counts, U×2 = Σ_scores c₁·(2·cumNeg_below + c₀)
    * counts ties at half, all in exact longs; ONE division at the end
    * (round@9). Input: (scoreCol: long-or-orderable, labelCol: 1/0
    * long). The distinct-score cumsum window is score-cardinality-
    * bounded (the KM/MW small-frame convention). All-tied scores give
    * exactly 0.5; perfect separation exactly 1.0. */
  def aucRankSum(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val vc = df
      .groupBy(col(scoreCol).as("__s"))
      .agg(sum(col(labelCol)).as("c1"),
        sum(lit(1L) - col(labelCol)).as("c0"))
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    vc.withColumn("cum0", sum(col("c0")).over(w))
      .agg(sum(col("c1")).as("n_pos"), sum(col("c0")).as("n_neg"),
        sum(col("c1") * (lit(2L) * (col("cum0") - col("c0")) + col("c0")))
          .as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        round(col("u2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double")), 9).as("auc"))
  }

  /** Cramér's V (and Pearson's contingency coefficient) — the EFFECT
    * SIZE companion to [[chiSquared]]: X² grows linearly with n, so at
    * 100 TB every association is "significant"; V = √(X²/(n·min(r−1,
    * c−1))) ∈ [0,1] is what actually says whether the association is
    * big. Same dense-grid cell terms as chiSquared (exact long X²
    * sum); V and CC are one rounded IEEE expression each (round@6). */
  def cramersV(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val o = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o"))
    val rt = o.groupBy(col("r")).agg(sum(col("o")).as("rtot"))
    val ct = o.groupBy(col("c")).agg(sum(col("o")).as("ctot"))
    val n1 = o.agg(sum(col("o")).as("ntot"))
    val e = col("rtot").cast("double") * col("ctot").cast("double") /
      col("ntot").cast("double")
    val oD = coalesce(col("o"), lit(0L)).cast("double")
    val cell9 = round((oD - e) * (oD - e) / e * 1e9, 0).cast("long")
    // marginal cardinalities from the (already tiny) marginal frames —
    // NOT countDistinct in the cell aggregate, which would plan an
    // Expand over the grid
    val dims = broadcast(rt.agg(count(lit(1)).as("r_cats")))
      .crossJoin(broadcast(ct.agg(count(lit(1)).as("c_cats"))))
    val agg = broadcast(rt).crossJoin(broadcast(ct))
      .join(o, Seq("r", "c"), "left")
      .crossJoin(broadcast(n1))
      .select(cell9.as("__c9"), col("ntot"))
      .agg(sum(col("__c9")).as("x2_9"), max(col("ntot")).as("n"))
      .crossJoin(dims)
    val x2 = col("x2_9").cast("double") / 1e9
    val nD = col("n").cast("double")
    val minDim = least(col("r_cats") - 1, col("c_cats") - 1).cast("double")
    agg.select(col("x2_9"), col("n"), col("r_cats"), col("c_cats"),
      round(sqrt(x2 / (nD * minDim)), 6).as("v"),
      round(sqrt(x2 / (x2 + nD)), 6).as("cc"))
  }

  /** Isotonic regression (PAVA fit) of the bucket means per key, via
    * the MINIMAX closed form: fitted(i) = max_{j≤i} min_{k≥i}
    * weightedMean(y over buckets j..k) — provably equal to the
    * pool-adjacent-violators output (Barlow et al. 1972), and unlike
    * the sequential PAVA sweep it is expressible as pure dataframe
    * algebra: prefix sums → a per-key pair frame → one suffix-min
    * window → one max aggregate. The use case is monotone calibration:
    * "metric never decreases over time/score" fitted exactly.
    *
    * Exactness contract: interval means derive from EXACT decimal
    * prefix-sum differences divided by integer counts — both engines
    * produce bit-identical doubles, so the min/max lattice resolves
    * identically and only the OUTPUT is rounded (round@9).
    *
    * Scale shape: callers bucket x first (that is the `xCol` contract —
    * a day/hour bucket, not a raw timestamp), so the pair frame is
    * B²-bounded PER KEY for B buckets — the q62 basket-bounded
    * self-join precedent, never corpus×corpus. One key exchange feeds
    * the prefix window; the pair join is key-equi with the j ≤ k
    * residual; the suffix-min window rides the pair frame's (key, j)
    * partitioning. */
  def isotonic(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val b = df.filter(col(yCol).isNotNull)
      .groupBy(col(keyCol).as("k"), col(xCol).cast("long").as("x"))
      .agg(sum(graft.Det.dec(col(yCol))).as("s"), count(lit(1)).as("c"))
    val w = Window.partitionBy(col("k")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // NOTE: running-sum columns must not differ from s/c by case only —
    // Spark resolves column names case-insensitively, so withColumn("S")
    // would silently REPLACE "s"
    val pre = b
      .withColumn("rs", sum(col("s")).over(w))
      .withColumn("rc", sum(col("c")).over(w))
      .withColumn("ps", col("rs") - col("s"))
      .withColumn("pc", col("rc") - col("c"))
    val j = pre.select(col("k"), col("x").as("xj"),
      col("ps").as("sp"), col("pc").as("cp"))
    val kk = pre.select(col("k"), col("x").as("xk"),
      col("rs").as("sk"), col("rc").as("ck"))
    val pairs = j.join(kk, Seq("k")).filter(col("xj") <= col("xk"))
      .withColumn("mean",
        (col("sk") - col("sp")).cast("double") /
          (col("ck") - col("cp")).cast("double"))
    val sufMin = Window.partitionBy(col("k"), col("xj"))
      .orderBy(col("xk").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    pairs.withColumn("m", min(col("mean")).over(sufMin))
      .groupBy(col("k"), col("xk"))
      .agg(max(col("m")).as("fitRaw"))
      .join(pre.select(col("k"), col("x").as("xk"), col("c"),
        (col("s").cast("double") / col("c").cast("double")).as("rawMean")),
        Seq("k", "xk"))
      .select(col("k").as(keyCol), col("xk").as("x"), col("c").as("n"),
        round(col("rawMean"), 9).as("y_mean"),
        round(col("fitRaw"), 9).as("y_fit"))
  }

  /** Chi-squared homogeneity over the (rowCol × colCol) contingency
    * table: X² = Σ (O−E)²/E with E = rowTot·colTot/N, over the DENSE
    * grid (an unobserved cell still contributes its E). Observed counts
    * are exact; each cell term is ONE rounded IEEE expression scaled to
    * a long (round@9 — the text_pmi pattern), so the cross-cell sum is
    * exact. Returns 1 row: (x2_9 = X²·1e9 as a long, dof, n). The grid
    * is marginal-bounded (#rows × #cols — both broadcast-sized for any
    * sane contingency table). */
  def chiSquared(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val o = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o"))
    val rt = o.groupBy(col("r")).agg(sum(col("o")).as("rtot"))
    val ct = o.groupBy(col("c")).agg(sum(col("o")).as("ctot"))
    val n1 = o.agg(sum(col("o")).as("ntot"))
    val e = col("rtot").cast("double") * col("ctot").cast("double") /
      col("ntot").cast("double")
    val oD = coalesce(col("o"), lit(0L)).cast("double")
    val cell9 = round((oD - e) * (oD - e) / e * 1e9, 0).cast("long")
    broadcast(rt).crossJoin(broadcast(ct))
      .join(o, Seq("r", "c"), "left")
      .crossJoin(broadcast(n1))
      .select(cell9.as("__c9"), col("r"), col("c"), col("ntot"))
      .agg(sum(col("__c9")).as("x2_9"),
        ((countDistinct(col("r")) - 1) * (countDistinct(col("c")) - 1)).as("dof"),
        max(col("ntot")).as("n"))
  }

  /** G-test (likelihood-ratio) of independence over the SAME contingency
    * table as [[chiSquared]]: G = 2·Σ O·ln(O/E). Unlike Pearson's X²,
    * the statistic needs NO dense grid — an absent cell (O = 0)
    * contributes exactly 0 in the limit, so only OBSERVED cells flow
    * (at 100 TB a sparse high-cardinality table never materializes the
    * r×c grid this way). Each cell term O·ln(O/E) is one fixed-order
    * IEEE expression rounded@9 to a scaled long (the [[mutualInfo]]
    * log-term convention), summed exactly; marginal cardinalities come
    * from the already-aggregated marginal frames, never a countDistinct
    * beside the cell sum (the q73 Expand lesson).
    * Output: 1 row (n, dof, g_stat round@6). */
  def gTest(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val o = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o"))
    val rt = o.groupBy(col("r")).agg(sum(col("o")).as("rtot"))
    val ct = o.groupBy(col("c")).agg(sum(col("o")).as("ctot"))
    val n1 = o.agg(sum(col("o")).as("ntot"))
    val rk = rt.agg(count(lit(1)).as("r_card"))
    val ck = ct.agg(count(lit(1)).as("c_card"))
    val e = col("rtot").cast("double") * col("ctot").cast("double") /
      col("ntot").cast("double")
    val t9 = round(col("o").cast("double") *
      log(col("o").cast("double") / e) * 1e9, 0).cast("long")
    // ungrouped aggregate: ONE row even on an empty table (NULL n/g9),
    // the oracle's FROM sg, nn, rk, ck cardinality
    o.join(broadcast(rt), Seq("r")).join(broadcast(ct), Seq("c"))
      .crossJoin(broadcast(n1))
      .select(t9.as("__t9"), col("ntot"))
      .agg(max(col("ntot")).as("ntot"), sum(col("__t9")).as("g9"))
      .crossJoin(broadcast(rk)).crossJoin(broadcast(ck))
      .select(col("ntot").as("n"),
        ((col("r_card") - 1) * (col("c_card") - 1)).as("dof"),
        round(col("g9").cast("double") * 2.0 / 1e9, 6).as("g_stat"))
  }

  /** Kruskal–Wallis H — the k-group rank ANOVA ([[mannWhitney]]'s
    * extension past two groups; Kruskal & Wallis 1952). Ranks are
    * midranks over the distinct-VALUE frame: per distinct value the
    * ×2-scaled midrank 2·(count below) + (count at) + 1 is an exact
    * long, so per-group rank sums are integer-exact and no data row is
    * ever globally sorted (the [[mannWhitney]]/KS bounded-frame
    * convention — the lone unpartitioned window runs over distinct
    * values, which the 2-decimal event measure bounds at any corpus
    * size). H = 12/(N(N+1))·Σ n_g(r̄_g − r̄)² from per-group terms that
    * are one fixed-order IEEE expression each, rounded to 1e6-scaled
    * decimal(38,0) (magnitudes reach ~1e21 at sf1 — past long range,
    * inside decimal exactly) and summed exactly; the tie correction
    * C = 1 − Σ(t³−t)/(N³−N) divides once at the end.
    * Output: one row per group (g, n_g, r2sum, mean_rank round@9) with
    * the global h / h_corr round@6 on every row. */
  /** First-order partial correlation r_xy·z — the association between
    * x and y with a CONFOUNDER z held fixed (the question a raw
    * Pearson cannot answer: a strong r_xy may be entirely z's doing):
    * r_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²)), with
    * t = r·√((n−3)/(1−r²)) on n−3 df. ONE scalar-aggregate exchange
    * (ten exact decimal moments, the [[ols2]] shape); each pairwise
    * Pearson is one fixed-order IEEE expression ROUND@9 before
    * composing (the q59 artifact convention — the partial and t read
    * from the rounded artifacts on both engines), partial round@6,
    * t round@6, shared-text p. Degenerates (any zero variance,
    * |r_xz| or |r_yz| = 1, n ≤ 3, |partial| = 1) → NULL.
    * Output: 1 row (n, r_xy, r_xz, r_yz, partial_r, t, p). */
  def partialCorr(df: DataFrame, xCol: String, yCol: String,
      zCol: String): DataFrame = {
    // spread: ten exact-decimal accumulators per row on the fixture's
    // single scan task otherwise (guide §2.5; graft.Tables.spread
    // scaladoc); decimal sums are order-independent, so the partitioning
    // cannot move the result
    val src = graft.Tables.spread(
      df.filter(col(xCol).isNotNull && col(yCol).isNotNull &&
          col(zCol).isNotNull)
        .select(col(xCol).cast("double").as("x"),
          col(yCol).cast("double").as("y"), col(zCol).cast("double").as("z")),
      col("x"), col("y"), col("z"))
    val m = src.agg(
      count(lit(1)).cast("double").as("n"),
      Det.dsum(col("x")).as("sx"), Det.dsum(col("y")).as("sy"),
      Det.dsum(col("z")).as("sz"),
      Det.dsum(col("x") * col("x")).as("sxx"),
      Det.dsum(col("y") * col("y")).as("syy"),
      Det.dsum(col("z") * col("z")).as("szz"),
      Det.dsum(col("x") * col("y")).as("sxy"),
      Det.dsum(col("x") * col("z")).as("sxz"),
      Det.dsum(col("y") * col("z")).as("syz"))
    val n = col("n")
    def vr(ss: String, s: String) = n * col(ss) - col(s) * col(s)
    def r(sab: String, sa: String, sb: String, va: Column,
        vb: Column): Column =
      when(va > 0.0 && vb > 0.0,
        round((n * col(sab) - col(sa) * col(sb)) / sqrt(va * vb), 9))
    val vx = vr("sxx", "sx"); val vy = vr("syy", "sy")
    val vz = vr("szz", "sz")
    val withR = m
      .withColumn("r_xy", r("sxy", "sx", "sy", vx, vy))
      .withColumn("r_xz", r("sxz", "sx", "sz", vx, vz))
      .withColumn("r_yz", r("syz", "sy", "sz", vy, vz))
    val pDen = (lit(1.0) - col("r_xz") * col("r_xz")) *
      (lit(1.0) - col("r_yz") * col("r_yz"))
    val withP = withR.withColumn("partial_r",
      when(pDen > 0.0,
        round((col("r_xy") - col("r_xz") * col("r_yz")) / sqrt(pDen), 6)))
    val tDen = lit(1.0) - col("partial_r") * col("partial_r")
    withP
      .withColumn("t_stat",
        when(n > 3.0 && tDen > 0.0,
          round(col("partial_r") * sqrt((n - 3.0) / tDen), 6)))
      .withColumn("p", expr(pTwoSidedSql("t_stat")))
      .select(n.cast("long").as("n"), col("r_xy"), col("r_xz"),
        col("r_yz"), col("partial_r"), col("t_stat"), col("p"))
  }

  /** Jonckheere–Terpstra ordered-alternative k-sample test — the
    * ordered-dose version of [[kruskalWallis]] (KW asks "any
    * difference"; JT asks "does the value DISTRIBUTION trend with the
    * ordered dose" — the value-level sibling of the Cochran–Armitage
    * proportion trend): J = Σ_{i<j} U_ij over ordered dose pairs,
    * each U the Mann–Whitney count with the ½-tie convention. The
    * engine carries 2J so ties stay integer: per pooled distinct
    * value, 2J += Σ_{i<j} (2·cumlt_i·c_j + c_i·c_j) over the per-dose
    * count columns — the q56/q58 distinct-value-frame shape, no row
    * ever sorts globally. Normal approximation with the FULL
    * tie-corrected variance (Kendall's three-term form):
    * Var = A/72 + B/(36N(N−1)(N−2)) + C/(8N(N−1)) with
    * A = N(N−1)(2N+5) − Σn(n−1)(2n+5) − Σt(t−1)(2t+5),
    * B = Σn(n−1)(n−2)·Σt(t−1)(t−2), C = Σn(n−1)·Σt(t−1) — every
    * component an exact decimal(38,0)/HUGEINT integer, z ONE
    * fixed-order IEEE expression round@6, shared-text p. `doses` is
    * the ordered, small, known dose domain (the q107 bounded-k
    * contract); rows outside it drop. N ≤ 2 or zero variance → NULL.
    * Output: 1 row (n, j2, z, p). */
  def jonckheereTerpstra(df: DataFrame, doseCol: String, valCol: String,
      doses: Seq[Int]): DataFrame = {
    require(doses.nonEmpty && doses == doses.sorted && doses.distinct == doses,
      s"doses must be a sorted distinct domain, got $doses")
    def dec(c: Column) = c.cast("decimal(38,0)")
    val src = df.filter(col(valCol).isNotNull &&
        col(doseCol).isin(doses.map(Integer.valueOf): _*))
      .select(col(doseCol).cast("int").as("g"),
        col(valCol).cast("double").as("v"))
    val vc = src.groupBy(col("v")).agg(
      count(when(col("g") === doses.head, 1)).as(s"c${doses.head}"),
      doses.tail.map(d =>
        count(when(col("g") === d, 1)).as(s"c$d")): _*)
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cums = doses.foldLeft(vc) { (f, d) =>
      f.withColumn(s"cum$d",
        coalesce(sum(col(s"c$d")).over(w), lit(0L)))
    }
    val pairTerms = for {
      (i, ix) <- doses.zipWithIndex; j <- doses.drop(ix + 1)
    } yield dec(lit(2L)) * dec(col(s"cum$i")) * dec(col(s"c$j")) +
      dec(col(s"c$i")) * dec(col(s"c$j"))
    val tieC = doses.map(d => col(s"c$d")).reduce(_ + _)
    val rowAgg = cums.select(
      pairTerms.reduce(_ + _).as("__j2v"),
      dec(tieC * (tieC - 1L) * (lit(2L) * tieC + 5L)).as("__t1"),
      dec(tieC * (tieC - 1L) * (tieC - 2L)).as("__t2"),
      dec(tieC * (tieC - 1L)).as("__t3"))
      .agg(sum(col("__j2v")).as("j2"), sum(col("__t1")).as("st1"),
        sum(col("__t2")).as("st2"), sum(col("__t3")).as("st3"))
    val perDose = src.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("nn"),
        sum(dec(col("n")) * dec(col("n"))).as("sq"),
        sum(dec(col("n")) * dec(col("n") - 1L) *
          dec(lit(2L) * col("n") + 5L)).as("sn1"),
        sum(dec(col("n")) * dec(col("n") - 1L) * dec(col("n") - 2L))
          .as("sn2"),
        sum(dec(col("n")) * dec(col("n") - 1L)).as("sn3"))
    val m = rowAgg.crossJoin(broadcast(perDose))
    def dd(c: Column) = c.cast("double")
    val nD = dec(col("nn"))
    val aTerm = nD * (nD - dec(lit(1))) * (dec(lit(2)) * nD + dec(lit(5))) -
      col("sn1") - col("st1")
    val varJ = dd(aTerm) / 72.0 +
      dd(col("sn2") * col("st2")) /
        (lit(36.0) * dd(nD * (nD - dec(lit(1))) * (nD - dec(lit(2))))) +
      dd(col("sn3") * col("st3")) /
        (lit(8.0) * dd(nD * (nD - dec(lit(1)))))
    val mean2 = dd(nD * nD - col("sq")) / 2.0
    val ok = col("nn") > 2L && varJ > 0.0
    m.select(col("nn").as("n"), col("j2").cast("long").as("j2"),
        when(ok, round((dd(col("j2")) - mean2) / (lit(2.0) * sqrt(varJ)), 6))
          .as("z"))
      .withColumn("p", when(col("z").isNotNull,
        expr(pTwoSidedSql("z"))))
  }

  def kruskalWallis(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val gv = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val vt = gv.groupBy(col("v")).agg(sum(col("c")).as("ct"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val rk = vt
      .withColumn("cb", coalesce(sum(col("ct")).over(w), lit(0L)))
      .select(col("v"),
        (lit(2L) * col("cb") + col("ct") + lit(1L)).as("r2"))
    val gr = gv.join(rk, Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("c") * col("r2")).as("r2sum"), sum(col("c")).as("n_g"))
    val tot = gr.agg(sum(col("n_g")).as("n_tot"), count(lit(1)).as("k"))
    // ct³ and N³ wrap a long past ~2^21 rows (ANSI exception, not a
    // wrong answer) — the tie fold and its guard run in decimal(38,0)
    val tie = vt.agg(
      sum(col("ct").cast("decimal(38,0)") * col("ct") * col("ct") -
        col("ct")).as("tsum"))
    val nD = col("n_tot").cast("double")
    val rbar = col("r2sum").cast("double") / (col("n_g").cast("double") * 2.0)
    val dev = rbar - (nD + 1.0) / 2.0
    val t6 = round(col("n_g").cast("double") * dev * dev * 1e6, 0)
      .cast("decimal(38,0)")
    val s = gr.crossJoin(broadcast(tot))
      .select(t6.as("__t6"))
      .agg(sum(col("__t6")).cast("double").as("s6"))
    val h = lit(12.0) / (nD * (nD + 1.0)) * (col("s6") / 1e6)
    val corr = lit(1.0) - col("tsum").cast("double") / (nD * nD * nD - nD)
    // every value tied (tsum = N³−N) zeroes the correction: H is 0 there
    // and h_corr is 0/0 — NULL by the integer-exact guard, not NaN
    val nTotDec = col("n_tot").cast("decimal(38,0)")
    val corrOk = col("tsum") < nTotDec * nTotDec * nTotDec - nTotDec
    gr.crossJoin(broadcast(tot)).crossJoin(broadcast(s))
      .crossJoin(broadcast(tie))
      .select(col("g"), col("n_g"), col("r2sum"),
        round(rbar, 9).as("mean_rank"),
        round(h, 6).as("h"),
        when(corrOk, round(h / corr, 6)).as("h_corr"))
  }

  /** Friedman test — the REPEATED-MEASURES rank ANOVA: k conditions
    * observed on the SAME blocks (users), ranked WITHIN each block, so
    * between-block level differences cancel entirely ([[kruskalWallis]]
    * pools across groups and would read block effects as treatment
    * effects). Only COMPLETE blocks participate (a block missing a
    * condition has no k-ranking — the classical requirement, enforced
    * against the global condition count). Midranks are ×2-scaled exact
    * longs from min-rank + tie counts (the [[kruskalWallis]] integer
    * convention, per block); χ²_F = 12/(nk(k+1))·ΣR²ⱼ − 3n(k+1) with
    * per-condition terms as rounded-scaled decimal(38,0) sums, and the
    * tie correction C = 1 − Σ(t³−t)/(nk(k²−1)) divides once (all-tied
    * blocks everywhere → C = 0 → NULL by an integer-exact guard).
    * Scale shape: one (block, condition) aggregate, per-block rank
    * windows over ≤k-row partitions, a #conditions rollup.
    * Output: one row per condition (cond, r2sum, mean_rank round@9)
    * with n_blocks / k / chi2 / chi2_corr round@6 on every row. */
  /** The complete-block ×2-midrank frame [[friedman]] and [[pageL]]
    * share: per-cell Det.davg values, blocks restricted to the global
    * condition count, within-block ×2 midranks (r2 = 2·rank + ties −
    * 1). ONE definition — the kendallSFrame discipline. Returns
    * (ranked, kTot). */
  private def friedmanRanked(df: DataFrame, blockCol: String,
      condCol: String, valCol: String): (DataFrame, DataFrame) = {
    val cell = df.filter(col(valCol).isNotNull)
      .groupBy(col(blockCol).as("b"), col(condCol).as("cond"))
      .agg(Det.davg(col(valCol).cast("double")).as("v"))
    val kTot = cell.select(col("cond")).distinct()
      .agg(count(lit(1)).as("k"))
    val complete = cell
      .withColumn("__bc",
        count(lit(1)).over(Window.partitionBy(col("b"))))
      .crossJoin(broadcast(kTot))
      .filter(col("__bc") === col("k"))
    val wb = Window.partitionBy(col("b")).orderBy(col("v"))
    val wbv = Window.partitionBy(col("b"), col("v"))
    val ranked = complete
      .withColumn("__mr", rank().over(wb))
      .withColumn("__tc", count(lit(1)).over(wbv))
      .withColumn("r2",
        lit(2L) * col("__mr") + col("__tc") - lit(1L))
    (ranked, kTot)
  }

  def friedman(df: DataFrame, blockCol: String, condCol: String,
      valCol: String): DataFrame = {
    val (ranked, kTot) = friedmanRanked(df, blockCol, condCol, valCol)
    val byCond = ranked.groupBy(col("cond"))
      .agg(sum(col("r2")).as("r2sum"), count(lit(1)).as("n_blocks"))
    val ties = ranked.groupBy(col("b"), col("v"))
      .agg(count(lit(1)).as("tc"))
      .agg(sum(col("tc") * col("tc") * col("tc") - col("tc")).as("tsum"))
    val nD = col("n_blocks").cast("double")
    val kD = col("k").cast("double")
    val t6 = round(col("r2sum").cast("double") / 2.0 *
      (col("r2sum").cast("double") / 2.0) * 1e6, 0).cast("decimal(38,0)")
    val s = byCond.crossJoin(broadcast(kTot))
      .select(t6.as("__t6"))
      .agg(sum(col("__t6")).cast("double").as("s6"))
    val chi = lit(12.0) / (nD * kD * (kD + 1.0)) * (col("s6") / 1e6) -
      lit(3.0) * nD * (kD + 1.0)
    // n·k·(k²−1) in decimal(38,0): block counts at 100 TB would wrap
    // a long under ANSI (the KW-guard convention)
    val corrDen = col("n_blocks").cast("decimal(38,0)") * col("k") *
      (col("k") * col("k") - lit(1L))
    val corr = lit(1.0) - col("tsum").cast("double") / corrDen.cast("double")
    val corrOk = col("tsum").cast("decimal(38,0)") < corrDen
    byCond.crossJoin(broadcast(kTot)).crossJoin(broadcast(s))
      .crossJoin(broadcast(ties))
      .select(col("cond"), col("n_blocks"), col("k"), col("r2sum"),
        round(col("r2sum").cast("double") / (nD * 2.0), 9).as("mean_rank"),
        round(chi, 6).as("chi2"),
        when(corrOk, round(chi / corr, 6)).as("chi2_corr"))
  }

  /** Page's L trend test for ORDERED repeated measures (Page 1963) —
    * [[friedman]]'s directional sibling, exactly as
    * [[jonckheereTerpstra]] is [[kruskalWallis]]'s: when the k
    * conditions carry a natural order, "does each block's value rank
    * TREND with it" beats "do they differ at all". L = Σ_j j·R_j over
    * condition order indices j = 1..k and within-block midrank sums
    * R_j — the SAME complete-block ×2-midrank frame as Friedman
    * ([[friedmanRanked]], one definition). The engine carries
    * 2L = Σ j·r2sum exactly; z = (2·L2 − b·k(k+1)²) / (4σ) with the
    * classical σ = √(b·k²(k+1)²(k−1)/144) — every component an exact
    * decimal integer, z one fixed-order IEEE expression round@6,
    * shared-text p (the classical no-tie variance; midrank ties make
    * the z mildly conservative — documented standard practice).
    * `condCol` must be numeric; its ascending order IS the dose
    * order. k < 3 → NULL (Page needs at least 3 ordered conditions).
    * Output: 1 row (n_blocks, k, l2, z, p). */
  def pageL(df: DataFrame, blockCol: String, condCol: String,
      valCol: String): DataFrame = {
    val (ranked, kTot) = friedmanRanked(df, blockCol, condCol, valCol)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val byCond = ranked.groupBy(col("cond"))
      .agg(sum(col("r2")).as("r2sum"), count(lit(1)).as("n_blocks"))
    val idx = row_number().over(Window.orderBy(col("cond")))
    val agg = byCond
      .withColumn("__j", idx.cast("long"))
      .agg(sum(dec(col("__j")) * dec(col("r2sum"))).as("l2"),
        max(col("n_blocks")).as("b"))
    val m = agg.crossJoin(broadcast(kTot))
    def dd(c: Column) = c.cast("double")
    val kD = dec(col("k"))
    val bD = dec(col("b"))
    val num = dec(lit(2)) * col("l2") -
      bD * kD * ((kD + dec(lit(1))) * (kD + dec(lit(1))))
    val varL = bD * (kD * kD) * ((kD + dec(lit(1))) * (kD + dec(lit(1)))) *
      (kD - dec(lit(1)))
    val ok = col("k") >= 3L && col("b") >= 1L
    m.select(col("b").as("n_blocks"), col("k"),
      col("l2").cast("long").as("l2"),
      when(ok, round(dd(num) / (lit(4.0) * sqrt(dd(varL) / 144.0)), 6))
        .as("z"))
      .withColumn("p", expr(pTwoSidedSql("z")))
  }

  /** Brown–Forsythe test for equality of group variances — Levene's
    * test with MEDIAN centering (Brown & Forsythe 1974), the robust
    * form the practice defaults to: z = |x − med_g| per row, then the
    * one-way ANOVA F on z. Group medians come from the distributed
    * rank-selection path ([[Quantiles.exactGrouped]], linear
    * interpolation — DuckDB `quantile_cont` parity proven by q27g) and
    * ride back as a #groups-row broadcast, so the data makes TWO narrow
    * passes total (median brackets, then z moments). Per-group F terms
    * (between: n_g(z̄_g − z̄)²; within: Σz² − (Σz)²/n_g) are each one
    * fixed-order IEEE expression over exact decimal z-moments, rounded
    * to 1e6-scaled decimal(38,0) and summed exactly.
    * Output: one row per group (g, n_g, med, z_mean round@9) with the
    * global f_bf round@6 / df1 / df2 on every row; degenerate inputs
    * (k < 2 or zero within-group spread) emit NULL f_bf. */
  def brownForsythe(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val base = df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
    val med = Quantiles.exactGrouped(base, "g", "v", Seq(0.5))
      .select(col("g"), col("q0").as("med"))
    val z = base.join(broadcast(med), Seq("g"))
      .select(col("g"), col("med"), abs(col("v") - col("med")).as("z"))
    val m = z.groupBy(col("g")).agg(
      count(lit(1)).as("n_g"), min(col("med")).as("med"),
      sum(Det.dec(col("z"))).as("szd"),
      sum(Det.dec(col("z") * col("z"))).as("szzd"))
    val tot = m.agg(sum(col("n_g")).as("n_tot"), count(lit(1)).as("k"),
      sum(col("szd")).cast("double").as("szall"))
    val nGD = col("n_g").cast("double")
    val zbarG = col("szd").cast("double") / nGD
    val zbar = col("szall") / col("n_tot").cast("double")
    val num6 = round(nGD * (zbarG - zbar) * (zbarG - zbar) * 1e6, 0)
      .cast("decimal(38,0)")
    val den6 = round((col("szzd").cast("double") -
      col("szd").cast("double") * col("szd").cast("double") / nGD) * 1e6, 0)
      .cast("decimal(38,0)")
    val s = m.crossJoin(broadcast(tot))
      .select(num6.as("__n6"), den6.as("__d6"))
      .agg(sum(col("__n6")).cast("double").as("sn"),
        sum(col("__d6")).cast("double").as("sd"))
    val kD = col("k").cast("double")
    val f = (col("n_tot").cast("double") - kD) / (kD - 1.0) *
      (col("sn") / col("sd"))
    val ok = col("k") > 1 && col("sd") > 0.0
    m.crossJoin(broadcast(tot)).crossJoin(broadcast(s))
      .select(col("g"), col("n_g"),
        round(col("med"), 9).as("med"),
        round(zbarG, 9).as("z_mean"),
        when(ok, round(f, 6)).as("f_bf"),
        (col("k") - 1L).as("df1"),
        (col("n_tot") - col("k")).as("df2"))
  }

  /** Durbin–Watson statistic per group: d = Σ(e_t − e_{t−1})² / Σe_t²
    * over residuals in a deterministic within-group time order — THE
    * serial-correlation diagnostic for a fitted regression (d ≈ 2 means
    * independent residuals; → 0 positive, → 4 negative autocorrelation;
    * an OLS R² is untrustworthy without it on time-ordered data).
    * Takes an already-computed residual column so any model composes
    * (the gate feeds q59's OLS artifact). ONE key-partitioned exchange
    * serves the lag window; both quadratic sums accumulate as exact
    * decimals ([[graft.Det]]) so the division happens once, round@6.
    * Ties left by `orderCols` are broken by the residual VALUE itself
    * as the final sort key: rows that still tie then carry equal
    * residuals, and equal residuals commute under Σ(e_t − e_{t−1})² —
    * so d is exactly order-invariant (and engine-independent) even when
    * the caller's key is not unique.
    *
    * Scale note: parallelism equals the GROUP count — the within-group
    * total order is the statistic itself, so one task sorts each
    * group's full series (the sf1 rehearsal measured 4.4× at 10× data
    * over 3 groups: sublinear in wall time, but the per-task series
    * grows linearly). At cluster scale pick a finer grouping (per
    * series-shard, per month) — d is a per-series diagnostic, not a
    * corpus aggregate, so finer keys are the natural usage, not a
    * workaround. */
  def durbinWatson(df: DataFrame, groupCol: String, orderCols: Seq[String],
      residCol: String): DataFrame =
    durbinWatsonKeys(
      df.withColumn("g", col(groupCol)), Seq("g"), orderCols, residCol)

  /** [[durbinWatson]] under a COMPOUND series key — the executable form
    * of its scale note: parallelism equals the group count because the
    * within-group total order IS the statistic, so at cluster scale the
    * caller picks a finer per-series key (per shard, per month) and
    * gets one bounded sort per series instead of one giant sort per
    * coarse group. Same contract otherwise: deterministic
    * `orderCols :+ residual` order (equal residuals commute under
    * Σ(Δe)², so d is order-invariant on non-unique keys), exact-decimal
    * quadratic sums, one division round@6. Output: groupCols ++
    * (n, dw). */
  def durbinWatsonKeys(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], residCol: String): DataFrame = {
    require(groupCols.nonEmpty, "durbinWatsonKeys needs group keys")
    require(orderCols.nonEmpty, "durbinWatson needs a time order")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map(col) :+ col("e"): _*)
    val l = df
      .select(groupCols.map(col) ++ orderCols.map(col) :+
        col(residCol).cast("double").as("e"): _*)
      .withColumn("de", col("e") - lag(col("e"), 1).over(w))
    l.groupBy(groupCols.map(col): _*).agg(
        count(lit(1)).as("n"),
        sum(Det.dec(col("de") * col("de"))).cast("double").as("__num"),
        sum(Det.dec(col("e") * col("e"))).cast("double").as("__den"))
      .select(groupCols.map(col) :+ col("n") :+
        round(col("__num") / col("__den"), 6).as("dw"): _*)
  }

  /** Kendall's τ-b on the budget-lottery points — the rank-CORRELATION
    * companion of [[mannKendallBudget]]'s significance test (the same
    * S = Σ sign pairs over the SAME sample, the published pairing):
    * τ-b = S / √((n₀−T_t)(n₀−T_v)) with n₀ = n(n−1)/2 and the tie sums
    * T = Σ t(t−1)/2 per axis, all exact longs until the one final
    * division (round@6). Pairs tied on t are excluded from S by the
    * strict t₁ < t₂ join and priced by T_t — exactly the τ-b
    * convention. Quadratic by definition ⇒ the same scale-adaptive
    * budget lottery as Theil–Sen bounds the pair frame at any scale
    * factor. Output: (g, n, s, tau_b). */
  def kendallTauBudget(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valCol: String, targetPoints: Int = 400): DataFrame =
    kendallTauOn(budgetPoints(df, groupCol, tsCol, idCol, valCol,
      targetPoints))

  /** Wald–Wolfowitz runs test per group: is the above/below-median sign
    * SEQUENCE random in time, or does it clump (regimes, level shifts)
    * / alternate (overcorrection)? The randomness check that needs no
    * distributional assumption at all — the natural partner of
    * [[durbinWatson]] (which sees only lag-1 linear correlation).
    * Values EQUAL to the group median drop (the classical convention);
    * runs count over the remaining sign sequence, R = 1 + #changes.
    * R/n1/n0 are exact longs; z uses the exact first two moments
    * μ = 2n₁n₀/n + 1, σ² = 2n₁n₀(2n₁n₀−n)/(n²(n−1)), one fixed-order
    * expression round@6 (degenerate n₁ = 0 or n₀ = 0 → NULL). The
    * median rides the [[Quantiles.exactGrouped]] broadcast (q79
    * pattern); ONE key-partitioned lag window over (tsCol, idCol) —
    * `idCol` must make the order total.
    * Output: per group (g, n1, n0, runs, z round@6). */
  def runsTest(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valCol: String): DataFrame = {
    val base = df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("g"), col(tsCol).as("t"), col(idCol).as("i"),
        col(valCol).cast("double").as("v"))
    val med = Quantiles.exactGrouped(base, "g", "v", Seq(0.5))
      .select(col("g"), col("q0").as("med"))
    val signs = base.join(broadcast(med), Seq("g"))
      .filter(col("v") =!= col("med"))
      .select(col("g"), col("t"), col("i"),
        when(col("v") > col("med"), 1L).otherwise(0L).as("s"))
    val w = Window.partitionBy(col("g")).orderBy(col("t"), col("i"))
    val r = signs
      .withColumn("chg",
        when(lag(col("s"), 1).over(w).isNull, 0L)
          .when(lag(col("s"), 1).over(w) =!= col("s"), 1L).otherwise(0L))
      .groupBy(col("g"))
      .agg(sum(col("s")).as("n1"),
        sum(lit(1L) - col("s")).as("n0"),
        (sum(col("chg")) + 1L).as("runs"))
    def d(c: Column) = c.cast("double")
    val n = d(col("n1")) + d(col("n0"))
    val p2 = lit(2.0) * d(col("n1")) * d(col("n0"))
    val mu = p2 / n + 1.0
    val sg = sqrt(p2 * (p2 - n) / (n * n * (n - 1.0)))
    // 2n1n0 = n collapses sigma to 0 (exactly the {1,1} and {0,k}
    // shapes) — NULL by an integer-exact guard, never Inf-vs-NULL;
    // the product runs in decimal(38,0) so it cannot wrap a long at
    // 100 TB group sizes (ANSI would throw, DuckDB would error)
    val ok = col("n1") > 0L && col("n0") > 0L &&
      (col("n1") + col("n0")) > 1L &&
      lit(2L).cast("decimal(38,0)") * col("n1") * col("n0") >
        (col("n1") + col("n0")).cast("decimal(38,0)")
    r.select(col("g"), col("n1"), col("n0"), col("runs"),
      when(ok, round((d(col("runs")) - mu) / sg, 6)).as("z"))
  }

  /** McNemar's test for PAIRED binary outcomes — the A/B primitive when
    * both conditions are observed on the SAME subject (did behavior
    * change between two exposures?), where [[twoProportion]]'s
    * independent-samples z is simply wrong. Only the DISCORDANT pairs
    * carry information: b = (yes, no), c = (no, yes);
    * χ² = (b−c)²/(b+c), and the Edwards continuity-corrected form
    * (|b−c|−1)²/(b+c) — both EXACT integer ratios until one division
    * (round@9; b + c = 0 → NULL). One subject rollup, one 2×2 count
    * aggregate; nothing else touches the data.
    * Output: 1 row (n_pairs, b, c, chi2, chi2_cc). */
  def mcNemar(df: DataFrame, subjectCol: String, firstCol: String,
      secondCol: String): DataFrame = {
    val p = df.groupBy(col(subjectCol).as("s"))
      .agg(max(col(firstCol).cast("long")).as("a1"),
        max(col(secondCol).cast("long")).as("a2"))
    val agg = p.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("a1") === 1L && col("a2") === 0L, 1L).otherwise(0L))
        .as("b"),
      sum(when(col("a1") === 0L && col("a2") === 1L, 1L).otherwise(0L))
        .as("c"))
    def d(c: Column) = c.cast("double")
    val diff = d(col("b")) - d(col("c"))
    val tot = d(col("b")) + d(col("c"))
    val cc = abs(d(col("b")) - d(col("c"))) - 1.0
    agg.select(col("n_pairs"), col("b"), col("c"),
      when(col("b") + col("c") > 0L, round(diff * diff / tot, 9)).as("chi2"),
      when(col("b") + col("c") > 0L, round(cc * cc / tot, 9)).as("chi2_cc"))
  }

  /** Cochran's Q for k MATCHED binary conditions on the SAME blocks —
    * the k-condition generalization of [[mcNemar]] (k = 2 reduces to
    * McNemar's uncorrected χ²) and the binary-outcome sibling of the
    * Friedman rank test: "does the success proportion differ across k
    * treatments applied to the same subjects", where a k-proportion
    * chi-squared would ignore the within-subject pairing entirely.
    * Computational form Q = (k−1)(k·ΣC_j² − N²)/(k·N − ΣR_i²) over
    * column totals C_j, row totals R_i and grand total N — all EXACT
    * integers; products run in decimal(38,0) (HUGEINT in the oracle,
    * the q89 guard convention) so nothing wraps at any block count;
    * one division round@6. Blocks absent under a condition count as 0
    * (the complete-by-construction convention — both engines derive
    * row/column totals from the observed 1s identically). Degenerate
    * corpora where every block is constant (all-0 or all-k rows:
    * k·N = ΣR_i²) emit NULL. Q ~ χ²_{k−1} under H₀.
    * Output: 1 row (n_blocks, k, n_success, q_stat). */
  def cochranQ(df: DataFrame, blockCol: String, condCol: String,
      xCol: String): DataFrame = {
    val x = df.groupBy(col(blockCol).as("b"), col(condCol).as("cnd"))
      .agg(max(col(xCol).cast("long")).as("x"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val kk = x.agg(countDistinct(col("cnd")).as("k"))
    val cj = x.groupBy(col("cnd")).agg(sum(col("x")).as("cjj"))
      .agg(sum(col("cjj")).as("nn"),
        sum(dec(col("cjj")) * dec(col("cjj"))).as("sc2"))
    val ri = x.groupBy(col("b")).agg(sum(col("x")).as("rii"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(dec(col("rii")) * dec(col("rii"))).as("sr2"))
    val j = cj.crossJoin(broadcast(ri)).crossJoin(broadcast(kk))
    val num = (dec(col("k")) - dec(lit(1))) *
      (dec(col("k")) * col("sc2") - dec(col("nn")) * dec(col("nn")))
    val den = dec(col("k")) * dec(col("nn")) - col("sr2")
    j.select(col("n_blocks"), col("k"), col("nn").as("n_success"),
      when(den > dec(lit(0)),
        round(num.cast("double") / den.cast("double"), 6)).as("q_stat"))
  }

  /** Two-sample Poisson RATE test, conditional (binomial) form — the
    * A/B primitive when the outcome is a COUNT over an EXPOSURE
    * (events per user-hour, errors per machine-day), where
    * [[twoProportion]]'s per-user binary collapses all intensity
    * information: under H₀ (equal rates), k₁ given K = k₁+k₂ is
    * Binomial(K, p) with p = t₁/(t₁+t₂) — the classical conditional
    * test that needs NO rate variance estimate, only exact counts and
    * exposures. z = (k₁ − K·p)/√(K·p(1−p)), round@6; degenerate
    * exposure splits (p ∉ (0,1)) or K = 0 emit NULL. Everything until
    * the p division is exact longs; rates per hour are one rounded
    * readout each. One group aggregate over (variant, count, exposure)
    * rows — callers roll up subjects first.
    * Output: ALWAYS exactly 1 row (k1, k2, t1_us, t2_us, rate1_h,
    * rate2_h, z) — a missing variant side (or an entirely empty input)
    * yields that row with the absent side's counts/exposure NULL and a
    * NULL z, never 0 rows (StatTestsSpec pins it; the oracle's
    * ungrouped-aggregate form has the same cardinality). */
  def poissonRate(df: DataFrame, variantCol: String, countCol: String,
      exposureUsCol: String): DataFrame = {
    // both sides as conditional sums of ONE ungrouped aggregate (the
    // hodgesLehmannBudget pattern): exactly one output row even when a
    // variant side is absent or the input is empty — the missing side's
    // sums are NULL, so its rate and z degrade to NULL instead of the
    // row vanishing (the r12 ADVICE finding: the old per-side filter +
    // crossJoin emptied the output when one side had no rows, against
    // the documented 1-row contract)
    val m = df.select(col(variantCol).cast("long").as("v"),
        col(countCol).cast("long").as("k"),
        col(exposureUsCol).cast("long").as("t"))
    val j = m.agg(
      sum(when(col("v") === 0L, col("k"))).as("k_a"),
      sum(when(col("v") === 0L, col("t"))).as("t_a"),
      sum(when(col("v") === 1L, col("k"))).as("k_b"),
      sum(when(col("v") === 1L, col("t"))).as("t_b"))
    def d(c: Column) = c.cast("double")
    val bigK = d(col("k_a")) + d(col("k_b"))
    val p = d(col("t_a")) / (d(col("t_a")) + d(col("t_b")))
    val z = (d(col("k_a")) - bigK * p) /
      sqrt(bigK * p * (lit(1.0) - p))
    val usPerHour = 3600000000L
    val ok = col("k_a") + col("k_b") > 0L &&
      col("t_a") > 0L && col("t_b") > 0L
    j.select(col("k_a").as("k1"), col("k_b").as("k2"),
      col("t_a").as("t1_us"), col("t_b").as("t2_us"),
      when(col("t_a") > 0L,
        round(d(col("k_a")) / (d(col("t_a")) / usPerHour.toDouble), 6))
        .as("rate1_h"),
      when(col("t_b") > 0L,
        round(d(col("k_b")) / (d(col("t_b")) / usPerHour.toDouble), 6))
        .as("rate2_h"),
      when(ok, round(z, 6)).as("z"))
  }

  /** The shared two-cohort moment aggregate behind [[cuped]] and
    * [[ratioMetric]]: per variant side (0 → "a", 1 → "b"), (n, Σx, Σy,
    * Σx², Σy², Σxy) as exact-decimal conditional sums in ONE ungrouped
    * aggregate — always exactly 1 output row, absent sides NULL (the
    * [[poissonRate]] cardinality pattern). Input columns: (v, x, y). */
  private def twoSidedMoments(m: DataFrame): DataFrame = {
    def sums(vv: Long, suffix: String) = Seq(
      sum(when(col("v") === vv, 1L)).as(s"n$suffix"),
      sum(when(col("v") === vv, Det.dec(col("x")))).cast("double").as(s"sx$suffix"),
      sum(when(col("v") === vv, Det.dec(col("y")))).cast("double").as(s"sy$suffix"),
      sum(when(col("v") === vv, Det.dec(col("x") * col("x")))).cast("double").as(s"sxx$suffix"),
      sum(when(col("v") === vv, Det.dec(col("y") * col("y")))).cast("double").as(s"syy$suffix"),
      sum(when(col("v") === vv, Det.dec(col("x") * col("y")))).cast("double").as(s"sxy$suffix"))
    val agg0 = sums(0L, "a") ++ sums(1L, "b")
    m.agg(agg0.head, agg0.tail: _*)
  }

  /** Wald SPRT trajectory for a Bernoulli outcome (Wald 1945): the
    * sequential test that lets an experiment STOP at the first moment
    * the evidence suffices instead of a fixed horizon. Per group, over
    * events in time order, the cumulative log-likelihood ratio
    * LLR_t = k_t·ln(p1/p0) + (n_t − k_t)·ln((1−p1)/(1−p0)) against
    * H0: rate = p0 vs H1: rate = p1, with the classical decision bands
    * A = ln((1−β)/α) (accept H1 above) and B = ln(β/(1−α)) (accept H0
    * below). Output per group: final n/k/LLR, the band constants, the
    * decision at the data's end, and the FIRST-crossing index and
    * decision — the "when could we have stopped" readout a fixed-
    * horizon z-test (q76) cannot give.
    *
    * Determinism: k_t/n_t are exact window counts over the caller's
    * total order; ln(p) terms are LITERAL doubles computed once on the
    * driver and folded in, so each LLR_t is one IEEE
    * multiply-add of exact longs round@9 — the crossing comparison runs
    * on the rounded value (the q66 threshold convention: an ulp can't
    * flip a decision across engines). One key-partitioned window (the
    * q20 cumulative shape) + one grouped aggregate; nothing global.
    * Scale note (the [[durbinWatson]] shape): parallelism equals the
    * COHORT count because the within-cohort event order IS the
    * trajectory — at cluster scale run per finer arm/segment keys, or
    * pre-aggregate to per-interval (k, n) increments and SPRT the
    * interval series (the trajectory only needs order, not row grain).
    * Output: (g, n, k, llr round@9, upper_a, lower_b round@9,
    * decision, first_cross_n, first_cross_decision). */
  def sprtBernoulli(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, successCol: String, p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.2): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      s"need distinct p0, p1 in (0,1), got $p0, $p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"need alpha, beta in (0,1), got $alpha, $beta")
    val lWin = math.log(p1 / p0)
    val lLose = math.log((1.0 - p1) / (1.0 - p0))
    val a = math.log((1.0 - beta) / alpha)
    val b = math.log(beta / (1.0 - alpha))
    val w = Window.partitionBy(col("g"))
      .orderBy(col("t"), col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.select(col(groupCol).as("g"), col(tsCol).as("t"),
        col(idCol).as("i"), col(successCol).cast("long").as("s"))
      .withColumn("k", sum(col("s")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("llr", round(col("k").cast("double") * lWin +
        (col("n") - col("k")).cast("double") * lLose, 9))
    val agg = base.groupBy(col("g")).agg(
      count(lit(1)).as("n"), sum(col("s")).as("k"),
      min(when(col("llr") >= a, col("n"))).as("__up_n"),
      min(when(col("llr") <= b, col("n"))).as("__dn_n"))
    val finalLlr = round(col("k").cast("double") * lWin +
      (col("n") - col("k")).cast("double") * lLose, 9)
    val firstN = least(col("__up_n"), col("__dn_n"))
    agg.select(col("g"), col("n"), col("k"),
      finalLlr.as("llr"),
      lit(BigDecimal(a).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).as("upper_a"),
      lit(BigDecimal(b).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).as("lower_b"),
      when(finalLlr >= a, "accept_h1").when(finalLlr <= b, "accept_h0")
        .otherwise("continue").as("decision"),
      firstN.as("first_cross_n"),
      when(firstN.isNull, "continue")
        .when(col("__up_n") <= coalesce(col("__dn_n"), lit(Long.MaxValue)),
          "accept_h1")
        .otherwise("accept_h0").as("first_cross_decision"))
  }

  /** [[sprtBernoulli]] over PRE-AGGREGATED interval increments — the
    * executable form of its scale note (the q81b precedent): each row
    * is one interval's (successes k, trials n) for a cohort, the
    * cumulative LLR is checked once per interval boundary, and the
    * trajectory needs only the INTERVAL order — so the per-cohort
    * window runs over #intervals rows (bounded: hours, days) instead
    * of every event, and the event stream itself reduces with an
    * ordinary map-side-combined aggregate. Coarsening can only delay a
    * crossing to the next boundary, never invent one (the LLR at a
    * boundary equals the row-level LLR at that same prefix — same
    * exact counts, same literal terms). `first_cross_n` reports the
    * cumulative TRIALS at the crossing boundary, comparable to the
    * row-level variant's. Output: identical schema to
    * [[sprtBernoulli]]. */
  def sprtIncrements(df: DataFrame, groupCol: String, orderCol: String,
      kCol: String, nCol: String, p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.2): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      s"need distinct p0, p1 in (0,1), got $p0, $p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"need alpha, beta in (0,1), got $alpha, $beta")
    val lWin = math.log(p1 / p0)
    val lLose = math.log((1.0 - p1) / (1.0 - p0))
    val a = math.log((1.0 - beta) / alpha)
    val b = math.log(beta / (1.0 - alpha))
    val w = Window.partitionBy(col("g")).orderBy(col("o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.select(col(groupCol).as("g"), col(orderCol).as("o"),
        col(kCol).cast("long").as("ik"), col(nCol).cast("long").as("in"))
      .withColumn("k", sum(col("ik")).over(w))
      .withColumn("n", sum(col("in")).over(w))
      .withColumn("llr", round(col("k").cast("double") * lWin +
        (col("n") - col("k")).cast("double") * lLose, 9))
    val agg = base.groupBy(col("g")).agg(
      sum(col("in")).as("n"), sum(col("ik")).as("k"),
      min(when(col("llr") >= a, col("n"))).as("__up_n"),
      min(when(col("llr") <= b, col("n"))).as("__dn_n"))
    val finalLlr = round(col("k").cast("double") * lWin +
      (col("n") - col("k")).cast("double") * lLose, 9)
    val firstN = least(col("__up_n"), col("__dn_n"))
    agg.select(col("g"), col("n"), col("k"),
      finalLlr.as("llr"),
      lit(BigDecimal(a).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).as("upper_a"),
      lit(BigDecimal(b).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).as("lower_b"),
      when(finalLlr >= a, "accept_h1").when(finalLlr <= b, "accept_h0")
        .otherwise("continue").as("decision"),
      firstN.as("first_cross_n"),
      when(firstN.isNull, "continue")
        .when(col("__up_n") <= coalesce(col("__dn_n"), lit(Long.MaxValue)),
          "accept_h1")
        .otherwise("accept_h0").as("first_cross_decision"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi, Walker — WSDM 2013):
    * adjust each unit's experiment metric y by its PRE-period covariate
    * x, y' = y − θ(x − x̄) with θ = cov(x,y)/var(x) pooled over all
    * units (randomization makes x independent of assignment, so the
    * adjustment is unbiased), shrinking metric variance by ρ² — the
    * single highest-leverage trick in industrial A/B testing: the same
    * experiment detects ~1/(1−ρ²)× smaller effects at equal traffic.
    *
    * Output: ALWAYS exactly 1 row (the [[poissonRate]] cardinality
    * contract) — (n_a, n_b, theta round@9, diff_raw, diff_adj, z_raw,
    * z_adj, var_reduction round@6), variant 0 minus variant 1. All
    * moments are exact decimal sums folded in ONE ungrouped
    * conditional-sum aggregate; θ is rounded@9 and the ROUNDED value
    * feeds every downstream expression (the q59 model-artifact
    * convention), each of which is one fixed-order IEEE tree the oracle
    * replays verbatim. Degenerates (a side with n < 2, zero covariate
    * variance, zero adjusted variance) → NULL z's, never Inf.
    * Callers roll up to one (variant, x, y) row per unit first. */
  def cuped(df: DataFrame, variantCol: String, xCol: String,
      yCol: String): DataFrame = {
    val m = df.select(col(variantCol).cast("long").as("v"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    val agg = twoSidedMoments(m)
    def d(c: Column) = c.cast("double")
    def nD(s: String) = d(col(s"n$s"))
    // pooled theta over ALL units: (N·Sxy − Sx·Sy) / (N·Sxx − Sx²)
    val nT = nD("a") + nD("b")
    val sxT = col("sxa") + col("sxb")
    val syT = col("sya") + col("syb")
    val sxxT = col("sxxa") + col("sxxb")
    val sxyT = col("sxya") + col("sxyb")
    // every division carries its own when-guard: under ANSI a double
    // division by zero THROWS in Spark where DuckDB yields NULL, and
    // when()'s predicate does not short-circuit vectorized evaluation —
    // so the guard must null the NUMERATOR expression, not just wrap
    // the final output (the q94 rate-guard convention)
    val thetaRaw = when((nT * sxxT - sxT * sxT) > 0.0,
      (nT * sxyT - sxT * syT) / (nT * sxxT - sxT * sxT))
    val okTheta = col("na") >= 2L && col("nb") >= 2L &&
      (nT * sxxT - sxT * sxT) > 0.0
    val theta = when(okTheta, round(thetaRaw, 9))
    def mean(s: String, c: String) =
      when(col(s"n$s") >= 1L, col(s"$c$s") / nD(s))
    def varOf(s: String, cc: String, c: String) = when(col(s"n$s") >= 2L,
      (col(s"$cc$s") - col(s"$c$s") * col(s"$c$s") / nD(s)) / (nD(s) - 1.0))
    def covOf(s: String) = when(col(s"n$s") >= 2L,
      (col(s"sxy$s") - col(s"sx$s") * col(s"sy$s") / nD(s)) / (nD(s) - 1.0))
    def varAdj(s: String) = varOf(s, "syy", "sy") -
      lit(2.0) * theta * covOf(s) + theta * theta * varOf(s, "sxx", "sx")
    val diffRaw = mean("a", "sy") - mean("b", "sy")
    val diffAdj = diffRaw - theta * (mean("a", "sx") - mean("b", "sx"))
    val seRaw = sqrt(varOf("a", "syy", "sy") / nD("a") +
      varOf("b", "syy", "sy") / nD("b"))
    val seAdj = sqrt(varAdj("a") / nD("a") + varAdj("b") / nD("b"))
    // pooled variance-reduction factor = ρ² = θ²·var(x)/var(y), all-unit
    val syyT = col("syya") + col("syyb")
    val varXT = (sxxT - sxT * sxT / nT) / (nT - 1.0)
    val varYT = (syyT - syT * syT / nT) / (nT - 1.0)
    agg.select(col("na").as("n_a"), col("nb").as("n_b"),
      theta.as("theta"),
      when(col("na") >= 1L && col("nb") >= 1L, round(diffRaw, 9)).as("diff_raw"),
      round(diffAdj, 9).as("diff_adj"),
      when(okTheta && seRaw > 0.0, round(diffRaw / seRaw, 6)).as("z_raw"),
      when(okTheta && seAdj > 0.0, round(diffAdj / seAdj, 6)).as("z_adj"),
      when(okTheta && varYT > 0.0,
        round(theta * theta * varXT / varYT, 6)).as("var_reduction"))
  }

  /** Delta-method ratio-metric A/B test (Deng, Knoblich, Lu — KDD 2018):
    * the z-test for metrics that are a RATIO of per-unit sums —
    * revenue per session, clicks per impression — where the naive
    * per-unit-mean t-test answers a different question and the ratio's
    * sampling variance needs the first-order Taylor expansion:
    * R = ΣY/ΣX, Var(R) ≈ (s²_y − 2R·s_xy + R²·s²_x) / (n·x̄²).
    * The practitioner's standard companion to [[cuped]] in every
    * experimentation platform.
    *
    * Output: ALWAYS exactly 1 row — (n_a, n_b, r_a, r_b round@9, diff
    * round@9, z round@6), variant 0 minus variant 1. Exact decimal
    * moment sums in ONE ungrouped conditional aggregate; each R is
    * rounded@9 and the ROUNDED value feeds the variance and diff (the
    * q59 artifact convention); degenerates (a side with n < 2 or
    * ΣX ≤ 0, zero combined variance) → NULL z, never Inf. Callers roll
    * up to one (variant, num, den) row per unit first. */
  def ratioMetric(df: DataFrame, variantCol: String, numCol: String,
      denCol: String): DataFrame = {
    val m = df.select(col(variantCol).cast("long").as("v"),
      col(numCol).cast("double").as("y"), col(denCol).cast("double").as("x"))
    val agg = twoSidedMoments(m)
    def nD(s: String) = col(s"n$s").cast("double")
    def okSide(s: String) = col(s"n$s") >= 2L && col(s"sx$s") > 0.0
    def r(s: String) = when(okSide(s), round(col(s"sy$s") / col(s"sx$s"), 9))
    def varR(s: String) = {
      val n = nD(s)
      // n >= 2 guards on every (n-1) division: ANSI Spark throws on a
      // double divide-by-zero that DuckDB nulls, and when() predicates
      // do not short-circuit vectorized evaluation
      val xbar = when(col(s"n$s") >= 1L, col(s"sx$s") / n)
      def v(cc: String, c1: String, c2: String) = when(col(s"n$s") >= 2L,
        (col(cc) - col(c1) * col(c2) / n) / (n - 1.0))
      val vy = v(s"syy$s", s"sy$s", s"sy$s")
      val vx = v(s"sxx$s", s"sx$s", s"sx$s")
      val cxy = v(s"sxy$s", s"sx$s", s"sy$s")
      when(okSide(s),
        (vy - lit(2.0) * r(s) * cxy + r(s) * r(s) * vx) / (n * xbar * xbar))
    }
    val se = sqrt(varR("a") + varR("b"))
    agg.select(col("na").as("n_a"), col("nb").as("n_b"),
      r("a").as("r_a"), r("b").as("r_b"),
      round(r("a") - r("b"), 9).as("diff"),
      when(se > 0.0, round((r("a") - r("b")) / se, 6)).as("z"))
  }

  /** Cochran–Armitage trend test: is a binary outcome's proportion
    * MONOTONE in an ordered integer dose (exposure tier, day index,
    * bucket)? The 2×k companion [[chiSquared]] cannot give — chi² asks
    * "any difference", CA asks "a trend in dose order", which is the
    * question behind ramp-ups, dose-response and time-ordered cohorts.
    * With integer scores w_i, successes r_i and totals n_i:
    * Z = (N·Σw_i r_i − Σw_i n_i·R) · √N /
    *     (√(R(N−R)) · √(N·Σw_i²n_i − (Σw_i n_i)²)) — positive Z means
    * the proportion rises with the dose.
    *
    * Exactness: every sum and product runs in decimal(38,0)/HUGEINT
    * (the 100 TB wrap rule: R(N−R) alone passes a long at ~3e9 rows);
    * the variance product is SPLIT across two √ factors so neither
    * decimal intermediate can overflow 38 digits at any corpus size;
    * Z is one fixed-order IEEE expression round@6. Degenerates (R = 0,
    * R = N, single dose level) → NULL by integer-exact guards. One
    * grouped count pass + one ungrouped k-row reduction — ALWAYS
    * exactly 1 output row (the poissonRate cardinality contract).
    * Output: (k, n, r, z). */
  def cochranArmitage(df: DataFrame, doseCol: String,
      successCol: String): DataFrame = {
    val m = df.select(col(doseCol).cast("long").as("w"),
        col(successCol).cast("long").as("s"))
      .filter(col("w").isNotNull && col("s").isNotNull)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("r"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val agg = m.agg(count(lit(1)).as("k"),
      sum(col("n")).as("n_tot"), sum(col("r")).as("r_tot"),
      sum(dec(col("w")) * col("n")).as("wn"),
      sum(dec(col("w")) * col("r")).as("wr"),
      sum(dec(col("w")) * col("w") * col("n")).as("w2n"))
    def d(c: Column) = c.cast("double")
    val num = dec(col("n_tot")) * col("wr") - col("wn") * col("r_tot")
    val vA = dec(col("r_tot")) * (dec(col("n_tot")) - col("r_tot"))
    val vB = dec(col("n_tot")) * col("w2n") - col("wn") * col("wn")
    val z = d(num) * sqrt(d(col("n_tot"))) / (sqrt(d(vA)) * sqrt(d(vB)))
    val ok = col("r_tot") > 0L && col("r_tot") < col("n_tot") &&
      vB > lit(0L).cast("decimal(38,0)")
    agg.select(col("k"), col("n_tot").as("n"), col("r_tot").as("r"),
      when(ok, round(z, 6)).as("z"))
  }

  /** Wilson score interval per group — the binomial CI that actually
    * holds its coverage at extreme p̂ and small n, where the Wald
    * interval [[twoProportion]] reports collapses to a point at
    * p̂ ∈ {0,1} and can stray outside [0,1] (Brown/Cai/DasGupta 2001:
    * Wald is "persistently chaotic"; Wilson is the recommended
    * default). Center (p̂ + z²/2n)/(1 + z²/n), half-width
    * z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n) — one fixed-order IEEE
    * expression each over exact (n, k) longs, round@6; z is a literal
    * (same double both engines). Output: per group (g, n, k, p_hat
    * round@9, wilson_lo, wilson_hi round@6); n = 0 groups drop at the
    * aggregate (no trials, no interval). */
  def wilsonCi(df: DataFrame, groupCol: String, successCol: String,
      z: Double = 1.96): DataFrame = {
    val m = df.select(col(groupCol).as("g"),
        col(successCol).cast("long").as("s"))
      .filter(col("s").isNotNull)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD)) / denom
    m.select(col("g"), col("n"), col("k"),
      round(p, 9).as("p_hat"),
      round(center - half, 6).as("wilson_lo"),
      round(center + half, 6).as("wilson_hi"))
  }

  /** Chapman capture–recapture estimator: how big is the POPULATION two
    * overlapping samples were drawn from? N̂ = (n₁+1)(n₂+1)/(m+1) − 1
    * with SE² = (n₁+1)(n₂+1)(n₁−m)(n₂−m)/((m+1)²(m+2)) — the
    * bias-corrected Lincoln–Petersen form that stays finite at m = 0.
    * The corpus question it answers: two crawls/dedup passes share m
    * documents — how many documents exist in total (how much is still
    * uncrawled)? All counts exact longs folded in ONE narrow aggregate
    * over membership flags (no join — each row carries its own in-A /
    * in-B bits); the two divisions happen once, round@6.
    * Output: 1 row (n1, n2, m, n_hat, se). */
  def chapman(df: DataFrame, inACol: String, inBCol: String): DataFrame = {
    val agg = df.select(col(inACol).cast("boolean").as("a"),
        col(inBCol).cast("boolean").as("b"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("b"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("m"))
    def d(c: Column) = c.cast("double")
    val nHat = (d(col("n1")) + 1.0) * (d(col("n2")) + 1.0) /
      (d(col("m")) + 1.0) - 1.0
    val se = sqrt((d(col("n1")) + 1.0) * (d(col("n2")) + 1.0) *
      (d(col("n1")) - d(col("m"))) * (d(col("n2")) - d(col("m"))) /
      ((d(col("m")) + 1.0) * (d(col("m")) + 1.0) * (d(col("m")) + 2.0)))
    agg.select(col("n1"), col("n2"), col("m"),
      round(nHat, 6).as("n_hat"), round(se, 6).as("se"))
  }

  /** One-way ANOVA, CLASSIC and WELCH in one pass — the k-group mean
    * test completing the battery ([[welchPairs]] is pairwise,
    * [[kruskalWallis]] is the rank form, [[brownForsythe]] tests the
    * variances this test's classic form assumes equal; Welch's F
    * (1951) drops that assumption and is the practice default).
    *
    *   classic: F = [Σn_g(x̄_g−x̄)²/(k−1)] / [Σss_g/(N−k)]
    *   Welch:   w_g = n_g/s²_g, W = Σw, x̄_w = Σw_g x̄_g / W,
    *            λ = Σ(1−w_g/W)²/(n_g−1),
    *            F* = [Σw_g(x̄_g−x̄_w)²/(k−1)] / [1 + 2(k−2)/(k²−1)·λ],
    *            df2 = (k²−1)/(3λ)
    *
    * Group-set convention (the r12 ADVICE fix, matching R oneway.test /
    * scipy f_oneway): the CLASSIC F spans ALL groups — a singleton adds
    * between-group SS and a df, a zero-variance group adds its mass to
    * SSB — while WELCH's F excludes n < 2 / zero-variance groups (w_g
    * is infinite there, by construction, in every reference
    * implementation). `k`/`n` describe the full group set, `k_welch`
    * the Welch-eligible subset; all-singleton or zero-within-variance
    * inputs degrade the classic F to NULL via integer-exact guards
    * (N > k, SSW > 0). Determinism ladder: per-group moments
    * are exact decimals; every cross-group sum (w, w·x̄, both F
    * numerators, both denominators, λ) is a per-group IEEE term rounded
    * to a scaled decimal(38,0) and summed exactly — the [[kruskalWallis]]
    * convention, mirrored in the oracle term for term. ONE grouped
    * exchange over the data; everything after runs on #groups-row
    * broadcast frames. Output: 1 row (k, n, k_welch, f_anova, f_welch,
    * df2_welch round@6; classic df1 = k−1, Welch df1 = k_welch−1). */
  def oneWayAnova(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val m0 = df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"),
        sum(Det.dec(col("x"))).as("sxd"),
        sum(Det.dec(col("x") * col("x"))).as("sxxd"))
    val nD = col("n_g").cast("double")
    val mean = col("sxd").cast("double") / nD
    val ss = col("sxxd").cast("double") -
      col("sxd").cast("double") * col("sxd").cast("double") / nD
    // CLASSIC F spans ALL groups — the textbook (and R oneway.test /
    // scipy f_oneway) convention: a singleton adds between-group SS and
    // a df, a zero-variance group adds its mass to SSB; only WELCH's
    // reciprocal-variance weights need n_g >= 2 and ss > 0, so only the
    // Welch path filters (the r12 ADVICE finding: excluding degenerate
    // groups from the classic F diverged from external references).
    val s1c = m0.agg(sum(col("n_g")).as("n_tot"), count(lit(1)).as("k"),
      sum(col("sxd")).cast("double").as("sxall"))
    val meanAll = col("sxall") / col("n_tot").cast("double")
    val termsC = m0.crossJoin(broadcast(s1c)).select(
      round(nD * (mean - meanAll) * (mean - meanAll) * 1e6, 0)
        .cast("decimal(38,0)").as("cb6"),
      round(ss * 1e6, 0).cast("decimal(38,0)").as("cw6"))
    val s2c = termsC.agg(
      sum(col("cb6")).cast("double").as("scb"),
      sum(col("cw6")).cast("double").as("scw"))
    val m = m0.filter(col("n_g") >= 2 && ss > 0.0)
    val w = nD / (ss / (nD - 1.0))
    val t1 = m.select(col("g"), col("n_g"), col("sxd"), col("sxxd"),
      round(w * 1e6, 0).cast("decimal(38,0)").as("w6"),
      round(w * mean * 1e6, 0).cast("decimal(38,0)").as("wx6"))
    val s1w = t1.agg(count(lit(1)).as("kw"),
      sum(col("w6")).as("w6t"), sum(col("wx6")).as("wx6t"))
    val bigW = col("w6t").cast("double") / 1e6
    val xw = (col("wx6t").cast("double") / 1e6) / bigW
    val termsW = t1.crossJoin(broadcast(s1w)).select(
      round(w * (mean - xw) * (mean - xw) * 1e6, 0)
        .cast("decimal(38,0)").as("wb6"),
      round((lit(1.0) - w / bigW) * (lit(1.0) - w / bigW) / (nD - 1.0) * 1e9,
        0).cast("decimal(38,0)").as("lam9"))
    val s2w = termsW.agg(
      sum(col("wb6")).cast("double").as("swb"),
      sum(col("lam9")).cast("double").as("slam"))
    val kD = col("k").cast("double")
    val kwD = col("kw").cast("double")
    val nTD = col("n_tot").cast("double")
    val lambda = col("slam") / 1e9
    val fClassic = (nTD - kD) / (kD - 1.0) * ((col("scb") / 1e6) /
      (col("scw") / 1e6))
    val fWelch = (col("swb") / 1e6) / (kwD - 1.0) /
      (lit(1.0) + lit(2.0) * (kwD - 2.0) / (kwD * kwD - 1.0) * lambda)
    val df2w = (kwD * kwD - 1.0) / (lit(3.0) * lambda)
    val ok = col("k") > 1 && col("n_tot") > col("k") && col("scw") > 0.0
    val okW = col("kw") > 1 && col("slam") > 0.0
    s1c.crossJoin(broadcast(s2c)).crossJoin(broadcast(s1w))
      .crossJoin(broadcast(s2w))
      .select(col("k"), col("n_tot").as("n"), col("kw").as("k_welch"),
        when(ok, round(fClassic, 6)).as("f_anova"),
        when(okW, round(fWelch, 6)).as("f_welch"),
        when(okW, round(df2w, 6)).as("df2_welch"))
  }

  /** Tukey–Kramer HSD: the post-hoc step every practitioner runs the
    * moment [[oneWayAnova]]'s omnibus F rejects — WHICH pairs differ?
    * Per ordered pair (a < b lexically):
    * q = (x̄_a − x̄_b) / √(MSW/2 · (1/n_a + 1/n_b)), the studentized
    * range statistic (Kramer's unequal-n form), against MSW = SSW/(N−k)
    * from the SAME all-groups classic decomposition as the ANOVA (df =
    * N−k). The caller compares |q| to the studentized-range critical
    * value for (k, N−k) — emitting q rather than a p keeps the operator
    * free of the q-distribution's nonelementary CDF while giving the
    * exact number every table and library consumes.
    *
    * Determinism: per-group moments are exact decimals; SSW is the
    * [[oneWayAnova]] 1e6-scaled decimal sum; means, the diff, and q are
    * each ONE fixed-order IEEE expression (diff round@9, q round@6).
    * Shape: ONE grouped exchange over the data; the pair frame is the
    * k-row moment frame self-joined under a < b — k(k−1)/2 rows, always
    * broadcast-sized (groups, not rows). Degenerate MSW = 0 or N = k →
    * NULL q; singleton groups still get pairs (Kramer's form only needs
    * the OTHER side's variance through pooled MSW).
    * Output: per pair (g_a, g_b, n_a, n_b, mean_diff, q_stat). */
  def tukeyHsd(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val m0 = df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"),
        sum(Det.dec(col("x"))).as("sxd"),
        sum(Det.dec(col("x") * col("x"))).as("sxxd"))
    val nD = col("n_g").cast("double")
    val mean = col("sxd").cast("double") / nD
    val ss = col("sxxd").cast("double") -
      col("sxd").cast("double") * col("sxd").cast("double") / nD
    val withSs = m0.select(col("g"), col("n_g"),
      mean.as("m"), round(ss * 1e6, 0).cast("decimal(38,0)").as("cw6"))
    val tot = withSs.agg(sum(col("n_g")).as("n_tot"), count(lit(1)).as("k"),
      (sum(col("cw6")).cast("double") / 1e6).as("ssw"))
    def side(s: String) = withSs.select(col("g").as(s"g_$s"),
      col("n_g").as(s"n_$s"), col("m").as(s"m_$s"))
    val msw = col("ssw") / (col("n_tot") - col("k")).cast("double")
    val se = sqrt(msw / 2.0 * (lit(1.0) / col("n_a").cast("double") +
      lit(1.0) / col("n_b").cast("double")))
    val ok = col("n_tot") > col("k") && col("ssw") > 0.0
    broadcast(side("a")).join(broadcast(side("b")), col("g_a") < col("g_b"))
      .crossJoin(broadcast(tot))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        round(col("m_a") - col("m_b"), 9).as("mean_diff"),
        when(ok, round((col("m_a") - col("m_b")) / se, 6)).as("q_stat"))
  }

  /** Hodges–Lehmann two-sample shift estimator: the LOWER MEDIAN of all
    * cross-pair differences x_a − x_b — the robust "by HOW MUCH is the
    * distribution shifted" companion to [[mannWhitney]]'s "is it
    * shifted" (the published pairing, and the estimator whose breakdown
    * point beats the difference-of-means the moment either tail is
    * heavy). The pair frame is m = n_a·n_b — quadratic by definition —
    * so both samples thin through the same scale-adaptive
    * [[budgetPoints]] lottery as Theil–Sen (per-group thresholds depend
    * only on per-group counts, so restricting to the two groups keeps
    * the selection identical to the other estimators'). Differences
    * live as 1e9-scaled exact longs; the median is the ⌈m/2⌉-th
    * smallest via the distinct-difference cumsum frame (the
    * [[mannWhitney]]/q63 rank-selection shape — the pair frame itself
    * never sorts globally). Lower-median convention matches
    * [[theilSen]]: the picked value at a rank is unique in the sorted
    * multiset, so ties cannot flip it.
    * Output: 1 row (n_a, n_b, m, hl_shift round@9). */
  def hodgesLehmannBudget(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valCol: String, ga: String, gb: String,
      targetPoints: Int = 400): DataFrame = {
    val pts = budgetPoints(
      df.filter(col(groupCol) === ga || col(groupCol) === gb),
      groupCol, tsCol, idCol, valCol, targetPoints)
    val a = pts.filter(col("g") === lit(ga))
      .select(round(col("v") * 1e9, 0).cast("long").as("va"))
    val b = pts.filter(col("g") === lit(gb))
      .select(round(col("v") * 1e9, 0).cast("long").as("vb"))
    val na = a.agg(count(lit(1)).as("n_a"))
    val nb = b.agg(count(lit(1)).as("n_b"))
    val vc = a.crossJoin(b).select((col("va") - col("vb")).as("d9"))
      .groupBy(col("d9")).agg(count(lit(1)).as("c"))
    val tot = vc.agg(sum(col("c")).as("m"))
    val w = Window.orderBy(col("d9"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // GROUP-BY-less aggregate: exactly ONE row even when a cohort is
    // empty (m NULL, hl NULL) — matching the oracle's cardinality,
    // which also cross-joins ungrouped aggregates
    vc.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(tot))
      .agg(max(col("m")).as("m"),
        min(when(col("cum") >= expr("(m + 1) DIV 2"), col("d9"))).as("d9"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("n_a"), col("n_b"), col("m"),
        round(col("d9").cast("double") / 1e9, 9).as("hl_shift"))
  }

  /** Energy distance between two cohorts' value distributions (Székely
    * & Rizzo 2004): D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'| — zero iff the
    * DISTRIBUTIONS are equal, consistent against every alternative,
    * where q56's Mann–Whitney sees location and q84's Hodges–Lehmann
    * measures shift: this is the whole-distribution readout of the
    * same cohort pair. V-statistic convention for the within terms
    * (2·Σ_{i<j}/n² — the i=j zeros included in the denominator, the
    * form Székely's energy TEST statistic uses): D² is then a true
    * squared metric — always ≥ 0 and EXACTLY 0 on identical samples
    * (spec-pinned), where the unbiased U-form goes negative on finite
    * null samples.
    *
    * Pairwise by definition ⇒ the SAME scale-adaptive [[budgetPoints]]
    * lottery as q67/q72/q82/q84/q90 (per-group thresholds depend only
    * on per-group counts, so kept points are identical across the
    * family and the oracle replays the selection exactly). Values
    * become 1e9-scaled integers BEFORE pairing, every |Δ| and its sum
    * is exact decimal, each E-term is ONE fixed-order IEEE division
    * rounded@9, and D² composes from the three ROUNDED terms — an ulp
    * cannot diverge the engines. The cross frame is expected
    * O(targetPoints²) by the [[Budget]] guarantee; the within frames
    * ride [[Budget.orderedPairs]]. Always exactly ONE output row (the
    * [[poissonRate]] cardinality pattern): a missing cohort yields
    * NULL count/terms; a singleton cohort's within term is 0 (no
    * pairs over n² = 1).
    * Output: (n_a, n_b, e_xy, e_xx, e_yy round@9, energy_d2 round@9). */
  def energyDistanceBudget(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valCol: String, ga: String, gb: String,
      targetPoints: Int = 400): DataFrame = {
    val pts = budgetPoints(
        df.filter(col(groupCol) === ga || col(groupCol) === gb),
        groupCol, tsCol, idCol, valCol, targetPoints)
      .withColumn("v", round(col("v") * 1e9, 0))
    val sides = pts.agg(
      sum(when(col("g") === ga, 1L)).as("n_a"),
      sum(when(col("g") === gb, 1L)).as("n_b"))
    val within = Budget.orderedPairs(pts, "i")
      .groupBy(col("g"))
      .agg(sum(abs(col("v1") - col("v2")).cast("decimal(38,0)")).as("s"))
      .agg(max(when(col("g") === ga, col("s"))).as("s_aa"),
        max(when(col("g") === gb, col("s"))).as("s_bb"))
    val cross = pts.filter(col("g") === ga).select(col("v").as("va"))
      .crossJoin(pts.filter(col("g") === gb).select(col("v").as("vb")))
      .agg(sum(abs(col("va") - col("vb")).cast("decimal(38,0)")).as("s_ab"))
    def d(c: Column) = c.cast("double")
    val eXy = when(col("n_a") > 0L && col("n_b") > 0L,
      round(d(col("s_ab")) / (d(col("n_a")) * d(col("n_b"))) / 1e9, 9))
    def eWithin(s: Column, n: Column) = when(n >= 1L,
      round(d(coalesce(s, lit(0))) * 2.0 / (d(n) * d(n)) / 1e9, 9))
    sides.crossJoin(broadcast(within)).crossJoin(broadcast(cross))
      .select(col("n_a"), col("n_b"),
        eXy.as("e_xy"),
        eWithin(col("s_aa"), col("n_a")).as("e_xx"),
        eWithin(col("s_bb"), col("n_b")).as("e_yy"))
      .withColumn("energy_d2",
        when(col("e_xy").isNotNull && col("e_xx").isNotNull &&
          col("e_yy").isNotNull,
          round(lit(2.0) * col("e_xy") - col("e_xx") - col("e_yy"), 9)))
  }

  /** Rousseeuw–Croux Qn robust SCALE estimator: the k-th smallest of
    * all C(n,2) pairwise absolute differences, k = C(h,2), h = ⌊n/2⌋+1
    * — 50% breakdown and ~82% Gaussian efficiency WITHOUT needing any
    * location estimate first (the MAD needs the median; Qn needs
    * nothing), the robust-spread companion of [[hodgesLehmannBudget]]'s
    * robust shift. `qn` applies the 2.2219 Gaussian-consistency
    * constant; `qn_raw` is the bare order statistic. Pairwise by
    * definition ⇒ the same scale-adaptive [[budgetPoints]] lottery;
    * differences are 1e9-scaled longs (IEEE-identical both engines)
    * and the order statistic is a per-group distinct-difference cumsum
    * rank pick — the pair frame never sorts globally. Groups with
    * n < 2 drop (no pair exists).
    * Output: per group (g, n, k, qn_raw round@9, qn round@6). */
  def qnScaleBudget(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valCol: String, targetPoints: Int = 400): DataFrame = {
    val pts = budgetPoints(df, groupCol, tsCol, idCol, valCol, targetPoints)
    val d = Budget.orderedPairs(pts, "i")
      .select(col("g"),
        round(abs(col("v1") - col("v2")) * 1e9, 0).cast("long").as("d9"))
    val n = pts.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val vc = d.groupBy(col("g"), col("d9")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("g")).orderBy(col("d9"))
      .rowsBetween(Window.unboundedPreceding, 0)
    vc.withColumn("cum", sum(col("c")).over(w))
      .join(broadcast(n.filter(col("n") >= 2)), Seq("g"))
      .withColumn("k", expr("((n DIV 2 + 1) * (n DIV 2)) DIV 2"))
      .filter(col("cum") >= col("k"))
      .groupBy(col("g"), col("n"), col("k"))
      .agg(min(col("d9")).as("d9"))
      .select(col("g"), col("n"), col("k"),
        round(col("d9").cast("double") / 1e9, 9).as("qn_raw"),
        round(lit(2.2219) * (col("d9").cast("double") / 1e9), 6).as("qn"))
  }

  /** Population Stability Index per key — THE scorecard-monitoring
    * drift metric (credit-risk model governance's standard readout;
    * the numeric-column sibling of the token-distribution JSD in
    * [[graft.pipeline.Drift]]): the series splits at the global time
    * midpoint into a reference and a current window, the reference
    * window's deciles become 10 bins, and
    * PSI = Σ_bins (p'_b − q'_b)·ln(p'_b/q'_b) with p = reference share,
    * q = current share, both floored at `eps` (the standard
    * zero-count convention — a bin empty on BOTH sides contributes
    * ln(1) = 0, so only observed (key, bin) rows ever materialize; no
    * dense grid). The conventional reading bands are emitted as a
    * label: < 0.1 stable, < 0.25 moderate, else shifted — compared on
    * the round@6 value so an ulp cannot flip the label (q66
    * convention).
    *
    * Determinism: bin edges are OBSERVED reference values
    * ([[Quantiles.exactGrouped]] at lower interpolation — no
    * interpolation arithmetic), binning is an exact double comparison
    * fold (`#edges ≤ v`, ties go up), shares are one IEEE division of
    * exact counts, each PSI term rounds to a 1e-9 long before the
    * exact sum (the q65/q71 rounded-transcendental-term idiom — ln
    * agrees only to an ulp across engines, the rounded term is what
    * both sum). Midpoint is exact integer µs arithmetic.
    *
    * Scale shape: one key-window rank exchange for the edges (the
    * exactGrouped single-exchange contract), one broadcast 1-row
    * midpoint, one edges join (1 row per key), one (key, side, bin)
    * aggregate with map-side combine, one key rollup. Keys whose
    * reference window is EMPTY drop (no edges — callers own window
    * placement); a key with an empty CURRENT window still emits (its
    * q floors to eps in every observed bin).
    * Output: (key, n_ref, n_cur, psi round@6, shift). */
  def psi(df: DataFrame, keyCol: String, usCol: String, valCol: String,
      eps: Double = 1e-4): DataFrame = {
    require(eps > 0.0 && eps < 0.1, s"eps in (0, 0.1), got $eps")
    val sided = psiSided(df, keyCol, usCol, valCol)
    val deciles = (1 to 9).map(_ / 10.0)
    val edges = Quantiles.exactGrouped(
        sided.filter(col("__ref") === 1).select(col("__k"), col("__v")),
        "__k", "__v", deciles, interpolation = "lower")
      .select(col("__k"),
        array((0 until 9).map(i => col(s"q$i")): _*).as("__edges"))
    val binned = sided.join(edges, Seq("__k"))
      .withColumn("__bin",
        size(filter(col("__edges"), e => e <= col("__v"))))
    psiFromBins(binned, keyCol, eps)
  }

  /** The midpoint split both PSI variants read: (__k, __v, __ref) with
    * __ref = 1 on the first half of the GLOBAL time range (exact
    * integer µs midpoint, 1-row broadcast). */
  private def psiSided(df: DataFrame, keyCol: String, usCol: String,
      valCol: String): DataFrame = {
    val src = df.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("__k"), col(usCol).cast("long").as("__us"),
        col(valCol).cast("double").as("__v"))
    val mid = src.agg(
      expr("(min(__us) + max(__us)) div 2").as("__mid"))
    src.crossJoin(broadcast(mid))
      .withColumn("__ref", (col("__us") <= col("__mid")).cast("int"))
  }

  /** The shared PSI tail over a binned (__k, __bin, __ref) frame: the
    * eps floor, the rounded-1e-9-long ln terms, the exact sum and the
    * stable/moderate/shifted bands — ONE definition for both the
    * decile and the fixed-width bin variants, so the conventions can
    * never fork. */
  private def psiFromBins(binned: DataFrame, keyCol: String,
      eps: Double): DataFrame = {
    val cells = binned.groupBy(col("__k"), col("__bin")).agg(
      sum(col("__ref")).as("cr"),
      sum(lit(1L) - col("__ref")).as("cc"))
    val totals = cells.groupBy(col("__k"))
      .agg(sum(col("cr")).as("n_ref"), sum(col("cc")).as("n_cur"))
    val p = greatest(col("cr").cast("double") / col("n_ref").cast("double"),
      lit(eps))
    val q = when(col("n_cur") > 0L,
      greatest(col("cc").cast("double") / col("n_cur").cast("double"),
        lit(eps))).otherwise(lit(eps))
    val term9 = round((p - q) * log(p / q) * 1e9, 0).cast("long")
    // 1-row-per-key totals join — AQE broadcasts it (the cusum shape)
    cells.join(totals, Seq("__k"))
      .withColumn("__t9", term9)
      .groupBy(col("__k"), col("n_ref"), col("n_cur"))
      .agg(round(sum(col("__t9")).cast("double") / 1e9, 6).as("psi"))
      .select(col("__k").as(keyCol), col("n_ref"), col("n_cur"),
        col("psi"),
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "moderate")
          .otherwise("shifted").as("shift"))
  }

  /** [[psi]] with EQUI-WIDTH bins from the reference window's (min,
    * max) instead of its deciles — the executable form of the decile
    * variant's scale note (the q81b/q100b precedent): decile edges
    * need a per-key rank window (a per-key SORT of the reference
    * half — parallelism degrades to the key count as rows grow, q101
    * measured 15.6× at 100×), while (min, max) is ONE map-side-combined
    * aggregate and binning is narrow arithmetic — no sort anywhere,
    * the shape that survives any corpus size. Fixed-width binning is
    * the other standard PSI deployment (scorecard implementations ship
    * both). Contract: bin = ⌊clamp((v − lo)/w, 0, nBins−1)⌋, w = (hi −
    * lo)/nBins — one IEEE expression both engines compute identically,
    * with the CLAMP ON THE DOUBLE RATIO before any floor/cast so an
    * arbitrarily-far-out-of-range current value (ratio overflowing to
    * ±Inf included) lands in an edge bin instead of overflowing an
    * integer cast (ANSI would throw); a zero-width reference (constant
    * values) puts everything in bin 0 on both sides. Same eps floor,
    * rounded ln terms, bands and output schema as [[psi]] — literally:
    * both variants share the same tail. */
  def psiFixed(df: DataFrame, keyCol: String, usCol: String,
      valCol: String, nBins: Int = 10, eps: Double = 1e-4): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    require(eps > 0.0 && eps < 0.1, s"eps in (0, 0.1), got $eps")
    val sided = psiSided(df, keyCol, usCol, valCol)
    val bounds = sided.filter(col("__ref") === 1)
      .groupBy(col("__k"))
      .agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val binned = sided.join(bounds, Seq("__k"))
      .withColumn("__bin",
        clampBinOf(col("__v"), col("__lo"), col("__hi"), nBins))
    psiFromBins(binned, keyCol, eps)
  }

  /** THE clamp-bin contract every fixed-width-bin operator shares
    * (psiFixed, wasserstein1Fixed, the windowed/streaming
    * [[graft.pipeline.Drift]].binW1): bin = ⌊clamp((v − lo)/w, 0,
    * nBins−1)⌋ with the CLAMP ON THE DOUBLE RATIO before any
    * floor/cast (a far-out-of-range value — ratio overflowing to ±Inf
    * included — lands in an edge bin, never overflows an integer
    * cast), and a zero-width support pinning everything to bin 0.
    * One definition so the batch, stream and oracle forms can never
    * fork. */
  private[graft] def clampBinOf(v: Column, lo: Column, hi: Column,
      nBins: Int): Column =
    when(hi === lo, 0)
      .otherwise(floor(least(lit((nBins - 1).toDouble),
        greatest(lit(0.0), (v - lo) / ((hi - lo) / nBins.toDouble))))
        .cast("int"))

  /** 1-D Wasserstein-1 (earth-mover) distance per key between the
    * reference and current halves of the series — the drift readout
    * with METRIC UNITS: where [[psi]]'s divergence says "the shares
    * moved", W1 = ∫|F_ref(x) − F_cur(x)|dx says "the distribution
    * moved this many dollars/seconds/tokens" (Ramdas–Trillos–Cuturi
    * 2017 survey form; for 1-D empirical CDFs the integral is exact —
    * no optimal-transport solver enters). Same global-µs-midpoint
    * split as the PSI pair ([[psiSided]] — one shared definition).
    *
    * Exact form: F_ref/F_cur step only at OBSERVED values, so
    * W1 = Σ over sorted distinct values |F_ref(v) − F_cur(v)| ·
    * (next(v) − v) — the per-(key, value) count frame (the q56
    * Mann–Whitney shape, map-side combined) with ONE per-key-order
    * window over its distinct values.
    *
    * Determinism: CDF fractions are one IEEE division of exact longs,
    * each segment term rounds to a 1e-9 long before the exact sum
    * (the q65/q71 rounded-term idiom), final round@9 (a 9-decimal
    * quotient re-rounded coarser can tie at .500 — the r12 link-predict
    * trap). A key with an
    * empty reference OR current half emits NULL w1 (a distance to an
    * empty sample is undefined — never 0, never Inf), with both
    * counts still reported.
    *
    * Scale shape: one (key, value) aggregate with map-side combine,
    * one 1-row broadcast midpoint, one k-row totals join, one per-key
    * rank window over the DISTINCT-value frame — per-key parallelism
    * bounds at the distinct-value count (continuous metrics ≈ row
    * count: the q101 per-key-sort family). The executable scale lever
    * is [[wasserstein1Fixed]].
    * Output: (key, n_ref, n_cur, w1 round@9). */
  def wasserstein1(df: DataFrame, keyCol: String, usCol: String,
      valCol: String): DataFrame = {
    val sided = psiSided(df, keyCol, usCol, valCol)
    val cells = sided.groupBy(col("__k"), col("__v")).agg(
      sum(col("__ref")).as("cr"),
      sum(lit(1L) - col("__ref")).as("cc"))
    val totals = cells.groupBy(col("__k"))
      .agg(sum(col("cr")).as("n_ref"), sum(col("cc")).as("n_cur"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__v"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // 1-row-per-key totals join — AQE broadcasts it (the cusum shape)
    val seg = cells.join(totals, Seq("__k"))
      .withColumn("__fr", sum(col("cr")).over(cum))
      .withColumn("__fc", sum(col("cc")).over(cum))
      .withColumn("__w", lead(col("__v"), 1).over(w) - col("__v"))
    val term9 = round(abs(
      col("__fr").cast("double") / col("n_ref").cast("double") -
        col("__fc").cast("double") / col("n_cur").cast("double")) *
      col("__w") * 1e9, 0).cast("long")
    seg
      .withColumn("__t9",
        when(col("n_ref") > 0L && col("n_cur") > 0L &&
          col("__w").isNotNull, term9).otherwise(lit(0L)))
      .groupBy(col("__k"), col("n_ref"), col("n_cur"))
      .agg(round(sum(col("__t9")).cast("double") / 1e9, 9).as("__w1"))
      .select(col("__k").as(keyCol), col("n_ref"), col("n_cur"),
        when(col("n_ref") > 0L && col("n_cur") > 0L, col("__w1"))
          .as("w1"))
  }

  /** [[wasserstein1]] over FIXED-WIDTH bins — the executable scale
    * lever (the [[psiFixed]]/q81b precedent): the per-key sort over
    * the distinct-value frame disappears; binning is narrow
    * arithmetic off one map-side-combined (min, max) aggregate and
    * the CDF window runs over ≤ nBins rows per key. Unlike psiFixed
    * the bounds span the UNION of both halves (W1 integrates over the
    * union support — clamping current mass to the reference range
    * would silently discard its displacement), so no value is ever
    * out of range and |W1_binned − W1| ≤ binwidth by the CDF-integral
    * bound. Bin = ⌊clamp((v − lo)/w, 0, nBins−1)⌋ (the psiFixed
    * clamp-on-the-double-ratio contract); empty interior bins need no
    * dense grid — a missing bin's segments fold into the previous
    * materialized bin's gap term (gap = next bin index − bin index).
    * A zero-width support (all values equal) reads exactly 0. Same
    * NULL-on-empty-side guard and output schema as the exact form. */
  def wasserstein1Fixed(df: DataFrame, keyCol: String, usCol: String,
      valCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val sided = psiSided(df, keyCol, usCol, valCol)
    val bounds = sided.groupBy(col("__k"))
      .agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val bw = (col("__hi") - col("__lo")) / nBins.toDouble
    val cells = sided.join(bounds, Seq("__k"))
      .withColumn("__bin",
        clampBinOf(col("__v"), col("__lo"), col("__hi"), nBins))
      .groupBy(col("__k"), col("__bin"), col("__lo"), col("__hi")).agg(
        sum(col("__ref")).as("cr"),
        sum(lit(1L) - col("__ref")).as("cc"))
    val totals = cells.groupBy(col("__k"))
      .agg(sum(col("cr")).as("n_ref"), sum(col("cc")).as("n_cur"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__bin"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = cells.join(totals, Seq("__k"))
      .withColumn("__fr", sum(col("cr")).over(cum))
      .withColumn("__fc", sum(col("cc")).over(cum))
      .withColumn("__gap",
        (lead(col("__bin"), 1).over(w) - col("__bin")).cast("double"))
    val term9 = round(abs(
      col("__fr").cast("double") / col("n_ref").cast("double") -
        col("__fc").cast("double") / col("n_cur").cast("double")) *
      (col("__gap") * bw) * 1e9, 0).cast("long")
    seg
      .withColumn("__t9",
        when(col("n_ref") > 0L && col("n_cur") > 0L &&
          col("__gap").isNotNull, term9).otherwise(lit(0L)))
      .groupBy(col("__k"), col("n_ref"), col("n_cur"))
      .agg(round(sum(col("__t9")).cast("double") / 1e9, 9).as("__w1"))
      .select(col("__k").as(keyCol), col("n_ref"), col("n_cur"),
        when(col("n_ref") > 0L && col("n_cur") > 0L, col("__w1"))
          .as("w1"))
  }

  private def kendallTauOn(pts0: DataFrame): DataFrame = {
    val pts = pts0.select(col("g"), col("t"), col("i"), col("v"))
    val s = kendallSFrame(pts)
    val n = pts.groupBy(col("g")).agg(count(lit(1)).as("n"))
    def tieSum(c: String, out: String) = pts
      .groupBy(col("g"), col(c)).agg(count(lit(1)).as("tc"))
      .groupBy(col("g"))
      .agg(sum(expr("tc * (tc - 1) DIV 2")).as(out))
    val n0 = expr("n * (n - 1) DIV 2")
    val denomT = col("__n0") - col("tt")
    val denomV = col("__n0") - col("tv")
    s.join(n, Seq("g"))
      .join(tieSum("t", "tt"), Seq("g")).join(tieSum("v", "tv"), Seq("g"))
      .withColumn("__n0", n0)
      .select(col("g"), col("n"), col("s"),
        when(denomT > 0L && denomV > 0L,
          round(col("s").cast("double") /
            sqrt(denomT.cast("double") * denomV.cast("double")), 6))
          .as("tau_b"))
  }
}
