package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical per-series time-series statistics the reference's vector
  * kernels stop short of (its surface ends at cumulative_* /
  * pairwise_diff — reference: cpp/src/arrow/compute/kernels/
  * vector_cumulative_ops.cc, vector_pairwise.cc): autocorrelation,
  * gaps-and-islands interval merging, and CUSUM change-point location.
  * All three are the single-exchange window/aggregate compositions a
  * 100 TB event store needs — the series key is the partition key, so
  * adding series scales horizontally and no operator ever materializes
  * a whole series in one buffer (the only per-row state is O(1); ACF
  * carries `maxLag` lagged values per row).
  *
  * Determinism contract (shared with the rest of the registry): every
  * cross-row sum runs over exact types — decimal-cast doubles for value
  * sums ([[graft.Det]]), scaled longs for CUSUM — and the only
  * floating-point steps are per-row IEEE expressions plus one final
  * division rounded at a fixed scale, so results hash-match DuckDB.
  */
object TimeSeries {

  /** Sample autocorrelation at lags 1..`maxLag`: for each key, the
    * Pearson correlation between the value series (ordered by
    * (`tsCol`, `idCol`)) and its lag-k shift, computed from exact
    * decimal moments over the (x_i, x_{i-k}) pair set. One window
    * exchange on the key computes ALL lags (lag(v,1)..lag(v,maxLag) in
    * the same frame); the (key, lag) hash aggregate REUSES that
    * exchange (hash(key) already clusters (key, lag)) — ONE exchange
    * total regardless of `maxLag`, PlanSpec-pinned.
    *
    * NULL values are dropped before lagging (the series is the observed
    * sample sequence). Keys with fewer than `minPairs` pairs at a lag,
    * or zero variance on either side, return NULL acf (the guarded
    * Pearson — builtin `corr` throws under ANSI; operators/Spearman
    * precedent).
    *
    * Output: (key, lag, n_pairs, acf) — acf rounded at 9 dp. */
  def acf(
      df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, maxLag: Int, minPairs: Int = 2): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val lagged = (1 to maxLag).foldLeft(
        df.filter(col(valCol).isNotNull)
          .select(col(keyCol), col(tsCol), col(idCol),
            col(valCol).cast("double").as("__x"))) {
      (d, k) => d.withColumn(s"__y$k", lag(col("__x"), k).over(w))
    }
    // (key, lag, x, y) pair stream: maxLag rows out per input row, each
    // carrying just two doubles — a narrow in-partition fan-out
    val pairs = lagged.select(
      col(keyCol),
      explode(array((1 to maxLag).map(k =>
        struct(lit(k).as("lag"), col("__x").as("x"),
          col(s"__y$k").as("y"))): _*)).as("p"))
      .select(col(keyCol), col("p.lag").as("lag"),
        col("p.x").as("x"), col("p.y").as("y"))
      .filter(col("y").isNotNull)
    val m = pairs.groupBy(col(keyCol), col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      graft.Det.dsum(col("x")).as("sx"),
      graft.Det.dsum(col("y")).as("sy"),
      graft.Det.dsum(col("x") * col("x")).as("sxx"),
      graft.Det.dsum(col("y") * col("y")).as("syy"),
      graft.Det.dsum(col("x") * col("y")).as("sxy"))
    val n = col("n_pairs").cast("double")
    val varx = n * col("sxx") - col("sx") * col("sx")
    val vary = n * col("syy") - col("sy") * col("sy")
    m.select(col(keyCol), col("lag"), col("n_pairs"),
      when(col("n_pairs") >= minPairs && varx > 0.0 && vary > 0.0,
        round((n * col("sxy") - col("sx") * col("sy")) /
          sqrt(varx * vary), 9)).as("acf"))
  }

  /** Partial autocorrelation to lag 3 via the Durbin–Levinson recursion
    * UNROLLED (Box–Jenkins order identification: ACF tails off for an
    * AR process, PACF CUTS OFF at the true order — the pair of plots
    * every ARIMA fit starts from; [[acf]] alone cannot separate an
    * AR(1) from higher orders because ρ_k = ρ₁ᵏ tails forever):
    *
    *   φ₁₁ = r₁
    *   φ₂₂ = (r₂ − r₁²)/(1 − r₁²),  φ₂₁ = r₁ − φ₂₂·r₁
    *   φ₃₃ = (r₃ − φ₂₁r₂ − φ₂₂r₁)/(1 − φ₂₁r₁ − φ₂₂r₂)
    *
    * computed from the ROUND@9 ACF artifact [[acf]] emits — the shared
    * cross-engine contract: both engines take bit-identical r values
    * into the same fixed-order IEEE expressions, so the φ doubles are
    * identical before their own round@6. The recursion depth is fixed
    * at 3 (matching the house maxLag) — a driver-side loop over k would
    * trade the one-expression determinism contract for nothing at this
    * depth. Degenerate guards mirror as CASE WHEN: |r₁| = 1 NULLs φ₂₂
    * onward; a non-positive level-3 denominator (non-PD Toeplitz — a
    * degenerate sample ACF) NULLs φ₃₃; any NULL r propagates NULL.
    * Adds ZERO passes over the data beyond [[acf]]'s own — the pivot
    * and recursion run on the #keys×3 ACF frame. */
  def pacf3(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String): DataFrame = {
    val a = acf(df, keyCol, tsCol, idCol, valCol, maxLag = 3)
    val piv = a.groupBy(col(keyCol)).agg(
      min(when(col("lag") === 1, col("acf"))).as("r1"),
      min(when(col("lag") === 2, col("acf"))).as("r2"),
      min(when(col("lag") === 3, col("acf"))).as("r3"))
    val p22den = lit(1.0) - col("r1") * col("r1")
    val p22 = (col("r2") - col("r1") * col("r1")) / p22den
    val p21 = col("r1") - p22 * col("r1")
    val p33den = lit(1.0) - p21 * col("r1") - p22 * col("r2")
    val p33 = (col("r3") - p21 * col("r2") - p22 * col("r1")) / p33den
    piv.select(col(keyCol), col("r1"), col("r2"), col("r3"),
      round(col("r1"), 6).as("pacf1"),
      when(p22den > 0.0, round(p22, 6)).as("pacf2"),
      when(p22den > 0.0 && p33den > 0.0, round(p33, 6)).as("pacf3"))
  }

  /** Cross-correlation function between two keys' bucketed series —
    * [[acf]]'s two-series sibling, THE lead/lag question ("do clicks
    * predict purchases an hour later?"): CCF(k) = corr(x_t, y_{t+k})
    * over hourly bucket means, lags 0..maxLag. Bucket means come from
    * exact decimal sums over integer counts (identical doubles in both
    * engines); each lag's Pearson is the [[acf]] guarded-moment
    * recipe, round@9.
    *
    * Scale shape: the raw series collapse to hourly (bucket, mean)
    * frames FIRST — everything after is bounded by the time span, not
    * the row count; the lag fan-out is a narrow (maxLag+1)-way explode
    * on the y frame and ONE bucket-keyed equi-join aligns the pairs. */
  def ccf(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      keyA: String, keyB: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    val hourUs = 3600000000L
    def series(k: String, out: String): DataFrame =
      df.filter(col(keyCol) === k && col(valCol).isNotNull)
        .groupBy(expr(s"unix_micros(date_trunc('hour', $tsCol))").as("b"))
        .agg((sum(graft.Det.dec(col(valCol))).cast("double") /
          count(lit(1)).cast("double")).as(out))
    val xs = series(keyA, "x")
    val ys = series(keyB, "y")
      .select(explode(array((0 to maxLag).map(lit): _*)).as("lag"),
        col("b"), col("y"))
      .select(col("lag"), (col("b") - col("lag") * hourUs).as("b"), col("y"))
    val pairs = xs.join(ys, "b")
    val m = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      graft.Det.dsum(col("x")).as("sx"), graft.Det.dsum(col("y")).as("sy"),
      graft.Det.dsum(col("x") * col("x")).as("sxx"),
      graft.Det.dsum(col("y") * col("y")).as("syy"),
      graft.Det.dsum(col("x") * col("y")).as("sxy"))
    val n = col("n_pairs").cast("double")
    val varx = n * col("sxx") - col("sx") * col("sx")
    val vary = n * col("syy") - col("sy") * col("sy")
    m.select(col("lag"), col("n_pairs"),
      when(col("n_pairs") >= 2 && varx > 0.0 && vary > 0.0,
        round((n * col("sxy") - col("sx") * col("sy")) /
          sqrt(varx * vary), 9)).as("ccf"))
  }

  /** Pairwise Granger causality (lag 1) between two keys' hourly
    * series — [[ccf]]'s inferential sibling: CCF says the series
    * co-move at a lag, Granger asks whether x's PAST improves the
    * prediction of y BEYOND y's own past (Granger 1969). Both
    * directions in one pass — the asymmetry ("x→y significant, y→x
    * not") is the readout. Unrestricted model y_t = a + b·y_{t−1} +
    * c·x_{t−1} vs restricted y_t = a + b·y_{t−1};
    * F = (SSE_r − SSE_u) / (SSE_u / (n−3)), df1 = 1, banded against
    * the asymptotic χ²₁ critical values 3.841459 / 6.634897 on the
    * round@6 F (the q66/q105 band convention).
    *
    * Alignment: hourly bucket means (the [[ccf]] frame), pairs formed
    * only across CONSECUTIVE observed hours (a self-join on b − 1h —
    * a gap breaks the lag rather than silently spanning it). Both
    * directions solve from ONE 14-sum exact-decimal moment aggregate
    * via the ols2 Cramer order (q59-gated); the restricted model is
    * the closed-form simple regression off the same moments. Every
    * division carries the NULL-when-zero divisor guard (the q105
    * ANSI/DuckDB parity idiom); degenerate inputs read 'undefined'.
    *
    * Scale shape: raw series collapse to (hour, mean) frames first —
    * everything downstream is bounded by the time span, not the row
    * count. Output: 2 rows (direction, n, f_stat round@6, verdict). */
  def granger(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, keyA: String, keyB: String): DataFrame = {
    val hourUs = 3600000000L
    def series(k: String, out: String): DataFrame =
      df.filter(col(keyCol) === k && col(valCol).isNotNull)
        .groupBy(expr(s"unix_micros(date_trunc('hour', $tsCol))").as("b"))
        .agg((sum(graft.Det.dec(col(valCol))).cast("double") /
          count(lit(1)).cast("double")).as(out))
    val cur = series(keyA, "x").join(series(keyB, "y"), "b")
    val prev = cur.select((col("b") + lit(hourUs)).as("b"),
      col("x").as("xl"), col("y").as("yl"))
    val pts = cur.join(prev, "b")
    val m = pts.agg(
      count(lit(1)).cast("double").as("n"),
      graft.Det.dsum(col("x")).as("sx"), graft.Det.dsum(col("y")).as("sy"),
      graft.Det.dsum(col("xl")).as("sxl"),
      graft.Det.dsum(col("yl")).as("syl"),
      graft.Det.dsum(col("xl") * col("xl")).as("sxl2"),
      graft.Det.dsum(col("yl") * col("yl")).as("syl2"),
      graft.Det.dsum(col("yl") * col("xl")).as("sylxl"),
      graft.Det.dsum(col("yl") * col("y")).as("syly"),
      graft.Det.dsum(col("xl") * col("y")).as("sxly"),
      graft.Det.dsum(col("xl") * col("x")).as("sxlx"),
      graft.Det.dsum(col("yl") * col("x")).as("sylx"),
      graft.Det.dsum(col("x") * col("x")).as("sxx"),
      graft.Det.dsum(col("y") * col("y")).as("syy"))
    val n = col("n")
    // target on (1, own-lag s2, other-lag s3): the shared cramer3 solve
    def fStat(s2: Column, s3: Column, sy: Column, s22: Column,
        s23: Column, s33: Column, s2y: Column, s3y: Column,
        syy: Column): Column = {
      val (det, _, _, _, sseU) =
        cramer3(n, s2, s3, sy, s22, s23, s33, s2y, s3y, syy)
      val drs = n * s22 - s2 * s2
      val br = (n * s2y - s2 * sy) / when(abs(drs) > 0.0, drs)
      val ar = (sy - br * s2) / when(n > 0.0, n)
      val sseR = syy - ar * sy - br * s2y
      val ok = n > 3.0 && abs(det) > 0.0 && abs(drs) > 0.0 && sseU > 0.0
      when(ok, round((sseR - sseU) / (sseU / (n - lit(3.0))), 6))
    }
    val fAB = fStat(col("syl"), col("sxl"), col("sy"), col("syl2"),
      col("sylxl"), col("sxl2"), col("syly"), col("sxly"), col("syy"))
    val fBA = fStat(col("sxl"), col("syl"), col("sx"), col("sxl2"),
      col("sylxl"), col("syl2"), col("sxlx"), col("sylx"), col("sxx"))
    def verdict(f: Column): Column =
      when(f.isNull, "undefined")
        .when(f > 6.634897, "causal_1pct")
        .when(f > 3.841459, "causal_5pct")
        .otherwise("none")
    val one = m.select(n.cast("long").as("n"),
      fAB.as("f_ab"), fBA.as("f_ba"))
    one.select(lit(s"$keyA->$keyB").as("direction"), col("n"),
        col("f_ab").as("f_stat"), verdict(col("f_ab")).as("verdict"))
      .union(one.select(lit(s"$keyB->$keyA").as("direction"), col("n"),
        col("f_ba").as("f_stat"), verdict(col("f_ba")).as("verdict")))
  }

  /** Index of dispersion (variance-to-mean ratio of the hourly event
    * counts) + the Goh–Barabási burstiness coefficient (σ−μ)/(σ+μ) per
    * key — the "is this traffic Poisson or bursty" readout: D ≈ 1 is
    * Poisson, D ≫ 1 is bursty/clumped, D < 1 is regular; B ∈ (−1, 1)
    * normalizes the same contrast. Counts and their squares are exact
    * longs; mean/variance/ratios are fixed-order IEEE over them,
    * round@9. One (key, bucket) count pass + one key rollup. */
  def dispersion(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val c = df
      .groupBy(col(keyCol),
        expr(s"unix_micros(date_trunc('hour', $tsCol))").as("b"))
      .agg(count(lit(1)).as("c"))
    val m = c.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_buckets"),
      sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2"))
    val n = col("n_buckets").cast("double")
    val mean = col("s1").cast("double") / n
    val variance = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / n) / (n - lit(1.0))
    val sigma = sqrt(variance)
    m.filter(col("n_buckets") >= 2)
      .select(col(keyCol), col("n_buckets"), col("s1"), col("s2"),
        round(variance / mean, 9).as("dispersion"),
        round((sigma - mean) / (sigma + mean), 9).as("burstiness"))
  }

  /** Gaps-and-islands interval merge: each input row is an interval
    * [`startCol`, `endCol`] (µs-long columns); overlapping or touching
    * intervals within a key merge into islands. Returns one row per
    * island: (key, island, island_start, island_end, n_rows).
    *
    * The classic one-window formulation: a running max of `end` over
    * strictly-preceding rows (ordered by (start, id)) marks island
    * breaks where `start > cummax`, and a running sum of break flags
    * numbers the islands — integer-exact; the (key, island) aggregate
    * reuses the window's key exchange, so ONE exchange serves both.
    * Per-row state is O(1); islands
    * never materialize as arrays, so a key with a million intervals
    * costs the same per-row work as one with ten. */
  def mergeIntervals(
      df: DataFrame, keyCol: String, idCol: String,
      startCol: String, endCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(idCol))
    val prevMax = max(col(endCol))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df
      .withColumn("__brk",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__brk")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col(keyCol), col("__island").as("island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_rows"))
  }

  /** Classical additive seasonal decomposition per key over an hourly
    * grid: level = per-(key, hour-bucket) decimal mean of the raw
    * values; trend = centered moving average of the level over
    * ±`half` buckets (NULL until the window is full AND spans exactly
    * ±`half` HOURS — the classical edge convention, also enforced
    * across grid gaps so a missing bucket can never de-center the
    * average in time); seasonal = per-(key, hour-of-day) decimal mean
    * of the detrended level; residual = level − trend − seasonal.
    * The level takes ONE division+round into 1e-9-scaled longs and the
    * rest of the decomposition is exact integer arithmetic between
    * roundings, so the whole chain replays in SQL bit-for-bit.
    *
    * Exchanges: one (key, bucket) aggregate, one key window for the
    * trend (the seasonal (key, hour) aggregate reuses its exchange),
    * and a broadcast join of the (key × 24)-row seasonal frame back to
    * the buckets. Per-row window state is `2·half + 1` longs.
    *
    * Output: (key, b, level, trend, seasonal, residual) — b the hour
    * bucket timestamp-µs; trend/residual NULL at the edges. */
  def seasonalDecompose(
      df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      half: Int = 12): DataFrame = {
    require(half >= 1, s"half must be >= 1, got $half")
    val width = 2 * half + 1
    // level in 1e-9 units: ONE division+round per bucket, then the whole
    // decomposition stays in exact long arithmetic between roundings
    // (re-casting a rounded double to decimal risks tie-direction skew;
    // integers don't)
    val buckets = df.filter(col(valCol).isNotNull)
      .select(col(keyCol),
        (expr(s"unix_micros(date_trunc('hour', $tsCol))")).as("b"),
        col(valCol).cast("double").as("__x"))
      .groupBy(col(keyCol), col("b"))
      .agg(round(graft.Det.dsum(col("__x")) / count(lit(1)) * 1e9, 0)
        .cast("long").as("__l9"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("b"))
      .rowsBetween(-half, half)
    // a full-COUNT window over a gappy hourly grid would silently
    // de-center the average in TIME (25 rows no longer spanning ±12 h),
    // so the trend additionally requires the frame to span exactly
    // (width−1) hours — gaps yield NULL trend, the honest edge behavior
    val spanOk = max(col("b")).over(w) - min(col("b")).over(w) ===
      lit((width - 1) * 3600000000L)
    val trended = buckets
      .withColumn("__t9",
        when(count(lit(1)).over(w) === width && spanOk,
          round(sum(col("__l9")).over(w).cast("double") /
            lit(width.toDouble), 0).cast("long")))
    val seasonal = trended
      .filter(col("__t9").isNotNull)
      .groupBy(col(keyCol), expr("hour(timestamp_micros(b))").as("__h"))
      .agg(round(sum(col("__l9") - col("__t9")).cast("double") /
        count(lit(1)).cast("double"), 0).cast("long").as("__s9"))
    def out9(c: Column) = round(c.cast("double") / 1e9, 9)
    trended
      .withColumn("__h", expr("hour(timestamp_micros(b))"))
      .join(broadcast(seasonal), Seq(keyCol, "__h"), "left")
      .select(col(keyCol), col("b"), out9(col("__l9")).as("level"),
        out9(col("__t9")).as("trend"), out9(col("__s9")).as("seasonal"),
        out9(col("__l9") - col("__t9") - col("__s9")).as("residual"))
  }

  /** CUSUM change-point location per key: with the series x_1..x_n
    * (ordered by (`tsCol`, `idCol`), NULLs dropped) and mean μ, the
    * cumulative sum S_i = Σ_{j≤i}(x_j − μ) peaks in magnitude at the
    * most likely single change point (Page's statistic / binary
    * segmentation step). To stay engine-exact the operator never forms
    * μ: values become scaled longs v = round6(x)·10⁶ and the argmax of
    * |n·CS_i − i·T| (CS = running sum, T = series total) — equal to
    * n·|S_i| — is located in pure integer arithmetic. The reported
    * statistic |S_cp| divides back out as the ONE floating step,
    * rounded at 6 dp.
    *
    * Two exchanges: the key-partitioned window (running sum + row
    * index) and a (key)-grouped max-struct argmin/argmax selection;
    * the 1-row-per-key totals join is broadcast by AQE.
    *
    * Output: (key, n, cp_idx, cp_id, cusum_stat) — cp_idx is the
    * 1-based position i maximizing |S_i| (first such position on ties,
    * i < n; the last point is excluded since S_n ≡ 0 by construction). */
  /** Hampel filter: the rolling-window robust outlier detector (Hampel
    * 1974; the RECOMMENDED replacement for a rolling z-score, whose
    * mean AND stddev a single spike corrupts — the median/MAD pair has
    * a 50% breakdown point per window). Each row is compared against
    * the median of its ±k ROWS neighborhood; it is an outlier when
    * |x − med| > 3 · 1.4826 · MAD, the classic 3-sigma rule under the
    * Gaussian MAD-consistency constant.
    *
    * Exactness contract: values scale to 1e9 longs, the window width
    * 2k+1 is ODD so both the median and the MAD are SINGLE order
    * statistics (no interpolation, no even-count averaging ambiguity
    * between engines), and the decision inequality clears denominators
    * — |x−med|·10⁴ > 44478·MAD (3·1.4826 = 4.4478 exactly) — in
    * decimal(38,0) integer arithmetic (HUGEINT on the oracle side), so
    * the ×10⁴ multiply can NEVER wrap a long: the rule is exact over
    * the whole 1e9-scaled envelope |value| < ~9.2e9, where the scaling
    * cast itself is the loud boundary (ANSI double→long overflow in
    * Spark, Out of Range in the oracle — both raise, neither wraps).
    * Every emitted column is integer-exact.
    *
    * Shuffle shape: ONE key-partitioned exchange serves the single
    * bounded ROWS window; the collected frame is 2k+1 longs per row
    * (fixed memory regardless of series length). Edge rows with an
    * incomplete window are NOT scored (the documented Hampel edge
    * convention here) — `size(arr) == 2k+1` filters them. */
  def hampel(
      df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val width = 2 * k + 1
    val win = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-k, k)
    val v9 = round(col(valCol).cast("double") * 1e9, 0).cast("long")
    val arr = df.filter(col(valCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(idCol), v9.as("__v9"))
      .withColumn("__arr", collect_list(col("__v9")).over(win))
      .filter(size(col("__arr")) === width)
    val med9 = element_at(array_sort(col("__arr")), k + 1)
    val mad9 = element_at(
      array_sort(transform(col("__arr"), e => abs(e - col("__med9")))), k + 1)
    arr.withColumn("__med9", med9)
      .withColumn("__mad9", mad9)
      .select(col(keyCol), col(idCol),
        col("__med9").as("med9"), col("__mad9").as("mad9"),
        (abs(col("__v9").cast("decimal(38,0)") - col("__med9")) *
          lit(10000L) >
          lit(44478L) * col("__mad9").cast("decimal(38,0)"))
          .cast("int").as("is_out"))
  }

  /** Page–Hinkley drift detector per key (Page 1954; the sequential
    * mean-INCREASE monitor the online drift-detection literature — MOA,
    * river — ships as the default): over the series x_1..x_n ordered by
    * (`tsCol`, `idCol`), maintain m_t = Σ_{i≤t} (x_i − x̄_i − δ) where
    * x̄_i is the running mean up to i, and alarm the first time
    * m_t − min_{j≤t} m_j exceeds λ. Where [[cusum]] LOCATES the single
    * most likely change point retrospectively, Page–Hinkley answers the
    * monitoring question — "has the mean drifted up yet, and when could
    * we first have said so" — the same when-could-we-stop readout the
    * SPRT gives for rates (q99 precedent).
    *
    * Determinism contract: values become exact 1e6-scaled longs; each
    * deviation term (x_i − CS_i/i − δ) is ONE fixed-shape IEEE
    * expression over those exact longs (the cast long→double and the
    * divide are IEEE round-to-nearest in both engines, so the term is
    * bit-identical unconditionally — below ~2^53/1e6 rows·units per key
    * it is also exact), rounded to a 1e-9-unit long (the Kaplan–Meier
    * scaled-long-sum-of-rounded-terms idiom); the running sum, running
    * min and the λ comparison are then pure integer arithmetic —
    * engine-exact, order-independent given the total order. The alarm
    * inequality runs on scaled longs (`ph9 > round(λ·1e9)`), so an ulp
    * can never flip a decision across engines (the q66 threshold
    * convention).
    *
    * Shuffle shape: ONE key-partitioned exchange serves all three
    * cumulative windows (same ordering, same frame) plus the final
    * grouped rollup — the q20 cumulative shape; per-row state is O(1),
    * no series ever materializes in one buffer. Scale note (the
    * [[graft.operators.StatTests.sprtIncrements]] precedent): the
    * trajectory only needs ORDER, so at cluster scale feed per-interval
    * pre-aggregated means — the per-key window then runs over #intervals
    * bounded rows and the event stream reduces map-side first.
    *
    * Output per key: (key, n, ph_stat round@9 — the final
    * m_n − min m_j, first_alarm_n, first_alarm_id — first row index/id
    * where the statistic exceeded λ, NULL when it never did, alarmed). */
  def pageHinkley(
      df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, delta: Double, lambda: Double): DataFrame = {
    require(lambda > 0.0, s"lambda must be > 0, got $lambda")
    require(delta >= 0.0, s"delta must be >= 0, got $delta")
    val ord = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__i"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val src = df.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__t"),
        col(idCol).as("__i"),
        (graft.Det.dec(col(valCol)) * lit(1000000L)).cast("long").as("__v6"))
    val run = src
      .withColumn("__n", row_number().over(ord))
      .withColumn("__cs6", sum(col("__v6")).over(cum))
    // one IEEE expression per row over exact longs, then a scaled long
    val term9 = round((col("__v6").cast("double") / 1e6 -
      col("__cs6").cast("double") / (col("__n").cast("double") * 1e6) -
      lit(delta)) * 1e9, 0).cast("long")
    val lambda9 = math.round(lambda * 1e9)
    val m = run.withColumn("__term9", term9)
      .withColumn("__m9", sum(col("__term9")).over(cum))
      .withColumn("__min9", min(col("__m9")).over(cum))
      .withColumn("__ph9", col("__m9") - col("__min9"))
    m.groupBy(col("__k")).agg(
        count(lit(1)).as("n"),
        max(struct(col("__n").as("rn"), col("__ph9").as("ph9"))).as("__last"),
        min(when(col("__ph9") > lambda9,
          struct(col("__n").as("rn"), col("__i").as("id")))).as("__first"))
      .select(col("__k").as(keyCol), col("n"),
        round(col("__last.ph9").cast("double") / 1e9, 9).as("ph_stat"),
        col("__first.rn").as("first_alarm_n"),
        col("__first.id").as("first_alarm_id"),
        col("__first").isNotNull.as("alarmed"))
  }

  /** Augmented Dickey–Fuller unit-root test per series (constant, no
    * trend, lag order 1 — Dickey–Fuller 1979, the "is this series
    * mean-reverting or a random walk" question the correlogram
    * diagnostics ([[acf]], PACF) cannot answer: a unit root makes every
    * level-based statistic spurious). Regression Δy_t = α + γ·y_{t−1}
    * + δ·Δy_{t−1} + ε over each key's time order; the reported
    * statistic is t(γ̂) = γ̂ / SE(γ̂), compared against the asymptotic
    * constant-case Dickey–Fuller critical values −3.43 / −2.86 / −2.57
    * (1% / 5% / 10%) ON THE ROUND@6 VALUE (the q66 band convention —
    * an ulp cannot flip the label). γ significantly below 0 ⇒
    * stationary; γ ≈ 0 ⇒ unit root.
    *
    * Solve: the [[StatTests.ols2]] contract — exact decimal moments
    * ([[graft.Det]]) of (x2 = y_{t−1}, x3 = Δy_{t−1}, y = Δy_t) per
    * key, Cramer's rule on the 3×3 normal equations with the SAME
    * operand order as ols2 (gate-proven in q59/q63/q68), SE(γ̂) from
    * the 2,2 cofactor: Var(γ̂) = s²·(n·s33 − s3²)/det with
    * s² = SSE/(n−3). No iterative solver, no residual pass.
    *
    * Degenerates → NULL stat with n still reported: fewer than 4
    * usable points (n−3 ≤ 0), a singular system (det = 0 — constant
    * series), or a non-positive variance estimate (exact fit).
    *
    * Scale shape: one key-partitioned lag window (the q20 cumulative
    * shape — O(1) state per row), one grouped moment aggregate with
    * map-side combine, a #keys-row solve. Nothing buffers a series.
    * Output: (key, n, gamma round@9, adf_t round@6, verdict). */
  def adf(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__i"))
    val src = df.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__t"),
        col(idCol).as("__i"), col(valCol).cast("double").as("__v"))
    val lagged = src
      .withColumn("__vl", lag(col("__v"), 1).over(w))
      .withColumn("__dy", col("__v") - col("__vl"))
    val pts = lagged
      .withColumn("__dyl", lag(col("__dy"), 1).over(w))
      .filter(col("__vl").isNotNull && col("__dyl").isNotNull)
      .select(col("__k"), col("__vl").as("x2"), col("__dyl").as("x3"),
        col("__dy").as("y"))
    val m = pts.groupBy(col("__k")).agg(
      count(lit(1)).cast("double").as("n"),
      graft.Det.dsum(col("x2")).as("s2"),
      graft.Det.dsum(col("x3")).as("s3"),
      graft.Det.dsum(col("x2") * col("x2")).as("s22"),
      graft.Det.dsum(col("x2") * col("x3")).as("s23"),
      graft.Det.dsum(col("x3") * col("x3")).as("s33"),
      graft.Det.dsum(col("y")).as("sy"),
      graft.Det.dsum(col("x2") * col("y")).as("s2y"),
      graft.Det.dsum(col("x3") * col("y")).as("s3y"),
      graft.Det.dsum(col("y") * col("y")).as("syy"))
    def c(s: String): Column = col(s)
    val (det, _, b1, _, sse) = cramer3(c("n"), c("s2"), c("s3"), c("sy"),
      c("s22"), c("s23"), c("s33"), c("s2y"), c("s3y"), c("syy"))
    val cof22 = c("n") * c("s33") - c("s3") * c("s3")
    val varG = sse / when(c("n") > 3.0, c("n") - lit(3.0)) * cof22 /
      when(abs(det) > 0.0, det)
    val ok = c("n") > 3.0 && abs(det) > 0.0 && varG > 0.0
    val out = m
      .withColumn("gamma", when(ok, round(b1, 9)))
      .withColumn("adf_t", when(ok, round(b1 / sqrt(varG), 6)))
    out.select(col("__k").as(keyCol), c("n").cast("long").as("n"),
      col("gamma"), col("adf_t"),
      when(col("adf_t").isNull, "undefined")
        .when(col("adf_t") < -3.43, "stationary_1pct")
        .when(col("adf_t") < -2.86, "stationary_5pct")
        .when(col("adf_t") < -2.57, "stationary_10pct")
        .otherwise("unit_root").as("verdict"))
  }

  /** ONE definition of the trivariate Cramer solve ([[graft.operators
    * .StatTests.ols2]]'s exact operand order, q59/q63/q68-gated) shared
    * by [[adf]] and [[granger]]: determinants, coefficients and the SSE
    * expansion over moments (n, s2, s3, sy, s22, s23, s33, s2y, s3y,
    * syy). Divisions carry the NULL-when-zero divisor (ANSI throws on
    * double /0 where DuckDB yields NULL — NULL reproduces the oracle's
    * semantics: singular systems flow to NULL, then 'undefined').
    * Returns (det, b0, b1, b2, sse). */
  private def cramer3(n: Column, s2: Column, s3: Column, sy: Column,
      s22: Column, s23: Column, s33: Column, s2y: Column, s3y: Column,
      syy: Column): (Column, Column, Column, Column, Column) = {
    val det = n * (s22 * s33 - s23 * s23) -
      s2 * (s2 * s33 - s23 * s3) + s3 * (s2 * s23 - s22 * s3)
    val det1 = sy * (s22 * s33 - s23 * s23) -
      s2 * (s2y * s33 - s23 * s3y) + s3 * (s2y * s23 - s22 * s3y)
    val det2 = n * (s2y * s33 - s23 * s3y) -
      sy * (s2 * s33 - s23 * s3) + s3 * (s2 * s3y - s2y * s3)
    val det3 = n * (s22 * s3y - s2y * s23) -
      s2 * (s2 * s3y - s2y * s3) + sy * (s2 * s23 - s22 * s3)
    val detSafe = when(abs(det) > 0.0, det)
    val b0 = det1 / detSafe
    val b1 = det2 / detSafe
    val b2 = det3 / detSafe
    val sse = syy - lit(2.0) * (b0 * sy + b1 * s2y + b2 * s3y) +
      (b0 * b0 * n + b1 * b1 * s22 + b2 * b2 * s33 +
        lit(2.0) * b0 * b1 * s2 + lit(2.0) * b0 * b2 * s3 +
        lit(2.0) * b1 * b2 * s23)
    (det, b0, b1, b2, sse)
  }

  def cusum(
      df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val scaled = df.filter(col(valCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(idCol),
        (graft.Det.dec(col(valCol)) * lit(1000000L)).cast("long").as("__v6"))
    val run = scaled
      .withColumn("__i", row_number().over(ord))
      .withColumn("__cs",
        sum(col("__v6")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    val tot = run.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum(col("__v6")).as("__t"))
    // n·S_i scaled: |n·CS_i − i·T| — longs throughout (n ≤ 2^31 rows/key
    // at 10^6-scaled values would overflow; decimal(38,0) keeps it exact
    // with the same portable semantics)
    val joined = run.join(tot, keyCol)
      .filter(col("__i") < col("__n"))
      .withColumn("__ns",
        abs(col("__n").cast("decimal(38,0)") * col("__cs") -
          col("__i").cast("decimal(38,0)") * col("__t")))
    val best = joined.groupBy(col(keyCol)).agg(
      min(struct((col("__ns") * lit(-1)).as("neg"), col("__i").as("i"),
        col(idCol).as("id"))).as("b"),
      max(col("__n")).as("n0"))
    best.select(col(keyCol), col("n0").as("n"),
      col("b.i").as("cp_idx"), col("b.id").as("cp_id"),
      round((col("b.neg").cast("double") * -1.0) /
        (col("n0").cast("double") * 1e6), 6).as("cusum_stat"))
  }
}
