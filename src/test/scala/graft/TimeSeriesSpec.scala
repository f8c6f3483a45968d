package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

/** Hand fixtures for the time-series trio: ACF against closed-form
  * values, interval merging against an enumerable island layout, and
  * CUSUM against a planted level shift.
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("acf matches the closed-form lag-1 value on an alternating series") {
    import spark.implicits._
    // x = 1,-1,1,-1,1,-1 : lag-1 pairs are perfectly anti-correlated
    val df = (1 to 6).map(i =>
      ("a", i.toLong, i.toLong, if (i % 2 == 1) 1.0 else -1.0))
      .toDF("k", "t", "id", "v")
    val out = TimeSeries.acf(df, "k", "t", "id", "v", maxLag = 2)
      .orderBy("lag").collect()
    assert(out.length == 2)
    val lag1 = out(0)
    assert(lag1.getInt(1) == 1 && lag1.getLong(2) == 5L)
    assert(math.abs(lag1.getDouble(3) - (-1.0)) < 1e-9)
    // lag-2 pairs are perfectly correlated
    val lag2 = out(1)
    assert(lag2.getInt(1) == 2 && lag2.getLong(2) == 4L)
    assert(math.abs(lag2.getDouble(3) - 1.0) < 1e-9)
  }

  test("acf returns NULL under minPairs or zero variance, drops NULL values") {
    import spark.implicits._
    val df = Seq[(String, Long, Long, java.lang.Double)](
      ("const", 1L, 1L, 5.0), ("const", 2L, 2L, 5.0), ("const", 3L, 3L, 5.0),
      ("tiny", 1L, 1L, 1.0), ("tiny", 2L, 2L, 2.0),
      ("holes", 1L, 1L, 1.0), ("holes", 2L, 2L, null),
      ("holes", 3L, 3L, 2.0), ("holes", 4L, 4L, 1.0), ("holes", 5L, 5L, 2.0)
    ).toDF("k", "t", "id", "v")
    val rows = TimeSeries.acf(df, "k", "t", "id", "v", maxLag = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("const").isNullAt(3), "zero variance must yield NULL acf")
    assert(rows("tiny").isNullAt(3), "n_pairs=1 < minPairs=2 must yield NULL")
    // NULL dropped: holes series is 1,2,1,2 -> lag-1 pairs (2,1)(1,2)(2,1),
    // anti-correlated
    assert(rows("holes").getLong(2) == 3L)
    assert(rows("holes").getDouble(3) < 0.0)
  }

  test("mergeIntervals merges overlapping and touching, splits on gaps") {
    import spark.implicits._
    val df = Seq(
      // key a: [0,10] + [5,20] overlap; [20,30] touches; [40,50] gapped
      ("a", 1L, 0L, 10L), ("a", 2L, 5L, 20L), ("a", 3L, 20L, 30L),
      ("a", 4L, 40L, 50L),
      // key b: nested interval [0,100] contains [10,20]
      ("b", 5L, 0L, 100L), ("b", 6L, 10L, 20L)
    ).toDF("k", "id", "s", "e")
    val out = TimeSeries.mergeIntervals(df, "k", "id", "s", "e")
      .orderBy("k", "island")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 0L, 30L, 3L), ("a", 40L, 50L, 1L), ("b", 0L, 100L, 2L)))
  }

  test("cusum locates a planted level shift at its true boundary") {
    import spark.implicits._
    // 10 points: first 5 at 0, last 5 at 10 -> |S_i| peaks at i=5
    val df = (1 to 10).map(i =>
      ("a", i.toLong, i.toLong, if (i <= 5) 0.0 else 10.0))
      .toDF("k", "t", "id", "v")
    val r = TimeSeries.cusum(df, "k", "t", "id", "v").collect().head
    assert(r.getLong(1) == 10L)
    assert(r.getInt(2) == 5, s"cp_idx should be 5, got ${r.getInt(2)}")
    assert(r.getLong(3) == 5L)
    // S_5 = 5*(0-5) = -25 -> |S| = 25
    assert(math.abs(r.getDouble(4) - 25.0) < 1e-6)
  }

  test("pageHinkley alarms at the first post-shift point, hand-exact") {
    import spark.implicits._
    // key a: 4 points at 0 then 4 at 10 (upward shift); delta=0, lambda=5.
    // Terms x_i - mean_i: 0,0,0,0, 8, 20/3, 40/7, 5 -> m_5 = 8 > 5 first.
    // m_8 = 8 + 6.666666667 + 5.714285714 + 5 = 25.380952381 (round@9 each,
    // summed exactly); running min stays 0, so ph_stat = m_8.
    // key b: constant -> every term 0, never alarms.
    // key c: DOWNWARD shift -> terms negative, running min tracks m,
    // ph stays 0: the detector is one-sided by design.
    val rows =
      (1 to 8).map(i => ("a", i.toLong, i.toLong, if (i <= 4) 0.0 else 10.0)) ++
      (1 to 4).map(i => ("b", i.toLong, i.toLong, 7.5)) ++
      (1 to 8).map(i => ("c", i.toLong, i.toLong, if (i <= 4) 10.0 else 0.0))
    val out = TimeSeries.pageHinkley(rows.toDF("k", "t", "id", "v"),
        "k", "t", "id", "v", delta = 0.0, lambda = 5.0)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 8L)
    assert(math.abs(a.getDouble(2) - 25.380952381) < 1e-12)
    assert(a.getInt(3) == 5 && a.getLong(4) == 5L && a.getBoolean(5))
    val b = out("b")
    assert(b.getDouble(2) == 0.0 && b.isNullAt(3) && b.isNullAt(4) &&
      !b.getBoolean(5))
    val c = out("c")
    assert(c.getDouble(2) == 0.0 && !c.getBoolean(5),
      "downward shift must not trip the one-sided increase detector")
  }

  test("ccf: a planted 1-hour lead gives exactly 1.0 at lag 1") {
    import spark.implicits._
    val hourMs = 3600L * 1000L
    // x series on hours 0..9 with real variance; y = x delayed one hour
    val xs = (0 until 10).map(h =>
      ("a", new java.sql.Timestamp(h * hourMs), (h % 4 + 1).toDouble))
    val ys = (0 until 10).map(h =>
      ("b", new java.sql.Timestamp((h + 1) * hourMs), (h % 4 + 1).toDouble))
    val df = (xs ++ ys).toDF("k", "ts", "v")
    val r = TimeSeries.ccf(df, "k", "ts", "v", "a", "b", maxLag = 2)
      .orderBy("lag").collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(r(1).getDouble(2) == 1.0, s"perfect lag-1 echo: ${r(1)}")
    assert(r(0).getDouble(2) < 1.0, "lag 0 is misaligned")
    // pair counts shrink with the lag window overlap
    assert(r(0).getLong(1) == 9L && r(1).getLong(1) == 10L)
  }

  test("dispersion: constant counts give D=0/B=-1, a planted burst raises both") {
    import spark.implicits._
    val hourMs = 3600L * 1000L
    val even = (0 until 5).map(h => ("a", new java.sql.Timestamp(h * hourMs)))
    // counts 1,1,1,9: mean 3, var 16 -> D = 16/3, sigma 4 -> B = 1/7
    val bursty = (0 until 3).map(h => ("b", new java.sql.Timestamp(h * hourMs))) ++
      Seq.fill(9)(("b", new java.sql.Timestamp(3 * hourMs)))
    val df = (even ++ bursty).toDF("k", "ts")
    val r = TimeSeries.dispersion(df, "k", "ts")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getDouble(4) == 0.0 && r("a").getDouble(5) == -1.0)
    assert(math.abs(r("b").getDouble(4) - 16.0 / 3.0) < 1e-8, r("b").toString)
    assert(math.abs(r("b").getDouble(5) - 1.0 / 7.0) < 1e-8)
    assert(r("b").getLong(1) == 4L && r("b").getLong(2) == 12L &&
      r("b").getLong(3) == 84L)
  }

  test("hampel flags a planted spike against its window, not its neighbors") {
    import spark.implicits._
    // flat series with one spike: only the spike row trips the rule;
    // its neighbors see the spike in THEIR windows but their own
    // deviation is 0, and edge rows (incomplete window) are unscored
    val flat = Seq.tabulate(7)(i =>
      ("a", i.toLong, (i + 1).toLong, if (i == 3) 100.0 else 10.0))
      .toDF("g", "t", "id", "v")
    val out = TimeSeries.hampel(flat, "g", "t", "id", "v", k = 2)
      .orderBy("id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 4L, 5L), "scored ids")
    assert(out.map(_.getInt(4)).toSeq == Seq(0, 1, 0), "only the spike")
    // nonzero-MAD window: med 3, MAD 1, |100-3| >> 4.4478 * 1
    val mixed = Seq(("b", 1L, 1L, 1.0), ("b", 2L, 2L, 2.0),
      ("b", 3L, 3L, 100.0), ("b", 4L, 4L, 3.0), ("b", 5L, 5L, 4.0))
      .toDF("g", "t", "id", "v")
    val m = TimeSeries.hampel(mixed, "g", "t", "id", "v", k = 2).collect()
    assert(m.length == 1 && m.head.getLong(1) == 3L)
    assert(m.head.getLong(2) == 3000000000L, "med9")
    assert(m.head.getLong(3) == 1000000000L, "mad9")
    assert(m.head.getInt(4) == 1)
    // constant series: MAD 0 and deviation 0 — nothing flagged
    val const = Seq.tabulate(5)(i => ("c", i.toLong, i.toLong, 7.0))
      .toDF("g", "t", "id", "v")
    val c = TimeSeries.hampel(const, "g", "t", "id", "v", k = 2).collect()
    assert(c.length == 1 && c.head.getInt(4) == 0)
  }

  test("seasonalDecompose recovers a planted alternating season over a flat base") {
    import spark.implicits._
    // 5 days x 24 hourly points, value = 100 ± 5 alternating by hour:
    // no trend, zero-sum period-24 season
    val baseUs = 1700000000L * 1000000L
    val df = (0 until 120).map { i =>
      ("a", new java.sql.Timestamp((baseUs + i * 3600L * 1000000L) / 1000L),
        100.0 + (if (i % 2 == 0) 5.0 else -5.0))
    }.toDF("k", "ts", "v")
    val out = TimeSeries.seasonalDecompose(df, "k", "ts", "v", half = 12)
      .orderBy("b").collect()
    assert(out.length == 120)
    val full = out.filter(!_.isNullAt(3)) // rows with a full trend window
    assert(full.length == 120 - 24, "edges must have NULL trend")
    full.foreach { r =>
      val (level, trend, seasonal, residual) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // level is the raw value (one event per bucket)
      assert(math.abs(math.abs(level - 100.0) - 5.0) < 1e-9)
      // width-25 MA over a zero-sum period-24 season: base + season/25
      assert(math.abs(trend - 100.0) <= 5.0 / 25.0 + 1e-9,
        s"trend $trend strays from the flat base")
      // seasonal carries the planted sign at ~24/25 of the amplitude
      val planted = if (level > 100.0) 5.0 else -5.0
      assert(seasonal * planted > 0.0, s"seasonal $seasonal vs planted $planted")
      assert(math.abs(seasonal) > 4.0 && math.abs(seasonal) < 5.0)
      // additive identity holds to output rounding
      assert(math.abs(level - (trend + seasonal + residual)) < 3e-9)
    }
  }

  test("seasonalDecompose trend goes NULL across a grid gap, not de-centered") {
    import spark.implicits._
    // same flat±5 grid but hour 60 is MISSING: every ±12-row frame that
    // covers the gap no longer spans ±12 HOURS and must yield NULL trend
    val baseUs = 1700000000L * 1000000L
    val df = (0 until 120).filter(_ != 60).map { i =>
      ("a", new java.sql.Timestamp((baseUs + i * 3600L * 1000000L) / 1000L),
        100.0 + (if (i % 2 == 0) 5.0 else -5.0))
    }.toDF("k", "ts", "v")
    val out = TimeSeries.seasonalDecompose(df, "k", "ts", "v", half = 12)
      .orderBy("b").collect()
    assert(out.length == 119)
    // bucket index from the first bucket (baseUs itself is not
    // hour-aligned; date_trunc shifts every bucket by the same offset)
    val minB = out.map(_.getLong(1)).min
    val trendAt = out.map(r => (r.getLong(1) - minB) / 3600000000L ->
      !r.isNullAt(3)).toMap
    // frames touching the gap: buckets 48..72 (25-row window includes the
    // hole for any center within ±12 of hour 60) — all NULL
    ((48 to 59) ++ (61 to 72)).foreach { h =>
      assert(!trendAt(h), s"bucket $h spans the gap and must have NULL trend")
    }
    // far from the gap the full centered trend survives
    Seq(20, 30, 90, 100).foreach { h =>
      assert(trendAt(h), s"bucket $h is clear of the gap and must keep trend")
    }
  }

  test("cusum tie-breaks to the first peak position") {
    import spark.implicits._
    // symmetric bump: 0,10,0 -> S_1 = -10/3*... compute: mean = 10/3
    // S_1 = -10/3, S_2 = 10/3 -> tie in |S|; first position (i=1) wins
    val df = Seq(("a", 1L, 1L, 0.0), ("a", 2L, 2L, 10.0), ("a", 3L, 3L, 0.0))
      .toDF("k", "t", "id", "v")
    val r = TimeSeries.cusum(df, "k", "t", "id", "v").collect().head
    assert(r.getInt(2) == 1, s"tie must resolve to first peak, got ${r.getInt(2)}")
  }

  test("pacf3 equals a host-side Durbin-Levinson over its own r values; " +
      "degenerate series propagate NULL") {
    import spark.implicits._
    // deterministic wiggle with genuine structure at several lags
    val wiggle = (0 until 200).map { k =>
      ("w", k.toLong, k.toLong,
        math.sin(k * 0.7) * 5.0 + math.sin(k * 0.13) * 2.0 + k % 3)
    }
    val flat = (0 until 50).map(k => ("flat", k.toLong, k.toLong, 4.0))
    val df = (wiggle ++ flat).toDF("k", "t", "id", "v")
    val out = TimeSeries.pacf3(df, "k", "t", "id", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    val w = out("w")
    val (r1, r2, r3) = (w.getDouble(1), w.getDouble(2), w.getDouble(3))
    assert(w.getDouble(4) == math.rint(r1 * 1e6) / 1e6, "pacf1 IS r1")
    val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = r1 - p22 * r1
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    assert(math.abs(w.getDouble(5) - p22) < 1e-6, s"phi22: $w vs $p22")
    assert(math.abs(w.getDouble(6) - p33) < 1e-6, s"phi33: $w vs $p33")
    // an AR-ish decaying ACF keeps |pacf3| well below |pacf1|: the
    // cut-off property the plot pair exists for
    assert(math.abs(w.getDouble(6)) < math.abs(w.getDouble(4)) + 1.0)
    // constant series: zero variance -> r NULL -> every phi NULL
    val f = out("flat")
    assert(f.isNullAt(1) && f.isNullAt(4) && f.isNullAt(5) && f.isNullAt(6))
  }

  test("adf: random walk keeps the unit root, mean reversion rejects it, " +
      "degenerates read undefined") {
    import spark.implicits._
    // deterministic centered LCG draws in [-0.5, 0.5)
    val draws = Iterator.iterate(123456789L)(s => (s * 6364136223846793005L +
      1442695040888963407L) & 0x7fffffffffffffffL)
      .drop(1).take(400).map(s => (s % 100000L) / 100000.0 - 0.5).toVector
    // unit root: y_t = y_{t-1} + e_t (gamma = 0 in truth)
    val walk = draws.scanLeft(0.0)(_ + _).zipWithIndex.map {
      case (v, k) => ("walk", k.toLong, k.toLong, v)
    }
    // strong mean reversion: y_t = 0.1 y_{t-1} + e_t (gamma = -0.9)
    val revert = draws.scanLeft(0.0)((y, e) => 0.1 * y + e).zipWithIndex.map {
      case (v, k) => ("revert", k.toLong, k.toLong, v)
    }
    val const = (0 until 50).map(k => ("const", k.toLong, k.toLong, 3.0))
    val short = (0 until 4).map(k => ("short", k.toLong, k.toLong, k * 1.5))
    val out = TimeSeries.adf(
        (walk ++ revert ++ const ++ short).toDF("k", "t", "id", "v"),
        "k", "t", "id", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(out("walk").getString(4) == "unit_root",
      s"walk: ${out("walk")}")
    assert(out("revert").getString(4) == "stationary_1pct" &&
      math.abs(out("revert").getDouble(2) - (-0.9)) < 0.1,
      s"revert: ${out("revert")}")
    // constant series: x2 collinear with the intercept -> det = 0
    assert(out("const").getString(4) == "undefined" &&
      out("const").isNullAt(3))
    // 4 raw points leave n = 2 usable rows <= 3 -> undefined
    assert(out("short").getString(4) == "undefined")
  }

  test("granger: a planted lag-1 driver is causal one way, not the other") {
    import spark.implicits._
    // x = AR(1) with deterministic LCG shocks (Markov: its own lag
    // carries ALL its linear structure); y_t = 0.8 * x_{t-1} + tiny own
    // noise. x->y must reject hard; y->x must not — given x_{t-1},
    // y_{t-1} (~ x_{t-2}) adds nothing to an AR(1)
    def ts(h: Int) = new java.sql.Timestamp(h * 3600L * 1000L)
    val draws = Iterator.iterate(987654321L)(s => (s * 6364136223846793005L +
      1442695040888963407L) & 0x7fffffffffffffffL)
      .drop(1).take(400).map(s => (s % 100000L) / 100000.0 - 0.5).toVector
    val xv = draws.take(200).scanLeft(0.0)((x, e) => 0.5 * x + e).drop(1)
    val xs = xv.zipWithIndex.map { case (v, h) => ("a", ts(h), v) }
    val ys = (0 until 200).map { h =>
      val xPrev = if (h == 0) 0.0 else xv(h - 1)
      ("b", ts(h), 0.8 * xPrev + draws(200 + h) * 0.02)
    }
    val out = TimeSeries.granger((xs ++ ys).toDF("k", "ts", "v"),
        "k", "ts", "v", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a->b").getString(3) == "causal_1pct", s"${out("a->b")}")
    assert(out("b->a").getString(3) == "none", s"${out("b->a")}")
    // degenerate: constant series -> singular system -> undefined
    val const = (0 until 50).map(h => ("c", ts(h), 2.0)) ++
      (0 until 50).map(h => ("d", ts(h), h.toDouble))
    val u = TimeSeries.granger(const.toDF("k", "ts", "v"),
        "k", "ts", "v", "c", "d")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(u("c->d").getString(3) == "undefined" &&
      u("d->c").getString(3) == "undefined")
  }
}
