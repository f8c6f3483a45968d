package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StatTests

/** Closed-form fixtures for the two-sample test family. */
class StatTestsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("welch t matches the hand-computed statistic and df") {
    import spark.implicits._
    // a = {1,2,3}: mean 2, var 1; b = {2,4,6}: mean 4, var 4
    // se2 = 1/3 + 4/3; t = -2/sqrt(5/3); df = (5/3)^2 / ((1/9+16/9)/2) = 50/17
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++ Seq(2.0, 4.0, 6.0).map(("b", _)))
      .toDF("g", "v")
    val r = StatTests.welchPairs(df, "g", "v").collect().head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(math.abs(r.getDouble(4) - (-2.0 / math.sqrt(5.0 / 3.0))) < 1e-6)
    assert(math.abs(r.getDouble(5) - 50.0 / 17.0) < 1e-6)
  }

  test("psi: identical halves read exactly 0/stable; a total shift reads shifted") {
    import spark.implicits._
    // key "same": the current window repeats the reference values exactly
    // -> every bin's p = q, every term 0, psi = 0.0.
    // key "move": reference 1..100 (decile edges 10,20,...,90), current
    // 1001..1100 — all current mass lands in bin 9 (p_9 = 11/100: values
    // 90..100), the other bins' q floors at 1e-4.
    val same = (1 to 100).map(i => ("same", i.toLong, i.toDouble)) ++
      (1 to 100).map(i => ("same", 100L + i, i.toDouble))
    val move = (1 to 100).map(i => ("move", i.toLong, i.toDouble)) ++
      (1 to 100).map(i => ("move", 100L + i, 1000.0 + i))
    val out = StatTests.psi((same ++ move).toDF("k", "us", "v"),
      "k", "us", "v").collect().map(r => r.getString(0) -> r).toMap
    val s = out("same")
    assert(s.getLong(1) == 100L && s.getLong(2) == 100L)
    assert(s.getDouble(3) == 0.0 && s.getString(4) == "stable")
    // mirror the operator's exact arithmetic: per-term round to a 1e-9
    // long, exact sum, final round@6
    def term9(p: Double, q: Double): Long = {
      val p2 = math.max(p, 1e-4); val q2 = math.max(q, 1e-4)
      math.round((p2 - q2) * math.log(p2 / q2) * 1e9)
    }
    val expected = BigDecimal(
      (term9(0.09, 0.0) + (1 to 8).map(_ => term9(0.10, 0.0)).sum +
        term9(0.11, 1.0)).toDouble / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val m = out("move")
    assert(m.getDouble(3) == expected, s"psi ${m.getDouble(3)} != $expected")
    assert(m.getDouble(3) > 2.0 && m.getString(4) == "shifted")

    // the fixed-bin scale path on the same fixtures: identical halves are
    // exactly 0; the shift clamps all current mass into edge bin 9 —
    // ref 1..100 spreads exactly 10 per 9.9-wide bin, so p = 0.1 each
    val fx = StatTests.psiFixed((same ++ move).toDF("k", "us", "v"),
      "k", "us", "v").collect().map(r => r.getString(0) -> r).toMap
    assert(fx("same").getDouble(3) == 0.0 &&
      fx("same").getString(4) == "stable")
    val expectedFx = BigDecimal(
      ((1 to 9).map(_ => term9(0.10, 0.0)).sum +
        term9(0.10, 1.0)).toDouble / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fx("move").getDouble(3) == expectedFx,
      s"psiFixed ${fx("move").getDouble(3)} != $expectedFx")
    assert(fx("move").getString(4) == "shifted")

    // overflow guard: near-constant reference (w = 1e-7) with a current
    // value ~3e9 bin-widths out of range — the clamp runs on the double
    // ratio BEFORE any integer cast, so this lands in bin 9 instead of
    // throwing ANSI CAST_OVERFLOW
    val wild = Seq(("w", 1L, 0.0), ("w", 2L, 1e-6), ("w", 3L, 0.0),
      ("w", 4L, 1e-6), ("w", 5L, 300.0), ("w", 6L, 300.0))
    val fw = StatTests.psiFixed(wild.toDF("k", "us", "v"), "k", "us", "v")
      .collect()
    assert(fw.length == 1 && fw.head.getString(4) == "shifted",
      fw.mkString(","))
  }

  test("welch t emits NULL, not NaN/Inf, for n=1 and zero-variance pairs") {
    import spark.implicits._
    // c has a single observation: (n-1) = 0 would divide by zero
    val single = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++ Seq(5.0).map(("c", _)))
      .toDF("g", "v")
    val r1 = StatTests.welchPairs(single, "g", "v").collect().head
    assert(r1.isNullAt(4) && r1.isNullAt(5),
      "single-observation side must yield NULL t_stat/t_df")
    // both groups constant: se2 = 0 would make t = x/0
    val flat = (Seq(2.0, 2.0).map(("a", _)) ++ Seq(3.0, 3.0).map(("b", _)))
      .toDF("g", "v")
    val r2 = StatTests.welchPairs(flat, "g", "v").collect().head
    assert(r2.isNullAt(4) && r2.isNullAt(5),
      "zero-variance pair must yield NULL t_stat/t_df")
  }

  test("mann-whitney: fully separated groups and tie handling") {
    import spark.implicits._
    val sep = (Seq(1.0, 2.0, 3.0).map(("x", _)) ++ Seq(4.0, 5.0, 6.0).map(("y", _)))
      .toDF("g", "v")
    val r = StatTests.mannWhitney(sep, "g", "v", "x", "y").collect().head
    assert(r.getLong(2) == 0L, "all x below all y -> U1 = 0")
    assert(r.getLong(3) == 18L) // 2*n1*n2
    // z = -9 / (2*sqrt(9*7/12))
    assert(math.abs(r.getDouble(4) - (-9.0 / (2.0 * math.sqrt(5.25)))) < 1e-6)

    // rank-biserial ≡ Cliff's delta: all x below all y -> r = -1
    assert(r.getDouble(5) == -1.0, r.toString)

    val tied = (Seq(1.0, 1.0).map(("x", _)) ++ Seq(1.0, 2.0).map(("y", _)))
      .toDF("g", "v")
    val rt = StatTests.mannWhitney(tied, "g", "v", "x", "y").collect().head
    assert(rt.getLong(2) == 2L, s"U1 must be 1 (x2 scale 2), got ${rt.getLong(2)}")
    // U1 = 1 of n1*n2 = 4 -> r = 2*1/4 - 1 = -0.5
    assert(rt.getDouble(5) == -0.5, rt.toString)
  }

  test("binned rank-test twins: quantization collapses within-bin values " +
      "to ties, on-grid input reproduces the exact statistic, constant " +
      "column degenerates like the exact form") {
    import spark.implicits._
    // Values already ON a 2-bin grid (lo=0, hi=10, nBins=2: bin edge at
    // 5): binned == exact because no two values share a bin boundary
    // crossing. x = {0, 1}, y = {9, 10} -> fully separated in both forms.
    val sep = (Seq(0.0, 1.0).map(("x", _)) ++ Seq(9.0, 10.0).map(("y", _)))
      .toDF("g", "v")
    val mb = StatTests.mannWhitneyBinned(sep, "g", "v", "x", "y", nBins = 2)
      .collect().head
    assert(mb.getLong(2) == 0L, "all x in bin 0, all y in bin 1 -> U1 = 0")
    assert(mb.getDouble(5) == -1.0, "rank-biserial -1 on separation")
    // Within-bin collapse: {1.0, 1.4} vs {1.6, 2.0} with 2 bins over
    // [1, 2] -> bins {0, 0} vs {1, 1}: binned MW sees full separation
    // even though exact values interleave near the midpoint.
    val near = (Seq(1.0, 1.4).map(("x", _)) ++ Seq(1.6, 2.0).map(("y", _)))
      .toDF("g", "v")
    val nb = StatTests.mannWhitneyBinned(near, "g", "v", "x", "y", nBins = 2)
      .collect().head
    assert(nb.getLong(2) == 0L, s"bin split at 1.5 separates, got $nb")
    // KS on the grid: D over bin CDF. x={0,1} y={9,10}, 2 bins -> D=1.
    val kb = StatTests.ksTestBinned(sep, "g", "v", "x", "y", nBins = 2)
      .collect().head
    assert(kb.getDouble(3) == 1.0, s"binned D must be 1, got $kb")
    // CvM identical-sample zero survives binning.
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val cb = StatTests.cvmTestBinned(same, "g", "v", "a", "b", nBins = 4)
      .collect().head
    assert(cb.getDouble(2) == 0.0)
    // Constant column: zero-width support -> one tie -> NULL z exactly
    // like the exact form on constant input.
    val flat = (Seq(5.0, 5.0).map(("x", _)) ++ Seq(5.0, 5.0).map(("y", _)))
      .toDF("g", "v")
    val fb = StatTests.mannWhitneyBinned(flat, "g", "v", "x", "y", nBins = 8)
      .collect().head
    assert(fb.isNullAt(4), "constant column -> NULL z")
    // JT: dose sizes are binning-invariant; upward trend on-grid
    // reproduces the exact J.
    val up = Seq((0, 1.0), (0, 2.0), (1, 11.0), (1, 12.0),
      (2, 21.0), (2, 22.0)).toDF("dose", "v")
    val je = StatTests.jonckheereTerpstra(up, "dose", "v", Seq(0, 1, 2))
      .collect().head
    val jb = StatTests.jonckheereTerpstraBinned(up, "dose", "v",
      Seq(0, 1, 2), nBins = 3).collect().head
    assert(jb.getLong(1) == je.getLong(1),
      s"on-grid JT 2J must match exact: ${jb.getLong(1)} vs ${je.getLong(1)}")
    assert(jb.getLong(0) == je.getLong(0), "n is binning-invariant")
  }

  test("tukey hsd: q = -3*sqrt(3) on the textbook thirds; Kramer handles a " +
      "singleton via pooled MSW; zero within-variance is NULL") {
    import spark.implicits._
    val base = Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(4.0, 5.0, 6.0).map(("b", _)) ++ Seq(7.0, 8.0, 9.0).map(("c", _))
    // MSW = 6/(9-3) = 1; pair (a,b): diff -3, se = sqrt(1/2*(2/3)) ->
    // q = -3*sqrt(3)
    val r = StatTests.tukeyHsd(base.toDF("g", "v"), "g", "v")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(r.size == 3)
    assert(math.abs(r(("a", "b")).getDouble(5) - (-3.0 * math.sqrt(3.0))) < 1e-5)
    assert(math.abs(r(("a", "c")).getDouble(5) - (-6.0 * math.sqrt(3.0))) < 1e-5)
    assert(r(("a", "b")).getDouble(4) == -3.0) // mean_diff
    // Kramer form: a singleton group still pairs (pooled MSW carries it)
    val withSingle = base ++ Seq(("s", 99.0))
    val rs = StatTests.tukeyHsd(withSingle.toDF("g", "v"), "g", "v")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(rs.size == 6)
    // MSW = 6/(10-4) = 1; (a,s): diff -97, se = sqrt(1/2*(1/3+1))
    assert(math.abs(rs(("a", "s")).getDouble(5) -
      (-97.0 / math.sqrt(2.0 / 3.0))) < 1e-4, rs(("a", "s")).toString)
    // all groups constant -> SSW = 0 -> q NULL, pairs still emitted
    val flat = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
    val rf = StatTests.tukeyHsd(flat.toDF("g", "v"), "g", "v").collect()
    assert(rf.length == 1 && rf.head.isNullAt(5) &&
      rf.head.getDouble(4) == -1.0)
  }

  test("cochran-armitage: z = 1.6*sqrt(5) on the linear-dose table, sign " +
      "flips with the trend, degenerates are NULL") {
    import spark.implicits._
    def level(w: Long, n: Int, r: Int) =
      (0 until n).map(i => (w, if (i < r) 1L else 0L))
    // (w, n, r) = (0,10,1), (1,10,5), (2,10,9): closed form 1.6*sqrt(5)
    val up = (level(0, 10, 1) ++ level(1, 10, 5) ++ level(2, 10, 9))
      .toDF("w", "s")
    val r = StatTests.cochranArmitage(up, "w", "s").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 30L && r.getLong(2) == 15L)
    assert(math.abs(r.getDouble(3) - 1.6 * math.sqrt(5.0)) < 1e-6, r.toString)
    // reversed dose order flips the sign exactly
    val down = (level(2, 10, 1) ++ level(1, 10, 5) ++ level(0, 10, 9))
      .toDF("w", "s")
    val rd = StatTests.cochranArmitage(down, "w", "s").collect().head
    assert(math.abs(rd.getDouble(3) + 1.6 * math.sqrt(5.0)) < 1e-6, rd.toString)
    // flat proportions -> z = 0
    val flat = (level(0, 10, 4) ++ level(1, 10, 4) ++ level(2, 10, 4))
      .toDF("w", "s")
    assert(StatTests.cochranArmitage(flat, "w", "s")
      .collect().head.getDouble(3) == 0.0)
    // all failures / single dose level -> NULL, 1 row
    val zeroes = level(0, 5, 0) ++ level(1, 5, 0)
    assert(StatTests.cochranArmitage(zeroes.toDF("w", "s"), "w", "s")
      .collect().head.isNullAt(3))
    val oneLevel = level(3, 10, 5)
    assert(StatTests.cochranArmitage(oneLevel.toDF("w", "s"), "w", "s")
      .collect().head.isNullAt(3))
  }

  test("BH FDR rejects exactly the shifted pairs, step-up rule holds") {
    import spark.implicits._
    // a and b share a distribution; c sits far above both — the two
    // c-pairs must reject, the (a, b) pair must not
    val rows = (1 to 30).map(i => ("a", i.toDouble)) ++
      (1 to 30).map(i => ("b", i.toDouble + 0.5)) ++
      (1 to 30).map(i => ("c", i.toDouble + 1000.0))
    val out = StatTests.mannWhitneyPairsFdr(rows.toDF("g", "v"), "g", "v")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(3), r.getLong(4), r.getBoolean(6)))).toMap
    assert(out.size == 3)
    assert(out(("a", "c"))._3 && out(("b", "c"))._3,
      s"shifted pairs must reject: $out")
    assert(!out(("a", "b"))._3, s"null pair must survive: $out")
    // step-up contract: rejected ranks form a prefix of the p-order
    val ranksRejected = out.values.filter(_._3).map(_._2).toSeq.sorted
    assert(ranksRejected == (1L to ranksRejected.length).toSeq,
      s"rejections must be the smallest-p prefix: $out")
    // p-values live in [0, 1] and the separated pairs are extreme
    assert(out.values.forall(v => v._1 >= 0.0 && v._1 <= 1.0))
    assert(out(("a", "c"))._1 < 1e-6)
  }

  test("theil-sen ignores a wild outlier that would wreck the OLS line") {
    import spark.implicits._
    // points on y = 2x + 1 over x = hours; one wild outlier at the end.
    // ids chosen so every md5 2-hex prefix is below the 'ff' threshold
    // (no thinning in the test). ts in µs: hour h -> h * 3.6e9
    val rows = (0 until 9).map { h =>
      ("a", new java.sql.Timestamp(h * 3600L * 1000L), h.toLong, 2.0 * h + 1.0)
    } :+ (("a", new java.sql.Timestamp(9 * 3600L * 1000L), 9L, 1000.0))
    val df = rows.toDF("g", "ts", "id", "v")
    val r = StatTests.theilSen(df, "g", "ts", "id", "v", sampleUpper = "ff")
      .collect().head
    assert(r.getLong(1) == 10L && r.getLong(2) == 45L,
      s"10 points, 45 time-distinct pairs: $r")
    // 36 of 45 pairwise slopes are exactly 2.0 (outlier touches only 9),
    // so the median slope is 2 and the median residual is 1
    assert(r.getDouble(3) == 2.0, s"slope must shrug off the outlier: $r")
    assert(r.getDouble(4) == 1.0, s"intercept from clean residuals: $r")
  }

  test("budget lottery keeps ~the same point count at two corpus sizes") {
    import spark.implicits._
    // the scale-adaptive lever: a 1x corpus and its 8x replica must thin
    // to roughly the SAME kept sample (the hand-tuned hex constant would
    // keep 8x the points and square the slope-frame cost)
    def corpus(n: Int) = (0 until n).map { k =>
      ("g", new java.sql.Timestamp(k * 3600L * 1000L), k.toLong,
        math.sin(k * 0.37) * 10.0 + k * 0.01)
    }.toDF("g", "ts", "id", "v")
    val target = 100
    val small = StatTests.theilSenBudget(corpus(800), "g", "ts", "id", "v",
      targetPoints = target).collect().head
    val big = StatTests.theilSenBudget(corpus(6400), "g", "ts", "id", "v",
      targetPoints = target).collect().head
    val (nSmall, nBig) = (small.getLong(1), big.getLong(1))
    // both within a generous binomial band around the budget...
    assert(nSmall > target / 2 && nSmall < target * 2, s"small kept $nSmall")
    assert(nBig > target / 2 && nBig < target * 2, s"big kept $nBig")
    // ...and the 8x corpus does NOT keep 8x the points
    assert(nBig < nSmall * 3,
      s"budget must hold across scale: $nSmall -> $nBig at 8x rows")
    // groups under budget keep (essentially) everything: tau clamps at
    // the full 8-hex range
    val tiny = StatTests.theilSenBudget(corpus(40), "g", "ts", "id", "v",
      targetPoints = target).collect().head
    assert(tiny.getLong(1) == 40L, s"under-budget group kept ${tiny.getLong(1)}")
    // mann-kendall rides the same lottery: kept n agrees with theil-sen
    val mk = StatTests.mannKendallBudget(corpus(6400), "g", "ts", "id", "v",
      targetPoints = target).collect().head
    assert(mk.getLong(1) == nBig, s"same selection both estimators: $mk")
  }

  test("mann-kendall: monotone series max out S, ties correct the variance") {
    import spark.implicits._
    def series(g: String, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, h) => (g, new java.sql.Timestamp(h * 3600L * 1000L), h.toLong, v)
    }
    val df = (series("up", (0 until 10).map(_.toDouble)) ++
      series("down", (0 until 10).map(i => -i.toDouble)) ++
      series("flat", Seq.fill(10)(7.0)))
      .toDF("g", "ts", "id", "v")
    val r = StatTests.mannKendall(df, "g", "ts", "id", "v",
        sampleUpper = "zz")
      .collect().map(x => x.getString(0) -> x).toMap
    // strictly increasing: every one of the 45 pairs is concordant
    assert(r("up").getLong(2) == 45L && r("down").getLong(2) == -45L)
    assert(r("up").getDouble(3) > 0 && r("down").getDouble(3) ==
      -r("up").getDouble(3), "symmetric z")
    // var = n(n-1)(2n+5)/18 = 10*9*25/18 = 125; z = 44/sqrt(125)
    assert(math.abs(r("up").getDouble(3) - 44.0 / math.sqrt(125.0)) < 1e-6)
    assert(r("up").getDouble(4) < 0.001, "trend is significant")
    // all-tied series: S = 0, z = 0, p = 1
    assert(r("flat").getLong(2) == 0L && r("flat").getDouble(3) == 0.0)
    // the A&S polynomial carries |error| < 7.5e-8, so p(z=0) is 1
    // only to that accuracy
    assert(r("flat").getDouble(4) > 0.999999)
    // tie correction: 5 pairs of tied values -> tcorr = 5*2*1*9 = 90,
    // var = (10*9*25 - 90)/18 = 120; S counts only strict rises
    val tied = series("t", Seq(0, 0, 1, 1, 2, 2, 3, 3, 4, 4)
      .map(_.toDouble)).toDF("g", "ts", "id", "v")
    val rt = StatTests.mannKendall(tied, "g", "ts", "id", "v",
      sampleUpper = "zz").collect().head
    assert(rt.getLong(2) == 40L, s"concordant minus tied: $rt")
    assert(math.abs(rt.getDouble(3) - 39.0 / math.sqrt(120.0)) < 1e-6)
  }

  test("anderson-darling matches a host-side recomputation and ranks tails") {
    import spark.implicits._
    // deterministic pseudo-normal sample (inverse-CDF-free: sums of
    // uniforms) vs a heavy-tailed one; both n = 60
    val rng = (1 to 180).map(i => ((i * 2654435761L) % 1000).toDouble / 1000.0)
    val normish = rng.grouped(3).map(_.sum).toSeq // Irwin-Hall(3): bell-ish
    val heavy = (1 to 60).map(i => if (i % 11 == 0) i * 5.0 else i % 7 * 0.1)
    val df = (normish.zipWithIndex.map { case (v, i) => ("n", i.toLong, v) } ++
      heavy.zipWithIndex.map { case (v, i) => ("h", i.toLong, v) })
      .map { case (g, i, v) =>
        (g, new java.sql.Timestamp(i * 1000L), i, v) }
      .toDF("g", "ts", "id", "v")
    val out = StatTests.andersonDarling(df, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("n").getLong(1) == 60L)
    // the bell-ish sample must look far more normal than the spiky one
    assert(out("n").getDouble(2) < out("h").getDouble(2))
    // host-side recomputation of A2 for the bell-ish group (same
    // formula, independent code path: plain Scala over sorted values)
    val xs = normish.sorted
    val n = xs.length
    val mean = xs.sum / n
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    def tail(az: Double): Double = {
      val t = 1.0 / (1.0 + 0.2316419 * az)
      (math.exp(-az * az / 2.0) / 2.5066282746310002) *
        (((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t -
          0.356563782) * t + 0.319381530) * t)
    }
    def phi(z: Double): Double = if (z < 0) tail(-z) else 1.0 - tail(z)
    val s6 = xs.zipWithIndex.map { case (x, i0) =>
      val z = (x - mean) / sd
      val i = i0 + 1
      math.round(((2 * i - 1) * math.log(phi(z)) +
        (2 * (n - i) + 1) * math.log(1.0 - phi(z))) * 1e6)
    }.sum
    val a2Host = -n.toDouble - (s6.toDouble / 1e6) / n
    assert(math.abs(out("n").getDouble(2) - a2Host) < 1e-5,
      s"engine ${out("n").getDouble(2)} vs host $a2Host")
    // degenerate guards: tiny and constant groups are dropped
    val bad = Seq(("s", 1L, 1.0), ("s", 2L, 2.0),
      ("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0), ("c", 4L, 5.0),
      ("c", 5L, 5.0), ("c", 6L, 5.0), ("c", 7L, 5.0), ("c", 8L, 5.0))
      .map { case (g, i, v) => (g, new java.sql.Timestamp(i), i, v) }
      .toDF("g", "ts", "id", "v")
    assert(StatTests.andersonDarling(bad, "g", "v").count() == 0L)
  }

  test("kaplan-meier matches the textbook curve with censoring and a wipe") {
    import spark.implicits._
    // durations: 1 death, 2 death, 3 censored, 4 death
    // S(1)=3/4, S(2)=3/4*2/3=1/2, S(4)=0 (last subject dies: full wipe)
    val df = Seq((1L, false), (2L, false), (3L, true), (4L, false))
      .toDF("dur", "cens")
    val out = graft.operators.Survival.kaplanMeier(df, "dur", "cens")
      .orderBy("t").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L),
      "censor times must not create steps")
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 3L, 1L), "risk set sizes")
    assert(math.abs(out(0).getDouble(4) - 0.75) < 1e-6)
    assert(math.abs(out(1).getDouble(4) - 0.5) < 1e-6)
    assert(out(2).getDouble(4) == 0.0 && out(2).isNullAt(3),
      "full wipe must give exact 0 survival and NULL log")
    // tied deaths: {1,1 deaths; 2 censored; 3 death} -> S(1) = 2/4
    val tied = Seq((1L, false), (1L, false), (2L, true), (3L, false))
      .toDF("dur", "cens")
    val t0 = graft.operators.Survival.kaplanMeier(tied, "dur", "cens")
      .orderBy("t").collect().head
    assert(t0.getLong(2) == 2L && math.abs(t0.getDouble(4) - 0.5) < 1e-6)
  }

  test("nelson-aalen: textbook hazard steps as exact longs; censoring shrinks " +
      "risk sets; a full wipe is a finite increment, not a NULL") {
    import spark.implicits._
    // {1,2,3} all dead: H = 1/3, 1/3+1/2, +1 -> h9 exact longs
    val plain = Seq((1L, false), (2L, false), (3L, false)).toDF("dur", "c")
    val r = graft.operators.Survival.nelsonAalen(plain, "dur", "c")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(3) == 333333333L)
    assert(r(2L).getLong(3) == 333333333L + 500000000L)
    assert(r(3L).getLong(3) == 833333333L + 1000000000L)
    assert(r(3L).getDouble(4) == 1.833333)
    // censored at 2: leaves the risk set silently; t=3 jumps by 1/1
    val cens = Seq((1L, false), (2L, true), (3L, false)).toDF("dur", "c")
    val rc = graft.operators.Survival.nelsonAalen(cens, "dur", "c")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(rc.keySet == Set(1L, 3L), "censor-only times emit no step")
    assert(rc(3L).getLong(3) == 333333333L + 1000000000L)
    // whole risk set dies: increment is exactly 1 — KM logs NULL there,
    // NA stays finite (the additive formulation's advantage)
    val wipe = Seq((7L, false), (7L, false)).toDF("dur", "c")
    val rw = graft.operators.Survival.nelsonAalen(wipe, "dur", "c")
      .collect().head
    assert(rw.getLong(3) == 1000000000L && rw.getDouble(4) == 1.0)
  }

  test("mutual information: 1 bit for a perfect 2x2 dependence, 0 for independence") {
    import spark.implicits._
    val dep = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))).toDF("r", "c")
    val rd = StatTests.mutualInfo(dep, "r", "c").collect().head
    assert(math.abs(rd.getLong(0) / 1e9 - 1.0) < 1e-6, s"got ${rd.getLong(0) / 1e9}")
    assert(rd.getLong(1) == 20L)
    val ind = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(5)(("b", "y"))).toDF("r", "c")
    val ri = StatTests.mutualInfo(ind, "r", "c").collect().head
    assert(ri.getLong(0) == 0L, s"independent table must give MI = 0, got ${ri.getLong(0)}")
  }

  test("poisson bootstrap: deterministic replicates centered on the true mean") {
    import spark.implicits._
    val n = 2000
    // values 1..n: true mean (n+1)/2, sd ~ n/sqrt(12)
    val df = (1 to n).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val reps = graft.operators.Bootstrap.meansCI(df, "id", "v", 16)
      .orderBy("r").collect()
    assert(reps.length == 16)
    val trueMean = (n + 1) / 2.0
    val se = (n / math.sqrt(12.0)) / math.sqrt(n.toDouble) // sd/sqrt(n)
    reps.foreach { r =>
      // n_eff ~ Poisson(n): within 5 sigma of n
      assert(math.abs(r.getLong(1) - n) < 5 * math.sqrt(n.toDouble),
        s"replicate ${r.getInt(0)} n_eff ${r.getLong(1)}")
      // each replicate mean within 6 standard errors of the truth
      assert(math.abs(r.getDouble(2) - trueMean) < 6 * se,
        s"replicate ${r.getInt(0)} mean ${r.getDouble(2)} vs $trueMean")
    }
    // the replicates actually vary (it IS a resampling distribution)...
    assert(reps.map(_.getDouble(2)).distinct.length > 1)
    // ...and re-running reproduces them bit-for-bit
    val again = graft.operators.Bootstrap.meansCI(df, "id", "v", 16)
      .orderBy("r").collect()
    assert(reps.map(_.getDouble(2)).toSeq == again.map(_.getDouble(2)).toSeq)
  }

  test("ols2 recovers an exact plane: y = 2 + 3*x2 - 5*x3, R2 = 1") {
    import spark.implicits._
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (2.0, 1.0))
    val df = pts.map { case (x2, x3) => (x2, x3, 2.0 + 3.0 * x2 - 5.0 * x3) }
      .toDF("x2", "x3", "y")
    val r = StatTests.ols2(df, "x2", "x3", "y").collect().head
    assert(r.getLong(0) == 5L)
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-8, s"b0 = ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-8, s"b1 = ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - (-5.0)) < 1e-8, s"b2 = ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-8, s"r2 = ${r.getDouble(4)}")
  }

  test("ridge2: lambda=0 is OLS bit-for-bit; shrinkage orders slopes and R2") {
    import spark.implicits._
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (2.0, 1.0),
      (2.0, 3.0), (4.0, 1.0))
    val df = pts.map { case (x2, x3) => (x2, x3, 2.0 + 3.0 * x2 - 5.0 * x3) }
      .toDF("x2", "x3", "y")
    val ols = StatTests.ols2(df, "x2", "x3", "y").collect().head
    val r0 = StatTests.ridge2(df, "x2", "x3", "y", 0.0).collect().head
    // identical expression tree at lambda = 0 => identical doubles
    (0 to 4).foreach(i => assert(r0.get(i) == ols.get(i), s"col $i"))
    // moderate lambda: both slopes shrink toward 0, fit can only degrade
    val r1 = StatTests.ridge2(df, "x2", "x3", "y", 10.0).collect().head
    assert(math.abs(r1.getDouble(2)) < math.abs(ols.getDouble(2)), "b1 shrinks")
    assert(math.abs(r1.getDouble(3)) < math.abs(ols.getDouble(3)), "b2 shrinks")
    assert(r1.getDouble(4) < ols.getDouble(4), "R2 below the OLS optimum")
    // extreme lambda: slopes -> 0, intercept -> ybar, R2 -> ~0
    val r2 = StatTests.ridge2(df, "x2", "x3", "y", 1e12).collect().head
    val ybar = pts.map { case (x2, x3) => 2.0 + 3.0 * x2 - 5.0 * x3 }
      .sum / pts.size
    assert(math.abs(r2.getDouble(2)) < 1e-6 && math.abs(r2.getDouble(3)) < 1e-6)
    assert(math.abs(r2.getDouble(1) - ybar) < 1e-4, s"b0 -> ybar, got ${r2.getDouble(1)}")
    assert(math.abs(r2.getDouble(4)) < 1e-3)
  }

  test("isotonic minimax fit equals the textbook PAVA pooling") {
    import spark.implicits._
    // classic violator: bucket means 1, 3, 2 -> PAVA pools the last two
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 3L, 2.0))
      .toDF("g", "x", "v")
    val fit = StatTests.isotonic(df, "g", "x", "v")
      .orderBy("x").collect().map(_.getDouble(4)).toSeq
    assert(fit == Seq(1.0, 2.5, 2.5), fit.toString)
    // weights via row multiplicity: means 1, 3(x2), 0 -> pool(3,3,0) = 2
    val wdf = Seq(("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 2L, 3.0),
      ("a", 3L, 0.0)).toDF("g", "x", "v")
    val wfit = StatTests.isotonic(wdf, "g", "x", "v")
      .orderBy("x").collect().map(_.getDouble(4)).toSeq
    assert(wfit == Seq(1.0, 2.0, 2.0), wfit.toString)
    // already monotone input is returned unchanged, and output is
    // always nondecreasing per key
    val mono = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 9.0),
      ("b", 1L, 5.0), ("b", 2L, 4.0)).toDF("g", "x", "v")
    val out = StatTests.isotonic(mono, "g", "x", "v")
      .orderBy("g", "x").collect()
    assert(out.filter(_.getString(0) == "a").map(_.getDouble(4)).toSeq ==
      Seq(1.0, 2.0, 9.0))
    assert(out.filter(_.getString(0) == "b").map(_.getDouble(4)).toSeq ==
      Seq(4.5, 4.5))
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val fs = rows.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(fs.zip(fs.tail).forall { case (p, q) => p <= q })
    }
  }

  test("kolmogorov-smirnov: separated groups give D = 1, ties stay exact") {
    import spark.implicits._
    val sep = (Seq(1.0, 2.0).map(("x", _)) ++ Seq(3.0, 4.0).map(("y", _)))
      .toDF("g", "v")
    val r = StatTests.ksTest(sep, "g", "v", "x", "y").collect().head
    assert(r.getLong(2) == 4L, "d_num = n1*n2 when fully separated")
    assert(r.getDouble(3) == 1.0)
    // interleaved with a tie: x={1,3}, y={1,5}
    // v=1: F1=1/2, F2=1/2; v=3: F1=1, F2=1/2 -> D=1/2; d_num=|2*2-1*2|=2
    val mix = (Seq(1.0, 3.0).map(("x", _)) ++ Seq(1.0, 5.0).map(("y", _)))
      .toDF("g", "v")
    val rm = StatTests.ksTest(mix, "g", "v", "x", "y").collect().head
    assert(rm.getLong(2) == 2L, s"d_num should be 2, got ${rm.getLong(2)}")
    assert(rm.getDouble(3) == 0.5)
  }

  test("cohens d: pooled closed form, bias correction, degenerate NULL") {
    import spark.implicits._
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(4.0, 5.0, 6.0).map(("b", _))).toDF("g", "v")
    val r = StatTests.cohensD(df, "g", "v").collect().head
    // means 2 vs 5, ss 2 each, pooled var (2+2)/4 = 1 -> d = -3;
    // g = d * (1 - 3/(4*6-9)) = -3 * 0.8 = -2.4
    assert(r.getDouble(4) == -3.0 && r.getDouble(5) == -2.4, r.toString)
    // zero pooled variance -> NULL, the Welch guard convention
    val const = (Seq(5.0, 5.0).map(("a", _)) ++ Seq(5.0, 5.0).map(("b", _)))
      .toDF("g", "v")
    val c = StatTests.cohensD(const, "g", "v").collect().head
    assert(c.isNullAt(4) && c.isNullAt(5))
  }

  test("two-proportion z and CI match the hand-computed A/B case") {
    import spark.implicits._
    val units = (Seq.fill(5)((0L, 1L)) ++ Seq.fill(5)((0L, 0L)) ++
      Seq.fill(2)((1L, 1L)) ++ Seq.fill(8)((1L, 0L)))
      .toDF("variant", "converted")
    val r = StatTests.twoProportion(units, "variant", "converted")
      .collect().head
    assert(r.getLong(2) == 10L && r.getLong(3) == 5L &&
      r.getLong(4) == 10L && r.getLong(5) == 2L)
    val (pa, pb) = (0.5, 0.2)
    val pp = 7.0 / 20.0
    val z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / 10 + 1.0 / 10))
    assert(math.abs(r.getDouble(8) - z) < 1e-6, s"z = ${r.getDouble(8)}")
    val seU = math.sqrt(pa * (1 - pa) / 10 + pb * (1 - pb) / 10)
    assert(math.abs(r.getDouble(9) - ((pa - pb) - 1.959963985 * seU)) < 1e-6)
    assert(math.abs(r.getDouble(10) - ((pa - pb) + 1.959963985 * seU)) < 1e-6)
    assert(r.getDouble(11) > 0.0 && r.getDouble(11) < 1.0)
    // saturated variants (pPool = 1) are degenerate -> NULL z
    val sat = (Seq.fill(3)((0L, 1L)) ++ Seq.fill(3)((1L, 1L)))
      .toDF("variant", "converted")
    assert(StatTests.twoProportion(sat, "variant", "converted")
      .collect().head.isNullAt(8))
  }

  test("aucRankSum closed forms: separation 1.0, reversal 0.0, ties 0.5") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Long)]): Double =
      StatTests.aucRankSum(rows.toDF("s", "y"), "s", "y")
        .collect().head.getDouble(3)
    val pos = (11L to 15L).map((_, 1L))
    val neg = (1L to 5L).map((_, 0L))
    assert(auc(pos ++ neg) == 1.0)
    assert(auc(pos.map { case (s, _) => (s, 0L) } ++
      neg.map { case (s, _) => (s, 1L) }) == 0.0)
    // every score tied: U counts all pairs at half
    assert(auc(Seq.fill(4)((7L, 1L)) ++ Seq.fill(6)((7L, 0L))) == 0.5)
    // hand case: pos {3, 1}, neg {2, 1}: pairs (3>2)=2,(3>1)=2,(1<2)=0,
    // (1=1)=1 -> u2 = 5, auc = 5/8
    val r = StatTests.aucRankSum(
      Seq((3L, 1L), (1L, 1L), (2L, 0L), (1L, 0L)).toDF("s", "y"), "s", "y")
      .collect().head
    assert(r.getLong(2) == 5L && r.getDouble(3) == 0.625, r.toString)
  }

  test("cramers V: 1.0 for perfect association, near 0 for independence") {
    import spark.implicits._
    val perfect = (Seq.fill(20)(("a", "x")) ++ Seq.fill(30)(("b", "y")))
      .toDF("r", "c")
    val p = StatTests.cramersV(perfect, "r", "c").collect().head
    assert(p.getDouble(4) == 1.0, s"perfect 2x2 association: $p")
    // exact independence: every (r, c) cell at its expected count
    val indep = (for {
      r <- Seq("a", "b"); c <- Seq("x", "y"); _ <- 1 to 10
    } yield (r, c)).toDF("r", "c")
    val i = StatTests.cramersV(indep, "r", "c").collect().head
    assert(i.getDouble(4) == 0.0 && i.getDouble(5) == 0.0, i.toString)
    assert(i.getLong(2) == 2L && i.getLong(3) == 2L && i.getLong(1) == 40L)
  }

  test("chi-squared matches the hand-computed 2x2 statistic incl. zero cells") {
    import spark.implicits._
    // counts: (a,x)=10 (a,y)=20 (b,x)=20 (b,y)=10 -> E=15 everywhere,
    // X^2 = 4 * 25/15 = 20/3
    val rows =
      Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
        Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r = StatTests.chiSquared(rows.toDF("r", "c"), "r", "c").collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 60L)
    assert(math.abs(r.getLong(0) / 1e9 - 20.0 / 3.0) < 1e-6)

    // zero cell contributes its E: (a,x)=4 (a,y)=0 (b,x)=4 (b,y)=4
    // rt = 4,8; ct = 8,4; N = 12; E = 8/3, 4/3, 16/3, 8/3
    // X^2 = (4-8/3)^2/(8/3) + (4/3)^2/(4/3) + (4-16/3)^2/(16/3) + (4-8/3)^2/(8/3)
    val z = Seq.fill(4)(("a", "x")) ++ Seq.fill(4)(("b", "x")) ++ Seq.fill(4)(("b", "y"))
    val rz = StatTests.chiSquared(z.toDF("r", "c"), "r", "c").collect().head
    val e = Seq((4.0, 8.0 / 3), (0.0, 4.0 / 3), (4.0, 16.0 / 3), (4.0, 8.0 / 3))
    val expect = e.map { case (o, ee) => (o - ee) * (o - ee) / ee }.sum
    assert(math.abs(rz.getLong(0) / 1e9 - expect) < 1e-6,
      s"got ${rz.getLong(0) / 1e9}, want $expect")
  }

  test("kruskal-wallis: textbook separation H = 7.2, midrank tie correction") {
    import spark.implicits._
    // fully separated thirds: rank sums 6/15/24, H = 12/90 * 279/3 - 30 = 7.2
    val sep = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(4.0, 5.0, 6.0).map(("b", _)) ++
      Seq(7.0, 8.0, 9.0).map(("c", _))).toDF("g", "v")
    val r = StatTests.kruskalWallis(sep, "g", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getLong(2) == 12L && r("c").getLong(2) == 48L) // 2x rank sums
    assert(math.abs(r("a").getDouble(4) - 7.2) < 1e-6)
    assert(r("a").getDouble(5) == r("a").getDouble(4), "no ties -> h_corr = h")
    // ties: a={1,1} b={1,2}: midranks 2,2 | 2,4 -> H = 0.6, C = 0.6, Hc = 1.0
    val tied = (Seq(1.0, 1.0).map(("a", _)) ++ Seq(1.0, 2.0).map(("b", _)))
      .toDF("g", "v")
    val rt = StatTests.kruskalWallis(tied, "g", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(rt("a").getLong(2) == 8L && rt("b").getLong(2) == 12L)
    assert(math.abs(rt("a").getDouble(4) - 0.6) < 1e-6)
    assert(math.abs(rt("a").getDouble(5) - 1.0) < 1e-6)
    // one shared value everywhere: H exactly 0, and the tie correction
    // degenerates (tsum = N³−N) -> h_corr NULL by the guard, never NaN
    val flat = (Seq(5.0, 5.0).map(("a", _)) ++ Seq(5.0, 5.0).map(("b", _)))
      .toDF("g", "v")
    assert(StatTests.kruskalWallis(flat, "g", "v")
      .collect().forall(x => x.getDouble(4) == 0.0 && x.isNullAt(5)))
  }

  test("brown-forsythe: hand-computed F, degenerate spread is NULL") {
    import spark.implicits._
    // a={1,2,3}: med 2, z={1,0,1}; b={2,4,6,8}: med 5, z={3,1,1,3}
    // zbar = 10/7; between = 1344/441; within = 2/3 + 4 = 14/3
    // F = 5 * (1344/441)/(14/3) = 3.265306
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(2.0, 4.0, 6.0, 8.0).map(("b", _))).toDF("g", "v")
    val r = StatTests.brownForsythe(df, "g", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getDouble(2) == 2.0 && r("b").getDouble(2) == 5.0)
    assert(math.abs(r("a").getDouble(3) - 2.0 / 3.0) < 1e-8)
    assert(math.abs(r("a").getDouble(4) - 3.265306) < 1e-5)
    assert(r("a").getLong(5) == 1L && r("a").getLong(6) == 5L)
    // equal-spread groups score lower than a planted variance blowup
    val calm = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(11.0, 12.0, 13.0).map(("b", _))).toDF("g", "v")
    val wild = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(-88.0, 12.0, 112.0).map(("b", _))).toDF("g", "v")
    val fCalm = StatTests.brownForsythe(calm, "g", "v").collect().head.getDouble(4)
    val fWild = StatTests.brownForsythe(wild, "g", "v").collect().head.getDouble(4)
    // a location SHIFT alone reads exactly 0 (medians absorb it); a
    // spread blowup reads near the k=2,n=3 saturation F ≈ 3.9
    assert(fCalm == 0.0 && fWild > 3.0, s"$fCalm vs $fWild")
    // both groups constant: zero within-spread -> NULL by the guard
    val flat = (Seq(2.0, 2.0).map(("a", _)) ++ Seq(9.0, 9.0).map(("b", _)))
      .toDF("g", "v")
    assert(StatTests.brownForsythe(flat, "g", "v").collect().forall(_.isNullAt(4)))
  }

  test("g-test: zero for independence, 40*ln2 for the diagonal 2x2") {
    import spark.implicits._
    // perfectly independent table: E = O everywhere -> G = 0
    val indep = (for {
      r <- Seq("a", "b"); c <- Seq("x", "y"); _ <- 1 to 10
    } yield (r, c)).toDF("r", "c")
    val ri = StatTests.gTest(indep, "r", "c").collect().head
    assert(ri.getLong(0) == 40L && ri.getLong(1) == 1L)
    assert(ri.getDouble(2) == 0.0)
    // diagonal-only: O = 10 on (a,x),(b,y); E = 5 -> G = 40*ln2
    // (the zero cells never materialize — observed-cells-only shape)
    val diag = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))).toDF("r", "c")
    val rd = StatTests.gTest(diag, "r", "c").collect().head
    assert(math.abs(rd.getDouble(2) - 40.0 * math.log(2.0)) < 1e-5)
  }

  test("durbin-watson: alternation reads ~4, trend reads ~0, ties commute") {
    import spark.implicits._
    def mk(g: String, es: Seq[Double]) =
      es.zipWithIndex.map { case (e, i) => (g, i.toLong, e) }
    // e = +1,-1,+1,-1: num = 3*4 = 12, den = 4 -> d = 3.0 (→4 as n grows)
    // e = 1,2,3,4: num = 3, den = 30 -> d = 0.1; constant e -> d = 0
    val df = (mk("alt", Seq(1.0, -1.0, 1.0, -1.0)) ++
      mk("trend", Seq(1.0, 2.0, 3.0, 4.0)) ++
      mk("flat", Seq(3.0, 3.0, 3.0, 3.0))).toDF("g", "t", "e")
    val r = StatTests.durbinWatson(df, "g", Seq("t"), "e")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(math.abs(r("alt").getDouble(2) - 3.0) < 1e-9)
    assert(math.abs(r("trend").getDouble(2) - 0.1) < 1e-9)
    assert(r("flat").getDouble(2) == 0.0)
    // a non-unique order key whose ties carry EQUAL residuals leaves d
    // well-defined: the residual tie-break makes any input order agree
    val tied = Seq(("g", 1L, 5.0), ("g", 1L, 5.0), ("g", 2L, 1.0),
      ("g", 2L, 1.0), ("g", 3L, 5.0)).toDF("g", "t", "e")
    val rt = StatTests.durbinWatson(tied, "g", Seq("t"), "e").collect().head
    // e-sequence 5,5,1,1,5: num = 0+16+0+16 = 32; den = 77
    assert(math.abs(rt.getDouble(2) - 32.0 / 77.0) < 1e-6)
  }

  test("durbin-watson compound key: constant subkey reproduces the coarse d; " +
      "a real subkey splits each series independently") {
    import spark.implicits._
    val df = Seq(("a", 0, 1L, 1.0), ("a", 0, 2L, -1.0), ("a", 0, 3L, 1.0),
      ("a", 0, 4L, -1.0), ("b", 0, 1L, 1.0), ("b", 0, 2L, 2.0),
      ("b", 0, 3L, 3.0), ("b", 0, 4L, 4.0)).toDF("g", "k", "t", "e")
    val coarse = StatTests.durbinWatson(df, "g", Seq("t"), "e")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val fine = StatTests.durbinWatsonKeys(df, Seq("g", "k"), Seq("t"), "e")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(coarse == fine) // a constant subkey changes nothing
    // a real subkey restarts the lag at each boundary: alt-alt halves
    // score as two independent 2-point alternations (num 4+4, den 2+2)
    val split = Seq(("a", 1, 1L, 1.0), ("a", 1, 2L, -1.0),
      ("a", 2, 3L, 1.0), ("a", 2, 4L, -1.0)).toDF("g", "k", "t", "e")
    val out = StatTests.durbinWatsonKeys(split, Seq("g", "k"), Seq("t"), "e")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(out(("a", 1)) == 2.0 && out(("a", 2)) == 2.0)
  }

  test("one-way anova: classic F = 27 and Welch F* = 162/7 on the textbook " +
      "thirds; classic spans ALL groups, Welch excludes degenerates") {
    import spark.implicits._
    // a={1,2,3} b={4,5,6} c={7,8,9}: between 54, within 6 -> F = 27;
    // equal variances make w_g = 3, lambda = 2/3 -> F* = 27/(7/6) = 162/7,
    // df2 = (k^2-1)/(3*lambda) = 4
    val base = Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(4.0, 5.0, 6.0).map(("b", _)) ++ Seq(7.0, 8.0, 9.0).map(("c", _))
    val r = StatTests.oneWayAnova(base.toDF("g", "v"), "g", "v")
      .collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 9L && r.getLong(2) == 3L)
    assert(math.abs(r.getDouble(3) - 27.0) < 1e-4, r.toString)
    assert(math.abs(r.getDouble(4) - 162.0 / 7.0) < 1e-4, r.toString)
    assert(math.abs(r.getDouble(5) - 4.0) < 1e-4, r.toString)
    // a singleton group and a zero-variance group COUNT in the classic F
    // (the R oneway.test / scipy f_oneway convention: they add
    // between-group SS and dfs) but drop from Welch, whose w_g = n/s^2
    // is infinite there
    val noisy = base ++ Seq(("single", 99.0), ("const", 5.0), ("const", 5.0))
    val rn = StatTests.oneWayAnova(noisy.toDF("g", "v"), "g", "v")
      .collect().head
    assert(rn.getLong(0) == 5L && rn.getLong(1) == 12L && rn.getLong(2) == 3L,
      rn.toString)
    // hand classic F over all 5 groups: grand = 154/12, SSW = 6, k = 5
    val grand = 154.0 / 12.0
    val ssb = 3 * math.pow(2.0 - grand, 2) + 3 * math.pow(5.0 - grand, 2) +
      3 * math.pow(8.0 - grand, 2) + math.pow(99.0 - grand, 2) +
      2 * math.pow(5.0 - grand, 2)
    val fAll = (ssb / 4.0) / (6.0 / 7.0)
    assert(math.abs(rn.getDouble(3) - fAll) < 1e-3, s"$rn vs $fAll")
    // Welch statistics are untouched by the degenerate groups
    assert(rn.getDouble(4) == r.getDouble(4) && rn.getDouble(5) == r.getDouble(5))
    // all-singleton input: classic F has no within-variance -> NULL, not
    // a 0/0 NaN; Welch set is empty -> NULL
    val singletons = Seq(("x", 1.0), ("y", 2.0), ("z", 3.0)).toDF("g", "v")
    val rs = StatTests.oneWayAnova(singletons, "g", "v").collect().head
    assert(rs.getLong(0) == 3L && rs.getLong(2) == 0L &&
      rs.isNullAt(3) && rs.isNullAt(4), rs.toString)
  }

  test("hodges-lehmann: closed-form lower median, exact under a pure shift, " +
      "immune to a wild outlier that wrecks the mean difference") {
    import spark.implicits._
    def rows(g: String, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, i) =>
        (g, new java.sql.Timestamp(i * 1000L), (g.hashCode * 100 + i).toLong, v)
    }
    // a={1,2,3}, b={0,1}: diffs sorted {0,1,1,2,2,3}, m=6, k=3 -> 1.0
    val df = (rows("a", Seq(1.0, 2.0, 3.0)) ++ rows("b", Seq(0.0, 1.0)))
      .toDF("g", "ts", "id", "v")
    val r = StatTests.hodgesLehmannBudget(df, "g", "ts", "id", "v",
      "a", "b", targetPoints = 1000).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 6L)
    assert(r.getDouble(3) == 1.0, r.toString)
    // pure shift: b = a + 5 -> every difference is exactly -5
    val shift = (rows("a", Seq(1.0, 2.0, 3.0, 4.0)) ++
      rows("b", Seq(6.0, 7.0, 8.0, 9.0))).toDF("g", "ts", "id", "v")
    val rs = StatTests.hodgesLehmannBudget(shift, "g", "ts", "id", "v",
      "a", "b", targetPoints = 1000).collect().head
    assert(rs.getDouble(3) == -5.0)
    // one wild outlier moves the mean difference by ~250 but HL not at all
    val wild = (rows("a", Seq(1.0, 2.0, 3.0, 4.0, 1000.0)) ++
      rows("b", Seq(6.0, 7.0, 8.0, 9.0))).toDF("g", "ts", "id", "v")
    val rw = StatTests.hodgesLehmannBudget(wild, "g", "ts", "id", "v",
      "a", "b", targetPoints = 1000).collect().head
    assert(rw.getDouble(3) == -5.0, s"outlier-immune: $rw")
  }

  test("energy distance: exactly 0 on identical samples, 2*shift on point " +
      "masses, one NULL row when a cohort is missing") {
    import spark.implicits._
    def rows(g: String, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, i) =>
        (g, new java.sql.Timestamp(i * 1000L), (g.hashCode * 100 + i).toLong, v)
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      StatTests.energyDistanceBudget(df, "g", "ts", "id", "v", "a", "b",
        targetPoints = 1000).collect().head
    // identical samples: e_xy = 8/9, e_xx = e_yy = 2*4/9 — all three round
    // to the same 0.888888889, so the V-statistic D2 is EXACTLY 0
    val same = run((rows("a", Seq(1.0, 2.0, 3.0)) ++
      rows("b", Seq(1.0, 2.0, 3.0))).toDF("g", "ts", "id", "v"))
    assert(same.getLong(0) == 3L && same.getLong(1) == 3L)
    assert(same.getDouble(2) == 0.888888889 &&
      same.getDouble(3) == 0.888888889 && same.getDouble(4) == 0.888888889)
    assert(same.getDouble(5) == 0.0, same.toString)
    // point masses at 0 and 10: D2 = 2*10 - 0 - 0 = 20
    val shift = run((rows("a", Seq(0.0, 0.0)) ++
      rows("b", Seq(10.0, 10.0))).toDF("g", "ts", "id", "v"))
    assert(shift.getDouble(2) == 10.0 && shift.getDouble(3) == 0.0 &&
      shift.getDouble(4) == 0.0 && shift.getDouble(5) == 20.0)
    // missing cohort: still exactly one row, absent side NULL through
    val out = StatTests.energyDistanceBudget(
      rows("a", Seq(1.0, 2.0)).toDF("g", "ts", "id", "v"),
      "g", "ts", "id", "v", "a", "b", targetPoints = 1000).collect()
    assert(out.length == 1)
    val m = out.head
    assert(m.getLong(0) == 2L && m.isNullAt(1) && m.isNullAt(2) &&
      m.getDouble(3) == 0.5 && m.isNullAt(4) && m.isNullAt(5), m.toString)
  }

  test("runs test: alternation and clumping score ±(R-mu)/sigma symmetrically; " +
      "median-equal values drop; sigma=0 shapes are NULL") {
    import spark.implicits._
    def series(g: String, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, i) => (g, i.toLong, i.toLong, v)
    }
    // median 5 drops nothing; alternation R=6, clumping R=2:
    // mu = 2*9/6 + 1 = 4, sigma^2 = 18*12/(36*5) = 1.2
    val df = (series("alt", Seq(10.0, 0.0, 10.0, 0.0, 10.0, 0.0)) ++
      series("clump", Seq(10.0, 10.0, 10.0, 0.0, 0.0, 0.0)) ++
      // med = 5 -> the 5 drops; signs {0,1}: 2n1n0 = n -> sigma 0 -> NULL
      series("deg", Seq(1.0, 5.0, 9.0)))
      .toDF("g", "t", "id", "v")
    val r = StatTests.runsTest(df, "g", "t", "id", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("alt").getLong(3) == 6L && r("clump").getLong(3) == 2L)
    val z = 2.0 / math.sqrt(1.2)
    assert(math.abs(r("alt").getDouble(4) - z) < 1e-6)
    assert(math.abs(r("clump").getDouble(4) + z) < 1e-6, "symmetric")
    assert(r("deg").getLong(1) == 1L && r("deg").getLong(2) == 1L &&
      r("deg").isNullAt(4), r("deg").toString)
  }

  test("mcnemar: discordant-pair closed forms, concordant pairs carry nothing") {
    import spark.implicits._
    // 6 users flip yes->no, 2 flip no->yes, 12 concordant
    val rows =
      (1 to 6).map(u => (u.toLong, 1L, 0L)) ++
        (7 to 8).map(u => (u.toLong, 0L, 1L)) ++
        (9 to 14).map(u => (u.toLong, 1L, 1L)) ++
        (15 to 20).map(u => (u.toLong, 0L, 0L))
    val r = StatTests.mcNemar(rows.toDF("u", "f1", "f2"), "u", "f1", "f2")
      .collect().head
    assert(r.getLong(0) == 20L && r.getLong(1) == 6L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 2.0, s"chi2 = 16/8: $r")
    assert(r.getDouble(4) == 1.125, s"cc = 9/8: $r")
    // doubling the concordant pairs changes NOTHING
    val more = rows ++ (21 to 40).map(u => (u.toLong, 1L, 1L))
    val rm = StatTests.mcNemar(more.toDF("u", "f1", "f2"), "u", "f1", "f2")
      .collect().head
    assert(rm.getDouble(3) == 2.0 && rm.getDouble(4) == 1.125)
    // all-concordant: b + c = 0 -> NULL, never 0/0
    val flat = (1 to 5).map(u => (u.toLong, 1L, 1L))
    val rf = StatTests.mcNemar(flat.toDF("u", "f1", "f2"), "u", "f1", "f2")
      .collect().head
    assert(rf.isNullAt(3) && rf.isNullAt(4))
  }

  test("log-rank: hand-computed 49/17 separation, identical curves score 0, " +
      "censoring removes subjects without creating deaths") {
    import spark.implicits._
    // g0 dies at 1,2; g1 at 3,4: O1=2, E1 = 1/2 + 1/3 = 5/6,
    // V = 1/4 + 2/9 = 17/36 (the t=3,4 times have n1=0 / nj=1 -> no V)
    // chi2 = (2 - 5/6)^2 / (17/36) = 49/17
    val sep = Seq((0L, 1L, false), (0L, 2L, false),
      (1L, 3L, false), (1L, 4L, false)).toDF("g", "dur", "c")
    val r = graft.operators.Survival.logRank(sep, "g", "dur", "c")
      .collect().head
    assert(r.getLong(1) == 2L, r.toString)
    assert(math.abs(r.getDouble(2) - 5.0 / 6.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - 17.0 / 36.0) < 1e-6)
    assert(math.abs(r.getDouble(4) - 49.0 / 17.0) < 1e-5)
    // mirrored cohorts: O1 = E1 at every time -> chi2 exactly 0
    val same = Seq((0L, 1L, false), (1L, 1L, false),
      (0L, 2L, false), (1L, 2L, false)).toDF("g", "dur", "c")
    val rs = graft.operators.Survival.logRank(same, "g", "dur", "c")
      .collect().head
    assert(rs.getDouble(4) == 0.0, rs.toString)
    // a censored g1 subject at t=1 shrinks later risk sets but adds no
    // death: O1 stays 2, E1 at t=2 becomes 1/2 (n1=1, n2=1)
    val cens = Seq((0L, 1L, false), (0L, 2L, false),
      (1L, 1L, true), (1L, 2L, false)).toDF("g", "dur", "c")
    val rc = graft.operators.Survival.logRank(cens, "g", "dur", "c")
      .collect().head
    assert(rc.getLong(1) == 2L)
    // E1 = 2/4 (t=1: n1=2,n2=2,d=1) + 1/2 (t=2: n1=1,n2=1,d=2... d=2?
    // both remaining die at 2) -> t=2: d1=1,d2=1,dj=2,E1 += 2*(1/2)=1
    assert(math.abs(rc.getDouble(2) - 1.5) < 1e-6, rc.toString)
    // no jointly-at-risk death time (g1 censors out before g0's only
    // death): every death's risk set is single-group -> V=0 -> NULL
    val lone = Seq((0L, 5L, false), (1L, 1L, true)).toDF("g", "dur", "c")
    val rl = graft.operators.Survival.logRank(lone, "g", "dur", "c")
      .collect().head
    assert(rl.isNullAt(4), rl.toString)
  }

  test("friedman: saturated chi2 = 8, midrank ties correct to 6.0, " +
      "incomplete blocks drop, all-tied blocks NULL the correction") {
    import spark.implicits._
    def block(b: Long, vs: (Double, Double, Double)) =
      Seq((b, "A", vs._1), (b, "B", vs._2), (b, "C", vs._3))
    // consistent A<B<C in 4 blocks (block levels differ wildly — the
    // within-block ranking cancels them): R = 4,8,12 -> chi2 = 8 (max)
    val consistent = (1L to 4L).flatMap(b =>
      block(b, (b * 100.0 + 1, b * 100.0 + 2, b * 100.0 + 3)))
    val r = StatTests.friedman(consistent.toDF("b", "c", "v"), "b", "c", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("A").getLong(3) == 8L && r("C").getLong(3) == 24L) // 2x R_j
    assert(r("A").getDouble(5) == 8.0 && r("A").getDouble(6) == 8.0)
    // one fully-tied block: midranks 2,2,2 -> chi2 = 4.5, C = 0.75 -> 6.0
    val tied = (1L to 3L).flatMap(b => block(b, (1.0, 2.0, 3.0))) ++
      block(4L, (7.0, 7.0, 7.0))
    val rt = StatTests.friedman(tied.toDF("b", "c", "v"), "b", "c", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(math.abs(rt("A").getDouble(5) - 4.5) < 1e-6, rt("A").toString)
    assert(math.abs(rt("A").getDouble(6) - 6.0) < 1e-6)
    // a block missing condition C is excluded entirely
    val partial = consistent ++ Seq((9L, "A", 1.0), (9L, "B", 2.0))
    val rp = StatTests.friedman(partial.toDF("b", "c", "v"), "b", "c", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(rp("A").getLong(1) == 4L && rp("A").getDouble(5) == 8.0)
    // every block constant: chi2 exactly 0 and the correction is NULL
    val flat = (1L to 3L).flatMap(b => block(b, (5.0, 5.0, 5.0)))
    val rf = StatTests.friedman(flat.toDF("b", "c", "v"), "b", "c", "v")
      .collect().head
    assert(rf.getDouble(5) == 0.0 && rf.isNullAt(6), rf.toString)
  }

  test("qn scale: closed-form order statistic, outlier-immune, " +
      "constant series read 0, singleton groups drop") {
    import spark.implicits._
    def series(g: String, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, i) => (g, new java.sql.Timestamp(i * 1000L), i.toLong, v)
    }
    // {1,2,4,8}: |diffs| sorted {1,2,3,4,6,7}; h=3, k=3 -> 3rd = 3.0
    val df = (series("a", Seq(1.0, 2.0, 4.0, 8.0)) ++
      // one wild outlier: diffs {1,1,1,2,2,3, 996..999}; k=3 -> still 1.0
      series("wild", Seq(1.0, 2.0, 3.0, 4.0, 1000.0)) ++
      series("flat", Seq(5.0, 5.0, 5.0)) ++
      series("lone", Seq(42.0)))
      .toDF("g", "ts", "id", "v")
    val r = StatTests.qnScaleBudget(df, "g", "ts", "id", "v",
        targetPoints = 1000)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getLong(2) == 3L && r("a").getDouble(3) == 3.0)
    assert(math.abs(r("a").getDouble(4) - 2.2219 * 3.0) < 1e-6)
    assert(r("wild").getDouble(3) == 1.0, s"outlier-immune: ${r("wild")}")
    assert(r("flat").getDouble(3) == 0.0 && r("flat").getDouble(4) == 0.0)
    assert(!r.contains("lone"), "no pair exists for a singleton group")
  }

  test("wilson ci: symmetric closed form at p=1/2; stays inside [0,1] at the " +
      "edge where Wald collapses to a point") {
    import spark.implicits._
    val df = ((1 to 10).map(i => ("half", if (i <= 5) 1L else 0L)) ++
      (1 to 10).map(_ => ("none", 0L)) ++
      (1 to 10).map(_ => ("all", 1L))).toDF("g", "s")
    val r = StatTests.wilsonCi(df, "g", "s")
      .collect().map(x => x.getString(0) -> x).toMap
    // 5/10: center exactly 1/2, half = 1.96*sqrt(.0346604)/1.38416
    val denom = 1.0 + 1.96 * 1.96 / 10.0
    val half = 1.96 * math.sqrt(0.025 + 1.96 * 1.96 / 400.0) / denom
    assert(r("half").getDouble(3) == 0.5)
    assert(math.abs(r("half").getDouble(4) - (0.5 - half)) < 1e-6)
    assert(math.abs(r("half").getDouble(5) - (0.5 + half)) < 1e-6)
    // 0/10: Wald reads [0,0]; Wilson reads [0, ~0.2775] — the point
    assert(r("none").getDouble(4) == 0.0 && r("none").getDouble(5) > 0.25)
    // 10/10 mirrors by symmetry
    assert(r("all").getDouble(5) == 1.0 &&
      math.abs(r("all").getDouble(4) - (1.0 - r("none").getDouble(5))) < 1e-6)
  }

  test("chapman: closed-form estimate, finite at zero overlap, near-truth " +
      "on independent slices of a known population") {
    import spark.implicits._
    // n1=60, n2=50, m=20: N = 61*51/21 - 1
    val planted = (1 to 100).map(i => (i >= 1 && i <= 60, i >= 41 && i <= 90))
      .toDF("a", "b")
    val r = StatTests.chapman(planted, "a", "b").collect().head
    assert(r.getLong(0) == 60L && r.getLong(1) == 50L && r.getLong(2) == 20L)
    assert(math.abs(r.getDouble(3) - (61.0 * 51.0 / 21.0 - 1.0)) < 1e-6)
    // disjoint samples: the +1 correction keeps the estimate finite
    val disjoint = (1 to 100).map(i => (i <= 50, i > 50)).toDF("a", "b")
    val rd = StatTests.chapman(disjoint, "a", "b").collect().head
    assert(rd.getDouble(3) == 51.0 * 51.0 - 1.0 && !rd.getDouble(4).isNaN)
    // independent residue-class slices of 6000 ids: estimate lands
    // within 3 SE of the truth (deterministic data, not a flaky bound)
    val pop = (1 to 6000).map(i => (i % 3 != 0, i % 2 == 0)).toDF("a", "b")
    val rp = StatTests.chapman(pop, "a", "b").collect().head
    assert(math.abs(rp.getDouble(3) - 6000.0) <= 3.0 * rp.getDouble(4),
      rp.toString)
  }

  test("poisson rate: conditional-binomial closed form, equal rates read 0, " +
      "degenerate exposure is NULL") {
    import spark.implicits._
    // equal exposures, k = 30 vs 10: p = 1/2, z = (30-20)/sqrt(40/4)
    val df = Seq((0L, 30L, 7200000000L), (1L, 10L, 7200000000L))
      .toDF("v", "k", "t")
    val r = StatTests.poissonRate(df, "v", "k", "t").collect().head
    assert(r.getLong(0) == 30L && r.getLong(1) == 10L)
    assert(r.getDouble(4) == 15.0 && r.getDouble(5) == 5.0) // per-hour rates
    assert(math.abs(r.getDouble(6) - 10.0 / math.sqrt(10.0)) < 1e-6)
    // rates proportional to exposure: k1 = K*p exactly -> z = 0
    val prop = Seq((0L, 20L, 7200000000L), (1L, 10L, 3600000000L))
      .toDF("v", "k", "t")
    val rp = StatTests.poissonRate(prop, "v", "k", "t").collect().head
    assert(rp.getDouble(6) == 0.0, rp.toString)
    // zero exposure on one side: rate and z NULL, never Inf
    val zt = Seq((0L, 5L, 3600000000L), (1L, 0L, 0L)).toDF("v", "k", "t")
    val rz = StatTests.poissonRate(zt, "v", "k", "t").collect().head
    assert(rz.isNullAt(5) && rz.isNullAt(6), rz.toString)
    // the 1-row contract holds when a variant side is ABSENT (the r12
    // ADVICE finding): the missing side's counts/exposure and z are
    // NULL, the present side's rate still reads
    val oneSide = Seq((0L, 5L, 3600000000L)).toDF("v", "k", "t")
    val ro = StatTests.poissonRate(oneSide, "v", "k", "t").collect()
    assert(ro.length == 1, s"expected 1 row, got ${ro.length}")
    assert(ro.head.getLong(0) == 5L && ro.head.isNullAt(1) &&
      ro.head.isNullAt(3) && ro.head.getDouble(4) == 5.0 &&
      ro.head.isNullAt(5) && ro.head.isNullAt(6), ro.head.toString)
    // ...and on an entirely EMPTY input (all-NULL row, not 0 rows)
    val re = StatTests.poissonRate(oneSide.filter("k < 0"),
      "v", "k", "t").collect()
    assert(re.length == 1 && re.head.isNullAt(0) && re.head.isNullAt(6))
  }

  test("sprt: all-success crosses the H1 band at exactly ceil(A/lnWin) " +
      "steps, all-failure at the H0 band, alternating never decides") {
    import spark.implicits._
    def seq(g: String, bits: Seq[Int]) = bits.zipWithIndex.map {
      case (s, i) => (g, new java.sql.Timestamp(i * 1000L), i.toLong, s.toLong)
    }
    // symmetric p0 = 0.4, p1 = 0.6: each win adds ln(1.5), each loss
    // subtracts it; A = ln(16) -> 7 wins cross, |B| = ln(19/20*4) ->
    // 4 losses cross; a strict win/loss alternation returns to 0 forever
    val df = (seq("win", Seq.fill(10)(1)) ++ seq("lose", Seq.fill(10)(0)) ++
      seq("alt", (0 until 10).map(_ % 2))).toDF("g", "ts", "id", "s")
    val r = StatTests.sprtBernoulli(df, "g", "ts", "id", "s",
        p0 = 0.4, p1 = 0.6)
      .collect().map(x => x.getString(0) -> x).toMap
    val lWin = math.log(1.5)
    assert(r("win").getLong(7) == math.ceil(math.log(16.0) / lWin).toLong)
    assert(r("win").getString(8) == "accept_h1" &&
      r("win").getString(6) == "accept_h1")
    assert(r("lose").getLong(7) ==
      math.ceil(-math.log(0.2 / 0.95) / lWin).toLong)
    assert(r("lose").getString(8) == "accept_h0")
    assert(r("alt").isNullAt(7) && r("alt").getString(8) == "continue" &&
      r("alt").getString(6) == "continue")
    intercept[IllegalArgumentException] {
      StatTests.sprtBernoulli(df, "g", "ts", "id", "s", p0 = 0.5, p1 = 0.5)
    }
  }

  test("sprt increments: interval coarsening can only delay a crossing to " +
      "its boundary, never invent or flip one") {
    import spark.implicits._
    // 20 events: 10 wins then 10 losses; row-level crossing at 7 wins
    // (see the row-level spec); 5-event intervals check the LLR only at
    // n = 5, 10, 15, 20 -> the H1 crossing lands at the n = 10 boundary
    val bits = Seq.fill(10)(1) ++ Seq.fill(10)(0)
    val rows = bits.zipWithIndex.map { case (s, i) =>
      ("g", new java.sql.Timestamp(i * 1000L), i.toLong, s.toLong)
    }.toDF("g", "ts", "id", "s")
    val rowLevel = StatTests.sprtBernoulli(rows, "g", "ts", "id", "s",
      p0 = 0.4, p1 = 0.6).collect().head
    val inc = bits.grouped(5).zipWithIndex.map { case (chunk, i) =>
      ("g", i.toLong, chunk.sum.toLong, chunk.length.toLong)
    }.toSeq.toDF("g", "o", "ik", "ni")
    val coarse = StatTests.sprtIncrements(inc, "g", "o", "ik", "ni",
      p0 = 0.4, p1 = 0.6).collect().head
    assert(rowLevel.getLong(7) == 7L && coarse.getLong(7) == 10L)
    assert(coarse.getString(8) == rowLevel.getString(8))
    // totals and the final LLR/decision are grain-independent
    assert(coarse.getLong(1) == rowLevel.getLong(1) &&
      coarse.getLong(2) == rowLevel.getLong(2))
    assert(coarse.getDouble(3) == rowLevel.getDouble(3))
    assert(coarse.getString(6) == rowLevel.getString(6))
  }

  test("cuped: exact theta=2 on a planted linear covariate, adjusted " +
      "variance collapses to 0, rho^2 = 32/35") {
    import spark.implicits._
    // y = 2x + shift(variant): theta = cov/var = 2 exactly; y - 2x is
    // constant per variant -> adjusted variance 0 -> z_adj NULL by guard
    val df = Seq((0L, 1.0, 3.0), (0L, 2.0, 5.0), (0L, 3.0, 7.0),
      (1L, 1.0, 2.0), (1L, 2.0, 4.0), (1L, 3.0, 6.0)).toDF("v", "x", "y")
    val r = StatTests.cuped(df, "v", "x", "y").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0, s"theta ${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0) // raw/adj diff
    assert(math.abs(r.getDouble(5) - 1.0 / math.sqrt(8.0 / 3.0)) < 1e-6)
    assert(r.isNullAt(6), "zero adjusted variance must NULL z_adj")
    assert(math.abs(r.getDouble(7) - 4.0 * 0.8 / 3.5) < 1e-6) // 32/35
    // uncorrelated covariate: theta ~ 0, z_adj ~ z_raw, reduction ~ 0
    val rnd = new scala.util.Random(7)
    val noisy = (0 until 200).map { i =>
      (i.toLong % 2, rnd.nextDouble() * 10, rnd.nextGaussian() * 3 + 5)
    }.toDF("v", "x", "y")
    val rn = StatTests.cuped(noisy, "v", "x", "y").collect().head
    assert(math.abs(rn.getDouble(7)) < 0.05, s"vr ${rn.getDouble(7)}")
    // degenerate: a single-unit side -> NULL theta and z's, 1 row
    val tiny = Seq((0L, 1.0, 2.0), (1L, 1.0, 2.0), (1L, 2.0, 3.0))
      .toDF("v", "x", "y")
    val rt = StatTests.cuped(tiny, "v", "x", "y").collect()
    assert(rt.length == 1 && rt.head.isNullAt(2) && rt.head.isNullAt(5))
  }

  test("ratio metric: delta-method z on a hand-computed pair of cohorts, " +
      "degenerates are NULL") {
    import spark.implicits._
    // A: (y,x) = (10,2),(20,3) -> R = 6, varR = 0.64
    // B: (12,2),(12,3) -> R = 4.8, varR = 0.9216
    val df = Seq((0L, 10.0, 2.0), (0L, 20.0, 3.0),
      (1L, 12.0, 2.0), (1L, 12.0, 3.0)).toDF("v", "y", "x")
    val r = StatTests.ratioMetric(df, "v", "y", "x").collect().head
    assert(r.getDouble(2) == 6.0 && r.getDouble(3) == 4.8)
    assert(math.abs(r.getDouble(4) - 1.2) < 1e-9)
    assert(math.abs(r.getDouble(5) - 1.2 / math.sqrt(1.5616)) < 1e-5,
      r.toString)
    // zero denominator sum on one side -> NULL ratio and z, 1 row
    val zx = Seq((0L, 10.0, 0.0), (0L, 20.0, 0.0),
      (1L, 12.0, 2.0), (1L, 12.0, 3.0)).toDF("v", "y", "x")
    val rz = StatTests.ratioMetric(zx, "v", "y", "x").collect()
    assert(rz.length == 1 && rz.head.isNullAt(2) && rz.head.isNullAt(5))
  }

  test("kendall tau-b: monotone ±1, tie-priced denominator, degenerate NULL") {
    import spark.implicits._
    def series(g: String, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, h) => (g, new java.sql.Timestamp(h * 3600L * 1000L), h.toLong, v)
    }
    val df = (series("up", (0 until 10).map(_.toDouble)) ++
      series("down", (0 until 10).map(i => -i.toDouble)) ++
      series("flat", Seq.fill(10)(7.0)) ++
      // t=0..3, v=1,1,2,2: S = 4, T_v = 2 -> tau = 4/sqrt(6*4) = 0.816497
      series("tv", Seq(1.0, 1.0, 2.0, 2.0)))
      .toDF("g", "ts", "id", "v")
    val r = StatTests.kendallTauBudget(df, "g", "ts", "id", "v",
        targetPoints = 1000)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("up").getDouble(3) == 1.0 && r("down").getDouble(3) == -1.0)
    assert(r("flat").isNullAt(3), "all-tied v: tau undefined -> NULL")
    assert(r("up").getLong(2) == 45L && r("down").getLong(2) == -45L)
    assert(math.abs(r("tv").getDouble(3) - 4.0 / math.sqrt(24.0)) < 1e-6)
  }

  test("page L: perfect monotone blocks give the exact closed-form z") {
    import spark.implicits._
    // 8 blocks x 3 ordered conditions, every block strictly increasing
    // with the condition: L = 14b, E = 12b, sigma = sqrt(2b)
    // -> z = sqrt(2b) = 4.0 exactly at b = 8
    val up = (0 until 8).flatMap(b =>
      Seq((s"b$b", 0, 1.0 + b), (s"b$b", 1, 10.0 + b), (s"b$b", 2, 20.0 + b)))
    val r = StatTests.pageL(up.toDF("blk", "cond", "v"), "blk", "cond", "v")
      .collect().head
    assert(r.getLong(0) == 8L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 224L, s"2L ${r.getLong(2)}")
    assert(r.getDouble(3) == 4.0, s"z ${r.getDouble(3)}")
    // reversed condition order flips the sign exactly
    val down = up.map { case (b, c, v) => (b, 2 - c, v) }
    val rd = StatTests.pageL(down.toDF("blk", "cond", "v"),
      "blk", "cond", "v").collect().head
    assert(rd.getDouble(3) == -4.0)
    // k = 2: Page needs at least 3 ordered conditions -> NULL
    val two = (0 until 5).flatMap(b =>
      Seq((s"b$b", 0, 1.0), (s"b$b", 1, 2.0)))
    assert(StatTests.pageL(two.toDF("blk", "cond", "v"),
      "blk", "cond", "v").collect().head.isNullAt(3))
  }

  test("partial corr: a pure confounder collapses, a direct link survives") {
    import spark.implicits._
    val draws = Iterator.iterate(55555L)(s => (s * 6364136223846793005L +
      1442695040888963407L) & 0x7fffffffffffffffL)
      .drop(1).take(900).map(s => (s % 100000L) / 100000.0 - 0.5).toVector
    // x and y are BOTH z plus small independent noise: raw r_xy is
    // high purely through z; controlling z must collapse it
    val conf = (0 until 300).map { i =>
      val z = draws(i) * 10.0
      (z + draws(300 + i) * 0.5, z + draws(600 + i) * 0.5, z)
    }
    val c = StatTests.partialCorr(conf.toDF("x", "y", "z"), "x", "y", "z")
      .collect().head
    assert(c.getDouble(1) > 0.95, s"raw r_xy ${c.getDouble(1)}")
    assert(math.abs(c.getDouble(4)) < 0.15,
      s"confounded partial must collapse: ${c.getDouble(4)}")
    // y depends on x DIRECTLY, z independent: partial stays near raw
    val direct = (0 until 300).map { i =>
      val x = draws(i) * 10.0
      (x, x + draws(300 + i) * 0.5, draws(600 + i) * 10.0)
    }
    val dctl = StatTests.partialCorr(direct.toDF("x", "y", "z"),
      "x", "y", "z").collect().head
    assert(dctl.getDouble(4) > 0.9,
      s"direct link must survive: ${dctl.getDouble(4)}")
    // constant z: zero variance -> r_xz NULL -> partial NULL
    val const = (0 until 50).map(i => (draws(i), draws(100 + i), 7.0))
    val k = StatTests.partialCorr(const.toDF("x", "y", "z"),
      "x", "y", "z").collect().head
    assert(k.isNullAt(2) && k.isNullAt(4))
  }

  test("jonckheere: hand statistic on ordered groups, sign flip, " +
      "all-tied NULL") {
    import spark.implicits._
    // doses 0 < 1 < 2 with perfectly ordered values {1,2},{3,4},{5,6}:
    // every cross-pair agrees -> J = 3*4 = 12, 2J = 24;
    // E[2J] = (36 - 12)/2 = 12; no ties -> Var = 456/72
    val up = Seq((0, 1.0), (0, 2.0), (1, 3.0), (1, 4.0),
      (2, 5.0), (2, 6.0)).toDF("dose", "v")
    val r = StatTests.jonckheereTerpstra(up, "dose", "v", Seq(0, 1, 2))
      .collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 24L)
    val zExp = BigDecimal(12.0 / (2.0 * math.sqrt(456.0 / 72.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) == zExp, s"z ${r.getDouble(2)} != $zExp")
    // reversed dose order flips the sign exactly
    val down = up.selectExpr("2 - dose AS dose", "v")
    val rd = StatTests.jonckheereTerpstra(down, "dose", "v", Seq(0, 1, 2))
      .collect().head
    assert(rd.getDouble(2) == -zExp)
    // all observations tied: no ordering information -> NULL z
    val tied = Seq((0, 5.0), (0, 5.0), (1, 5.0), (2, 5.0), (2, 5.0))
      .toDF("dose", "v")
    val rt = StatTests.jonckheereTerpstra(tied, "dose", "v", Seq(0, 1, 2))
      .collect().head
    assert(rt.isNullAt(2), s"all-tied must be NULL, got $rt")
  }

  test("cochran Q: textbook closed form, k=2 reduces to McNemar, " +
      "constant blocks degenerate to NULL") {
    import spark.implicits._
    // 4 blocks x 3 conditions: C = (4,2,1), N = 7, R = (2,1,3,1)
    // Q = 2 * (3*21 - 49) / (3*7 - 15) = 28/6 = 4.666667
    val m = Seq(
      ("b1", "t1", 1L), ("b1", "t2", 1L), ("b1", "t3", 0L),
      ("b2", "t1", 1L), ("b2", "t2", 0L), ("b2", "t3", 0L),
      ("b3", "t1", 1L), ("b3", "t2", 1L), ("b3", "t3", 1L),
      ("b4", "t1", 1L), ("b4", "t2", 0L), ("b4", "t3", 0L))
      .toDF("b", "t", "x")
    val r = StatTests.cochranQ(m, "b", "t", "x").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 5L - 2L)
    assert(r.getDouble(3) == 4.666667, s"Q ${r.getDouble(3)}")
    // k = 2: Q equals McNemar's UNCORRECTED chi2 on the same pairs
    val two = Seq(
      ("u1", 1L, 0L), ("u2", 1L, 0L), ("u3", 0L, 1L),
      ("u4", 1L, 1L), ("u5", 0L, 0L))
    val qdf = two.flatMap { case (u, a, b) =>
      Seq((u, "c1", a), (u, "c2", b)) }.toDF("b", "t", "x")
    val q2 = StatTests.cochranQ(qdf, "b", "t", "x").collect().head
    val mc = StatTests.mcNemar(two.toDF("s", "a1", "a2"), "s", "a1", "a2")
      .collect().head
    assert(math.abs(q2.getDouble(3) - mc.getDouble(3)) < 1e-5,
      s"Q ${q2.getDouble(3)} vs McNemar ${mc.getDouble(3)}")
    // every block constant (all-1): k*N = sum R_i^2 -> NULL
    val const = Seq("b1", "b2").flatMap(b =>
      Seq((b, "t1", 1L), (b, "t2", 1L))).toDF("b", "t", "x")
    assert(StatTests.cochranQ(const, "b", "t", "x").collect().head
      .isNullAt(3))
  }

  test("cvm: hand-computed separated pair, identical samples read 0") {
    import spark.implicits._
    // A = {1,2}, B = {3,4}: pooled diffs (.5, 1, .5, 0), squares
    // weighted by multiplicity 1 -> sum 1.5; T = (4/16) * 1.5 = 0.375
    val sep = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = StatTests.cvmTest(sep, "g", "v", "a", "b").collect().head
    assert(r.getDouble(2) == 0.375, s"T ${r.getDouble(2)}")
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val s = StatTests.cvmTest(same, "g", "v", "a", "b").collect().head
    assert(s.getDouble(2) == 0.0)
    // an empty side reads NULL, never 0
    val one = Seq(("a", 1.0)).toDF("g", "v")
    val e = StatTests.cvmTest(one, "g", "v", "a", "b").collect().head
    assert(e.isNullAt(2))
  }

  test("seasonal MK: a weekly cycle cannot drown the trend it hides") {
    import spark.implicits._
    // daily points, 8 weeks: a large weekly cycle + a small monotone
    // trend. Within each day-of-week season the series is strictly
    // increasing -> seasonal S saturates (7 seasons x C(8,2) = 196)
    // and the test rejects hard; plain MK on the same points sees the
    // cycle's cross-season sign noise and stays far from rejection.
    val pat = Array(0.0, 50.0, 10.0, 60.0, 20.0, 70.0, 30.0)
    val rows = (0 until 56).map { d =>
      ("m", new java.sql.Timestamp(d * 86400000L), d.toLong,
        pat(d % 7) + 0.1 * d)
    }
    val df = rows.toDF("g", "ts", "id", "v")
    val sea = StatTests.seasonalMannKendallBudget(
      df, "g", "ts", "id", "v", targetPoints = 1000).collect().head
    assert(sea.getLong(1) == 56L && sea.getLong(2) == 7L)
    assert(sea.getLong(3) == 196L, s"S ${sea.getLong(3)}")
    assert(sea.getDouble(5) < 0.01, s"seasonal p ${sea.getDouble(5)}")
    val plain = StatTests.mannKendallBudget(
      df, "g", "ts", "id", "v", targetPoints = 1000).collect().head
    assert(math.abs(sea.getDouble(4)) > math.abs(plain.getDouble(3)),
      s"seasonal z ${sea.getDouble(4)} vs plain ${plain.getDouble(3)}")
    assert(plain.getDouble(4) > 0.05,
      s"plain MK must NOT reject here, p ${plain.getDouble(4)}")
    // flat cycle (no trend): every within-season series is constant ->
    // S = 0, variance 0, z pinned to the 0 branch
    val flat = (0 until 56).map { d =>
      ("f", new java.sql.Timestamp(d * 86400000L), d.toLong, pat(d % 7))
    }
    val f = StatTests.seasonalMannKendallBudget(
      flat.toDF("g", "ts", "id", "v"), "g", "ts", "id", "v",
      targetPoints = 1000).collect().head
    assert(f.getLong(3) == 0L && f.getDouble(4) == 0.0)
  }

  test("wasserstein1: shift distance, closed forms, NULL on an empty side") {
    import spark.implicits._
    // "same": identical halves -> exactly 0. "shift": cur = ref + 10 ->
    // W1 = the mean displacement = 10 exactly (monotone matching).
    // "two": ref {0,10}, cur {5,5} -> segments [0,5): .5*5 + [5,10): .5*5 = 5.
    // "empty": all rows in the first half of the GLOBAL range -> n_cur = 0
    // -> w1 NULL (never 0, never Inf).
    val same = (1 to 100).map(i => ("same", i.toLong, i.toDouble)) ++
      (1 to 100).map(i => ("same", 100L + i, i.toDouble))
    val shift = (1 to 100).map(i => ("shift", i.toLong, i.toDouble)) ++
      (1 to 100).map(i => ("shift", 100L + i, 10.0 + i))
    val two = Seq(("two", 1L, 0.0), ("two", 2L, 10.0),
      ("two", 150L, 5.0), ("two", 151L, 5.0))
    val empty = (1 to 10).map(i => ("empty", i.toLong, i.toDouble))
    val out = StatTests.wasserstein1(
        (same ++ shift ++ two ++ empty).toDF("k", "us", "v"), "k", "us", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("same").getDouble(3) == 0.0)
    assert(out("shift").getDouble(3) == 10.0)
    assert(out("two").getDouble(3) == 5.0)
    assert(out("empty").getLong(2) == 0L && out("empty").isNullAt(3))
  }

  test("wasserstein1Fixed: union-support bins, <= binwidth error, zero-width 0") {
    import spark.implicits._
    // "move": ref 1..100, cur 1001..1100. Union support [1, 1100],
    // w = 109.9: all ref mass lands in bin 0, all cur mass clamps to
    // bin 9 -> one segment term |1-0| * (9*w). True W1 = 1000; the
    // binned read must sit within one binwidth of it.
    val move = (1 to 100).map(i => ("move", i.toLong, i.toDouble)) ++
      (1 to 100).map(i => ("move", 100L + i, 1000.0 + i))
    val same = (1 to 100).map(i => ("same", i.toLong, i.toDouble)) ++
      (1 to 100).map(i => ("same", 100L + i, i.toDouble))
    val const = (1 to 20).map(i => ("const", i.toLong, 7.0)) ++
      (1 to 20).map(i => ("const", 180L + i, 7.0))
    val out = StatTests.wasserstein1Fixed(
        (move ++ same ++ const).toDF("k", "us", "v"), "k", "us", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // mirror the operator's arithmetic exactly
    val w = (1100.0 - 1.0) / 10.0
    val expected = BigDecimal(math.round(1.0 * (9.0 * w) * 1e9).toDouble / 1e9)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("move").getDouble(3) == expected)
    assert(math.abs(out("move").getDouble(3) - 1000.0) <= w)
    assert(out("same").getDouble(3) == 0.0)
    assert(out("const").getDouble(3) == 0.0, "zero-width support reads 0")
  }
}
