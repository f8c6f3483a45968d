package graft

import graft.functions.TextOps
import graft.functions.expr.Product
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential tests — the reference's practice of checking
  * kernels against a trusted simple implementation on random inputs
  * (cpp/src/arrow/acero/hash_join_node_test.cc's join reference;
  * testing/random.h generators).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val scParams = SCTest.Parameters.default.withMinSuccessfulTests(10)

  test("Product aggregate equals an exact fold on random small-int groups") {
    import spark.implicits._
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(1, 5), Gen.choose(1, 9)))
    val prop = Prop.forAll(gen) { pairs =>
      pairs.nonEmpty ==> {
        val df = pairs.map { case (k, v) => (k, v.toDouble) }.toDF("k", "v")
        val got = Product(col("v")).as("p")
        val rows = df.groupBy(col("k")).agg(got).collect()
          .map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val expected = pairs.groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2.toDouble).product }
        rows == expected
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("distinct sketch exact tier equals the true distinct count on random multisets") {
    import spark.implicits._
    val gen = Gen.listOfN(300, Gen.choose(0L, 120L))
    val prop = Prop.forAll(gen) { vals =>
      vals.nonEmpty ==> {
        val df = vals.toDF("v")
        val got = df.agg(graft.functions.expr.DistinctSketchAgg(col("v")))
          .head().getLong(0)
        got == vals.distinct.length.toLong
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("top-k heap ignores NaN scores and keeps the total-order top set") {
    import spark.implicits._
    // regression for the NaN-poisoned-heap defect: NaN compares false
    // with everything, so an admitted NaN would make results depend on
    // merge order; the aggregate must skip NaN like null
    val gen = Gen.listOfN(60,
      Gen.zip(Gen.oneOf(Gen.choose(0.0, 100.0), Gen.const(Double.NaN)),
        Gen.choose(0L, 1000L)))
    val prop = Prop.forAll(gen) { pairs =>
      pairs.exists(p => !p._1.isNaN) ==> {
        val df = pairs.toDF("s", "id").repartition(7)
        val got = df.agg(graft.functions.expr.TopKAgg(col("s"), col("id"), 5))
          .head().getSeq[org.apache.spark.sql.Row](0)
          .map(r => (r.getDouble(0), r.getLong(1)))
        val expected = pairs.filter(!_._1.isNaN).distinct
          .sortBy { case (s, i) => (-s, i) }
        // expected top-5 under (score desc, id asc) over the DISTINCT
        // pair set the heap sees (identical pairs collapse to one entry
        // at most k times — compare against the heap's own contract:
        // no NaN, sorted by the total order, subset of the input)
        got.forall(e => !e._1.isNaN) &&
          got == got.sortBy { case (s, i) => (-s, i) } &&
          got.toSet.subsetOf(pairs.toSet) &&
          got.headOption == expected.headOption
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("prefix-filtered Jaccard equals the exact inverted-index join on random docs") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    val gen = Gen.listOfN(12, doc)
    val prop = Prop.forAll(gen) { texts =>
      texts.nonEmpty ==> {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        def pairsOf(d: org.apache.spark.sql.DataFrame) = d
          .select("da", "db", "jaccard").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val exact = pairsOf(graft.pipeline.Dedup
          .jaccardPairs(df, "doc_id", "text").filter(col("jaccard") >= 0.6))
        val prefix = pairsOf(graft.pipeline.Dedup
          .prefixJaccardPairs(df, "doc_id", "text", threshold = 0.6))
        graft.pipeline.Dedup.unpersistAll()
        prefix == exact
      }
    }
    val res = SCTest.check(scParams.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("weighted quantiles equal a brute cumulative-mass reference on random data") {
    import spark.implicits._
    val gen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0, 9), Gen.choose(1, 5)))
    val qs = Seq(0.0, 0.3, 0.5, 1.0)
    val prop = Prop.forAll(gen) { pairs =>
      pairs.nonEmpty ==> {
        val df = pairs.map { case (v, w) => (v.toDouble, w.toDouble) }
          .toDF("v", "w")
        val got = graft.operators.Quantiles.weightedExact(df, "v", "w", qs)
        val sorted = pairs.sortBy(_._1)
        val total = pairs.map(_._2).sum.toDouble
        val expected = qs.map { q =>
          val t = q * total
          var cum = 0.0
          sorted.find { case (_, w) => cum += w; cum >= t }.get._1.toDouble
        }
        got == expected
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("k-core equals a peel-to-convergence reference on random sparse graphs") {
    import spark.implicits._
    val edge = Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L))
    val gen = Gen.listOfN(16, edge)
    val prop = Prop.forAll(gen) { raw =>
      val edges = raw.filter { case (u, v) => u != v }
      edges.nonEmpty ==> {
        val df = edges.toDF("u", "v")
        val got = graft.pipeline.GraphOps.kCore(df, "u", "v", k = 2, rounds = 12)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // reference: symmetrize, peel degree < 2 until fixpoint
        val sym = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }.distinct
        var alive = sym.map(_._1).toSet
        var changed = true
        while (changed) {
          val deg = alive.map(n =>
            n -> sym.count { case (a, b) => a == n && alive(b) }).toMap
          val keep = alive.filter(deg(_) >= 2)
          changed = keep != alive
          alive = keep
        }
        val expected = alive.map(n =>
          n -> sym.count { case (a, b) => a == n && alive(b) }.toLong).toMap
        got == expected
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("synchronous LPA equals a Scala reference and ignores edge direction") {
    import spark.implicits._
    val edge = Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L))
    val gen = Gen.listOfN(14, edge)
    val rounds = 3
    val prop = Prop.forAll(gen) { raw =>
      val edges = raw.filter { case (u, v) => u != v }
      edges.nonEmpty ==> {
        val df = edges.toDF("u", "v")
        val got = graft.pipeline.GraphOps
          .labelPropagation(df, "u", "v", rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val flipped = graft.pipeline.GraphOps
          .labelPropagation(df.select(col("v").as("u"), col("u").as("v")),
            "u", "v", rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // reference: symmetrized adjacency, max-count min-label updates
        val sym = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }.distinct
        val adj = sym.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
        var lab = adj.keys.map(n => n -> n).toMap
        (1 to rounds).foreach { _ =>
          lab = adj.map { case (n, nbrs) =>
            val counts = nbrs.groupBy(lab).view.mapValues(_.size).toSeq
            n -> counts.minBy { case (l, c) => (-c, l) }._1
          }
        }
        got == lab && flipped == got
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("windowed EWMA equals a Scala reference fold on random keyed series") {
    import spark.implicits._
    val gen = Gen.listOfN(24,
      Gen.zip(Gen.choose(1, 3), Gen.choose(0.0, 10.0)))
    val (alpha, window) = (0.5, 4)
    val prop = Prop.forAll(gen) { raw =>
      raw.nonEmpty ==> {
        val rows = raw.zipWithIndex.map { case ((k, v), i) =>
          (i.toLong, s"k$k", i.toLong, v)
        }
        val got = graft.operators.Ewma
          .smooth(rows.toDF("id", "key", "t", "value"),
            "key", "t", "id", "value", alpha, window)
          .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
        val expected = rows.groupBy(_._2).flatMap { case (_, ks) =>
          val ordered = ks.sortBy(r => (r._3, r._1))
          ordered.indices.map { i =>
            val frame = ordered.slice(math.max(0, i - window + 1), i + 1)
              .map(_._4)
            val n = frame.length
            val num = frame.zipWithIndex
              .map { case (x, j) => x * math.pow(1 - alpha, (n - 1 - j).toDouble) }
              .foldLeft(0.0)(_ + _)
            val den = frame.indices
              .map(j => math.pow(1 - alpha, (n - 1 - j).toDouble))
              .foldLeft(0.0)(_ + _)
            ordered(i)._1 -> BigDecimal(num / den)
              .setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
          }
        }
        got == expected
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("RRF fusion is invariant to ranker order on random rank lists") {
    import spark.implicits._
    val entry = Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 15L))
    val gen = Gen.zip(Gen.listOfN(12, entry), Gen.listOfN(12, entry))
    val prop = Prop.forAll(gen) { case (ra, rb) =>
      def ranked(rs: List[(Long, Long)]) = rs.distinct
        .groupBy(_._1).toSeq.flatMap { case (q, ds) =>
          ds.map(_._2).distinct.zipWithIndex.map { case (d, i) =>
            (q, i + 1, d)
          }
        }
      val a = ranked(ra).toDF("query_id", "rank", "neighbor_id")
      val b = ranked(rb).toDF("query_id", "rank", "neighbor_id")
      (ranked(ra).nonEmpty && ranked(rb).nonEmpty) ==> {
        def out(rs: Seq[org.apache.spark.sql.DataFrame]) =
          graft.pipeline.Hybrid.rrf(rs, topK = 5)
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
              r.getDouble(3))).toSet
        out(Seq(a, b)) == out(Seq(b, a))
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("swapcase expression equals a character-wise reference on random text") {
    import spark.implicits._
    val gen = Gen.listOfN(8, Gen.asciiPrintableStr.map(_.take(40)))
    val prop = Prop.forAll(gen) { texts =>
      texts.nonEmpty ==> {
        val df = texts.zipWithIndex.map(_.swap).toDF("id", "t")
        val got = df.orderBy("id")
          .select(graft.functions.expr.SwapCase(col("t"))).as[String].collect().toSeq
        val expected = texts.map(_.map(ch =>
          if (ch.isUpper) ch.toLower else if (ch.isLower) ch.toUpper else ch))
        got == expected
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("native fingerprint equals a plain Scala fold on random ASCII text") {
    import spark.implicits._
    val gen = Gen.listOfN(8, Gen.asciiPrintableStr.map(_.take(60)))
    val prop = Prop.forAll(gen) { texts =>
      texts.nonEmpty ==> {
        val df = texts.zipWithIndex.map(_.swap).toDF("id", "t")
        val got = df.orderBy("id")
          .select(TextOps.polyFingerprint(col("t"))).collect().map(_.getLong(0)).toSeq
        val expected = texts.map(_.toLowerCase.foldLeft(0L)(
          (acc, ch) => (acc * 31 + ch) % 1000000007L))
        got == expected
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("both as-of implementations equal a brute-force reference on random events") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val lefts = (1L to 120L).map(id =>
        (id, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      val rights = (1000L to 1250L).map(id =>
        (id, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      val tol = 80L

      // trusted reference: per left row, max-(rt, rid) right within window
      val expected = lefts.map { case (id, uid, t) =>
        val cands = rights.filter { case (_, ruid, rt) =>
          ruid == uid && rt <= t && rt >= t - tol
        }
        id -> (if (cands.isEmpty) -1L
               else cands.maxBy { case (rid, _, rt) => (rt, rid) }._1)
      }.toMap

      val ldf = lefts.toDF("id", "uid", "t")
      val rdf = rights.toDF("rid", "ruid", "rt")

      def toMapResult(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        df.select("id", "rid").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

      val viaExec = toMapResult(AsOfJoin.backwardExec(
        ldf, rdf, ldf("t"), rdf("rt"),
        Seq(ldf("uid") -> rdf("ruid")), Seq(rdf("rid")), tol))
      assert(viaExec == expected, s"exec mismatch at seed $seed")

      val viaRewrite = toMapResult(AsOfJoin.backward(
        ldf, rdf, ldf("t"), rdf("rt"),
        Seq(ldf("uid") -> rdf("ruid")), lit(tol), ldf("id"), rdf("rid")))
      assert(viaRewrite == expected, s"rewrite mismatch at seed $seed")
    }
  }

  test("forward and multi-right as-of execs equal a brute-force reference on random events") {
    import spark.implicits._
    for (seed <- Seq(3, 11, 99)) {
      val rnd = new scala.util.Random(seed)
      // dense key/time space → plenty of duplicate timestamps and ties
      val lefts = (1L to 120L).map(id =>
        (id, rnd.nextInt(5).toLong, rnd.nextInt(400).toLong))
      val r1 = (1000L to 1200L).map(id =>
        (id, rnd.nextInt(5).toLong, rnd.nextInt(400).toLong))
      val r2 = (2000L to 2150L).map(id =>
        (id, rnd.nextInt(5).toLong, rnd.nextInt(400).toLong))
      val tol = 60L

      // forward reference: min-(rt, rid) right in [t, t+tol] per key
      def fwdRef(rights: Seq[(Long, Long, Long)]): Map[Long, Long] =
        lefts.map { case (id, uid, t) =>
          val cands = rights.filter { case (_, ruid, rt) =>
            ruid == uid && rt >= t && rt <= t + tol
          }
          id -> (if (cands.isEmpty) -1L
                 else cands.minBy { case (rid, _, rt) => (rt, rid) }._1)
        }.toMap
      // backward reference for the multi check
      def backRef(rights: Seq[(Long, Long, Long)]): Map[Long, Long] =
        lefts.map { case (id, uid, t) =>
          val cands = rights.filter { case (_, ruid, rt) =>
            ruid == uid && rt <= t && rt >= t - tol
          }
          id -> (if (cands.isEmpty) -1L
                 else cands.maxBy { case (rid, _, rt) => (rt, rid) }._1)
        }.toMap

      val ldf = lefts.toDF("id", "uid", "t")
      val r1df = r1.toDF("rid1", "ruid1", "rt1")
      val r2df = r2.toDF("rid2", "ruid2", "rt2")
      def get(df: org.apache.spark.sql.DataFrame, c: String): Map[Long, Long] =
        df.select("id", c).collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

      val fwd = AsOfJoin.forwardExec(
        ldf, r1df, ldf("t"), r1df("rt1"),
        Seq(ldf("uid") -> r1df("ruid1")), Seq(r1df("rid1")), tol)
      assert(get(fwd, "rid1") == fwdRef(r1), s"forward exec mismatch at seed $seed")

      val rightsSpec = Seq(
        AsOfJoin.AsOfRight(r1df, r1df("rt1"), Seq(r1df("ruid1")), Seq(r1df("rid1"))),
        AsOfJoin.AsOfRight(r2df, r2df("rt2"), Seq(r2df("ruid2")), Seq(r2df("rid2"))))
      val multiB = AsOfJoin.backwardExecMulti(
        ldf, ldf("t"), Seq(ldf("uid")), rightsSpec, tol)
      assert(get(multiB, "rid1") == backRef(r1), s"multi backward r1 mismatch at seed $seed")
      assert(get(multiB, "rid2") == backRef(r2), s"multi backward r2 mismatch at seed $seed")

      val multiF = AsOfJoin.forwardExecMulti(
        ldf, ldf("t"), Seq(ldf("uid")), rightsSpec, tol)
      assert(get(multiF, "rid1") == fwdRef(r1), s"multi forward r1 mismatch at seed $seed")
      assert(get(multiF, "rid2") == fwdRef(r2), s"multi forward r2 mismatch at seed $seed")
    }
  }

  test("grouped quantiles equal grouped percentile() on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    (0 until 3).foreach { seed =>
      val rows = (0 until 150).map { _ =>
        (s"g${rng.nextInt(4)}", math.round(rng.nextDouble() * 1000) / 10.0)
      }
      val qs = Seq(0.1, 0.5, 0.9)
      val df = rows.toDF("g", "x")
      val viaWindow = graft.operators.Quantiles
        .exactGrouped(df, "g", "x", qs)
        .collect().map(r => r.getString(0) -> (1 to 3).map(r.getDouble)).toMap
      val viaBuffer = df.groupBy(col("g"))
        .agg(percentile(col("x"), array(qs.map(lit): _*)).as("p"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(viaWindow.keySet == viaBuffer.keySet, s"seed $seed")
      viaWindow.foreach { case (g, vs) =>
        vs.zip(viaBuffer(g)).foreach { case (w, b) =>
          assert(math.abs(w - b) <= math.ulp(b) * 4, s"seed $seed group $g: $w vs $b")
        }
      }
    }
  }

  test("morton key de-interleaves back to both inputs on random 16-bit pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(500)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong)) ++
      Seq((0L, 0L), (0xFFFFL, 0xFFFFL), (0xFFFFL, 0L), (0L, 0xFFFFL))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.ZOrder.mortonKey(col("x"), col("y")).as("z"))
      .collect()
    def unspread(z: Long): Long = { // inverse magic-mask ladder
      var v = z & 0x55555555L
      v = (v | (v >> 1)) & 0x33333333L
      v = (v | (v >> 2)) & 0x0F0F0F0FL
      v = (v | (v >> 4)) & 0x00FF00FFL
      (v | (v >> 8)) & 0x0000FFFFL
    }
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(unspread(z) == x && unspread(z >> 1) == y,
        s"morton round-trip failed for ($x, $y): z=$z")
    }
  }

  test("mortonKeyN: 2-dim layout equals mortonKey; N-dim de-interleaves per dim") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val triples = Seq.fill(300)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong)) ++
      Seq((0L, 0L, 0L), (0xFFFFL, 0xFFFFL, 0xFFFFL), (0xFFFFL, 0L, 0xFFFFL))
    // n = 2: identical bit layout to the magic-mask ladder
    val two = triples.toDF("x", "y", "q")
      .select(
        graft.functions.ZOrder.mortonKey(col("x"), col("y")).as("a"),
        graft.functions.ZOrder.mortonKeyN(Seq(col("x"), col("y"))).as("b"))
      .collect()
    two.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // n = 3: extracting every 3rd bit recovers each input exactly
    val three = triples.toDF("x", "y", "q")
      .select(col("x"), col("y"), col("q"),
        graft.functions.ZOrder.mortonKeyN(
          Seq(col("x"), col("y"), col("q"))).as("z"))
      .collect()
    def unspread3(z: Long, d: Int): Long =
      (0 until 16).map(i => ((z >> (i * 3 + d)) & 1L) << i).reduce(_ | _)
    three.foreach { r =>
      val (x, y, q, z) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(unspread3(z, 0) == x && unspread3(z, 1) == y && unspread3(z, 2) == q,
        s"3-dim morton round-trip failed for ($x, $y, $q): z=$z")
    }
    intercept[IllegalArgumentException] {
      graft.functions.ZOrder.mortonKeyN(Seq(col("x")))
    }
  }

  test("rankBucket on quantile boundaries balances a skewed dimension") {
    import spark.implicits._
    // heavily skewed positive values (quadratic stretch of a uniform id)
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(4000)(rnd.nextDouble()).map(u => u * u * 1e6).toDF("v")
    val nB = 31 // 32 buckets
    val boundaries = graft.operators.Quantiles.exact(
      df, "v", (1 to nB).map(_.toDouble / (nB + 1)))
    val bucketed = df
      .select(col("v"), graft.functions.ZOrder.rankBucket(col("v"), boundaries).as("b"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    // in range, and monotone wrt the value
    assert(bucketed.forall { case (_, b) => b >= 0 && b <= nB })
    val sortedByV = bucketed.sortBy(_._1).map(_._2)
    assert(sortedByV.zip(sortedByV.tail).forall { case (a, b) => a <= b })
    // quantile boundaries make occupancy uniform: no bucket more than
    // 2x the ideal share despite the skewed domain
    val counts = bucketed.groupBy(_._2).map(_._2.length)
    assert(counts.max <= 2 * (4000 / (nB + 1)),
      s"skewed occupancy: max bucket ${counts.max} of 4000")
  }

  test("operator misuse fails loudly, not silently") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      graft.operators.RangeJoin.pointInInterval(df, "a", df, "a", "b", 0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.RangeJoin.pointInInterval(df, "a", df, "a", "b", 10, "full_outer")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Quantiles.exactGrouped(df, "a", "b", Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Quantiles.exactGrouped(df, "a", "b", Seq(0.5), "spline")
    }
    intercept[IllegalArgumentException] {
      graft.streaming.StreamingOps.enrichWithStatic(df, df, "a", "full_outer")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Skew.saltedJoin(df, df, col("a"), col("a"), 0)
    }
    intercept[IllegalArgumentException] {
      val clash = df.withColumnRenamed("b", "__salt")
      graft.operators.Skew.saltedJoin(clash, df, col("a"), col("a"), 4)
    }
  }

  test("weighted top-n equals an in-memory ES reference on random weights") {
    import spark.implicits._
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(0, 3), Gen.choose(1L, 50L)))
    val prop = Prop.forAll(gen) { raw =>
      raw.nonEmpty ==> {
        // distinct ids so md5 draws are unique per row
        val rows = raw.zipWithIndex.map { case ((g, w), i) =>
          (i.toLong, s"g$g", w)
        }
        val df = rows.toDF("id", "g", "w")
        val got = graft.pipeline.Sharding.weightedTopN(df, "g", "id", "w", 4)
          .collect().map(r => (r.getString(1), r.getLong(0))).toSet
        // in-memory reference: same 48-bit md5 uniform, same exp key
        def key(id: Long, w: Long): Double = {
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("UTF-8"))
            .take(6).map("%02x".format(_)).mkString
          val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 281474976710656.0
          -math.log(u) / w
        }
        // non-positive weights are excluded, same as the operator
        // (scalacheck shrinking can step outside the generator's range);
        // note .toSeq before flatMap — Map#flatMap over (g, id) tuples
        // would rebuild a MAP and silently collapse to one id per group
        val expect = rows.filter(_._3 > 0).groupBy(_._2).toSeq
          .flatMap { case (g, rs) =>
            rs.sortBy { case (id, _, w) => (key(id, w), id) }.take(4)
              .map(r => (g, r._1))
          }.toSet
        got == expect
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("kmeans assignment equals an in-memory argmin on random vectors") {
    import spark.implicits._
    val gen = Gen.listOfN(20, Gen.listOfN(4, Gen.choose(-100, 100)))
    val prop = Prop.forAll(gen) { raw =>
      (raw.length >= 4) ==> {
        val rows = raw.zipWithIndex.map { case (v, i) =>
          (i.toLong, v.map(x => x.toFloat / 7f))
        }
        val df = rows.toDF("id", "v")
        val (assigned, centroids) =
          graft.pipeline.ClusterOps.kmeans(df, "id", "v", k = 3, iterations = 2)
        val got = assigned.select(col("id"), col("cid"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        // reference argmin against the RETURNED centroids with the same
        // 6-dp-rounded distances and lowest-cid tie-break
        def d2(v: Seq[Float], c: Array[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < c.length) {
            val d = v(i).toDouble - c(i); s += d * d; i += 1
          }
          BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        rows.forall { case (id, v) =>
          val ds = centroids.map(c => d2(v, c))
          got(id) == ds.indexOf(ds.min)
        }
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("banded range join equals the in-memory reference on random intervals") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    (0 until 5).foreach { seed =>
      // random axis values spanning negatives and multiple bins; random
      // bin width deliberately NOT tuned to the interval lengths
      val binWidth = Seq(3L, 16L, 50L)(seed % 3)
      val points = (0 until 60).map(i => (i.toLong, rng.nextLong() % 300))
      val intervals = (0 until 25).map { i =>
        val s = rng.nextLong() % 300
        (1000L + i, s, s + rng.nextInt(80) - 5) // some degenerate (end < start)
      }
      val expected = (for {
        (pid, x) <- points
        (ivid, s, e) <- intervals
        if s <= e && x >= s && x <= e
      } yield (pid, ivid)).toSet

      val pdf = points.toDF("pt_key", "pt_x")
      val ivdf = intervals.toDF("iv_key", "iv_s", "iv_e")
      val got = graft.operators.RangeJoin
        .pointInInterval(pdf, "pt_x", ivdf, "iv_s", "iv_e", binWidth)
        .select("pt_key", "iv_key").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet == expected, s"pair-set mismatch at seed $seed width $binWidth")
      assert(got.length == expected.size, s"duplicate pairs at seed $seed width $binWidth")
    }
  }

  // shared fixture shape for the budget-lottery estimator family: a
  // (g, ts, id, v) frame where targetPoints is far above the sample
  // size, so the lottery provably keeps everything (budget spec) and
  // the operators are exact over the generated data
  private def estimatorDf(as: Seq[Double], bs: Seq[Double]) = {
    import spark.implicits._
    def rows(g: String, off: Int, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, i) =>
        (g, new java.sql.Timestamp((i + 1) * 1000L), (off + i).toLong, v)
    }
    (rows("a", 0, as) ++ rows("b", 1000, bs)).toDF("g", "ts", "id", "v")
  }

  // quarter-step values: exact in double AND at the 1e9 long scaling
  private def qGen(n: Int) =
    Gen.listOfN(n, Gen.choose(0, 1200).map(_ / 4.0))

  test("hodges-lehmann equals the brute sorted-pair lower median on random data") {
    val gen = Gen.zip(qGen(12), qGen(9))
    val prop = Prop.forAll(gen) { case (as, bs) =>
      (as.nonEmpty && bs.nonEmpty) ==> {
        val got = graft.operators.StatTests
          .hodgesLehmannBudget(estimatorDf(as, bs), "g", "ts", "id", "v",
            "a", "b", targetPoints = 100000)
          .collect().head.getDouble(3)
        val diffs = (for (x <- as; y <- bs) yield x - y).sorted
        val want = diffs((diffs.length + 1) / 2 - 1)
        math.abs(got - want) < 1e-9
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("qn scale equals the brute pairwise order statistic on random data") {
    val prop = Prop.forAll(qGen(11)) { vs =>
      (vs.length >= 2) ==> {
        val got = graft.operators.StatTests
          .qnScaleBudget(estimatorDf(vs, Seq(0.0)), "g", "ts", "id", "v",
            targetPoints = 100000)
          .collect().map(r => r.getString(0) -> r).toMap
        val diffs = (for {
          i <- vs.indices; j <- vs.indices if i < j
        } yield math.abs(vs(i) - vs(j))).sorted
        val h = vs.length / 2 + 1
        val want = diffs(h * (h - 1) / 2 - 1)
        math.abs(got("a").getDouble(3) - want) < 1e-9
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("kendall tau-b equals the brute index-pair count on random data") {
    val prop = Prop.forAll(qGen(14)) { vs =>
      (vs.length >= 3 && vs.distinct.length > 1) ==> {
        val got = graft.operators.StatTests
          .kendallTauBudget(estimatorDf(vs, Seq(0.0, 1.0)), "g", "ts", "id",
            "v", targetPoints = 100000)
          .collect().map(r => r.getString(0) -> r).toMap
        val n = vs.length
        var s = 0L
        for (i <- 0 until n; j <- i + 1 until n)
          s += java.lang.Double.compare(vs(j), vs(i)).sign
        val n0 = n.toLong * (n - 1) / 2
        val tv = vs.groupBy(identity).values
          .map(g => g.length.toLong * (g.length - 1) / 2).sum
        val want = s.toDouble / math.sqrt(n0.toDouble * (n0 - tv))
        got("a").getLong(2) == s &&
          math.abs(got("a").getDouble(3) - want) < 1e-5
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("log-rank O1/E1/V equal a brute risk-set walk on random censored data") {
    import spark.implicits._
    val subjGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 1L), Gen.choose(1L, 12L), Gen.oneOf(true, false)))
    val prop = Prop.forAll(subjGen) { subj =>
      subj.exists(s => !s._3) ==> {
        val got = graft.operators.Survival
          .logRank(subj.toDF("g", "dur", "c"), "g", "dur", "c")
          .collect().head
        // brute: walk pooled death times ascending, risk set = dur >= t
        val deathTimes = subj.filter(!_._3).map(_._2).distinct.sorted
        var o1 = 0L; var e1 = 0.0; var v = 0.0
        for (t <- deathTimes) {
          val n1 = subj.count(s => s._1 == 0L && s._2 >= t)
          val n2 = subj.count(s => s._1 == 1L && s._2 >= t)
          val d1 = subj.count(s => s._1 == 0L && s._2 == t && !s._3)
          val d2 = subj.count(s => s._1 == 1L && s._2 == t && !s._3)
          val (nj, dj) = (n1 + n2, d1 + d2)
          o1 += d1
          // mirror the operator's round@9 term ladder exactly
          e1 += math.rint(dj.toDouble * n1 / nj * 1e9) / 1e9
          if (nj > 1)
            v += math.rint(dj.toDouble * (n1.toDouble / nj) *
              (1.0 - n1.toDouble / nj) * (nj - dj) / (nj - 1.0) * 1e9) / 1e9
        }
        got.getLong(1) == o1 &&
          math.abs(got.getDouble(2) - e1) < 1e-5 &&
          math.abs(got.getDouble(3) - v) < 1e-5
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("runs test R/n1/n0 equal a brute sign-walk on random odd-length series") {
    import spark.implicits._
    // odd length -> the interpolated median IS a sample value, so the
    // drop-equals rule and the brute reference agree with no
    // interpolation ambiguity
    val gen = Gen.listOfN(21, Gen.choose(0, 40).map(_ / 2.0))
    val prop = Prop.forAll(gen) { vs =>
      vs.distinct.length > 1 ==> {
        val df = vs.zipWithIndex.map { case (v, i) => ("g", i.toLong, i.toLong, v) }
          .toDF("g", "t", "id", "v")
        val got = graft.operators.StatTests.runsTest(df, "g", "t", "id", "v")
          .collect().head
        val med = vs.sorted.apply(vs.length / 2)
        val signs = vs.filter(_ != med).map(_ > med)
        val runs = 1 + signs.sliding(2).count {
          case Seq(a, b) => a != b
          case _ => false
        }
        got.getLong(1) == signs.count(identity) &&
          got.getLong(2) == signs.count(!_) &&
          got.getLong(3) == runs
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("kruskal-wallis H equals a brute midrank recomputation on random groups") {
    import spark.implicits._
    val gen = Gen.zip(qGen(10), qGen(8), qGen(6))
    val prop = Prop.forAll(gen) { case (as, bs, cs) =>
      (as.nonEmpty && bs.nonEmpty && cs.nonEmpty) ==> {
        val df = (as.map(("a", _)) ++ bs.map(("b", _)) ++ cs.map(("c", _)))
          .toDF("g", "v")
        val got = graft.operators.StatTests.kruskalWallis(df, "g", "v")
          .collect().head.getDouble(4)
        val all = (as ++ bs ++ cs).sorted
        def midrank(v: Double): Double = {
          val lo = all.indexOf(v); val hi = all.lastIndexOf(v)
          (lo + hi) / 2.0 + 1.0
        }
        val n = all.length.toDouble
        val groups = Seq(as, bs, cs)
        val sumTerm = groups.map { g =>
          val rbar = g.map(midrank).sum / g.length
          g.length * (rbar - (n + 1) / 2) * (rbar - (n + 1) / 2)
        }.sum
        val want = 12.0 / (n * (n + 1)) * sumTerm
        math.abs(got - want) < 1e-4
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("tukey hsd q equals a brute moment recomputation on random groups") {
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 400)))
    val prop = Prop.forAll(gen) { pairs =>
      val byG = pairs.groupMap(_._1)(_._2.toDouble / 4.0)
      (byG.size >= 2 && byG.values.map(_.toSet).exists(_.size > 1)) ==> {
        val df = pairs.map { case (g, v) => (s"g$g", v / 4.0) }.toDF("g", "v")
        val got = graft.operators.StatTests.tukeyHsd(df, "g", "v")
          .collect().map(r => (r.getString(0), r.getString(1)) ->
            (if (r.isNullAt(5)) Double.NaN else r.getDouble(5))).toMap
        val n = pairs.length
        val k = byG.size
        val ssw = byG.values.map { vs =>
          val m = vs.sum / vs.length; vs.map(x => (x - m) * (x - m)).sum
        }.sum
        val msw = ssw / (n - k)
        got.forall { case ((ga, gb), q) =>
          val a = byG(ga.drop(1).toInt); val b = byG(gb.drop(1).toInt)
          if (msw <= 0) q.isNaN
          else {
            val se = math.sqrt(msw / 2.0 * (1.0 / a.length + 1.0 / b.length))
            math.abs(q - (a.sum / a.length - b.sum / b.length) / se) < 1e-4
          }
        }
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("cochran-armitage z equals a brute closed form on random dose tables") {
    import spark.implicits._
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(0, 4), Gen.choose(0, 1)))
    val prop = Prop.forAll(gen) { rows =>
      val byW = rows.groupMap(_._1)(_._2)
      val bigR = rows.map(_._2).sum
      (byW.size >= 2 && bigR > 0 && bigR < rows.length) ==> {
        val df = rows.map { case (w, y) => (w.toLong, y.toLong) }.toDF("w", "s")
        val got = graft.operators.StatTests.cochranArmitage(df, "w", "s")
          .collect().head.getDouble(3)
        val n = rows.length.toDouble
        val swr = byW.map { case (w, ys) => w.toDouble * ys.sum }.sum
        val swn = byW.map { case (w, ys) => w.toDouble * ys.length }.sum
        val sw2n = byW.map { case (w, ys) => w.toDouble * w * ys.length }.sum
        val num = n * swr - swn * bigR
        val vb = n * sw2n - swn * swn
        val want = num * math.sqrt(n) / (math.sqrt(bigR * (n - bigR)) * math.sqrt(vb))
        vb <= 0 || math.abs(got - want) < 1e-4
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("cuped theta and adjusted diff equal a brute covariance fit on random units") {
    import spark.implicits._
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 1), Gen.choose(0, 400),
      Gen.choose(0, 400)))
    val prop = Prop.forAll(gen) { rows =>
      val sides = rows.groupBy(_._1)
      (sides.size == 2 && sides.values.forall(_.length >= 2) &&
        rows.map(_._2).toSet.size > 1) ==> {
        val df = rows.map { case (v, x, y) =>
          (v.toLong, x / 4.0, y / 4.0) }.toDF("v", "x", "y")
        val r = graft.operators.StatTests.cuped(df, "v", "x", "y")
          .collect().head
        val xs = rows.map(_._2 / 4.0); val ys = rows.map(_._3 / 4.0)
        val n = rows.length.toDouble
        val xm = xs.sum / n; val ym = ys.sum / n
        val cov = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum
        val vx = xs.map(x => (x - xm) * (x - xm)).sum
        val theta = cov / vx
        def m(v: Int, f: ((Int, Int, Int)) => Double) = {
          val g = sides(v); g.map(f).sum / g.length
        }
        val diffAdj = (m(0, _._3 / 4.0) - m(1, _._3 / 4.0)) -
          theta * (m(0, _._2 / 4.0) - m(1, _._2 / 4.0))
        math.abs(r.getDouble(2) - theta) < 1e-6 &&
          math.abs(r.getDouble(4) - diffAdj) < 1e-5
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("ratio metric R and z equal a brute delta-method recomputation") {
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0, 1), Gen.choose(0, 400),
      Gen.choose(1, 400)))
    val prop = Prop.forAll(gen) { rows =>
      val sides = rows.groupBy(_._1)
      (sides.size == 2 && sides.values.forall(_.length >= 2)) ==> {
        val df = rows.map { case (v, y, x) =>
          (v.toLong, y / 4.0, x / 4.0) }.toDF("v", "y", "x")
        val r = graft.operators.StatTests.ratioMetric(df, "v", "y", "x")
          .collect().head
        def stats(v: Int): (Double, Double) = {
          val g = sides(v)
          val ys = g.map(_._2 / 4.0); val xs = g.map(_._3 / 4.0)
          val n = g.length.toDouble
          // the operator feeds the ROUNDED@9 ratio into the variance
          val rr = BigDecimal(ys.sum / xs.sum)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          val xm = xs.sum / n; val ym = ys.sum / n
          val vy = ys.map(y => (y - ym) * (y - ym)).sum / (n - 1)
          val vx = xs.map(x => (x - xm) * (x - xm)).sum / (n - 1)
          val cxy = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum / (n - 1)
          (rr, (vy - 2 * rr * cxy + rr * rr * vx) / (n * xm * xm))
        }
        val (r0, v0) = stats(0); val (r1, v1) = stats(1)
        math.abs(r.getDouble(2) - r0) < 1e-7 &&
          math.abs(r.getDouble(3) - r1) < 1e-7 &&
          (v0 + v1 <= 0 ||
            math.abs(r.getDouble(5) - (r0 - r1) / math.sqrt(v0 + v1)) < 1e-4)
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }

  test("sprt first crossing equals a brute trajectory walk on random sequences") {
    import spark.implicits._
    val gen = Gen.listOfN(40, Gen.choose(0, 1))
    val prop = Prop.forAll(gen) { bits =>
      bits.nonEmpty ==> {
        val df = bits.zipWithIndex.map { case (b, i) =>
          ("g", new java.sql.Timestamp(i * 1000L), i.toLong, b.toLong)
        }.toDF("g", "ts", "id", "s")
        val r = graft.operators.StatTests
          .sprtBernoulli(df, "g", "ts", "id", "s", p0 = 0.3, p1 = 0.6)
          .collect().head
        val lW = math.log(0.6 / 0.3); val lL = math.log(0.4 / 0.7)
        val a = math.log((1 - 0.2) / 0.05); val b = math.log(0.2 / 0.95)
        var k = 0L; var cross: Option[(Int, String)] = None
        bits.zipWithIndex.foreach { case (s0, i) =>
          k += s0
          val llr = BigDecimal(k * lW + (i + 1 - k) * lL)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (cross.isEmpty) {
            if (llr >= a) cross = Some((i + 1, "accept_h1"))
            else if (llr <= b) cross = Some((i + 1, "accept_h0"))
          }
        }
        cross match {
          case None => r.isNullAt(7) && r.getString(8) == "continue"
          case Some((n, dec)) =>
            r.getLong(7) == n.toLong && r.getString(8) == dec
        }
      }
    }
    val res = SCTest.check(scParams, prop)
    assert(res.passed, res.status.toString)
  }
}
