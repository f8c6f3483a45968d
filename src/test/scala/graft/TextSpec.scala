package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bigram LM punishes scrambled word order that the unigram model cannot see") {
    import spark.implicits._
    // same unigram distribution, reversed transitions: only a
    // word-order-aware model separates them
    val docs = ((1 to 20).map(i => (i.toLong, "a b c d e")) :+
      (99L, "e d c b a")).toDF("doc_id", "text")
    val bi = graft.pipeline.TextQueries
      .bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(bi(99L) < bi(1L), bi.toString)
    val uni = graft.pipeline.TextQueries
      .unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(uni(99L) == uni(1L), uni.toString) // unigram is order-blind
    // a one-token document has no transitions and drops from the output
    val tiny = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    assert(graft.pipeline.TextQueries.bigramLogProb(tiny, "doc_id", "text")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // the JM interpolation keeps the order separation at lambda 0.75 …
    val jm = graft.pipeline.TextQueries
      .interpolatedLogProb(docs, "doc_id", "text", lambda = 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(jm(99L) < jm(1L), jm.toString)
    // … and degrades to the order-blind unigram model as lambda -> 0
    val jm0 = graft.pipeline.TextQueries
      .interpolatedLogProb(docs, "doc_id", "text", lambda = 1e-9)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(jm0(99L) - jm0(1L)) < 1e-4, jm0.toString)
  }

  test("DSIR tilts selection toward target-like documents") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // target-like docs repeat the target bigram vocabulary; raw-only docs
    // use a disjoint one; one doc is a single token (no bigram evidence)
    val tgt = (0L until 10L).map(i => (i, "alpha beta alpha beta alpha beta", true))
    val raw = (10L until 30L).map(i => (i, "gamma delta gamma delta gamma delta", false))
    val docs = (tgt ++ raw :+ ((99L, "solo", false)))
      .toDF("id", "text", "is_t")
    val lw = graft.pipeline.Dsir.logWeights(docs, "id", "text",
      graft.pipeline.Dsir.bucketLogRatios(docs, "text", col("is_t")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the single-token doc has no bigrams and drops from scoring
    assert(!lw.exists(_._1 == 99L))
    assert(lw.forall(_._2 == 5L), lw.mkString(","))
    val byId = lw.map(t => t._1 -> t._3).toMap
    // every target-vocabulary doc outweighs every raw-only doc
    assert((0L until 10L).forall(t => (10L until 30L)
      .forall(r => byId(t) > byId(r))), byId.toString)
    // Gumbel-top-k at n = 12: all 10 high-weight docs survive when the
    // weight gap dominates the Gumbel noise range on this fixture
    val sel = graft.pipeline.Dsir.selectTopN(docs, "id", "text",
      col("is_t"), 12).collect().map(_.getLong(0)).toSet
    assert((0L until 10L).toSet.subsetOf(sel), sel.toString)
  }

  test("PMI ranks a planted collocation above independent co-occurrences") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // "new" and "york" ONLY ever occur together; filler words pair freely
    val fill = Seq("a", "b", "c", "d")
    val docs = (0 until 40).map { i =>
      val f = fill(i % 4) + " " + fill((i + 1) % 4) + " " + fill((i + 2) % 4)
      (i.toLong, s"new york $f")
    }.toDF("doc_id", "text")
    // mirror of the gated query at a tiny min count, via the same exprs
    val ws = graft.functions.TextOps.words(col("text"))
    val uni = docs.select(explode(ws).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n = uni.agg(sum(col("c")).as("n"))
    val bg = docs.select(explode(arrays_zip(
        slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1))).as("p"))
      .select(col("p").getField("0").as("wl"), col("p").getField("1").as("wr"))
    val bc = bg.groupBy(col("wl"), col("wr")).agg(count(lit(1)).as("cb"))
    val nb = bc.agg(sum(col("cb")).as("nb"))
    val pmi = bc.filter(col("cb") >= 3)
      .join(uni.select(col("w").as("wl"), col("c").as("ca")), Seq("wl"))
      .join(uni.select(col("w").as("wr"), col("c").as("cd")), Seq("wr"))
      .crossJoin(broadcast(n)).crossJoin(broadcast(nb))
      .select(concat(col("wl"), lit(" "), col("wr")).as("bigram"),
        round(log2((col("cb").cast("double") / col("nb")) /
          ((col("ca").cast("double") / col("n")) *
            (col("cd").cast("double") / col("n")))), 9).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(pmi.head._1 == "new york", pmi.take(5).mkString(","))
    // the perfect collocation's PMI is strictly above every filler pair
    assert(pmi.tail.forall(_._2 < pmi.head._2), pmi.take(5).mkString(","))
  }

  test("BPE learns the textbook merge order on the Sennrich corpus") {
    import spark.implicits._
    import graft.pipeline.Bpe
    // the worked example from the BPE paper: weighted words low*5,
    // lower*2, newest*6, widest*3 — the first merges are driven by the
    // (e,s) pair at weight 9
    val docs = (
      List.fill(5)("low") ++ List.fill(2)("lower") ++
      List.fill(6)("newest") ++ List.fill(3)("widest"))
      .map(Tuple1(_)).toDF("text")
    val merges = Bpe.train(docs, "text", nMerges = 4)
    assert(merges.take(3) == Seq(("e", "s"), ("es", "t"), ("est", Bpe.Eow)),
      merges.toString)
    // the distributed tier (forced by a zero collect cap) learns the
    // IDENTICAL merge sequence — the two tiers share one total order
    val distributed = Bpe.train(docs, "text", nMerges = 4, maxVocabCollect = 0)
    assert(distributed == merges, s"$distributed vs $merges")
    // tokenizing with those merges keeps "est▁" together
    val toks = Bpe.tokenize(Seq(Tuple1("newest")).toDF("text"), "text", merges)
      .select(col("tokens")).head().getSeq[String](0)
    assert(toks.last == "est" + Bpe.Eow, toks.toString)
    assert(toks.mkString("") == "newest" + Bpe.Eow)
  }

  test("BPE greedy rewrite is left-to-right non-overlapping and lossless") {
    import graft.pipeline.Bpe
    // overlapping occurrences: aaa + (a,a) merges the FIRST pair only
    assert(Bpe.mergeOnce(Array("a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "a"))
    assert(Bpe.mergeOnce(Array("a", "a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "aa"))
    // losslessness on real documents with the learned merges
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .limit(200)
    val merges = Bpe.train(docs, "text", nMerges = 12)
    assert(merges.length == 12)
    val bad = Bpe.tokenize(docs, "text", merges)
      .filter(concat_ws("", col("tokens")) =!=
        concat(regexp_replace(trim(col("text")), "\\s+", Bpe.Eow), lit(Bpe.Eow)))
      .count()
    assert(bad == 0)
    // more merges never increase the token total
    def total(m: Seq[(String, String)]): Long =
      Bpe.tokenize(docs, "text", m).agg(sum(col("n_tokens"))).head().getLong(0)
    assert(total(merges) <= total(merges.take(6)))
    assert(total(merges.take(6)) <= total(Seq.empty))
    assert(total(merges) < total(Seq.empty))
  }

  test("shingles produce size-n word windows, deduplicated") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "x x x x").toDF("text")
    val out = df.select(TextOps.shingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) == List("a b c", "b c d"))
    assert(out(1) == Nil) // shorter than n → empty, not a descending-sequence crash
    assert(out(2) == List("x x x")) // duplicates collapsed
  }

  test("polynomial fingerprint: equal text ⇒ equal fp, case-insensitive") {
    import spark.implicits._
    val df = Seq((1L, "Hello World"), (2L, "hello world"), (3L, "other")).toDF("id", "t")
    val fps = df.select(TextOps.polyFingerprint(col("t"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    assert(fps.forall(f => f >= 0 && f < 1000000007L))
  }

  test("native fingerprint expression equals the HOF formulation on the corpus") {
    val diffs = Tables.documents(spark, sf)
      .select(
        TextOps.polyFingerprint(col("text")).as("native"),
        TextOps.polyFingerprintHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0)
  }

  test("xxhash64 is the fast fingerprint path with the same collision contract") {
    val n = Tables.documents(spark, sf)
      .select(xxhash64(col("text")).as("fp")).distinct().count()
    assert(n == Tables.documents(spark, sf).count()) // no collisions on corpus
  }

  test("native shingles are bit-equal to the HOF twin (corpus + adversarial + random)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.TextOps

    def parity(df: org.apache.spark.sql.DataFrame, textCol: String, n: Int): Unit = {
      val both = df.select(
        TextOps.shingles(col(textCol), n).as("native"),
        TextOps.shinglesHof(col(textCol), n).as("hof"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
      }
    }
    // real corpus at several n
    for (n <- Seq(1, 3, 8)) parity(Tables.documents(spark, sf), "text", n)
    // adversarial whitespace: empties, runs of spaces, unicode, dups
    val nasty = Seq(
      "", " ", "  ", "a", "a b", "a  b", " a b ", "a b a b a b",
      "  leading", "trailing  ", "tab\tis one token", "ünï çødé ünï çødé",
      null.asInstanceOf[String], "x " * 50 + "x"
    ).toDF("t")
    for (n <- Seq(1, 2, 3, 5)) parity(nasty, "t", n)
    // randomized word soup with planted repeats and empty tokens
    val rnd = new scala.util.Random(7)
    val soup = (1 to 200).map { _ =>
      (1 to rnd.nextInt(30)).map(_ =>
        if (rnd.nextInt(8) == 0) "" else s"w${rnd.nextInt(6)}").mkString(" ")
    }.toDF("t")
    for (n <- Seq(2, 3)) parity(soup, "t", n)
  }

  test("hashed-key decontamination equals the string-keyed baseline") {
    import org.apache.spark.sql.functions.{col, md5, substring}
    val docs = Tables.documents(spark, sf)
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
    def run(hashed: Boolean): Map[Long, Long] =
      graft.pipeline.TextQueries.decontaminate(
        docs, "doc_id", "text",
        isEval = bucket >= "e6", isTrain = bucket < "cc", n = 8,
        hashKeys = hashed)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byString = run(hashed = false)
    val byHash = run(hashed = true)
    assert(byString.nonEmpty, "fixture should contain contaminated train docs")
    assert(byHash == byString)
  }

  test("bloom decontamination equals the exact baseline, even at absurd fpp") {
    import org.apache.spark.sql.functions.{col, md5, substring}
    val docs = Tables.documents(spark, sf)
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
    val exact = graft.pipeline.TextQueries.decontaminate(
      docs, "doc_id", "text",
      isEval = bucket >= "e6", isTrain = bucket < "cc", n = 8,
      hashKeys = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def bloom(fpp: Double): Map[Long, Long] =
      graft.pipeline.TextQueries.decontaminateBloom(
        docs, "doc_id", "text",
        isEval = bucket >= "e6", isTrain = bucket < "cc", n = 8, fpp = fpp)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty)
    assert(bloom(0.01) == exact)
    // at fpp 0.9 nearly every train shingle passes the probe — the
    // verification semi-join must still make the OUTPUT exact
    assert(bloom(0.9) == exact)
    // empty eval side: nothing can leak, empty result, no crash
    val none = graft.pipeline.TextQueries.decontaminateBloom(
      docs, "doc_id", "text",
      isEval = org.apache.spark.sql.functions.lit(false),
      isTrain = bucket < "cc", n = 8)
    assert(none.count() == 0)
  }

  test("df-capped decontamination equals exact when no shingle is hot") {
    import org.apache.spark.sql.functions.{col, md5, substring}
    val docs = Tables.documents(spark, sf)
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
    def run(cap: Option[Int]): Map[Long, Long] =
      graft.pipeline.TextQueries.decontaminate(
        docs, "doc_id", "text",
        isEval = bucket >= "e6", isTrain = bucket < "cc", n = 8,
        maxTrainDf = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = run(None)
    // fixture 8-gram shingles are essentially unique per doc — a cap far
    // above any real train-df must reproduce the exact result bit-for-bit
    assert(exact.nonEmpty)
    assert(run(Some(1000000)) == exact)
  }

  test("df cap actually drops a planted hot shingle (bounded-buffer path)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 30 train docs all share the same 3-gram boilerplate; two of them
    // also share a RARE 3-gram with the eval doc. eval contains both.
    val boiler = "x1 x2 x3"
    val rare = "r1 r2 r3"
    val docs = (
      (1 to 30).map(i => (i.toLong, s"$boiler pad$i")) ++     // train, hot only
        Seq((31L, s"lead31 $rare"), (32L, s"lead32 $rare")) ++ // train, rare too
        Seq((100L, s"$boiler $rare"))                          // eval
      ).toDF("doc_id", "text")
    def run(cap: Option[Int]): Map[Long, Long] =
      graft.pipeline.TextQueries.decontaminate(
        docs, "doc_id", "text",
        isEval = col("doc_id") >= 100L, isTrain = col("doc_id") < 100L, n = 3,
        maxTrainDf = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = run(None)
    // uncapped: every train doc flagged via the boilerplate shingle
    assert(exact.keySet.size == 32)
    // cap=10: the 30-doc boilerplate shingle is dropped; only the two
    // rare-shingle docs remain contaminated
    val capped = run(Some(10))
    assert(capped == Map(31L -> 1L, 32L -> 1L))
  }

  test("quality scores are in [0,1] and langid predicts a known language") {
    val q = Registry.byName("text_quality").run(spark, sf).collect()
    q.foreach { r =>
      val s = r.getAs[Double]("quality")
      assert(s >= 0.0 && s <= 1.0)
    }
    val langs = Registry.byName("text_langid").run(spark, sf)
      .select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr")))
  }

  test("repetition metrics match hand-computed values on planted docs") {
    import spark.implicits._
    // "a a a b" → top word 3/4, unique 2/4; bigrams: "a a"×2, "a b" → 2/3
    val planted = Seq((1L, "a a a b"), (2L, "x y x y x")).toDF("doc_id", "text")
    val uni = planted
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("tot"), count(lit(1)).as("unq"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(uni(1L) == ((3L, 4L, 2L)))
    assert(uni(2L) == ((3L, 5L, 2L)))
    val bi = planted
      .select(col("doc_id"), explode(TextOps.ngrams(col("text"), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("bmx"), sum(col("n")).as("btot"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(bi(1L) == ((2L, 3L))) // "a a","a a","a b"
    assert(bi(2L) == ((2L, 4L))) // "x y"×2, "y x"×2
    // corpus-level gate output stays within [0,1] and denominators agree
    val rows = Registry.byName("text_repetition").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("top_word_frac") > 0.0 &&
        r.getAs[Double]("top_word_frac") <= 1.0)
      assert(r.getAs[Double]("uniq_word_frac") > 0.0 &&
        r.getAs[Double]("uniq_word_frac") <= 1.0)
      assert(r.getAs[Double]("top_bigram_frac") > 0.0 &&
        r.getAs[Double]("top_bigram_frac") <= 1.0)
      assert(r.getAs[Long]("n_bigrams") == r.getAs[Long]("n_words") - 1)
    }
    // a single-word doc has no bigrams and must drop out, not crash
    assert(TextOps.ngrams(lit("solo"), 2) != null)
    val lone = Seq((9L, "solo")).toDF("doc_id", "text")
      .select(explode(TextOps.ngrams(col("text"), 2))).count()
    assert(lone == 0)
  }

  test("PII scrub redacts every planted email and phone, and only those") {
    val out = Registry.byName("text_pii").run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("n_emails") == 1, "exactly the planted email")
      assert(r.getAs[Int]("n_phones") == 1, "exactly the planted phone")
      val scrubbed = r.getAs[String]("scrubbed")
      assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<PHONE>"))
      assert(!scrubbed.contains("@"), "no unredacted email survives")
      assert(!scrubbed.matches(".*\\+\\d{1,2}-\\d{3}-\\d{4}.*"))
    }
  }

  test("unigram LM scoring matches a hand-computed tiny corpus") {
    import spark.implicits._
    // corpus: "a a b" + "b c" → counts a:2 b:2 c:1, tot=5, |V|=3
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = pipeline.TextQueries.unigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    def lp(c: Long) = math.log10((c + 1.0) / 8.0) // tot(5) + vs(3)
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = BigDecimal(r9(2 * lp(2))) + BigDecimal(r9(lp(2)))
    assert(out(0).getAs[Long]("n_tok") == 3)
    assert(math.abs(out(0).getAs[Double]("sum_lp10") -
      d1.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(1).getAs[Long]("n_tok") == 2)
    // rarer tokens score lower: doc 2 (contains the hapax 'c') averages
    // below doc 1 (all common tokens)
    assert(out(1).getAs[Double]("avg_lp10") < out(0).getAs[Double]("avg_lp10"))
  }

  test("unigram LM: boilerplate scores above out-of-distribution word soup") {
    val out = Registry.byName("text_unigram_lm").run(spark, sf)
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    // every score is finite and negative (probabilities < 1)
    rows.foreach { r =>
      val a = r.getAs[Double]("avg_lp10")
      assert(!a.isNaN && !a.isInfinite && a < 0.0)
    }
  }

  test("gopher battery flags planted spam shapes, keeps clean prose") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy sleeping dog today"),
      (2L, "- one\n- two\n- three\n- four"),          // all-bullet listicle
      (3L, "buy### now### cheap### pills### here###"), // symbol spam
      (4L, "a b c d e f g h i j"),                     // mean word len 1
      (5L, "1 2 3 4 5 6 7 8 9 10"))                    // no alphabetic words
      .toDF("doc_id", "text")
    val out = graft.pipeline.TextQueries.gopherOn(docs)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(out(1L), "clean prose must pass")
    assert(!out(2L), "all-bullet listicle must fail")
    assert(!out(3L), "symbol spam must fail")
    assert(!out(4L), "degenerate word length must fail")
    assert(!out(5L), "non-alphabetic soup must fail")
  }

  test("char entropy: closed forms, degenerate tails, empty-text drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "aaaa"),                 // one symbol: H = 0
      (2L, "abcd"),                 // four equiprobable: H = 2
      (3L, "aabb"),                 // two equiprobable: H = 1
      (4L, ""),                     // no chars: drops
      (5L, "the cat sat on the mat"),
      (6L, "Kq9/zR2+xW7mPb0tYv4L")) // base64-ish: high entropy
      .toDF("doc_id", "text")
    val out = graft.pipeline.TextQueries
      .charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!out.contains(4L))
    assert(out(1L) == 0.0)
    assert(math.abs(out(2L) - 2.0) < 1e-6, out(2L).toString)
    assert(math.abs(out(3L) - 1.0) < 1e-6, out(3L).toString)
    // the degenerate run scores BELOW prose, the key blob ABOVE it
    assert(out(1L) < out(5L) && out(5L) < out(6L), out.toString)
  }

  test("slice drift: zero for the global distribution, closed form for disjoint vocab") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // single slice: its distribution IS the global one -> JSD 0 exactly
    val one = Seq(("a", "x y x z")).toDF("src", "text")
    val jsd1 = graft.pipeline.TextQueries.sliceDrift(one, "src", "text")
      .head().getDouble(1)
    assert(jsd1 == 0.0, jsd1.toString)
    // two equal-mass slices with DISJOINT vocabularies: each slice's JSD
    // vs the global mixture is 0.5*log2(4/3) + 0.25*log2(2/3) + 0.25
    val two = Seq(("a", "x y z w"), ("b", "p q r s")).toDF("src", "text")
    val expect = 0.5 * math.log(4.0 / 3.0) / math.log(2.0) +
      0.25 * math.log(2.0 / 3.0) / math.log(2.0) + 0.25
    val got = graft.pipeline.TextQueries.sliceDrift(two, "src", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("a", "b"))
    got.values.foreach(v => assert(math.abs(v - expect) < 1e-4, s"$v vs $expect"))
    // bounds on real data, and the metric separates at least two sources
    val real = graft.pipeline.TextQueries
      .sliceDrift(Tables.documents(spark, sf), "source", "text")
      .collect().map(_.getDouble(1))
    assert(real.forall(v => v >= 0.0 && v <= 1.0))
    assert(real.distinct.length > 1)
  }

  test("chao1 estimate matches an independent singleton/doubleton recount") {
    val rows = Registry.byName("text_chao1").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, f1, f2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val expected = d.toDouble +
        f1.toDouble * (f1.toDouble - 1.0) / (2.0 * (f2.toDouble + 1.0))
      assert(math.abs(r.getDouble(4) - expected) < 1e-5, r.toString)
      assert(r.getDouble(4) >= d.toDouble, "estimate never below observed")
    }
    // independent recount for one source, straight off the table
    val src = rows.head.getString(0)
    val counts = Tables.documents(spark, sf)
      .filter(col("source") === src)
      .select(explode(TextOps.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count().collect().map(_.getLong(1))
    assert(rows.head.getLong(1) == counts.length.toLong, "d")
    assert(rows.head.getLong(2) == counts.count(_ == 1L).toLong, "f1")
    assert(rows.head.getLong(3) == counts.count(_ == 2L).toLong, "f2")
  }

  test("gini: rank-sum numerator matches a host-side sort; bounds hold") {
    val rows = Registry.byName("text_gini").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0, r.toString)
    }
    val src = rows.head.getString(0)
    val lens = Tables.documents(spark, sf)
      .filter(col("source") === src)
      .select(size(TextOps.words(col("text"))).cast("long").as("n"))
      .collect().map(_.getLong(0)).sorted
    val num = lens.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
    assert(rows.head.getLong(3) == num, "rank-sum numerator")
    assert(rows.head.getLong(1) == lens.length.toLong)
    assert(rows.head.getLong(2) == lens.sum)
  }

  test("zipf slope matches a host-side fit of the top-100 vocabulary") {
    val r = Registry.byName("text_zipf").run(spark, sf).collect().head
    assert(r.getDouble(1) < 0.0, "rank-frequency slope is negative")
    val top = Tables.documents(spark, sf)
      .select(explode(TextOps.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w")).limit(100)
      .collect().map(_.getLong(1))
    // the test tier's vocabulary can be under 100 — the fit then uses all of it
    assert(r.getLong(0) == math.min(100, top.length).toLong)
    val pts = top.zipWithIndex.map { case (c, i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    // Det decimal truncation bounds the engine/host delta
    assert(math.abs(r.getDouble(1) - slope) < 1e-4,
      s"engine ${r.getDouble(1)} vs host $slope")
  }

  test("source overlap matches a host-side set recount for one pair") {
    val rows = Registry.byName("text_source_overlap").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (inter, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(inter <= math.min(na, nb), r.toString)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
      // jaccard <= both containments by construction
      assert(r.getDouble(5) <= r.getDouble(6) + 1e-9 &&
        r.getDouble(5) <= r.getDouble(7) + 1e-9)
    }
    val h = rows.head
    def vocab(src: String): Set[String] = Tables.documents(spark, sf)
      .filter(col("source") === src)
      .select(explode(TextOps.words(col("text"))).as("w"))
      .filter(col("w") =!= "").distinct()
      .collect().map(_.getString(0)).toSet
    val (va, vb) = (vocab(h.getString(0)), vocab(h.getString(1)))
    assert(h.getLong(2) == (va & vb).size.toLong, "intersection")
    assert(h.getLong(3) == va.size.toLong && h.getLong(4) == vb.size.toLong)
  }

  test("k-anonymity summary matches a host-side QI-group recount") {
    val r = Registry.byName("pipeline_k_anonymity").run(spark, sf)
      .collect().head
    // NOTE: .values before .map — mapping a Map to (size, ldiv) PAIRS
    // would rebuild a Map keyed on size and silently collapse groups
    val groups = Tables.documents(spark, sf)
      .select(col("source"), expr("n_chars div 500").as("b"), col("lang"))
      .collect()
      .groupBy(row => (row.getString(0), row.getLong(1)))
      .values.toSeq
      .map(rows =>
        (rows.length.toLong, rows.map(_.getString(2)).distinct.length.toLong))
    assert(r.getLong(0) == groups.length.toLong, "n_groups")
    assert(r.getLong(1) == groups.map(_._1).min, "k_anon = min group size")
    assert(r.getLong(2) == groups.map(_._2).min, "l_div = min distinct langs")
    assert(r.getLong(3) == groups.count(_._1 < 10).toLong)
    assert(r.getLong(4) == groups.filter(_._1 < 10).map(_._1).sum)
    // the audit's invariants: l-diversity never exceeds k-anonymity
    assert(r.getLong(2) <= r.getLong(1))
  }

  test("simpson diversity matches a host-side recount; bounds hold") {
    val rows = Registry.byName("text_simpson").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0, r.toString)
    }
    val h = rows.head
    val counts = Tables.documents(spark, sf)
      .filter(col("source") === h.getString(0))
      .select(explode(TextOps.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count().collect().map(_.getLong(1))
    val n = counts.sum
    val s2 = counts.map(c => c * (c - 1)).sum
    assert(h.getLong(1) == n && h.getLong(2) == s2)
    assert(math.abs(h.getDouble(3) -
      (1.0 - s2.toDouble / (n.toDouble * (n - 1)))) < 1e-8)
    // lambda <= 1 always (all-one-token is the most concentrated case),
    // so the effective vocabulary is at least 1
    assert(h.getDouble(4) >= 1.0)
  }

  test("URL extraction normalizes hosts: lowercase, www-stripped, path-agnostic") {
    import spark.implicits._
    val df = Seq(
      (10L, "x see https://WWW.Example.COM/a/b and http://example.com more"),
      (20L, "y http://Sub.Example.org/q z")).toDF("doc_id", "text")
    val urls = df.select(col("doc_id"),
        explode(regexp_extract_all(col("text"),
          lit("https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_-]*)?"), lit(0))).as("url"))
      .select(col("doc_id"),
        regexp_replace(lower(regexp_extract(col("url"), "https?://([^/]+)", 1)),
          "^www\\.", "").as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n"))
      .orderBy("domain").collect()
    assert(urls.map(r => (r.getString(0), r.getLong(1))).toList ==
      List(("example.com", 2L), ("sub.example.org", 1L)))
  }
}
