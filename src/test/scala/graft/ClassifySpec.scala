package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Classify

/** Hashed Naive Bayes contracts on planted fixtures: separable classes
  * are recovered, unseen tokens fall back to the prior, and score ties
  * resolve to the smallest label.
  */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("recovers planted separable classes") {
    import spark.implicits._
    val train = Seq(
      (1L, "ham", "meeting notes agenda budget report"),
      (2L, "ham", "report budget quarterly meeting notes"),
      (3L, "spam", "winner prize click free money"),
      (4L, "spam", "free money click winner lottery")
    ).toDF("doc_id", "label", "text")
    val test = Seq(
      (10L, "agenda for the quarterly budget meeting"),
      (11L, "click to claim your free prize money")
    ).toDF("doc_id", "text")
    val out = Classify.naiveBayes(train, test, "label", "text", "doc_id", 1024)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "ham")
    assert(out(1).getString(1) == "spam")
  }

  test("auc and kappa gates match independent host-side recomputations") {
    val sf = TestSpark.sf
    // AUC: collect the per-doc 'en' scores + labels and recompute the
    // midrank AUC in plain Scala
    val aucRow = Registry.byName("pipeline_nb_auc").run(spark, sf)
      .collect().head
    val docs = Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") % 2 === 0)
    val test0 = docs.filter(col("doc_id") % 2 === 1)
    val sc = Classify
      .naiveBayesScores(train, test0, "lang", "text", "doc_id", 4096)
    val en = sc.filter(col("lang") === "en")
      .select(col("doc_id"), col("score9").as("s_en"))
    val oth = sc.filter(col("lang") =!= "en")
      .groupBy(col("doc_id")).agg(max(col("score9")).as("s_o"))
    val pairs = en.join(oth, "doc_id")
      .join(test0.select(col("doc_id"), col("lang").as("truth")), "doc_id")
      .select((col("s_en") - col("s_o")).as("m9"),
        (col("truth") === "en").cast("int").as("y"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val pos = pairs.filter(_._2 == 1).map(_._1)
    val neg = pairs.filter(_._2 == 0).map(_._1)
    val u2 = (for (p <- pos; q <- neg) yield {
      if (p > q) 2L else if (p == q) 1L else 0L
    }).sum
    assert(aucRow.getLong(0) == pos.length.toLong)
    assert(aucRow.getLong(1) == neg.length.toLong)
    assert(aucRow.getLong(2) == u2, "exact 2-scaled U")
    val aucHost = u2.toDouble / (2.0 * pos.length * neg.length)
    assert(math.abs(aucRow.getDouble(3) - aucHost) < 1e-8)
    // the synthetic corpus carries no real language signal in the text
    // (max token lift ≈ 1.2), so chance-level AUC is the TRUE readout —
    // the metric's value here is honesty, verified exactly above;
    // separable-data closed forms live in StatTestsSpec.aucRankSum
    assert(aucRow.getDouble(3) >= 0.0 && aucRow.getDouble(3) <= 1.0)

    // kappa: recompute from the collected predictions
    val kRow = Registry.byName("pipeline_nb_kappa").run(spark, sf)
      .collect().head
    val preds = Classify
      .naiveBayes(train, test0, "lang", "text", "doc_id", 4096)
      .join(test0.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("lang"), col("pred_lang"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = preds.length.toLong
    val agree = preds.count { case (a, b) => a == b }.toLong
    val rt = preds.groupBy(_._1).map { case (_, v) => v.length.toLong }
    val ct = preds.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val rc = preds.groupBy(_._1).map { case (c, v) =>
      v.length.toLong * ct.getOrElse(c, 0L) }.sum
    assert(kRow.getLong(0) == n && kRow.getLong(1) == agree &&
      kRow.getLong(2) == rc)
    val kHost = (n * agree - rc).toDouble / (n * n - rc).toDouble
    assert(math.abs(kRow.getDouble(3) - kHost) < 1e-8)
    // kappa is below raw accuracy whenever agreement beats chance
    assert(kRow.getDouble(3) <= agree.toDouble / n)
    assert(rt.sum == n)
  }

  test("all-unseen tokens reduce to the prior: majority class wins") {
    import spark.implicits._
    // 3 "big" docs vs 1 "small" -> prior favors big; test text shares no
    // tokens with training, so every likelihood term is the same
    // 1/(t+V) smoothed constant per label ONLY if totals match — make
    // totals equal (3 tokens each) so the prior alone decides
    val train = Seq(
      (1L, "big", "aa bb cc"), (2L, "big", "dd ee ff"), (3L, "big", "gg hh ii"),
      (4L, "small", "xx yy zz")
    ).toDF("doc_id", "label", "text")
    // NOTE: totals differ (big 9 tokens, small 3) — smoothing then favors
    // SMALL per token (smaller denominator), so use a 1-token probe where
    // prior ln(3/4) - ln(1/4) = ln 3 beats the per-token denominator gap
    // ln((3+V)/(9+V)) ~ 0 at V=1024
    val test = Seq((10L, "unseen")).toDF("doc_id", "text")
    val out = Classify.naiveBayes(train, test, "label", "text", "doc_id", 1024)
      .collect().head
    assert(out.getString(1) == "big")
  }

  test("exact score ties resolve to the smallest label") {
    import spark.implicits._
    // perfectly symmetric training: both labels see one doc of one token,
    // the probe token is unseen by both -> identical scores
    val train = Seq(
      (1L, "b_label", "tok1"), (2L, "a_label", "tok2")
    ).toDF("doc_id", "label", "text")
    val test = Seq((10L, "unseen")).toDF("doc_id", "text")
    val out = Classify.naiveBayes(train, test, "label", "text", "doc_id", 1024)
      .collect().head
    assert(out.getString(1) == "a_label",
      s"tie must break to smallest label, got ${out.getString(1)}")
  }

  test("score9 is the exact sum of rounded scaled log terms") {
    import spark.implicits._
    val V = 1024
    val train = Seq((1L, "x", "w w v")).toDF("doc_id", "label", "text")
    val test = Seq((10L, "w u")).toDF("doc_id", "text")
    val out = Classify.naiveBayes(train, test, "label", "text", "doc_id", V)
      .collect().head
    def ln9(x: Double): Long = math.round(math.log(x) * 1e9)
    // prior ln(1/1)=0; token w: (2+1)/(3+V); token u unseen: 1/(3+V)
    val expect = ln9(3.0 / (3 + V)) + ln9(1.0 / (3 + V)) + ln9(1.0)
    assert(out.getLong(2) == expect, s"got ${out.getLong(2)}, want $expect")
  }
}
