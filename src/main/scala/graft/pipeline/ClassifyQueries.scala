package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Capability, Tables}

/** Declared supervised-classification capability: the hashed-feature
  * Naive Bayes text classifier ([[Classify]]) trained and scored
  * entirely in-engine — the learned-model counterpart of the heuristic
  * quality/langid scorers in [[TextQueries]].
  */
object ClassifyQueries {

  private val NumFeatures = 4096

  /** pipeline_nb_classify: train multinomial NB on the even-doc_id half
    * of `documents` (label = lang), score the odd half, emit the
    * predicted label + exact scaled log-posterior per test doc. The
    * whole train→score chain is ONE lazy plan over integer counts and
    * rounded log terms, so DuckDB replays it bit-for-bit. */
  private def nbQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("doc_id") % 2 === 0)
    val test = docs.filter(col("doc_id") % 2 === 1)
    Classify.naiveBayes(train, test, "lang", "text", "doc_id", NumFeatures)
      .join(test.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("pred_lang"), col("score9"))
      .orderBy(col("doc_id"))
  }

  /** The full train→score CTE chain (shared by the score gate and the
    * evaluation gate — lazy so composing SQL never interpolates an
    * uninitialized fragment). Ends with `best` (rn = 1 rows are the
    * predictions) and `te` (the labeled test half). */
  private lazy val nbCtes =
    s"""WITH tr AS (
       |  SELECT lang, text FROM documents WHERE doc_id % 2 = 0),
       |te AS (
       |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 1),
       |trt AS (
       |  SELECT lang, (('0x' || substring(md5(w),1,4))::INT % $NumFeatures) AS f
       |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM tr)),
       |cnt AS (SELECT lang, f, COUNT(*) AS c FROM trt GROUP BY 1, 2),
       |tot AS (SELECT lang, COUNT(*) AS t FROM trt GROUP BY 1),
       |pri AS (
       |  SELECT lang,
       |    CAST(round(ln(COUNT(*)::DOUBLE /
       |      (SELECT COUNT(*) FROM tr)) * 1e9, 0) AS BIGINT) AS p9
       |  FROM tr GROUP BY 1),
       |tet AS (
       |  SELECT doc_id, (('0x' || substring(md5(w),1,4))::INT % $NumFeatures) AS f
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM te)),
       |term AS (
       |  SELECT g.doc_id, g.lang, g.p9,
       |    CAST(round(ln((coalesce(c.c, 0) + 1)::DOUBLE /
       |      (g.t + $NumFeatures)::DOUBLE) * 1e9, 0) AS BIGINT) AS t9
       |  FROM (SELECT tet.doc_id, tot.lang, tot.t, pri.p9, tet.f
       |        FROM tet CROSS JOIN tot JOIN pri USING (lang)) g
       |  LEFT JOIN cnt c ON c.lang = g.lang AND c.f = g.f),
       |sc AS (
       |  SELECT doc_id, lang, CAST(SUM(t9) AS BIGINT) + p9 AS score9
       |  FROM term GROUP BY doc_id, lang, p9),
       |best AS (
       |  SELECT doc_id, lang AS pred_lang, score9,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score9 DESC, lang ASC) AS rn
       |  FROM sc)""".stripMargin

  private lazy val nbSql =
    s"""$nbCtes
       |SELECT b.doc_id, te.lang, b.pred_lang, b.score9
       |FROM best b JOIN te USING (doc_id)
       |WHERE b.rn = 1 ORDER BY b.doc_id""".stripMargin

  /** pipeline_nb_eval: the evaluation half of the supervised loop —
    * per-true-class confusion counts and precision/recall/F1 over the
    * SAME train→score chain (integer counts, one rounded IEEE division
    * per metric). Per-class recall is over true classes by definition;
    * a label that only ever appears as a prediction contributes to fp
    * of its row if that class also has true examples. */
  private def nbEvalQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("doc_id") % 2 === 0)
    val test = docs.filter(col("doc_id") % 2 === 1)
    val preds = Classify.naiveBayes(train, test, "lang", "text", "doc_id", NumFeatures)
      .join(test.select(col("doc_id"), col("lang")), "doc_id")
    val tf = preds.groupBy(col("lang")).agg(
      count(when(col("pred_lang") === col("lang"), 1)).as("tp"),
      count(when(col("pred_lang") =!= col("lang"), 1)).as("fn"))
    val fp = preds.filter(col("pred_lang") =!= col("lang"))
      .groupBy(col("pred_lang").as("lang")).agg(count(lit(1)).as("fp0"))
    def d2(c: org.apache.spark.sql.Column) = c.cast("double")
    tf.join(fp, Seq("lang"), "left")
      .select(col("lang"), col("tp"), coalesce(col("fp0"), lit(0L)).as("fp"),
        col("fn"))
      .select(col("lang"), (col("tp") + col("fn")).as("n"),
        col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          round(d2(col("tp")) / d2(col("tp") + col("fp")), 6)).as("prec"),
        round(d2(col("tp")) / d2(col("tp") + col("fn")), 6).as("recall"),
        round(d2(col("tp") * 2) / d2(col("tp") * 2 + col("fp") + col("fn")), 6)
          .as("f1"))
      .orderBy(col("lang"))
  }

  private lazy val nbEvalSql =
    s"""$nbCtes,
       |preds AS (
       |  SELECT b.doc_id, te.lang, b.pred_lang
       |  FROM best b JOIN te USING (doc_id) WHERE b.rn = 1),
       |tf AS (
       |  SELECT lang,
       |    COUNT(*) FILTER (pred_lang = lang) AS tp,
       |    COUNT(*) FILTER (pred_lang <> lang) AS fn
       |  FROM preds GROUP BY 1),
       |fpt AS (
       |  SELECT pred_lang AS lang, COUNT(*) AS fp0
       |  FROM preds WHERE pred_lang <> lang GROUP BY 1)
       |SELECT tf.lang, CAST(tf.tp + tf.fn AS BIGINT) AS n,
       |  CAST(tf.tp AS BIGINT) AS tp,
       |  CAST(coalesce(fpt.fp0, 0) AS BIGINT) AS fp,
       |  CAST(tf.fn AS BIGINT) AS fn,
       |  CASE WHEN tf.tp + coalesce(fpt.fp0, 0) > 0
       |       THEN round(CAST(tf.tp AS DOUBLE) /
       |         CAST(tf.tp + coalesce(fpt.fp0, 0) AS DOUBLE), 6) END AS prec,
       |  round(CAST(tf.tp AS DOUBLE) / CAST(tf.tp + tf.fn AS DOUBLE), 6) AS recall,
       |  round(CAST(tf.tp * 2 AS DOUBLE) /
       |    CAST(tf.tp * 2 + coalesce(fpt.fp0, 0) + tf.fn AS DOUBLE), 6) AS f1
       |FROM tf LEFT JOIN fpt USING (lang)
       |ORDER BY tf.lang""".stripMargin

  /** pipeline_nb_auc: threshold-free ranking quality of the classifier
    * as a one-vs-rest detector for 'en' — AUC computed by the exact
    * rank-sum identity (AUC = U/(n₁·n₀), the Mann–Whitney connection),
    * NOT by trapezoid-integrating an ROC curve: over per-score counts,
    * U×2 = Σ_scores c₁·(2·cumNeg_below + c₀) counts ties at half, all
    * in exact longs; ONE division at the end (round@9). The ranking
    * score is the exact per-doc MARGIN s_en − max_{l≠en} s_l from
    * [[Classify.naiveBayesScores]] — raw log-posteriors scale with
    * document length (every token adds a negative term), so they rank
    * short docs above long English ones; the margin cancels the length
    * term and is exactly what the argmax thresholds at 0. The
    * distinct-score frame is test-set-bounded (the KM/MW small-frame
    * convention). */
  private def nbAucQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("doc_id") % 2 === 0)
    val test = docs.filter(col("doc_id") % 2 === 1)
    val sc = Classify
      .naiveBayesScores(train, test, "lang", "text", "doc_id", NumFeatures)
    // the ranking score is the MARGIN s_en − max_{l≠en} s_l, not the raw
    // posterior: absolute log-likelihoods scale with document LENGTH
    // (every token adds a negative term), so raw s_en ranks short docs
    // above long English ones; the margin cancels the length term and is
    // exactly the quantity the argmax thresholds at 0
    val en = sc.filter(col("lang") === "en")
      .select(col("doc_id"), col("score9").as("s_en"))
    val other = sc.filter(col("lang") =!= "en")
      .groupBy(col("doc_id")).agg(max(col("score9")).as("s_o"))
    val lab = test.select(col("doc_id"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    graft.operators.StatTests.aucRankSum(
      en.join(other, "doc_id")
        .select(col("doc_id"), (col("s_en") - col("s_o")).as("m9"))
        .join(lab, "doc_id"),
      "m9", "y")
  }

  private lazy val nbAucSql =
    s"""$nbCtes,
       |en AS (SELECT doc_id, score9 AS s_en FROM sc WHERE lang = 'en'),
       |oth AS (
       |  SELECT doc_id, CAST(MAX(score9) AS BIGINT) AS s_o
       |  FROM sc WHERE lang <> 'en' GROUP BY doc_id),
       |pos AS (
       |  SELECT en.doc_id, en.s_en - oth.s_o AS m9,
       |    CASE WHEN te.lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM en JOIN oth USING (doc_id) JOIN te USING (doc_id)),
       |vc AS (
       |  SELECT m9, CAST(SUM(y) AS BIGINT) AS c1,
       |    CAST(SUM(1 - y) AS BIGINT) AS c0
       |  FROM pos GROUP BY m9),
       |cum AS (
       |  SELECT m9, c1, c0, SUM(c0) OVER (ORDER BY m9
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0
       |  FROM vc),
       |agg AS (
       |  SELECT CAST(SUM(c1) AS BIGINT) AS n_pos,
       |    CAST(SUM(c0) AS BIGINT) AS n_neg,
       |    CAST(SUM(c1 * (2 * (cum0 - c0) + c0)) AS BIGINT) AS u2
       |  FROM cum)
       |SELECT n_pos, n_neg, u2,
       |  round(CAST(u2 AS DOUBLE) /
       |    (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 9) AS auc
       |FROM agg""".stripMargin

  /** pipeline_nb_kappa: Cohen's kappa of predictions vs truth —
    * chance-corrected agreement, the metric that exposes an "accurate"
    * classifier that merely predicts the majority class. Cleared of
    * divisions: κ = (n·a − Σ_c rt_c·ct_c) / (n² − Σ_c rt_c·ct_c) with
    * a = agreement count, rt/ct the true/predicted marginals — exact
    * longs into ONE rounded division (round@9). Marginal frames are
    * #classes-sized. */
  private def nbKappaQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("doc_id") % 2 === 0)
    val test = docs.filter(col("doc_id") % 2 === 1)
    val preds = Classify
      .naiveBayes(train, test, "lang", "text", "doc_id", NumFeatures)
      .join(test.select(col("doc_id"), col("lang")), "doc_id")
    val rt = preds.groupBy(col("lang").as("c")).agg(count(lit(1)).as("rt"))
    val ct = preds.groupBy(col("pred_lang").as("c"))
      .agg(count(lit(1)).as("ct"))
    val marg = rt.join(ct, Seq("c"))
      .agg(sum(col("rt") * col("ct")).as("rc"))
    preds.agg(count(lit(1)).as("n"),
        count(when(col("pred_lang") === col("lang"), 1)).as("agree"))
      .crossJoin(broadcast(marg))
      .select(col("n"), col("agree"), col("rc"),
        round((col("n") * col("agree") - col("rc")).cast("double") /
          (col("n") * col("n") - col("rc")).cast("double"), 9).as("kappa"))
  }

  private lazy val nbKappaSql =
    s"""$nbCtes,
       |preds AS (
       |  SELECT b.doc_id, te.lang, b.pred_lang
       |  FROM best b JOIN te USING (doc_id) WHERE b.rn = 1),
       |rt AS (SELECT lang AS c, COUNT(*) AS rt FROM preds GROUP BY 1),
       |ct AS (SELECT pred_lang AS c, COUNT(*) AS ct FROM preds GROUP BY 1),
       |marg AS (
       |  SELECT CAST(SUM(rt.rt * ct.ct) AS BIGINT) AS rc
       |  FROM rt JOIN ct USING (c)),
       |agg AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(COUNT(*) FILTER (pred_lang = lang) AS BIGINT) AS agree
       |  FROM preds)
       |SELECT n, agree, rc,
       |  round(CAST(n * agree - rc AS DOUBLE) /
       |    CAST(n * n - rc AS DOUBLE), 9) AS kappa
       |FROM agg, marg""".stripMargin

  val caps: Seq[Capability] = Seq(
    Capability("pipeline_nb_classify",
      "hashed-feature Naive Bayes: in-engine train + score, exact scaled posteriors",
      nbQ, Some(nbSql)),
    Capability("pipeline_nb_eval",
      "classifier evaluation: per-class confusion counts + precision/recall/F1",
      nbEvalQ, Some(nbEvalSql)),
    Capability("pipeline_nb_auc",
      "one-vs-rest AUC by the exact rank-sum identity over per-score counts",
      nbAucQ, Some(nbAucSql)),
    Capability("pipeline_nb_kappa",
      "Cohen's kappa: chance-corrected agreement, denominator-cleared exact longs",
      nbKappaQ, Some(nbKappaSql)),
  )
}
