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

  val caps: Seq[Capability] = Seq(
    Capability("pipeline_nb_classify",
      "hashed-feature Naive Bayes: in-engine train + score, exact scaled posteriors",
      nbQ, Some(nbSql)),
    Capability("pipeline_nb_eval",
      "classifier evaluation: per-class confusion counts + precision/recall/F1",
      nbEvalQ, Some(nbEvalSql)),
  )
}
