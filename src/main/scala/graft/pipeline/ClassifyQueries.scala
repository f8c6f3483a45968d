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

  private val nbSql =
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
       |  FROM sc)
       |SELECT b.doc_id, te.lang, b.pred_lang, b.score9
       |FROM best b JOIN te USING (doc_id)
       |WHERE b.rn = 1 ORDER BY b.doc_id""".stripMargin

  val caps: Seq[Capability] = Seq(
    Capability("pipeline_nb_classify",
      "hashed-feature Naive Bayes: in-engine train + score, exact scaled posteriors",
      nbQ, Some(nbSql)),
  )
}
