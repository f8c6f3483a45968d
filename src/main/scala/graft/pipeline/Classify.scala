package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature multinomial Naive Bayes — the fastText-style linear
  * text classifier a curation pipeline trains for quality/topic/language
  * routing, built so BOTH halves (training and scoring) are exact
  * distributed dataflow:
  *
  *  - features are hashed tokens (`md5`-derived 48→16-bit, mod
  *    `numFeatures` — the hashing trick), so the model is a bounded
  *    (label × feature)-count frame no matter the vocabulary;
  *  - training is two integer hash aggregates (per-(label,feature)
  *    counts + per-label totals) with map-side combine — counts, never
  *    text, shuffle;
  *  - scoring joins test tokens against the vocabulary-bounded count
  *    frame, turns each Laplace-smoothed likelihood into ONE rounded
  *    IEEE `ln` term scaled to a long (round@9 — the text_pmi/text_jm_lm
  *    determinism pattern), and sums longs per (doc, label); the argmax
  *    is a min-struct with a label tie-break.
  *
  * At 100 TB the shapes hold: the model frame is ≤ labels×numFeatures
  * rows (hash-joinable, broadcastable when small), the test fan-out is
  * tokens×labels narrow longs, and nothing ever collects to the driver.
  */
object Classify {

  /** Hashed feature id of a token: first 16 md5 bits mod `numFeatures` —
    * `('0x' || substring(md5(w),1,4))::INT % numFeatures` in DuckDB. */
  def featureOf(w: Column, numFeatures: Int): Column =
    graft.functions.expr.Md5Prefix(w, 4).cast("int") % numFeatures

  /** ln(x) rounded at 9 dp and scaled to a long (×1e9) — the exact
    * cross-row summable form of one log-likelihood term. */
  private def ln9(x: Column): Column = round(log(x) * 1e9, 0).cast("long")

  /** Train on `train` (labelCol, textCol), score `test` (idCol,
    * textCol): per test doc the argmax-label under Laplace-smoothed
    * multinomial NB, with the smallest label winning score ties.
    *
    * Output: (idCol, pred_<labelCol>, score9) where score9 is the
    * winning log-posterior in 1e-9 units (an exact long — the sum of
    * rounded per-token terms plus the rounded log-prior). */
  def naiveBayes(
      train: DataFrame, test: DataFrame,
      labelCol: String, textCol: String, idCol: String,
      numFeatures: Int): DataFrame = {
    val lbl = col(labelCol)
    val scored = naiveBayesScores(train, test, labelCol, textCol, idCol,
      numFeatures).withColumnRenamed("score9", "__score9")
    scored.groupBy(col(idCol))
      .agg(min(struct((col("__score9") * lit(-1L)).as("neg"), lbl.as("l"))).as("b"))
      .select(col(idCol), col("b.l").as(s"pred_$labelCol"),
        (col("b.neg") * lit(-1L)).as("score9"))
  }

  /** The full per-(doc, label) posterior frame behind [[naiveBayes]] —
    * (idCol, labelCol, score9) for EVERY candidate label, which is what
    * threshold-free evaluation (ROC/AUC, calibration) needs: the argmax
    * keeps only the winner, but a ranking metric ranks the positive
    * class's score across all docs. Same exactness contract: score9 is
    * an exact long (sum of rounded@9 ln terms plus the rounded prior). */
  def naiveBayesScores(
      train: DataFrame, test: DataFrame,
      labelCol: String, textCol: String, idCol: String,
      numFeatures: Int): DataFrame = {
    require(numFeatures >= 2 && numFeatures <= 65536,
      s"numFeatures must be in [2, 65536], got $numFeatures")
    val lbl = col(labelCol)

    val trainToks = train.select(lbl,
      explode(graft.functions.TextOps.words(col(textCol))).as("__w"))
      .select(lbl, featureOf(col("__w"), numFeatures).as("__f"))
    val cnt = trainToks.groupBy(lbl, col("__f")).agg(count(lit(1)).as("__c"))
    val tot = trainToks.groupBy(lbl).agg(count(lit(1)).as("__t"))
    // log-prior per label: ln(docs_with_label / total_docs), round@9
    // scaled — the 1-row total rides a broadcast cross join
    val pri = train.groupBy(lbl).agg(count(lit(1)).as("__dn"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("__n"))))
      .select(lbl,
        ln9(col("__dn").cast("double") / col("__n").cast("double")).as("__p9"))
    // the label frame test tokens fan out against: (label, total, prior)
    val labels = tot.join(pri, labelCol)

    val testToks = test.select(col(idCol),
      explode(graft.functions.TextOps.words(col(textCol))).as("__w"))
      .select(col(idCol), featureOf(col("__w"), numFeatures).as("__f"))
    testToks
      .crossJoin(broadcast(labels))
      .join(cnt, Seq(labelCol, "__f"), "left")
      .select(col(idCol), lbl, col("__p9"),
        ln9((coalesce(col("__c"), lit(0L)) + lit(1L)).cast("double") /
          (col("__t") + lit(numFeatures.toLong)).cast("double")).as("__t9"))
      .groupBy(col(idCol), lbl, col("__p9"))
      .agg(sum(col("__t9")).as("__s9"))
      .select(col(idCol), lbl, (col("__s9") + col("__p9")).as("score9"))
  }
}
