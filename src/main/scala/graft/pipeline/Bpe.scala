package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training and tokenization (Sennrich et
  * al. 2016 — the subword algorithm behind most LLM tokenizers), pure
  * Spark: the corpus → word-frequency reduction is the distributed heavy
  * half, and the merge loop iterates over that SMALL weighted vocabulary
  * frame, never the corpus.
  *
  * Training: words split into character symbols plus an end-of-word
  * marker; each round counts weighted adjacent symbol pairs (map-side
  * combined — only (pair, partial-count) rows shuffle), takes the
  * top pair under the DETERMINISTIC total order (count desc, pair asc),
  * and rewrites the vocabulary with a left-to-right greedy fold. The
  * 1-row argmax per round is the operator's bounded driver exchange
  * (`nMerges` single-row collects, documented); everything else stays
  * distributed, and the vocab frame localCheckpoints per round exactly
  * like the other iterative operators.
  *
  * Tokenization: merges replay in learned order per word — per-row
  * symbolic rewriting against the broadcast merge list, the same
  * per-partition stance as the multimodal codecs (a 30-deep chain of
  * higher-order-function folds would fight codegen limits for no gain).
  * BPE is LOSSLESS by construction: concatenating a word's tokens
  * reproduces the word — the gate checks exactly that on every document.
  */
object Bpe {

  /** End-of-word marker symbol U+2581. NOT guaranteed absent from the
    * corpus alphabet: it is not whitespace, so a document containing a
    * literal U+2581 keeps it as an ordinary symbol. The concat-lossless
    * contract (`concat(tokens)` reproduces the whitespace-normalized
    * text) still holds — the literal passes through unchanged — but
    * token→text DETOKENIZATION is only unambiguous for corpora that do
    * not contain the marker character, since a literal and a word
    * boundary are then indistinguishable in the token stream. */
  val Eow = "▁"

  /** Greedy left-to-right merge of one adjacent pair inside a symbol
    * sequence — after a merge the new symbol cannot chain into the
    * consumed left element, matching the standard BPE rewrite. */
  private[graft] def mergeOnce(
      syms: Array[String], left: String, right: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  private[graft] def applyMerges(
      word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = (word.map(_.toString) :+ Eow).toArray
    merges.foreach { case (l, r) =>
      if (syms.length > 1) syms = mergeOnce(syms, l, r)
    }
    syms
  }

  /** Learn `nMerges` merges from the corpus; returns them in rank order.
    * Stops early when no pair reaches `minPairCount` (weighted).
    *
    * The corpus → word-count reduction always runs distributed. The
    * merge loop then has two tiers, exactly like [[graft.sources.ArrowIpc]]'s
    * writeDict bound: a vocabulary at or under `maxVocabCollect` rows is
    * collected ONCE and trained with the textbook in-memory loop (the
    * per-round work is microseconds — paying a Spark job per merge round
    * is pure scheduling floor); a larger vocabulary falls back to the
    * fully distributed iteration. Both tiers implement the identical
    * deterministic order (count desc, then UTF-8-byte-ascending pair),
    * so the learned merges are the same — TextSpec asserts it. */
  def train(df: DataFrame, textCol: String,
      nMerges: Int, minPairCount: Long = 2L,
      maxVocabCollect: Int = 1 << 20): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val words = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .persist(disk)
    val vocabSize = words.count() // bounded driver exchange: one long
    if (vocabSize <= maxVocabCollect) {
      val collected = words.as[(String, Long)].collect()
      words.unpersist()
      return trainInMemory(collected, nMerges, minPairCount)
    }
    // split(w, '') emits a trailing empty string under limit=-1 regex
    // semantics — filter it so the alphabet is exactly the characters
    var vocab = words
      .select(col("n"),
        concat(
          filter(split(col("w"), ""), x => x =!= ""),
          array(lit(Eow))).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var exhausted = false
    while (rounds < nMerges && !exhausted) {
      // weighted adjacent-pair counts: explode only (left, right, n)
      val top = vocab
        .select(col("n"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .select(col("p").getField("0").as("l"),
          col("p").getField("1").as("r"), col("n"))
        .groupBy(col("l"), col("r")).agg(sum(col("n")).as("cnt"))
        .filter(col("cnt") >= minPairCount)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect() // bounded driver exchange: ONE row per round
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        merges += ((l, r))
        val mergeUdf = udf((syms: Seq[String]) =>
          mergeOnce(syms.toArray, l, r).toSeq)
        vocab = vocab.select(col("n"), mergeUdf(col("syms")).as("syms"))
        rounds += 1
        // checkpoint every few rounds, not every round: between
        // checkpoints the lineage is a handful of NARROW rewrites over
        // the tiny vocab frame (re-run by each round's argmax at
        // negligible cost), and halving the per-round job count halves
        // the scheduling floor that dominates this loop
        if (rounds % 5 == 0) vocab = vocab.localCheckpoint()
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** Spark string ORDER is binary UTF-8; Java String.compareTo is UTF-16
    * code units — they disagree above the BMP, so the in-memory tier
    * compares encoded bytes to stay bit-compatible with the distributed
    * tier's `orderBy`. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def trainInMemory(
      words: Array[(String, Long)], nMerges: Int,
      minPairCount: Long): Seq[(String, String)] = {
    var vocab: Array[(Array[String], Long)] =
      words.map { case (w, n) =>
        ((w.map(_.toString) :+ Eow).toArray, n)
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var exhausted = false
    while (rounds < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      val best = counts.iterator.filter(_._2 >= minPairCount)
        .foldLeft(Option.empty[((String, String), Long)]) {
          case (acc, cur @ ((l, r), c)) => acc match {
            case None => Some(cur)
            case Some(((bl, br), bc)) =>
              if (c > bc || (c == bc && (utf8Lt(l, bl) ||
                  (l == bl && utf8Lt(r, br))))) Some(cur)
              else acc
          }
        }
      best match {
        case None => exhausted = true
        case Some(((l, r), _)) =>
          merges += ((l, r))
          vocab = vocab.map { case (syms, n) =>
            (if (syms.length > 1) mergeOnce(syms, l, r) else syms, n)
          }
          rounds += 1
      }
    }
    merges.toSeq
  }

  /** Tokenize `textCol` with learned merges: (all original columns,
    * tokens array<string>, n_tokens). Narrow per-partition rewrite
    * against the broadcast merge list; whitespace is normalized to the
    * end-of-word marker, so `concat(tokens) == regexp_replace(text,
    * "\\s+", Eow) + Eow` for non-empty text — the lossless contract the
    * gate asserts. */
  def tokenize(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(merges)
    val tok = udf((text: String) =>
      if (text == null) null
      else text.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => applyMerges(w, bc.value)).toSeq)
    df.withColumn("tokens", tok(col(textCol)))
      .withColumn("n_tokens", size(col("tokens")))
  }
}
