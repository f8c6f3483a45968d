package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup / text-analysis
  * pipelines. All pure `functions._` compositions — codegen'd, no UDFs.
  */
object TextOps {

  /** Whitespace tokens (documents are single-space word soup). */
  def words(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles, the unit of near-dup detection —
    * the native single-scan expression
    * ([[graft.functions.expr.ShinglesExpr]]: every shingle is a zero-copy
    * byte slice of the input). Bit-equal to [[shinglesHof]], the
    * composable twin (asserted in TextSpec). */
  def shingles(text: Column, n: Int): Column =
    graft.functions.expr.ShinglesExpr(text, n)

  /** The same shingling as a pure-builtin HOF pipeline — the reference
    * twin for [[shingles]]. Guarded: Spark's `sequence(1, k)` is
    * descending for k < 1, so short documents yield an empty shingle
    * set (and a NULL text falls to the empty branch too). */
  def shinglesHof(text: Column, n: Int): Column = {
    val toks = words(text)
    val count = size(toks) - (n - 1)
    when(count >= 1,
      array_distinct(
        transform(sequence(lit(1), count), i =>
          concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** NON-distinct word n-grams — the unit of repetition measurement
    * (unlike [[shingles]], which deduplicates because near-dup detection
    * only cares about set overlap, repetition metrics need every
    * occurrence). Same short-document guard as [[shinglesHof]]. */
  def ngrams(text: Column, n: Int): Column = {
    val toks = words(text)
    val count = size(toks) - (n - 1)
    when(count >= 1,
      transform(sequence(lit(1), count), i =>
        concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Portable polynomial fingerprint: fold (acc*31 + codepoint) mod 1e9+7
    * over the characters of the lower-cased text. Engine-portable (the
    * DuckDB oracle reproduces it with list_reduce); the fast production
    * path is `xxhash64(text)`, asserted separately in tests. */
  def polyFingerprint(text: Column): Column =
    graft.functions.expr.PolyFingerprint(lower(text))

  /** The same fingerprint as a pure-builtin higher-order-function fold —
    * the reference twin for [[polyFingerprint]] (bit-equal on BMP text). */
  def polyFingerprintHof(text: Column): Column = {
    val t = lower(text)
    aggregate(
      sequence(lit(1), length(t)),
      lit(0L),
      (acc, i) => (acc * 31 + ascii(t.substr(i, lit(1)))) % 1000000007L)
  }

  /** Stopword count among whitespace tokens. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(words(text), w => w.isInCollection(stopwords)))
}
