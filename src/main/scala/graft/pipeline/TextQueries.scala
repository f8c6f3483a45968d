package graft.pipeline

import graft.{Capability, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis pipelines over `documents`: token counting, quality
  * scoring, heuristic language ID, content fingerprinting. All pure
  * column expressions (codegen'd — no UDFs in the hot path), so they
  * distribute as narrow transformations: no shuffle at any scale.
  */
object TextQueries {

  private val stopwords = Seq("the", "a", "and", "of", "to", "in")

  /** Token counting: whitespace tokens + a regex token class (the BPE-ish
    * approximation: alpha runs). */
  private def tokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(TextOps.words(col("text"))).as("n_ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+")).as("n_alpha_tokens"),
      length(col("text")).as("len"),
      col("n_chars"))
      .orderBy(col("doc_id"))

  private val tokensSql =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens,
      |  length(text) AS len,
      |  n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: length/stopword/uniqueness ratios combined into a
    * single [0,1] score. */
  private def quality(s: SparkSession, d: String): DataFrame = {
    val ws = TextOps.words(col("text"))
    val nTok = size(ws).cast("double")
    val stopRatio = TextOps.stopwordCount(col("text"), stopwords).cast("double") / nTok
    val uniqRatio = size(array_distinct(ws)).cast("double") / nTok
    val lenScore = least(lit(1.0), nTok / 50.0)
    Tables.documents(s, d).select(
      col("doc_id"),
      length(col("text")).as("len"),
      size(ws).as("n_tok"),
      round(length(col("text")).cast("double") / nTok, 6).as("avg_tok_len"),
      round(stopRatio, 6).as("stop_ratio"),
      round(uniqRatio, 6).as("uniq_ratio"),
      round(lenScore * (lit(1.0) - stopRatio) * uniqRatio, 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  private val qualitySql = {
    val nTok = "len(string_split(text, ' '))::DOUBLE"
    val stopR = s"len(list_filter(string_split(text, ' '), " +
      s"w -> w IN ('the','a','and','of','to','in')))::DOUBLE / $nTok"
    val uniqR = s"len(list_distinct(string_split(text, ' ')))::DOUBLE / $nTok"
    s"""SELECT doc_id,
       |  length(text) AS len,
       |  len(string_split(text, ' ')) AS n_tok,
       |  round(length(text)::DOUBLE / $nTok, 6) AS avg_tok_len,
       |  round($stopR, 6) AS stop_ratio,
       |  round($uniqR, 6) AS uniq_ratio,
       |  round(least(1.0::DOUBLE, $nTok / 50.0) * (1.0::DOUBLE - $stopR) * ($uniqR), 6) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Heuristic language ID: marker-word counts per language with a
    * deterministic alphabetical tie-break. (The synthetic corpus is
    * English-ish word soup, so predictions skew 'en' — the capability under
    * test is the deterministic scoring pipeline, not model quality.) */
  private def langid(s: SparkSession, d: String): DataFrame = {
    def markers(wordsList: Seq[String]): Column =
      TextOps.stopwordCount(col("text"), wordsList)
    val nDe = markers(Seq("der", "die", "das", "und", "ist"))
    val nEn = markers(Seq("the", "a", "and", "of", "to"))
    val nEs = markers(Seq("el", "la", "los", "que", "y"))
    val nFr = markers(Seq("le", "les", "et", "un", "est"))
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      nDe.as("n_de"), nEn.as("n_en"), nEs.as("n_es"), nFr.as("n_fr"),
      when(nDe >= greatest(nEn, nEs, nFr), "de")
        .when(nEn >= greatest(nEs, nFr), "en")
        .when(nEs >= nFr, "es")
        .otherwise("fr").as("pred_lang"))
      .withColumn("hit", (col("pred_lang") === col("lang")).cast("int"))
      .orderBy(col("doc_id"))
  }

  private val langidSql = {
    def cnt(ws: String) =
      s"len(list_filter(string_split(text, ' '), w -> w IN ($ws)))"
    val nDe = cnt("'der','die','das','und','ist'")
    val nEn = cnt("'the','a','and','of','to'")
    val nEs = cnt("'el','la','los','que','y'")
    val nFr = cnt("'le','les','et','un','est'")
    s"""SELECT doc_id, lang, n_de, n_en, n_es, n_fr, pred_lang,
       |  CAST(pred_lang = lang AS INT) AS hit
       |FROM (
       |  SELECT doc_id, lang, text,
       |    $nDe AS n_de, $nEn AS n_en, $nEs AS n_es, $nFr AS n_fr,
       |    CASE WHEN $nDe >= greatest($nEn, $nEs, $nFr) THEN 'de'
       |         WHEN $nEn >= greatest($nEs, $nFr) THEN 'en'
       |         WHEN $nEs >= $nFr THEN 'es'
       |         ELSE 'fr' END AS pred_lang
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** Content fingerprinting: portable polynomial rolling hash (oracle twin
    * in DuckDB via list_reduce). The fast path for production is
    * xxhash64 — same pipeline shape, asserted in TextSpec. */
  private def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextOps.polyFingerprint(col("text")).as("fp"),
      length(col("text")).as("len"))
      .orderBy(col("doc_id"))

  private val fingerprintSql =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(0::BIGINT,
      |      list_transform(range(1, length(lower(text)) + 1),
      |        i -> ascii(lower(text)[i:i])::BIGINT)),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS fp,
      |  length(text) AS len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus vocabulary: global word frequencies, top 100 by count (ties
    * broken by word). The canonical map-side-combine aggregate: partial
    * counts per partition, one shuffle of (word, partial_count), final
    * top-k via TakeOrderedAndProject — at 100 TB nothing but the
    * vocabulary itself ever crosses the network. */
  private def vocab(s: SparkSession, d: String): DataFrame =
    // NOT spread: the split feeds a map-side-combined count whose
    // per-row work is too cheap to pay an exchange of the text for
    // (full-bench A/B regressed the whole word-count family; only the
    // per-doc extrema/entropy/shingle passes keep Tables.spread)
    Tables.documents(s, d)
      .select(explode(TextOps.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(100)

  private val vocabSql =
    """SELECT word, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE word <> ''
      |GROUP BY word ORDER BY n DESC, word LIMIT 100""".stripMargin

  /** Chao1 vocabulary-richness estimate per source (Chao 1984, the
    * standard nonparametric "how many words does this corpus REALLY
    * have" estimator ecology lends to corpus linguistics): observed
    * distinct words D plus the unseen-mass correction f1·(f1−1) /
    * (2·(f2+1)) from the singleton/doubleton counts — a corpus still
    * producing hapax legomena at a high rate has far more vocabulary
    * left to see, which is exactly the curation question ("is this
    * source mined out?") a data-mixing pass asks. The bias-corrected
    * form stays defined when f2 = 0.
    *
    * Scale shape: one (source, word) counted aggregate with map-side
    * combine, then a source-keyed rollup of the vocabulary-sized count
    * frame; everything after the first exchange is proportional to
    * vocabulary, not corpus. All inputs integer-exact; the estimate is
    * ONE fixed-order IEEE expression, round@6 in both engines. */
  private def chao1(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d) // NOT spread: vocab comment
      .select(col("source"), explode(TextOps.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("d"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("source"), col("d"), col("f1"), col("f2"),
        round(col("d").cast("double") +
          col("f1").cast("double") * (col("f1").cast("double") - lit(1.0)) /
            (lit(2.0) * (col("f2").cast("double") + lit(1.0))), 6)
          .as("chao1"))
      .orderBy(col("source"))

  private val chao1Sql =
    """WITH wc AS (
      |  SELECT source, word, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS word
      |    FROM documents)
      |  WHERE word <> '' GROUP BY source, word),
      |f AS (
      |  SELECT source, COUNT(*) AS d,
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      |  FROM wc GROUP BY source)
      |SELECT source, d, f1, f2,
      |  round(CAST(d AS DOUBLE) +
      |    CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0) /
      |      (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), 6) AS chao1
      |FROM f ORDER BY source""".stripMargin

  /** Gini coefficient of document length (in whitespace tokens) per
    * source — the inequality readout a mixing/packing pass wants: a
    * source whose token mass concentrates in a few huge documents packs
    * and shards very differently from a uniform one, at identical mean
    * length. Computed by the exact rank formula G = 2·Σ i·x₍ᵢ₎ /
    * (n·Σx) − (n+1)/n over the ascending sort; tied lengths make the
    * rank sum permutation-invariant, so no tie-break ambiguity can
    * reach the result (doc_id ordering is fixed anyway).
    *
    * Scale shape: ONE source-keyed exchange serves both the ranking
    * window and the final rollup (the q50/q51 reused-exchange pattern);
    * the rank·length products sum as exact longs and the coefficient is
    * one fixed-order IEEE expression, round@9. */
  private def gini(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_tok"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(TextOps.words(col("text"))).cast("long").as("n_tok"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_tok")).as("sx"),
        sum(col("i") * col("n_tok")).as("num"))
      .select(col("source"), col("n"), col("sx"), col("num"),
        round(lit(2.0) * col("num").cast("double") /
          (col("n").cast("double") * col("sx").cast("double")) -
          (col("n").cast("double") + lit(1.0)) / col("n").cast("double"), 9)
          .as("gini"))
      .orderBy(col("source"))
  }

  private val giniSql =
    """WITH lens AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |ranked AS (
      |  SELECT source, n_tok, CAST(row_number() OVER (
      |    PARTITION BY source ORDER BY n_tok, doc_id) AS BIGINT) AS i
      |  FROM lens),
      |agg AS (
      |  SELECT source, COUNT(*) AS n, CAST(SUM(n_tok) AS BIGINT) AS sx,
      |    CAST(SUM(i * n_tok) AS BIGINT) AS num
      |  FROM ranked GROUP BY source)
      |SELECT source, n, sx, num,
      |  round(2.0 * CAST(num AS DOUBLE) /
      |    (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) -
      |    (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 9) AS gini
      |FROM agg ORDER BY source""".stripMargin

  /** Zipf rank-frequency slope: least-squares fit of ln(freq) on
    * ln(rank) over the top-100 vocabulary — natural language sits near
    * slope −1 (Zipf's law) and machine-generated or templated corpora
    * deviate hard, making the slope a one-number generated-text/
    * boilerplate alarm next to q57's token-bucket chi-squared. Ranks
    * come from the vocabulary-sized count frame (the documented
    * distinct-value-frame convention — the only unpartitioned window
    * runs over ≤|vocab| rows, never the corpus); the fit reuses the
    * q55 exact-moment recipe: per-point logs are single IEEE calls,
    * moments sum as exact decimals, slope/intercept are one fixed-order
    * expression each, round@9. */
  private def zipf(s: SparkSession, d: String): DataFrame = {
    val wc = Tables.documents(s, d) // NOT spread: vocab comment
      .select(explode(TextOps.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("c"))
    val ranked = wc
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("word"))).cast("long"))
      .filter(col("r") <= 100)
      .select(log(col("r").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    val m = ranked.agg(count(lit(1)).cast("double").as("n"),
      graft.Det.dsum(col("x")).as("sx"), graft.Det.dsum(col("y")).as("sy"),
      graft.Det.dsum(col("x") * col("x")).as("sxx"),
      graft.Det.dsum(col("x") * col("y")).as("sxy"))
    def c0(s0: String): Column = col(s0)
    val slope = (c0("n") * c0("sxy") - c0("sx") * c0("sy")) /
      (c0("n") * c0("sxx") - c0("sx") * c0("sx"))
    m.select(c0("n").cast("long").as("n"),
      round(slope, 9).as("slope"),
      round((c0("sy") - slope * c0("sx")) / c0("n"), 9).as("intercept"))
  }

  private val zipfSql = {
    val slope = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
    s"""WITH wc AS (
       |  SELECT word, COUNT(*) AS c FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE word <> '' GROUP BY word),
       |ranked AS (
       |  SELECT CAST(row_number() OVER (ORDER BY c DESC, word) AS BIGINT) AS r, c
       |  FROM wc),
       |pts AS (
       |  SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
       |  FROM ranked WHERE r <= 100),
       |m AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${graft.Det.sqlSum("x")} AS sx, ${graft.Det.sqlSum("y")} AS sy,
       |    ${graft.Det.sqlSum("x * x")} AS sxx,
       |    ${graft.Det.sqlSum("x * y")} AS sxy
       |  FROM pts)
       |SELECT CAST(n AS BIGINT) AS n,
       |  round($slope, 9) AS slope,
       |  round((sy - $slope * sx) / n, 9) AS intercept
       |FROM m""".stripMargin
  }

  /** Pairwise vocabulary overlap between sources — the corpus-level
    * Jaccard matrix a mixing pass reads before blending ("are these
    * two crawls the same text distribution or complementary?"):
    * J(A,B) = |V_A ∩ V_B| / |V_A ∪ V_B| over the distinct-word sets,
    * with the containment coefficients |∩|/|V_A| and |∩|/|V_B| (the
    * asymmetric pair — a small source fully inside a big one has tiny
    * J but containment 1.0, the dedup_containment lesson at corpus
    * granularity).
    *
    * Scale shape: one (source, word) distinct pass, then a word-keyed
    * self-join of the vocabulary frames — everything is bounded by
    * vocabulary × sources, never by corpus rows; counts are exact
    * longs into one rounded division each. */
  private def sourceOverlap(s: SparkSession, d: String): DataFrame = {
    val vw = Tables.documents(s, d) // NOT spread: vocab comment
      .select(col("source"), explode(TextOps.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .distinct()
    val sizes = vw.groupBy(col("source")).agg(count(lit(1)).as("nv"))
    val a = vw.select(col("source").as("sa"), col("w"))
    val b = vw.select(col("source").as("sb"), col("w"))
    a.join(b, Seq("w")).filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("source").as("sa"), col("nv").as("na")), "sa")
      .join(sizes.select(col("source").as("sb"), col("nv").as("nb")), "sb")
      .select(col("sa"), col("sb"), col("inter"), col("na"), col("nb"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 9)
          .as("jaccard"),
        round(col("inter").cast("double") / col("na").cast("double"), 9)
          .as("cont_a"),
        round(col("inter").cast("double") / col("nb").cast("double"), 9)
          .as("cont_b"))
      .orderBy(col("sa"), col("sb"))
  }

  private val sourceOverlapSql =
    """WITH vw AS (
      |  SELECT DISTINCT source, w FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w
      |    FROM documents)
      |  WHERE w <> ''),
      |sizes AS (SELECT source, COUNT(*) AS nv FROM vw GROUP BY source),
      |pairs AS (
      |  SELECT a.source AS sa, b.source AS sb, COUNT(*) AS inter
      |  FROM vw a JOIN vw b ON a.w = b.w AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT p.sa, p.sb, p.inter, x.nv AS na, y.nv AS nb,
      |  round(CAST(p.inter AS DOUBLE) /
      |    CAST(x.nv + y.nv - p.inter AS DOUBLE), 9) AS jaccard,
      |  round(CAST(p.inter AS DOUBLE) / CAST(x.nv AS DOUBLE), 9) AS cont_a,
      |  round(CAST(p.inter AS DOUBLE) / CAST(y.nv AS DOUBLE), 9) AS cont_b
      |FROM pairs p JOIN sizes x ON x.source = p.sa
      |JOIN sizes y ON y.source = p.sb
      |ORDER BY sa, sb""".stripMargin

  /** k-anonymity / l-diversity audit — the privacy gate a dataset
    * release runs next to [[text_pii]]'s scrubbing: with quasi-
    * identifiers (source, length bucket) and `lang` as the sensitive
    * attribute, k-anonymity is the SMALLEST QI-group size (an attacker
    * knowing someone's QI values can narrow them to k records) and
    * l-diversity the smallest number of distinct sensitive values
    * inside any group (k-anonymous data still leaks when a group is
    * sensitive-homogeneous). Reports the minima plus how much data a
    * k = 10 bar would flag.
    *
    * Scale shape: one (QI, sensitive) counted aggregate → one QI
    * rollup → one summary row; distinct-sensitive counts come from the
    * two-level aggregate, NOT countDistinct next to count (the
    * q73 Expand lesson). All outputs exact longs. */
  private def kAnonymity(s: SparkSession, d: String): DataFrame = {
    val g1 = Tables.documents(s, d)
      .groupBy(col("source"), expr("n_chars div 500").as("len_b"),
        col("lang"))
      .agg(count(lit(1)).as("c"))
    val g2 = g1.groupBy(col("source"), col("len_b"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("l"))
    g2.agg(count(lit(1)).as("n_groups"),
      min(col("n")).as("k_anon"),
      min(col("l")).as("l_div"),
      sum(when(col("n") < 10, 1L).otherwise(0L)).as("violating_10"),
      sum(when(col("n") < 10, col("n")).otherwise(0L)).as("rows_at_risk_10"))
  }

  private val kAnonymitySql =
    """WITH g1 AS (
      |  SELECT source, n_chars // 500 AS len_b, lang, COUNT(*) AS c
      |  FROM documents GROUP BY 1, 2, 3),
      |g2 AS (
      |  SELECT source, len_b, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS l
      |  FROM g1 GROUP BY 1, 2)
      |SELECT COUNT(*) AS n_groups,
      |  CAST(MIN(n) AS BIGINT) AS k_anon,
      |  CAST(MIN(l) AS BIGINT) AS l_div,
      |  CAST(SUM(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS violating_10,
      |  CAST(SUM(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
      |    AS rows_at_risk_10
      |FROM g2""".stripMargin

  /** Simpson diversity of the token distribution per source — the
    * "probability two random tokens differ" index, INTEGER-EXACT by
    * construction (unlike Shannon entropy's per-term logs): λ =
    * Σ c_i(c_i−1) / (N(N−1)) from raw counts, D = 1 − λ, and the
    * inverse-Simpson effective vocabulary 1/λ. A template-spam source
    * (few tokens dominating) scores low D; complements [[text_chao1]]'s
    * richness estimate with an EVENNESS readout. One (source, word)
    * count pass + one source rollup. */
  private def simpson(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d) // NOT spread: vocab comment
      .select(col("source"), explode(TextOps.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n"),
        sum(col("c") * (col("c") - 1L)).as("s2"))
      .select(col("source"), col("n"), col("s2"),
        round(lit(1.0) - col("s2").cast("double") /
          (col("n") * (col("n") - 1L)).cast("double"), 9).as("simpson"),
        when(col("s2") > 0,
          round((col("n") * (col("n") - 1L)).cast("double") /
            col("s2").cast("double"), 6)).as("inv_simpson"))
      .orderBy(col("source"))

  private val simpsonSql =
    """WITH wc AS (
      |  SELECT source, w, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w
      |    FROM documents)
      |  WHERE w <> '' GROUP BY 1, 2),
      |m AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(c * (c - 1)) AS BIGINT) AS s2
      |  FROM wc GROUP BY 1)
      |SELECT source, n, s2,
      |  round(1.0 - CAST(s2 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 9)
      |    AS simpson,
      |  CASE WHEN s2 > 0 THEN round(CAST(n * (n - 1) AS DOUBLE) /
      |    CAST(s2 AS DOUBLE), 6) END AS inv_simpson
      |FROM m ORDER BY source""".stripMargin

  /** Library form of the decontamination pass: documents whose `isTrain`
    * rows share ≥1 word n-gram with any `isEval` row, with the shared
    * count. `hashKeys` switches the shuffle key from the shingle string
    * to `xxhash64(shingle)` — the production shape (8-byte keys;
    * corpus-wide collision odds ~1e-10).
    *
    * Scale shape — genuinely ONE shingling pass: the corpus is scanned
    * and shingled once, then a single shingle-keyed grouped aggregate
    * collects each shingle's train doc ids alongside an any-eval flag
    * (no self-join, no second scan, document bodies never move past the
    * shingling projection). Contaminated ids explode out of the flagged
    * groups and a per-doc count finishes it.
    *
    * `maxTrainDf` bounds the hot-shingle group: without it, a boilerplate
    * 8-gram (license header, templated page) with train document
    * frequency in the millions buffers every one of those ids in a single
    * `collect_list` buffer — the 100 TB OOM. With `Some(cap)` the
    * formulation switches to two bounded aggregates (per-shingle COUNTS,
    * never lists, with map-side combine) plus a shingle-keyed semi-join,
    * and shingles in more than `cap` train docs are dropped entirely —
    * for contamination hygiene that is the desired semantics (corpus-wide
    * boilerplate is not eval leakage), and TextSpec asserts capped ≡
    * exact whenever no shingle exceeds the cap. */
  def decontaminate(
      docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, isTrain: Column, n: Int,
      hashKeys: Boolean = false,
      maxTrainDf: Option[Int] = None): DataFrame = {
    val key: Column => Column = if (hashKeys) xxhash64(_) else identity
    val shingled = docs
      .select(col(idCol), isEval.as("__ev"), isTrain.as("__tr"),
        explode(TextOps.shingles(col(textCol), n)).as("__sh0"))
      .filter(col("__ev") || col("__tr"))
      .select(col(idCol), col("__ev"), col("__tr"), key(col("__sh0")).as("sh"))
    maxTrainDf match {
      case None =>
        shingled
          .groupBy(col("sh"))
          .agg(
            max(col("__ev")).as("has_eval"),
            // collect_list skips nulls: only train ids enter the list
            collect_list(when(col("__tr"), col(idCol))).as("train_ids"))
          .filter(col("has_eval") && size(col("train_ids")) > 0)
          .select(explode(col("train_ids")).as(idCol))
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_shared"))
      case Some(cap) =>
        // per-shingle scalar stats only — constant-size agg buffers
        val flagged = shingled
          .groupBy(col("sh"))
          .agg(
            max(col("__ev")).as("has_eval"),
            sum(when(col("__tr"), 1L).otherwise(0L)).as("train_df"))
          .filter(col("has_eval") && col("train_df") > 0 && col("train_df") <= cap)
          .select(col("sh"))
        shingled.filter(col("__tr"))
          .join(flagged, Seq("sh"), "left_semi")
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_shared"))
    }
  }

  /** BLOOM-FILTER decontamination — the 100 TB scale twin of
    * [[decontaminate]]'s hashed mode. Eval sets (benchmarks) are tiny
    * relative to a training corpus, so instead of shuffling EVERY train
    * shingle into a corpus-wide grouped aggregate, a Bloom filter of the
    * eval shingle keys is built once (Spark's own `BloomFilterAggregate`
    * — the machinery behind runtime join filters), folded into the plan
    * as a binary LITERAL, and probed per train shingle by the codegen'd
    * `BloomFilterMightContain` BEFORE anything reaches an exchange: the
    * shuffle then carries only the ~(contamination rate + fpp) fraction
    * of train shingles that might match. False positives are removed by
    * an exact semi-join restricted to those candidates, so the OUTPUT is
    * exactly `decontaminate(hashKeys = true)` — TextSpec asserts
    * equality (including under an absurd fpp), and the gated query
    * reuses pipeline_decontam's DuckDB oracle verbatim. */
  /** Aggregate the long column `keyCol` of `keys` into a LITERAL Bloom
    * filter and return the codegen'd might-contain predicate factory —
    * the building block behind [[decontaminateBloom]] and the streaming
    * twin ([[graft.streaming.StreamingDecontam]]). ONE bounded driver
    * exchange (the aggregated filter bytes — kilobytes for any eval set);
    * `None` when `keys` is empty (nothing can match). */
  def literalBloomPredicate(
      keys: DataFrame, keyCol: String, fpp: Double): Option[Column => Column] = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Bridge
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val nKeys = keys.count()
    if (nKeys == 0) None
    else {
      val nBits = math.max(64L,
        math.ceil(-nKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
      val bloomAgg = Bridge.column(
        new BloomFilterAggregate(Bridge.expression(col(keyCol)),
          Literal(nKeys), Literal(nBits)).toAggregateExpression())
      val bloomBytes = keys.agg(bloomAgg.as("bf")).head.getAs[Array[Byte]]("bf")
      Some((probe: Column) => Bridge.column(BloomFilterMightContain(
        Literal.create(bloomBytes, org.apache.spark.sql.types.BinaryType),
        Bridge.expression(probe))))
    }
  }

  def decontaminateBloom(
      docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, isTrain: Column, n: Int,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")

    val shingled = docs
      .select(col(idCol), isEval.as("__ev"), isTrain.as("__tr"),
        explode(TextOps.shingles(col(textCol), n)).as("__sh0"))
      .filter(col("__ev") || col("__tr"))
      .select(col(idCol), col("__ev"), col("__tr"),
        xxhash64(col("__sh0")).as("sh"))

    // eager localCheckpoint: the (tiny) key set is materialized ONCE and
    // serves the count, the bloom build and the verification semi-join
    // without re-scanning the corpus; blocks are GC-cleaned with the RDD
    val evalKeys = shingled.filter(col("__ev")).select(col("sh")).distinct()
      .localCheckpoint(true)
    literalBloomPredicate(evalKeys, "sh", fpp) match {
      case None =>
        // no eval shingles — nothing can leak; empty result, right schema
        shingled.filter(lit(false))
          .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
      case Some(mightContain) =>
        shingled.filter(col("__tr")).filter(mightContain(col("sh")))
          .join(evalKeys, Seq("sh"), "left_semi") // exact: drops bloom FPs
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_shared"))
    }
  }

  /** The gated decontamination query: train-split documents sharing any
    * 8-word shingle with any test-split document (split = the same md5
    * buckets as pipeline_split, so the whole check is a pure function of
    * the corpus). The standard pre-training hygiene pass — a train
    * document that textually overlaps the benchmark set leaks the eval.
    * Gated on shingle strings so DuckDB reproduces it verbatim; the
    * xxhash64-keyed production twin is asserted equal in TextSpec. */
  private def decontam(s: SparkSession, d: String): DataFrame = {
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
    decontaminate(
      Tables.documents(s, d), "doc_id", "text",
      isEval = bucket >= "e6", isTrain = bucket < "cc", n = 8)
      .orderBy(col("doc_id"))
  }

  private val decontamSql =
    """WITH d AS (
      |  SELECT doc_id, substring(md5(doc_id::VARCHAR), 1, 2) AS bucket,
      |    string_split(text, ' ') AS ws
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, bucket,
      |    unnest(list_distinct(list_transform(generate_series(1, len(ws) - 7),
      |      i -> array_to_string(ws[i:i+7], ' ')))) AS sh
      |  FROM d WHERE len(ws) >= 8),
      |ev AS (SELECT DISTINCT sh FROM sh WHERE bucket >= 'e6'),
      |tr AS (SELECT doc_id, sh FROM sh WHERE bucket < 'cc')
      |SELECT tr.doc_id, COUNT(*) AS n_shared
      |FROM tr JOIN ev USING (sh)
      |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin

  /** Repetition-based quality signals (the Gopher/C4 family): fraction of
    * tokens taken by the most frequent word, fraction of unique words,
    * and fraction of bigrams taken by the most frequent bigram — high
    * values mark boilerplate / degenerate generations that a training
    * mix should drop.
    *
    * Scale shape: explode → (doc, token)-keyed count → per-doc extrema.
    * Both aggregates are keyed by doc_id(+token) with map-side combine,
    * so the shuffle carries per-doc partial counts, never text; the final
    * join is doc-keyed. No global state — holds at any corpus size. */
  private def repetition(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, d) // spread: vocab comment
      .select(col("doc_id"), col("text")), col("doc_id"))
    val uni = docs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("tot"),
        count(lit(1)).as("unq"))
    val bi = docs
      .select(col("doc_id"), explode(TextOps.ngrams(col("text"), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("bmx"), sum(col("n")).as("btot"))
    uni.join(bi, Seq("doc_id"))
      .select(col("doc_id"),
        col("mx").as("top_word_n"), col("tot").as("n_words"),
        col("unq").as("n_uniq_words"),
        col("bmx").as("top_bigram_n"), col("btot").as("n_bigrams"),
        round(col("mx").cast("double") / col("tot"), 6).as("top_word_frac"),
        round(col("unq").cast("double") / col("tot"), 6).as("uniq_word_frac"),
        round(col("bmx").cast("double") / col("btot"), 6).as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  private val repetitionSql =
    """WITH uc AS (
      |  SELECT doc_id, tok, COUNT(*) AS n FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok),
      |ua AS (
      |  SELECT doc_id, MAX(n) AS mx, CAST(SUM(n) AS BIGINT) AS tot,
      |    COUNT(*) AS unq
      |  FROM uc GROUP BY doc_id),
      |bc AS (
      |  SELECT doc_id, bg, COUNT(*) AS n FROM (
      |    SELECT doc_id, unnest(list_transform(
      |      range(1, len(string_split(text, ' '))),
      |      i -> array_to_string(string_split(text, ' ')[i:i+1], ' '))) AS bg
      |    FROM documents)
      |  GROUP BY doc_id, bg),
      |ba AS (
      |  SELECT doc_id, MAX(n) AS bmx, CAST(SUM(n) AS BIGINT) AS btot
      |  FROM bc GROUP BY doc_id)
      |SELECT ua.doc_id,
      |  ua.mx AS top_word_n, ua.tot AS n_words, ua.unq AS n_uniq_words,
      |  ba.bmx AS top_bigram_n, ba.btot AS n_bigrams,
      |  round(ua.mx::DOUBLE / ua.tot, 6) AS top_word_frac,
      |  round(ua.unq::DOUBLE / ua.tot, 6) AS uniq_word_frac,
      |  round(ba.bmx::DOUBLE / ba.btot, 6) AS top_bigram_frac
      |FROM ua JOIN ba ON ua.doc_id = ba.doc_id
      |ORDER BY ua.doc_id""".stripMargin

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+\\d{1,2}-\\d{3}-\\d{4}"

  /** PII scrubbing: regex redaction of emails and phone numbers — the
    * compliance pass every web-scale training corpus runs before the
    * tokenizer. The synthetic corpus carries no organic PII, so the gate
    * PLANTS deterministic id-derived contacts into each document (both
    * engines build the identical augmented text) and then proves the
    * scrubber found and replaced them. Pure codegen'd regexp columns —
    * narrow, no shuffle, no UDFs; patterns stay in the portable subset
    * shared by java.util.regex and RE2 (no backrefs, no lookaround). */
  private def pii(s: SparkSession, d: String): DataFrame = {
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    Tables.documents(s, d).filter(col("doc_id") % 20 === 0)
      .select(
        col("doc_id"),
        regexp_count(aug, lit(emailRe)).as("n_emails"),
        regexp_count(aug, lit(phoneRe)).as("n_phones"),
        regexp_replace(regexp_replace(aug, emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("scrubbed"))
      .orderBy(col("doc_id"))
  }

  private val piiSql =
    s"""WITH a AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@mail.example.com or +1-555-' ||
       |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
       |  FROM documents WHERE doc_id % 20 = 0)
       |SELECT doc_id,
       |  len(regexp_extract_all(aug, '$emailRe')) AS n_emails,
       |  len(regexp_extract_all(aug, '$phoneRe')) AS n_phones,
       |  regexp_replace(regexp_replace(aug, '$emailRe', '<EMAIL>', 'g'),
       |    '$phoneRe', '<PHONE>', 'g') AS scrubbed
       |FROM a ORDER BY doc_id""".stripMargin

  /** The bloom twin on the same split/n as pipeline_decontam — gated
    * against the IDENTICAL string-shingle oracle (output equality holds
    * absent a 64-bit xxhash64 collision among corpus shingles, odds
    * ~1e-8 and fixed for a given corpus). */
  private def decontamBloom(s: SparkSession, d: String): DataFrame = {
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
    decontaminateBloom(
      Tables.documents(s, d), "doc_id", "text",
      isEval = bucket >= "e6", isTrain = bucket < "cc", n = 8)
      .orderBy(col("doc_id"))
  }

  /** Corpus-trained unigram language-model scoring (the CCNet/KenLM-style
    * quality signal, with the n-gram order dropped to 1 so the model is
    * exactly expressible in both engines): every document is scored by
    * the add-one-smoothed log10 probability of its tokens under the
    * corpus's own unigram distribution. Low (very negative) average
    * log-prob marks out-of-distribution word soup; boilerplate scores
    * high — the standard perplexity-bucketing input.
    *
    * Scale shape: one explode → (doc, word)-keyed counts with map-side
    * combine (the same shuffle as text_repetition, carrying counts never
    * text); corpus vocabulary counts REUSE those partials via a second
    * word-keyed aggregate; the (total, vocab-size) scalars are one
    * broadcast row. The per-doc score joins doc-word counts with vocab
    * counts word-keyed — AQE-planned, no state grows with corpus size
    * beyond the vocabulary itself.
    *
    * Oracle-exactness: the per-(doc,word) contribution is ONE IEEE double
    * expression evaluated in identical textual order in the DuckDB
    * mirror, rounded to 9 decimals, then summed as exact decimals
    * (order-independent) and rounded to 6 — the same contract as
    * [[SparseSim.topKBm25]], so grouped float addition order cannot
    * perturb the gate. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), // NOT spread: vocab comment
      explode(TextOps.words(col(textCol))).as("w"))
    val dc = toks.groupBy(col(idCol), col("w")).agg(count(lit(1)).as("k"))
    val v = dc.groupBy(col("w")).agg(sum(col("k")).as("c"))
    val totals = v.agg(sum(col("c")).as("tot"), count(lit(1)).as("vs"))
    val elem = round(
      col("k") * log10((col("c") + lit(1.0)) / (col("tot") + col("vs"))), 9)
    dc.join(v, Seq("w"))
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("k"),
        elem.cast(org.apache.spark.sql.types.DecimalType(38, 12)).as("e"))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_tok"),
        round(sum(col("e")).cast("double"), 6).as("sum_lp10"))
      .withColumn("avg_lp10", round(col("sum_lp10") / col("n_tok"), 6))
  }

  /** Character-level Shannon entropy per document — the cheap gibberish
    * and degenerate-content signal (base64 blobs and random keys score
    * HIGH, single-character runs and template spam score LOW; natural
    * prose sits in a tight per-language band, so both tails are cut
    * material). Complements text_quality (token-level ratios) and the LM
    * scores (corpus-relative): entropy is corpus-INDEPENDENT, so it
    * needs no second pass over anything.
    *
    * Scale shape: chars explode narrowly per row; the only state is
    * (doc, char)-keyed counts with map-side combine (alphabet-bounded
    * per doc), the per-doc total reuses those counts, and the join back
    * is doc-keyed. Shuffles carry counts, never text. Per-term math
    * follows the decimal-summed one-expression-per-term contract
    * ([[unigramLogProb]]). Empty/null texts have no characters and drop
    * from the output (both engines agree by construction). */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = Tables.spread(docs.select(col(idCol), col(textCol)),
        col(idCol)) // spread: vocab comment
      .select(col(idCol),
        explode(filter(split(col(textCol), ""), c => c =!= "")).as("ch"))
    val c = chars.groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("k"))
    val n = c.groupBy(col(idCol)).agg(sum(col("k")).as("n"))
    val p = col("k").cast("double") / col("n")
    c.join(n, Seq(idCol))
      .select(col(idCol), col("k"),
        round(p * log2(p), 9)
          .cast(org.apache.spark.sql.types.DecimalType(38, 12)).as("e"))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_chars2"),
        round((-sum(col("e"))).cast("double"), 6).as("entropy"))
  }

  private def entropyQ(s: SparkSession, d: String): DataFrame =
    charEntropy(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val entropySql =
    """WITH ch AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
      |c AS (SELECT doc_id, ch, COUNT(*) AS k FROM ch GROUP BY doc_id, ch),
      |n AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n FROM c GROUP BY doc_id),
      |e AS (
      |  SELECT c.doc_id, c.k,
      |    CAST(round((c.k::DOUBLE / n.n) * log2(c.k::DOUBLE / n.n), 9)
      |      AS DECIMAL(38,12)) AS e
      |  FROM c JOIN n USING (doc_id))
      |SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_chars2,
      |  round(CAST(-SUM(e) AS DOUBLE), 6) AS entropy
      |FROM e GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Distribution drift per corpus slice: Jensen–Shannon divergence (in
    * bits) between each slice's token distribution and the corpus-wide
    * one — the monitoring signal that catches a domain gone templated, a
    * crawler feeding one site garbage, or a language shift between
    * snapshots, BEFORE a model trains on it. JSD over KL because it is
    * symmetric, bounded in [0,1], and defined when a token is missing
    * from one side.
    *
    * The absent-token mass needs no materialized pairs: a token absent
    * from slice s contributes exactly `0.5·g` to JSD(P_s, G) (its mixture
    * is g/2, so the g·log2(2g/(p+g)) term degenerates to g), hence
    *   JSD_s = Σ_{w∈s} [0.5·p·log2(2p/(p+g)) + 0.5·g·log2(2g/(p+g))]
    *           + 0.5·(1 − Σ_{w∈s} g)
    * — the join touches only (slice, token) pairs that EXIST, so the
    * shuffle is the same (slice, token)-keyed count reduction as the LM
    * scores, never slices × vocabulary. Per-term math follows the
    * decimal-summed contract; the global counts reuse the per-slice
    * partials. */
  def sliceDrift(docs: DataFrame, sliceCol: String, textCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    val toks = docs.select(col(sliceCol), // NOT spread: vocab comment
      explode(TextOps.words(col(textCol))).as("w"))
    val sc = toks.groupBy(col(sliceCol), col("w")).agg(count(lit(1)).as("k"))
    val st = sc.groupBy(col(sliceCol)).agg(sum(col("k")).as("stot"))
    val gc = sc.groupBy(col("w")).agg(sum(col("k")).as("c"))
    val gt = gc.agg(sum(col("c")).as("gtot"))
    val p = col("k").cast("double") / col("stot")
    val g = col("c").cast("double") / col("gtot")
    sc.join(st, Seq(sliceCol))
      .join(gc, Seq("w"))
      .crossJoin(broadcast(gt))
      .select(col(sliceCol),
        round(lit(0.5) * p * log2(lit(2.0) * p / (p + g))
          + lit(0.5) * g * log2(lit(2.0) * g / (p + g)), 9).cast(dec).as("e"),
        round(g, 9).cast(dec).as("gm"))
      .groupBy(col(sliceCol))
      // both decimal sums drop to double BEFORE the final three-term
      // expression so the closing arithmetic is plain IEEE in both engines
      .agg(round(sum(col("e")).cast("double")
        + lit(0.5) * (lit(1.0) - sum(col("gm")).cast("double")), 6).as("jsd"))
  }

  private def driftQ(s: SparkSession, d: String): DataFrame =
    sliceDrift(Tables.documents(s, d), "source", "text")
      .orderBy(col("source"))

  private val driftSql =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      |sc AS (SELECT source, w, COUNT(*) AS k FROM toks GROUP BY source, w),
      |st AS (SELECT source, CAST(SUM(k) AS BIGINT) AS stot FROM sc GROUP BY source),
      |gc AS (SELECT w, CAST(SUM(k) AS BIGINT) AS c FROM sc GROUP BY w),
      |gt AS (SELECT CAST(SUM(c) AS BIGINT) AS gtot FROM gc),
      |e AS (
      |  SELECT sc.source,
      |    CAST(round(0.5 * (sc.k::DOUBLE / st.stot)
      |        * log2(2.0 * (sc.k::DOUBLE / st.stot)
      |            / ((sc.k::DOUBLE / st.stot) + (gc.c::DOUBLE / gt.gtot)))
      |      + 0.5 * (gc.c::DOUBLE / gt.gtot)
      |        * log2(2.0 * (gc.c::DOUBLE / gt.gtot)
      |            / ((sc.k::DOUBLE / st.stot) + (gc.c::DOUBLE / gt.gtot))), 9)
      |      AS DECIMAL(38,12)) AS e,
      |    CAST(round(gc.c::DOUBLE / gt.gtot, 9) AS DECIMAL(38,12)) AS gm
      |  FROM sc JOIN st USING (source) JOIN gc USING (w) CROSS JOIN gt)
      |SELECT source,
      |  round(CAST(SUM(e) AS DOUBLE)
      |    + 0.5 * (1.0 - CAST(SUM(gm) AS DOUBLE)), 6) AS jsd
      |FROM e GROUP BY source ORDER BY source""".stripMargin

  /** Bounded-state drift twin ([[Drift]]): the same per-source JSD as
    * text_drift but over the fixed 64-bucket token hash — the state that
    * survives a stream. The oracle densifies (source × 64 buckets) and
    * mirrors the per-bucket guarded expression term by term. */
  private def driftBucketedQ(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val ref = Drift.refProbs(docs, "text")
    Drift.bucketJsd(docs, Seq("source"), "text", ref)
      .orderBy(col("source"))
  }

  private val driftBucketedSql =
    s"""WITH toks AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
       |tb AS (
       |  SELECT source,
       |    (('0x' || substring(md5(w), 1, 4))::INT % ${Drift.Buckets}) AS b
       |  FROM toks),
       |sc AS (SELECT source, b, COUNT(*) AS k FROM tb GROUP BY source, b),
       |st AS (SELECT source, CAST(SUM(k) AS BIGINT) AS n FROM sc GROUP BY source),
       |gc AS (SELECT b, CAST(SUM(k) AS BIGINT) AS c FROM sc GROUP BY b),
       |gt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM gc),
       |dense AS (
       |  SELECT st.source, st.n, r.range AS b,
       |         coalesce(sc.k, 0) AS k, coalesce(gc.c, 0) AS c
       |  FROM st CROSS JOIN range(${Drift.Buckets}) r
       |  LEFT JOIN sc ON sc.source = st.source AND sc.b = r.range
       |  LEFT JOIN gc ON gc.b = r.range),
       |terms AS (
       |  SELECT source,
       |    CAST(round((
       |      (CASE WHEN k > 0 THEN
       |        0.5 * (k::DOUBLE / n) * log2(2.0 * (k::DOUBLE / n)
       |          / ((k::DOUBLE / n) + (c::DOUBLE / gt.t))) ELSE 0.0 END)
       |      + (CASE WHEN c > 0 THEN
       |        0.5 * (c::DOUBLE / gt.t) * log2(2.0 * (c::DOUBLE / gt.t)
       |          / ((CASE WHEN k > 0 THEN k::DOUBLE / n ELSE 0.0 END)
       |             + (c::DOUBLE / gt.t))) ELSE 0.0 END)) * 1e9, 0)
       |      AS BIGINT) AS e
       |  FROM dense CROSS JOIN gt)
       |SELECT source, CAST(SUM(e) AS DOUBLE) / 1e9 AS jsd
       |FROM terms GROUP BY source ORDER BY source""".stripMargin

  /** Gopher-style rule battery (Rae et al. 2021 Appendix A) — the
    * second industry-standard quality screen next to [[quality]]'s
    * C4-ish ratios: mean word length inside [3,10], symbol-to-word
    * ratio (#/… spam), fraction of lines starting with a bullet or
    * ending with an ellipsis, and the alphabetic-word fraction. Each
    * signal is a narrow per-row expression (no shuffle at any scale);
    * the keep flag is the conjunction of the published thresholds. */
  private def gopherQ(s: SparkSession, d: String): DataFrame =
    gopherOn(Tables.documents(s, d))

  /** The rule battery over any (doc_id, text) frame — spec entry point. */
  def gopherOn(docs: DataFrame): DataFrame = {
    val ws = TextOps.words(col("text"))
    val nTok = size(ws).cast("double")
    val meanWordLen =
      aggregate(ws, lit(0L), (a, w) => a + length(w)).cast("double") / nTok
    val symbolRatio =
      (size(split(col("text"), "#", -1)) - 1 +
        (size(split(col("text"), "\\.\\.\\.", -1)) - 1) * 3).cast("double") / nTok
    val lines = split(col("text"), "\n", -1)
    val nLines = size(lines).cast("double")
    val bulletFrac =
      size(filter(lines, l => l.startsWith("-") || l.startsWith("*")))
        .cast("double") / nLines
    val ellipsisFrac =
      size(filter(lines, l => l.endsWith("..."))).cast("double") / nLines
    val alphaFrac =
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / nTok
    // keep is judged on the UNROUNDED ratios in BOTH engines (a ratio
    // rounding up to a threshold must not flip the flag on one side)
    docs.select(
      col("doc_id"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(bulletFrac, 6).as("bullet_frac"),
      round(ellipsisFrac, 6).as("ellipsis_frac"),
      round(alphaFrac, 6).as("alpha_frac"),
      (meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
        symbolRatio <= 0.1 && bulletFrac <= 0.9 &&
        ellipsisFrac <= 0.3 && alphaFrac >= 0.8).as("keep"))
      .orderBy(col("doc_id"))
  }

  private val gopherSql = {
    val nTok = "len(string_split(text, ' '))::DOUBLE"
    val mwl = s"list_sum(list_transform(string_split(text, ' '), w -> length(w)))::DOUBLE / $nTok"
    // '#' chars + 3x the non-overlapping '...' occurrences (replace and
    // a left-to-right regex split count occurrences identically)
    val sym = s"((length(text) - length(replace(text, '#', ''))) + " +
      s"(length(text) - length(replace(text, '...', ''))))::DOUBLE / $nTok"
    val nLines = "len(string_split(text, chr(10)))::DOUBLE"
    val bullet = s"len(list_filter(string_split(text, chr(10)), " +
      s"l -> starts_with(l, '-') OR starts_with(l, '*')))::DOUBLE / $nLines"
    val ell = s"len(list_filter(string_split(text, chr(10)), " +
      s"l -> ends_with(l, '...')))::DOUBLE / $nLines"
    val alpha = s"len(list_filter(string_split(text, ' '), " +
      s"w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE / $nTok"
    s"""SELECT doc_id,
       |  round($mwl, 6) AS mean_word_len,
       |  round($sym, 6) AS symbol_ratio,
       |  round($bullet, 6) AS bullet_frac,
       |  round($ell, 6) AS ellipsis_frac,
       |  round($alpha, 6) AS alpha_frac,
       |  ($mwl >= 3.0 AND $mwl <= 10.0 AND $sym <= 0.1 AND $bullet <= 0.9
       |   AND $ell <= 0.3 AND $alpha >= 0.8) AS keep
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Per-document TF-IDF top terms — the keyword-extraction staple
    * (tf·ln((N+1)/(df+1)), smoothed so corpus-universal terms score ~0
    * instead of dividing by zero). Shuffle shape: the (doc, word) count
    * reduction with map-side combine, document frequencies reusing those
    * partials word-keyed, one broadcast N row, and a doc-partitioned
    * window for the per-doc top-k (per-doc cardinality is bounded by
    * document length, so the window never concentrates a corpus).
    * Scores on identical integer inputs are identical doubles in both
    * engines; ties break on the term string. */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = docs.select(col(idCol), // NOT spread: vocab comment
      explode(TextOps.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val dc = toks.groupBy(col(idCol), col("w")).agg(count(lit(1)).as("tf"))
    val dfq = dc.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("w"))
    dc.join(dfq, Seq("w"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * log((col("nd") + lit(1.0)) / (col("df") + lit(1.0))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("int").as("rank"), col("w").as("term"),
        round(col("score"), 6).as("tfidf"))
  }

  private def tfidfQ(s: SparkSession, d: String): DataFrame =
    tfidfTopK(Tables.documents(s, d), "doc_id", "text", k = 5)
      .orderBy(col("doc_id"), col("rank"))

  private val tfidfSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dc AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks WHERE w <> ''
      |       GROUP BY doc_id, w),
      |dfq AS (SELECT w, COUNT(*) AS df FROM dc GROUP BY w),
      |nd AS (SELECT COUNT(*) AS nd FROM documents),
      |s AS (
      |  SELECT dc.doc_id, dc.w,
      |    dc.tf * ln((nd.nd + 1.0) / (dfq.df + 1.0)) AS score
      |  FROM dc JOIN dfq USING (w) CROSS JOIN nd)
      |SELECT doc_id, rank, term, tfidf FROM (
      |  SELECT doc_id, w AS term,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, w) AS INT) AS rank,
      |    round(score, 6) AS tfidf
      |  FROM s)
      |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin

  /** CCNet-style perplexity bucketing: documents split into
    * head / middle / tail by their LM score (higher avg log-prob =
    * lower perplexity = head — the bucket CCNet keeps or up-weights).
    * Cut points are the exact 0.75/0.25 quantiles of the score (binary-
    * exact q values, so the (n−1)·q rank arithmetic has no rounding
    * question in either engine); ties at a cutoff take the better
    * bucket. The cutoffs ride in as broadcast scalars — the corpus is
    * never sorted or windowed globally (the pipeline_quality_cut
    * stance). */
  private def ccnetQ(s: SparkSession, d: String): DataFrame = {
    val lm = unigramLogProb(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("avg_lp10"))
    val cuts = graft.operators.Quantiles.exact(lm, "avg_lp10", Seq(0.25, 0.75))
    lm.withColumn("bucket",
        when(col("avg_lp10") >= cuts(1), "head")
          .when(col("avg_lp10") >= cuts(0), "middle")
          .otherwise("tail"))
      .orderBy(col("doc_id"))
  }

  private val ccnetSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dc AS (SELECT doc_id, w, COUNT(*) AS k FROM toks GROUP BY doc_id, w),
      |v AS (SELECT w, CAST(SUM(k) AS BIGINT) AS c FROM dc GROUP BY w),
      |t AS (SELECT CAST(SUM(c) AS BIGINT) AS tot, COUNT(*) AS vs FROM v),
      |e AS (
      |  SELECT dc.doc_id, dc.k,
      |    CAST(round(dc.k * log10((v.c + 1.0) / (t.tot + t.vs)), 9)
      |      AS DECIMAL(38,12)) AS e
      |  FROM dc JOIN v USING (w) CROSS JOIN t),
      |lm AS (
      |  SELECT doc_id,
      |    round(round(CAST(SUM(e) AS DOUBLE), 6) / CAST(SUM(k) AS BIGINT), 6)
      |      AS avg_lp10
      |  FROM e GROUP BY doc_id),
      |cuts AS (
      |  SELECT quantile_cont(avg_lp10, 0.25) AS lo,
      |         quantile_cont(avg_lp10, 0.75) AS hi
      |  FROM lm)
      |SELECT doc_id, avg_lp10,
      |  CASE WHEN avg_lp10 >= cuts.hi THEN 'head'
      |       WHEN avg_lp10 >= cuts.lo THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM lm CROSS JOIN cuts ORDER BY doc_id""".stripMargin

  private def unigramLm(s: SparkSession, d: String): DataFrame =
    unigramLogProb(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val unigramLmSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dc AS (SELECT doc_id, w, COUNT(*) AS k FROM toks GROUP BY doc_id, w),
      |v AS (SELECT w, CAST(SUM(k) AS BIGINT) AS c FROM dc GROUP BY w),
      |t AS (SELECT CAST(SUM(c) AS BIGINT) AS tot, COUNT(*) AS vs FROM v),
      |e AS (
      |  SELECT dc.doc_id, dc.k,
      |    CAST(round(dc.k * log10((v.c + 1.0) / (t.tot + t.vs)), 9)
      |      AS DECIMAL(38,12)) AS e
      |  FROM dc JOIN v USING (w) CROSS JOIN t),
      |s AS (
      |  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tok,
      |    round(CAST(SUM(e) AS DOUBLE), 6) AS sum_lp10
      |  FROM e GROUP BY doc_id)
      |SELECT doc_id, n_tok, sum_lp10,
      |  round(sum_lp10 / n_tok, 6) AS avg_lp10
      |FROM s ORDER BY doc_id""".stripMargin

  /** Corpus-trained BIGRAM language-model scoring — one n-gram order up
    * from [[unigramLogProb]], the form CCNet-style perplexity filters
    * actually run: each document scores by the add-one-smoothed log10
    * probability of its word transitions `P(w_i | w_{i-1}) =
    * (c(w_{i-1}, w_i) + 1) / (c(w_{i-1}·) + V)` under the corpus's own
    * bigram counts. Word soup with plausible words but implausible
    * ORDER — the case a unigram model cannot see — scores low.
    *
    * Scale shape mirrors the unigram gate: bigrams explode narrowly from
    * per-row slices, (doc, bigram)-keyed counts with map-side combine,
    * corpus transition and context counts reuse those partials, the
    * (V) scalar is one broadcast row, and the per-doc score is the same
    * decimal-summed one-expression-per-term contract, so grouped float
    * addition order cannot perturb the gate. Documents shorter than two
    * tokens have no transitions and drop from the output (both engines
    * agree by construction). */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = graft.functions.TextOps.words(col(textCol))
    val bg = docs.select(col(idCol), // NOT spread: vocab comment
        explode(arrays_zip(
          slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1))).as("p"))
      .select(col(idCol), col("p").getField("0").as("wl"),
        col("p").getField("1").as("wr"))
    val dc = bg.groupBy(col(idCol), col("wl"), col("wr"))
      .agg(count(lit(1)).as("k"))
    val trans = dc.groupBy(col("wl"), col("wr")).agg(sum(col("k")).as("cb"))
    val ctx = trans.groupBy(col("wl")).agg(sum(col("cb")).as("cu"))
    val vocab = trans.agg(countDistinct(col("wr")).as("vs"))
    val elem = round(
      col("k") * log10((col("cb") + lit(1.0)) / (col("cu") + col("vs"))), 9)
    dc.join(trans, Seq("wl", "wr"))
      .join(ctx, Seq("wl"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col("k"),
        elem.cast(org.apache.spark.sql.types.DecimalType(38, 12)).as("e"))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_big"),
        round(sum(col("e")).cast("double"), 6).as("sum_lp10"))
      .withColumn("avg_lp10", round(col("sum_lp10") / col("n_big"), 6))
  }

  private def bigramLm(s: SparkSession, d: String): DataFrame =
    bigramLogProb(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Jelinek–Mercer INTERPOLATED bigram LM — the smoothing family real
    * perplexity filters (CCNet's KenLM) actually use, one honest
    * declarative step down from Kneser–Ney: each transition scores
    * `log10(λ·P_bi(w|u) + (1−λ)·P_uni(w))` with MLE component models.
    * Unlike [[bigramLogProb]]'s add-one floor, unseen transitions fall
    * back to the unigram model WEIGHTED, not to a uniform 1/V — rare
    * continuations of common words stop being over-penalized. Same
    * plan shape and decimal-summed per-term contract; the unigram
    * probabilities join on the right word, reusing the bigram partials'
    * exchange for the context counts. */
  private val JmLambda = 0.75

  def interpolatedLogProb(
      docs: DataFrame, idCol: String, textCol: String,
      lambda: Double): DataFrame = {
    val ws = graft.functions.TextOps.words(col(textCol))
    val bg = docs.select(col(idCol), // NOT spread: vocab comment
        explode(arrays_zip(
          slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1))).as("p"))
      .select(col(idCol), col("p").getField("0").as("wl"),
        col("p").getField("1").as("wr"))
    val dc = bg.groupBy(col(idCol), col("wl"), col("wr"))
      .agg(count(lit(1)).as("k"))
    val trans = dc.groupBy(col("wl"), col("wr")).agg(sum(col("k")).as("cb"))
    val ctx = trans.groupBy(col("wl")).agg(sum(col("cb")).as("cu"))
    val uni = docs.select(explode(ws).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val n = uni.agg(sum(col("cw")).as("n"))
    val elem = round(
      col("k") * log10(
        lit(lambda) * (col("cb").cast("double") / col("cu")) +
          lit(1.0 - lambda) * (col("cw").cast("double") / col("n"))), 9)
    dc.join(trans, Seq("wl", "wr"))
      .join(ctx, Seq("wl"))
      .join(uni.select(col("w").as("wr"), col("cw")), Seq("wr"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("k"),
        elem.cast(org.apache.spark.sql.types.DecimalType(38, 12)).as("e"))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_big"),
        round(sum(col("e")).cast("double"), 6).as("sum_lp10"))
      .withColumn("avg_lp10", round(col("sum_lp10") / col("n_big"), 6))
  }

  private def jmLm(s: SparkSession, d: String): DataFrame =
    interpolatedLogProb(Tables.documents(s, d), "doc_id", "text", JmLambda)
      .orderBy(col("doc_id"))

  // CTE fragment twin of [[dsirCtes]] — names are disjoint by design
  private val jmCtes =
    s"""toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |bg AS (
       |  SELECT doc_id, unnest(list_zip(
       |    ws[1:len(ws)-1], ws[2:len(ws)])) AS p
       |  FROM toks),
       |bgf AS (
       |  SELECT doc_id, p[1] AS wl, p[2] AS wr FROM bg),
       |dc AS (SELECT doc_id, wl, wr, COUNT(*) AS k FROM bgf GROUP BY 1, 2, 3),
       |trans AS (
       |  SELECT wl, wr, CAST(SUM(k) AS BIGINT) AS cb FROM dc GROUP BY 1, 2),
       |ctx AS (SELECT wl, CAST(SUM(cb) AS BIGINT) AS cu FROM trans GROUP BY 1),
       |uc AS (
       |  SELECT w, COUNT(*) AS cw FROM (
       |    SELECT unnest(ws) AS w FROM toks) GROUP BY w),
       |n AS (SELECT CAST(SUM(cw) AS BIGINT) AS n FROM uc),
       |e AS (
       |  SELECT dc.doc_id, dc.k,
       |    CAST(round(dc.k * log10(
       |      $JmLambda * (trans.cb::DOUBLE / ctx.cu) +
       |      ${1.0 - JmLambda} * (uc.cw::DOUBLE / n.n)), 9)
       |      AS DECIMAL(38,12)) AS e
       |  FROM dc JOIN trans USING (wl, wr) JOIN ctx USING (wl)
       |  JOIN uc ON uc.w = dc.wr, n),
       |s AS (
       |  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_big,
       |    round(CAST(SUM(e) AS DOUBLE), 6) AS sum_lp10
       |  FROM e GROUP BY doc_id),
       |jmscore AS (
       |  SELECT doc_id, n_big, sum_lp10,
       |    round(sum_lp10 / n_big, 6) AS avg_lp10
       |  FROM s)""".stripMargin

  private val jmLmSql =
    s"""WITH $jmCtes
       |SELECT doc_id, n_big, sum_lp10, avg_lp10
       |FROM jmscore ORDER BY doc_id""".stripMargin

  /** Curation composition v3 — the NEWEST ops as one lazy plan:
    * DSIR-select the 200 most target-like documents (lang='en' tilt,
    * Gumbel draw), then rank the selection by the Jelinek–Mercer LM
    * score (corpus-trained model) and keep the 100 most fluent. Proves
    * the session's operators compose: the selection's Gumbel keys and
    * the LM's decimal-summed scores survive a join + re-rank in one
    * deterministic chain, mirrored CTE-for-CTE in DuckDB. */
  private val E2eV3Sel = 200
  private val E2eV3Keep = 100

  private def e2eV3(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val sel = graft.pipeline.Dsir
      .selectTopN(docs, "doc_id", "text", col("lang") === "en", E2eV3Sel)
      .select(col("doc_id"), col("logw"), col("skey"))
    val lm = interpolatedLogProb(docs, "doc_id", "text", JmLambda)
      .select(col("doc_id"), col("avg_lp10"))
    sel.join(lm, Seq("doc_id"))
      .select(col("doc_id"), col("logw"), col("skey"), col("avg_lp10"))
      .orderBy(col("avg_lp10").desc, col("doc_id"))
      .limit(E2eV3Keep)
  }

  // lazy: dsirCtes is declared further down the object — evaluation at
  // caps-construction time sees both fragments initialized
  private lazy val e2eV3Sql =
    s"""WITH $dsirCtes,
       |$jmCtes,
       |sel AS (
       |  SELECT doc_id, logw, skey FROM dsel
       |  ORDER BY skey DESC, doc_id LIMIT $E2eV3Sel)
       |SELECT sel.doc_id, sel.logw, sel.skey, j.avg_lp10
       |FROM sel JOIN jmscore j ON j.doc_id = sel.doc_id
       |ORDER BY j.avg_lp10 DESC, sel.doc_id LIMIT $E2eV3Keep""".stripMargin

  /** Curation composition v4 — the round-11/12 families threaded as ONE
    * lazy plan, end to end the way a dataset release actually runs:
    *  1. privacy screen: keep only documents whose (source, length-
    *     bucket) quasi-identifier group has ≥ 10 members (the
    *     k-anonymity audit's per-row ACTION form — release nothing an
    *     attacker could narrow below k = 10);
    *  2. winnowing dedup tier: drop the higher id of every
    *     [[Dedup.winnowPairsCapped]] pair (df-capped candidates, exact
    *     re-verified shared counts) over the SURVIVORS;
    *  3. containment tier: additionally drop higher-id documents
    *     quoted ≥ 90 % inside a surviving lower-id one
    *     ([[Dedup.containmentPairs]] — the direction Jaccard misses);
    *  4. decontamination: of what remains, the md5-bucket ≥ 'e6' slice
    *     is the held-out benchmark; train candidates (< 'cc') sharing
    *     any 8-gram with it are removed ([[decontaminate]]);
    *  5. stratified release split: exact 80/10/10 per lang
    *     ([[Sharding.assignSplitStratified]]) over the final pool;
    *  6. drift readout: (lang, split) document and character counts —
    *     the distribution monitor a release pipeline alerts on.
    * Every stage is the library operator, not a re-implementation; the
    * oracle mirrors the chain CTE-for-CTE. Plan shape: each tier is
    * banded/keyed exactly as its standalone gate, and every survivor
    * frame is MATERIALIZED once through [[graft.pipeline.Checkpointer]]
    * before fanning into its consumers (optimization guide §3.3/§5:
    * left lazy, stage k's whole subtree re-executed inside both of stage
    * k+1's branches — the un-checkpointed chain compounded to 140
    * parquet scans of `documents` in ONE plan and 2.8× the wall time;
    * the survivor frames are (id, text…) rows, so the round state is
    * small and freed as soon as the next tier lands). Values are
    * untouched — same rows, same oracle. */
  private def e2eV4(s: SparkSession, d: String): DataFrame = {
    import graft.pipeline.Checkpointer
    val docs = Tables.documents(s, d)
    val qiOk = docs
      .groupBy(col("source"), expr("n_chars div 500").as("len_b"))
      .agg(count(lit(1)).as("qn"))
      .filter(col("qn") >= 10)
      .select(col("source"), col("len_b"))
    val keep0 = Checkpointer.truncate(
      docs.withColumn("len_b", expr("n_chars div 500"))
        .join(qiOk, Seq("source", "len_b"), "left_semi")
        .drop("len_b"))
    val wdrop = graft.pipeline.Dedup
      .winnowPairsCapped(keep0, "doc_id", "text",
        n = 3, w = WinnowW, minShared = WinnowShared, maxDf = WinnowMaxDf)
      .select(col("db").as("doc_id")).distinct()
    val keep1 = Checkpointer.truncate(
      keep0.join(wdrop, Seq("doc_id"), "left_anti"))
    Checkpointer.free(keep0)
    val cdrop = graft.pipeline.Dedup
      .containmentPairs(keep1, "doc_id", "text", threshold = 0.9)
      .filter(col("contained") > col("container"))
      .select(col("contained").as("doc_id")).distinct()
    val keep2 = Checkpointer.truncate(
      keep1.join(cdrop, Seq("doc_id"), "left_anti"))
    Checkpointer.free(keep1)
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
    val contam = decontaminate(keep2, "doc_id", "text",
        isEval = bucket >= "e6", isTrain = bucket < "cc", n = 8)
      .select(col("doc_id"))
    val pool = Checkpointer.truncate(
      keep2.filter(bucket < "cc")
        .join(contam, Seq("doc_id"), "left_anti"))
    Checkpointer.free(keep2)
    val split = graft.pipeline.Sharding
      .assignSplitStratified(pool, "doc_id", "lang")
    split.join(pool.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("split"))
  }

  // winnow parameters shared with the dedup gates (DedupQueries pins the
  // same values); duplicated here as named constants so the Scala chain
  // and the oracle text below stay in lockstep
  private val WinnowW = 4
  private val WinnowShared = 2
  private val WinnowMaxDf = 64

  private val e2eV4Sql =
    s"""WITH qi AS (
       |  SELECT source, n_chars // 500 AS len_b, COUNT(*) AS qn
       |  FROM documents GROUP BY 1, 2),
       |keep0 AS (
       |  SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
       |  FROM documents d
       |  JOIN qi ON qi.source = d.source AND qi.len_b = d.n_chars // 500
       |  WHERE qi.qn >= 10),
       |whs AS (
       |  SELECT doc_id, list_transform(
       |    list_transform(
       |      range(1, len(string_split(text, ' ')) - 1),
       |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')),
       |    g -> ('0x' || substring(md5(g), 1, 15))::BIGINT) AS hs
       |  FROM keep0
       |  WHERE len(string_split(text, ' ')) >= 3),
       |wfp AS (
       |  SELECT DISTINCT doc_id, f FROM (
       |    SELECT doc_id, unnest(list_transform(
       |      range(1, greatest(len(hs) - ${WinnowW - 1}, 1) + 1),
       |      i -> list_min(hs[i:i+${WinnowW - 1}]))) AS f
       |    FROM whs)),
       |wdf AS (SELECT f, COUNT(*) AS df FROM wfp GROUP BY f),
       |wcand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM wfp a JOIN wfp b ON b.f = a.f AND a.doc_id < b.doc_id
       |  JOIN wdf ON wdf.f = a.f WHERE wdf.df <= $WinnowMaxDf),
       |wshared AS (
       |  SELECT c.da, c.db, COUNT(*) AS shared
       |  FROM wcand c
       |  JOIN wfp x ON x.doc_id = c.da
       |  JOIN wfp y ON y.doc_id = c.db AND y.f = x.f
       |  GROUP BY 1, 2),
       |wdrop AS (
       |  SELECT DISTINCT db AS doc_id FROM wshared
       |  WHERE shared >= $WinnowShared),
       |keep1 AS (
       |  SELECT * FROM keep0
       |  WHERE doc_id NOT IN (SELECT doc_id FROM wdrop)),
       |csh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(string_split(text, ' ')) - 1),
       |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS shingle
       |  FROM keep1),
       |csz AS (SELECT doc_id, COUNT(*) AS n_sh FROM csh GROUP BY doc_id),
       |cdrop AS (
       |  SELECT DISTINCT a.doc_id FROM csh a
       |  JOIN csh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
       |  JOIN csz ON csz.doc_id = a.doc_id
       |  WHERE a.doc_id > b.doc_id
       |  GROUP BY a.doc_id, b.doc_id, csz.n_sh
       |  HAVING COUNT(*)::DOUBLE / csz.n_sh >= 0.9),
       |keep2 AS (
       |  SELECT * FROM keep1
       |  WHERE doc_id NOT IN (SELECT doc_id FROM cdrop)),
       |db2 AS (
       |  SELECT *, substring(md5(doc_id::VARCHAR), 1, 2) AS bucket,
       |    string_split(text, ' ') AS ws
       |  FROM keep2),
       |dsh AS (
       |  SELECT doc_id, bucket,
       |    unnest(list_distinct(list_transform(generate_series(1, len(ws) - 7),
       |      i -> array_to_string(ws[i:i+7], ' ')))) AS sh
       |  FROM db2 WHERE len(ws) >= 8),
       |ev AS (SELECT DISTINCT sh FROM dsh WHERE bucket >= 'e6'),
       |contam AS (
       |  SELECT DISTINCT dsh.doc_id FROM dsh JOIN ev USING (sh)
       |  WHERE bucket < 'cc'),
       |pool AS (
       |  SELECT doc_id, lang, n_chars FROM db2
       |  WHERE bucket < 'cc'
       |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
       |spl AS (
       |  SELECT lang, n_chars,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS r,
       |    COUNT(*) OVER (PARTITION BY lang) AS n
       |  FROM pool)
       |SELECT lang,
       |  CASE WHEN r * 100 <= n * 80 THEN 'train'
       |       WHEN r * 100 <= n * 90 THEN 'val'
       |       ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM spl GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  private val bigramLmSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_zip(
      |    ws[1:len(ws)-1], ws[2:len(ws)])) AS p
      |  FROM toks),
      |bgf AS (
      |  SELECT doc_id, p[1] AS wl, p[2] AS wr FROM bg),
      |dc AS (SELECT doc_id, wl, wr, COUNT(*) AS k FROM bgf GROUP BY 1, 2, 3),
      |trans AS (
      |  SELECT wl, wr, CAST(SUM(k) AS BIGINT) AS cb FROM dc GROUP BY 1, 2),
      |ctx AS (SELECT wl, CAST(SUM(cb) AS BIGINT) AS cu FROM trans GROUP BY 1),
      |vocab AS (SELECT COUNT(DISTINCT wr) AS vs FROM trans),
      |e AS (
      |  SELECT dc.doc_id, dc.k,
      |    CAST(round(dc.k * log10((trans.cb + 1.0) / (ctx.cu + vocab.vs)), 9)
      |      AS DECIMAL(38,12)) AS e
      |  FROM dc JOIN trans USING (wl, wr) JOIN ctx USING (wl)
      |  CROSS JOIN vocab),
      |s AS (
      |  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_big,
      |    round(CAST(SUM(e) AS DOUBLE), 6) AS sum_lp10
      |  FROM e GROUP BY doc_id)
      |SELECT doc_id, n_big, sum_lp10,
      |  round(sum_lp10 / n_big, 6) AS avg_lp10
      |FROM s ORDER BY doc_id""".stripMargin

  private val urlRe = "https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_-]*)?"

  /** URL extraction + normalization + per-domain rollup — the provenance
    * pass of a web-scale corpus (domain-level filtering, blocklists, and
    * per-site caps all key on this). The synthetic corpus carries no
    * organic URLs, so the gate PLANTS deterministic id-derived URLs
    * (mixed-case hosts, `www.` prefixes, with/without paths — both
    * engines build the identical augmented text), extracts them by
    * regex, canonicalizes the registrable host (lowercase, strip
    * `www.`), and rolls up url/doc counts per domain.
    *
    * Scale shape: extraction and normalization are pure codegen'd regexp
    * columns (narrow); the rollup is a domain-keyed aggregate with
    * map-side combine — the shuffle carries (domain, partial counts),
    * never document text. Patterns stay in the java.regex ∩ RE2 subset. */
  private def urls(s: SparkSession, d: String): DataFrame = {
    val aug = concat(col("text"),
      lit(" visit https://WWW.Site"), (col("doc_id") % 37).cast("string"),
      lit(".example.com/p/"), col("doc_id").cast("string"),
      lit(" or http://cdn"), (col("doc_id") % 11).cast("string"),
      lit(".example.org"))
    val host = regexp_extract(col("url"), "https?://([^/]+)", 1)
    val domain = regexp_replace(lower(host), "^www\\.", "")
    Tables.documents(s, d).filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        explode(regexp_extract_all(aug, lit(urlRe), lit(0))).as("url"))
      .select(col("doc_id"), domain.as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("domain"))
  }

  private val urlsSql =
    s"""WITH a AS (
       |  SELECT doc_id,
       |    text || ' visit https://WWW.Site' || (doc_id % 37) ||
       |      '.example.com/p/' || doc_id ||
       |      ' or http://cdn' || (doc_id % 11) || '.example.org' AS aug
       |  FROM documents WHERE doc_id % 10 = 0),
       |u AS (
       |  SELECT doc_id, unnest(regexp_extract_all(aug, '$urlRe')) AS url
       |  FROM a),
       |n AS (
       |  SELECT doc_id,
       |    regexp_replace(lower(regexp_extract(url, 'https?://([^/]+)', 1)),
       |      '^www\\.', '') AS domain
       |  FROM u)
       |SELECT domain, COUNT(*) AS n_urls, COUNT(DISTINCT doc_id) AS n_docs
       |FROM n GROUP BY domain ORDER BY domain""".stripMargin

  /** Blocklist screening (the C4 badword filter): per-document count of
    * blocklisted tokens and the keep/drop decision (C4 drops a document on
    * ANY hit). The list ships as an array literal — a real badword list is
    * a few thousand entries, still literal/broadcast-sized — so the whole
    * op is one narrow codegen map stage: zero shuffle at any scale. */
  private val blocklist = Seq("slow", "error", "big")

  private def blocklistHits(s: SparkSession, d: String): DataFrame = {
    val bl = array(blocklist.map(lit): _*)
    Tables.documents(s, d).select(
      col("doc_id"),
      size(filter(TextOps.words(col("text")), t => array_contains(bl, t)))
        .as("n_blocked"))
      .withColumn("keep", (col("n_blocked") === 0).cast("int"))
      .orderBy(col("doc_id"))
  }

  private val blocklistSql = {
    val hits = "len(list_filter(string_split(text, ' '), " +
      "t -> t IN ('slow','error','big')))"
    s"""SELECT doc_id, $hits AS n_blocked,
       |  CASE WHEN $hits = 0 THEN 1 ELSE 0 END AS keep
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** DSIR importance resampling ([[graft.pipeline.Dsir]]): the raw
    * corpus tilted toward the `lang = 'en'` target slice — hashed-bigram
    * bucket models, add-one-smoothed log-ratio weights, Gumbel-top-100
    * selection on the deterministic 48-bit md5 uniform. The oracle
    * mirrors the whole chain: the same 64 md5 buckets, the same rounded
    * log-ratios, the same 1e-9-unit scaled-long term sums, the same
    * Gumbel keys. */
  private val DsirN = 100

  private def dsirQ(s: SparkSession, d: String): DataFrame =
    graft.pipeline.Dsir.selectTopN(
        Tables.documents(s, d), "doc_id", "text",
        col("lang") === "en", DsirN)
      .orderBy(col("skey").desc, col("doc_id"))

  // CTE fragment (no WITH / final SELECT) so pipeline_e2e_v3 can compose
  // the identical formulation with the JM-LM fragment
  private val dsirCtes =
    s"""d AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t
       |  FROM documents),
       |bb AS (
       |  SELECT doc_id, t,
       |    ('0x' || substring(md5(bg), 1, 4))::INT % 64 AS b
       |  FROM (
       |    SELECT doc_id, t, unnest(list_transform(range(1, len(ws)),
       |      i -> array_to_string(ws[i:i+1], ' '))) AS bg
       |    FROM d)),
       |c AS (
       |  SELECT b, COUNT(*) AS cr, CAST(SUM(t) AS BIGINT) AS ct
       |  FROM bb GROUP BY b),
       |tot AS (
       |  SELECT CAST(SUM(cr) AS BIGINT) AS rtot,
       |    CAST(SUM(ct) AS BIGINT) AS ttot FROM c),
       |lr AS (
       |  SELECT b, round(ln((ct + 1.0) / (ttot + 64.0)) -
       |    ln((cr + 1.0) / (rtot + 64.0)), 9) AS lr
       |  FROM c, tot),
       |nb AS (SELECT doc_id, b, COUNT(*) AS n FROM bb GROUP BY 1, 2),
       |lw AS (
       |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(CAST(round(n * lr.lr * 1e9, 0) AS BIGINT)) AS DOUBLE)
       |      / 1e9 AS logw
       |  FROM nb JOIN lr USING (b) GROUP BY doc_id),
       |dsel AS (
       |  SELECT doc_id, n_bigrams, logw,
       |    round(logw + round(-ln(-ln(
       |      (('0x' || substring(md5(doc_id::VARCHAR), 1, 12))::BIGINT + 0.5)
       |        / 281474976710656.0)), 9), 9) AS skey
       |  FROM lw)""".stripMargin

  private val dsirSql =
    s"""WITH $dsirCtes
       |SELECT doc_id, n_bigrams, logw, skey FROM dsel
       |ORDER BY skey DESC, doc_id LIMIT $DsirN""".stripMargin

  /** PMI collocation mining — the phrase-discovery pass of vocabulary /
    * tokenizer construction (Mikolov-style phrase merging, multi-word
    * entity detection): score each bigram by pointwise mutual
    * information `log2(p(ab) / (p(a)·p(b)))` against the corpus unigram
    * model, keep the top collocations above a count floor (PMI is
    * notoriously noisy on rare pairs — the floor is part of the
    * definition in practice).
    *
    * Scale shape: unigram and bigram counts are (word)- and (wl,wr)-
    * keyed aggregates with map-side combine (counts, never text, on the
    * wire); the two totals ride broadcast 1-row frames; the scoring
    * joins key on single words against the unigram counts (vocabulary-
    * sized, hash-joined — NOT collected); top-k is a
    * TakeOrderedAndProject sink. Determinism: all counts are exact
    * integers, the PMI is one IEEE expression rounded at 9 dp, ties
    * break on the bigram text. */
  private val PmiMinCount = 5
  private val PmiTopK = 50

  private def pmiQ(s: SparkSession, d: String): DataFrame = {
    val ws = TextOps.words(col("text"))
    val docs = Tables.documents(s, d)
    val uni = docs.select(explode(ws).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n = uni.agg(sum(col("c")).as("n"))
    val bg = docs.select(
        explode(arrays_zip(
          slice(ws, lit(1), size(ws) - 1),
          slice(ws, lit(2), size(ws) - 1))).as("p"))
      .select(col("p").getField("0").as("wl"), col("p").getField("1").as("wr"))
    val bc = bg.groupBy(col("wl"), col("wr")).agg(count(lit(1)).as("cb"))
    val nb = bc.agg(sum(col("cb")).as("nb"))
    bc.filter(col("cb") >= PmiMinCount)
      .join(uni.select(col("w").as("wl"), col("c").as("ca")), Seq("wl"))
      .join(uni.select(col("w").as("wr"), col("c").as("cd")), Seq("wr"))
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(nb))
      .select(concat(col("wl"), lit(" "), col("wr")).as("bigram"),
        col("cb"),
        round(log2((col("cb").cast("double") / col("nb")) /
          ((col("ca").cast("double") / col("n")) *
            (col("cd").cast("double") / col("n")))), 9).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(PmiTopK)
  }

  private val pmiSql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |uc AS (
       |  SELECT w, COUNT(*) AS c FROM (SELECT unnest(ws) AS w FROM toks)
       |  GROUP BY w),
       |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uc),
       |bgp AS (
       |  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS wl,
       |    unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS wr
       |  FROM toks),
       |bc AS (SELECT wl, wr, COUNT(*) AS cb FROM bgp GROUP BY 1, 2),
       |nb AS (SELECT CAST(SUM(cb) AS BIGINT) AS nb FROM bc)
       |SELECT bigram, cb, pmi FROM (
       |  SELECT bc.wl || ' ' || bc.wr AS bigram, bc.cb,
       |    round(log2((bc.cb::DOUBLE / nb.nb) /
       |      ((a.c::DOUBLE / n.n) * (d.c::DOUBLE / n.n))), 9) AS pmi
       |  FROM bc
       |  JOIN uc a ON a.w = bc.wl
       |  JOIN uc d ON d.w = bc.wr, n, nb
       |  WHERE bc.cb >= $PmiMinCount) t
       |ORDER BY pmi DESC, bigram LIMIT $PmiTopK""".stripMargin

  val caps: Seq[Capability] = Seq(
    Capability("text_tokens", "whitespace + regex token counting", tokens, Some(tokensSql)),
    Capability("text_pmi",
      "PMI collocation mining: top bigram phrases vs the unigram model",
      pmiQ, Some(pmiSql)),
    Capability("pipeline_dsir",
      "DSIR importance resampling: hashed-bigram models, Gumbel-top-k draw",
      dsirQ, Some(dsirSql)),
    Capability("text_blocklist", "blocklist screening: per-doc badword hits + keep flag (C4 filter)",
      blocklistHits, Some(blocklistSql)),
    Capability("text_repetition", "repetition quality signals: top-word/bigram + unique fractions",
      repetition, Some(repetitionSql)),
    Capability("text_pii", "PII scrubbing: regex email/phone redaction (planted contacts)",
      pii, Some(piiSql)),
    Capability("text_quality", "length/stopword/uniqueness quality score", quality, Some(qualitySql)),
    Capability("text_entropy", "character-level Shannon entropy (gibberish/degeneracy signal)",
      entropyQ, Some(entropySql)),
    Capability("text_drift",
      "per-source Jensen-Shannon drift vs the corpus token distribution",
      driftQ, Some(driftSql)),
    Capability("text_drift_bucketed",
      "bounded-state drift twin: JSD over the fixed 64-bucket token hash",
      driftBucketedQ, Some(driftBucketedSql)),
    Capability("text_tfidf",
      "per-document TF-IDF top-5 keyword extraction (smoothed idf)",
      tfidfQ, Some(tfidfSql)),
    Capability("text_gopher",
      "Gopher rule battery: word-length/symbol/bullet/ellipsis/alpha screens + keep flag",
      gopherQ, Some(gopherSql)),
    Capability("pipeline_ccnet_buckets",
      "CCNet-style perplexity bucketing: head/middle/tail by LM score quantiles",
      ccnetQ, Some(ccnetSql)),
    Capability("text_langid", "marker-word heuristic language ID", langid, Some(langidSql)),
    Capability("text_fingerprint", "portable polynomial content fingerprint", fingerprint,
      Some(fingerprintSql)),
    Capability("pipeline_vocab", "corpus vocabulary: top-k global word counts", vocab,
      Some(vocabSql)),
    Capability("pipeline_decontam", "train/test decontamination by shared 8-gram shingles", decontam,
      Some(decontamSql)),
    Capability("pipeline_decontam_bloom",
      "bloom-pruned decontamination (broadcast eval filter, exact-verified)", decontamBloom,
      Some(decontamSql), bench = true),
    Capability("text_unigram_lm",
      "corpus-trained unigram LM scoring (CCNet-style perplexity signal)", unigramLm,
      Some(unigramLmSql)),
    Capability("text_bigram_lm",
      "corpus-trained bigram LM scoring (word-order-aware perplexity signal)", bigramLm,
      Some(bigramLmSql)),
    Capability("text_jm_lm",
      s"Jelinek-Mercer interpolated bigram LM (lambda=$JmLambda bigram/unigram mixture)",
      jmLm, Some(jmLmSql)),
    Capability("pipeline_e2e_v3",
      "curation composition v3: DSIR target selection re-ranked by the JM LM",
      e2eV3, Some(e2eV3Sql)),
    Capability("pipeline_e2e_v4",
      "curation composition v4: k-anon screen > winnow+containment dedup > decontam > stratified split > drift readout",
      e2eV4, Some(e2eV4Sql)),
    Capability("text_urls",
      "URL extraction + host normalization + per-domain rollup (planted URLs)", urls,
      Some(urlsSql)),
    Capability("text_chao1",
      "Chao1 vocabulary-richness estimate per source (singleton/doubleton correction)",
      chao1, Some(chao1Sql)),
    Capability("text_gini",
      "Gini coefficient of per-source document length (exact rank formula)",
      gini, Some(giniSql)),
    Capability("text_zipf",
      "Zipf rank-frequency slope over the top-100 vocabulary (exact-moment fit)",
      zipf, Some(zipfSql)),
    Capability("text_source_overlap",
      "pairwise source vocabulary Jaccard + containment (word-keyed set join)",
      sourceOverlap, Some(sourceOverlapSql)),
    Capability("pipeline_k_anonymity",
      "k-anonymity / l-diversity privacy audit over QI groups (exact minima)",
      kAnonymity, Some(kAnonymitySql)),
    Capability("text_simpson",
      "Simpson diversity + effective vocabulary per source (integer-exact)",
      simpson, Some(simpsonSql)),
  )
}
