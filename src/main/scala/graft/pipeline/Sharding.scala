package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sharding primitives for training-data pipelines:
  * content-hash dataset splits and token-budget sequence packing.
  *
  * Both key on `md5(id)` rather than `rand()`: the assignment is a pure
  * function of the record id, so it is reproducible across runs, engines
  * and cluster layouts (the DuckDB oracles compute the identical md5), and
  * it never needs a seed to be carried around. At 100 TB both ops are a
  * single narrow projection (split) or one hash-partitioned window (pack) —
  * no global coordination.
  */
object Sharding {

  /** Two-hex-digit md5 bucket (256 buckets) of the id column — the unit of
    * split assignment. */
  private def bucket2(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 2)

  /** Guard the columns an operator is about to introduce: failing loudly
    * beats silently overwriting (or colliding with) a caller's column of
    * the same name — the same contract as `Skew.saltedJoin`'s `__salt`. */
  private def requireFresh(df: DataFrame, names: String*): Unit =
    names.foreach { n =>
      require(!df.columns.contains(n),
        s"Sharding reserves the '$n' column; rename it on the input first")
    }

  /** Validate an md5-prefix shard width: 1-4 hex chars → 16/256/4096/65536
    * shards. Rule of thumb: one shard is what ONE task should sort, so
    * pick the width where corpus_bytes / 16^width ≈ a few hundred MB —
    * width 1 for gate-scale fixtures, 2-3 at production TB, 4 at 100 TB. */
  private def requireWidth(shardHexChars: Int): Unit =
    require(shardHexChars >= 1 && shardHexChars <= 4,
      s"shardHexChars must be 1..4 (16..65536 shards), got $shardHexChars")

  /** Deterministic train/val/test split by md5 bucket. Boundaries are
    * two-hex-digit strings compared lexicographically ("cc" → 204/256 ≈
    * 80% train, "e6" → 26/256 ≈ 10% val, rest test); any row set, on any
    * engine, splits identically. Narrow projection — zero shuffle. */
  def assignSplit(
      df: DataFrame, idCol: String,
      trainUpper: String = "cc", valUpper: String = "e6"): DataFrame = {
    requireFresh(df.select(col(idCol)), "bucket", "split")
    df.select(col(idCol), bucket2(col(idCol)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainUpper, "train")
          .when(col("bucket") < valUpper, "val")
          .otherwise("test"))
  }

  /** Leakage-controlled train/val/test split: the md5 bucket is computed
    * on `groupCol` (a domain, site, or source key) instead of the row id,
    * so EVERY row sharing that key lands in the SAME split — the standard
    * guard against near-duplicate leakage across the eval boundary
    * (same-site boilerplate and templated pages are the canonical
    * offenders; a row-level split puts sister pages on both sides of the
    * test line). Same contract as [[assignSplit]] otherwise: pure
    * function of the data, engine-independent, narrow projection, zero
    * shuffle — no distinct() over the keys, no join back. */
  def assignSplitLeakFree(
      df: DataFrame, idCol: String, groupCol: String,
      trainUpper: String = "cc", valUpper: String = "e6"): DataFrame = {
    requireFresh(df.select(col(idCol), col(groupCol)), "bucket", "split")
    df.select(col(idCol), col(groupCol),
      bucket2(col(groupCol)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainUpper, "train")
          .when(col("bucket") < valUpper, "val")
          .otherwise("test"))
  }

  /** EXACT-proportion stratified split: within every stratum (language,
    * source, domain class) rows are ranked by `md5(id)` and the first
    * `trainPct`% land in train, the next `valPct`% in val, the rest in
    * test — integer-exact boundaries (`r·100 ≤ n·pct`), so a 300-row
    * stratum yields exactly 240/30/30 where [[assignSplit]]'s global
    * bucket thresholds only hit the ratios in expectation (a rare
    * language with 40 rows can easily land 33/1/6 there — the skew this
    * operator exists to kill). Still a pure function of the data: the
    * md5 order is engine-independent (id tiebreak), no seed, no rand().
    *
    * Cost: one stratum-keyed exchange serving both windows (rank and
    * per-stratum count share the partition key) — 100 TB-safe as long
    * as no single stratum outweighs an executor; for a corpus that is
    * 90% one language, split THAT stratum by [[assignSplit]] buckets
    * and reserve exact ranking for the tail strata where the exactness
    * matters. */
  def assignSplitStratified(
      df: DataFrame, idCol: String, strataCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"percentages must satisfy 0 < train, 0 <= val, train+val <= 100; " +
        s"got train=$trainPct val=$valPct")
    requireFresh(df.select(col(idCol), col(strataCol)), "split")
    val byStratum = Window.partitionBy(col(strataCol))
    val r = row_number().over(
      byStratum.orderBy(md5(col(idCol).cast("string")), col(idCol)))
    val n = count(lit(1)).over(byStratum)
    df.select(col(idCol), col(strataCol))
      .withColumn("split",
        when(r * 100 <= n * trainPct, "train")
          .when(r * 100 <= n * (trainPct + valPct), "val")
          .otherwise("test"))
  }

  /** Greedy offset-based packing of documents into fixed `ctxTokens`
    * windows, sharded by the first `shardHexChars` md5 hex digits of the
    * id (16^width shards — see [[requireWidth]] for choosing the width
    * from data volume).
    *
    * Within a shard, documents are laid out in id order at their running
    * token offset; `seq_id` is the context window the document STARTS in
    * (floor(start_offset / ctxTokens)) and `seq_offset` its position
    * within that window. This is the standard approximate packing for LLM
    * pre-training batches: one hash-partitioned sort per shard, no global
    * window (a single unpartitioned ORDER BY would serialize the whole
    * corpus through one task — the shard key is what makes this a
    * 100 TB-safe plan; more shards = more parallelism, identical
    * per-shard layout). */
  def packSequences(
      df: DataFrame, idCol: String, tokCol: Column,
      ctxTokens: Int = 2048, shardHexChars: Int = 1): DataFrame = {
    requireWidth(shardHexChars)
    requireFresh(df.select(col(idCol)),
      "shard", "n_tok", "cum_tok", "start_off", "seq_id", "seq_offset")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
      col(idCol),
      substring(md5(col(idCol).cast("string")), 1, shardHexChars).as("shard"),
      tokCol.cast("bigint").as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("start_off", col("cum_tok") - col("n_tok"))
      .withColumn("seq_id", expr(s"start_off div ${ctxTokens.toLong}"))
      .withColumn("seq_offset", col("start_off") - col("seq_id") * ctxTokens)
      .drop("start_off")
  }

  /** Cap each group (e.g. a source domain) at `k` documents, chosen by a
    * deterministic content-free lottery: rank within the group by
    * `md5(id)` (ties broken by the id itself) and keep ranks ≤ k. Because
    * the md5 order is a pure function of the id, the SAME k rows win on
    * any engine, any run, any partitioning — it is a seedless uniform
    * sample. This is the standard corpus-curation "domain cap" that stops
    * a handful of crawl domains from dominating a training mix.
    *
    * One hash-partitioned window over the caller's frame — the shuffle
    * carries whatever columns `df` has, so at scale project down to
    * (group, id) first and join the winners back by id (the gated query
    * pre-projects exactly so). Holds at 100 TB as long as single groups
    * fit a partition's spill; for pathological mega-groups, pre-filter
    * with a cheap `rand()`-free bucket cut on the same md5 before
    * ranking. */
  def capPerGroup(
      df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    requireFresh(df, "cap_rank")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= k)
  }

  /** Data MIXING: deterministic weighted per-key downsampling — the
    * corpus-curation pass that rebalances a training mix toward target
    * source/language proportions ("keep all of en, half of zh, an eighth
    * of de"). Each row's acceptance is decided by comparing its first
    * four md5 hex digits (a uniform 16-bit lottery draw, same family as
    * [[assignSplit]]) against the key's rate threshold — a pure function
    * of the id, so the SAME rows survive on any engine, any run, any
    * partitioning, and the sampled sets are NESTED across rates (a row
    * kept at 0.25 is kept at 0.5). Narrow filter — zero shuffle at any
    * scale. */
  def weightedSample(
      df: DataFrame, idCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    def hex4(rate: Double): String = {
      require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
      val t = math.round(rate * 65536).toInt
      // md5 hex digits never reach 'g': "zzzz" compares above every draw
      if (t >= 65536) "zzzz" else f"$t%04x"
    }
    val draw = substring(md5(col(idCol).cast("string")), 1, 4)
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(hex4(defaultRate))) {
      case (acc, (k, r)) => when(col(keyCol) === k, lit(hex4(r))).otherwise(acc)
    }
    df.filter(draw < threshold)
  }

  /** Deterministic corpus SHUFFLE: the seeded global permutation every
    * training run applies before reading the corpus in order. The
    * permutation key is md5(seed ++ id) — reshuffling is changing the
    * seed, and any engine reproduces the same order. The order is
    * materialized hierarchically, the way shuffled shards are actually
    * consumed: the key's first `shardHexChars` hex digits assign one of
    * 16^width shards, and `shuffle_pos` ranks within the shard — ONE hash
    * exchange (the shard window), never a global single-reducer sort;
    * readers stream shards in lexicographic order, each internally
    * shuffled.
    *
    * The GLOBAL permutation (read shards in shard order, rows by
    * `shuffle_pos` within each) is IDENTICAL at every width — shards are
    * key prefixes, so (shard, shuffle_key) order equals plain
    * `shuffle_key` order; widening only raises sort parallelism. Pick the
    * width per [[requireWidth]]'s rule of thumb: at 100 TB, width 1 would
    * mean ~6 TB per in-partition sort; width 3-4 keeps a shard inside one
    * task's spill budget. */
  def shuffleOrder(
      df: DataFrame, idCol: String, seed: String,
      shardHexChars: Int = 1): DataFrame = {
    requireWidth(shardHexChars)
    requireFresh(df, "shuffle_key", "shard", "shuffle_pos")
    val key = md5(concat(lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col(idCol))
    df.withColumn("shuffle_key", key)
      .withColumn("shard", substring(col("shuffle_key"), 1, shardHexChars))
      .withColumn("shuffle_pos", row_number().over(w) - 1)
  }

  /** k-bounded-shuffle variant of [[capPerGroup]]: the same md5-lottery
    * selection computed through [[graft.functions.expr.TopKAgg]]'s
    * bounded heap — each map task ships AT MOST k (draw, id) pairs per
    * group across the exchange instead of shuffling every row to a
    * per-group window sort, which is the difference between shuffling
    * k·groups rows and shuffling the corpus at 100 TB. The draw is the
    * first 12 md5 hex digits as a 48-bit integer — exactly representable
    * in the heap's IEEE-double score, negated because the lottery keeps
    * the SMALLEST draw; draws tie only on a 2^-48 prefix collision,
    * broken by id. Selection equals a window ordered by
    * (md5-prefix, id); the gated query's oracle mirrors that order. */
  def capPerGroupTopK(
      df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    requireFresh(df, "cap_rank")
    val draw =
      graft.functions.expr.Md5Prefix(col(idCol).cast("string"), 12)
    df.select(col(groupCol), col(idCol))
      .withColumn("__draw", -draw.cast("double"))
      .groupBy(col(groupCol))
      .agg(graft.functions.expr.TopKAgg(
        col("__draw"), col(idCol).cast("long"), k).as("__tk"))
      .select(col(groupCol), posexplode(col("__tk")))
      .select(col("col.rid").as(idCol), col(groupCol),
        (col("pos") + 1).cast("int").as("cap_rank"))
  }

  /** Weight-proportional sample of exactly `n` rows per group WITHOUT
    * replacement (Efraimidis–Spirakis 2006): each row draws the
    * deterministic 48-bit md5 uniform `u = (prefix48 + 0.5) / 2^48` and
    * competes on the exponential key `-ln(u) / w` — the n SMALLEST keys
    * per group win, which selects with probability proportional to
    * `weightCol` without ever materializing cumulative weights. This is
    * the weighted counterpart of [[capPerGroupTopK]] (uniform lottery)
    * and of [[weightedSample]] (Bernoulli RATE thinning — that one keeps
    * a random fraction, this one keeps an exact count).
    *
    * Same k-bounded-shuffle shape: the key feeds
    * [[graft.functions.expr.TopKAgg]]'s mergeable bounded heap, so each
    * map task ships at most n (key, id) pairs per group across the ONE
    * exchange — n·groups rows, never the corpus. Ties (2^-48 prefix
    * collisions at equal weight) break by id; rows with
    * non-positive/null weight are excluded before the draw (zero weight
    * means zero selection probability — they must not surface even in a
    * group smaller than n).
    *
    * Determinism: u is exact in a double (48 bits), the key is one
    * `ln`/divide on identical inputs, and selection equals a window
    * ordered by (key, id) — the gated query's oracle computes the
    * identical key in DuckDB. */
  def weightedTopN(
      df: DataFrame, groupCol: String, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"weightedTopN needs n >= 1, got $n")
    requireFresh(df, "ws_rank")
    // 48-bit prefix + 0.5, over 2^48: u in (0, 1), exact in a double
    val u = (graft.functions.expr.Md5Prefix(col(idCol).cast("string"), 12)
      .cast("double") + 0.5) / lit(281474976710656.0)
    val key = -log(u) / col(weightCol).cast("double")
    df.select(col(groupCol), col(idCol), col(weightCol))
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__wkey", -key) // heap keeps LARGEST score = smallest key
      .groupBy(col(groupCol))
      .agg(graft.functions.expr.TopKAgg(
        col("__wkey"), col(idCol).cast("long"), n).as("__tk"))
      .select(col(groupCol), posexplode(col("__tk")))
      .select(col("col.rid").as(idCol), col(groupCol),
        (col("pos") + 1).cast("int").as("ws_rank"))
  }

  /** Temperature-weighted mixture sampling (the T5/mT5 recipe): draw a
    * `total`-row corpus whose per-group share is proportional to
    * `n_g^alpha` — alpha 1 reproduces natural proportions, alpha 0 is
    * uniform-per-group, the 0.2–0.7 range up-samples small groups the
    * way multilingual pretraining mixes do. Targets come from the
    * largest-remainder method (floor(total·w_g) + the biggest
    * remainders take the leftover — deterministic, ties on the group
    * key), capped at each group's population (an oversubscribed tiny
    * group yields what it has; the result can then be < total, which is
    * the honest outcome — document shortfall rather than silently
    * re-normalize). Row selection inside a group is the md5 lottery.
    *
    * Scale shape: one count aggregate; the allocation math runs on the
    * #groups-row frame (windows over a bounded frame — the frame IS the
    * allocation table); selection is one group-keyed window rank over
    * the corpus with the tiny target table broadcast back. */
  def temperatureMix(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, total: Int): DataFrame = {
    require(alpha >= 0.0, s"alpha must be >= 0, got $alpha")
    require(total >= 1, s"total must be >= 1, got $total")
    requireFresh(df, "mix_rank")
    val c = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val sumW = c.agg(sum(pow(col("__n"), alpha)).as("__sw"))
    val alloc = c.crossJoin(broadcast(sumW))
      .withColumn("__w", pow(col("__n"), alpha) / col("__sw"))
      .withColumn("__base", floor(lit(total) * col("__w")))
      .withColumn("__rem", lit(total) * col("__w") - col("__base"))
    val deficit = alloc.agg((lit(total) - sum(col("__base"))).cast("long")
      .as("__deficit"))
    val wRem = Window.orderBy(col("__rem").desc, col(groupCol))
    val targets = alloc.crossJoin(broadcast(deficit))
      .withColumn("__rk", row_number().over(wRem))
      .withColumn("__tgt",
        least(col("__n"),
          col("__base").cast("long") +
            when(col("__rk") <= col("__deficit"), 1L).otherwise(0L)))
      .select(col(groupCol), col("__tgt"))
    val wSel = Window.partitionBy(col(groupCol))
      .orderBy(substring(md5(col(idCol).cast("string")), 1, 12), col(idCol))
    df.select(col(groupCol), col(idCol))
      .withColumn("mix_rank", row_number().over(wSel).cast("int"))
      .join(broadcast(targets), Seq(groupCol))
      .filter(col("mix_rank") <= col("__tgt"))
      .select(col(idCol), col(groupCol), col("mix_rank"))
  }

  /** Global fractional selection WITHOUT a global sort: keep the rows whose
    * `metricCol` is at or above the corpus-wide `1 - keepFrac` quantile
    * (e.g. keepFrac 0.3 → the "top 30 % by quality/length" curation cut).
    * The cutoff comes from [[graft.operators.Quantiles.exact]] — a
    * range-partitioned sort of the single metric column plus a bounded
    * driver fetch of two bracketing rows — and is then applied as a narrow
    * broadcast-scalar filter, so the corpus itself is never globally
    * sorted or ranked. Ties AT the cutoff are all kept (>=), making the
    * kept set a pure function of the data (may slightly exceed keepFrac
    * when the cutoff value repeats). At 100 TB, seed the exact pass with
    * an `approx_percentile` bracket first if the metric column itself is
    * too large to sort comfortably. */
  def thresholdCut(
      df: DataFrame, metricCol: String, keepFrac: Double): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0,
      s"keepFrac must be in (0,1], got $keepFrac")
    val cutoff =
      graft.operators.Quantiles.exact(df, metricCol, Seq(1.0 - keepFrac)).head
    df.filter(col(metricCol) >= cutoff)
  }

  /** Per-key token-budget capping: the mixing pass that downsamples each
    * source to a TOKEN budget rather than a row count ([[capPerGroup]]'s
    * sibling — training mixes are specified in tokens). Rows are admitted
    * in the deterministic md5(id) lottery order until the key's cumulative
    * token count reaches `budget`; the row that crosses the budget line is
    * the last one admitted (so every key reaches ≥ budget tokens when it
    * has them). One hash-partitioned window per key — at scale, project to
    * (key, id, n_tok) first and join winners back by id, exactly as the
    * [[capPerGroup]] scale note prescribes. */
  def tokenBudget(
      df: DataFrame, idCol: String, keyCol: String, tokens: Column,
      budget: Long): DataFrame = {
    requireFresh(df, "n_tok", "cum_tok")
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("n_tok", tokens.cast("long"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") - col("n_tok") < budget)
  }
}
