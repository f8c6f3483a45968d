package graft

import graft.pipeline.Sharding
import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("split assignment is deterministic and covers every row exactly once") {
    val docs = Tables.documents(spark, sf)
    val a = Sharding.assignSplit(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sharding.assignSplit(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
    assert(a.size == docs.count())
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    // md5 buckets are uniform: 80/10/10 within generous slack at n=500
    assert(counts("train").toDouble / a.size > 0.7)
    assert(counts("val") > 0 && counts("test") > 0)
  }

  test("stratified split hits EXACT per-stratum proportions, stable across runs") {
    import spark.implicits._
    // uneven strata incl. a 7-row tail where bucket thresholds would skew
    val rows = (1 to 100).map(i => (i.toLong, "en")) ++
      (101 to 137).map(i => (i.toLong, "fr")) ++
      (138 to 144).map(i => (i.toLong, "sw"))
    val df = rows.toDF("doc_id", "lang")
    val out = Sharding.assignSplitStratified(df, "doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // exact integer-floor boundaries per stratum: n=100 → 80/10/10,
    // n=37 → 29/4/4 (r*100 <= 37*80 → r <= 29; <= 37*90 → r <= 33),
    // n=7 → 5/1/1 (r <= 5.6 → 5; r <= 6.3 → 6)
    val counts = out.groupBy(t => (t._2, t._3)).view.mapValues(_.length).toMap
    assert(counts(("en", "train")) == 80 && counts(("en", "val")) == 10 &&
      counts(("en", "test")) == 10, counts.toString)
    assert(counts(("fr", "train")) == 29 && counts(("fr", "val")) == 4 &&
      counts(("fr", "test")) == 4, counts.toString)
    assert(counts(("sw", "train")) == 5 && counts(("sw", "val")) == 1 &&
      counts(("sw", "test")) == 1, counts.toString)
    // pure function of the data: identical on a re-run and per row
    val again = Sharding.assignSplitStratified(df, "doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // degenerate percentages rejected
    intercept[IllegalArgumentException] {
      Sharding.assignSplitStratified(df, "doc_id", "lang", 90, 20)
    }
  }

  test("packing lays shards out contiguously with in-window offsets") {
    val docs = Tables.documents(spark, sf)
    val ctx = 2048
    val out = Sharding.packSequences(
      docs, "doc_id", size(TextOps.words(col("text"))), ctx)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length == docs.count())
    out.foreach { case (_, _, nTok, cum, seqId, off) =>
      assert(off >= 0 && off < ctx)            // start offset is in-window
      assert(seqId * ctx + off == cum - nTok)  // seq/offset decompose the start
    }
    // within a shard, ordering by doc_id gives contiguous cumulative sums
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.foldLeft(0L) { case (prevCum, (_, _, nTok, cum, _, _)) =>
        assert(cum == prevCum + nTok); cum
      }
    }
  }

  test("weighted sampling hits target rates, is nested across rates and layout-free") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val total = docs.count().toDouble
    def kept(rate: Double): Set[Long] =
      Sharding.weightedSample(docs, "doc_id", "lang",
        Map.empty, defaultRate = rate)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val half = kept(0.5); val quarter = kept(0.25); val all = kept(1.0)
    assert(all.size == total.toLong, "rate 1.0 keeps every row")
    // uniform lottery: observed rate within ±5 points of target
    assert(math.abs(half.size / total - 0.5) < 0.05, s"got ${half.size / total}")
    assert(math.abs(quarter.size / total - 0.25) < 0.05)
    // NESTED: a row kept at 0.25 is kept at 0.5 (same draw, higher bar)
    assert(quarter.subsetOf(half))
    // per-key rates apply to the right keys
    val mixed = Sharding.weightedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "zh" -> 0.0), defaultRate = 0.5)
    val byLang = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == totals("en"), "rate 1.0 keeps all of en")
    assert(!byLang.contains("zh"), "rate 0.0 drops all of zh")
    // layout-independent: same winners under a different partitioning
    val repart = Sharding.weightedSample(
      docs.repartition(7, col("lang")), "doc_id", "lang",
      Map.empty, defaultRate = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repart == half)
    intercept[IllegalArgumentException] {
      Sharding.weightedSample(docs, "doc_id", "lang", Map("en" -> 1.5))
    }
  }

  test("seeded shuffle is a stable permutation; a new seed reorders it") {
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
    def order(seed: String): Seq[Long] =
      Sharding.shuffleOrder(ids, "doc_id", seed)
        .orderBy(col("shard"), col("shuffle_pos"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val a = order("s42")
    // a permutation: every doc exactly once, stable across runs
    assert(a.sorted == a.distinct.sorted && a.size == ids.count())
    assert(a == order("s42"))
    val b = order("s43")
    assert(a != b && a.sorted == b.sorted)
    // within every shard, positions are dense 0..n-1
    val dense = Sharding.shuffleOrder(ids, "doc_id", "s42")
      .groupBy(col("shard"))
      .agg(min(col("shuffle_pos")).as("lo"), max(col("shuffle_pos")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
    dense.foreach { r =>
      assert(r.getInt(1) == 0 && r.getInt(2).toLong == r.getLong(3) - 1)
    }
  }

  test("shuffle: the global permutation is identical at every shard width") {
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
    def order(width: Int): Seq[Long] =
      Sharding.shuffleOrder(ids, "doc_id", "s42", shardHexChars = width)
        .orderBy(col("shard"), col("shuffle_pos"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    // shards are md5-key prefixes: (shard, pos-within-shard) order is the
    // plain key order at ANY width — widening only adds sort parallelism
    val w1 = order(1)
    assert(w1 == order(2) && w1 == order(3))
    intercept[IllegalArgumentException] {
      Sharding.shuffleOrder(ids, "doc_id", "s42", shardHexChars = 5)
    }
  }

  test("packing: wider shards split sorts without changing in-shard layout") {
    val docs = Tables.documents(spark, sf)
    val toks = size(TextOps.words(col("text")))
    val w1 = Sharding.packSequences(docs, "doc_id", toks, 2048, shardHexChars = 1)
      .select(col("doc_id"), col("shard"), col("cum_tok")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val w2 = Sharding.packSequences(docs, "doc_id", toks, 2048, shardHexChars = 2)
      .select(col("doc_id"), col("shard"), col("cum_tok")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // width-2 shards refine width-1 shards: same count, prefix-compatible
    assert(w1.length == w2.length)
    val shard1 = w1.map(r => r._1 -> r._2).toMap
    w2.foreach { case (id, sh2, _) => assert(sh2.startsWith(shard1(id))) }
  }

  test("operators refuse inputs that already carry their reserved columns") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"))
    intercept[IllegalArgumentException] {
      Sharding.shuffleOrder(docs.withColumn("shuffle_key", lit("x")),
        "doc_id", "s")
    }
    intercept[IllegalArgumentException] {
      Sharding.capPerGroup(docs.withColumn("cap_rank", lit(1)),
        "cap_rank", "doc_id", 3)
    }
    intercept[IllegalArgumentException] {
      Sharding.packSequences(docs.withColumnRenamed("doc_id", "shard"),
        "shard", lit(1))
    }
  }

  test("per-group cap keeps at most k, deterministically, layout-independent") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    val k = 7
    def winners(df: org.apache.spark.sql.DataFrame): Map[String, Set[Long]] =
      Sharding.capPerGroup(df, "source", "doc_id", k).collect()
        .map(r => (r.getString(1), r.getLong(0)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val a = winners(docs)
    val b = winners(docs.repartition(7, col("doc_id"))) // different layout
    assert(a == b, "cap winners must not depend on partitioning")
    a.foreach { case (_, ids) => assert(ids.size <= k) }
    // groups larger than k are capped exactly at k
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      assert(a(src).size == math.min(n, k.toLong))
    }
  }

  test("upsert: latest version wins, update beats base on version ties") {
    import spark.implicits._
    import graft.pipeline.Maintenance
    val base = Seq((1L, "a", 3L), (2L, "b", 1L), (3L, "c", 0L))
      .toDF("id", "text", "version")
    val updates = Seq(
      (1L, "a2", 2L), // older than base v3 → base survives
      (2L, "b2", 1L), // same version → update wins the tie
      (4L, "d", 0L))  // new id → inserted
      .toDF("id", "text", "version")
    val out = Maintenance.upsert(base, updates, "id", "version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toList
    assert(out == List((1L, "a", 3L), (2L, "b2", 1L), (3L, "c", 0L), (4L, "d", 0L)))
    // schema mismatch is rejected loudly
    intercept[IllegalArgumentException] {
      Maintenance.upsert(base, updates.drop("version"), "id", "version")
    }
  }

  test("scd2: intervals chain per id, ties resolve pre-history, PIT lookup works") {
    import spark.implicits._
    import graft.pipeline.Maintenance
    val base = Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("id", "text", "version")
    val updates = Seq(
      (1L, "a1", 1L), (1L, "a2", 3L), // two revisions → 3-row history
      (2L, "b0", 0L))                 // version-0 collision → update wins
      .toDF("id", "text", "version")
    val h = Maintenance.scd2(base, updates, "id", "version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5)))
      .sortBy(t => (t._1, t._3)).toList
    assert(h == List(
      (1L, "a", 0L, 0L, Some(1L), false),
      (1L, "a1", 1L, 1L, Some(3L), false),
      (1L, "a2", 3L, 3L, None, true),
      (2L, "b0", 0L, 0L, None, true)), h.toString)
    // point-in-time lookup at t=2: interval containment finds the row
    // the SCD-1 upsert over versions <= 2 would keep
    val hist = Maintenance.scd2(base, updates, "id", "version")
    val pit = hist.filter(col("valid_from") <= 2L &&
        (col("valid_to").isNull || col("valid_to") > 2L))
      .select(col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val scd1 = Maintenance.upsert(base,
        updates.filter(col("version") <= 2L), "id", "version")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pit == scd1, s"$pit vs $scd1")
  }

  test("snapshot diff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    import graft.pipeline.Maintenance
    val before = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "text")
    val after = Seq((2L, "y"), (3L, "z2"), (4L, "w")).toDF("id", "text")
    val out = Maintenance.snapshotDiff(before, after, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toList
    assert(out == List((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added")))
  }

  test("token budget admits rows in lottery order until the budget line crosses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one key, equal 10-token docs, budget 25: the first THREE admitted
    // docs (in md5 order) cover 10/20/30 cumulative — the 30 crosses the
    // line and is the last admitted; the fourth (cum 40, start 30) is out
    val df = Seq((1L, "k"), (2L, "k"), (3L, "k"), (4L, "k")).toDF("id", "key")
    val out = Sharding.tokenBudget(df, "id", "key", lit(10), budget = 25L)
      .select(col("id"), col("cum_tok")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 3)
    assert(out.values.toSet == Set(10L, 20L, 30L))
    // deterministic: the admitted ids are the md5-smallest three
    val lottery = Seq(1L, 2L, 3L, 4L).sortBy(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(out.keySet == lottery.take(3).toSet)
  }

  test("heap-based cap selects exactly the window-based cap's rows") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    def kept(df: org.apache.spark.sql.DataFrame) = df
      .select(col("source"), col("doc_id"), col("cap_rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val window = kept(Sharding.capPerGroup(docs, "source", "doc_id", 7)
      .select(col("source"), col("doc_id"), col("cap_rank").cast("int").as("cap_rank")))
    val heap = kept(Sharding.capPerGroupTopK(docs, "source", "doc_id", 7))
    assert(window == heap)
    assert(heap.nonEmpty)
  }

  test("leak-free split keys on the group: one split per source, zero shuffle") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val out = Sharding.assignSplitLeakFree(docs, "doc_id", "source")
    // every source maps to exactly one split — no doc of a site can leak
    // across the eval boundary
    val perSource = out.groupBy(col("source"))
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(perSource == 0)
    assert(out.count() == docs.count())
    assert(out.select(col("split")).distinct().count() >= 2,
      "the corpus should spread over more than one split")
    // the assignment is a narrow projection — no exchange in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("weighted top-n equals its window formulation; bad weights never win") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val heap = Sharding.weightedTopN(docs, "lang", "doc_id", "n_chars", 5)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2))).toSet
    // window twin computed inline with the identical key
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("double") + 0.5) / lit(281474976710656.0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy((-log(u) / col("n_chars").cast("double")).asc, col("doc_id"))
    val window = docs
      .withColumn("ws_rank", row_number().over(w).cast("int"))
      .filter(col("ws_rank") <= 5)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3))).toSet
    assert(heap == window)
    assert(heap.nonEmpty)
    // layout independence
    val re = Sharding.weightedTopN(docs.repartition(13), "lang", "doc_id", "n_chars", 5)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2))).toSet
    assert(re == heap)
    // null/zero/negative weights are excluded BEFORE the draw — even
    // when the group is smaller than n, they must not surface
    val mixed = Seq(
      (1L, "g", Some(10L)), (2L, "g", Some(1L)), (3L, "g", Some(0L)),
      (4L, "g", None), (5L, "g", Some(-3L)), (6L, "g", Some(5L)))
      .toDF("id", "g", "w")
    val picked = Sharding.weightedTopN(mixed, "g", "id", "w", 3)
      .collect().map(_.getLong(0)).toSet
    assert(picked == Set(1L, 2L, 6L), s"picked $picked")
    val undersized = Sharding.weightedTopN(mixed, "g", "id", "w", 5)
      .collect().map(_.getLong(0)).toSet
    assert(undersized == Set(1L, 2L, 6L),
      s"bad weights must not fill an undersized group: $undersized")
  }

  test("temperature mix: proportional at alpha 1, uniform at 0, caps and fills") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // groups of 16 / 4 / 2 rows
    val rows = ((1 to 16).map(i => (i.toLong, "big")) ++
      (21 to 24).map(i => (i.toLong, "mid")) ++
      (31 to 32).map(i => (i.toLong, "small"))).toDF("id", "g")
    def targets(alpha: Double, total: Int): Map[String, Long] =
      graft.pipeline.Sharding.temperatureMix(rows, "g", "id", alpha, total)
        .groupBy(col("g")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha 1: shares follow the population exactly (11 = 16/22 * 11 etc.)
    val prop = targets(1.0, 11)
    assert(prop.values.sum == 11)
    assert(prop("big") == 8 && prop("mid") == 2 && prop("small") == 1, prop.toString)
    // alpha 0: uniform thirds
    val unif = targets(0.0, 6)
    assert(unif == Map("big" -> 2L, "mid" -> 2L, "small" -> 2L), unif.toString)
    // an oversubscribed tiny group is capped at its population — the
    // result honestly falls short of `total` rather than re-normalizing
    val capped = targets(0.0, 21)
    assert(capped("small") == 2 && capped.values.sum < 21, capped.toString)
    // feasible demands fill exactly
    assert(targets(0.5, 10).values.sum == 10)
  }

  test("token budget admits the same rows under any input layout") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = (1L to 200L).map(i => (i, s"k${i % 5}", 5 + (i % 7))).toDF("id", "key", "tok")
    def admitted(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sharding.tokenBudget(df, "id", "key", col("tok"), budget = 60L)
        .select(col("id")).collect().map(_.getLong(0)).toSet
    val a = admitted(base.repartition(1))
    val b = admitted(base.repartition(13, col("tok")))
    val c = admitted(base.orderBy(col("id").desc))
    assert(a == b && b == c, "admitted set must be layout-independent")
    assert(a.nonEmpty && a.size < 200)
  }

  test("threshold cut keeps every row tied at the cutoff value") {
    import spark.implicits._
    // values 1..10, keepFrac 0.3 → cutoff = quantile(0.7) = 7.3; kept
    // are 8,9,10; with duplicates AT a cutoff value all stay
    val df = (1 to 10).map(_.toLong).toDF("v")
    val kept = Sharding.thresholdCut(df, "v", 0.3)
      .collect().map(_.getLong(0)).sorted.toList
    assert(kept == List(8L, 9L, 10L))
    val dup = Seq(1L, 5L, 5L, 5L, 9L).toDF("v")
    // quantile(0.5) of (1,5,5,5,9) = 5 → all three 5s survive a 0.5 cut
    val keptDup = Sharding.thresholdCut(dup, "v", 0.5)
      .collect().map(_.getLong(0)).sorted.toList
    assert(keptDup == List(5L, 5L, 5L, 9L))
  }
}
