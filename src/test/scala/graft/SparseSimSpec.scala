package graft

import graft.pipeline.SparseSim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SparseSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("dot products and ranks match hand computation") {
    // d0 = {a:2, b:1}, d1 = {a:1, c:1}, d2 = {b:2}, d3 = {a:1, b:1, c:1}
    val docs = corpus(
      0L -> "a a b", 1L -> "a c", 2L -> "b b", 3L -> "a b c")
    val out = SparseSim.topKDot(docs, "doc_id", "text", k = 3,
        queryPred = col("id") === 0L)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // dot(d0,d1)=2, dot(d0,d2)=2, dot(d0,d3)=3 → d3 first, then tie 1<2
    assert(out.toSeq == Seq((0L, 1, 3L, 3L), (0L, 2, 1L, 2L), (0L, 3, 2L, 2L)))
  }

  test("maxDfFrac drops a dimension present in more than the fraction of docs") {
    // "x" is in 3 of 4 docs (df 0.75) — capped at 0.5 it must not score;
    // without the cap it dominates
    val docs = corpus(
      0L -> "x q", 1L -> "x x x", 2L -> "x q", 3L -> "z")
    val capped = SparseSim.topKDot(docs, "doc_id", "text", k = 3,
        queryPred = col("id") === 0L, maxDfFrac = Some(0.5))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // only "q" survives (df 2/4 = 0.5 ≤ 0.5): d2 shares it, dot 1
    assert(capped.toSeq == Seq((2L, 1L)))
    val uncapped = SparseSim.topKDot(docs, "doc_id", "text", k = 3,
        queryPred = col("id") === 0L)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(uncapped.head == ((1L, 3L)), "x-heavy doc must win uncapped")
  }

  test("inverted-index result equals brute-force dots on the real corpus") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val got = SparseSim.topKDot(docs, "doc_id", "text", k = 5,
        queryPred = col("id") < 5L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    // brute force: materialize tf maps and do the O(Q·N) products locally
    val tfs = docs.collect().map { r =>
      val id = r.getLong(0)
      val tf = r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, a) => t -> a.length.toLong }
      id -> tf
    }.toMap
    val expected = (for {
      q <- tfs.keys.filter(_ < 5L)
      scored = tfs.collect { case (d, dtf) if d != q =>
        val dot = tfs(q).iterator
          .map { case (t, w) => w * dtf.getOrElse(t, 0L) }.sum
        (d, dot)
      }.filter(_._2 > 0).toSeq
      ranked = scored.sortBy { case (d, dot) => (-dot, d) }.take(5)
      ((d, dot), i) <- ranked.zipWithIndex
    } yield (q, i + 1, d, dot)).toSeq.sorted
    assert(got == expected)
  }

  test("plan: query side broadcasts, dot aggregate combines map-side") {
    val df = SparseSim.topKDot(Tables.documents(spark, sf), "doc_id", "text",
      k = 5, queryPred = col("id") < 5L, maxDfFrac = Some(0.5))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // partial + final HashAggregate pair around the (query, neighbor) exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(3000))
  }

  test("bm25: rare terms outrank common terms, longer docs are normalized down") {
    // query d0 = {rare, common}; d1 matches only "rare" (df 2/5),
    // d2 matches only "common" (df 4/5): idf(rare) > idf(common) and both
    // candidate docs have identical length → d1 must outrank d2
    val docs = corpus(
      0L -> "rare common",
      1L -> "rare filler1",
      2L -> "common filler2",
      3L -> "common x1",
      4L -> "common y1")
    val out = SparseSim.topKBm25(docs, "doc_id", "text", k = 4,
        queryPred = col("id") === 0L)
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.head._2 == 1L, out.mkString(","))
    // length normalization: same tf of the same term, shorter doc wins
    val docs2 = corpus(
      0L -> "t",
      1L -> "t pad pad pad pad pad pad pad",
      2L -> "t q")
    val out2 = SparseSim.topKBm25(docs2, "doc_id", "text", k = 2,
        queryPred = col("id") === 0L)
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out2.map(_._2).toSeq == Seq(2L, 1L), out2.mkString(","))
    assert(out2(0)._3 > out2(1)._3)
  }

  test("bm25 gate query is deterministic across runs") {
    val a = Registry.byName("sparse_bm25").run(spark, sf).collect().toSeq
    val b = Registry.byName("sparse_bm25").run(spark, sf).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
