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
}
