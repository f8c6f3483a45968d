package graft

import graft.pipeline.ClusterOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // three well-separated directions in 4-d, five points each with small
  // jitter. Group membership is chosen so the md5-order seeds (ids 24,
  // 23, 21 for this id set) land one per planted group — Lloyd from a
  // one-seed-per-group start provably recovers the partition, whereas
  // two seeds in one group is a legitimate k-means local optimum, not a
  // bug (the operator's seeding is deterministic, not quality-tuned).
  private val plantedGroupOf: Map[Long, Int] = Map(
    24L -> 0, 0L -> 0, 1L -> 0, 2L -> 0, 3L -> 0,
    23L -> 1, 4L -> 1, 10L -> 1, 12L -> 1, 13L -> 1,
    21L -> 2, 11L -> 2, 14L -> 2, 20L -> 2, 22L -> 2)

  private def plantedClusters() = {
    import spark.implicits._
    val base = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    val rows = plantedGroupOf.toSeq.sortBy(_._1).map { case (id, g) =>
      (id, base(g).zipWithIndex.map { case (v, i) =>
        v + 0.01f * ((id + i) % 3)
      }.toSeq)
    }
    rows.toDF("id", "v")
  }

  test("kmeans recovers planted well-separated clusters exactly") {
    val (assigned, centroids) =
      ClusterOps.kmeans(plantedClusters(), "id", "v", k = 3, iterations = 4)
    val got = assigned.select(col("id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every planted group lands in ONE cluster, and the three groups in
    // three DIFFERENT clusters (cid labels are seed-order-dependent)
    val groups = got.groupBy(kv => plantedGroupOf(kv._1))
      .map { case (g, m) => g -> m.values.toSet }
    assert(groups.values.forall(_.size == 1), s"split planted cluster: $groups")
    assert(groups.values.flatten.toSet.size == 3, s"merged clusters: $groups")
    assert(centroids.length == 3)
    // each centroid sits near one planted direction
    val dirs = centroids.map(_.zipWithIndex.maxBy(_._1)._2).toSet
    assert(dirs == Set(0, 1, 2), s"centroid directions: ${dirs.mkString(",")}")
  }

  test("kmeans assignment is partitioning-independent and total") {
    val df = Tables.embeddings(spark, TestSpark.sf)
    val (a1, c1) = ClusterOps.kmeans(df, "vec_id", "embedding", 4, 2)
    val (a2, c2) = ClusterOps.kmeans(df.repartition(7), "vec_id", "embedding", 4, 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq,
      "centroids must not depend on input partitioning")
    val m1 = a1.select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val m2 = a2.select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m1 == m2)
    assert(m1.size == df.count())
    assert(m1.values.forall(c => c >= 0 && c < 4))
  }

  test("kmeans final assignment is a narrow literal-folded projection (no exchange)") {
    val (assigned, _) = ClusterOps.kmeans(
      Tables.embeddings(spark, TestSpark.sf), "vec_id", "embedding", 4, 1)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignment must not shuffle the corpus:\n$plan")
  }

  test("semanticDedup drops planted near-duplicates, keeps representatives and distinct members") {
    import spark.implicits._
    // two clusters; ids 0/10 are representatives (lowest id per cluster);
    // 1/2 are near-copies of 0 (cosine ~ 1); 5 is same-cluster but
    // direction-distinct; 11 is a near-copy of 10
    val rows = Seq(
      0L -> Array(10f, 0f, 0f, 0f),
      1L -> Array(10.001f, 0f, 0f, 0f),
      2L -> Array(9.99f, 0.01f, 0f, 0f),
      5L -> Array(7f, 7f, 0f, 0f),
      10L -> Array(0f, 0f, 10f, 0f),
      11L -> Array(0f, 0f, 10.01f, 0f),
      15L -> Array(0f, 0f, 7f, 7f))
      .map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
    val kept = ClusterOps.semanticDedup(rows, "id", "v", k = 2, iterations = 3,
      tau = 0.95)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 5L, 10L, 15L), s"kept $kept")
  }

  test("silhouette is near 1 on planted separated clusters, lower when k splits them") {
    val df = plantedClusters()
    val (_, c3) = ClusterOps.kmeans(df, "id", "v", k = 3, iterations = 4)
    val good = ClusterOps.silhouette(df, "id", "v", c3)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(good.map(_._1).sum == 15)
    good.foreach { case (_, s) =>
      assert(s > 0.8, s"separated clusters must score high, got $s")
    }
    // k = 6 forcibly splits planted groups: the mean silhouette over all
    // points drops below the k = 3 score
    val (_, c6) = ClusterOps.kmeans(df, "id", "v", k = 6, iterations = 4)
    def weightedMean(rows: Array[(Long, Double)]): Double =
      rows.map { case (n, s) => n * s }.sum / rows.map(_._1).sum
    val bad = ClusterOps.silhouette(df, "id", "v", c6)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(weightedMean(bad) < weightedMean(good),
      s"over-split k should score lower: ${weightedMean(bad)} vs ${weightedMean(good)}")
  }

  test("semantic decontamination flags planted eval near-copies only") {
    import spark.implicits._
    val train = Seq(
      1L -> Array(10f, 0f, 0f, 0f),    // near-copy of eval A -> flagged
      2L -> Array(0f, 10f, 0f, 0f),    // orthogonal -> clean
      3L -> Array(7f, 0.2f, 0f, 7f))   // partial overlap, cos ~ 0.71
      .map { case (i, v) => (i, v.toSeq) }.toDF("id", "v")
    val eval = Seq(
      100L -> Array(9.9f, 0.1f, 0f, 0f),
      101L -> Array(0f, 0f, 10f, 0f))
      .map { case (i, v) => (i, v.toSeq) }.toDF("id", "v")
    val out = graft.pipeline.Ann
      .semanticDecontam(train, eval, "id", "v", tau = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._2, s"near-copy must flag: ${out(1L)}")
    assert(!out(2L)._2 && !out(3L)._2, out.toString)
    assert(out(1L)._1 > 0.99 && out(2L)._1 < 0.05)
  }

  test("a vector whose length differs from the seeds' gets a NULL cid, not a wrong one") {
    import spark.implicits._
    // zip_with pads the shorter side with nulls, so every distance to a
    // mismatched vector is NULL and the argmin yields NULL — the row is
    // visibly unassigned rather than silently misclassified
    val rows = Seq(
      (1L, Seq(10f, 0f, 0f, 0f)),
      (2L, Seq(0f, 10f, 0f, 0f)),
      (3L, Seq(1f, 2f))) // wrong dimension
      .toDF("id", "v")
    val (assigned, _) = ClusterOps.kmeans(rows, "id", "v", k = 2, iterations = 1)
    val byId = assigned.select(col("id"), col("cid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(byId(1L).isDefined && byId(2L).isDefined)
    assert(byId(3L).isEmpty, s"mismatched vector must be unassigned: ${byId(3L)}")
  }

  test("semanticDedup keeps everything at tau above the max within-cluster cosine") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val kept = ClusterOps.semanticDedup(e, "vec_id", "embedding", 8, 1, tau = 0.999)
    assert(kept.count() == e.count(),
      "an isotropic corpus has no semantic near-dups at tau=0.999")
  }
}
