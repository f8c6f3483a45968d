package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Project

/** Projection contracts: PCA projection equals the hand dot product,
  * the JL sign matrix is reproducible, and the JL map roughly preserves
  * pairwise distances (the theorem, loosely, at k=16).
  */
class ProjectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pcaProject equals the hand-computed dot product") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(-1.0f, 0.0f, 0.5f)))
      .toDF("id", "v")
    val w = Array(0.5, -0.25, 2.0)
    val out = Project.pcaProject(df, "id", "v", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.5 - 0.5 + 6.0)
    assert(out(2L) == -0.5 + 0.0 + 1.0)
  }

  test("jlSign is deterministic and roughly balanced") {
    val signs = for (j <- 0 until 64; k <- 0 until 16) yield Project.jlSign(j, k)
    assert(signs.forall(s => s == 1.0 || s == -1.0))
    val pos = signs.count(_ == 1.0)
    assert(pos > signs.size / 3 && pos < 2 * signs.size / 3,
      s"sign matrix badly unbalanced: $pos of ${signs.size} positive")
    assert(Project.jlSign(3, 7) == Project.jlSign(3, 7))
  }

  test("randomProject keeps k NULL-proj rows for an invalid vector " +
      "(no silent row drop)") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(9.0f)))
      .toDF("id", "v") // id 2 is short: its folds are NULL, not absent
    val out = Project.randomProject(df, "id", "v", 2, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(out.size == 8, s"expected 2 ids x 4 dims, got ${out.size}")
    (0 until 4).foreach { kk =>
      assert(out((1L, kk)) != null, s"valid row lost proj at k=$kk")
      assert(out((2L, kk)) == null, s"short row should be NULL at k=$kk")
    }
  }

  test("randomProject rejects non-even-power-of-two k") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Project.randomProject(df, "id", "v", 1, 8)
    }
  }

  test("JL projection roughly preserves pairwise distances on real data") {
    val e = Tables.embeddings(spark, TestSpark.sf).limit(40).cache()
    val proj = Project.randomProject(e, "vec_id", "embedding", 64, 16)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
    val orig = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.size
      od = d2(orig(ids(i)), orig(ids(j))) if od > 0
    } yield d2(proj(ids(i)), proj(ids(j))) / od
    val mean = ratios.sum / ratios.size
    // E[ratio] = 1; at k=16 the per-pair RSE is ~35%, the mean over
    // ~780 pairs is tight
    assert(mean > 0.7 && mean < 1.3, s"mean distance ratio $mean outside [0.7, 1.3]")
  }
}
