package graft

import graft.functions.expr.MatVecFold
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the fused literal-matrix fold ([[MatVecFold]]): every
  * output element must be BIT-identical to the `aggregate(zip_with(...))`
  * HOF formulation it replaced (sequential in-array-order accumulation;
  * Spark `round(_, 6)` semantics when rounding), and the null contract
  * must mirror the HOF's (length mismatch / null element / null input →
  * NULL). The oracle gates (ann_kmeans, ann_rp, ann_pca_project,
  * dedup_semantic) prove the composed results; this suite pins the
  * expression itself so a future kernel tweak can't drift from the HOF
  * reference semantics without failing here. */
class MatVecFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the HOF reference formulations the expression replaced
  private def hofDist2(vec: Column, centroid: Array[Double]): Column =
    round(aggregate(
      zip_with(vec, array(centroid.map(lit): _*),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v), 6)

  private def hofDot(vec: Column, w: Array[Double]): Column =
    aggregate(zip_with(vec, lit(w), (x, c) => x.cast("double") * c),
      lit(0.0), (acc, v) => acc + v)

  private def vectors(n: Int, dim: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        (math.sin(i * 31 + j * 7) * 3.17).toFloat))
    }.toDF("id", "v")
  }

  test("distances2 is bit-identical to the per-centroid HOF folds") {
    val dim = 64
    val k = 8
    val m = Array.tabulate(k, dim)((j, i) => math.cos(j * 13 + i) * 2.5)
    val df = vectors(40, dim)
    val fused = df.select(col("id"),
      MatVecFold.distances2(col("v"), m).as("d")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val hof = df.select(col("id") +:
      m.zipWithIndex.map { case (c, j) => hofDist2(col("v"), c).as(s"d$j") }: _*)
      .collect()
    hof.foreach { r =>
      val id = r.getLong(0)
      (0 until k).foreach { j =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1 + j)) ==
          java.lang.Double.doubleToLongBits(fused(id)(j)),
          s"id=$id centroid=$j")
      }
    }
  }

  test("dots is bit-identical to the per-row HOF dot products") {
    val dim = 17 // odd, not a power of two
    val rows = Array.tabulate(5, dim)((j, i) => math.tan(j + i * 0.3))
    val df = vectors(25, dim)
    val fused = df.select(col("id"),
      MatVecFold.dots(col("v"), rows).as("d")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val hof = df.select(col("id") +:
      rows.zipWithIndex.map { case (w, j) => hofDot(col("v"), w).as(s"d$j") }: _*)
      .collect()
    hof.foreach { r =>
      val id = r.getLong(0)
      rows.indices.foreach { j =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1 + j)) ==
          java.lang.Double.doubleToLongBits(fused(id)(j)), s"id=$id row=$j")
      }
    }
  }

  test("null contract: mismatched length, null element, null input → NULL") {
    import spark.implicits._
    val m = Array(Array(1.0, 2.0, 3.0))
    val df = Seq(
      (1L, Seq(1f, 2f, 3f)),          // clean
      (2L, Seq(1f, 2f)),              // too short
      (3L, Seq(1f, 2f, 3f, 4f)),      // too long
      (4L, null.asInstanceOf[Seq[Float]]) // null input
    ).toDF("id", "v")
    val out = df.select(col("id"), MatVecFold.dots(col("v"), m).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(out(1L) != null && out(1L).head == 1.0 + 4.0 + 9.0)
    assert(out(2L) == null && out(3L) == null && out(4L) == null)
    // null ELEMENT nulls the whole result (the zip_with-poisoning mirror)
    val withNullElem = spark.sql(
      "SELECT array(cast(1 as float), cast(null as float), cast(3 as float)) AS v")
      .select(MatVecFold.dots(col("v"), m).as("d")).collect()
    assert(withNullElem.head.isNullAt(0))
  }

  test("interpreted eval matches codegen (roundHalfUp6 parity)") {
    // force a value that rounds at the 6th decimal boundary: the eval
    // path and generated path must both go through roundHalfUp6
    assert(MatVecFold.roundHalfUp6(1.2345675) == 1.234568)
    assert(MatVecFold.roundHalfUp6(-1.2345675) == -1.234568)
    assert(MatVecFold.roundHalfUp6(Double.NaN).isNaN)
    assert(MatVecFold.roundHalfUp6(Double.PositiveInfinity).isPosInfinity)
    // cross-check against Spark's own round() on the same doubles
    val vals = Seq(0.12345645, 0.12345655, 123.4567891234, -7.5e-7)
    import spark.implicits._
    val sparkRounded = vals.toDF("x").select(round(col("x"), 6)).collect().map(_.getDouble(0))
    vals.map(MatVecFold.roundHalfUp6).zip(sparkRounded).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b))
    }
  }
}
