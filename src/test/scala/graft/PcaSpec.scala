package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.GramMatrixAgg
import graft.pipeline.Pca

/** PCA contracts the near-isotropic gate data can't show: real
  * convergence to a closed-form dominant component on an anisotropic
  * fixture, exactness of the Gram pass, and input validation.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("gram pass accumulates exact scaled integer moments") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(3.0f, -1.0f))
    ).toDF("id", "v")
    val out = df.agg(GramMatrixAgg(col("v"), 2).as("s"))
      .head.getSeq[Long](0)
    val S = (1L << 40).toDouble
    assert(out(0) == 2L)                               // n
    assert(out(1) == math.round(1 * S) + math.round(3 * S))   // M_0
    assert(out(2) == math.round(2 * S) - math.round(1 * S))   // M_1
    assert(out(3) == math.round(1 * S) + math.round(9 * S))   // G_00
    assert(out(4) == math.round(2 * S) - math.round(3 * S))   // G_01
    assert(out(5) == out(4))                                  // symmetry
    assert(out(6) == math.round(4 * S) + math.round(1 * S))   // G_11
  }

  test("converges to the closed-form dominant component when anisotropic") {
    import spark.implicits._
    // variance 12 along e1, ~0.013 along e2, zero elsewhere: the
    // dominant eigenvector is e1 and 10 iterations are overkill
    val df = Seq(
      (1L, Array(3.0f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(-3.0f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(3.0f, -0.1f, 0.0f, 0.0f)),
      (4L, Array(-3.0f, -0.1f, 0.0f, 0.0f))
    ).toDF("id", "v")
    val rows = Pca.topComponent(df, "v", 4, 10).orderBy("i").collect()
    val load = rows.map(_.getDouble(1))
    assert(math.abs(math.abs(load(0)) - 1.0) < 1e-9,
      s"e1 loading should be ±1, got ${load(0)}")
    (1 to 3).foreach(i =>
      assert(math.abs(load(i)) < 1e-6, s"loading $i should vanish, got ${load(i)}"))
    // sample variance along e1: 4 * 9 / 3 = 12
    assert(math.abs(rows.head.getDouble(2) - 12.0) < 1e-6,
      s"eigval should be 12, got ${rows.head.getDouble(2)}")
    // unit norm
    assert(math.abs(load.map(x => x * x).sum - 1.0) < 1e-8)
  }

  test("rejects dimension mismatch loudly") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val e = intercept[Exception] {
      df.agg(GramMatrixAgg(col("v"), 2)).collect()
    }
    assert(e.getMessage != null)
  }

  test("overflow throws loudly instead of silently wrapping") {
    import spark.implicits._
    // |x_i*x_j| = 2^24 -> term = 2^64 >= the 2^62 per-term envelope:
    // the range check must fail the job, never emit a wrapped Gram
    val big = math.pow(2.0, 12).toFloat
    val df = Seq((1L, Array(big, big))).toDF("id", "v")
    val e = intercept[Exception] {
      df.agg(GramMatrixAgg(col("v"), 2)).collect()
    }
    assert(e.getMessage.contains("envelope") ||
      (e.getCause != null && e.getCause.getMessage.contains("envelope")),
      s"expected the term-envelope rejection, got: ${e.getMessage}")
    // accumulator overflow across rows: terms individually fine, the
    // running long sum is not — Math.addExact must throw, not wrap
    val nearMax = math.pow(2.0, 10.5) // term = 2^61; 4 rows pass 2^63
    val df2 = (1L to 4L).map(i => (i, Array(nearMax, nearMax))).toDF("id", "v")
    val e2 = intercept[Exception] {
      df2.agg(GramMatrixAgg(col("v"), 2)).collect()
    }
    val msg2 = Option(e2.getMessage).getOrElse("") +
      Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("overflow") || msg2.contains("envelope"),
      s"expected loud overflow, got: ${e2.getMessage}")
  }
}
