package graft.pipeline

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.expr.GramMatrixAgg

/** Distributed PCA, split the way a 100 TB corpus forces: ONE exact
  * integer Gram/moment pass over the data ([[GramMatrixAgg]] — counts
  * shuffle, vectors don't), then a power iteration on the collected
  * d×d matrix (the k-means-centroid kind of bounded driver exchange:
  * 1 + d + d² longs, ~33 KB at d = 64 — the data itself is never
  * collected).
  *
  * Every arithmetic step is engine-replayable: the centered scatter
  * matrix `A_ij = n·2⁴⁰·G_ij − M_i·M_j` is exact integer algebra
  * (BigInt here, HUGEINT in the oracle), its cast to double is
  * correctly-rounded in both engines, and each iteration applies the
  * SAME float ops in the SAME within-row fold order as the oracle's
  * `list_sum(list_transform(...))` (the k-means determinism pattern),
  * so the final loadings hash-match DuckDB with NO per-iteration
  * rounding at all.
  */
object Pca {

  /** 2⁸⁰ = Scale², the exact power-of-two divisor that takes the scatter
    * matrix back to covariance units. */
  private val Scale2: Double = java.lang.Math.scalb(1.0, 80)

  private def round9(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(9, RoundingMode.HALF_UP).doubleValue()

  /** Dominant principal component of the sample covariance of `vecCol`:
    * `iters` power iterations from the uniform unit start 1/√d (exact
    * when d is a power of four). Returns d rows (i, loading, eigval) —
    * loading round@9, eigval = the Rayleigh quotient in covariance
    * units round@9. With near-degenerate leading eigenvalues the
    * result after a fixed `iters` is a deterministic point on the
    * convergence path in BOTH engines (the gate contract); PcaSpec
    * proves real convergence on an anisotropic fixture. */
  def topComponent(
      df: DataFrame, vecCol: String, dim: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    val packed = df.agg(GramMatrixAgg(col(vecCol), dim).as("s"))
      .head.getSeq[Long](0).toArray
    val n = packed(0)
    require(n >= 2, s"pca needs at least 2 rows, got $n")
    val m = packed.slice(1, 1 + dim).map(BigInt(_))
    val scaleI = BigInt(1) << 40

    // centered scatter in exact integers, then one correctly-rounded
    // cast to double per entry (BigInteger.doubleValue ≡ HUGEINT::DOUBLE)
    val c = Array.tabulate(dim, dim) { (i, j) =>
      (BigInt(n) * scaleI * BigInt(packed(1 + dim + i * dim + j)) -
        m(i) * m(j)).toDouble
    }

    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var it = 0
    while (it < iters) {
      val w = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var s = 0.0
        var j = 0
        while (j < dim) { s += c(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var n2 = 0.0
      i = 0
      while (i < dim) { n2 += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(n2)
      i = 0
      while (i < dim) { w(i) = w(i) / nrm; i += 1 }
      v = w
      it += 1
    }

    // Rayleigh quotient vᵀAv in the same fold order, back to covariance
    // units: (rq / 2⁸⁰) / (n(n−1))
    var rq = 0.0
    var i = 0
    while (i < dim) {
      var s = 0.0
      var j = 0
      while (j < dim) { s += c(i)(j) * v(j); j += 1 }
      rq += v(i) * s
      i += 1
    }
    val eig = round9((rq / Scale2) / (n * (n - 1)).toDouble)

    val rows = (0 until dim).map(i => Row(i, round9(v(i)), eig))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("i", IntegerType, nullable = false),
        StructField("loading", DoubleType, nullable = false),
        StructField("eigval", DoubleType, nullable = false))))
  }
}
