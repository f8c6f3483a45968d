package graft

import org.scalatest.funsuite.AnyFunSuite

class ApproxAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("sketch aggregates land within tolerance of exact values") {
    val approx = Registry.byName("q27b_approx").run(spark, sf).head()
    val exact = Registry.byName("q27a_quantiles").run(spark, sf).head()
    val exactParts = exact.getAs[Long]("n_parts")
    val approxParts = approx.getAs[Long]("approx_parts")
    // HLL++ default rsd = 5%
    assert(math.abs(approxParts - exactParts).toDouble / exactParts < 0.15,
      s"approx $approxParts vs exact $exactParts")
    val exactMedian = exact.getAs[Double]("p50")
    val approxMedian = approx.getAs[Double]("approx_median")
    assert(math.abs(approxMedian - exactMedian) / exactMedian < 0.05,
      s"approx median $approxMedian vs exact $exactMedian")
  }
}
