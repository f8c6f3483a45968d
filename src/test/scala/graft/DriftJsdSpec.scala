package graft

import graft.functions.expr.BucketedJsd
import graft.pipeline.Drift
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity pin for [[BucketedJsd]] against the inlined expression
  * tree it replaced (the 64-term `when(...)·log2(...)` CASE chain that
  * overflowed janino's 64 KB method limit): every scaled-long term must
  * equal Spark's own evaluation of the original formula — same log2,
  * same round(x,0) HALF_UP, same guards — so the text_drift_bucketed
  * gate and the streaming parity spec see identical values. */
class DriftJsdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scaled-long term is bit-identical to the original Spark expression tree") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val cases = (Seq((0L, 10L, 0.0), (0L, 10L, 0.25), (7L, 7L, 0.0),
      (7L, 7L, 1.0), (1L, 1000000007L, 1e-9)) ++
      (1 to 400).map { _ =>
        val n = 1L + rnd.nextInt(100000)
        val c = rnd.nextInt(2) match {
          case 0 => 0L
          case _ => 1L + (rnd.nextLong().abs % n)
        }
        val g = rnd.nextInt(4) match {
          case 0 => 0.0
          case _ => rnd.nextDouble() * 0.2
        }
        (c, n, g)
      }).distinct
    val df = cases.toDF("c", "n", "g")
    // the ORIGINAL tree, one term, with g inlined per row via a join on
    // the value (lit(g) per distinct g would change codegen shape; the
    // arithmetic is identical with g as a column)
    val p = col("c").cast("double") / col("n")
    val g = col("g")
    val pTerm = when(col("c") > 0,
      lit(0.5) * p * log2(lit(2.0) * p / (p + g))).otherwise(lit(0.0))
    val gTerm = when(g > 0,
      lit(0.5) * g * log2(lit(2.0) * g /
        (when(col("c") > 0, p).otherwise(lit(0.0)) + g)))
      .otherwise(lit(0.0))
    val sparkTerms = df
      .select(col("c"), col("n"), col("g"),
        round((pTerm + gTerm) * lit(1e9), 0).cast("long").as("t"))
      .collect()
    sparkTerms.foreach { r =>
      val expected = r.getLong(3)
      val got = BucketedJsd.term(r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(got == expected,
        s"c=${r.getLong(0)} n=${r.getLong(1)} g=${r.getDouble(2)}: $got != $expected")
    }
  }

  test("zero-drift corpus yields 0.0; disjoint corpus yields 1.0; all-zero counts yield NULL") {
    import spark.implicits._
    val docs = Seq(
      ("a", "alpha beta gamma delta epsilon"),
      ("b", "zulu")).toDF("k", "text")
    val ref = Drift.refProbs(docs.filter(col("k") === "a"), "text")
    val out = Drift.bucketJsd(docs, Seq("k"), "text", ref)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 0.0) // identical distribution → zero divergence
    assert(out("b") == 1.0) // fully disjoint buckets → max JSD (1 bit)
    // n == 0 (all-zero counts) → NULL: the defensive mirror of the old
    // `when(__n > 0, ...)` guard (unreachable through explode, which
    // drops token-less rows before the aggregate)
    val zeros = Seq(Tuple1(Seq.fill(3)(0L))).toDF("c")
    assert(zeros.select(BucketedJsd(col("c"), Array(0.5, 0.25, 0.25)))
      .collect().head.isNullAt(0))
  }

  test("count-vector length mismatch fails loudly") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq(1L, 2L))).toDF("c")
    val e = intercept[Exception] {
      df.select(BucketedJsd(col("c"), Array(0.5, 0.25, 0.25))).collect()
    }
    assert(e.getMessage != null)
  }
}
