package graft

import java.text.Normalizer

import graft.functions.expr.NormalizeExpr
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val fixture = Seq(
    "café", "café", "ﬁle", "½ cup", "Åb", "ＡBC", "straße",
    "plain ascii", "ẛ̣", "가", "가", "ȩ́x", "")

  private def run(form: String): Seq[String] = {
    import spark.implicits._
    fixture.toDF("s")
      .select(NormalizeExpr(col("s"), form).as("n"))
      .collect().map(_.getString(0)).toSeq
  }

  test("all four forms equal java.text.Normalizer on the fixture") {
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val expected = fixture.map(Normalizer.normalize(_, Normalizer.Form.valueOf(form)))
      assert(run(form) == expected, s"form $form")
    }
  }

  test("compatibility forms fold ligatures and width variants") {
    import spark.implicits._
    val out = Seq("ﬁle", "ＡBC").toDF("s")
      .select(NormalizeExpr(col("s"), "NFKC").as("n"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("file", "ABC"))
  }

  test("normalization is idempotent and null-preserving") {
    import spark.implicits._
    val once = run("NFC")
    val twice = once.toDF("s")
      .select(NormalizeExpr(col("s"), "NFC").as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == once)
    val nullOut = Seq[Option[String]](None).toDF("s")
      .select(NormalizeExpr(col("s"), "NFC").as("n")).collect()
    assert(nullOut.head.isNullAt(0))
  }

  test("non-string input fails at analysis, bad form fails at construction") {
    import spark.implicits._
    intercept[AnalysisException] {
      Seq(1).toDF("x").select(NormalizeExpr(col("x"), "NFC")).collect()
    }
    intercept[IllegalArgumentException] {
      NormalizeExpr(col("x"), "NFX")
    }
  }
}
