package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Raking

/** Closed-form fixtures for IPF raking ([[Raking.ipfUniform]]). */
class RakingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("independent table: one iteration is already exact-uniform") {
    import spark.implicits._
    // counts = outer product (rows 10/30 x cols 1/3): IPF lands on the
    // exact uniform joint 1/4 after the FIRST full iteration, so three
    // iterations read exactly 0.25 everywhere and every marginal is 0.5
    val docs = (
      Seq.fill(10)(("a", "x")) ++ Seq.fill(30)(("a", "y")) ++
        Seq.fill(30)(("b", "x")) ++ Seq.fill(90)(("b", "y"))
      ).toDF("r", "c")
    val out = Raking.ipfUniform(docs, "r", "c").collect()
    assert(out.length == 4)
    out.foreach { row =>
      assert(row.getDouble(3) == 0.25, s"m_fit ${row.getDouble(3)}")
      assert(row.getDouble(5) == 0.5 && row.getDouble(6) == 0.5)
    }
    // weight realizes the fit: m_fit / (n/N); e.g. cell (a,x): n/N =
    // 10/160 -> weight 4.0; cell (b,y): 90/160 -> weight 4/9
    val byCell = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byCell(("a", "x")).getDouble(4) == 4.0)
    assert(math.abs(byCell(("b", "y")).getDouble(4) - 4.0 / 9.0) < 1e-6)
  }

  test("uniform-marginal table is a fixed point: every weight is exactly 1") {
    import spark.implicits._
    // [[3,1],[1,3]]: marginals are already uniform, so IPF (which fits
    // MARGINALS, not the joint) must leave the table untouched
    val docs = (
      Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
        Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y"))
      ).toDF("r", "c")
    val out = Raking.ipfUniform(docs, "r", "c").collect()
    out.foreach { r =>
      assert(r.getDouble(4) == 1.0, s"weight ${r.getDouble(4)}")
      assert(r.getDouble(5) == 0.5 && r.getDouble(6) == 0.5)
    }
  }

  test("dependent skewed 2x2: marginal convergence and weight direction") {
    import spark.implicits._
    // counts [[30,10],[10,10]] (rows 2/3 vs 1/3, cols 2/3 vs 1/3,
    // dependent): after 3 iterations the hand-replayed fit reads row
    // shares 0.499828/0.500172, exact 0.5 columns (the last step
    // normalizes them), (a,x) downweighted to ~0.634, (b,y) upweighted
    // to ~1.902
    val docs = (
      Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
        Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
      ).toDF("r", "c")
    val out = Raking.ipfUniform(docs, "r", "c").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.values.map(_.getDouble(3)).sum > 0.999999)
    out.values.foreach { r =>
      assert(math.abs(r.getDouble(5) - 0.5) < 2e-4, s"row ${r.getDouble(5)}")
      assert(r.getDouble(6) == 0.5)
    }
    assert(math.abs(out(("a", "x")).getDouble(4) - 0.633803) < 1e-5)
    assert(math.abs(out(("b", "y")).getDouble(4) - 1.902439) < 1e-5)
  }

  test("applyUniform: the resample actually lands both marginals") {
    import spark.implicits._
    // heavily skewed 2x2 (rows 2/3 vs 1/3, cols 2/3 vs 1/3): after the
    // weight-ratio lottery both marginals must sit near 0.5, which the
    // RAW corpus is nowhere close to
    val docs = (
      Seq.tabulate(3000)(i => ("a", "x", i.toLong)) ++
        Seq.tabulate(1000)(i => ("a", "y", 10000L + i)) ++
        Seq.tabulate(1000)(i => ("b", "x", 20000L + i)) ++
        Seq.tabulate(1000)(i => ("b", "y", 30000L + i))
      ).toDF("r", "c", "id")
    val out = Raking.applyUniform(docs, "r", "c", "id").collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    val rowTot = out(("r", "a")) + out(("r", "b"))
    val colTot = out(("c", "x")) + out(("c", "y"))
    assert(rowTot == colTot, "both rollups cover the same kept set")
    assert(math.abs(out(("r", "a")).toDouble / rowTot - 0.5) < 0.05,
      s"row marginal ${out(("r", "a")).toDouble / rowTot}")
    assert(math.abs(out(("c", "x")).toDouble / colTot - 0.5) < 0.05,
      s"col marginal ${out(("c", "x")).toDouble / colTot}")
    // the raw corpus marginal is 2/3 — the resample moved it
    assert(out(("r", "a")).toDouble / rowTot < 0.6)
    // determinism: the lottery is a pure function of the id
    val again = Raking.applyUniform(docs, "r", "c", "id").collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(again == out)
  }

  test("single-column dimension degenerates gracefully") {
    import spark.implicits._
    // one source: the column step is a no-op rescale to 1; row step
    // alone equalizes languages -> m_fit = 1/3 each, col_share = 1
    val docs = (Seq.fill(5)(("a", "x")) ++ Seq.fill(7)(("b", "x")) ++
      Seq.fill(9)(("c", "x"))).toDF("r", "c")
    val out = Raking.ipfUniform(docs, "r", "c").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(math.abs(r.getDouble(3) - 1.0 / 3.0) < 1e-6)
      assert(r.getDouble(6) == 1.0)
    }
  }
}
