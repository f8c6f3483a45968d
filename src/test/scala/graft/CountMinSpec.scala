package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.{CountMinAgg, CountMinEstimate, CountMinUnionAgg}

/** Count-Min sketch contracts: exact-tier equality with true counts,
  * one-sided error after degrade, tier-crossing merge consistency, and
  * the artifact-algebra identity (per-shard states unioned ≡ one global
  * state).
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    // skewed stream: key k appears k times, k = 1..40 (820 rows)
    (1 to 40).flatMap(k => Seq.fill(k)(k.toLong)).zipWithIndex
      .map { case (k, i) => (i.toLong, k, s"g${i % 4}") }
      .toDF("id", "k", "g")
  }

  test("exact tier: estimates equal true counts for present and absent keys") {
    val df = fixture
    val state = df.agg(CountMinAgg(col("k")).as("s"))
    import spark.implicits._
    val probes = ((1 to 40) ++ Seq(999, -5)).map(_.toLong).toDF("k")
    val out = probes.crossJoin(state)
      .select(col("k"), CountMinEstimate(col("s"), xxhash64(col("k"))).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 40).foreach(k => assert(out(k.toLong) == k.toLong, s"key $k"))
    assert(out(999L) == 0L && out(-5L) == 0L, "absent keys must estimate 0")
  }

  test("degraded tier: one-sided error within the CMS bound") {
    val df = fixture
    // exactCap 8 forces the matrix tier (40 distinct keys)
    val state = df.agg(CountMinAgg(col("k"), 8, 5, 64).as("s"))
    import spark.implicits._
    val probes = (1 to 40).map(_.toLong).toDF("k")
    val out = probes.crossJoin(state)
      .select(col("k"),
        CountMinEstimate(col("s"), xxhash64(col("k")), 8, 5, 64).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 820L
    (1 to 40).foreach { k =>
      assert(out(k.toLong) >= k.toLong, s"CMS must never under-count (key $k)")
      // 2eN/width bound w.p. 1-2^-5 per key; assert a loose 4x version so
      // the deterministic fixture can't flake
      assert(out(k.toLong) - k.toLong <= 4 * 2 * math.E * n / 64,
        s"overshoot too large at key $k: ${out(k.toLong)}")
    }
  }

  test("merge crosses tiers consistently: sharded-and-unioned == global") {
    val df = fixture
    // tiny exactCap so SOME per-group partials degrade while others stay
    // exact; the union must still equal the one-pass global state
    val perGroup = df.groupBy(col("g")).agg(CountMinAgg(col("k"), 12, 5, 64).as("s"))
    val unioned = perGroup.agg(CountMinUnionAgg(col("s"), 12, 5, 64).as("s"))
    val global = df.agg(CountMinAgg(col("k"), 12, 5, 64).as("s"))
    import spark.implicits._
    val probes = (1 to 40).map(_.toLong).toDF("k")
    def est(stateDf: org.apache.spark.sql.DataFrame) =
      probes.crossJoin(stateDf)
        .select(col("k"),
          CountMinEstimate(col("s"), xxhash64(col("k")), 12, 5, 64).as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est(unioned) == est(global),
      "artifact union must give the same estimates as one global pass")
  }

  test("SQL surface: graft_count_min / _union / _estimate match the column API") {
    val df = fixture
    df.createOrReplaceTempView("cms_fixture")
    val viaSql = spark.sql(
      """SELECT k, graft_count_min_estimate(s, xxhash64(k)) AS est FROM (
        |  SELECT graft_count_min(k) AS s FROM cms_fixture
        |) CROSS JOIN (SELECT DISTINCT k FROM cms_fixture)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 40).foreach(k => assert(viaSql(k.toLong) == k.toLong, s"key $k via SQL"))
    // union path: per-group states merged in SQL
    val viaUnion = spark.sql(
      """SELECT graft_count_min_estimate(u, xxhash64(CAST(40 AS BIGINT))) AS est
        |FROM (SELECT graft_count_min_union(s) AS u FROM (
        |  SELECT g, graft_count_min(k) AS s FROM cms_fixture GROUP BY g))""".stripMargin)
      .head().getLong(0)
    assert(viaUnion == 40L)
  }

  test("serialization round-trips both tiers") {
    import CountMinAgg.Buf
    val exact = new Buf(100, 5, 64)
    (1 to 10).foreach(i => exact.add(i.toLong * 7919L, i.toLong))
    val e2 = Buf.deserialize(exact.serialize(), 100, 5, 64)
    (1 to 10).foreach(i => assert(e2.estimate(i.toLong * 7919L) == i.toLong))
    assert(e2.estimate(12345L) == 0L)

    val dense = new Buf(4, 5, 64)
    (1 to 10).foreach(i => dense.add(i.toLong * 7919L, i.toLong))
    assert(dense.map == null, "cap 4 must have degraded")
    val d2 = Buf.deserialize(dense.serialize(), 4, 5, 64)
    (1 to 10).foreach(i =>
      assert(d2.estimate(i.toLong * 7919L) == dense.estimate(i.toLong * 7919L)))
  }

  test("mismatched sketch dimensions fail fast, never misalign") {
    import CountMinAgg.Buf
    val a = new Buf(4, 5, 64)
    (1 to 10).foreach(i => a.add(i.toLong * 7919L, 1L))
    val bytes = a.serialize()
    // a state persisted at (4, 5, 64) probed/unioned as (4, 5, 128) would
    // silently misalign the matrix add without the header check
    val e = intercept[IllegalArgumentException] {
      Buf.deserialize(bytes, 4, 5, 128)
    }
    assert(e.getMessage.contains("re-dimension"),
      s"expected the dimension-mismatch rejection, got: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      Buf.deserialize(bytes, 8, 5, 64)
    }
    assert(e2.getMessage.contains("exactCap=4"))
  }
}
