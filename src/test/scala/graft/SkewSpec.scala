package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderpriority"))

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(25,6)")).as("s"))
        .orderBy(col("o_orderpriority"))
        .collect().toSeq

    val plain = agg(li.join(ord, col("l_orderkey") === col("o_orderkey")))
    val salted = agg(Skew.saltedJoin(li, ord, col("l_orderkey"), col("o_orderkey"), 8))
    assert(plain == salted)
  }

  test("salted join shuffles on (key, salt): the hot key spreads over nSalts reducers") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderpriority"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Skew
        .saltedJoin(li, ord, col("l_orderkey"), col("o_orderkey"), 8)
        .queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head // AQE prints Final AND Initial
      // the exchange must partition on the salt, not the key alone —
      // that is the whole point: one hot key → nSalts shuffle partitions
      assert(plan.contains("__salt"), s"no salt in the exchange keys:\n$plan")
      assert(plan.contains("hashpartitioning"), s"no hash exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("byte-identical hot rows spread across salts (not one hot bucket)") {
    import spark.implicits._
    // the realistic 100 TB skew case: billions of IDENTICAL rows on one
    // hot key — a pure row-hash salt would put them all in ONE bucket
    val hot = Seq.fill(4096)((1L, "same")).toDF("k", "v").repartition(8)
    val dim = Seq((1L, "dim")).toDF("dk", "dv")
    val joined = Skew.saltedJoin(hot, dim, col("k"), col("dk"), 8)
    assert(joined.count() == 4096L) // result unaffected by salting
    // observe the salt distribution directly through the same default expr
    val salts = hot
      .withColumn("__salt",
        pmod(xxhash64(struct(hot.columns.map(col): _*),
          monotonically_increasing_id()), lit(8L)))
      .groupBy(col("__salt")).count().collect()
    assert(salts.length > 1,
      s"identical rows collapsed into ${salts.length} salt bucket(s)")
  }

  test("explicit saltExpr overrides the default salt") {
    import spark.implicits._
    val probe = (1L to 64L).map(i => (1L, i)).toDF("k", "uid")
    val dim = Seq((1L, "dim")).toDF("dk", "dv")
    val viaUid = Skew.saltedJoin(probe, dim, col("k"), col("dk"), 4,
      saltExpr = Some(xxhash64(col("uid"))))
    assert(viaUid.count() == 64L)
  }
}
