package graft

import graft.sources.ArrowIpc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("Arrow IPC round-trip preserves schema and values incl. nulls") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ipc").toString
    val df = Seq(
      (1L, Some("a"), Some(1.5), true),
      (2L, None, None, false),
      (3L, Some("ü"), Some(-0.25), true)
    ).toDF("id", "s", "d", "b")
    ArrowIpc.write(df, dir)
    val back = ArrowIpc.read(spark, dir).orderBy("id")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("IPC round-trip of a real table matches the original") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ipc2").toString
    val orig = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("o_date"))
    ArrowIpc.write(orig, dir)
    val back = ArrowIpc.read(spark, dir)
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      orig.orderBy("o_orderkey").collect().toSeq)
  }

  test("graft_* functions are callable from SQL") {
    GraftFunctions.register(spark)
    val c = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
    val fp = spark.sql("SELECT graft_fingerprint('abc') AS f").head().getLong(0)
    val expected = "abc".foldLeft(0L)((acc, ch) => (acc * 31 + ch) % 1000000007L)
    assert(fp == expected)
  }
}
