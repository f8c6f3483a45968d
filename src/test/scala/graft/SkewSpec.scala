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
}
