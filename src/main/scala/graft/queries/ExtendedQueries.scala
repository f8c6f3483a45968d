package graft.queries

import graft.{Capability, Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Capabilities beyond the reference's own operator set that a user of a
  * complete engine expects (SURVEY.md §2.1 "missing from the reference"):
  * rollup/grouping sets, intersect/except, cross join — all Catalyst
  * builtins — plus a custom `product` aggregate (a reference kernel Spark
  * lacks) and higher-moment parity (skewness/kurtosis/corr/covariance).
  */
object ExtendedQueries {

  /** Q28: ROLLUP with grouping_id (subtotal rows). Null ordering is pinned
    * explicitly — Spark defaults NULLS FIRST for ASC, DuckDB NULLS LAST. */
  private def q28(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(
        col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  private val q28Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.sqlSum("l_quantity")} AS sum_qty,
       |  COUNT(*) AS n,
       |  GROUPING(l_returnflag, l_linestatus) AS gid
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Q29: INTERSECT / EXCEPT (set semantics — deduplicated). */
  private def q29(s: SparkSession, d: String): DataFrame = {
    val custNk = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
    val suppNk = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
    custNk.intersect(suppNk).select(lit("both").as("side"), col("nk"))
      .union(custNk.except(suppNk).select(lit("cust_only").as("side"), col("nk")))
      .orderBy(col("side"), col("nk"))
  }

  private val q29Sql =
    """SELECT * FROM (
      |  SELECT 'both' AS side, nk FROM
      |    (SELECT c_nationkey AS nk FROM customer
      |     INTERSECT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT 'cust_only' AS side, nk FROM
      |    (SELECT c_nationkey AS nk FROM customer
      |     EXCEPT SELECT s_nationkey FROM supplier)
      |) ORDER BY side, nk""".stripMargin

  /** Q30: cross join (reference has no cross-join node — free in Spark). */
  private def q30(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d)
      .crossJoin(Tables.orders(s, d).select(col("o_orderpriority")).distinct())
      .select(col("r_name"), col("o_orderpriority"))
      .orderBy(col("r_name"), col("o_orderpriority"))

  private val q30Sql =
    """SELECT r_name, o_orderpriority
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
      |ORDER BY r_name, o_orderpriority""".stripMargin

  /** Q31: custom `product` aggregate (graft.functions.expr.Product, a
    * DeclarativeAggregate). Per-order products of integer-valued
    * quantities stay < 2^53, so double multiplication is exact and
    * order-independent — safe against the DuckDB product() oracle. */
  private def q31(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        graft.functions.expr.Product(col("l_quantity")).as("qty_product"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_orderkey"))

  private val q31Sql =
    """SELECT l_orderkey, product(l_quantity) AS qty_product,
      |  COUNT(*) AS n_items
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** Q02b: higher moments + bivariate stats. Spark's skewness/kurtosis are
    * population-based (m3/m2^1.5, m4/m2²−3); the oracle computes the same
    * definition from raw central moments rather than trusting DuckDB's
    * sample-corrected builtins. */
  private def q02b(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(
      round(skewness(col("l_extendedprice")), 6).as("skew_price"),
      round(kurtosis(col("l_extendedprice")), 6).as("kurt_price"),
      round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"),
      round(covar_samp(col("l_extendedprice"), col("l_quantity")), 4).as("cov_s"),
      round(covar_pop(col("l_extendedprice"), col("l_quantity")), 4).as("cov_p"))

  private val q02bSql =
    """WITH mu AS (SELECT avg(l_extendedprice) AS m FROM lineitem),
      |moments AS (
      |  SELECT
      |    sum(pow(l_extendedprice - mu.m, 2)) / count(*) AS m2,
      |    sum(pow(l_extendedprice - mu.m, 3)) / count(*) AS m3,
      |    sum(pow(l_extendedprice - mu.m, 4)) / count(*) AS m4
      |  FROM lineitem, mu GROUP BY mu.m)
      |SELECT
      |  round(m3 / pow(m2, 1.5), 6) AS skew_price,
      |  round(m4 / pow(m2, 2) - 3, 6) AS kurt_price,
      |  (SELECT round(corr(l_extendedprice, l_quantity), 6) FROM lineitem) AS corr_pq,
      |  (SELECT round(covar_samp(l_extendedprice, l_quantity), 4) FROM lineitem) AS cov_s,
      |  (SELECT round(covar_pop(l_extendedprice, l_quantity), 4) FROM lineitem) AS cov_p
      |FROM moments""".stripMargin

  val caps: Seq[Capability] = Seq(
    Capability("q28_rollup", "rollup subtotals with grouping_id", q28, Some(q28Sql)),
    Capability("q29_setops", "intersect / except set operations", q29, Some(q29Sql)),
    Capability("q30_cross_join", "cross join", q30, Some(q30Sql)),
    Capability("q31_product", "custom product aggregate (DeclarativeAggregate)", q31, Some(q31Sql)),
    Capability("q02b_moments", "skewness/kurtosis/corr/covariance", q02b, Some(q02bSql)),
  )
}
