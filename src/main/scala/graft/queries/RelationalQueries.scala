package graft.queries

import graft.{Capability, Det, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator capabilities Q01–Q13 (SURVEY.md §2.5): scan, filter,
  * project, scalar/grouped aggregation, the 8 hash-join types, sort, fetch,
  * top-k, union, distinct/value-counts, unpivot.
  *
  * Mapping rationale (reference → Spark) is in SURVEY.md §2.1; all of these
  * are Catalyst built-ins, so predicate pushdown / column pruning / partial
  * aggregation / broadcast-vs-shuffle join selection come for free.
  */
object RelationalQueries {

  private val cutoff = lit(java.sql.Date.valueOf("1998-09-02"))

  private def discPrice: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q01: scan + filter + project. The filter and the two-column projection
    * both reach the parquet scan (PushedFilters / ReadSchema). */
  private def q01(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(to_date(col("l_shipdate")) <= cutoff)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        discPrice.as("revenue"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q01Sql =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1.0::DOUBLE - l_discount) AS revenue
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Q02: whole-table scalar aggregate (reference scalar_aggregate_node;
    * Spark plans partial+final automatically). */
  private def q02(s: SparkSession, d: String): DataFrame =
    // spread before the 10-accumulator pass: single fixture scan task
    // otherwise (guide §2.5; graft.Tables.spread scaladoc)
    Tables.spread(Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_shipdate"),
          col("l_orderkey"), col("l_linenumber")),
      col("l_orderkey"), col("l_linenumber")).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_partkey")).as("n_parts"),
      Det.dsum(col("l_quantity")).as("sum_qty"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"),
      Det.davg(col("l_extendedprice")).as("avg_price"),
      round(stddev_samp(col("l_discount")), 6).as("std_disc"),
      round(var_samp(col("l_discount")), 6).as("var_disc"),
      min(to_date(col("l_shipdate"))).as("min_ship"),
      max(to_date(col("l_shipdate"))).as("max_ship"))

  private val q02Sql =
    s"""SELECT COUNT(*) AS n_rows,
       |  COUNT(DISTINCT l_partkey) AS n_parts,
       |  ${Det.sqlSum("l_quantity")} AS sum_qty,
       |  MIN(l_extendedprice) AS min_price,
       |  MAX(l_extendedprice) AS max_price,
       |  ${Det.sqlAvg("l_extendedprice")} AS avg_price,
       |  ROUND(STDDEV_SAMP(l_discount), 6) AS std_disc,
       |  ROUND(VAR_SAMP(l_discount), 6) AS var_disc,
       |  MIN(CAST(l_shipdate AS DATE)) AS min_ship,
       |  MAX(CAST(l_shipdate AS DATE)) AS max_ship
       |FROM lineitem""".stripMargin

  /** Q03: grouped aggregation, TPC-H Q1 shape — the flagship query
    * (reference trace: cpp/src/arrow/acero/tpch_benchmark.cc:39-114). */
  private[graft] def q03(s: SparkSession, d: String): DataFrame = {
    val charge = discPrice * (lit(1.0) + col("l_tax"))
    Tables.lineitem(s, d)
      .filter(to_date(col("l_shipdate")) <= cutoff)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(discPrice).as("sum_disc_price"),
        Det.dsum(charge).as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q03Sql = {
    val disc = "l_extendedprice * (1.0::DOUBLE - l_discount)"
    val charge = s"$disc * (1.0::DOUBLE + l_tax)"
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.sqlSum("l_quantity")} AS sum_qty,
       |  ${Det.sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${Det.sqlSum(disc)} AS sum_disc_price,
       |  ${Det.sqlSum(charge)} AS sum_charge,
       |  ${Det.sqlAvg("l_quantity")} AS avg_qty,
       |  ${Det.sqlAvg("l_extendedprice")} AS avg_price,
       |  ${Det.sqlAvg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  /** Q03b: the flagship shape submitted as SQL TEXT through
    * `spark.sql(...)` — the front end the reference lacks entirely (no
    * SQL parser, plans built programmatically or via Substrait; SURVEY.md
    * §3.3 declares SQL a strict superset of the Substrait consumer).
    * Catalyst analyzes/optimizes text and DataFrame plans identically, so
    * this gates the parser path against the same oracle as q03. */
  private def q03b(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0D - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0D - l_discount) * (1.0D + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM graft_lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** Q04: inner equi-join + aggregation. Orders side is large → shuffle
    * hash/sort-merge join on the key; AQE picks at runtime. */
  private def q04(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))

  private val q04Sql =
    s"""SELECT o_orderpriority,
       |  COUNT(*) AS n_items,
       |  ${Det.sqlSum("l_quantity")} AS sum_qty
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** Q04b: the same join/aggregate as q04 through the explicit salted
    * skew-join operator ([[graft.operators.Skew.saltedJoin]]): the probe
    * side carries a deterministic 8-way salt and the build side is
    * replicated across all salts, so one hot orderkey's rows spread over
    * 8 shuffle partitions instead of hot-spotting one reducer. AQE's
    * runtime skew split (on in GraftSession) is the default path; this
    * gates the manual fallback a planner reaches for when the skew is
    * known up front (SURVEY.md "Partitioning & shuffle": salting for
    * skew). Same oracle as q04 — salting must not change a single row. */
  private def q04b(s: SparkSession, d: String): DataFrame =
    graft.operators.Skew
      .saltedJoin(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity")),
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey"), col("o_orderkey"), nSalts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))

  /** Q05: multi-way star join. Dimension tables (nation, region) are tiny →
    * broadcast explicitly; customer/orders fall under AQE's runtime
    * broadcast threshold at small SF and shuffle at scale. */
  private def q05(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        Det.dsum(discPrice).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))

  private val q05Sql =
    s"""SELECT r_name, n_name,
       |  ${Det.sqlSum("l_extendedprice * (1.0::DOUBLE - l_discount)")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  /** Q06: left / right / full outer joins — null-production semantics
    * checked via matched/unmatched counts per join type. */
  private def q06(s: SparkSession, d: String): DataFrame = {
    def one(jt: String): DataFrame =
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), jt)
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_orders"),
          count(col("c_custkey")).as("n_cust"))
        .select(lit(jt).as("join_type"), col("n_rows"), col("n_orders"), col("n_cust"))
    one("left_outer").union(one("right_outer")).union(one("full_outer"))
      .orderBy(col("join_type"))
  }

  private val q06Sql = {
    def one(tag: String, sqlJoin: String) =
      s"""SELECT '$tag' AS join_type, COUNT(*) AS n_rows,
         |  COUNT(o_orderkey) AS n_orders, COUNT(c_custkey) AS n_cust
         |FROM customer $sqlJoin orders ON c_custkey = o_custkey""".stripMargin
    s"""SELECT * FROM (
       |${one("left_outer", "LEFT JOIN")}
       |UNION ALL
       |${one("right_outer", "RIGHT JOIN")}
       |UNION ALL
       |${one("full_outer", "FULL JOIN")}
       |) ORDER BY join_type""".stripMargin
  }

  /** Q07: semi / anti joins (reference LEFT_SEMI / LEFT_ANTI;
    * RIGHT_SEMI/ANTI = operand swap). */
  private def q07(s: SparkSession, d: String): DataFrame = {
    def one(jt: String, tag: String): DataFrame =
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), jt)
        .agg(count(lit(1)).as("n"))
        .select(lit(tag).as("kind"), col("n"))
    one("left_semi", "semi").union(one("left_anti", "anti"))
      .orderBy(col("kind"))
  }

  private val q07Sql =
    """SELECT * FROM (
      |SELECT 'semi' AS kind, COUNT(*) AS n FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT 'anti' AS kind, COUNT(*) AS n FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |) ORDER BY kind""".stripMargin

  /** Q08: null-safe equality join with a residual (non-equi) predicate —
    * reference JoinKeyCmp::IS + residual filter
    * (cpp/src/arrow/acero/options.h:561,676). */
  private def q08(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(
        Tables.orders(s, d),
        col("l_orderkey") <=> col("o_orderkey") &&
          col("l_quantity") > col("o_totalprice") / lit(1000.0))
      .agg(
        count(lit(1)).as("n"),
        Det.dsum(col("l_extendedprice")).as("sum_price"))

  private val q08Sql =
    s"""SELECT COUNT(*) AS n,
       |  ${Det.sqlSum("l_extendedprice")} AS sum_price
       |FROM lineitem JOIN orders
       |  ON l_orderkey IS NOT DISTINCT FROM o_orderkey
       |  AND l_quantity > o_totalprice / 1000.0::DOUBLE""".stripMargin

  /** Q09: total sort + offset/limit fetch on a sequenced stream
    * (reference fetch_node). */
  private def q09(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .offset(10).limit(20)

  private val q09Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20 OFFSET 10""".stripMargin

  /** Q10: top-k (reference select_k sink → Spark TakeOrderedAndProject,
    * which avoids a full sort shuffle). */
  private def q10(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(5)

  private val q10Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 5""".stripMargin

  /** Q11: UNION ALL of heterogenous relations (reference union_node). */
  private def q11(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(lit("customer").as("src"), col("c_custkey").as("key"), col("c_name").as("name"))
      .union(Tables.supplier(s, d)
        .select(lit("supplier").as("src"), col("s_suppkey").as("key"), col("s_name").as("name")))
      .orderBy(col("src"), col("key"))

  private val q11Sql =
    """SELECT * FROM (
      |SELECT 'customer' AS src, c_custkey AS key, c_name AS name FROM customer
      |UNION ALL
      |SELECT 'supplier' AS src, s_suppkey AS key, s_name AS name FROM supplier
      |) ORDER BY src, key""".stripMargin

  /** Q12: distinct + value_counts (reference unique / value_counts kernels
    * → one hash aggregate). */
  private def q12(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  private val q12Sql =
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q13: unpivot / pivot_longer (reference pivot_longer_node). */
  private def q13(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(
        Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")),
        "measure", "value")
      .orderBy(col("p_partkey"), col("measure"))

  private val q13Sql =
    """SELECT * FROM (
      |SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
      |UNION ALL
      |SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value FROM part
      |) ORDER BY p_partkey, measure""".stripMargin

  val caps: Seq[Capability] = Seq(
    Capability("q01_filter_project", "scan + filter + project with pushdown", q01, Some(q01Sql)),
    Capability("q02_scalar_agg", "whole-table scalar aggregates", q02, Some(q02Sql)),
    Capability("q03_group_agg", "grouped aggregation (TPC-H Q1 shape)", q03, Some(q03Sql), bench = true),
    Capability("q03b_sql_text", "flagship shape via the spark.sql text front end", q03b, Some(q03Sql)),
    Capability("q04_inner_join", "inner equi-join + aggregation", q04, Some(q04Sql), bench = true),
    Capability("q04b_salted_join", "manually salted skew join (same rows as q04)", q04b, Some(q04Sql)),
    Capability("q05_star_join", "multi-way star join with broadcast dims", q05, Some(q05Sql), bench = true),
    Capability("q06_outer_joins", "left/right/full outer join null semantics", q06, Some(q06Sql)),
    Capability("q07_semi_anti", "left semi / left anti joins", q07, Some(q07Sql)),
    Capability("q08_nullsafe_residual", "null-safe equi-join + residual predicate", q08, Some(q08Sql)),
    Capability("q09_sort_fetch", "total sort + offset/limit", q09, Some(q09Sql)),
    Capability("q10_topk", "top-k via TakeOrderedAndProject", q10, Some(q10Sql)),
    Capability("q11_union_all", "union all of two relations", q11, Some(q11Sql)),
    Capability("q12_value_counts", "distinct + value counts", q12, Some(q12Sql)),
    Capability("q13_unpivot", "unpivot (pivot_longer)", q13, Some(q13Sql)),
  )
}
