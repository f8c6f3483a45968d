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

  /** Q28b: CUBE — all four grouping combinations (the rollup's missing
    * (Ø, l_linestatus) slice), same null-ordering pinning as q28. */
  private def q28b(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(
        col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  private val q28bSql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.sqlSum("l_quantity")} AS sum_qty,
       |  COUNT(*) AS n,
       |  GROUPING(l_returnflag, l_linestatus) AS gid
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Q28c: explicit GROUPING SETS — an IRREGULAR set list no rollup or
    * cube can express ((flag, status) detail, a (ship-year) slice,
    * and the grand total, but NOT the intermediate (flag) level): the
    * reporting shape that computes several independent summaries in ONE
    * pass over the fact table instead of three. Spark plans it as a
    * single Expand + one aggregate — at 100 TB that is one scan and one
    * shuffle where three UNION'd queries would pay three. grouping_id()
    * disambiguates the set each output row belongs to (same bit order
    * as DuckDB's GROUPING()); null ordering pinned like q28/q28b. */
  private def q28c(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .withColumn("ship_year", year(col("l_shipdate")))
    li.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("ship_year")), Seq()),
        col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(
        col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first,
        col("ship_year").asc_nulls_first)
  }

  private val q28cSql =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(year(l_shipdate) AS INT) AS ship_year,
       |  ${Det.sqlSum("l_quantity")} AS sum_qty,
       |  COUNT(*) AS n,
       |  GROUPING(l_returnflag, l_linestatus, year(l_shipdate)) AS gid
       |FROM lineitem
       |GROUP BY GROUPING SETS
       |  ((l_returnflag, l_linestatus), (year(l_shipdate)), ())
       |ORDER BY gid, l_returnflag ASC NULLS FIRST,
       |  l_linestatus ASC NULLS FIRST, ship_year ASC NULLS FIRST""".stripMargin

  /** Q27e: approx_top_k frequent-items sketch (Spark 4 builtin). Gated
    * exactly: `event_type` has 5 distinct values, far below the sketch's
    * tracked-item capacity, so the "approximate" counts are provably
    * exact and the oracle is a plain exact group-by. k covers every
    * distinct value, so boundary ties cannot flake the gate. */
  private def q27e(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .agg(expr("approx_top_k(event_type, 5)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("cnt"))
      .orderBy(col("cnt").desc, col("item"))

  private val q27eSql =
    """SELECT event_type AS item, COUNT(*) AS cnt
      |FROM events GROUP BY event_type
      |ORDER BY cnt DESC, item""".stripMargin

  /** Q42: GROUPED top-k through the bounded-heap [[graft.functions.expr
    * .TopKAgg]] aggregate (the reference's select_k as a mergeable agg):
    * map-side combine ships at most k (score, id) pairs per group per
    * task instead of shuffling every row to a per-group sort — the
    * grouped sibling of q10's TakeOrderedAndProject. Oracle recomputes
    * with the window formulation the aggregate replaces. */
  private def q42(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val rid = (col("l_orderkey") * 10 + col("l_linenumber")).cast("long")
    li.groupBy(col("l_returnflag"))
      .agg(graft.functions.expr.TopKAgg(col("l_extendedprice"), rid, 5).as("tk"))
      .select(col("l_returnflag"), posexplode(col("tk")))
      .select(col("l_returnflag"), (col("pos") + 1).cast("int").as("rank"),
        col("col.score").as("score"), col("col.rid").as("rid"))
      .orderBy(col("l_returnflag"), col("rank"))
  }

  private val q42Sql =
    """SELECT l_returnflag, rank, score, rid FROM (
      |  SELECT l_returnflag, l_extendedprice AS score,
      |    l_orderkey*10+l_linenumber AS rid,
      |    CAST(row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice DESC, l_orderkey*10+l_linenumber) AS INT) AS rank
      |  FROM lineitem) t
      |WHERE rank <= 5
      |ORDER BY l_returnflag, rank""".stripMargin

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

  /** Q38: banded range join (point-in-interval). Spark plans a pure
    * inequality join as a nested-loop — [[graft.operators.RangeJoin]]
    * turns it into an equi-join on a time bin (see its scaladoc for the
    * exactly-once argument). Points = every order (epoch day); intervals =
    * a deterministic ~1% slice of orders opening a 1–29-day window at
    * their date; binWidth 32 ≥ max length bounds the interval fan-out at
    * 2×. The oracle is DuckDB's native inequality join (IEJoin). */
  private def q38(s: SparkSession, d: String): DataFrame = {
    val od = Tables.orders(s, d)
    val pts = od.select(
      col("o_orderkey").as("pt_key"),
      col("o_totalprice").as("pt_price"),
      unix_date(to_date(col("o_orderdate"))).cast("long").as("pt_day"))
    val iv = od
      .filter(pmod(col("o_orderkey"), lit(97)) === 0)
      .select(
        col("o_orderkey").as("iv_key"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("iv_start"))
      .withColumn("iv_end", col("iv_start") + pmod(col("iv_key"), lit(29)) + lit(1))
    graft.operators.RangeJoin
      .pointInInterval(pts, "pt_day", iv, "iv_start", "iv_end", binWidth = 32)
      .groupBy(col("iv_key"))
      .agg(
        count(lit(1)).as("n_pts"),
        Det.dsum(col("pt_price")).as("sum_price"))
      .orderBy(col("iv_key"))
  }

  private val q38Sql =
    s"""WITH pts AS (
       |  SELECT o_orderkey AS pt_key, o_totalprice AS pt_price,
       |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS pt_day
       |  FROM orders),
       |iv AS (
       |  SELECT o_orderkey AS iv_key,
       |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS iv_start,
       |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
       |      + (o_orderkey % 29) + 1 AS iv_end
       |  FROM orders WHERE o_orderkey % 97 = 0)
       |SELECT iv_key, COUNT(*) AS n_pts,
       |  ${Det.sqlSum("pt_price")} AS sum_price
       |FROM pts JOIN iv ON pt_day BETWEEN iv_start AND iv_end
       |GROUP BY iv_key ORDER BY iv_key""".stripMargin

  /** Q38b: banded interval-overlap join — both sides are interval sets
    * (distinct deterministic slices of orders with 1–13 and 1–29-day
    * windows); a pair is emitted exactly once, in the bin containing the
    * overlap start. */
  private def q38b(s: SparkSession, d: String): DataFrame = {
    val od = Tables.orders(s, d)
    def ivs(mod: Int, lenMod: Int, p: String): DataFrame =
      od.filter(pmod(col("o_orderkey"), lit(mod)) === 0)
        .select(
          col("o_orderkey").as(s"${p}_key"),
          unix_date(to_date(col("o_orderdate"))).cast("long").as(s"${p}_s"))
        .withColumn(s"${p}_e",
          col(s"${p}_s") + pmod(col(s"${p}_key"), lit(lenMod)) + lit(1))
    graft.operators.RangeJoin
      .intervalOverlap(ivs(89, 13, "l"), "l_s", "l_e", ivs(97, 29, "r"), "r_s", "r_e",
        binWidth = 32)
      .groupBy(col("l_key"))
      .agg(
        count(lit(1)).as("n_overlaps"),
        min(col("r_key")).as("first_r"),
        max(col("r_key")).as("last_r"))
      .orderBy(col("l_key"))
  }

  private val q38bSql =
    """WITH l AS (
      |  SELECT o_orderkey AS l_key,
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS l_s,
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      + (o_orderkey % 13) + 1 AS l_e
      |  FROM orders WHERE o_orderkey % 89 = 0),
      |r AS (
      |  SELECT o_orderkey AS r_key,
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS r_s,
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      + (o_orderkey % 29) + 1 AS r_e
      |  FROM orders WHERE o_orderkey % 97 = 0)
      |SELECT l_key, COUNT(*) AS n_overlaps,
      |  MIN(r_key) AS first_r, MAX(r_key) AS last_r
      |FROM l JOIN r ON l_s <= r_e AND r_s <= l_e
      |GROUP BY l_key ORDER BY l_key""".stripMargin

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

  /** Q02f: Spearman rank correlation ([[graft.operators.Spearman]]) over
    * price/quantity — the rank-kernel composition (reference
    * `vector_rank.cc` + Pearson). The oracle computes the identical
    * fractional (average-tie) ranks with window functions; the Spark
    * side ranks through a range-partitioned sort + zipWithIndex, never a
    * single-partition window. */
  private def q02f(s: SparkSession, d: String): DataFrame =
    graft.operators.Spearman.rho(
      Tables.lineitem(s, d), "l_extendedprice", "l_quantity")

  private val q02fSql =
    """WITH p AS (
      |  SELECT CAST(l_extendedprice AS DOUBLE) AS a,
      |         CAST(l_quantity AS DOUBLE) AS b
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
      |r AS (
      |  SELECT
      |    rank() OVER (ORDER BY a) + (count(*) OVER (PARTITION BY a) - 1) / 2.0 AS ra,
      |    rank() OVER (ORDER BY b) + (count(*) OVER (PARTITION BY b) - 1) / 2.0 AS rb
      |  FROM p)
      |SELECT round(corr(ra, rb), 6) AS rho, COUNT(*) AS n FROM r""".stripMargin

  /** Q02h: grouped Spearman — one rho per return flag through
    * group-partitioned rank windows (the grouped variant needs no global
    * machinery; see [[graft.operators.Spearman.rhoGrouped]]). */
  private def q02h(s: SparkSession, d: String): DataFrame =
    graft.operators.Spearman.rhoGrouped(
      Tables.lineitem(s, d), "l_returnflag", "l_extendedprice", "l_quantity")
      .orderBy(col("l_returnflag"))

  private val q02hSql =
    """WITH p AS (
      |  SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS a,
      |         CAST(l_quantity AS DOUBLE) AS b
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
      |r AS (
      |  SELECT g,
      |    rank() OVER (PARTITION BY g ORDER BY a)
      |      + (count(*) OVER (PARTITION BY g, a) - 1) / 2.0 AS ra,
      |    rank() OVER (PARTITION BY g ORDER BY b)
      |      + (count(*) OVER (PARTITION BY g, b) - 1) / 2.0 AS rb
      |  FROM p)
      |SELECT g AS l_returnflag, round(corr(ra, rb), 6) AS rho, COUNT(*) AS n
      |FROM r GROUP BY g ORDER BY g""".stripMargin

  /** Q02g: the least-squares regression aggregate family (regr_slope /
    * intercept / r2 / count / avgx / avgy) — grouped, price ~ quantity
    * per return flag. Both engines implement the same closed forms over
    * double moments; round@6 absorbs accumulation-order ulps (the q02b
    * corr precedent). */
  private def q02g(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("double").as("y"),
        col("l_quantity").cast("double").as("x"))
      .groupBy(col("l_returnflag"))
      .agg(
        round(regr_slope(col("y"), col("x")), 6).as("slope"),
        round(regr_intercept(col("y"), col("x")), 6).as("intercept"),
        round(regr_r2(col("y"), col("x")), 6).as("r2"),
        regr_count(col("y"), col("x")).as("n"),
        round(regr_avgx(col("y"), col("x")), 6).as("avgx"),
        round(regr_avgy(col("y"), col("x")), 6).as("avgy"))
      .orderBy(col("l_returnflag"))

  private val q02gSql =
    """SELECT l_returnflag,
      |  round(regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) AS slope,
      |  round(regr_intercept(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) AS intercept,
      |  round(regr_r2(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) AS r2,
      |  CAST(regr_count(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) AS BIGINT) AS n,
      |  round(regr_avgx(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) AS avgx,
      |  round(regr_avgy(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) AS avgy
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Q02d: the reference's aggregate OPTION surfaces
    * (`ScalarAggregateOptions(skip_nulls, min_count)`,
    * cpp/src/arrow/compute/api_aggregate.h:36-44, and
    * `VarianceOptions(ddof)`, api_aggregate.h:84) via
    * [[graft.functions.AggOps]]: population vs sample variance/stddev,
    * a satisfied and an unsatisfiable min_count (the latter must yield
    * NULL), and skip_nulls=false over a column with and without nulls.
    * The nullable column is nullif(l_discount, 0) — deterministic and
    * identical in both engines. */
  private def q02d(s: SparkSession, d: String): DataFrame = {
    import graft.functions.AggOps
    val li = Tables.lineitem(s, d)
      .withColumn("disc_n", nullif(col("l_discount"), lit(java.math.BigDecimal.ZERO)))
    li.agg(
      round(AggOps.varianceDdof(col("l_quantity"), 0), 6).as("var_ddof0"),
      round(AggOps.varianceDdof(col("l_quantity"), 1), 6).as("var_ddof1"),
      round(AggOps.varianceDdof(col("l_quantity"), 2), 6).as("var_ddof2"),
      round(AggOps.stddevDdof(col("l_quantity"), 0), 6).as("sd_ddof0"),
      round(AggOps.stddevDdof(col("l_quantity"), 1), 6).as("sd_ddof1"),
      count(col("disc_n")).as("n_nonnull"),
      AggOps.withMinCount(sum(col("disc_n")), col("disc_n"), 3).as("sum_min3"),
      AggOps.withMinCount(sum(col("disc_n")), col("disc_n"), 2000000000).as("sum_min_2b"),
      AggOps.noSkipNulls(sum(col("disc_n")), col("disc_n")).as("sum_strict_nulls"),
      AggOps.noSkipNulls(sum(col("l_quantity")), col("l_quantity")).as("sum_strict_clean"))
  }

  private val q02dSql =
    """WITH li AS (SELECT l_quantity, nullif(l_discount, 0) AS disc_n FROM lineitem)
      |SELECT
      |  round(var_pop(l_quantity), 6) AS var_ddof0,
      |  round(var_samp(l_quantity), 6) AS var_ddof1,
      |  round(var_pop(l_quantity) * count(l_quantity)
      |        / (count(l_quantity) - 2), 6) AS var_ddof2,
      |  round(stddev_pop(l_quantity), 6) AS sd_ddof0,
      |  round(stddev_samp(l_quantity), 6) AS sd_ddof1,
      |  count(disc_n) AS n_nonnull,
      |  CASE WHEN count(disc_n) >= 3 THEN sum(disc_n) END AS sum_min3,
      |  CASE WHEN count(disc_n) >= 2000000000 THEN sum(disc_n) END AS sum_min_2b,
      |  CASE WHEN count(CASE WHEN disc_n IS NULL THEN 1 END) = 0
      |       THEN sum(disc_n) END AS sum_strict_nulls,
      |  CASE WHEN count(CASE WHEN l_quantity IS NULL THEN 1 END) = 0
      |       THEN sum(l_quantity) END AS sum_strict_clean
      |FROM li""".stripMargin

  /** Q32: deterministic mode (reference `mode` kernel,
    * cpp/src/arrow/compute/kernels/aggregate_mode.cc). Spark's builtin
    * `mode()` breaks ties arbitrarily, so this uses the portable count +
    * rank formulation: highest count wins, smallest value breaks ties —
    * identical in both engines. */
  private def q32(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cnt").desc, col("l_quantity"))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
      .orderBy(col("l_returnflag"))
  }

  private val q32Sql =
    """SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM (
      |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt,
      |    row_number() OVER (PARTITION BY l_returnflag
      |                       ORDER BY COUNT(*) DESC, l_quantity) AS rn
      |  FROM lineitem GROUP BY l_returnflag, l_quantity
      |) WHERE rn = 1 ORDER BY l_returnflag""".stripMargin

  /** Q33: winsorized mean (reference `winsorize` kernel). Cutoffs are
    * interpolated quantiles rounded to 2 dp before clamping so both
    * engines clamp against identical values. The cutoffs come from the
    * distributed rank-selection operator (graft.operators.Quantiles.exact)
    * rather than a `percentile()` full-column buffer, and reach the clamp
    * pass as broadcast literals — one distributed sort + one scan instead
    * of a single-reducer sort of all of lineitem. PlanSpec asserts no
    * Percentile aggregate appears in this query's plan. */
  private def q33(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val Seq(lo0, hi0) =
      graft.operators.Quantiles.exact(li, "l_extendedprice", Seq(0.05, 0.95))
    // round the cutoffs with the same Spark `round` semantics as before
    val lo = round(lit(lo0), 2)
    val hi = round(lit(hi0), 2)
    val clamped = least(greatest(col("l_extendedprice"), lo), hi)
    li.agg(
      first(lo).as("lo"),
      first(hi).as("hi"),
      Det.davg(clamped).as("winsor_mean"),
      count(lit(1)).as("n"))
  }

  private val q33Sql = {
    val clamped = "least(greatest(l_extendedprice, c.lo), c.hi)"
    s"""WITH c AS (SELECT round(quantile_cont(l_extendedprice, 0.05), 2) AS lo,
       |                  round(quantile_cont(l_extendedprice, 0.95), 2) AS hi
       |           FROM lineitem)
       |SELECT c.lo AS lo, c.hi AS hi,
       |  CAST(SUM(CAST($clamped AS DECIMAL(25,6))) AS DOUBLE) / COUNT($clamped) AS winsor_mean,
       |  COUNT(*) AS n
       |FROM lineitem, c GROUP BY c.lo, c.hi""".stripMargin
  }

  /** Q33b: GROUPED winsorized mean — per-group cutoffs from the
    * single-shuffle grouped rank-selection operator
    * (Quantiles.exactGrouped), broadcast-joined back for the clamp pass.
    * The composition a real pipeline uses: grouped quantiles → clamp →
    * grouped aggregate, with no per-group value buffer anywhere. */
  private def q33b(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val cuts = graft.operators.Quantiles
      .exactGrouped(li, "l_returnflag", "l_extendedprice", Seq(0.05, 0.95))
      .select(
        col("l_returnflag").as("g"),
        round(col("q0"), 2).as("lo"),
        round(col("q1"), 2).as("hi"))
    val clamped = least(greatest(col("l_extendedprice"), col("lo")), col("hi"))
    li.join(broadcast(cuts), col("l_returnflag") === col("g"))
      .groupBy(col("l_returnflag"))
      .agg(
        first(col("lo")).as("lo"),
        first(col("hi")).as("hi"),
        Det.davg(clamped).as("winsor_mean"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private val q33bSql = {
    val clamped = "least(greatest(l_extendedprice, c.lo), c.hi)"
    s"""WITH c AS (
       |  SELECT l_returnflag AS g,
       |    round(quantile_cont(l_extendedprice, 0.05), 2) AS lo,
       |    round(quantile_cont(l_extendedprice, 0.95), 2) AS hi
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, c.lo AS lo, c.hi AS hi,
       |  CAST(SUM(CAST($clamped AS DECIMAL(25,6))) AS DOUBLE) / COUNT($clamped) AS winsor_mean,
       |  COUNT(*) AS n
       |FROM lineitem JOIN c ON l_returnflag = c.g
       |GROUP BY l_returnflag, c.lo, c.hi
       |ORDER BY l_returnflag""".stripMargin
  }

  /** Q34: index-of-first-match (reference `index` kernel) — first event id
    * per user where the predicate holds. */
  private def q34(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("value") > 300.0, col("event_id"))).as("first_big_event"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  private val q34Sql =
    """SELECT user_id,
      |  MIN(CASE WHEN value > 300.0::DOUBLE THEN event_id END) AS first_big_event,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Q35: gap-based sessionization (30-minute gaps) — the batch twin of the
    * flatMapGroupsWithState streaming path (graft.streaming.Sessionize;
    * parity asserted in SessionizeSpec). */
  private def q35(s: SparkSession, d: String): DataFrame =
    graft.streaming.Sessionize.sessionsBatch(Tables.events(s, d), 30)
      .orderBy(col("user_id"), col("session_id"))

  private val q35Sql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
       |                              ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM e)
       |-- session_id is a SUM() over ints → HUGEINT in DuckDB, which lands
       |-- as float64 in pandas; cast to BIGINT so both engines emit ints
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       |  MIN(tsu) AS session_start, MAX(tsu) AS session_end,
       |  ${Det.sqlSum("value")} AS sum_value
       |FROM sess GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** Q36: JSON column parsing (reference json extension type /
    * cpp/src/arrow/json) over `events.props`: both the path-extraction and
    * the typed from_json routes. */
  private def q36(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k").as("k2"))
      .orderBy(col("event_id"))

  private val q36Sql =
    """SELECT event_id,
      |  CAST(props->>'$.k' AS INT) AS k,
      |  CAST(props->>'$.k' AS INT) AS k2
      |FROM events ORDER BY event_id""".stripMargin

  /** Q36b: semi-structured JSON via Spark 4's VariantType (the SURVEY
    * §1.2 mapping for the reference's json extension type,
    * cpp/src/arrow/extension/json.h): parse once with `parse_json`,
    * then typed path access with `variant_get` / missing-path `null`
    * semantics with `try_variant_get` — the open-schema route, vs q36's
    * fixed-schema from_json. */
  private def q36b(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(
        col("event_id"),
        variant_get(col("v"), "$.k", "int").as("k"),
        variant_get(col("v"), "$.k", "string").as("ks"),
        try_variant_get(col("v"), "$.does_not_exist", "int").as("missing"))
      .orderBy(col("event_id"))

  private val q36bSql =
    """SELECT event_id,
      |  CAST(props->>'$.k' AS INT) AS k,
      |  props->>'$.k' AS ks,
      |  CAST(props->>'$.does_not_exist' AS INT) AS missing
      |FROM events ORDER BY event_id""".stripMargin

  /** Q37: union-type encoding (reference SPARSE/DENSE_UNION,
    * cpp/src/arrow/type.h:1446 — the struct+tag mapping declared in
    * SURVEY §1.2, built/consumed by [[graft.types.UnionOps]]): a
    * double-or-string union over orders, with branch extraction and
    * tag-dispatched case analysis. */
  private def q37(s: SparkSession, d: String): DataFrame = {
    import graft.types.UnionOps
    val tag = when(col("o_orderkey") % 2 === 0, 0).otherwise(1)
    val withU = Tables.orders(s, d).withColumn("u",
      UnionOps.makeUnion(tag,
        "price" -> col("o_totalprice"),
        "prio" -> col("o_orderpriority")))
    withU.select(
      col("o_orderkey"),
      UnionOps.unionTag(col("u")).as("tag"),
      UnionOps.unionExtract(col("u"), 0, "price").as("price_branch"),
      UnionOps.unionExtract(col("u"), 1, "prio").as("prio_branch"),
      UnionOps.unionMatch(col("u"),
        "price" -> (p => floor(p).cast("double")),
        "prio" -> (p => length(p).cast("double"))).as("matched"))
      .orderBy(col("o_orderkey"))
  }

  private val q37Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END AS tag,
      |  CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS price_branch,
      |  CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderpriority END AS prio_branch,
      |  CASE WHEN o_orderkey % 2 = 0 THEN CAST(FLOOR(o_totalprice) AS DOUBLE)
      |       ELSE CAST(length(o_orderpriority) AS DOUBLE) END AS matched
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val caps: Seq[Capability] = Seq(
    Capability("q28_rollup", "rollup subtotals with grouping_id", q28, Some(q28Sql)),
    Capability("q28b_cube", "cube over both grouping dimensions", q28b, Some(q28bSql)),
    Capability("q28c_grouping_sets",
      "irregular GROUPING SETS: three independent summaries in one Expand pass",
      q28c, Some(q28cSql)),
    Capability("q27e_approx_topk", "approx_top_k frequent-items sketch (exact at this cardinality)", q27e, Some(q27eSql)),
    Capability("q42_grouped_topk", "grouped top-k via bounded-heap mergeable aggregate (select_k)", q42,
      Some(q42Sql)),
    Capability("q29_setops", "intersect / except set operations", q29, Some(q29Sql)),
    Capability("q30_cross_join", "cross join", q30, Some(q30Sql)),
    Capability("q38_range_join", "banded point-in-interval range join (no nested-loop)", q38,
      Some(q38Sql), bench = true),
    Capability("q38b_interval_overlap", "banded interval-overlap join, exactly-once per pair", q38b,
      Some(q38bSql)),
    Capability("q31_product", "custom product aggregate (DeclarativeAggregate)", q31, Some(q31Sql)),
    Capability("q02b_moments", "skewness/kurtosis/corr/covariance", q02b, Some(q02bSql)),
    Capability("q02f_spearman",
      "Spearman rank correlation (distributed fractional ranks + Pearson)",
      q02f, Some(q02fSql)),
    Capability("q02g_regression",
      "grouped least-squares regression aggregates (slope/intercept/r2/avgx/avgy)",
      q02g, Some(q02gSql)),
    Capability("q02h_grouped_spearman",
      "grouped Spearman rho via group-partitioned fractional-rank windows",
      q02h, Some(q02hSql)),
    Capability("q02d_agg_options", "aggregate options: ddof, skip_nulls, min_count", q02d,
      Some(q02dSql)),
    Capability("q32_mode", "deterministic mode via count+rank", q32, Some(q32Sql)),
    Capability("q33_winsorize", "winsorized mean with quantile cutoffs", q33, Some(q33Sql)),
    Capability("q33b_grouped_winsorize", "per-group winsorized mean via grouped rank-selection cutoffs", q33b,
      Some(q33bSql)),
    Capability("q34_first_match", "index of first matching value per group", q34, Some(q34Sql)),
    Capability("q35_sessionize", "gap-based sessionization (batch twin of streaming state op)", q35, Some(q35Sql)),
    Capability("q36_json", "JSON path extraction + typed from_json", q36, Some(q36Sql)),
    Capability("q36b_variant", "VariantType open-schema JSON (parse_json/variant_get)", q36b, Some(q36bSql)),
    Capability("q37_union", "union type as struct+tag (make/extract/match)", q37, Some(q37Sql)),
  )
}
