package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Capability, Tables}

/** Association-rule mining over per-user event baskets (the classic
  * market-basket readout: which behaviors co-occur beyond chance).
  * Pairwise rules A→B with exact integer co-occurrence counts and one
  * rounded IEEE division per metric — the FP-growth use case at the
  * pair level, which is the level a 100 TB recommendation pipeline
  * actually materializes (higher-order itemsets explode combinatorially
  * and are mined from the pair lattice).
  */
object BasketQueries {

  /** q62_assoc_rules: for every ordered type pair (a ≠ b) the rule
    * a→b with support / confidence / lift. The basket frame is the
    * DISTINCT (user, type) projection, so the pair fan-out per user is
    * bounded by the basket size (item-vocabulary-bounded here; a
    * df-cap on hot items is the scale lever for open vocabularies, the
    * dedup_ngram precedent). One distinct aggregate, one user-keyed
    * self-join on 8-byte keys, broadcast marginals. */
  /** Pairwise rules over any (basket, item) frame — public so the spec
    * can hand-verify closed-form fixtures. */
  def rules(df: DataFrame, userCol: String, itemCol: String): DataFrame = {
    val items = df.select(col(userCol).as("u"), col(itemCol).as("t")).distinct()
    // 1-row user total rides a broadcast cross join — one lazy plan
    val nu = items.agg(countDistinct(col("u")).cast("double").as("n_users"))
    val marg = items.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
    val pairs = items.as("a").join(items.as("b"), Seq("u"))
      .filter(col("a.t") =!= col("b.t"))
      .groupBy(col("a.t").as("ant"), col("b.t").as("cons"))
      .agg(count(lit(1)).as("n_ab"))
    def d2(c: org.apache.spark.sql.Column) = c.cast("double")
    pairs
      .join(broadcast(marg.select(col("t").as("ant"), col("n_t").as("n_a"))), "ant")
      .join(broadcast(marg.select(col("t").as("cons"), col("n_t").as("n_b"))), "cons")
      .crossJoin(broadcast(nu))
      .select(col("ant"), col("cons"), col("n_ab"), col("n_a"), col("n_b"),
        round(d2(col("n_ab")) / col("n_users"), 9).as("support"),
        round(d2(col("n_ab")) / d2(col("n_a")), 9).as("confidence"),
        round(d2(col("n_ab")) * col("n_users") /
          (d2(col("n_a")) * d2(col("n_b"))), 9).as("lift"))
      .orderBy(col("ant"), col("cons"))
  }

  private def assocQ(s: SparkSession, d: String): DataFrame =
    rules(Tables.events(s, d), "user_id", "event_type")

  private val assocSql =
    """WITH items AS (
      |  SELECT DISTINCT user_id AS u, event_type AS t FROM events),
      |nu AS (SELECT CAST(COUNT(DISTINCT u) AS DOUBLE) AS n_users FROM items),
      |marg AS (SELECT t, COUNT(*) AS n_t FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.t AS ant, b.t AS cons, COUNT(*) AS n_ab
      |  FROM items a JOIN items b ON a.u = b.u AND a.t <> b.t
      |  GROUP BY 1, 2)
      |SELECT p.ant, p.cons, p.n_ab, ma.n_t AS n_a, mb.n_t AS n_b,
      |  round(CAST(p.n_ab AS DOUBLE) / nu.n_users, 9) AS support,
      |  round(CAST(p.n_ab AS DOUBLE) / CAST(ma.n_t AS DOUBLE), 9) AS confidence,
      |  round(CAST(p.n_ab AS DOUBLE) * nu.n_users /
      |    (CAST(ma.n_t AS DOUBLE) * CAST(mb.n_t AS DOUBLE)), 9) AS lift
      |FROM pairs p
      |JOIN marg ma ON ma.t = p.ant
      |JOIN marg mb ON mb.t = p.cons
      |CROSS JOIN nu
      |ORDER BY p.ant, p.cons""".stripMargin

  val caps: Seq[Capability] = Seq(
    Capability("q62_assoc_rules",
      "pairwise association rules: support/confidence/lift over user baskets",
      assocQ, Some(assocSql)),
  )
}
