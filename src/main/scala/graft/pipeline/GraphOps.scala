package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph scoring over edge-list DataFrames — the link-authority
  * side of corpus curation (Common Crawl publishes exactly this: per-host
  * PageRank/harmonic-centrality rankings used to weight crawl frontiers
  * and filter low-authority domains). Complements the connected-component
  * machinery in [[Dedup]]: CC groups, PageRank scores.
  */
object GraphOps {

  /** Fixed-iteration damped PageRank over a directed edge list, with the
    * standard dangling-node treatment: each iteration the rank mass
    * sitting on sink nodes (no out-edges) is redistributed uniformly, so
    * total mass stays 1 on ANY graph — without it, scores decay below 1
    * and are wrong on every real web/host graph, where sinks are
    * everywhere (the Common Crawl host graph is the motivating input).
    *
    * Engine-portable determinism (the gate runs the identical arithmetic
    * in DuckDB): per-edge contributions `rank/outdeg` are IEEE doubles
    * rounded at `roundContrib` digits, summed EXACTLY as decimal(38,18)
    * (order-independent — double sums are not); the dangling mass is the
    * decimal-exact sum of sink ranks, its per-node share rounded at the
    * same `roundContrib`; the damping update stays in IEEE double. Fixed
    * iteration count, not convergence-tested: a deterministic gate cannot
    * hinge on a float threshold.
    *
    * Scale shape: one src-keyed equi-join plus one dst-keyed aggregate
    * per iteration — both shuffle (node, contribution) pairs only, never
    * adjacency payloads — plus one 1-row sink-mass aggregate broadcast
    * into the update (an anti-join of the small ranks frame against the
    * persisted degree frame; no extra pass over edges). The node count is
    * the op's single bounded driver exchange (one long). Ranks are
    * localCheckpoint-ed every round — including the last, so the cached
    * edge/node/degree frames can be unpersisted before returning instead
    * of leaking blocks for the session's lifetime. */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85,
      roundContrib: Int = 12): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0, s"damping in (0,1), got $damping")
    val g = prepare(edges, srcCol, dstCol)
    var ranks = g.nodes.withColumn("rank", lit(1.0 / g.n))
    var it = 0
    while (it < iterations) {
      // materialize every round: chaining lazily makes iteration i replay
      // every earlier round (O(iterations²) joins) and grows the lineage
      // unboundedly — the same localCheckpoint policy as the CC loop. The
      // FINAL round checkpoints too (ranks is just (node, rank) pairs) so
      // the returned frame no longer references the cached inputs.
      ranks = iterate(g, ranks, damping, roundContrib).localCheckpoint()
      it += 1
    }
    g.e.unpersist(); g.nodes.unpersist(); g.deg.unpersist()
    ranks
  }

  /** The persisted graph state one rank iteration reads: edges
    * pre-partitioned by src, the node set, out-degrees, and the node
    * count. */
  private[graft] final case class PrGraph(
      e: DataFrame, nodes: DataFrame, deg: DataFrame, n: Long)

  /** The classic Pregel layout: edges hash-partitioned by src ONCE and
    * persisted — every iteration's rank join then reuses the cached
    * partitioning and only the (tiny) rank table moves; nodes and degrees
    * are persisted on the same keys they join/aggregate on. Without the
    * persists the upstream distinct would recompute per iteration;
    * without the pre-partitioning every iteration would re-shuffle the
    * full edge set. */
  private[graft] def prepare(
      edges: DataFrame, srcCol: String, dstCol: String): PrGraph = {
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).persist(disk)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(disk)
    val n = nodes.count() // bounded driver exchange: one long
    val deg = e.groupBy(col("src")).agg(count(lit(1)).cast("double").as("deg"))
      .persist(disk)
    PrGraph(e, nodes, deg, n)
  }

  /** One damped update. PlanSpec pins this plan: the cached edge frame is
    * never re-shuffled (no exchange on src), only rank-width frames move,
    * and the sink mass rides a broadcast. */
  private[graft] def iterate(
      g: PrGraph, ranks: DataFrame,
      damping: Double, roundContrib: Int): DataFrame = {
    val base = lit((1.0 - damping) / g.n)
    def exactSum(c: Column): Column =
      coalesce(sum(c.cast("decimal(38,18)")).cast("double"), lit(0.0))
    val contribs = g.e
      .join(ranks, g.e("src") === ranks("node"))
      .join(g.deg, "src")
      .select(col("dst").as("node"),
        round(col("rank") / col("deg"), roundContrib).as("contrib"))
    // dangling mass: total rank held by nodes with no out-edges — an
    // anti-join of the (node, rank) frame against the persisted degree
    // frame, reduced to ONE row and broadcast into the update. Its
    // uniform per-node share joins the edge contributions inside the
    // damping term, matching the textbook formulation.
    val sinkMass = ranks
      .join(g.deg, ranks("node") === g.deg("src"), "left_anti")
      .agg(coalesce(sum(col("rank").cast("decimal(38,18)")).cast("double"),
        lit(0.0)).as("dm"))
    g.nodes
      .join(contribs, Seq("node"), "left")
      .groupBy(col("node"))
      .agg(exactSum(col("contrib")).as("csum"))
      .crossJoin(broadcast(sinkMass))
      .select(col("node"),
        (base + lit(damping) *
          (col("csum") + round(col("dm") / g.n, roundContrib))).as("rank"))
  }
}
