package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Raking (iterative proportional fitting, Deming–Stephan 1940) — the
  * mix-balancing pass that computes per-cell sampling weights so a
  * corpus simultaneously hits TARGET MARGINALS on two categorical
  * dimensions (each language carries equal weight AND each source
  * carries equal weight), the constraint [[Sharding.weightedSample]]'s
  * per-key rates cannot express: a rate per language fixes the language
  * marginal but lets the source marginal land wherever the joint
  * distribution puts it. IPF is the survey-statistics standard
  * (post-stratification raking) and the direct analog of balancing a
  * training mix across domain × language without materializing a
  * resample per dimension.
  *
  * Algorithm: m⁰ = cell share n_rc/N, then alternately scale every row
  * slice to the row target (1/k_rows) and every column slice to the
  * column target (1/k_cols), `iters` full iterations (fixed, unrolled —
  * IPF converges geometrically; on an INDEPENDENT table one iteration
  * is already exact, which the spec pins). Output per observed cell:
  * the fitted joint proportion, the per-document sampling weight
  * m_rc/(n_rc/N) that realizes it, and the achieved marginal shares.
  *
  * Determinism (oracle-exact): cell counts are exact longs; m lives as
  * a 1e-12-scaled long between steps — each step is ONE fixed-order
  * IEEE expression over exact inputs, `round(m · (1/k) · 1e12 /
  * rowsum, 0)`, identical on both engines (the rounded-term idiom at
  * 1e-12 resolution; a cell whose share rounds below 5e-13 pins to 0
  * and stays there — the documented resolution floor, unreachable
  * until a cell's share of the corpus drops below ~1e-12). Readouts
  * round@9 (m_fit) / round@6 (weight, shares).
  *
  * Scale shape: the corpus is touched EXACTLY ONCE (one map-side-
  * combined (row, col) count); everything after runs on the cell frame,
  * bounded by k_rows × k_cols BY CONSTRUCTION regardless of corpus
  * size — the per-slice window sums buffer at most one marginal's
  * cells. Applying the weights downstream is a broadcast join of this
  * frame against the corpus. */
object Raking {

  def ipfUniform(docs: DataFrame, rowCol: String, colCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val cells = docs
      .filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .groupBy(col(rowCol).as("__r"), col(colCol).as("__c"))
      .agg(count(lit(1)).as("n"))
    // two single-distinct aggregates, not one multi-distinct (which
    // would plan the 3x Expand shape the lint sweep hunts); both are
    // 1-row frames riding the same broadcast
    val dims = cells
      .agg(countDistinct(col("__r")).as("kr"), sum(col("n")).as("nt"))
      .crossJoin(cells.agg(countDistinct(col("__c")).as("kc")))
    val init = cells.crossJoin(broadcast(dims))
      .withColumn("m",
        round(col("n").cast("double") / col("nt").cast("double") * 1e12, 0)
          .cast("long"))

    def step(df: DataFrame, part: String, kCol: String): DataFrame = {
      val slice = sum(col("m")).over(Window.partitionBy(col(part)))
      df.withColumn("m",
        when(slice > 0L,
          round(col("m").cast("double") * (lit(1.0) / col(kCol).cast("double")) *
            1e12 / slice.cast("double"), 0).cast("long"))
          .otherwise(lit(0L)))
    }

    val fitted = (1 to iters).foldLeft(init) { (df, _) =>
      step(step(df, "__r", "kr"), "__c", "kc")
    }
    val rowShare = sum(col("m")).over(Window.partitionBy(col("__r")))
    val colShare = sum(col("m")).over(Window.partitionBy(col("__c")))
    fitted
      .withColumn("row_share", round(rowShare.cast("double") / 1e12, 6))
      .withColumn("col_share", round(colShare.cast("double") / 1e12, 6))
      .select(col("__r").as(rowCol), col("__c").as(colCol),
        col("n").as("n_docs"),
        round(col("m").cast("double") / 1e12, 9).as("m_fit"),
        round(col("m").cast("double") * col("nt").cast("double") /
          (lit(1e12) * col("n").cast("double")), 6).as("weight"),
        col("row_share"), col("col_share"))
      .orderBy(col(rowCol), col(colCol))
  }

  /** [[ipfUniform]] made EXECUTABLE: resample the corpus so both
    * marginals actually land on their targets. Per-cell acceptance
    * rate = weight / max(weight) (scaling by the max keeps every rate
    * in (0, 1] while preserving the weight RATIOS — the resample's
    * expected marginals are the fitted ones); each document's accept
    * decision is the standard md5 16-bit lottery on its id (the
    * [[Sharding.assignSplit]]/weightedSample family: a pure function
    * of the id, so the SAME rows survive on any engine, any run, any
    * partitioning). The gate reports both achieved marginals with
    * id-sums/extrema so row-level membership differences hash-fail,
    * not just counts.
    *
    * Scale shape: [[ipfUniform]]'s one corpus count, then ONE
    * broadcast cell join + a narrow filter over the corpus — no
    * shuffle of document rows anywhere; the rollup is two map-side-
    * combined aggregates. The rates compare on the ROUND@6 gated
    * weights so the lottery threshold is the same double on both
    * engines. Output: (dim, value, n_kept, sum_ids, min_id, max_id)
    * for dim ∈ {rowCol, colCol}. */
  def applyUniform(docs: DataFrame, rowCol: String, colCol: String,
      idCol: String, iters: Int = 3): DataFrame = {
    val cells = ipfUniform(docs, rowCol, colCol, iters)
      .select(col(rowCol), col(colCol), col("weight"))
    val mw = cells.agg(max(col("weight")).as("__mw"))
    val kept = docs
      .filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .join(broadcast(cells), Seq(rowCol, colCol))
      .crossJoin(broadcast(mw))
      .filter(
        graft.functions.expr.Md5Prefix(col(idCol).cast("string"), 4)
          .cast("double") <
          col("weight") / col("__mw") * lit(65536.0))
    def side(dim: String): DataFrame = kept
      .groupBy(lit(dim).as("dim"), col(dim).as("value"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col(idCol)).as("sum_ids"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))
    side(rowCol).union(side(colCol))
      .orderBy(col("dim"), col("value"))
  }
}
