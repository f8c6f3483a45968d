package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact quantiles by rank selection (reference `quantile`
  * kernel, cpp/src/arrow/compute/kernels/aggregate_quantile.cc, linear
  * interpolation at rank (n-1)·q — the same definition Spark's
  * `percentile` and DuckDB's `quantile_cont` use).
  *
  * Why not `percentile()`: Spark's exact percentile is an aggregate whose
  * buffer holds EVERY value of the column — partial buffers merge into one
  * final buffer on a single task, so at 100 TB the final aggregation is a
  * single-node sort of the whole column. This operator instead:
  *
  *   1. range-partitions and sorts the column (Spark's distributed sort —
  *      spills, scales horizontally),
  *   2. counts rows per partition (one tiny long per partition to the
  *      driver),
  *   3. turns each requested quantile into the two bracketing global ranks
  *      and fetches JUST those rows by (partition, local offset),
  *   4. interpolates on the driver.
  *
  * Two distributed passes (sort + targeted fetch), driver traffic O(#
  * partitions + #quantiles). QuantilesSpec asserts bit-parity against
  * `percentile()` on real data.
  */
object Quantiles {

  /** The reference's five interpolation modes
    * (QuantileOptions::Interpolation, compute.rst quantile): how to
    * resolve a quantile landing between the two bracketing order
    * statistics lo (rank ⌊(n−1)q⌋) and hi (rank ⌈(n−1)q⌉). `nearest`
    * ties (fraction exactly 0.5) resolve to hi. */
  val interpolations: Seq[String] =
    Seq("linear", "lower", "higher", "nearest", "midpoint")

  private def interpolate(
      lo: Double, hi: Double, frac: Double, interpolation: String): Double =
    interpolation match {
      case "linear"   => lo + (hi - lo) * frac
      case "lower"    => lo
      case "higher"   => hi
      case "nearest"  => if (frac < 0.5) lo else hi
      case "midpoint" => (lo + hi) / 2.0
      case other =>
        throw new IllegalArgumentException(
          s"unknown interpolation '$other' (one of ${interpolations.mkString(", ")})")
    }

  /** Exact interpolated quantiles of `column`; nulls ignored. Returns one
    * value per requested q (NaN on an empty column). */
  def exact(
      df: DataFrame, column: String, qs: Seq[Double],
      interpolation: String = "linear"): Seq[Double] =
    exactMulti(df, column, qs, Seq(interpolation)).map(_(interpolation))

  /** Exact quantiles under several interpolation modes at once — one
    * distributed sort + one targeted fetch serve every (q, mode) pair,
    * since all five modes derive from the same two bracketing order
    * statistics. Returns one mode→value map per requested q. */
  def exactMulti(
      df: DataFrame, column: String, qs: Seq[Double],
      interps: Seq[String]): Seq[Map[String, Double]] = {
    require(qs.forall(q => q >= 0.0 && q <= 1.0), s"quantiles must be in [0,1]: $qs")
    require(interps.nonEmpty && interps.forall(interpolations.contains),
      s"unknown interpolation among $interps")
    val sorted = df
      .select(col(column).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .repartitionByRange(col("v"))
      .sortWithinPartitions("v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = sorted.rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
        .collect().sortBy(_._1).map(_._2)
      val n = counts.sum
      if (n == 0) return qs.map(_ => interps.map(_ -> Double.NaN).toMap)

      // global rank -> (partition, local offset)
      val starts = counts.scanLeft(0L)(_ + _) // starts(i) = first global rank of partition i
      def locate(rank: Long): (Int, Long) = {
        var p = 0
        while (p + 1 < counts.length && starts(p + 1) <= rank) p += 1
        (p, rank - starts(p))
      }
      val wanted: Map[Long, (Int, Long)] = qs.flatMap { q =>
        val pos = (n - 1) * q
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.distinct.map(r => r -> locate(r)).toMap

      // fetch only the bracketing rows: each partition slices the handful
      // of local offsets it owns out of its sorted iterator
      val byPartition = wanted.toSeq
        .groupBy(_._2._1)
        .map { case (p, rs) => p -> rs.map { case (rank, (_, off)) => (off, rank) }.sortBy(_._1) }
      val fetched = sorted.rdd
        .mapPartitionsWithIndex { (p, it) =>
          byPartition.get(p) match {
            case None => Iterator.empty
            case Some(offsets) =>
              var cur = 0L
              val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
              var remaining = offsets
              while (remaining.nonEmpty && it.hasNext) {
                val v = it.next().getDouble(0)
                while (remaining.nonEmpty && remaining.head._1 == cur) {
                  out += ((remaining.head._2, v))
                  remaining = remaining.tail
                }
                cur += 1L
              }
              out.iterator
          }
        }
        .collect().toMap

      qs.map { q =>
        val pos = (n - 1) * q
        val lo = fetched(math.floor(pos).toLong)
        val hi = fetched(math.ceil(pos).toLong)
        val frac = pos - math.floor(pos)
        interps.map(i => i -> interpolate(lo, hi, frac, i)).toMap
      }
    } finally sorted.unpersist(blocking = false)
  }

  /** Exact WEIGHTED quantiles — the importance-weighted order statistic
    * (weighted median and friends) that survey-weighted and
    * importance-resampled data need: the q-quantile is the SMALLEST
    * value v whose cumulative weight (in value order) reaches q·W (the
    * inverted-CDF definition; at unit weights this is the `lower`
    * interpolation of [[exact]]).
    *
    * Same two-pass shape as [[exact]]: range-partition + in-partition
    * sort, collect the per-partition WEIGHT TOTALS (one double per
    * partition — the bounded driver exchange), locate the partition
    * whose cumulative range covers each target, and have that partition
    * scan its sorted run once, accumulating from the driver-computed
    * prefix until the target is crossed. Weight addition order equals
    * the global value order on both engines; with INTEGER-valued
    * weights (the gate's case) every partial sum is exact in a double,
    * so the crossing row is engine-portable bit-for-bit. With
    * fractional weights, ties among equal values may reorder additions
    * — low-bit cumsum differences can only move the crossing within a
    * tie group (same output value) unless a boundary lands within one
    * ulp of a target. Rows with null/non-positive weight are excluded
    * (zero weight means zero mass). */
  def weightedExact(
      df: DataFrame, valCol: String, weightCol: String,
      qs: Seq[Double]): Seq[Double] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    val sorted = df
      .select(col(valCol).cast("double").as("v"),
        col(weightCol).cast("double").as("w"))
      .filter(col("v").isNotNull && col("w").isNotNull && col("w") > 0.0)
      .repartitionByRange(col("v"))
      .sortWithinPartitions("v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val wsums = sorted.rdd
        .mapPartitionsWithIndex((i, it) =>
          Iterator((i, it.foldLeft(0.0)((acc, r) => acc + r.getDouble(1)))))
        .collect().sortBy(_._1).map(_._2)
      val total = wsums.foldLeft(0.0)(_ + _)
      if (total == 0.0) return qs.map(_ => Double.NaN)
      val starts = wsums.scanLeft(0.0)(_ + _)
      // target cumulative mass per q; q = 0 selects the first row (its
      // positive weight crosses a zero target immediately)
      val targets = qs.map(q => q * total)
      def locate(t: Double): Int = {
        var p = 0
        while (p + 1 < wsums.length && starts(p + 1) < t) p += 1
        // skip empty/weightless partitions that cannot cross anything
        while (p < wsums.length - 1 && wsums(p) == 0.0) p += 1
        p
      }
      val byPartition = targets.zipWithIndex
        .map { case (t, qi) => (locate(t), t, qi) }
        .groupBy(_._1)
        .map { case (p, ts) => p -> ts.map { case (_, t, qi) => (t, qi) }.sortBy(_._1) }
      val fetched = sorted.rdd
        .mapPartitionsWithIndex { (p, it) =>
          byPartition.get(p) match {
            case None => Iterator.empty
            case Some(ts) =>
              var running = starts(p)
              var remaining = ts
              val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
              while (remaining.nonEmpty && it.hasNext) {
                val r = it.next()
                running += r.getDouble(1)
                while (remaining.nonEmpty && running >= remaining.head._1) {
                  out += ((remaining.head._2, r.getDouble(0)))
                  remaining = remaining.tail
                }
              }
              // float edge: a target equal to the partition's final
              // cumulative weight can fail the >= inside by one ulp —
              // it belongs to the first row of the NEXT run; refuse
              // silently-wrong output instead
              require(remaining.isEmpty,
                s"weighted quantile targets ${remaining.map(_._1)} not crossed in partition $p")
              out.iterator
          }
        }
        .collect().toMap
      qs.indices.map(fetched).toSeq
    } finally sorted.unpersist(blocking = false)
  }

  /** Exact weighted quantiles PER GROUP — [[weightedExact]]'s inverted
    * CDF as one hash exchange: a group-keyed window computes the running
    * weight in value order plus the group total, and the q-quantile
    * falls out as `min(v) over rows with cum >= q·W` (values ascend with
    * the cumulative weight, so the minimum of the qualifying suffix IS
    * the crossing value — no crossing-row bookkeeping, and q = 0
    * degenerates to the group minimum). Same spill story as
    * [[exactGrouped]]: WindowExec's spillable partition buffer, never a
    * per-group aggregation buffer. Output: one row per group,
    * `q0, q1, …` in request order. Integer-valued weights make the
    * cumulative sums exact (the engine-portability contract of
    * [[weightedExact]]); rows with null/non-positive weight are
    * excluded. */
  def weightedExactGrouped(
      df: DataFrame, groupCol: String, valCol: String, weightCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    val base = df
      .select(col(groupCol), col(valCol).cast("double").as("__v"),
        col(weightCol).cast("double").as("__w"))
      .filter(col("__v").isNotNull && col("__w").isNotNull && col("__w") > 0.0)
    val ord = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col(groupCol))
    val staged = base
      .withColumn("__cum", sum(col("__w")).over(ord))
      .withColumn("__wt", sum(col("__w")).over(all))
    val aggs = qs.zipWithIndex.map { case (q, i) =>
      min(when(col("__cum") >= lit(q) * col("__wt"), col("__v"))).as(s"q$i")
    }
    staged.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact interpolated quantiles PER GROUP — the scale path for the
    * reference's `hash_quantile` / `hash_tdigest`-exact surface
    * (cpp/src/arrow/compute/kernels/hash_aggregate.cc): one row per group
    * with one double column per requested q, named `q0, q1, …` in request
    * order (alias downstream). Nulls are ignored; a group whose values are
    * all null disappears (mirror of a grouped aggregate over no rows).
    *
    * Unlike `percentile()` (whose per-group buffer holds every value of
    * the group, merged on a single task per group), this is a single hash
    * shuffle on the group key + an in-partition sort: `row_number` and the
    * group count come from one window pass (WindowExec's spillable
    * partition buffer — no unbounded aggregation buffer), the ≤2·|qs|
    * bracketing rows per group survive a filter, and a tiny hash aggregate
    * interpolates. Group count is bounded only by what one partition's
    * spill can sort — the same bound as any `groupBy` sort at 100 TB.
    */
  def exactGrouped(
      df: DataFrame, groupCol: String, valCol: String, qs: Seq[Double],
      interpolation: String = "linear"): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    require(interpolations.contains(interpolation),
      s"unknown interpolation '$interpolation'")
    val g = col(groupCol)
    val ranked = df
      .select(g, col(valCol).cast("double").as("__qv"))
      .filter(col("__qv").isNotNull)
      .withColumn("__rn",
        row_number().over(Window.partitionBy(g).orderBy(col("__qv"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(g)))

    // the (n-1)·q rank arithmetic, per row (identical for all rows of a
    // group — IEEE double, bit-equal to the oracle's own (n-1)·q)
    def pos(q: Double): Column = (col("__n") - 1) * lit(q)
    val isBracket = qs
      .map(q => col("__rn") === (floor(pos(q)) + 1) || col("__rn") === (ceil(pos(q)) + 1))
      .reduce(_ || _)

    val aggCols = qs.zipWithIndex.flatMap { case (q, i) =>
      Seq(
        min(when(col("__rn") === floor(pos(q)) + 1, col("__qv"))).as(s"__lo_$i"),
        min(when(col("__rn") === ceil(pos(q)) + 1, col("__qv"))).as(s"__hi_$i"),
        max(pos(q) - floor(pos(q))).as(s"__f_$i"))
    }
    val outCols = g +: qs.indices.map { i =>
      val (lo, hi, f) = (col(s"__lo_$i"), col(s"__hi_$i"), col(s"__f_$i"))
      val v = interpolation match {
        case "linear"   => lo + (hi - lo) * f
        case "lower"    => lo
        case "higher"   => hi
        case "nearest"  => when(f < 0.5, lo).otherwise(hi)
        case "midpoint" => (lo + hi) / 2.0
      }
      v.as(s"q$i")
    }
    ranked.filter(isBracket)
      .groupBy(g)
      .agg(aggCols.head, aggCols.tail: _*)
      .select(outCols: _*)
  }
}
