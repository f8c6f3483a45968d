package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-state distribution drift: Jensen–Shannon divergence over a
  * FIXED 64-bucket hash of the token space, per slice or per event-time
  * window — the scale/streaming twin of [[TextQueries.sliceDrift]].
  * sliceDrift is exact over the real vocabulary but its state is the
  * vocabulary itself; hashing tokens into 64 md5 buckets caps the state
  * at 64 counters per group FOREVER (watermark-evictable in a stream),
  * at the price of hash-collision smoothing (bucketed JSD lower-bounds
  * vocabulary JSD — collisions can only cancel mass, never invent it;
  * DriftSpec pins that and the zero-self-drift identity).
  *
  * The whole computation is ONE aggregate: tokens explode narrowly, each
  * draws its md5 bucket, and a single groupBy emits the 64 conditional
  * counts; the JSD against the broadcast reference distribution is a
  * narrow closed-form projection over those counts (64 fixed terms in
  * deterministic textual order — the DuckDB oracle mirrors them term by
  * term). Because it is one watermarked aggregate, the identical code
  * runs on a stream grouped by `window(ts, ...)` — StreamingSpec asserts
  * batch parity.
  */
object Drift {

  /** Bucket count — 64 keeps the conditional-count aggregate comfortably
    * inside codegen while resolving drift at the few-percent level. */
  val Buckets = 64

  /** md5 bucket of a token: low 6 bits of the first 16 hash bits —
    * `('0x' || substring(md5(w),1,4))::INT % 64` in DuckDB. */
  def bucketOf(w: Column): Column =
    (graft.functions.expr.Md5Prefix(w, 4).cast("int") % Buckets)

  /** Reference bucket distribution of a corpus: 64 probabilities
    * (counts / total, plain IEEE division of exact integers — identical
    * in any engine). Bounded driver exchange: 64 rows. */
  def refProbs(df: DataFrame, textCol: String): Array[Double] = {
    val counts = df
      .select(explode(graft.functions.TextOps.words(col(textCol))).as("w"))
      .groupBy(bucketOf(col("w")).as("b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    require(total > 0, "refProbs: empty reference corpus")
    Array.tabulate(Buckets)(i => counts.getOrElse(i, 0L).toDouble / total)
  }

  /** Per-group JSD (bits) of the bucketed token distribution against
    * `ref`: one aggregate over `groupCols` (existing columns of `df` —
    * e.g. a slice key, or a pre-projected `window(ts, ...)` struct on a
    * watermarked stream), bounded 64-counter state. A group with no
    * tokens yields a NULL jsd. */
  def bucketJsd(df: DataFrame, groupCols: Seq[String], textCol: String,
      ref: Array[Double]): DataFrame = {
    require(ref.length == Buckets, s"ref must have $Buckets entries")
    val aggs = (0 until Buckets).map(i =>
      count(when(col("__b") === i, 1)).as(s"__c$i"))
    // Σ over buckets of 0.5·p·log2(2p/(p+g)) + 0.5·g·log2(2g/(p+g)),
    // each term guarded (p = 0 or g = 0 degenerate cleanly), scaled to
    // an exact 1e-9-unit LONG (order-independent integer sum — NOT a
    // decimal chain: Spark's (38,12)+(38,12) addition overflows
    // precision 38 and silently reduces scale toward 6 per chained add)
    // and NOT re-rounded at the end (a round(x, 6) can land exactly on
    // a .5 tie where engines round differently — this bit the gate).
    // The 64 terms run as ONE fused generated loop
    // ([[graft.functions.expr.BucketedJsd]]): the inlined 64-term CASE
    // tree this replaces overflowed janino's 64 KB method limit and
    // silently dropped the projection out of whole-stage codegen
    // (r12 verdict #2); bit-parity with that tree is pinned in
    // DriftJsdSpec. An empty group (n = 0) yields a NULL jsd.
    val jsd = graft.functions.expr.BucketedJsd(
      array((0 until Buckets).map(i => col(s"__c$i")): _*), ref)
    df.select(groupCols.map(col) :+
        explode(graft.functions.TextOps.words(col(textCol))).as("w"): _*)
      .withColumn("__b", bucketOf(col("w")))
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("jsd", jsd)
      .drop((0 until Buckets).map(i => s"__c$i"): _*)
  }

  /** Fixed-bin count for windowed Wasserstein drift — 10 keeps the
    * per-group state at 10 counters and the |W1_binned − W1| error at
    * one binwidth (the q104b contract). */
  val W1Bins = 10

  // ONE definition of the q104 clamp-bin contract, shared with the
  // batch fixed-bin variant so batch/stream/gate can never fork
  private def w1BinOf(v: Column, lo: Column, hi: Column): Column =
    graft.operators.StatTests.clampBinOf(v, lo, hi, W1Bins)

  /** Reference frame for windowed Wasserstein drift: per key, the
    * fixed-width bin bounds and the 9 interior CDF values of the
    * reference window's value distribution — ONE aggregate pass, a
    * #keys-row broadcastable frame. CDF fractions are one IEEE
    * division of exact counts (identical in any engine). Keys drop if
    * they have no reference rows (callers own window placement — the
    * [[graft.operators.StatTests.psi]] convention).
    * Output: (__k, __lo, __hi, f0..f8). */
  def w1Ref(ref: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val src = ref.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("__k"), col(valCol).cast("double").as("__v"))
    val bounds = src.groupBy(col("__k"))
      .agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val binned = src.join(bounds, Seq("__k"))
      .withColumn("__bin", w1BinOf(col("__v"), col("__lo"), col("__hi")))
    val aggs = count(lit(1)).as("__n") +:
      (0 until W1Bins - 1).map(i =>
        count(when(col("__bin") <= i, 1)).as(s"__cc$i"))
    binned.groupBy(col("__k"), col("__lo"), col("__hi"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__k") +: col("__lo") +: col("__hi") +:
        (0 until W1Bins - 1).map(i =>
          (col(s"__cc$i").cast("double") / col("__n").cast("double"))
            .as(s"f$i")): _*)
  }

  /** Reference frame for windowed PSI: per key, the fixed-width bin
    * bounds and the 10 bin SHARES of the reference window's value
    * distribution (where [[w1Ref]] carries the cumulative CDF, PSI
    * needs the per-bin mass). Same ONE-aggregate shape and broadcast
    * size. Output: (__k, __lo, __hi, p0..p9). */
  def psiRefFixed(ref: DataFrame, keyCol: String,
      valCol: String): DataFrame = {
    val src = ref.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("__k"), col(valCol).cast("double").as("__v"))
    val bounds = src.groupBy(col("__k"))
      .agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val binned = src.join(bounds, Seq("__k"))
      .withColumn("__bin", w1BinOf(col("__v"), col("__lo"), col("__hi")))
    val aggs = count(lit(1)).as("__n") +:
      (0 until W1Bins).map(i =>
        count(when(col("__bin") === i, 1)).as(s"__c$i"))
    binned.groupBy(col("__k"), col("__lo"), col("__hi"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__k") +: col("__lo") +: col("__hi") +:
        (0 until W1Bins).map(i =>
          (col(s"__c$i").cast("double") / col("__n").cast("double"))
            .as(s"p$i")): _*)
  }

  /** Per-group PSI of `valCol` against the static reference shares
    * from [[psiRefFixed]] — the windowed/STREAMING form of the q101b
    * fixed-bin PSI (the [[binW1]] counter machinery applied to the
    * share divergence): 10 bin counters of bounded state per group,
    * term_b = (p'_b − q'_b)·ln(p'_b/q'_b) with both shares floored at
    * `eps` (the [[graft.operators.StatTests.psi]] convention), each
    * term a rounded 1e-9 long, exact sum, round@6 + the
    * stable/moderate/shifted bands on the rounded value. A zero-width
    * reference reads PSI = 0, NOT NULL — deliberately unlike
    * [[binW1]]: PSI is a SHARE statistic and with everything pinned
    * to bin 0 on both sides the shares genuinely are identical,
    * whereas W1 claims a zero DISTANCE it cannot know (q101b's
    * documented bin-0 convention). Identical code runs on a
    * watermarked stream; DriftSpec asserts batch parity.
    * Output: (keyCol, groupCols..., n_cur, psi, shift). */
  def binPsi(df: DataFrame, refFrame: DataFrame, keyCol: String,
      groupCols: Seq[String], valCol: String,
      eps: Double = 1e-4): DataFrame = {
    require(eps > 0.0 && eps < 0.1, s"eps in (0, 0.1), got $eps")
    val cur = df.filter(col(valCol).isNotNull)
      .withColumn("__k", col(keyCol))
      .join(broadcast(refFrame), Seq("__k"))
      .withColumn("__bin",
        w1BinOf(col(valCol).cast("double"), col("__lo"), col("__hi")))
    val keys = Seq(col("__k"), col("__lo"), col("__hi")) ++
      (0 until W1Bins).map(i => col(s"p$i")) ++ groupCols.map(col)
    val aggs = count(lit(1)).as("n_cur") +:
      (0 until W1Bins).map(i =>
        count(when(col("__bin") === i, 1)).as(s"__c$i"))
    val g = cur.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    val terms = (0 until W1Bins).map { i =>
      val p = greatest(col(s"p$i"), lit(eps))
      val q = greatest(
        col(s"__c$i").cast("double") / col("n_cur").cast("double"),
        lit(eps))
      round((p - q) * log(p / q) * 1e9, 0).cast("long")
    }
    g.withColumn("psi",
        round(terms.reduce(_ + _).cast("double") / 1e9, 6))
      .select(col("__k").as(keyCol) +: groupCols.map(col) :+
        col("n_cur") :+ col("psi") :+
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "moderate")
          .otherwise("shifted").as("shift"): _*)
  }

  /** Per-group Wasserstein-1 drift of `valCol` against the static
    * reference CDF from [[w1Ref]] — the numeric-column sibling of
    * [[bucketJsd]] and the streaming form of the q104b fixed-bin W1:
    * state is W1Bins cumulative counters per group FOREVER
    * (watermark-evictable), the readout is in the metric's own units.
    * ONE aggregate over `groupCols` (e.g. a slice key, or a
    * pre-projected `window(ts, ...)` struct on a watermarked stream —
    * the identical code runs on a stream; DriftSpec asserts batch
    * parity) after a broadcast ref join; W1 = Σ over interior bin
    * edges |F_cur − F_ref| · binwidth, each term a rounded 1e-9 long,
    * exact sum, round@9 (the q104 determinism contract). Rows whose
    * key has no reference row drop with the inner join. A key whose
    * reference support is ZERO-WIDTH (a constant) reads NULL, never 0:
    * a point reference cannot anchor a binned CDF, and an arbitrarily
    * large drift away from the constant would otherwise read "no
    * drift" — the q104b union-bounds form does not have this blind
    * spot, so there 0 stays exact; here NULL is the honest readout.
    * Output: (keyCol, groupCols..., n_cur, w1). */
  def binW1(df: DataFrame, refFrame: DataFrame, keyCol: String,
      groupCols: Seq[String], valCol: String): DataFrame = {
    val cur = df.filter(col(valCol).isNotNull)
      .withColumn("__k", col(keyCol))
      .join(broadcast(refFrame), Seq("__k"))
      .withColumn("__bin",
        w1BinOf(col(valCol).cast("double"), col("__lo"), col("__hi")))
    val keys = Seq(col("__k"), col("__lo"), col("__hi")) ++
      (0 until W1Bins - 1).map(i => col(s"f$i")) ++ groupCols.map(col)
    val aggs = count(lit(1)).as("n_cur") +:
      (0 until W1Bins - 1).map(i =>
        count(when(col("__bin") <= i, 1)).as(s"__cc$i"))
    val g = cur.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    val w = (col("__hi") - col("__lo")) / W1Bins.toDouble
    val terms = (0 until W1Bins - 1).map { i =>
      round(abs(col(s"__cc$i").cast("double") /
        col("n_cur").cast("double") - col(s"f$i")) * w * 1e9, 0)
        .cast("long")
    }
    g.withColumn("w1",
        when(col("__hi") =!= col("__lo"),
          round(terms.reduce(_ + _).cast("double") / 1e9, 9)))
      .select(col("__k").as(keyCol) +: groupCols.map(col) :+
        col("n_cur") :+ col("w1"): _*)
  }
}
