package graft.pipeline

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame-parametric nearest-neighbor search over `array<float>`
  * embedding columns.
  */
object Ann {

  /** Exact top-k by cosine: broadcast the (small) query set against the
    * full candidate table — O(Q·N) work that distributes over N with no
    * shuffle of the big side; the per-query window dedup shuffles only
    * Q·N score rows keyed by query. */
  def bruteTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qe"))
    val cand = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(cand, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorOps.cosine(col("qe"), col("ne")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Exact top-k over int8-QUANTIZED unit vectors — the memory/bandwidth
    * scale lever orthogonal to LSH/IVF bucketing: 4 bytes → 1 byte per
    * dimension (plus one stored double scale per vector), so at 100 TB of
    * float32 embeddings the candidate side shrinks 4× before any search
    * structure is even built, and the inner loop is integer
    * multiply-accumulate. Scoring dequantizes the EXACT integer dot
    * product by the two stored scales (`dot / (s_q·s_n)` ≈ cosine of the
    * original vectors, since codes quantize the unit-normalized input) —
    * ranking is therefore deterministic: integer dot first, IEEE division
    * after, ties broken by neighbor id. Same broadcast shape as
    * [[bruteTopK]]; composes with the IVF cell join for bucketed search. */
  /** (id, codes, scale) projection — norm, unit vector, max component and
    * scale each staged as their OWN projected column so every
    * intermediate evaluates once per row. Nesting them as expression
    * subtrees inside the `transform` lambdas (the naive composition of
    * [[VectorOps.quantizeInt8]]/[[VectorOps.int8Scale]]) re-evaluates the
    * norm/scale subtree per ELEMENT — O(dim³) per row, measured 227 s vs
    * <1 s on the sf0.1 gate. CollapseProject keeps the stages separate
    * because each non-cheap column is referenced more than once. */
  private def int8Encoded(df: DataFrame, idCol: String, idAs: String,
      vecCol: String, codesAs: String, scaleAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as("__v"))
      .withColumn("__n", VectorOps.norm(col("__v")))
      .withColumn("__u", transform(col("__v"), x =>
        when(col("__n") === 0.0, lit(0.0))
          .otherwise(x.cast("double") / col("__n"))))
      .withColumn("__m", array_max(transform(col("__u"), x => abs(x))))
      .withColumn(scaleAs,
        when(col("__m") === 0.0, lit(1.0)).otherwise(lit(127.0) / col("__m")))
      .withColumn(codesAs, transform(col("__u"), x =>
        floor(x * col(scaleAs) + lit(0.5)).cast("long")))
      .drop("__v", "__n", "__u", "__m")

  /** (id, words) projection: sign-bit binary quantization, 32 bits packed
    * per long word (32 — not 64 — so the `acc·2 + bit` fold can never
    * overflow into the sign bit, which ANSI mode would turn into a runtime
    * error). Staged like [[int8Encoded]] so the per-row cost is O(dim). */
  private def binaryEncoded(df: DataFrame, idCol: String, idAs: String,
      vecCol: String, wordsAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as("__v"))
      .withColumn("__b", transform(col("__v"), x =>
        when(x.cast("double") >= 0.0, lit(1L)).otherwise(lit(0L))))
      .withColumn(wordsAs, transform(
        sequence(lit(0), (ceil(size(col("__b")).cast("double") / 32.0)).cast("int") - 1),
        w => aggregate(slice(col("__b"), w * 32 + 1, lit(32)), lit(0L),
          (acc, s) => acc * 2 + s)))
      .drop("__v", "__b")

  /** Exact top-k by Hamming distance over BINARY (sign-bit) quantized
    * vectors — the extreme end of the quantization ladder next to
    * [[int8TopK]]: 32 float dims collapse into one long word, and the
    * scoring loop is XOR + popcount on words (`bit_count`), i.e. 32
    * dimensions per instruction instead of one multiply-add each. At
    * 100 TB this is the candidate-generation tier: binary codes fit ~128×
    * more vectors per executor page than float32, and the surviving
    * candidates get re-ranked by a finer metric (int8/float — compose
    * with [[int8TopK]]/[[bruteTopK]]). Smaller Hamming = closer; total
    * tie-break by neighbor id; integer output, fully oracle-gateable. */
  def binaryTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = binaryEncoded(queries, idCol, "query_id", vecCol, "qw")
    val cand = binaryEncoded(candidates, idCol, "neighbor_id", vecCol, "nw")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("neighbor_id"))
    broadcast(q).join(cand, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(
          zip_with(col("qw"), col("nw"),
            (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
          lit(0L), (acc, v) => acc + v).as("hamming"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("hamming"))
  }

  /** The full QUANTIZATION-LADDER composition — how the tiers are
    * actually deployed at 100 TB: the binary sign-bit tier (XOR/popcount
    * Hamming, ~128× denser than float32) generates `k · candFactor`
    * candidates per query, and ONLY those candidates are re-ranked with
    * the exact float cosine. The expensive float vectors are touched for
    * `Q · k · candFactor` rows instead of `Q · N` — the re-rank join is
    * id-keyed on the candidate ids, so the big float side shuffles
    * nothing beyond the surviving candidates.
    *
    * Fully deterministic, hence fully oracle-gateable end to end (unlike
    * the LSH/IVF paths whose hash families need recall gates): the
    * candidate tier breaks Hamming ties by neighbor id, the re-rank
    * breaks cosine ties by neighbor id. */
  def ladderTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, candFactor: Int = 4): DataFrame = {
    require(candFactor >= 1, s"candFactor must be >= 1, got $candFactor")
    val cands = binaryTopK(queries, candidates, idCol, vecCol, k * candFactor)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qe"))
    val nv = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands
      .join(broadcast(qv), Seq("query_id"))
      .join(nv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorOps.cosine(col("qe"), col("ne")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  def int8TopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = int8Encoded(queries, idCol, "query_id", vecCol, "qq", "qs")
    val cand = int8Encoded(candidates, idCol, "neighbor_id", vecCol, "nq", "ns")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    broadcast(q).join(cand, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorOps.intDot(col("qq"), col("nq")).cast("double") /
          (col("qs") * col("ns")), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
  }

  /** IVF (inverted-file) top-k — the second classic ANN scale path next
    * to LSH: a coarse quantizer of `nCentroids` centroids partitions the
    * base vectors into cells (the inverted lists), and each query probes
    * only its `nProbe` nearest cells, so search work is
    * ≈ N·nProbe/nCentroids per query instead of N.
    *
    * Scale shape: training is Lloyd's iterations over a deterministic
    * driver-side sample (a sample stays a sample at 100 TB); the learned
    * centroids are a tiny broadcast table; cell assignment is one
    * broadcast join + per-row argmin (narrow, no shuffle of the base);
    * the search is a (cell)-keyed equi-join. Each base vector lives in
    * exactly one cell, so unlike LSH no collision dedup is needed —
    * (query, neighbor) pairs are unique by construction. */
  /** Train the IVF coarse quantizer: Lloyd's iterations over a
    * deterministic hash-ordered sample, returning the (cid, ce) centroid
    * table — the REUSABLE index artifact. Persist it once and keep
    * assigning newly-arrived vectors against it ([[ivfTopKWith]]): an
    * incrementally-growing corpus needs no retraining until the
    * distribution drifts, which is how IVF indexes are actually operated
    * (train rarely, assign continuously). The sample collect is the one
    * bounded driver exchange of the ANN family (≤ sampleSize rows,
    * documented); a sample stays a sample at 100 TB. */
  def trainCentroids(candidates: DataFrame,
      idCol: String, vecCol: String,
      nCentroids: Int = 16, sampleSize: Int = 1024,
      iterations: Int = 8): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    // ordered by a hash of the id: uniform pseudo-random yet reproducible
    // (first-N-by-id would train on the corpus HEAD, which is not a
    // sample when id order correlates with content)
    val sample: Array[Array[Float]] = candidates
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .select(col(vecCol)).limit(sampleSize)
      .as[Array[Float]].collect()
    require(sample.nonEmpty, "trainCentroids: empty candidate set")
    val kC = math.min(nCentroids, sample.length)
    var centroids: Array[Array[Double]] =
      sample.take(kC).map(_.map(_.toDouble))
    def cosine(a: Array[Double], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i).toDouble * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    var it = 0
    while (it < iterations) {
      val sums = Array.fill(kC)(new Array[Double](sample.head.length))
      val counts = new Array[Int](kC)
      sample.foreach { v =>
        var best = 0; var bestCos = Double.NegativeInfinity
        var c = 0
        while (c < kC) {
          val cs = cosine(centroids(c), v)
          if (cs > bestCos) { bestCos = cs; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(kC) { c =>
        if (counts(c) == 0) centroids(c) // keep an empty cell's centroid
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    centroids.zipWithIndex
      .map { case (ce, cid) => (cid, ce.map(_.toFloat)) }
      .toSeq.toDF("cid", "ce")
  }

  /** Nearest-cell assignment against a trained centroid table: broadcast
    * join + per-row argmin — narrow over the vector side, the index-build
    * (and index-APPEND) step of the IVF family. `keep = 1` assigns base
    * vectors to their cell; `keep = nProbe` expands queries to their
    * probe cells. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      centroidDf: DataFrame, idAs: String, vecAs: String,
      keep: Int): DataFrame = {
    val w = Window.partitionBy(col(idAs))
      .orderBy(col("ccos").desc, col("cid"))
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs))
      .join(broadcast(centroidDf))
      .select(col(idAs), col(vecAs), col("cid"),
        VectorOps.cosine(col(vecAs), col("ce")).as("ccos"))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") <= keep)
      .drop("ccos", "crn")
  }

  def ivfTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, sampleSize: Int = 1024,
      iterations: Int = 8): DataFrame =
    ivfTopKWith(
      trainCentroids(candidates, idCol, vecCol, nCentroids, sampleSize, iterations),
      queries, candidates, idCol, vecCol, k, nProbe)

  /** IVF search against an ALREADY-TRAINED centroid table — the
    * incremental-corpus path: candidates (old + newly-appended vectors
    * alike) are cell-assigned by [[ivfAssign]] with no retraining, and
    * each query probes its `nProbe` nearest cells. */
  def ivfTopKWith(centroidDf: DataFrame,
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nProbe: Int = 4): DataFrame = {
    val base = ivfAssign(candidates, idCol, vecCol, centroidDf, "neighbor_id", "ne", 1)
    val probes = ivfAssign(queries, idCol, vecCol, centroidDf, "query_id", "qe", nProbe)

    // ---- search the probed cells only ----
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(base, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorOps.cosine(col("qe"), col("ne")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Train a product-quantization codebook: the vector space splits into
    * `m` contiguous subspaces and each learns its own `ksub`-entry
    * L2 k-means codebook over UNIT-NORMALIZED sample vectors (L2 on unit
    * vectors orders like cosine: ‖a-b‖² = 2 - 2·cos). The returned
    * codebook is the PQ index artifact — m·ksub·(dim/m) floats, a few KB,
    * trivially persistable and broadcast into every later encode/search
    * (train rarely, encode continuously — the same operating contract as
    * [[trainCentroids]]). The sample collect is the family's bounded
    * driver exchange (≤ sampleSize rows, same contract). Deterministic:
    * hash-ordered sample, first-kC seeding, fixed iterations. */
  def pqTrain(candidates: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 16, sampleSize: Int = 1024,
      iterations: Int = 8): Array[Array[Array[Float]]] = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val sample: Array[Array[Float]] = candidates
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .select(col(vecCol)).limit(sampleSize)
      .as[Array[Float]].collect()
    require(sample.nonEmpty, "pqTrain: empty candidate set")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m subspaces")
    val dsub = dim / m
    val unit = sample.map { v =>
      var n = 0.0; var i = 0
      while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
      val nn = math.sqrt(n)
      if (nn == 0) v.map(_ => 0.0) else v.map(_ / nn)
    }
    Array.tabulate(m) { s =>
      val subs = unit.map(_.slice(s * dsub, (s + 1) * dsub))
      val kC = math.min(ksub, subs.length)
      var cents: Array[Array[Double]] = subs.take(kC).map(_.clone())
      def l2(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var i = 0
        while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
        d
      }
      var it = 0
      while (it < iterations) {
        val sums = Array.fill(kC)(new Array[Double](dsub))
        val counts = new Array[Int](kC)
        subs.foreach { v =>
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < kC) {
            val d = l2(cents(c), v)
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < dsub) { sums(best)(i) += v(i); i += 1 }
        }
        cents = Array.tabulate(kC)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
        it += 1
      }
      cents.map(_.map(_.toFloat))
    }
  }

  /** Encode vectors to PQ codes — pure NARROW codegen, zero shuffle: the
    * codebook rides the plan as a folded literal (a few KB) and each
    * row's m sub-argmins run as higher-order-function expressions
    * (`array_position(dists, array_min(dists))` — first-match, so ties
    * break deterministically toward the lower code). Unit-normalization
    * is staged as its own projected column (see [[int8Encoded]]'s
    * O(dim³) trap note). Output: (idAs, codesAs array<int>, vecAs raw). */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebook: Array[Array[Array[Float]]],
      idAs: String, codesAs: String, vecAs: String): DataFrame = {
    val m = codebook.length
    val dsub = codebook(0)(0).length
    val cbLit = typedLit[Seq[Seq[Seq[Float]]]](
      codebook.map(_.map(_.toSeq).toSeq).toSeq)
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs))
      .withColumn("__n", VectorOps.norm(col(vecAs)))
      .withColumn("__u", transform(col(vecAs), x =>
        when(col("__n") === 0.0, lit(0.0))
          .otherwise(x.cast("double") / col("__n"))))
      .withColumn(codesAs, transform(sequence(lit(0), lit(m - 1)), s => {
        val sub = slice(col("__u"), s * dsub + 1, lit(dsub))
        val dists = transform(element_at(cbLit, s + 1), ce =>
          aggregate(zip_with(sub, ce, (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x))
        (array_position(dists, array_min(dists)) - 1).cast("int")
      }))
      .drop("__n", "__u")
  }

  /** PQ top-k by asymmetric distance computation (ADC) with exact
    * re-rank — the compressed-domain scale tier of the quantization
    * ladder: candidates are scanned as m-byte codes (a 32× compression
    * of 64-dim float32), each query carries its m×ksub distance table
    * (built once per query, narrow), and the approximate score is m
    * table lookups per candidate — no float vector ever leaves the scan
    * until the exact re-rank touches the `refine·k` survivors per query.
    * Shape: broadcast(queries+tables) ⋈ encoded candidates (narrow over
    * the big side), per-query window keeps `refine·k` by ADC distance,
    * then one id-keyed join back to raw vectors re-ranks exactly by
    * cosine. Deterministic end to end (fixed training, first-match
    * argmin, id tie-breaks). */
  def pqTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 8, ksub: Int = 16, refine: Int = 4,
      sampleSize: Int = 1024, iterations: Int = 8): DataFrame = {
    val codebook = pqTrain(candidates, idCol, vecCol, m, ksub, sampleSize, iterations)
    pqTopKWith(codebook, queries, candidates, idCol, vecCol, k, refine)
  }

  /** PQ search against an ALREADY-TRAINED codebook (see [[pqTrain]]'s
    * train-rarely contract). */
  def pqTopKWith(codebook: Array[Array[Array[Float]]],
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, refine: Int = 4): DataFrame = {
    val m = codebook.length
    val dsub = codebook(0)(0).length
    val cbLit = typedLit[Seq[Seq[Seq[Float]]]](
      codebook.map(_.map(_.toSeq).toSeq).toSeq)
    val enc = pqEncode(candidates, idCol, vecCol, codebook,
      "neighbor_id", "codes", "__ne").drop("__ne")
    // per-query ADC table: dtab[s][c] = ‖q_sub(s) - codebook[s][c]‖²
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qe"))
      .withColumn("__n", VectorOps.norm(col("qe")))
      .withColumn("__u", transform(col("qe"), x =>
        when(col("__n") === 0.0, lit(0.0))
          .otherwise(x.cast("double") / col("__n"))))
      .withColumn("dtab", transform(sequence(lit(0), lit(m - 1)), s => {
        val sub = slice(col("__u"), s * dsub + 1, lit(dsub))
        transform(element_at(cbLit, s + 1), ce =>
          aggregate(zip_with(sub, ce, (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x))
      }))
      .select(col("query_id"), col("dtab"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    val shortlist = broadcast(q).join(enc, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
          acc + element_at(element_at(col("dtab"), s + 1),
            element_at(col("codes"), s + 1) + 1)).as("adist"))
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= k * refine)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank of the shortlist only
    val qRaw = queries.select(col(idCol).as("query_id"), col(vecCol).as("qe"))
    val cRaw = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("ne"))
    val wX = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    shortlist
      .join(cRaw, Seq("neighbor_id"))
      .join(broadcast(qRaw), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorOps.cosine(col("qe"), col("ne")), 6).as("cos"))
      .withColumn("rank", row_number().over(wX))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Multi-table LSH top-k: `nTables` independent hyperplane families of
    * `nPlanes` bits each; a candidate is scored if it shares a bucket with
    * the query in ANY table. The 100 TB path — (table, bucket)-keyed
    * shuffle join instead of a quadratic scan; recall ≈
    * 1-(1-p^nPlanes)^nTables with p the per-plane agreement probability. */
  def lshTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 6, nTables: Int = 12): DataFrame = {
    // native fused bucketing (graft.functions.expr.LshBucketsExpr) —
    // bit-identical to VectorOps.lshBuckets, one loop instead of
    // nTables×nPlanes HOF trees per row
    def bucketed(df: DataFrame, id: String, vec: String) = df.select(
      col(idCol).as(id), col(vecCol).as(vec),
      explode(graft.functions.expr.LshBucketsExpr(
        col(vecCol), nPlanes, nTables)).as("tb"))
    val q = bucketed(queries, "query_id", "qe")
    val cand = bucketed(candidates, "neighbor_id", "ne")
    // score at join time so the bucket-collision dedup shuffles three
    // scalar columns, not two 64-float vectors per pair (the cosine is
    // deterministic, so duplicate collisions agree and max() is a no-op
    // combine — re-scoring a duplicate is cheaper than shuffling vectors)
    val pairs = q.join(cand,
        q("tb.table") === cand("tb.table") && q("tb.bucket") === cand("tb.bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorOps.cosine(col("qe"), col("ne")), 6).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** SEMANTIC eval-set decontamination — the embedding-level companion
    * to the shingle-based [[TextQueries.decontaminate]]: a train item is
    * contaminated when its cosine to ANY eval item reaches `tau`
    * (paraphrases and translations share no shingles but do share an
    * embedding neighborhood). Eval sets are SMALL by construction, so
    * the scale plan is exactly this: broadcast the eval vectors and
    * stream the train side through a narrow max-cosine pass — O(dim·|eval|)
    * per train row, no shuffle of the train corpus, and the per-train
    * MAX is computed inside the join row group (one train-id-keyed
    * aggregate over |eval| rows each). For an eval set too big to
    * broadcast, band BOTH sides with the LSH machinery and verify
    * candidates only (the dedup_incremental pattern) — recall-gated
    * rather than exact. */
  def semanticDecontam(train: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, tau: Double): DataFrame = {
    val ev = eval.select(col(vecCol).as("__ev"))
    train
      .join(org.apache.spark.sql.functions.broadcast(ev))
      .groupBy(col(idCol))
      .agg(max(round(graft.functions.VectorOps.cosine(col(vecCol), col("__ev")), 6))
        .as("max_eval_cos"))
      .withColumn("contaminated", col("max_eval_cos") >= tau)
  }
}
