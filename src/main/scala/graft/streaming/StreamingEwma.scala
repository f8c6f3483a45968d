package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming twin of [[graft.operators.Ewma]]: the windowed EWMA's state
  * is BY CONSTRUCTION the trailing `window` observations per key, so the
  * streaming form carries exactly that — one ≤window-element double
  * array per key, forever — and emits each row's smoothed value as it
  * arrives. The per-row arithmetic is the batch operator's fold verbatim
  * (sequential weighted sum / weight total, HALF_UP round at 9 dp), so
  * parity is bit-exact, not approximate (StreamingSpec asserts it).
  *
  * Ordering contract mirrors [[StreamingTransitions]]: rows sort within
  * a micro-batch by (ts, id); across batches the operator assumes
  * event-time-ordered arrival. NULL values must be filtered upstream
  * (the batch operator excludes them before windowing — same contract).
  */
object StreamingEwma {

  case class SEv(key: String, ts_us: Long, id: Long, value: Double)
  case class SEwma(key: String, id: Long, value: Double, ewma: Double)
  case class Tail(vals: Seq[Double])

  class EwmaProcessor(alpha: Double, window: Int)
      extends StatefulProcessor[String, SEv, SEwma] {
    @transient private var st: ValueState[Tail] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Tail](
        "tail", Encoders.product[Tail], TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[SEv],
        timerValues: TimerValues): Iterator[SEwma] = {
      val decay = 1.0 - alpha
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.id))
      var tail = if (st.exists()) st.get().vals else Seq.empty[Double]
      val out = sorted.map { e =>
        tail = (tail :+ e.value).takeRight(window)
        val n = tail.length
        // the batch column's folds verbatim: left-to-right IEEE adds over
        // weights (1-alpha)^(n-1-i), oldest first
        val num = tail.zipWithIndex
          .map { case (x, i) => x * math.pow(decay, (n - 1 - i).toDouble) }
          .foldLeft(0.0)(_ + _)
        val den = tail.indices
          .map(i => math.pow(decay, (n - 1 - i).toDouble))
          .foldLeft(0.0)(_ + _)
        val r = BigDecimal(num / den)
          .setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
        SEwma(key, e.id, e.value, r)
      }
      st.update(Tail(tail))
      out.iterator
    }
  }

  case class SAnom(key: String, id: Long, value: Double,
      score: Option[Double], anomaly: Option[Boolean])

  /** Streaming twin of [[graft.operators.Ewma.anomalies]]: the stored
    * trailing tail IS the batch rule's preceding-window frame — each row
    * scores against the state BEFORE it is appended, so a spike never
    * dampens its own baseline, exactly as the batch `rowsBetween(-w,-1)`
    * frame excludes the current row. Same conventions (NULL below
    * `minObs`, zero-variance flags any deviation with NULL score) and
    * the same fold arithmetic, so parity is bit-exact. */
  class AnomalyProcessor(alpha: Double, window: Int, k: Double, minObs: Int)
      extends StatefulProcessor[String, SEv, SAnom] {
    @transient private var st: ValueState[Tail] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Tail](
        "tail", Encoders.product[Tail], TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[SEv],
        timerValues: TimerValues): Iterator[SAnom] = {
      val decay = 1.0 - alpha
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.id))
      var tail = if (st.exists()) st.get().vals else Seq.empty[Double]
      val out = sorted.map { e =>
        val base = tail // the batch frame: up to `window` PRECEDING rows
        val n = base.length
        val res = if (n < minObs) SAnom(key, e.id, e.value, None, None)
        else {
          def fold(f: (Double, Int) => Double): Double =
            base.indices.map(i => f(base(i), i)).foldLeft(0.0)(_ + _)
          val den = fold((_, i) => math.pow(decay, (n - 1 - i).toDouble))
          val m = fold((x, i) => x * math.pow(decay, (n - 1 - i).toDouble)) / den
          val s = math.sqrt(math.max(
            fold((x, i) => x * x * math.pow(decay, (n - 1 - i).toDouble)) / den
              - m * m, 0.0))
          if (s == 0.0) SAnom(key, e.id, e.value, None, Some(e.value != m))
          else SAnom(key, e.id, e.value,
            Some(BigDecimal((e.value - m) / s)
              .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
              .toDouble),
            Some(math.abs(e.value - m) > k * s))
        }
        tail = (tail :+ e.value).takeRight(window)
        res
      }
      st.update(Tail(tail))
      out.iterator
    }
  }

  /** Anomaly-flagged stream (see [[AnomalyProcessor]]); `df` must
    * already exclude NULL values. */
  def anomalyStream(
      spark: SparkSession, df: DataFrame,
      keyCol: String, tsCol: String, idCol: String, valCol: String,
      alpha: Double, window: Int, k: Double = 3.0,
      minObs: Int = 4): Dataset[SAnom] = {
    import spark.implicits._
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1), got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    require(minObs >= 1 && minObs <= window,
      s"minObs in [1, window], got $minObs")
    df.select(
        col(keyCol).cast("string").as("key"),
        unix_micros(col(tsCol)).as("ts_us"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("value"))
      .as[SEv]
      .groupByKey(_.key)
      .transformWithState(
        new AnomalyProcessor(alpha, window, k, minObs),
        TimeMode.None(), OutputMode.Append())
  }

  /** Smoothed stream over a keyed value stream (RocksDB state store
    * required — Spark's own transformWithState constraint). `df` must
    * already exclude NULL values. */
  def smoothStream(
      spark: SparkSession, df: DataFrame,
      keyCol: String, tsCol: String, idCol: String, valCol: String,
      alpha: Double, window: Int): Dataset[SEwma] = {
    import spark.implicits._
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1), got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    df.select(
        col(keyCol).cast("string").as("key"),
        unix_micros(col(tsCol)).as("ts_us"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("value"))
      .as[SEv]
      .groupByKey(_.key)
      .transformWithState(
        new EwmaProcessor(alpha, window), TimeMode.None(), OutputMode.Append())
  }
}
