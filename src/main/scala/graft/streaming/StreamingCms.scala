package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.LongType

import graft.functions.expr.CountMinAgg

/** Streaming twin of the Count-Min frequency artifact (`q53_cms_topk`):
  * the stream maintains per-SHARD sketches continuously (shard =
  * key mod `numShards`, so ingest parallelism is a parameter, not a
  * bottleneck) and re-emits each shard's cumulative serialized state
  * every micro-batch. The per-shard state is the sketch's own bounded
  * buffer — exact map below the cap, fixed matrix after — and the
  * merged artifact (union of the LATEST state per shard, plain
  * [[graft.functions.expr.CountMinUnionAgg]] algebra) equals the batch
  * sketch over everything ingested so far, because CMS merge is
  * count-addition and sharding partitions the stream by key
  * (StreamingSpec asserts estimate parity against
  * [[graft.functions.expr.CountMinAgg]] on the same rows).
  */
object StreamingCms {

  case class KeyedRow(key: Long)
  case class ShardState(shard: Long, seq: Long, state: Array[Byte])

  class CmsProcessor(exactCap: Int, depth: Int, width: Int)
      extends StatefulProcessor[Long, KeyedRow, ShardState] {
    @transient private var st: ValueState[(Long, Array[Byte])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Array[Byte])](
        "cms_state", Encoders.product[(Long, Array[Byte])], TTLConfig.NONE)

    override def handleInputRows(
        shard: Long, rows: Iterator[KeyedRow],
        timerValues: TimerValues): Iterator[ShardState] = {
      val (seq, buf) =
        if (st.exists()) {
          val (s, bytes) = st.get()
          (s, CountMinAgg.Buf.deserialize(bytes, exactCap, depth, width))
        } else (0L, new CountMinAgg.Buf(exactCap, depth, width))
      rows.foreach { r =>
        buf.add(XxHash64Function.hash(r.key, LongType, 42L), 1L)
      }
      val bytes = buf.serialize()
      st.update((seq + 1, bytes))
      Iterator.single(ShardState(shard, seq + 1, bytes))
    }
  }

  /** Continuously-maintained frequency sketches over `keyCol` (a long
    * column): one cumulative serialized CMS state per shard per
    * micro-batch; downstream keeps the max-seq state per shard and
    * unions them. RocksDB state store required (transformWithState). */
  def sketchStream(
      spark: SparkSession, df: DataFrame, keyCol: String,
      numShards: Int = 8,
      exactCap: Int = CountMinAgg.DefaultExactCap,
      depth: Int = CountMinAgg.DefaultDepth,
      width: Int = CountMinAgg.DefaultWidth): Dataset[ShardState] = {
    import spark.implicits._
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    df.select(col(keyCol).cast("long").as("key"))
      .filter(col("key").isNotNull)
      .as[KeyedRow]
      .groupByKey(r => java.lang.Long.remainderUnsigned(r.key, numShards.toLong))
      .transformWithState(
        new CmsProcessor(exactCap, depth, width), TimeMode.None(), OutputMode.Append())
  }
}
