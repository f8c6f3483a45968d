package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.channels.{Channels, SeekableByteChannel}

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{VectorLoader, VectorSchemaRoot, VectorUnloader}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter, ArrowReader, ArrowStreamReader, ArrowStreamWriter, ArrowWriter, SeekableReadChannel, WriteChannel}
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.StructType

/** Hadoop `Configuration` is not Java-serializable; standard writable
  * wrapper so executor tasks see the driver's filesystem configuration. */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Arrow IPC source/sink in BOTH reference formats: the random-access
  * file format (Feather v2 — reference `RecordBatchFileReader`,
  * cpp/src/arrow/ipc/reader.h:109, writer.h:167) and the streaming
  * format (`RecordBatchStreamReader`, reader.h:74, writer.h:143 — the
  * pipe/socket interchange framing: schema message, record batches, end
  * marker, no footer and no seeks). SURVEY.md §2.4.
  *
  * Fully vectorized: the write path runs Spark's own InternalRow→Arrow
  * columnar serializer (the engine behind toPandas/mapInArrow) per
  * partition and streams record batches into one IPC file per partition;
  * the read path streams batches back through the inverse converter into
  * an InternalRow RDD — no per-row `Row.get`/`setSafe`, no whole-file
  * row materialization, and every Spark type Arrow interop supports
  * (nested arrays/structs/maps included) comes along for free. All file
  * IO goes through the Hadoop FileSystem API, so any configured scheme
  * (file://, hdfs://, s3a://) works, and discovery is an FS glob, not a
  * driver-local directory listing.
  */
object ArrowIpc {

  /** Minimal seekable-channel view over a Hadoop input stream (the IPC
    * footer is read via seeks). */
  private final class HadoopSeekableChannel(in: FSDataInputStream, length: Long)
    extends SeekableByteChannel {
    private var open = true
    override def read(dst: ByteBuffer): Int = {
      val buf = new Array[Byte](dst.remaining())
      val n = in.read(buf, 0, buf.length)
      if (n > 0) dst.put(buf, 0, n)
      n
    }
    override def write(src: ByteBuffer): Int = throw new UnsupportedOperationException
    override def position(): Long = in.getPos
    override def position(newPosition: Long): SeekableByteChannel = { in.seek(newPosition); this }
    override def size(): Long = length
    override def truncate(size: Long): SeekableByteChannel = throw new UnsupportedOperationException
    override def isOpen: Boolean = open
    override def close(): Unit = { open = false; in.close() }
  }

  /** IPC body-buffer compression (reference `IpcWriteOptions::codec`,
    * cpp/src/arrow/ipc/options.h:118-124): "none", "zstd" or "lz4"
    * (LZ4_FRAME — the only LZ4 framing the IPC spec admits). Readers
    * decode transparently from the per-batch compression header. */
  private def codecOf(codec: String)
      : Option[org.apache.arrow.vector.compression.CompressionUtil.CodecType] =
    codec match {
      case "none" => None
      case "zstd" => Some(org.apache.arrow.vector.compression.CompressionUtil.CodecType.ZSTD)
      case "lz4"  => Some(org.apache.arrow.vector.compression.CompressionUtil.CodecType.LZ4_FRAME)
      case other  => throw new IllegalArgumentException(
        s"unknown IPC codec '$other' (none|zstd|lz4)")
    }

  /** Write `df` as a directory of Arrow IPC files, one per partition.
    * Per partition: Spark's columnar serializer produces framed record
    * batches; a VectorLoader moves their buffers into the file writer —
    * buffer transfers end to end (compressed at the writer when a codec
    * is set). */
  def write(df: DataFrame, dir: String, batchSize: Int = 4096,
      codec: String = "none"): Unit = {
    val ct = codecOf(codec)
    writeWith(df, dir, batchSize, "arrow",
      (root, ch) => ct match {
        case None => new ArrowFileWriter(root, null, ch)
        case Some(c) => new ArrowFileWriter(root, null, ch,
          null, org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
          org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE, c)
      })
  }

  /** Write `df` in the IPC STREAM format (`.arrows`), one stream per
    * partition — byte-for-byte what a socket peer would send. */
  def writeStream(df: DataFrame, dir: String, batchSize: Int = 4096,
      codec: String = "none"): Unit = {
    val ct = codecOf(codec)
    writeWith(df, dir, batchSize, "arrows",
      (root, ch) => ct match {
        case None => new ArrowStreamWriter(root, null, ch)
        case Some(c) => new ArrowStreamWriter(root, null, ch,
          org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
          org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE, c)
      })
  }

  private def writeWith(
      df: DataFrame, dir: String, batchSize: Int, ext: String,
      mkWriter: (VectorSchemaRoot, java.nio.channels.WritableByteChannel) => ArrowWriter): Unit = {
    val schema = df.schema
    val hconf = new SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(hconf.value)
    if (fs.exists(dirPath)) fs.delete(dirPath, true) // overwrite semantics
    fs.mkdirs(dirPath)
    Bridge.toInternalRdd(df).foreachPartition { rows =>
      if (rows.nonEmpty) {
        val part = TaskContext.getPartitionId()
        val path = new Path(dir, f"part-$part%05d.$ext")
        val pfs = path.getFileSystem(hconf.value)
        val allocator = new RootAllocator(Long.MaxValue)
        val root = VectorSchemaRoot.create(Bridge.toArrowSchema(schema), allocator)
        val loader = new VectorLoader(root)
        val out = pfs.create(path, true)
        val writer = mkWriter(root, Channels.newChannel(out))
        try {
          writer.start()
          Bridge.toArrowBatchIterator(rows, schema, batchSize, TaskContext.get()).foreach { bytes =>
            // framed record-batch payload → ArrowRecordBatch (buffer move)
            val batch = MessageSerializer.deserializeRecordBatch(
              new org.apache.arrow.vector.ipc.ReadChannel(
                Channels.newChannel(new java.io.ByteArrayInputStream(bytes))), allocator)
            try loader.load(batch) finally batch.close()
            writer.writeBatch()
          }
          writer.end()
        } finally {
          writer.close(); out.close(); root.close(); allocator.close()
        }
      }
    }
  }

  /** Stream one file's record batches as framed payloads (the format
    * [[Bridge.fromArrowBatchIterator]] consumes). Batch-at-a-time: peak
    * memory is one batch, not the file. */
  private def openReader(
      conf: Configuration, file: String, stream: Boolean,
      allocator: RootAllocator): ArrowReader = {
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    // always hand the reader the codec factory: uncompressed batches never
    // consult it, compressed ones (zstd / lz4_frame) decode transparently
    val codecs = org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE
    if (stream) new ArrowStreamReader(in, allocator, codecs)
    else {
      val len = fs.getFileStatus(path).getLen
      new ArrowFileReader(
        new SeekableReadChannel(new HadoopSeekableChannel(in, len)), allocator, codecs)
    }
  }

  private def batchBytes(
      conf: Configuration, file: String, stream: Boolean): Iterator[Array[Byte]] = {
    val allocator = new RootAllocator(Long.MaxValue)
    val reader = openReader(conf, file, stream, allocator)
    val unloader = new VectorUnloader(reader.getVectorSchemaRoot)
    var closed = false
    def closeAll(): Unit = if (!closed) { closed = true; reader.close(); allocator.close() }
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
    new Iterator[Array[Byte]] {
      private var advanced = false
      private var hasBatch = false
      private def advance(): Unit = if (!advanced) {
        hasBatch = !closed && reader.loadNextBatch()
        if (!hasBatch) closeAll()
        advanced = true
      }
      override def hasNext: Boolean = { advance(); hasBatch }
      override def next(): Array[Byte] = {
        advance()
        if (!hasBatch) throw new NoSuchElementException
        advanced = false
        val batch = unloader.getRecordBatch
        val bos = new ByteArrayOutputStream()
        try MessageSerializer.serialize(new WriteChannel(Channels.newChannel(bos)), batch)
        finally batch.close()
        bos.toByteArray
      }
    }
  }

  /** Read a directory of Arrow IPC files back into a DataFrame; schema
    * from the first file's footer (Spark's own Arrow↔Spark type mapping,
    * nested types included), one read task per file. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readWith(spark, dir, "*.arrow", stream = false)

  /** Read a directory of IPC STREAM files (`.arrows`) — sequential
    * schema-then-batches framing, no footer, no seeks (a pure forward
    * read, exactly what a pipe would deliver). */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    readWith(spark, dir, "*.arrows", stream = true)

  private def readWith(
      spark: SparkSession, dir: String, glob: String, stream: Boolean): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val files = Option(fs.globStatus(new Path(dirPath, glob)))
      .getOrElse(Array.empty).map(_.getPath.toString).sorted
    require(files.nonEmpty, s"ArrowIpc.read: no $glob files in $dir")
    val schema: StructType = {
      val allocator = new RootAllocator(Long.MaxValue)
      val reader = openReader(conf, files.head, stream, allocator)
      try Bridge.fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
      finally { reader.close(); allocator.close() }
    }
    val hconf = new SerializableHadoopConf(conf)
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .flatMap(f => batchBytes(hconf.value, f, stream))
      .mapPartitions(it => Bridge.fromArrowBatchIterator(it, schema, TaskContext.get()))
    Bridge.internalCreateDataFrame(spark, rows, schema)
  }
}
