package graft.sources

import scala.collection.JavaConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC (Feather v2) file source/sink built on the arrow-java jars
  * Spark ships (reference surface: cpp/src/arrow/ipc/reader.h:74,
  * writer.h:143 — the one reference format Spark has no native source for;
  * SURVEY.md §2.4).
  *
  * Distribution model: one IPC file per partition on write (executors
  * write independently — same layout contract as Spark's file sinks), and
  * one read task per file. Supported Spark types: long/int/double/float/
  * string/boolean/date/timestamp — the relational core; nested types can
  * be added vector-by-vector.
  */
object ArrowIpc {

  private def toArrowField(f: StructField): Field = {
    val t = f.dataType match {
      case LongType      => new ArrowType.Int(64, true)
      case IntegerType   => new ArrowType.Int(32, true)
      case DoubleType    => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType     => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType    => new ArrowType.Utf8()
      case BooleanType   => new ArrowType.Bool()
      case DateType      => new ArrowType.Date(DateUnit.DAY)
      case TimestampType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
      case other => throw new IllegalArgumentException(s"ArrowIpc: unsupported type $other")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), java.util.Collections.emptyList())
  }

  private def fromArrowField(f: Field): StructField = {
    val t = f.getType match {
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case _: ArrowType.Date => DateType
      case _: ArrowType.Timestamp => TimestampType
      case other => throw new IllegalArgumentException(s"ArrowIpc: unsupported arrow type $other")
    }
    StructField(f.getName, t, f.isNullable)
  }

  private def setValue(v: FieldVector, i: Int, value: Any): Unit = (v, value) match {
    case (x: BigIntVector, y: java.lang.Long)            => x.setSafe(i, y)
    case (x: IntVector, y: java.lang.Integer)            => x.setSafe(i, y)
    case (x: Float8Vector, y: java.lang.Double)          => x.setSafe(i, y)
    case (x: Float4Vector, y: java.lang.Float)           => x.setSafe(i, y)
    case (x: VarCharVector, y: String)                   => x.setSafe(i, y.getBytes("UTF-8"))
    case (x: BitVector, y: java.lang.Boolean)            => x.setSafe(i, if (y) 1 else 0)
    case (x: DateDayVector, y: java.sql.Date)            => x.setSafe(i, y.toLocalDate.toEpochDay.toInt)
    case (x: TimeStampMicroTZVector, y: java.sql.Timestamp) =>
      x.setSafe(i, y.getTime * 1000L + (y.getNanos % 1000000) / 1000)
    case _ => throw new IllegalArgumentException(
      s"ArrowIpc: cannot write ${value.getClass} into ${v.getClass}")
  }

  private def getValue(v: FieldVector, i: Int): Any = v match {
    case x: BigIntVector   => x.get(i)
    case x: IntVector      => x.get(i)
    case x: Float8Vector   => x.get(i)
    case x: Float4Vector   => x.get(i)
    case x: VarCharVector  => new String(x.get(i), "UTF-8")
    case x: BitVector      => x.get(i) == 1
    case x: DateDayVector  => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x.get(i)))
    case x: TimeStampMicroTZVector =>
      val micros = x.get(i)
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case other => throw new IllegalArgumentException(s"ArrowIpc: unsupported vector $other")
  }

  /** Write `df` as a directory of Arrow IPC files, one per partition. */
  def write(df: DataFrame, dir: String, batchSize: Int = 4096): Unit = {
    val schema = df.schema
    new java.io.File(dir).mkdirs()
    df.rdd.foreachPartition { rows =>
      if (rows.nonEmpty) {
        val part = TaskContext.getPartitionId()
        val allocator = new RootAllocator(Long.MaxValue)
        val arrowSchema = new ArrowSchema(schema.fields.map(toArrowField).toSeq.asJava)
        val root = VectorSchemaRoot.create(arrowSchema, allocator)
        val out = new java.io.FileOutputStream(s"$dir/part-$part.arrow")
        val writer = new ArrowFileWriter(root, null, out.getChannel)
        try {
          writer.start()
          rows.grouped(batchSize).foreach { batch =>
            root.allocateNew()
            var i = 0
            batch.foreach { row =>
              schema.fields.indices.foreach { c =>
                val vec = root.getVector(c)
                if (row.isNullAt(c)) vec.setNull(i)
                else setValue(vec, i, row.get(c))
              }
              i += 1
            }
            root.setRowCount(i)
            writer.writeBatch()
          }
          writer.end()
        } finally {
          writer.close(); out.close(); root.close(); allocator.close()
        }
      }
    }
  }

  /** Read a directory of Arrow IPC files back into a DataFrame; schema is
    * taken from the first file's footer, one read task per file. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrow")).map(_.getAbsolutePath).sorted
    require(files.nonEmpty, s"ArrowIpc.read: no .arrow files in $dir")
    val schema = {
      val allocator = new RootAllocator(Long.MaxValue)
      val in = new java.io.FileInputStream(files.head)
      val reader = new ArrowFileReader(in.getChannel, allocator)
      try StructType(reader.getVectorSchemaRoot.getSchema.getFields.asScala.map(fromArrowField).toSeq)
      finally { reader.close(); in.close(); allocator.close() }
    }
    val rowsRdd = spark.sparkContext
      .parallelize(files.toSeq, files.length)
      .flatMap { file =>
        val allocator = new RootAllocator(Long.MaxValue)
        val in = new java.io.FileInputStream(file)
        val reader = new ArrowFileReader(in.getChannel, allocator)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        try {
          val root = reader.getVectorSchemaRoot
          while (reader.loadNextBatch()) {
            (0 until root.getRowCount).foreach { i =>
              out += Row.fromSeq(root.getFieldVectors.asScala.map { v =>
                if (v.isNull(i)) null else getValue(v, i)
              }.toSeq)
            }
          }
        } finally { reader.close(); in.close(); allocator.close() }
        out
      }
    spark.createDataFrame(rowsRdd, schema)
  }
}
