package graft

import java.nio.file.{Files, Paths, Path => JPath}
import java.nio.{ByteBuffer, ByteOrder}

import graft.sources.ArrowIpc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corrupted-input battery for the Arrow IPC reader — the engine-side
  * mirror of the reference's IPC fuzz harnesses
  * (`cpp/src/arrow/ipc/file_fuzz.cc`, `stream_fuzz.cc`; SURVEY §5.6):
  * every malformed input must fail LOUDLY with a diagnostic exception —
  * never a hang, never a JVM crash, and never silent wrong rows — and
  * the session must keep reading valid files afterwards (no allocator /
  * reader state poisoning).
  *
  * Corruptions are byte surgery on files the writer itself produced, so
  * each case isolates exactly one framing violation:
  *   FILE framing (`.arrow`): zero-length, garbage, bad trailing magic,
  *   truncated footer, lying footer length (huge + negative), scrambled
  *   footer flatbuffer;
  *   STREAM framing (`.arrows`): bad continuation bytes, lying metadata
  *   length pointing past EOF, truncation mid-stream, scrambled
  *   record-batch metadata (lying buffer/field lengths).
  */
class IpcFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(tag: String): JPath =
    Files.createTempDirectory(s"graft_ipcfuzz_$tag")

  /** One valid single-partition IPC dataset of each framing. */
  private lazy val (goodFile, goodStream): (Array[Byte], Array[Byte]) = {
    import spark.implicits._
    val df = (0 until 200).map(i => (i.toLong, s"word_$i", i * 0.5))
      .toDF("id", "w", "x").coalesce(1)
    val fDir = freshDir("goodfile")
    val sDir = freshDir("goodstream")
    ArrowIpc.write(df, fDir.toString)
    ArrowIpc.writeStream(df, sDir.toString)
    def only(dir: JPath, ext: String): Array[Byte] = {
      val s = Files.list(dir)
      val found = try {
        val f = s.iterator()
        var hit: JPath = null
        while (f.hasNext) { val p = f.next(); if (p.toString.endsWith(ext)) hit = p }
        hit
      } finally s.close()
      assert(found != null, s"no $ext under $dir")
      Files.readAllBytes(found)
    }
    (only(fDir, ".arrow"), only(sDir, ".arrows"))
  }

  /** Materialize `bytes` as the only file of a dataset dir and read it
    * through the full reader path; returns the thrown diagnostic. */
  private def mustFail(tag: String, bytes: Array[Byte], stream: Boolean): Throwable = {
    val dir = freshDir(tag)
    val ext = if (stream) "arrows" else "arrow"
    Files.write(dir.resolve(s"part-00000.$ext"), bytes)
    val t = intercept[Throwable] {
      val df = if (stream) ArrowIpc.readStream(spark, dir.toString)
      else ArrowIpc.read(spark, dir.toString)
      df.collect()
    }
    // loud and diagnosable — not a JVM-level crash surface
    assert(!t.isInstanceOf[StackOverflowError], s"$tag: stack overflow")
    assert(!t.isInstanceOf[InterruptedException], s"$tag: hang/interrupt")
    t
  }

  /** After a corruption case, the reader must still read valid data —
    * no poisoned allocator, cache, or channel state. */
  private def stillHealthy(): Unit = {
    val dir = freshDir("healthy")
    Files.write(dir.resolve("part-00000.arrow"), goodFile)
    assert(ArrowIpc.read(spark, dir.toString).count() == 200)
  }

  private def patched(src: Array[Byte])(edit: ByteBuffer => Unit): Array[Byte] = {
    val b = src.clone()
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    edit(bb)
    b
  }

  // ---- FILE framing ----------------------------------------------------

  test("file: zero-length input fails loudly") {
    mustFail("f_empty", Array.emptyByteArray, stream = false)
    stillHealthy()
  }

  test("file: garbage bytes (no magic) fail loudly") {
    val junk = Array.tabulate[Byte](512)(i => ((i * 37 + 11) & 0xff).toByte)
    mustFail("f_junk", junk, stream = false)
    stillHealthy()
  }

  test("file: corrupted trailing magic fails loudly") {
    val bad = patched(goodFile) { bb =>
      bb.position(goodFile.length - 6)
      bb.put("NOTARW".getBytes("ASCII"))
    }
    mustFail("f_magic", bad, stream = false)
    stillHealthy()
  }

  test("file: truncated footer fails loudly") {
    mustFail("f_trunc_footer", goodFile.dropRight(25), stream = false)
    stillHealthy()
  }

  test("file: lying footer length (huge) fails loudly") {
    // tail layout: [footer fb][int32 footerLength]["ARROW1"]
    val bad = patched(goodFile)(_.putInt(goodFile.length - 10, Int.MaxValue))
    mustFail("f_len_huge", bad, stream = false)
    stillHealthy()
  }

  test("file: lying footer length (negative) fails loudly") {
    val bad = patched(goodFile)(_.putInt(goodFile.length - 10, -5))
    mustFail("f_len_neg", bad, stream = false)
    stillHealthy()
  }

  test("file: scrambled footer flatbuffer fails loudly") {
    val footerLen = ByteBuffer.wrap(goodFile, goodFile.length - 10, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    assert(footerLen > 32 && footerLen < goodFile.length)
    val footerStart = goodFile.length - 10 - footerLen
    val bad = patched(goodFile) { bb =>
      bb.position(footerStart + footerLen / 2)
      (0 until 16).foreach(_ => bb.put(0xff.toByte))
    }
    mustFail("f_footer_scramble", bad, stream = false)
    stillHealthy()
  }

  test("file: truncation mid-body fails loudly") {
    mustFail("f_trunc_body", goodFile.take(goodFile.length * 3 / 5), stream = false)
    stillHealthy()
  }

  // ---- STREAM framing --------------------------------------------------

  test("stream: corrupted continuation bytes fail loudly") {
    // first message framing: [0xFFFFFFFF][int32 metaLen][metadata]
    assert(ByteBuffer.wrap(goodStream, 0, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt == -1, "writer framing changed")
    val bad = patched(goodStream)(_.putInt(0, 0x12345678))
    mustFail("s_cont", bad, stream = true)
    stillHealthy()
  }

  test("stream: lying metadata length past EOF fails loudly") {
    val bad = patched(goodStream)(_.putInt(4, 0x00ffffff))
    mustFail("s_len", bad, stream = true)
    stillHealthy()
  }

  test("stream: truncation mid-stream fails loudly") {
    mustFail("s_trunc", goodStream.take(goodStream.length * 3 / 5), stream = true)
    stillHealthy()
  }

  test("stream: scrambled record-batch metadata (lying lengths) fails loudly") {
    // schema message has no body, so the record-batch message starts at
    // 8 + schemaMetaLen (framing metaLen is already 8-byte padded)
    val schemaMetaLen = ByteBuffer.wrap(goodStream, 4, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    val msg2 = 8 + schemaMetaLen
    assert(ByteBuffer.wrap(goodStream, msg2, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt == -1, "framing walk landed off-message")
    val msg2MetaLen = ByteBuffer.wrap(goodStream, msg2 + 4, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    assert(msg2MetaLen > 48)
    val bad = patched(goodStream) { bb =>
      bb.position(msg2 + 8 + msg2MetaLen / 2)
      (0 until 8).foreach(_ => bb.put(0xff.toByte))
    }
    mustFail("s_batch_meta", bad, stream = true)
    stillHealthy()
  }

  test("stream: record batch referencing a SPLICED-OUT dictionary fails loudly") {
    // write a real dictionary-encoded stream with ArrowIpc.writeDict's
    // machinery at the arrow-java level, then remove the dictionary
    // batch message (message #2) by byte surgery: the record batch
    // still declares dictionary id 1 but no dictionary ever arrives
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{IntVector, VarCharVector, VectorSchemaRoot}
    import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryProvider}
    import org.apache.arrow.vector.ipc.ArrowStreamWriter
    import org.apache.arrow.vector.types.pojo.DictionaryEncoding
    val alloc = new RootAllocator(Long.MaxValue)
    val bytes = try {
      val dictVec = new VarCharVector("dict", alloc)
      dictVec.allocateNew()
      Seq("alpha", "beta", "gamma").zipWithIndex.foreach { case (s, i) =>
        dictVec.setSafe(i, s.getBytes("UTF-8"))
      }
      dictVec.setValueCount(3)
      val enc = new DictionaryEncoding(1L, false, null)
      val dict = new Dictionary(dictVec, enc)
      val provider = new DictionaryProvider.MapDictionaryProvider(dict)
      val indexed = new IntVector(org.apache.arrow.vector.types.pojo.Field
        .nullable("w", new org.apache.arrow.vector.types.pojo.ArrowType.Int(32, true))
        .getName, new org.apache.arrow.vector.types.pojo.FieldType(
          true, new org.apache.arrow.vector.types.pojo.ArrowType.Int(32, true), enc),
        alloc)
      indexed.allocateNew(4)
      (0 until 4).foreach(i => indexed.setSafe(i, i % 3))
      indexed.setValueCount(4)
      val root = new VectorSchemaRoot(java.util.List.of(indexed.getField),
        java.util.List.of[org.apache.arrow.vector.FieldVector](indexed), 4)
      val bos = new java.io.ByteArrayOutputStream()
      val w = new ArrowStreamWriter(root, provider, bos)
      w.start(); w.writeBatch(); w.end(); w.close()
      root.close(); dictVec.close()
      bos.toByteArray
    } finally alloc.close()
    // framing walk: msg1 = schema (no body); msg2 = dictionary batch
    def metaLen(off: Int): Int = {
      assert(ByteBuffer.wrap(bytes, off, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt == -1, s"no continuation at $off")
      ByteBuffer.wrap(bytes, off + 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    }
    val msg2 = 8 + metaLen(0)
    val msg2MetaEnd = msg2 + 8 + metaLen(msg2)
    // the dictionary batch body follows its metadata, 8-byte aligned; the
    // next continuation marker is the record batch message — scan for it
    var msg3 = msg2MetaEnd
    while (msg3 < bytes.length - 8 && ByteBuffer.wrap(bytes, msg3, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt != -1) {
      msg3 += 8
    }
    assert(msg3 < bytes.length - 8, "record batch message not found")
    assert(msg3 > msg2MetaEnd, "dictionary batch had no body?")
    val spliced = bytes.take(msg2) ++ bytes.drop(msg3)
    val t = mustFail("s_missing_dict", spliced, stream = true)
    // the loud-error contract: a diagnostic message exists somewhere in
    // the chain (arrow-java's "missing dictionary" or our own require)
    val msgs = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
      .flatMap(e => Option(e.getMessage)).toSeq
    assert(msgs.nonEmpty, s"no diagnostic in ${t.getClass}")
    stillHealthy()
    // and the unspliced original still reads (the surgery, not the
    // writer, is what broke it)
    val ok = freshDir("s_dict_ok")
    Files.write(ok.resolve("part-00000.arrows"), bytes)
    assert(ArrowIpc.readStream(spark, ok.toString).count() == 4)
  }

  test("stream: empty input fails loudly") {
    mustFail("s_empty", Array.emptyByteArray, stream = true)
    stillHealthy()
  }

  test("diagnostics carry a message (not bare nulls)") {
    val t1 = mustFail("f_diag", goodFile.dropRight(25), stream = false)
    val t2 = mustFail("s_diag", patched(goodStream)(_.putInt(0, 7)), stream = true)
    Seq(t1, t2).foreach { t =>
      val msgs = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(e => Option(e.getMessage)).toSeq
      assert(msgs.nonEmpty, s"no diagnostic anywhere in ${t.getClass}")
    }
  }
}
