package graft

import graft.pipeline.Chunking
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def doc(id: Long, n: Int) =
    (id, (1 to n).map(i => s"w$i").mkString(" "))

  test("short document yields exactly one chunk equal to itself") {
    import spark.implicits._
    val df = Seq(doc(1L, 5), doc(2L, 8)).toDF("id", "text")
    val out = Chunking.chunks(df, "id", "text", maxTokens = 8, overlap = 2)
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Int]("chunk_idx") == 0)
    assert(out(0).getAs[String]("chunk_text") == "w1 w2 w3 w4 w5")
    assert(out(0).getAs[Int]("n_chunk_tokens") == 5)
    assert(out(1).getAs[Int]("n_chunk_tokens") == 8)
  }

  test("chunk count matches ceil((n - max) / stride) + 1 and windows overlap") {
    import spark.implicits._
    // n=20, max=8, overlap=3 → stride 5 → ceil(12/5)+1 = 4 chunks
    val df = Seq(doc(1L, 20)).toDF("id", "text")
    val out = Chunking.chunks(df, "id", "text", maxTokens = 8, overlap = 3)
      .orderBy("chunk_idx").collect()
    assert(out.length == 4)
    val texts = out.map(_.getAs[String]("chunk_text").split(" ").toList)
    // consecutive chunks share exactly `overlap` tokens of context
    for (i <- 0 until texts.length - 1 if texts(i).length == 8)
      assert(texts(i).takeRight(3) == texts(i + 1).take(3))
    // starts advance by stride; last window still begins within the doc
    assert(texts.map(_.head).toList == List("w1", "w6", "w11", "w16"))
    assert(out.last.getAs[Int]("n_chunk_tokens") == 5) // 20 - 3*5
  }

  test("zero overlap partitions the document exactly") {
    import spark.implicits._
    val df = Seq(doc(1L, 17)).toDF("id", "text")
    val out = Chunking.chunks(df, "id", "text", maxTokens = 5, overlap = 0)
      .orderBy("chunk_idx").collect()
    val rebuilt = out.map(_.getAs[String]("chunk_text")).mkString(" ")
    assert(rebuilt == (1 to 17).map(i => s"w$i").mkString(" "))
    assert(out.map(_.getAs[Int]("n_chunk_tokens")).sum == 17)
  }

  test("every corpus token is covered: stride-prefix concatenation rebuilds the doc") {
    // chunk[0..nc-2] truncated to stride tokens ++ full last chunk == doc
    val max = 16; val ov = 4; val stride = max - ov
    val docs = Tables.documents(spark, sf).limit(50)
    val chunks = Chunking.chunks(docs, "doc_id", "text", max, ov)
    val rebuilt = chunks
      .withColumn("nc", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .withColumn("part",
        when(col("chunk_idx") < col("nc") - 1,
          concat_ws(" ", slice(split(col("chunk_text"), " "), 1, stride)))
          .otherwise(col("chunk_text")))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("chunk_idx"), col("part")))),
          s => s.getField("part")), " ").as("text2"))
    val bad = rebuilt.join(docs, Seq("doc_id"))
      .filter(col("text2") =!= col("text")).count()
    assert(bad == 0)
  }

  test("invalid parameters are rejected loudly") {
    import spark.implicits._
    val df = Seq(doc(1L, 3)).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunks(df, "id", "text", maxTokens = 0, overlap = 0)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunks(df, "id", "text", maxTokens = 8, overlap = 8)
    }
  }
}
