package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("decode stub emits the typed feature schema") {
    // the declared query surfaces scalar projections of the vector (the
    // gate's comparator can't sort array cells); the full typed vector is
    // asserted on the decode output directly
    val out = Registry.byName("mm_decode_stub").run(spark, sf)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_bytes", "kind", "width", "height", "f0", "feature_sum"))
    assert(out.count() == Tables.documents(spark, sf).count())
    val media = Tables.documents(spark, sf)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
    val rows = Multimodal.decode(spark, media).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Int]("n_bytes") > 0)
      assert(Set("image", "audio")(r.getAs[String]("kind")))
      val f = r.getSeq[Double](r.fieldIndex("feature"))
      assert(f.length == 8 && f.forall(v => v >= 0.0 && v <= 1.0))
    }
  }

  test("decode is deterministic and n_bytes matches UTF-8 byte length") {
    val a = Registry.byName("mm_decode_stub").run(spark, sf).collect().toSeq
    val b = Registry.byName("mm_decode_stub").run(spark, sf).collect().toSeq
    assert(a == b)
    val joined = Registry.byName("mm_decode_stub").run(spark, sf)
      .join(Tables.documents(spark, sf), "doc_id")
      .select(col("n_bytes"), octet_length(encode(col("text"), "UTF-8")).as("ob"))
      .collect()
    joined.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("decodeBatch runs per-partition (batch shape, not per-row driver calls)") {
    import spark.implicits._
    val df = Seq((1L, "aa".getBytes), (2L, "bb".getBytes)).toDF("doc_id", "media")
    val out = Multimodal.decode(spark, df).collect()
    assert(out.length == 2)
  }
}
