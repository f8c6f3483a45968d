package graft

import graft.functions.expr.Md5Prefix
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity pin for the native md5-prefix lottery primitive: it must
  * equal the portable spelling `conv(substring(md5(s), 1, n), 16, 10)`
  * on every input, or every md5-lottery selection (bootstrap weights,
  * winnow fingerprints, mix draws, feature hashes) silently diverges
  * from its DuckDB oracle. */
class Md5PrefixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("equals the conv(substring(md5)) spelling for every nHex tier") {
    import spark.implicits._
    val ids = (0 until 2000).map(i => s"doc_${i * 37}_x") ++
      Seq("", "0", "zsink", "p123_s45", "é中文 unicode",
        "a" * 300)
    val df = ids.toDF("s")
    for (n <- Seq(1, 4, 8, 12, 15)) {
      val bad = df.select(
          Md5Prefix(col("s"), n).as("fast"),
          conv(substring(md5(col("s")), 1, n), 16, 10).cast("long").as("ref"))
        .filter(col("fast") =!= col("ref"))
        .count()
      assert(bad == 0L, s"nHex=$n diverged on $bad rows")
    }
  }

  test("null propagates and values stay in [0, 2^(4n))") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("s")
      .select(Md5Prefix(col("s"), 12).as("v"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    val v = rows.find(!_.isNullAt(0)).get.getLong(0)
    assert(v >= 0L && v < (1L << 48))
  }
}
