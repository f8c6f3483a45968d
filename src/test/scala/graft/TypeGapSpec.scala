package graft

import graft.types.TypeBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the SURVEY §1.2 type-gap decisions — the mappings
  * ExtensionTypes.scala documents must be enforced, not just described. */
class TypeGapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decimal256 precisions (p > 38) are rejected, not truncated") {
    intercept[IllegalArgumentException](TypeBridge.decimalType(39, 2))
    intercept[IllegalArgumentException](TypeBridge.decimalType(76, 10))
    assert(TypeBridge.decimalType(38, 10).precision == 38)
    // Spark itself refuses to build the type too — the guard is not the
    // only line of defense
    intercept[Throwable](org.apache.spark.sql.types.DecimalType(45, 2))
  }

  test("time64/time32 map to range-checked µs-since-midnight longs") {
    assert(TypeBridge.time64ToMicros(86399999999L, "us") == 86399999999L)
    assert(TypeBridge.time64ToMicros(1500L, "ns") == 1L) // ns truncates like Spark
    assert(TypeBridge.time32ToMicros(86399, "s") == 86399000000L)
    assert(TypeBridge.time32ToMicros(1500, "ms") == 1500000L)
    intercept[IllegalArgumentException](TypeBridge.time64ToMicros(-1L, "us"))
    intercept[IllegalArgumentException](TypeBridge.time64ToMicros(TypeBridge.MicrosPerDay, "us"))
    intercept[IllegalArgumentException](TypeBridge.time32ToMicros(86400, "s"))
    // the long model composes with Spark's timestamp functions
    import spark.implicits._
    val row = Seq(TypeBridge.time32ToMicros(3661, "s")).toDF("us")
      .select(date_format(timestamp_micros(col("us")), "HH:mm:ss").as("t"))
      .collect().head
    assert(row.getString(0) == "01:01:01")
  }

  test("half-float widening is bit-exact across all value classes") {
    assert(TypeBridge.halfToFloat(0x3C00.toShort) == 1.0f)
    assert(TypeBridge.halfToFloat(0xC000.toShort) == -2.0f)
    assert(TypeBridge.halfToFloat(0x3555.toShort) == 0.33325195f) // ~1/3
    assert(TypeBridge.halfToFloat(0x7BFF.toShort) == 65504.0f) // max half
    assert(TypeBridge.halfToFloat(0x0400.toShort) == 6.103515625e-5f) // min normal
    assert(TypeBridge.halfToFloat(0x0001.toShort) == 5.9604645e-8f) // min subnormal
    assert(TypeBridge.halfToFloat(0x7C00.toShort) == Float.PositiveInfinity)
    assert(TypeBridge.halfToFloat(0xFC00.toShort) == Float.NegativeInfinity)
    assert(TypeBridge.halfToFloat(0x7E00.toShort).isNaN)
    // signed zero keeps its sign bit
    assert(java.lang.Float.floatToRawIntBits(TypeBridge.halfToFloat(0x8000.toShort)) == 0x80000000)
    assert(java.lang.Float.floatToRawIntBits(TypeBridge.halfToFloat(0x0000.toShort)) == 0)
    // exhaustive: widening then narrowing back is the identity on every
    // finite half bit pattern (binary16 ⊂ binary32 exactly)
    for (b <- 0 until 0x10000; if ((b >> 10) & 0x1F) != 0x1F) {
      val f = TypeBridge.halfToFloat(b.toShort)
      val mant = b & 0x3FF; val exp = (b >> 10) & 0x1F
      val expected = math.abs(
        (if (exp == 0) mant / 16777216.0 else (1024 + mant) * math.pow(2.0, exp - 25)))
      assert(math.abs(f) == expected.toFloat, s"bits=0x${b.toHexString}")
    }
  }
}
