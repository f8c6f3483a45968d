package graft.types

import org.apache.spark.sql.types.DecimalType

/** Ingest-boundary conversions for the reference types Spark cannot carry
  * natively (SURVEY.md §1.2 gap rows; reference type ids in
  * cpp/src/arrow/type_fwd.h):
  *
  *  - DECIMAL256 (id 24, precision ≤ 76): Spark's decimal ceiling is 38
  *    digits (decimal128) → precisions above 38 are REJECTED loudly at
  *    schema-mapping time, never silently truncated.
  *  - TIME32/TIME64 (ids 19/20): no Spark time-of-day type → modeled as
  *    µs-since-midnight longs, range-checked on ingest.
  *  - HALF_FLOAT (id 10): no fp16 in Spark → widened bit-exactly to
  *    float (every binary16 value is exactly representable in binary32).
  *
  * TypeGapSpec enforces each contract.
  */
object TypeBridge {

  val MicrosPerDay: Long = 86400000000L

  /** Map a reference decimal(p, s) to Spark, rejecting decimal256-only
    * precisions (p > 38) instead of truncating. */
  def decimalType(precision: Int, scale: Int): DecimalType = {
    require(precision >= 1 && precision <= DecimalType.MAX_PRECISION,
      s"decimal precision $precision exceeds Spark's maximum " +
        s"${DecimalType.MAX_PRECISION} (decimal256 is unsupported — rescale or reject)")
    DecimalType(precision, scale)
  }

  /** TIME64 value (µs or ns since midnight) → µs-since-midnight long. */
  def time64ToMicros(value: Long, unit: String): Long = {
    val us = unit match {
      case "us" => value
      case "ns" => value / 1000L // same truncation Spark applies to ns timestamps
      case other => throw new IllegalArgumentException(s"TIME64 unit must be us|ns, got $other")
    }
    require(us >= 0L && us < MicrosPerDay, s"time-of-day out of range: $us µs")
    us
  }

  /** TIME32 value (s or ms since midnight) → µs-since-midnight long. */
  def time32ToMicros(value: Int, unit: String): Long = {
    val us = unit match {
      case "s"  => value * 1000000L
      case "ms" => value * 1000L
      case other => throw new IllegalArgumentException(s"TIME32 unit must be s|ms, got $other")
    }
    require(us >= 0L && us < MicrosPerDay, s"time-of-day out of range: $us µs")
    us
  }

  /** Widen an IEEE 754 binary16 bit pattern to binary32. Exact for every
    * half value: normals re-bias (exp+112), subnormals are mant·2⁻²⁴,
    * inf/NaN map to their binary32 counterparts with the payload
    * preserved in the top mantissa bits. */
  def halfToFloat(bits: Short): Float = {
    val b = bits & 0xFFFF
    val sign = (b & 0x8000) << 16
    val exp = (b >> 10) & 0x1F
    val mant = b & 0x3FF
    if (exp == 0x1F) // inf / nan
      java.lang.Float.intBitsToFloat(sign | 0x7F800000 | (mant << 13))
    else if (exp != 0) // normal
      java.lang.Float.intBitsToFloat(sign | ((exp + 112) << 23) | (mant << 13))
    else if (mant == 0) // signed zero
      java.lang.Float.intBitsToFloat(sign)
    else { // subnormal: mant * 2^-24, exact in binary32
      val f = mant / 16777216.0f
      if (sign != 0) -f else f
    }
  }
}
