package graft.types

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Extension types (reference: cpp/src/arrow/extension_type.h:39 and the
  * canonical instances in cpp/src/arrow/extension/ — uuid, json,
  * fixed_shape_tensor). Arrow models these as a storage type plus
  * name/metadata; Spark's analogue is the UserDefinedType: a catalyst
  * storage type (here binary / struct) plus a class-level tag that
  * survives parquet round-trips in column metadata.
  *
  * Mapping decisions (SURVEY.md §1.2):
  *  - uuid            → [[UuidType]] over 16-byte binary
  *  - fixed_shape_tensor → [[TensorType]] over struct<shape, values>
  *  - variable_shape_tensor → [[VarTensorType]]: same storage, per-ROW
  *    shape contract (ragged rank/extents within one column)
  *  - json            → [[JsonType]] over utf8 storage (the tagged
  *    arrow.json instance, extension/json_extension_type.h); PLAIN
  *    string + get_json_object/from_json (q36) or VariantType (q36b)
  *    remain the native query paths
  *  - bool8           → [[Bool8Type]] over int8 storage (extension/bool8.h:
  *    0 = false, nonzero = true — the zero-copy boolean layout)
  *  - opaque          → [[OpaqueType]]: payload bytes + the producing
  *    system's type/vendor tags (extension/opaque.h — a passthrough for
  *    data Spark cannot interpret, preserved losslessly)
  *  - decimal256, time32/64, half-float → documented gaps: p>38 rejected,
  *    time modeled as µs-since-midnight long, fp16 widened to float
  */
@SQLUserDefinedType(udt = classOf[UuidType])
final case class Uuid(msb: Long, lsb: Long) {
  override def toString: String = new java.util.UUID(msb, lsb).toString
}

class UuidType extends UserDefinedType[Uuid] {
  override def sqlType: DataType = BinaryType
  override def userClass: Class[Uuid] = classOf[Uuid]

  override def serialize(u: Uuid): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(u.msb); bb.putLong(u.lsb)
    bb.array()
  }

  override def deserialize(datum: Any): Uuid = datum match {
    case bytes: Array[Byte] =>
      require(bytes.length == 16, s"uuid storage must be 16 bytes, got ${bytes.length}")
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Uuid(bb.getLong, bb.getLong)
  }

  override def typeName: String = "graft_uuid"
}

case object UuidType extends UuidType

/** Dense fixed-shape tensor: row-major values + shape, the storage layout
  * of arrow's fixed_shape_tensor (shape in metadata, values as
  * FixedSizeList). Spark has no fixed-size list, so the shape rides in
  * each value's struct — constant-folded by parquet's RLE/dictionary
  * encoding in practice. */
@SQLUserDefinedType(udt = classOf[TensorType])
final case class Tensor(shape: Seq[Int], values: Array[Double]) {
  require(shape.product == values.length,
    s"shape ${shape.mkString("x")} needs ${shape.product} values, got ${values.length}")
  def apply(idx: Int*): Double = {
    require(idx.length == shape.length)
    var flat = 0
    var i = 0
    while (i < idx.length) {
      require(idx(i) >= 0 && idx(i) < shape(i),
        s"index ${idx(i)} out of bounds for dimension $i of extent ${shape(i)}")
      flat = flat * shape(i) + idx(i); i += 1
    }
    values(flat)
  }
}

class TensorType extends UserDefinedType[Tensor] {
  override def sqlType: DataType = StructType(Seq(
    StructField("shape", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def userClass: Class[Tensor] = classOf[Tensor]

  override def serialize(t: Tensor): InternalRow =
    InternalRow(
      new GenericArrayData(t.shape.toArray),
      new GenericArrayData(t.values))

  override def deserialize(datum: Any): Tensor = datum match {
    case row: InternalRow =>
      Tensor(
        row.getArray(0).toIntArray().toSeq,
        row.getArray(1).toDoubleArray())
  }

  override def typeName: String = "graft_tensor"
}

case object TensorType extends TensorType

/** Variable-shape tensor: every ROW carries its own shape (reference
  * cpp/src/arrow/extension/variable_shape_tensor.h — storage
  * struct<shape: list<int32>, data: list<T>> per value, unlike
  * fixed_shape_tensor whose single shape lives in column metadata).
  * [[Tensor]] models the fixed-shape contract (uniform shape per column,
  * by caller convention); VarTensor is the ragged column — images of
  * different sizes, variable-length patch grids — where per-row ndim and
  * extent may all differ. */
@SQLUserDefinedType(udt = classOf[VarTensorType])
final case class VarTensor(shape: Seq[Int], values: Array[Double]) {
  require(shape.forall(_ >= 0),
    s"negative extent in shape ${shape.mkString("x")}")
  require(shape.product == values.length,
    s"shape ${shape.mkString("x")} needs ${shape.product} values, got ${values.length}")
  def ndim: Int = shape.length
  def numElements: Int = values.length
  def apply(idx: Int*): Double = {
    require(idx.length == shape.length,
      s"rank-${shape.length} tensor indexed with ${idx.length} coordinates")
    var flat = 0
    var i = 0
    while (i < idx.length) {
      require(idx(i) >= 0 && idx(i) < shape(i),
        s"index ${idx(i)} out of bounds for dimension $i of extent ${shape(i)}")
      flat = flat * shape(i) + idx(i); i += 1
    }
    values(flat)
  }
}

class VarTensorType extends UserDefinedType[VarTensor] {
  override def sqlType: DataType = StructType(Seq(
    StructField("shape", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def userClass: Class[VarTensor] = classOf[VarTensor]

  override def serialize(t: VarTensor): InternalRow =
    InternalRow(
      new GenericArrayData(t.shape.toArray),
      new GenericArrayData(t.values))

  override def deserialize(datum: Any): VarTensor = datum match {
    case row: InternalRow =>
      VarTensor(
        row.getArray(0).toIntArray().toSeq,
        row.getArray(1).toDoubleArray())
  }

  override def typeName: String = "graft_vtensor"
}

case object VarTensorType extends VarTensorType

/** arrow.json: a string tagged as JSON (reference
  * cpp/src/arrow/extension/json_extension_type.h — utf8 storage, no
  * per-element validation; the tag is the contract). */
@SQLUserDefinedType(udt = classOf[JsonType])
final case class Json(value: String) {
  override def toString: String = value
}

class JsonType extends UserDefinedType[Json] {
  override def sqlType: DataType = StringType
  override def userClass: Class[Json] = classOf[Json]

  override def serialize(j: Json): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(j.value)

  override def deserialize(datum: Any): Json = datum match {
    case s: org.apache.spark.unsafe.types.UTF8String => Json(s.toString)
    case s: String => Json(s)
  }

  override def typeName: String = "graft_json"
}

case object JsonType extends JsonType

/** arrow.bool8: one boolean per BYTE (reference
  * cpp/src/arrow/extension/bool8.h — int8 storage, 0 = false, anything
  * else = true; the zero-copy alternative to Arrow's bit-packed
  * booleans). The byte value is preserved, not canonicalized, matching
  * the reference's storage semantics. */
@SQLUserDefinedType(udt = classOf[Bool8Type])
final case class Bool8(raw: Byte) {
  def toBoolean: Boolean = raw != 0
}

class Bool8Type extends UserDefinedType[Bool8] {
  override def sqlType: DataType = ByteType
  override def userClass: Class[Bool8] = classOf[Bool8]

  override def serialize(b: Bool8): Byte = b.raw

  override def deserialize(datum: Any): Bool8 = datum match {
    case b: Byte => Bool8(b)
    case i: Int => Bool8(i.toByte)
  }

  override def typeName: String = "graft_bool8"
}

case object Bool8Type extends Bool8Type

/** arrow.opaque: bytes from a system whose type Spark cannot represent,
  * carried losslessly with the producer's type/vendor names (reference
  * cpp/src/arrow/extension/opaque.h — metadata `type_name`,
  * `vendor_name`). Round-trips through parquet untouched; never
  * interpreted. */
@SQLUserDefinedType(udt = classOf[OpaqueType])
final case class Opaque(typeName: String, vendorName: String, payload: Array[Byte]) {
  override def equals(o: Any): Boolean = o match {
    case Opaque(t, v, p) =>
      t == typeName && v == vendorName && java.util.Arrays.equals(p, payload)
    case _ => false
  }
  override def hashCode: Int =
    (typeName, vendorName, java.util.Arrays.hashCode(payload)).hashCode
}

class OpaqueType extends UserDefinedType[Opaque] {
  override def sqlType: DataType = StructType(Seq(
    StructField("type_name", StringType, nullable = false),
    StructField("vendor_name", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))
  override def userClass: Class[Opaque] = classOf[Opaque]

  override def serialize(o: Opaque): InternalRow =
    InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(o.typeName),
      org.apache.spark.unsafe.types.UTF8String.fromString(o.vendorName),
      o.payload)

  override def deserialize(datum: Any): Opaque = datum match {
    case row: InternalRow =>
      Opaque(row.getString(0), row.getString(1), row.getBinary(2))
  }

  override def typeName: String = "graft_opaque"
}

case object OpaqueType extends OpaqueType

/** COO sparse tensor (reference: cpp/src/arrow/sparse_tensor.h —
  * SparseCOOIndex + value buffer + shape; the canonical interchange
  * format, and the one COO/CSR/CSC all convert through). Coordinates are
  * stored ROW-MAJOR FLATTENED (`indices.length == nnz * ndim`, entry
  * `i` of nonzero `k` at `indices(k*ndim + i)`) and must be sorted in
  * row-major coordinate order with no duplicates — the reference's
  * canonical COO contract, which makes equality and conversion
  * deterministic. CSR/CSC are row/column-compressed encodings of the
  * same data; at the column level COO subsumes them (SURVEY §1.1 scopes
  * tensors as array-column modeling, not kernel storage).
  *
  * The embedding-workload fit: a row of sparse features becomes one
  * value; density below ~1/3 makes COO strictly smaller than the dense
  * [[Tensor]] twin (3 numbers per nonzero at rank 2). */
@SQLUserDefinedType(udt = classOf[SparseTensorType])
final case class SparseTensor(
    shape: Seq[Int], indices: Array[Long], values: Array[Double]) {
  require(shape.forall(_ >= 0),
    s"negative extent in shape ${shape.mkString("x")}")
  require(shape.nonEmpty, "sparse tensor needs at least one dimension")
  require(indices.length == values.length * shape.length,
    s"rank-${shape.length} COO with ${values.length} nonzeros needs " +
      s"${values.length * shape.length} coordinates, got ${indices.length}")
  locally {
    val nd = shape.length
    var k = 0
    while (k < values.length) {
      var i = 0
      while (i < nd) {
        val c = indices(k * nd + i)
        require(c >= 0 && c < shape(i),
          s"coordinate $c out of bounds for dimension $i of extent ${shape(i)}")
        i += 1
      }
      if (k > 0) {
        // canonical order: strictly increasing row-major coordinates
        var cmp = 0
        var j = 0
        while (cmp == 0 && j < nd) {
          cmp = java.lang.Long.compare(
            indices((k - 1) * nd + j), indices(k * nd + j))
          j += 1
        }
        require(cmp < 0,
          s"COO indices must be sorted row-major with no duplicates " +
            s"(violated at nonzero $k)")
      }
      k += 1
    }
  }

  def ndim: Int = shape.length
  def nnz: Int = values.length

  /** Value at a coordinate: binary search over the canonical order. */
  def apply(idx: Int*): Double = {
    require(idx.length == shape.length,
      s"rank-${shape.length} tensor indexed with ${idx.length} coordinates")
    idx.indices.foreach { i =>
      require(idx(i) >= 0 && idx(i) < shape(i),
        s"index ${idx(i)} out of bounds for dimension $i of extent ${shape(i)}")
    }
    val nd = ndim
    var lo = 0
    var hi = nnz - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      var cmp = 0
      var i = 0
      while (cmp == 0 && i < nd) {
        cmp = java.lang.Long.compare(indices(mid * nd + i), idx(i).toLong)
        i += 1
      }
      if (cmp == 0) return values(mid)
      else if (cmp < 0) lo = mid + 1
      else hi = mid - 1
    }
    0.0
  }

  /** Densify into the row-major [[Tensor]] twin. */
  def toDense: Tensor = {
    val out = new Array[Double](shape.product)
    val nd = ndim
    var k = 0
    while (k < nnz) {
      var flat = 0L
      var i = 0
      while (i < nd) { flat = flat * shape(i) + indices(k * nd + i); i += 1 }
      out(flat.toInt) = values(k)
      k += 1
    }
    Tensor(shape, out)
  }

  override def equals(o: Any): Boolean = o match {
    case SparseTensor(s, i, v) =>
      s == shape && java.util.Arrays.equals(i, indices) &&
        java.util.Arrays.equals(v, values)
    case _ => false
  }
  override def hashCode: Int =
    (shape, java.util.Arrays.hashCode(indices),
      java.util.Arrays.hashCode(values)).hashCode
}

object SparseTensor {
  /** Sparsify a dense row-major [[Tensor]]: exact zeros are dropped, the
    * canonical row-major coordinate order falls out of the scan order. */
  def fromDense(t: Tensor): SparseTensor = {
    val nd = t.shape.length
    val idx = Array.newBuilder[Long]
    val vals = Array.newBuilder[Double]
    var flat = 0
    while (flat < t.values.length) {
      if (t.values(flat) != 0.0) {
        var rem = flat.toLong
        val coord = new Array[Long](nd)
        var i = nd - 1
        while (i >= 0) { coord(i) = rem % t.shape(i); rem /= t.shape(i); i -= 1 }
        idx ++= coord
        vals += t.values(flat)
      }
      flat += 1
    }
    SparseTensor(t.shape, idx.result(), vals.result())
  }
}

class SparseTensorType extends UserDefinedType[SparseTensor] {
  override def sqlType: DataType = StructType(Seq(
    StructField("shape", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("indices", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def userClass: Class[SparseTensor] = classOf[SparseTensor]

  override def serialize(t: SparseTensor): InternalRow =
    InternalRow(
      new GenericArrayData(t.shape.toArray),
      new GenericArrayData(t.indices),
      new GenericArrayData(t.values))

  override def deserialize(datum: Any): SparseTensor = datum match {
    case row: InternalRow =>
      SparseTensor(
        row.getArray(0).toIntArray().toSeq,
        row.getArray(1).toLongArray(),
        row.getArray(2).toDoubleArray())
  }

  override def typeName: String = "graft_sparse_tensor"
}

case object SparseTensorType extends SparseTensorType

/** Compressed sparse matrix, CSR or CSC (reference:
  * cpp/src/arrow/sparse_tensor.h:199-216 SparseCSXIndex — indptr +
  * indices tensors over a shared value buffer, with
  * SparseMatrixCompressedAxis ROW|COLUMN selecting which axis is
  * compressed). 2-D only, like the reference (CSR/CSC are matrix
  * formats; rank-N stays in [[SparseTensor]] COO).
  *
  * Layout: `indptr` has `major + 1` entries (major = nRows for CSR,
  * nCols for CSC), nondecreasing, `indptr(0) == 0`,
  * `indptr(major) == nnz`; nonzeros of major-slice `i` live at
  * positions `indptr(i) until indptr(i+1)` with their minor-axis
  * coordinate in `indices` (strictly increasing within a slice — the
  * reference's canonical contract) and their value in `values`.
  *
  * COO is the interchange hub exactly as in the reference
  * (`SparseTensor::ToTensor` converts through coordinates): CSR↔COO is
  * O(nnz) both ways because canonical COO is already row-major;
  * CSC↔COO re-sorts to column-major once.
  */
@SQLUserDefinedType(udt = classOf[SparseMatrixType])
final case class SparseMatrix(
    byRow: Boolean, nRows: Int, nCols: Int,
    indptr: Array[Long], indices: Array[Long], values: Array[Double]) {
  require(nRows >= 0 && nCols >= 0, s"negative extent ${nRows}x$nCols")
  locally {
    val major = if (byRow) nRows else nCols
    val minor = if (byRow) nCols else nRows
    require(indptr.length == major + 1,
      s"indptr needs ${major + 1} entries for $major major slices, " +
        s"got ${indptr.length}")
    require(indices.length == values.length,
      s"${indices.length} minor coordinates for ${values.length} values")
    require(indptr(0) == 0L, s"indptr must start at 0, got ${indptr(0)}")
    require(indptr(major) == values.length.toLong,
      s"indptr must end at nnz=${values.length}, got ${indptr(major)}")
    var i = 0
    while (i < major) {
      require(indptr(i) <= indptr(i + 1),
        s"indptr decreases at slice $i: ${indptr(i)} > ${indptr(i + 1)}")
      var p = indptr(i)
      while (p < indptr(i + 1)) {
        val c = indices(p.toInt)
        require(c >= 0 && c < minor,
          s"minor coordinate $c out of bounds (extent $minor) in slice $i")
        require(p == indptr(i) || indices(p.toInt - 1) < c,
          s"minor coordinates must be strictly increasing within slice $i")
        p += 1
      }
      i += 1
    }
  }

  def nnz: Int = values.length

  /** Value at (row, col): binary search the minor coordinates of the
    * containing major slice. Implicit zeros return 0.0. */
  def apply(row: Int, col: Int): Double = {
    require(row >= 0 && row < nRows && col >= 0 && col < nCols,
      s"($row,$col) out of bounds for ${nRows}x$nCols")
    val (maj, min) = if (byRow) (row, col) else (col, row)
    var lo = indptr(maj).toInt
    var hi = indptr(maj + 1).toInt - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = indices(mid)
      if (c == min) return values(mid)
      else if (c < min) lo = mid + 1
      else hi = mid - 1
    }
    0.0
  }

  /** Decompress to canonical (row-major sorted) COO. */
  def toCOO: SparseTensor = {
    val n = nnz
    if (byRow) {
      // CSR slice order IS row-major coordinate order
      val coords = new Array[Long](n * 2)
      var r = 0
      while (r < nRows) {
        var p = indptr(r).toInt
        while (p < indptr(r + 1)) {
          coords(p * 2) = r.toLong
          coords(p * 2 + 1) = indices(p)
          p += 1
        }
        r += 1
      }
      SparseTensor(Seq(nRows, nCols), coords, values)
    } else {
      // CSC order is column-major: materialize triples, re-sort row-major
      val ks = Array.range(0, n)
      val rowOf = new Array[Long](n)
      val colOf = new Array[Long](n)
      var c = 0
      while (c < nCols) {
        var p = indptr(c).toInt
        while (p < indptr(c + 1)) {
          rowOf(p) = indices(p); colOf(p) = c.toLong
          p += 1
        }
        c += 1
      }
      val sorted = ks.sortBy(k => (rowOf(k), colOf(k)))
      val coords = new Array[Long](n * 2)
      val vals = new Array[Double](n)
      var i = 0
      while (i < n) {
        val k = sorted(i)
        coords(i * 2) = rowOf(k); coords(i * 2 + 1) = colOf(k)
        vals(i) = values(k)
        i += 1
      }
      SparseTensor(Seq(nRows, nCols), coords, vals)
    }
  }

  override def equals(o: Any): Boolean = o match {
    case SparseMatrix(b, r, c, ip, ix, v) =>
      b == byRow && r == nRows && c == nCols &&
        java.util.Arrays.equals(ip, indptr) &&
        java.util.Arrays.equals(ix, indices) &&
        java.util.Arrays.equals(v, values)
    case _ => false
  }
  override def hashCode: Int =
    (byRow, nRows, nCols, java.util.Arrays.hashCode(indptr),
      java.util.Arrays.hashCode(indices),
      java.util.Arrays.hashCode(values)).hashCode
}

object SparseMatrix {
  /** Compress canonical COO (rank 2) along the row axis — O(nnz),
    * no sort: canonical COO is already row-major. */
  def csrFromCOO(t: SparseTensor): SparseMatrix = {
    require(t.ndim == 2, s"CSR needs a rank-2 tensor, got rank ${t.ndim}")
    val nr = t.shape(0); val nc = t.shape(1)
    val n = t.nnz
    val indptr = new Array[Long](nr + 1)
    val minor = new Array[Long](n)
    var k = 0
    while (k < n) {
      indptr(t.indices(k * 2).toInt + 1) += 1
      minor(k) = t.indices(k * 2 + 1)
      k += 1
    }
    var r = 0
    while (r < nr) { indptr(r + 1) += indptr(r); r += 1 }
    SparseMatrix(byRow = true, nr, nc, indptr, minor, t.values.clone())
  }

  /** Compress canonical COO (rank 2) along the column axis — one
    * column-major re-sort. */
  def cscFromCOO(t: SparseTensor): SparseMatrix = {
    require(t.ndim == 2, s"CSC needs a rank-2 tensor, got rank ${t.ndim}")
    val nr = t.shape(0); val nc = t.shape(1)
    val n = t.nnz
    val sorted = Array.range(0, n)
      .sortBy(k => (t.indices(k * 2 + 1), t.indices(k * 2)))
    val indptr = new Array[Long](nc + 1)
    val minor = new Array[Long](n)
    val vals = new Array[Double](n)
    var i = 0
    while (i < n) {
      val k = sorted(i)
      indptr(t.indices(k * 2 + 1).toInt + 1) += 1
      minor(i) = t.indices(k * 2)
      vals(i) = t.values(k)
      i += 1
    }
    var c = 0
    while (c < nc) { indptr(c + 1) += indptr(c); c += 1 }
    SparseMatrix(byRow = false, nr, nc, indptr, minor, vals)
  }
}

class SparseMatrixType extends UserDefinedType[SparseMatrix] {
  override def sqlType: DataType = StructType(Seq(
    StructField("by_row", BooleanType, nullable = false),
    StructField("n_rows", IntegerType, nullable = false),
    StructField("n_cols", IntegerType, nullable = false),
    StructField("indptr", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("indices", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def userClass: Class[SparseMatrix] = classOf[SparseMatrix]

  override def serialize(m: SparseMatrix): InternalRow =
    InternalRow(m.byRow, m.nRows, m.nCols,
      new GenericArrayData(m.indptr),
      new GenericArrayData(m.indices),
      new GenericArrayData(m.values))

  override def deserialize(datum: Any): SparseMatrix = datum match {
    case row: InternalRow =>
      SparseMatrix(
        row.getBoolean(0), row.getInt(1), row.getInt(2),
        row.getArray(3).toLongArray(),
        row.getArray(4).toLongArray(),
        row.getArray(5).toDoubleArray())
  }

  override def typeName: String = "graft_sparse_matrix"
}

case object SparseMatrixType extends SparseMatrixType

/** Time-of-day — closes the §1.2 time32/time64 contract's logical-type
  * loss: the VALUES were always preserved as µs-since-midnight longs
  * ([[TypeBridge.time32ToMicros]]/[[TypeBridge.time64ToMicros]]), but a
  * plain long column forgets it ever was a time. This UDT tags the
  * column so the logical type survives parquet round-trips (Spark
  * stores the UDT class in column metadata), exactly like the other
  * extension types. Unit is normalized to µs at the boundary — the
  * reference's four units (s/ms/µs/ns, type.h TIME32/TIME64) all
  * convert in, ns by the same truncation Spark applies to timestamps. */
@SQLUserDefinedType(udt = classOf[TimeOfDayType])
final case class TimeOfDay(micros: Long) {
  require(micros >= 0L && micros < TypeBridge.MicrosPerDay,
    s"time-of-day out of range: $micros µs")
  override def toString: String = {
    val s = micros / 1000000L
    f"${s / 3600}%02d:${s / 60 % 60}%02d:${s % 60}%02d.${micros % 1000000L}%06d"
  }
}

object TimeOfDay {
  /** From an Arrow time32 value (unit "s" or "ms"). */
  def fromTime32(value: Int, unit: String): TimeOfDay =
    TimeOfDay(TypeBridge.time32ToMicros(value, unit))
  /** From an Arrow time64 value (unit "us" or "ns"). */
  def fromTime64(value: Long, unit: String): TimeOfDay =
    TimeOfDay(TypeBridge.time64ToMicros(value, unit))
}

class TimeOfDayType extends UserDefinedType[TimeOfDay] {
  override def sqlType: DataType = LongType
  override def userClass: Class[TimeOfDay] = classOf[TimeOfDay]
  override def serialize(t: TimeOfDay): Long = t.micros
  override def deserialize(datum: Any): TimeOfDay = datum match {
    case l: Long => TimeOfDay(l)
  }
  override def typeName: String = "graft_time"
}

case object TimeOfDayType extends TimeOfDayType
