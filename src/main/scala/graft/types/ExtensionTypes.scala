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

/** Compressed sparse fiber (CSF) tensor (reference:
  * cpp/src/arrow/sparse_tensor.h:621 SparseCSFTensor / SparseCSFIndex —
  * the N-dimensional generalization of CSR: a prefix TREE over
  * coordinates). The last member of the declared sparse family next to
  * COO ([[SparseTensor]]) and CSR/CSC ([[SparseMatrix]]).
  *
  * Layout, exactly the reference's: `axisOrder` permutes the dimensions
  * (axisOrder(0) is the outermost tree level); `indices` has one array
  * per LEVEL — `indices(l)` holds the axisOrder(l)-coordinate of every
  * tree node at depth l, in tree order; `indptr` has one array per
  * NON-LEAF level — node j at level l has children
  * `indptr(l)(j) until indptr(l)(j+1)` in level l+1. Leaf nodes align
  * 1:1 with `values` (full-length coordinate prefixes are unique in
  * canonical data), so `indices(ndim-1).length == nnz`. Shared
  * coordinate prefixes are stored ONCE — that is the compression: a
  * (1000×1000×1000) tensor whose nonzeros cluster in a few fibers
  * stores each outer coordinate once instead of nnz times.
  *
  * COO is the interchange hub exactly as for CSR/CSC: CSF↔COO is
  * O(nnz) both ways for the identity axis order (canonical COO is
  * already sorted in tree order); any other `axisOrder` pays one
  * re-sort each way, the CSC precedent. Within-level sibling
  * coordinates are strictly increasing — the reference's canonical
  * contract, validated on construction. */
@SQLUserDefinedType(udt = classOf[SparseCSFTensorType])
final case class SparseCSFTensor(
    shape: Seq[Int], axisOrder: Seq[Int],
    indptr: Seq[Array[Long]], indices: Seq[Array[Long]],
    values: Array[Double]) {
  require(shape.nonEmpty, "CSF tensor needs at least one dimension")
  require(shape.forall(_ >= 0),
    s"negative extent in shape ${shape.mkString("x")}")
  require(axisOrder.sorted == shape.indices.toSeq,
    s"axisOrder ${axisOrder.mkString(",")} is not a permutation of " +
      s"0..${shape.length - 1}")
  require(indices.length == shape.length,
    s"rank-${shape.length} CSF needs ${shape.length} index levels, " +
      s"got ${indices.length}")
  require(indptr.length == shape.length - 1,
    s"rank-${shape.length} CSF needs ${shape.length - 1} indptr levels, " +
      s"got ${indptr.length}")
  require(indices.last.length == values.length,
    s"leaf level has ${indices.last.length} nodes for ${values.length} values")
  locally {
    var l = 0
    while (l < shape.length) {
      val extent = shape(axisOrder(l))
      val level = indices(l)
      // per-level bounds
      var i = 0
      while (i < level.length) {
        require(level(i) >= 0 && level(i) < extent,
          s"coordinate ${level(i)} out of bounds for axis ${axisOrder(l)} " +
            s"(extent $extent) at level $l")
        i += 1
      }
      if (l < shape.length - 1) {
        val ip = indptr(l)
        require(ip.length == level.length + 1,
          s"indptr level $l needs ${level.length + 1} entries, got ${ip.length}")
        require(ip(0) == 0L, s"indptr level $l must start at 0, got ${ip(0)}")
        require(ip(level.length) == indices(l + 1).length.toLong,
          s"indptr level $l must end at ${indices(l + 1).length}, " +
            s"got ${ip(level.length)}")
        var j = 0
        while (j < level.length) {
          require(ip(j) < ip(j + 1),
            s"CSF node $j at level $l has no children " +
              "(every non-leaf node must own at least one nonzero)")
          j += 1
        }
      }
      l += 1
    }
    // sibling coordinates strictly increase within each parent range
    var lvl = 0
    while (lvl < shape.length) {
      val level = indices(lvl)
      val starts: Array[Long] =
        if (lvl == 0) Array(0L, level.length.toLong) else indptr(lvl - 1)
      var j = 0
      while (j < starts.length - 1) {
        var p = starts(j) + 1
        while (p < starts(j + 1)) {
          require(level(p.toInt - 1) < level(p.toInt),
            s"sibling coordinates must be strictly increasing " +
              s"(violated at level $lvl position $p)")
          p += 1
        }
        j += 1
      }
      lvl += 1
    }
  }

  def ndim: Int = shape.length
  def nnz: Int = values.length

  /** Value at a coordinate: one binary search per level within the
    * parent's child range — O(ndim · log fanout). Implicit zeros
    * return 0.0. */
  def apply(idx: Int*): Double = {
    require(idx.length == shape.length,
      s"rank-${shape.length} tensor indexed with ${idx.length} coordinates")
    idx.indices.foreach { i =>
      require(idx(i) >= 0 && idx(i) < shape(i),
        s"index ${idx(i)} out of bounds for dimension $i of extent ${shape(i)}")
    }
    var lo = 0
    var hi = indices(0).length
    var l = 0
    while (l < ndim) {
      val want = idx(axisOrder(l)).toLong
      val level = indices(l)
      var a = lo
      var b = hi - 1
      var found = -1
      while (a <= b) {
        val mid = (a + b) >>> 1
        val c = level(mid)
        if (c == want) { found = mid; a = b + 1 }
        else if (c < want) a = mid + 1
        else b = mid - 1
      }
      if (found < 0) return 0.0
      if (l == ndim - 1) return values(found)
      lo = indptr(l)(found).toInt
      hi = indptr(l)(found + 1).toInt
      l += 1
    }
    0.0 // unreachable
  }

  /** Expand to canonical (row-major sorted) COO — walk the tree once
    * (O(nnz · ndim)), then re-sort unless `axisOrder` is the identity
    * (in which case tree order IS row-major order). */
  def toCOO: SparseTensor = {
    val nd = ndim
    val n = nnz
    // leaf-order coordinates in AXIS-ORDER space, prefix carried down
    val coords = Array.ofDim[Long](n, nd)
    // walk levels iteratively: expand each level's nodes to leaf spans
    def leafSpan(l: Int, node: Int): (Int, Int) = {
      var lo = node; var hi = node + 1
      var lev = l
      while (lev < nd - 1) {
        val ip = indptr(lev)
        lo = ip(lo).toInt; hi = ip(hi).toInt
        lev += 1
      }
      (lo, hi)
    }
    var l = 0
    while (l < nd) {
      val level = indices(l)
      var j = 0
      while (j < level.length) {
        val (lo, hi) = leafSpan(l, j)
        var p = lo
        while (p < hi) { coords(p)(axisOrder(l)) = level(j); p += 1 }
        j += 1
      }
      l += 1
    }
    val identity = axisOrder == shape.indices.toSeq
    val order: Array[Int] =
      if (identity) Array.range(0, n)
      else Array.range(0, n).sortWith { (a, b) =>
        var i = 0
        while (i < nd && coords(a)(i) == coords(b)(i)) i += 1
        i < nd && coords(a)(i) < coords(b)(i)
      }
    val flat = new Array[Long](n * nd)
    val vals = new Array[Double](n)
    var i = 0
    while (i < n) {
      val k = order(i)
      var d = 0
      while (d < nd) { flat(i * nd + d) = coords(k)(d); d += 1 }
      vals(i) = values(k)
      i += 1
    }
    SparseTensor(shape, flat, vals)
  }

  override def equals(o: Any): Boolean = o match {
    case SparseCSFTensor(s, ao, ip, ix, v) =>
      s == shape && ao == axisOrder &&
        ip.length == indptr.length &&
        ip.zip(indptr).forall(p => java.util.Arrays.equals(p._1, p._2)) &&
        ix.length == indices.length &&
        ix.zip(indices).forall(p => java.util.Arrays.equals(p._1, p._2)) &&
        java.util.Arrays.equals(v, values)
    case _ => false
  }
  override def hashCode: Int =
    (shape, axisOrder, indptr.map(java.util.Arrays.hashCode).toSeq,
      indices.map(java.util.Arrays.hashCode).toSeq,
      java.util.Arrays.hashCode(values)).hashCode
}

object SparseCSFTensor {
  /** Compress canonical COO into CSF along `axisOrder` (default: the
    * identity, where canonical row-major order is already tree order —
    * O(nnz); any other order pays one lexicographic re-sort, the CSC
    * precedent). One streaming pass: a node at level l opens whenever
    * any coordinate at level <= l changes between consecutive sorted
    * nonzeros; opening a node closes the previous one at its level,
    * emitting the parent-level indptr entry. */
  def fromCOO(t: SparseTensor,
      axisOrder: Seq[Int] = Seq.empty): SparseCSFTensor = {
    val nd = t.ndim
    val order = if (axisOrder.isEmpty) (0 until nd).toSeq else axisOrder
    require(order.sorted == (0 until nd).toSeq,
      s"axisOrder ${order.mkString(",")} is not a permutation of 0..${nd - 1}")
    val n = t.nnz
    val perm: Array[Int] =
      if (order == (0 until nd).toSeq) Array.range(0, n)
      else Array.range(0, n).sortWith { (a, b) =>
        var i = 0
        var cmp = 0
        while (cmp == 0 && i < nd) {
          cmp = java.lang.Long.compare(
            t.indices(a * nd + order(i)), t.indices(b * nd + order(i)))
          i += 1
        }
        cmp < 0
      }
    def coord(k: Int, level: Int): Long = t.indices(perm(k) * nd + order(level))
    val idx = Array.fill(nd)(Array.newBuilder[Long])
    val ipt = Array.fill(math.max(nd - 1, 0)) {
      val b = Array.newBuilder[Long]; b += 0L; b
    }
    val nodeCount = new Array[Long](nd)
    var k = 0
    while (k < n) {
      var firstChange = 0
      if (k > 0) {
        while (firstChange < nd && coord(k, firstChange) == coord(k - 1, firstChange))
          firstChange += 1
      }
      var l = firstChange
      while (l < nd) {
        // the previously open node at level l (if any) closes: its child
        // range ends at the CURRENT level-(l+1) node count
        if (l < nd - 1 && nodeCount(l) > 0) ipt(l) += nodeCount(l + 1)
        idx(l) += coord(k, l)
        nodeCount(l) += 1
        l += 1
      }
      k += 1
    }
    // close the final open node at every non-leaf level
    var l = 0
    while (l < nd - 1) { ipt(l) += nodeCount(l + 1); l += 1 }
    val vals = Array.tabulate(n)(k => t.values(perm(k)))
    SparseCSFTensor(t.shape, order,
      ipt.map(_.result()).toSeq, idx.map(_.result()).toSeq, vals)
  }
}

class SparseCSFTensorType extends UserDefinedType[SparseCSFTensor] {
  override def sqlType: DataType = StructType(Seq(
    StructField("shape", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("axis_order", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("indptr", ArrayType(
      ArrayType(LongType, containsNull = false), containsNull = false), nullable = false),
    StructField("indices", ArrayType(
      ArrayType(LongType, containsNull = false), containsNull = false), nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def userClass: Class[SparseCSFTensor] = classOf[SparseCSFTensor]

  override def serialize(t: SparseCSFTensor): InternalRow =
    InternalRow(
      new GenericArrayData(t.shape.toArray),
      new GenericArrayData(t.axisOrder.toArray),
      new GenericArrayData(t.indptr.map(new GenericArrayData(_)).toArray[Any]),
      new GenericArrayData(t.indices.map(new GenericArrayData(_)).toArray[Any]),
      new GenericArrayData(t.values))

  override def deserialize(datum: Any): SparseCSFTensor = datum match {
    case row: InternalRow =>
      val ipt = row.getArray(2)
      val idx = row.getArray(3)
      SparseCSFTensor(
        row.getArray(0).toIntArray().toSeq,
        row.getArray(1).toIntArray().toSeq,
        (0 until ipt.numElements()).map(i =>
          ipt.getArray(i).toLongArray()),
        (0 until idx.numElements()).map(i =>
          idx.getArray(i).toLongArray()),
        row.getArray(4).toDoubleArray())
  }

  override def typeName: String = "graft_sparse_csf_tensor"
}

case object SparseCSFTensorType extends SparseCSFTensorType

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
