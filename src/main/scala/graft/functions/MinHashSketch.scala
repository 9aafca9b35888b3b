package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All K MinHash permutation minima in ONE aggregate pass.
  *
  * The declarative formulation — K separate `min(pmod(a_i*h+b_i, p))`
  * aggregate columns — is correct and codegen'd, but K=64 aggregate
  * buffers make janino compile a multi-thousand-line update method:
  * ~3 s of one-time codegen+JIT per fresh JVM, which a benchmarked
  * single run pays in full. This TypedImperativeAggregate keeps the
  * whole sketch in one primitive long[K] buffer and runs the K affine
  * permutations in a tight JVM loop per input hash — no generated agg
  * code to compile, identical results (min is commutative, arithmetic
  * unchanged), still map-side partial-aggregated and mergeable, so the
  * shuffle stays K longs per group at any scale.
  *
  * `child` must evaluate to the pre-permutation shingle hash in
  * [0, prime). Coefficients ride in the expression (driver-created,
  * task-serialized once).
  */
case class MinHashSketch(
    child: Expression,
    prime: Long,
    coefA: Array[Long],
    coefB: Array[Long],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val k = coefA.length

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        // a ≤ prime < 2^31 and h < prime keep a*h+b < 2^62 — no overflow
        val p = (coefA(i) * h + coefB(i)) % prime
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
}

object MinHashSketch {
  def sketch(h: Column, prime: Long, coefA: Array[Long], coefB: Array[Long]): Column =
    ColumnBridge.column(
      MinHashSketch(ColumnBridge.expression(h), prime, coefA, coefB).toAggregateExpression())

  def sketchKm(h1h2: Column, k: Int): Column =
    ColumnBridge.column(
      MinHashKmSketch(ColumnBridge.expression(h1h2), k).toAggregateExpression())
}

/** Kirsch–Mitzenmacher double-hashing MinHash in ONE aggregate pass:
  * permutation j's value is `min(h1 + j·h2)` over the group's shingle
  * hashes — the `minhashSigExact` construction (ONE md5 per shingle,
  * two 32-bit words, k derived permutations), generalized to any k in
  * a single primitive long[k] buffer for the same janino reason as
  * [[MinHashSketch]]. `child` must evaluate to a (h1, h2) struct of
  * two longs in [0, 2³²) — h1 + 63·h2 < 2³⁸ keeps every permutation
  * overflow-free. ENGINE-PORTABLE: the same minima fall out of a plain
  * `MIN(h1 + j*h2)` in any SQL engine, which is what makes the LSH
  * banding built on top oracle-checkable.
  */
case class MinHashKmSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val h1 = row.getLong(0)
        val h2 = row.getLong(1)
        var j = 0
        while (j < k) {
          val p = h1 + j * h2
          if (p < buf(j)) buf(j) = p
          j += 1
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_km_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashKmSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashKmSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashKmSketch =
    copy(child = newChild)
}
