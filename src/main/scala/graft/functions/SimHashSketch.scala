package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash in one aggregate pass: bit j of the result is the sign
  * of Σ_tokens (±1 on bit j of the token hash).
  *
  * Same rationale as [[MinHashSketch]]: 64 declarative sum() columns are
  * a janino-compiled 64-buffer aggregate (seconds of one-time codegen
  * per fresh JVM); this keeps the 64 signed counters in one primitive
  * long[] and folds each token hash with shifts/adds. Sign packing
  * happens in eval, so the output is the final fingerprint long —
  * results identical to the declarative form (sum is commutative).
  *
  * `child` must evaluate to the 64-bit token hash.
  */
case class SimHashSketch(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += ((h >>> j) & 1L) * 2L - 1L
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var fp = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashSketch =
    copy(child = newChild)
}

object SimHashSketch {
  def sketch(h: Column): Column =
    ColumnBridge.column(SimHashSketch(ColumnBridge.expression(h)).toAggregateExpression())
}
