package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Theta-sketch distinct counting with SET OPERATIONS (DataSketches,
  * already on Spark's classpath). Spark's built-in `hll_sketch_agg`
  * family merges by UNION only — a theta sketch additionally supports
  * INTERSECTION and difference, which is what audience-overlap /
  * cross-segment questions need ("how many users did BOTH X and Y") when
  * the exact distinct-intersection would shuffle the full id universe.
  *
  * Scale contract: per group the state is one bounded sketch (lgK=12 →
  * ≤ 4096 retained hashes, ~32 KiB worst case), map-side partial
  * aggregation applies, and stored sketch BYTES re-aggregate later —
  * the same persistable-state story `hllMergedDistinct` pins for union,
  * extended to the full set algebra. Below ~4096 distincts the sketch is
  * in exact mode and estimates ARE the exact counts (the DuckDB oracle
  * relies on this at verify scale; `SketchPropertiesSpec` pins the
  * approximate regime's error bound separately).
  */
object ThetaSketch {

  /** Aggregate raw long keys into compact theta-sketch bytes. */
  def agg(key: Column): Column =
    ColumnBridge.column(ThetaSketchAgg(ColumnBridge.expression(key)).toAggregateExpression())

  /** Union previously-built sketches (bytes → bytes). */
  def unionAgg(sketch: Column): Column =
    ColumnBridge.column(
      ThetaSetOpAgg(ColumnBridge.expression(sketch), intersect = false).toAggregateExpression())

  /** Intersect previously-built sketches (bytes → bytes). */
  def intersectAgg(sketch: Column): Column =
    ColumnBridge.column(
      ThetaSetOpAgg(ColumnBridge.expression(sketch), intersect = true).toAggregateExpression())

  /** Distinct-count estimate of compact sketch bytes. */
  def estimate(sketch: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(sketch)))

  private[functions] def wrapBytes(bytes: Array[Byte]): CompactSketch =
    Sketches.wrapCompactSketch(Memory.wrap(bytes))
}

/** `theta_sketch_agg`: buffer is a live Union absorbing raw keys;
  * partials serialize as compact sketches and merge by union — exactly
  * the distinct-set semantics, commutative and associative.
  */
case class ThetaSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union = SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Union, b2: Union): Union = { b1.union(b2.getResult); b1 }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(ThetaSketch.wrapBytes(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `theta_union_agg` / `theta_intersect_agg` over stored sketch bytes.
  *
  * The buffer is the combined-so-far compact sketch, `None` before any
  * input — the distinction matters for intersection, whose identity is
  * the UNIVERSE and cannot be represented as a sketch (an empty sketch
  * would intersect everything away). Both ops are commutative and
  * associative, so partial/final merge order never changes the result.
  */
case class ThetaSetOpAgg(
    child: Expression,
    intersect: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CompactSketch]] with UnaryLike[Expression] {

  private def combine(a: CompactSketch, b: CompactSketch): CompactSketch =
    if (intersect) {
      val i: Intersection = SetOperation.builder().buildIntersection()
      i.intersect(a); i.intersect(b); i.getResult
    } else {
      val u: Union = SetOperation.builder().buildUnion()
      u.union(a); u.union(b); u.getResult
    }

  private def absorb(state: Option[CompactSketch], in: CompactSketch): Option[CompactSketch] =
    Some(state.fold(in)(combine(_, in)))

  override def createAggregationBuffer(): Option[CompactSketch] = None

  override def update(buf: Option[CompactSketch], input: InternalRow): Option[CompactSketch] = {
    val v = child.eval(input)
    if (v == null) buf
    else absorb(buf, ThetaSketch.wrapBytes(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(b1: Option[CompactSketch], b2: Option[CompactSketch]): Option[CompactSketch] =
    b2.fold(b1)(absorb(b1, _))

  // no-input intersection yields the empty sketch: estimating "the
  // universe" is meaningless, and 0.0 is the conventional answer
  override def eval(buf: Option[CompactSketch]): Any =
    buf.getOrElse(SetOperation.builder().buildUnion().getResult).toByteArray

  override def serialize(buf: Option[CompactSketch]): Array[Byte] =
    buf.fold(Array.empty[Byte])(_.toByteArray)

  override def deserialize(bytes: Array[Byte]): Option[CompactSketch] =
    if (bytes.isEmpty) None else Some(ThetaSketch.wrapBytes(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (intersect) "theta_intersect_agg" else "theta_union_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSetOpAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSetOpAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSetOpAgg =
    copy(child = newChild)
}

/** `theta_estimate(bytes)` → distinct-count estimate (exact below the
  * sketch's nominal-entries threshold). Scalar, off the hot path —
  * CodegenFallback keeps it simple.
  */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override protected def nullSafeEval(input: Any): Any =
    ThetaSketch.wrapBytes(input.asInstanceOf[Array[Byte]]).getEstimate

  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}
