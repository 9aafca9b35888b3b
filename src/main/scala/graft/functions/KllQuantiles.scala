package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL mergeable quantile sketches (DataSketches, on Spark's classpath) —
  * the third member of graft's sketch-algebra family: theta covers
  * distinct-set algebra, Misra-Gries covers frequency, KLL covers rank /
  * quantiles. The verb this buys at 100 TB: build a bounded (~3 KiB at
  * k=200) quantile STATE per segment/day in one pass, persist the bytes,
  * and answer "p99 over any union of segments" later by merging sketches
  * — no re-scan of raw values, which neither the exact two-pass quantile
  * core (`Relational.distributedPercentilesOf`, a per-computation scan)
  * nor `approx_percentile` (not re-mergeable from stored state across
  * jobs) can do.
  *
  * Accuracy contract: KLL at k=200 carries ≤ ~1.65 % rank error at 99 %
  * confidence, and its compaction is RANDOMIZED — estimates are not
  * run-deterministic, so the registered query gets the rows-only
  * correctness tier with `KllPropertiesSpec` pinning the rank-error
  * bound, merge consistency, and serialization round-trip (same pattern
  * as the LSH/HLL/GK families).
  */
object KllQuantiles {

  /** Aggregate raw doubles into KLL sketch bytes (k = 200). */
  def agg(value: Column): Column =
    ColumnBridge.column(KllSketchAgg(ColumnBridge.expression(value)).toAggregateExpression())

  /** Merge previously-built sketches (bytes → bytes). */
  def mergeAgg(sketch: Column): Column =
    ColumnBridge.column(KllMergeAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  /** Quantile estimate at rank `q` from sketch bytes. */
  def quantile(sketch: Column, q: Double): Column =
    ColumnBridge.column(KllQuantile(ColumnBridge.expression(sketch), q))

  private[graft] def wrap(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.wrap(Memory.wrap(bytes))
}

/** `kll_sketch_agg`: the buffer is a live updatable sketch; partials
  * serialize as sketch bytes and merge with the KLL merge operation —
  * mergeable-summaries semantics, so map-side partial aggregation and
  * arbitrary re-partitioning never change the accuracy contract.
  */
case class KllSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch = KllDoublesSketch.newHeapInstance(200)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `kll_merge_agg` over stored sketch bytes — the rollup verb. */
case class KllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch = KllDoublesSketch.newHeapInstance(200)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllQuantiles.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_quantile(bytes, q)` → value estimate at rank q (INCLUSIVE
  * search criteria, matching SQL percentile_disc-style semantics).
  * Empty sketches (no inputs reached the group) yield null.
  */
case class KllQuantile(child: Expression, q: Double)
  extends UnaryExpression with CodegenFallback {

  override protected def nullSafeEval(input: Any): Any = {
    val sk = KllQuantiles.wrap(input.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
  }

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  override protected def withNewChildInternal(newChild: Expression): KllQuantile =
    copy(child = newChild)
}
