package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** ENGINE-PORTABLE HyperLogLog — the cardinality member of the
  * portable-sketch family (CountMin `q_countmin`, MinHash
  * `q_minhash_sig`, SimHash, the KM bloom `q_decontaminate_bloom`):
  * where Spark's native `approx_count_distinct` (HLL++) is an opaque
  * engine-private register layout (its query is rows-only by design),
  * this sketch is a deterministic function of the md5 hashes, so a SQL
  * oracle can rebuild the registers and hash-match the ESTIMATE itself.
  *
  * Construction (classic Flajolet HLL, dense, m = 2^b registers):
  * `child` is the 60-bit md5 prefix of the key (the house portable base
  * hash). Top `b` bits select the register; the remaining W = 60−b bits
  * give the rank = leading-zero count within W + 1 ∈ [1, W+1] (w = 0 →
  * W+1); each register keeps the max rank. Replay is pure SQL because
  * rank is integer-monotone: rank(w) depends only on w's highest set
  * bit and is non-increasing in w, so `MAX(rank) == rank(MIN(w))` per
  * register — the oracle computes one rank per occupied register from
  * `MIN(w)`, never per row.
  *
  * The estimate crosses engines exactly via the INTEGER CHANNEL (the
  * r13 q9 rule: executor-parallel double sums must be bridged to
  * integers): the harmonic denominator Σ 2^−M[j] is scaled by 2^52 —
  * every term 2^(52−M[j]) is an exact long (M ≤ 52), the sum is
  * order-free and ≤ m·2^52 = 2^61 — and only the final
  * `alpha·m²·2^52 / Σ` division is (mirrored) double arithmetic.
  * Small-range correction: linear counting `m·ln(m/V)` when the raw
  * estimate ≤ 2.5m and V (zero registers) > 0; the branch condition
  * evaluates on identical doubles in both engines, and `ln` sits under
  * a round(…,4) with ~1e-13 of slack at this magnitude.
  *
  * 100 TB posture: the register array is the aggregation state — m
  * bytes per group, map-side combined, merged by per-register max
  * (order-free), exactly the mergeable-summaries contract of the HLL
  * union tier (`q_hll_merge`). Output is (sum_int, v_zero) — the two
  * numbers the estimate derives from — so the hash compare pins the
  * full register state, not just the rounded estimate.
  */
case class PortableHll(
    child: Expression,
    b: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val m = 1 << b
  private val w = 60 - b // suffix width
  private val mask = (1L << w) - 1

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> w).toInt
      val suffix = h & mask
      val rank =
        if (suffix == 0L) w + 1
        else java.lang.Long.numberOfLeadingZeros(suffix) - (64 - w) + 1
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    // integer channel: Σ 2^(S − M[j]) at scale S = W+1 — every term an
    // exact long (M ∈ [0, W+1]), order-free, max Σ = m·2^(W+1) = 2^61
    val scale = w + 1
    var sumInt = 0L
    var vZero = 0L
    var i = 0
    while (i < m) {
      sumInt += 1L << (scale - buf(i))
      if (buf(i) == 0) vZero += 1
      i += 1
    }
    InternalRow(sumInt, vZero)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = StructType(Seq(
    StructField("sum_int", LongType, nullable = false),
    StructField("v_zero", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "portable_hll"

  override def withNewMutableAggBufferOffset(newOffset: Int): PortableHll =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PortableHll =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PortableHll =
    copy(child = newChild)
}

object PortableHll {
  def agg(h60: Column, b: Int): Column =
    ColumnBridge.column(
      PortableHll(ColumnBridge.expression(h60), b).toAggregateExpression())

  /** alpha_m for the standard bias correction — written as the same
    * literal expression the oracle uses so both engines evaluate the
    * identical IEEE double.
    */
  def alpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)
}
