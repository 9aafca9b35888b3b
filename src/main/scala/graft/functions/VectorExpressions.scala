package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over two numeric array columns.
  *
  * The `functions.aggregate`/`zip_with` formulation of a dot product is a
  * higher-order function — `CodegenFallback`, so every row pays
  * interpreted expression-tree walks per element. This expression is the
  * preference-order-(b) replacement (custom Catalyst expression, not a
  * UDF): a fused primitive loop over the two `ArrayData`, with
  * `doGenCode` emitting the same loop inline inside whole-stage codegen —
  * no boxing, no per-element virtual dispatch, no fallback.
  *
  * Accumulation is always `double` regardless of element type (matches
  * the HOF version it replaces and the DuckDB oracle's arithmetic).
  * Unequal lengths dot the common prefix; null elements contribute 0 —
  * embedding columns are dense fixed-width, so neither occurs in practice.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  /** Fixed-width numeric element types only: DecimalType is a
    * NumericType but has no primitive ArrayData accessor, so admitting
    * it would type-check and then crash at runtime — reject it here.
    */
  private def supported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType | ShortType | ByteType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (supported(left.dataType) && supported(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two fixed-width numeric array columns, got ${left.dataType} and ${right.dataType}")

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  private def getter(dt: NumericType): (ArrayData, Int) => Double = dt match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType => (a, i) => a.getLong(i).toDouble
    case ShortType => (a, i) => a.getShort(i).toDouble
    case ByteType => (a, i) => a.getByte(i).toDouble
    case other => (a, i) => a.get(i, other).asInstanceOf[Number].doubleValue() // unreachable: checkInputDataTypes
  }

  // child types are fixed at analysis time — resolve accessors once, not per row
  @transient private lazy val leftGetter = getter(elemType(left))
  @transient private lazy val rightGetter = getter(elemType(right))

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val ga = leftGetter
    val gb = rightGetter
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += ga(a, i) * gb(b, i)
      i += 1
    }
    acc
  }

  /** Java accessor for one element as double, e.g. `(double) a.getFloat(i)`. */
  private def genGet(dt: NumericType, arr: String, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case _ => s"((Number) $arr.get($i, null)).doubleValue()" // unreachable for checked types
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (${genGet(elemType(left), a, i)}) * (${genGet(elemType(right), b, i)});
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the vector expressions. */
object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Squared L2 norm as a self-dot — one fused loop. */
  def sqNorm(a: Column): Column = dot(a, a)

  /** All m PQ sub-codes of a vector in one expression — see [[PqEncode]]. */
  def pqEncode(v: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), books))
}

/** All m product-quantization sub-codes of a double vector in ONE
  * expression: for each subspace, the argmax over the codebook of
  * `s·c − ‖c‖²/2` (first index wins ties). Bit-identical to the HOF
  * `transform`/`zip_with`/`aggregate` formulation it replaces — the
  * per-cell dot folds left-to-right in array order and the half-norm
  * constants fold the same way at construction — but ~two orders of
  * magnitude cheaper per row: the HOF tree is CodegenFallback and
  * walks interpreted expression nodes PER ELEMENT (m×nCodes×subDim×2
  * per row), where this is one eval call around tight JVM loops. The
  * codebook rides the expression as plain driver data (the janino rule:
  * literal DATA, never unrolled CODE).
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val m = books.length
  private val subDim = if (m > 0 && books(0).nonEmpty) books(0)(0).length else 0

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $other")
  }

  // ‖c‖²/2 per (sub, cell), same left-to-right fold as the HOF constant
  @transient private lazy val halfNorms: Array[Array[Double]] =
    books.map(_.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc / 2
    })

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val cents = books(sub)
      val hn = halfNorms(sub)
      val base = sub * subDim
      var best = 0
      var bestScore = Double.NegativeInfinity
      var cell = 0
      while (cell < cents.length) {
        val c = cents(cell)
        var acc = 0.0
        var i = 0
        while (i < subDim) { acc += v.getDouble(base + i) * c(i); i += 1 }
        val score = acc - hn(cell)
        if (score > bestScore) { bestScore = score; best = cell }
        cell += 1
      }
      out(sub) = best
      sub += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
