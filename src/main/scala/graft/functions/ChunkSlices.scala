package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Custom table function (Catalyst `Generator`): emit overlapping
  * fixed-size windows of an array — `(chunk_idx, chunk)` rows, one per
  * window of `chunkSize` elements starting every `stride` elements while
  * a start position remains in the array (the tail chunk may be short).
  * This is `TextAnalysis.tokenChunks`' chunker as a single generator
  * instead of the explode(sequence)+slice composition — the UDTF leg of
  * the declared UDF/UDAF/UDTF triad (SURVEY §2B).
  *
  * Why a Generator and not the composition: the built-in formulation
  * materializes the doc's token array once per emitted chunk row before
  * slicing (explode duplicates `t` into every row); the generator emits
  * straight off ONE ArrayData per input row. Both are narrow per-row
  * flatMaps — identical shuffle story at 100 TB — so the differential
  * spec pins them row-identical and `tokenChunks` keeps the codegen'd
  * built-ins on the hot path (custom generators run through
  * `GenerateExec`'s interpreted path: `CodegenFallback` here).
  *
  * Null or empty arrays emit nothing (matching `tokenChunks`' size>0
  * pre-filter semantics for empties; explode-of-null likewise).
  */
case class ChunkSlices(child: Expression, chunkSize: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")

  @transient private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk", ArrayType(elemType,
      child.dataType.asInstanceOf[ArrayType].containsNull), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_slices requires an array column, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() == 0) Iterator.empty
    else {
      val n = arr.numElements()
      val et = elemType
      val nChunks = (n - 1) / stride + 1
      (0 until nChunks).iterator.map { k =>
        val start = k * stride
        val len = math.min(chunkSize, n - start)
        val out = new Array[Any](len)
        var i = 0
        while (i < len) {
          out(i) = if (arr.isNullAt(start + i)) null else arr.get(start + i, et)
          i += 1
        }
        InternalRow(k, new GenericArrayData(out))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkSlices =
    copy(child = newChild)

  override def prettyName: String = "chunk_slices"
}

object ChunkSlices {
  /** Column-API surface: `select(col("id"), chunkSlices(col("arr"), 32, 24))`
    * expands to (chunk_idx, chunk) rows via the analyzer's Generate
    * extraction, exactly like built-in posexplode.
    */
  def chunkSlices(arr: Column, chunkSize: Int, stride: Int): Column =
    ColumnBridge.column(ChunkSlices(ColumnBridge.expression(arr), chunkSize, stride))
}
