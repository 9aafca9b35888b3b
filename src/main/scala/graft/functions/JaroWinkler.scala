package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen'd Catalyst
  * expression — Spark ships `levenshtein` and `soundex` but no
  * Jaro-Winkler, and the entity-resolution tier wants the similarity
  * that rewards shared prefixes (names, brands, product titles).
  *
  * Semantics track DuckDB's `jaro_winkler_similarity` EXACTLY (verified
  * by a 3000-pair random differential during development + the oracle
  * hash-match): standard Jaro with match window `max(l1,l2)/2 - 1`,
  * half-transposition counting, Winkler prefix boost (≤ 4 chars, 0.1
  * scale) applied only when jaro > 0.7, and the empty-vs-empty edge
  * returning 0 (NOT the equality shortcut's 1 — both engines treat "no
  * characters" as "nothing matched").
  *
  * `doGenCode` emits a static call into [[JaroWinkler.compute]] — the
  * same pattern as Spark's own `levenshtein` (a scalar kernel behind a
  * codegen'd call, no interpreted fallback on the hot path).
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  protected override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.compute(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler$$.MODULE$$.compute($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Column-API entry point. */
  def jaroWinkler(l: Column, r: Column): Column =
    ColumnBridge.column(
      JaroWinklerSimilarity(ColumnBridge.expression(l), ColumnBridge.expression(r)))

  /** The scalar kernel — called from both interpreted eval and the
    * generated code. Character-based (String, not bytes), matching
    * DuckDB's unicode handling for the ASCII fixtures the oracle runs
    * on.
    */
  def compute(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val pMax = math.min(4, math.min(l1, l2))
      while (p < pMax && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
