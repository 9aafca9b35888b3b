package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Normalizes a race identifier to `<letters><digits>` lowercase.
  *
  * Semantics match the reference's `standardize_race_id`
  * (`/root/reference/src/pipeline.py:21-36`):
  *   - `"Cup 25"` → `"cup25"`, `"league:04"` → `"league04"` (leading zero
  *     kept), `"race_11"` → `"race11"`;
  *   - letters part = concatenation of all `[A-Za-z]+` runs, lowercased;
  *     digits part = concatenation of all decimal-digit runs;
  *   - if either part is empty, fall back to stripping every character
  *     outside `[0-9a-zA-Z]` from the trimmed input and lowercasing;
  *   - null input → null output (the reference passes non-strings through).
  *
  * Implemented as a native Catalyst `UnaryExpression` with `doGenCode`, so
  * it stays inside whole-stage codegen (one static-ish call per row, no UDF
  * serialization, no codegen fallback).
  */
case class StandardizeRaceId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "standardize_race_id"

  override protected def nullSafeEval(input: Any): Any =
    StandardizeRaceId.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StandardizeRaceId$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): StandardizeRaceId =
    copy(child = newChild)
}

object StandardizeRaceId {

  /** UTF8String entry point used by both interpreted and generated code. */
  def normalize(u: UTF8String): UTF8String =
    UTF8String.fromString(normalize(u.toString))

  /** Pure-JVM reference implementation of the normalization. */
  def normalize(s: String): String = {
    // Python str.strip(): Unicode whitespace — Java String.strip matches.
    val text = s.strip()
    val word = new java.lang.StringBuilder
    val digits = new java.lang.StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if ((c >= 'A' && c <= 'Z')) word.append((c + 32).toChar)
      else if (c >= 'a' && c <= 'z') word.append(c)
      // Python \d matches Unicode Nd; Character.isDigit is the same class.
      else if (Character.isDigit(c)) digits.append(c)
      i += 1
    }
    if (word.length > 0 && digits.length > 0) word.toString + digits.toString
    else {
      // Fallback: keep only ASCII alphanumerics of the trimmed input, lowercase.
      val sb = new java.lang.StringBuilder(text.length)
      var j = 0
      while (j < text.length) {
        val c = text.charAt(j)
        if (c >= '0' && c <= '9') sb.append(c)
        else if (c >= 'a' && c <= 'z') sb.append(c)
        else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
        j += 1
      }
      sb.toString
    }
  }
}
