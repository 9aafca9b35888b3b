package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler

/** Kernel + expression pins for the native Jaro-Winkler similarity (the
  * q_jaro_link oracle hash-match against DuckDB's
  * jaro_winkler_similarity is the cross-engine gate; these pin the
  * kernel's contract and that codegen and interpreted eval agree).
  */
class JaroWinklerSpec extends AnyFunSuite {

  test("kernel: textbook values and edges") {
    assert(math.abs(JaroWinkler.compute("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(JaroWinkler.compute("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(JaroWinkler.compute("abc", "abc") == 1.0)
    // DuckDB semantics: empty-vs-anything is 0, INCLUDING empty-vs-empty
    assert(JaroWinkler.compute("", "") == 0.0)
    assert(JaroWinkler.compute("", "abc") == 0.0)
    assert(JaroWinkler.compute("a", "b") == 0.0)
    // boost only above 0.7: a low-jaro pair with a shared prefix must
    // NOT get the prefix bonus
    val low = JaroWinkler.compute("abcdefgh", "abzzzzzz")
    assert(low <= 0.7, s"expected sub-threshold jaro, got $low")
  }

  test("kernel: symmetric, bounded, monotone under identity") {
    val strs = Seq("small ring", "small rink", "red widget", "blue bolt", "x", "",
      "hot gear", "hot gearz", "aaaa", "aaab")
    for (a <- strs; b <- strs) {
      val ab = JaroWinkler.compute(a, b)
      assert(ab >= 0.0 && ab <= 1.0, s"out of range: $a/$b")
      assert(ab == JaroWinkler.compute(b, a), s"asymmetric: $a/$b")
      if (a == b && a.nonEmpty) assert(ab == 1.0)
    }
  }

  test("expression: codegen equals the kernel over the fixture, nulls propagate") {
    val spark = TestSpark.spark
    val df = graft.sources.Tables(spark, TestSpark.sf0001, "part")
      .select(col("p_name"),
        JaroWinkler.jaroWinkler(col("p_name"), reverse(col("p_name"))).as("sim"),
        JaroWinkler.jaroWinkler(col("p_name"), lit(null).cast("string")).as("simn"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = JaroWinkler.compute(r.getString(0), r.getString(0).reverse)
      assert(r.getDouble(1) == expect, s"codegen != kernel for ${r.getString(0)}")
      assert(r.isNullAt(2), "null input must yield null")
    }
  }
}
