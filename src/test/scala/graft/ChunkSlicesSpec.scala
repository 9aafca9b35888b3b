package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ChunkSlices.chunkSlices
import graft.operators.TextAnalysis

/** The custom `chunk_slices` Generator (UDTF leg of the UDF/UDAF/UDTF
  * triad) must be row-identical to the built-in explode+slice
  * composition it re-expresses.
  */
class ChunkSlicesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("generator matches the built-in composition row for row") {
    val viaBuiltins = TextAnalysis.tokenChunks(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).sorted.toSeq
    val viaGenerator = TextAnalysis.tokenChunksGen(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).sorted.toSeq
    assert(viaGenerator == viaBuiltins)
    assert(viaGenerator.nonEmpty)
  }

  test("chunk boundaries: 5 elements, size 3, stride 2 → [abc][cde][e]") {
    val out = Seq(Tuple1(Seq("a", "b", "c", "d", "e"))).toDF("arr")
      .select(chunkSlices($"arr", 3, 2))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toList
    assert(out == List(0 -> List("a", "b", "c"), 1 -> List("c", "d", "e"), 2 -> List("e")))
  }

  test("null and empty arrays emit nothing; null elements survive") {
    val df = Seq((1L, Seq.empty[String]), (2L, null.asInstanceOf[Seq[String]]))
      .toDF("id", "arr")
    assert(df.select(chunkSlices($"arr", 3, 2)).count() == 0)
    val withNull = Seq(Tuple1(Seq("a", null, "c"))).toDF("arr")
      .select(chunkSlices($"arr", 2, 2))
      .collect().map(_.getSeq[String](1).toList).toList
    assert(withNull == List(List("a", null), List("c")))
  }
}
