package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Sampling}
import graft.sources.Tables

/** Round-8 graph + training-order verbs: degree-oriented triangle
  * counting against a brute-force adjacency recompute, and the epoch
  * shuffle's permutation / determinism / seed-sensitivity contract.
  */
class GraphShuffleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("triangles: per-node counts equal a brute-force adjacency walk") {
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select($"l_orderkey", $"l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = li.groupBy(_._1).values.flatMap { g =>
      val parts = g.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length) yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size)
    val edges = pairCounts.collect { case (e, n) if n >= 2 => e }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- edges
      c <- adj(a).intersect(adj(b)) if a < b && b < c
      v <- Seq(a, b, c)
    } expected(v) += 1
    val got = Analytics.triangleCounts(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got == expected.toMap)
  }

  test("epoch shuffle: positions form a permutation, stable across runs, seed-sensitive") {
    val run1 = Sampling.epochShuffle(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val n = run1.size
    assert(run1.values.toSeq.sorted == (0L until n.toLong))
    val run2 = Sampling.epochShuffle(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(run1 == run2)
    val other = Sampling.epochShuffle(spark, TestSpark.sf0001, seed = "epoch9")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(other.keySet == run1.keySet && other != run1)
  }
}
