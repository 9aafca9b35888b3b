package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashSketch, SimHashSketch}

/** Partition-independence of the sketch aggregates: for any split of the
  * input into partial buffers, update-then-merge must equal one
  * sequential pass. This is the property that makes the aggregates safe
  * under Spark's partial aggregation at any partitioning — checked
  * directly on the buffer algebra (seeded randomized trials), no Spark
  * session needed.
  */
class SketchPropertiesSpec extends AnyFunSuite {

  private val prime = 2147483647L
  private val crnd = new scala.util.Random(7)
  private val a = Array.fill(16)(math.abs(crnd.nextLong()) % (prime - 1) + 1)
  private val b = Array.fill(16)(math.abs(crnd.nextLong()) % prime)

  private val minAgg = MinHashSketch(
    org.apache.spark.sql.catalyst.expressions.Literal(0L), prime, a, b)
  private val simAgg = SimHashSketch(
    org.apache.spark.sql.catalyst.expressions.Literal(0L))

  private def minUpdate(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < 16) { val p = (a(i) * h + b(i)) % prime; if (p < buf(i)) buf(i) = p; i += 1 }
    buf
  }

  private def simUpdate(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < 64) { buf(j) += ((h >>> j) & 1L) * 2L - 1L; j += 1 }
    buf
  }

  test("minhash: split-and-merge equals one pass for any partitioning") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val hs = List.fill(rnd.nextInt(50))(math.abs(rnd.nextLong()) % prime)
      val (l, r) = hs.splitAt(if (hs.isEmpty) 0 else rnd.nextInt(hs.length + 1))
      val one = hs.foldLeft(minAgg.createAggregationBuffer())(minUpdate)
      val bl = l.foldLeft(minAgg.createAggregationBuffer())(minUpdate)
      val br = r.foldLeft(minAgg.createAggregationBuffer())(minUpdate)
      assert(minAgg.merge(bl, br).toSeq == one.toSeq)
    }
  }

  test("minhash: serialize/deserialize round-trips the buffer") {
    val rnd = new scala.util.Random(43)
    (1 to 100).foreach { _ =>
      val hs = List.fill(rnd.nextInt(50))(math.abs(rnd.nextLong()) % prime)
      val buf = hs.foldLeft(minAgg.createAggregationBuffer())(minUpdate)
      assert(minAgg.deserialize(minAgg.serialize(buf)).toSeq == buf.toSeq)
    }
  }

  test("simhash: split-and-merge equals one pass; eval packs signs") {
    val rnd = new scala.util.Random(44)
    (1 to 300).foreach { _ =>
      val hs = List.fill(rnd.nextInt(50))(rnd.nextLong())
      val (l, r) = hs.splitAt(if (hs.isEmpty) 0 else rnd.nextInt(hs.length + 1))
      val one = hs.foldLeft(simAgg.createAggregationBuffer())(simUpdate)
      val bl = l.foldLeft(simAgg.createAggregationBuffer())(simUpdate)
      val br = r.foldLeft(simAgg.createAggregationBuffer())(simUpdate)
      val merged = simAgg.merge(bl, br)
      assert(merged.toSeq == one.toSeq)
      val fp = simAgg.eval(merged).asInstanceOf[Long]
      (0 until 64).foreach { j =>
        assert(((fp >>> j) & 1L) == (if (one(j) > 0) 1L else 0L))
      }
    }
  }
}
