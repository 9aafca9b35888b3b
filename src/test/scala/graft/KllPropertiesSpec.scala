package graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KllQuantiles, KllSketchAgg}
import graft.operators.Relational

/** The KLL quantile family's accuracy and algebra pins — the rows-only
  * query `q_kll_quantiles` is validated here (KLL compaction is
  * randomized, so estimates are not run-deterministic and cannot
  * hash-match an oracle): rank-error bound vs exact on a known
  * distribution, merged-parts vs one-pass consistency, serialization
  * round-trip, and the registered query's shape.
  */
class KllPropertiesSpec extends AnyFunSuite {

  private val agg = KllSketchAgg(org.apache.spark.sql.catalyst.expressions.Literal(0.0))

  private def rankOf(sorted: Array[Double], v: Double): Double = {
    val i = java.util.Arrays.binarySearch(sorted, v)
    val pos = if (i >= 0) i else -i - 1
    pos.toDouble / sorted.length
  }

  test("rank error stays inside the k=200 contract (~1.65%, tested at 3%)") {
    val rnd = new scala.util.Random(11)
    // lognormal-ish skew — the shape quantile sketches exist for
    val xs = Array.fill(200000)(math.exp(rnd.nextGaussian()))
    val sk = KllDoublesSketch.newHeapInstance(200)
    xs.foreach(sk.update)
    val sorted = xs.sorted
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err < 0.03, s"rank error $err at q=$q")
    }
  }

  test("merging per-part sketches answers like a one-pass sketch (both inside the bound)") {
    val rnd = new scala.util.Random(23)
    val xs = Array.fill(120000)(rnd.nextDouble() * 1000)
    val sorted = xs.sorted
    val parts = xs.grouped(10000).map { chunk =>
      val s = KllDoublesSketch.newHeapInstance(200); chunk.foreach(s.update); s
    }.toSeq
    val merged = KllDoublesSketch.newHeapInstance(200)
    // merge via serialized bytes — the exact path the rollup query takes
    parts.foreach(p => merged.merge(KllQuantiles.wrap(p.toByteArray)))
    assert(merged.getN == xs.length)
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val est = merged.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
      assert(math.abs(rankOf(sorted, est) - q) < 0.03,
        s"merged rank error at q=$q")
    }
  }

  test("aggregate buffer serialize/deserialize round-trips state") {
    val buf = agg.createAggregationBuffer()
    (1 to 5000).foreach(i => buf.update(i.toDouble))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.getN == buf.getN)
    assert(back.getQuantile(0.5, QuantileSearchCriteria.INCLUSIVE) ==
      buf.getQuantile(0.5, QuantileSearchCriteria.INCLUSIVE))
  }

  test("exact-regime sanity: below compaction the quantiles are exact") {
    val sk = KllDoublesSketch.newHeapInstance(200)
    (1 to 100).foreach(i => sk.update(i.toDouble))
    assert(sk.getQuantile(0.5, QuantileSearchCriteria.INCLUSIVE) == 50.0)
    assert(sk.getQuantile(1.0, QuantileSearchCriteria.INCLUSIVE) == 100.0)
  }

  test("q_kll_quantiles: per-type rows + merged global, monotone quantiles, sane range") {
    val spark = TestSpark.spark
    val rows = Relational.kllQuantileRollup(spark, TestSpark.sf0001).collect()
    val scopes = rows.map(_.getString(0)).toSet
    assert(scopes.contains("all") && scopes.size >= 2)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99, s"non-monotone quantiles in $r")
    }
    // the merged-global row must sit inside the per-type envelope
    val per = rows.filter(_.getString(0) != "all")
    val all = rows.find(_.getString(0) == "all").get
    assert(all.getDouble(3) <= per.map(_.getDouble(3)).max + 1e-9)
    assert(all.getDouble(1) >= per.map(_.getDouble(1)).min - 1e-9)
  }
}
