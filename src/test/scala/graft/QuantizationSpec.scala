package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CountMin, Dedup, Quantization, Similarity}

/** Int8 quantization, PQ ANN, count-min, and semantic-dedup contracts
  * (round 8 additions over the sf0.001 tables).
  */
class QuantizationSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("quant error: every vector reconstructs within the scale/254 half-step bound") {
    val r = Quantization.quantError(spark, sf).collect()(0)
    assert(r.getLong(0) == 500)
    assert(r.getLong(2) == 0, s"vectors over bound: ${r.getLong(2)}")
    assert(r.getDouble(1) >= 0.0)
  }

  test("quantized knn: agrees with float knn on most neighbor sets") {
    val brute = Similarity.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = Quantization.quantizedKnn(spark, sf).collect()
    assert(q.length == 50)
    // qcos must be a genuine cosine
    assert(q.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
    val q8 = q.map(r => (r.getLong(0), r.getLong(1))).toSet
    val agree = (brute & q8).size.toDouble / brute.size
    // int8 max-abs quantization perturbs cosines by ~1e-2; on synthetic
    // near-uniform vectors some boundary ranks flip — the contract is
    // high agreement, not identity
    assert(agree >= 0.7, s"agreement=$agree")
  }

  test("pq ann: recall@5 ≥ 0.5 vs brute force after exact re-rank") {
    val brute = Similarity.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqCosine(spark, sf).collect()
    val perQuery = pq.groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(2)).sorted.toSeq)
    assert(perQuery.values.forall(_ == Seq(1, 2, 3, 4, 5)))
    val recall = (brute & pq.map(r => (r.getLong(0), r.getLong(1))).toSet).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("count-min: one-sided error — est ≥ exact for every probed key, within ε·N") {
    val rows = CountMin.heavyKeys(spark, sf).collect()
    val distinctKeys = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id")).distinct().count()
    assert(rows.length == math.min(20L, distinctKeys))
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    val eps = math.E / 64.0
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS undercounted key ${r.getLong(0)}: $est < $exact")
      assert(est - exact <= eps * n,
        s"key ${r.getLong(0)} over the ε·N bound: est=$est exact=$exact n=$n")
    }
  }

  test("count-min: sketch merges — union-then-build equals build-then-sum") {
    val events = spark.read.parquet(s"$sf/events.parquet").select(col("user_id"))
    val (a, b) = (events.filter(col("user_id") % 2 === 0), events.filter(col("user_id") % 2 =!= 0))
    val whole = CountMin.build(events, 4, 64)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val merged = CountMin.build(a, 4, 64).unionByName(CountMin.build(b, 4, 64))
      .groupBy(col("row_id"), col("bucket")).agg(sum(col("n")).as("n"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(whole == merged)
  }

  test("semantic dedup: finds every exact ≥0.999 pair and keeps cluster minima") {
    val exactPairs = Dedup.embeddingNearDups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Dedup.semanticDedup(spark, sf).collect()
    val cluster = sem.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recall: at 0.999 cosine the LSH miss probability is ~1e-18 — every
    // exact pair (bounded slice vec_id<300) must land in one cluster
    exactPairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"exact near-dup pair ($a,$b) split across clusters")
    }
    // keep ⇔ the member IS its cluster's min id
    val minOf = sem.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).min).toMap
    sem.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(0) == minOf(r.getLong(1))))
    }
    // every vector labeled exactly once
    assert(sem.length == 500 && cluster.size == 500)
  }
}
