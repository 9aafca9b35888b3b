package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** ANN quality vs the exact brute-force path (rows-only at the driver —
  * recall is the real acceptance criterion).
  */
class SimilaritySpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("knn brute: 5 neighbors per query, no self-matches") {
    val rows = Similarity.knnBrute(spark, sf).collect()
    assert(rows.length == 50) // 10 queries × 5
    assert(rows.forall(r => r.getLong(1) != r.getLong(0)))
    val perQuery = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(2)).sorted.toSeq)
    assert(perQuery.values.forall(_ == Seq(1, 2, 3, 4, 5)))
  }

  test("ann ivf: recall@5 ≥ 0.4 vs brute force") {
    val brute = Similarity.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("ann lsh: recall@5 ≥ 0.4 vs brute force") {
    val brute = Similarity.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    // random-hyperplane LSH with 8 bits + 1-bit multiprobe on random
    // uniform vectors: modest recall expected; the contract is "finds a
    // meaningful fraction at a fraction of the cost", not exactness.
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("ann self-join: per-vector top-k, no self-matches, symmetric banding, recall vs brute") {
    val rows = Similarity.annSelfJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-match leaked")
    val perVec = rows.groupBy(_.getLong(0))
    assert(perVec.values.forall(_.length <= 5))
    // ranks are 1..n consecutive per vector
    assert(perVec.values.forall(g => g.map(_.getInt(2)).sorted.toSeq == (1 to g.length)))
    // recall on the brute-checked slice (q_id < 10): the self-join sees
    // the same corpus, so its top-k for those ids should recover a
    // meaningful share of the exact neighbors
    val brute = Similarity.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val self = rows.filter(_.getLong(0) < 10)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & self).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("knn graph: edges match the self-join, mutual flag is exactly reciprocity") {
    val rows = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val edges = rows.map(r => (r._1, r._2)).toSet
    // edge set identical to the self-join's per-vector top-k (the graph
    // verb adds annotation, never changes candidates or ranking)
    val self = Similarity.annSelfJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == self)
    // mutual(a→b) ⇔ (b→a) is also an edge — both directions flagged
    rows.foreach { case (s, d, _, mutual) =>
      assert(mutual === edges.contains((d, s)), s"mutual flag wrong on ($s,$d)")
    }
    // non-degenerate on the clustered fixture: some mutual, and mutual
    // edges appear an even number of times in total (paired)
    val nMutual = rows.count(_._4)
    assert(nMutual > 0, "no mutual edges on clustered data")
    assert(nMutual % 2 === 0, "mutual edges must pair up")
    // recall vs brute on the checked slice — graph edges carry the
    // self-join's recall
    val brute = Similarity.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = edges.filter(_._1 < 10)
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("ann self-join: per-bucket cap drops oversized buckets from candidates") {
    // cap=1: no bucket may pair anything → zero candidates, empty result
    assert(Similarity.annSelfJoin(spark, sf, maxBucket = 1).count() == 0)
    // a generous cap must not change the result vs the default
    val default = Similarity.annSelfJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val capped = Similarity.annSelfJoin(spark, sf, maxBucket = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(capped == default)
  }

  test("kmeans assign: one cluster per vector, centroids self-assign") {
    val out = Similarity.kmeansAssign(spark, TestSpark.sf0001).collect()
    val nVec = graft.sources.Tables(spark, TestSpark.sf0001, "embeddings").count()
    assert(out.length == nVec, "every vector assigned exactly once")
    out.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < 8, s"cluster range: $r"))
    // a centroid's own cosine with itself is 1 → it owns itself
    out.filter(_.getLong(0) < 8).foreach { r =>
      assert(r.getLong(1) == r.getLong(0), s"centroid ${r.getLong(0)} not self-assigned")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    }
  }

  test("bounded top-k aggregate is row-identical to the window formulation") {
    // the ANN tail replaced row_number-over-full-pair-list with an O(k)
    // aggregator (the window sort was the 100×-sweep heap hazard) — the
    // two must pick the same neighbors with the same tie-breaks,
    // including ties on cosine (same score, lower id wins) and groups
    // smaller than k
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val sym = (1 to 2000).map { _ =>
      // coarse scores force real ties; NaN (a zero-norm embedding's
      // cosine) and -0.0 pin the comparator's total order against
      // Spark's sort order (NaN largest, -0.0 == 0.0)
      val score = rnd.nextInt(14) match {
        case 12 => Double.NaN
        case 13 => -0.0
        case n  => n / 10.0
      }
      (rnd.nextInt(40).toLong, rnd.nextInt(500).toLong, score)
    }.toDF("a_id", "b_id", "cosine").distinct()
    val k = 5
    // NaN-safe row identity: compare the score's raw bits (Scala tuple
    // equality has NaN != NaN, which would fail on AGREEING results)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), java.lang.Double.doubleToLongBits(r.getDouble(3)))
    val viaWindow = sym
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("a_id")).orderBy(col("cosine").desc, col("b_id").asc)))
      .filter(col("rank") <= k)
      .select(col("a_id").as("q_id"), col("b_id").as("neighbor_id"), col("rank"), col("cosine"))
      .collect().map(key).toSet
    val viaAgg = graft.operators.Similarity.boundedTopK(sym, k)
      .collect().map(key).toSet
    assert(viaAgg == viaWindow)
  }

  test("semantic decontam: every train vector screened once, top-1 is the true argmax") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.semanticDecontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val emb = graft.sources.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val evalIds = emb.keys.filter(id => id % 7 == 0 && id < 3500).toSeq.sorted
    val trainIds = emb.keys.filter(id => id % 7 != 0 || id >= 3500).toSeq.sorted
    assert(rows.map(_._1).toSeq.sorted == trainIds, "one screening row per train vector")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na * nb == 0) 0d else d / (na * nb)
    }
    rows.foreach { case (t, e, c, flag) =>
      val best = evalIds.map(id => (id, cos(emb(t), emb(id))))
        .maxBy { case (id, s) => (s, -id) } // cosine desc, eval_id asc
      assert(e == best._1, s"train $t picked eval $e, argmax is ${best._1}")
      assert(math.abs(c - best._2) < 1e-4, s"train $t cosine $c vs recompute ${best._2}")
      // flag pinned away from the threshold (recompute rounding differs
      // in the last bits right at τ)
      if (math.abs(best._2 - 0.45) > 1e-6)
        assert(flag == (best._2 >= 0.45), s"flag mismatch for train $t (cos ${best._2})")
    }
  }

  test("rrf: fused score is exactly the reciprocal-rank sum of the two arms") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.TextAnalysis.rrfHybrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // ranks are dense 1..N within each arm (0 = absent)
    def denseRanks(rs: Array[Int]): Unit = {
      val present = rs.filter(_ > 0).sorted
      assert(present.sameElements(1 to present.length), "arm ranks must be dense 1..N")
    }
    denseRanks(rows.map(_._2)); denseRanks(rows.map(_._3))
    rows.foreach { case (id, rl, rs, score) =>
      assert(rl > 0 || rs > 0, s"doc $id in neither arm")
      val expect = (if (rl > 0) 1.0 / (rl + 60) else 0.0) +
        (if (rs > 0) 1.0 / (rs + 60) else 0.0)
      assert(math.abs(score - expect) < 1e-6, s"doc $id rrf $score vs $expect")
    }
    // a doc ranked in BOTH arms must outscore a doc holding only the
    // same single-arm rank — the fusion property rrf exists for
    val both = rows.filter(r => r._2 > 0 && r._3 > 0)
    both.foreach { case (_, rl, rs, score) =>
      assert(score > 1.0 / (rl + 60) - 1e-9 && score > 1.0 / (rs + 60) - 1e-9)
    }
  }

  test("pca: centered, decorrelated, variance capture matches the declared EVR") {
    val rows = Similarity.pcaProject(spark, sf).collect()
    val nCorpus = graft.sources.Tables(spark, sf, "embeddings").count()
    assert(rows.length == nCorpus, "one projected row per vector")
    val pc1 = rows.map(_.getAs[Double]("pc1"))
    val pc2 = rows.map(_.getAs[Double]("pc2"))
    val n = rows.length.toDouble
    def mean(a: Array[Double]) = a.sum / a.length
    def variance(a: Array[Double]) = {
      val m = mean(a); a.map(x => (x - m) * (x - m)).sum / (a.length - 1)
    }
    val (v1, v2) = (variance(pc1), variance(pc2))
    // projections are centered (the μ·v shift) and variance-ordered
    assert(math.abs(mean(pc1)) < 1e-6 && math.abs(mean(pc2)) < 1e-6)
    assert(v1 >= v2 - 1e-9, "component variances must come out ordered")
    // decorrelated: principal axes are orthogonal in the data metric
    val (m1, m2) = (mean(pc1), mean(pc2))
    val cov12 = pc1.zip(pc2).map { case (a, b) => (a - m1) * (b - m2) }.sum / (n - 1)
    assert(math.abs(cov12) / math.sqrt(v1 * v2) < 1e-4,
      s"pc1/pc2 correlation ${cov12 / math.sqrt(v1 * v2)} must vanish")
    // the declared explained-variance ratios are the projection
    // variances over the total per-dimension variance of the corpus
    val embs = graft.sources.Tables(spark, sf, "embeddings").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val d = embs.head.length
    val totalVar = (0 until d).map { j =>
      variance(embs.map(_(j)))
    }.sum
    val (evr1, evr2) = (rows.head.getAs[Double]("evr1"), rows.head.getAs[Double]("evr2"))
    assert(math.abs(evr1 - v1 / totalVar) < 1e-4,
      s"evr1=$evr1 vs measured ${v1 / totalVar}")
    assert(math.abs(evr2 - v2 / totalVar) < 1e-4)
    assert(evr1 >= evr2 && evr1 + evr2 <= 1.0 + 1e-9)
  }

  test("silhouette: bounded in [-1,1], matches a direct centroid recompute") {
    val rows = Similarity.silhouetteByLabel(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, s) => assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9) }
    val vecs = graft.sources.Tables(spark, sf, "embeddings").collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1).map(_.toDouble).toArray))
    val cents = vecs.groupBy(_._1).view.mapValues { g =>
      val n = g.length
      g.map(_._2).transpose.map(_.sum / n).toArray
    }.toMap
    def dist(x: Array[Double], c: Array[Double]) =
      math.sqrt(math.max(x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, 0.0))
    rows.foreach { case (lbl, n, meanS) =>
      val mine = vecs.filter(_._1 == lbl)
      assert(mine.length == n)
      val direct = mine.map { case (_, x) =>
        val a = dist(x, cents(lbl))
        val b = cents.collect { case (l, c) if l != lbl => dist(x, c) }.min
        if (math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0
      }.sum / n
      assert(math.abs(meanS - direct) < 1e-4, s"label $lbl: $meanS vs $direct")
    }
  }

  test("calinski-harabasz: B + W equals the total squared deviation to the grand mean") {
    val r = Similarity.calinskiHarabasz(spark, sf).collect().head
    val vecs = graft.sources.Tables(spark, sf, "embeddings").collect()
      .map(x => (x.getInt(2), x.getSeq[Float](1).map(_.toDouble).toArray))
    val n = vecs.length
    assert(r.getAs[Long]("n_total") == n)
    assert(r.getAs[Int]("k_labels") == vecs.map(_._1).distinct.length)
    val g = vecs.map(_._2).transpose.map(_.sum / n).toArray
    val tss = vecs.map { case (_, x) =>
      x.zip(g).map { case (a, b) => (a - b) * (a - b) }.sum }.sum
    val b = r.getAs[Double]("b_ss"); val w = r.getAs[Double]("w_ss")
    assert(math.abs(b + w - tss) / tss < 1e-4, s"B+W=${b + w} vs TSS=$tss")
    val k = r.getAs[Int]("k_labels")
    val ch = (b / (k - 1)) / (w / (n - k))
    assert(math.abs(r.getAs[Double]("ch_index") - ch) < 1e-4)
  }
}
