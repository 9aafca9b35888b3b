package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RetrievalEval, Similarity}

/** recall@k / MRR / nDCG@k metric math, pinned against hand-computed
  * values on a tiny known case, edge shapes (no relevant, all
  * relevant, relevant outside top-k), and an integration run scoring
  * the engine's own LSH retriever against brute-force truth.
  */
class RetrievalEvalSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def mk(rows: Seq[(Long, Long, Int)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("query_id", "doc_id", "rank")
  }
  private def truthOf(rows: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("query_id", "doc_id")
  }

  test("hand-computed case: relevant at ranks 1 and 3 of 5, n_rel=4") {
    // recall@10 = 2/4; MRR = 1/1; DCG = 1/log2(2) + 1/log2(4) = 1.5
    // IDCG(min(4,10)) = 1 + 1/log2(3) + 0.5 + 1/log2(5)
    val results = mk((1 to 5).map(r => (7L, 100L + r, r)))
    val truth = truthOf(Seq((7L, 101L), (7L, 103L), (7L, 900L), (7L, 901L)))
    val m = RetrievalEval.metrics(results, truth).collect().head
    assert(m.getAs[Long]("n_rel") == 4L)
    assert(m.getAs[Double]("recall_at_10") == 0.5)
    assert(m.getAs[Double]("mrr") == 1.0)
    val idcg = 1.0 + 1.0 / math.log(3) * math.log(2) + 0.5 + 1.0 / (math.log(5) / math.log(2))
    val expected = BigDecimal(1.5 / idcg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(m.getAs[Double]("ndcg_at_10") - expected) < 2e-6,
      s"ndcg ${m.getAs[Double]("ndcg_at_10")} vs $expected")
  }

  test("perfect ranking scores 1.0 across the board") {
    val results = mk((1 to 3).map(r => (1L, r.toLong, r)))
    val truth = truthOf(Seq((1L, 1L), (1L, 2L), (1L, 3L)))
    val m = RetrievalEval.metrics(results, truth).collect().head
    assert(m.getAs[Double]("recall_at_10") == 1.0)
    assert(m.getAs[Double]("mrr") == 1.0)
    assert(m.getAs[Double]("ndcg_at_10") == 1.0)
  }

  test("no relevant docs: all metrics 0, no divide-by-zero under ANSI") {
    val results = mk(Seq((1L, 10L, 1), (1L, 11L, 2)))
    val m = RetrievalEval.metrics(results, truthOf(Nil)).collect().head
    assert(m.getAs[Long]("n_rel") == 0L)
    assert(m.getAs[Double]("recall_at_10") == 0.0)
    assert(m.getAs[Double]("mrr") == 0.0)
    assert(m.getAs[Double]("ndcg_at_10") == 0.0)
  }

  test("relevant docs ranked outside top-k count for n_rel but score 0") {
    val results = mk((1 to 15).map(r => (1L, 100L + r, r)))
    val truth = truthOf(Seq((1L, 112L), (1L, 114L))) // ranks 12 and 14
    val m = RetrievalEval.metrics(results, truth).collect().head
    assert(m.getAs[Long]("n_rel") == 2L)
    assert(m.getAs[Double]("recall_at_10") == 0.0)
    assert(m.getAs[Double]("mrr") == 0.0)
    assert(m.getAs[Double]("ndcg_at_10") == 0.0)
  }

  test("scores the LSH retriever against brute-force truth end-to-end") {
    val k = 5
    val truth = Similarity.knnBrute(spark, dir, nQueries = 10, k = k)
      .select(col("q_id").as("query_id"), col("neighbor_id").as("doc_id"))
    val results = Similarity.annCosine(spark, dir, nQueries = 10, k = k)
      .select(col("q_id").as("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val m = RetrievalEval.metrics(results, truth, k = k)
    import org.apache.spark.sql.functions.avg
    val mean = m.agg(avg(col(s"recall_at_$k"))).collect().head.getDouble(0)
    // the LSH recall pin lives in SimilaritySpec; here we pin that the
    // eval operator agrees with it directionally on real output
    assert(mean > 0.5, s"mean recall@$k of the LSH retriever came out $mean")
    assert(m.count() == 10)
  }

  test("prCurve: hand-computed operating points on a tiny scored set") {
    val s = spark
    import s.implicits._
    // scores 0.05..0.95; labels: top half positive
    val scored = (1 to 10).map(i => (i / 10.0 - 0.05, if (i > 5) 1 else 0))
      .toDF("score", "label")
    val m = RetrievalEval.prCurve(scored).collect()
      .map(r => r.getAs[Int]("t") -> r).toMap
    // t=5 → thr 0.5: predicted = scores ≥ 0.5 = {0.55..0.95} = 5 docs, all positive
    assert(m(5).getAs[Long]("tp") == 5 && m(5).getAs[Long]("fp") == 0)
    assert(m(5).getAs[Double]("prec") == 1.0 && m(5).getAs[Double]("rec") == 1.0)
    assert(m(5).getAs[Double]("f1") == 1.0)
    // t=1 → thr 0.1: predicted = 9 docs (all but 0.05), tp=5, fp=4
    assert(m(1).getAs[Long]("tp") == 5 && m(1).getAs[Long]("fp") == 4)
    assert(m(1).getAs[Double]("prec") == math.rint(5.0 / 9 * 1e6) / 1e6)
    // t=9 → thr 0.9: predicted = {0.95}, tp=1, fn=4 → recall 0.2
    assert(m(9).getAs[Long]("tp") == 1 && m(9).getAs[Long]("fn") == 4)
    assert(m(9).getAs[Double]("rec") == 0.2)
    // recall is monotonically non-increasing in the threshold
    val recs = (1 to 9).map(t => m(t).getAs[Double]("rec"))
    assert(recs.sliding(2).forall { case Seq(a, b) => b <= a })
  }

  test("prCurve: all-negative labels give zero metrics without ANSI errors") {
    val s = spark
    import s.implicits._
    val scored = (1 to 5).map(i => (i / 10.0, 0)).toDF("score", "label")
    val rows = RetrievalEval.prCurve(scored).collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      assert(r.getAs[Double]("rec") == 0.0 && r.getAs[Double]("f1") == 0.0)
    }
  }

  test("fixture query is deterministic across invocations") {
    val a = RetrievalEval.evalFixture(spark, dir).collect().map(_.toString).sorted.toSeq
    val b = RetrievalEval.evalFixture(spark, dir).collect().map(_.toString).sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
