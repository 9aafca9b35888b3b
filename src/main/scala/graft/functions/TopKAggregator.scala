package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bounded top-k per group as a typed `Aggregator`: the buffer holds at
  * most k (score, id) pairs and merges associatively.
  *
  * This is the scale-correct alternative to the window-function top-k
  * (`Relational.topOrdersPerCustomer`): a window materializes and sorts
  * EVERY group's full row set; this keeps O(k) state per group with
  * map-side partial aggregation, so a group with 10⁹ rows costs the same
  * shuffle bytes as a group with 10. Same results — it shares the window
  * query's DuckDB oracle.
  */
object TopKAggregator {

  /** The shared bounded top-k aggregator over (key, score, id) triples —
    * best-k by (score desc, id asc). One implementation serves both the
    * orders query below and the ANN self-join tail
    * (`Similarity.boundedTopK`), so comparator/encoder fixes can't
    * drift between call sites.
    *
    * The comparator is a NaN-aware TOTAL order matching Spark's own sort
    * order (NaN sorts largest; -0.0 normalized to 0.0) — the property
    * that keeps the aggregate row-identical to a `row_number` window on
    * degenerate scores (a NaN cosine from a zero-norm embedding must
    * rank first in both formulations, and `sortWith` needs
    * transitivity to be meaningful at all).
    */
  private[graft] def topK(k: Int): Aggregator[(Long, Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] =
    new Aggregator[(Long, Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
      private def norm(x: Double): Double = if (x == 0.0) 0.0 else x
      private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
        val c = java.lang.Double.compare(norm(a._1), norm(b._1))
        c > 0 || (c == 0 && a._2 < b._2)
      }
      private def cap(s: Seq[(Double, Long)]): Seq[(Double, Long)] = {
        val m = s.sortWith(better); if (m.size > k) m.take(k) else m
      }
      override def zero: Seq[(Double, Long)] = Seq.empty
      override def reduce(b: Seq[(Double, Long)], a: (Long, Double, Long)): Seq[(Double, Long)] = {
        val cand = (a._2, a._3)
        // full buffer + candidate not better than the current worst →
        // no re-sort; the common case once a group warms up
        if (b.size >= k && !better(cand, b.last)) b else cap(b :+ cand)
      }
      override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
        cap(x ++ y)
      override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
      override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
        ExpressionEncoder[Seq[(Double, Long)]]()
      override def outputEncoder: Encoder[Seq[(Double, Long)]] =
        ExpressionEncoder[Seq[(Double, Long)]]()
    }

  /** Top-k orders per customer via the bounded aggregator — output
    * contract identical to `Relational.topOrdersPerCustomer`.
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(topK(k).toColumn.name("top"))
      .toDF("o_custkey", "top")
      .select(col("o_custkey"), posexplode(col("top")))
      .select(
        col("o_custkey"),
        col("col._2").as("o_orderkey"),
        col("col._1").as("o_totalprice"),
        (col("pos") + 1).cast("int").as("rn"))
  }
}
