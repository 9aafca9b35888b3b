package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
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

  /** Top-k orders per customer via the bounded aggregator — output
    * contract identical to `Relational.topOrdersPerCustomer`.
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val agg = new Aggregator[(Long, Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
      // best first: higher price, then lower orderkey (deterministic ties)
      private def better(a: (Double, Long), b: (Double, Long)): Boolean =
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
      private def cap(s: Seq[(Double, Long)]): Seq[(Double, Long)] = {
        val m = s.sortWith(better); if (m.size > k) m.take(k) else m
      }
      override def zero: Seq[(Double, Long)] = Seq.empty
      override def reduce(b: Seq[(Double, Long)], a: (Long, Double, Long)): Seq[(Double, Long)] =
        cap(b :+ ((a._2, a._3)))
      override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
        cap(x ++ y)
      override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
      override def bufferEncoder: Encoder[Seq[(Double, Long)]] = newProductSeqEncoder
      override def outputEncoder: Encoder[Seq[(Double, Long)]] = newProductSeqEncoder
    }
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("top"))
      .toDF("o_custkey", "top")
      .select(col("o_custkey"), posexplode(col("top")))
      .select(
        col("o_custkey"),
        col("col._2").as("o_orderkey"),
        col("col._1").as("o_totalprice"),
        (col("pos") + 1).cast("int").as("rn"))
  }
}
