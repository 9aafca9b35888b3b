package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Typed UDAF surface (SURVEY §2B, UDF/UDAF/UDTF row): a custom
  * `Aggregator[IN, BUF, OUT]` computing the spread (max − min) of a double
  * column. Deliberately chosen so the result is exact (no accumulation
  * order sensitivity) and therefore oracle-checkable as `MAX(x) − MIN(x)`.
  * Partial aggregation (merge) works across partitions like any built-in.
  */
object SpreadAggregator extends Aggregator[Double, (Double, Double), Double] {
  override def zero: (Double, Double) = (Double.PositiveInfinity, Double.NegativeInfinity)
  override def reduce(b: (Double, Double), a: Double): (Double, Double) =
    (math.min(b._1, a), math.max(b._2, a))
  override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
    (math.min(x._1, y._1), math.max(x._2, y._2))
  override def finish(b: (Double, Double)): Double =
    if (b._1 == Double.PositiveInfinity) 0.0 else b._2 - b._1
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Price spread per order status — the UDAF in an oracle query. */
  def priceSpreadByStatus(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        udaf(SpreadAggregator).apply(col("o_totalprice")).as("price_spread"),
        count(lit(1)).as("n"))
}
