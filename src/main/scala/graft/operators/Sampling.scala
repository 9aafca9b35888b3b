package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic sampling operators (SURVEY §2B, training-data family).
  *
  * Hash-based, not `df.sample`: the keep/drop decision is a pure
  * function of the row's key, so the sample is reproducible across
  * partitionings, cluster sizes, retries, and engines (the DuckDB
  * oracle computes the identical sample). At any scale this is a
  * map-side filter — zero shuffles, and the filter sits directly on the
  * scan.
  */
object Sampling {

  /** Stratified (per-class) downsampling: abundant classes keep a small
    * deterministic fraction, rare classes keep everything — the class
    * rebalancing step before training on heavily skewed event logs.
    * Rates: clicks 10%, views 5%, everything else (rare conversions)
    * 100%.
    */
  def stratifiedEvents(spark: SparkSession, dir: String): DataFrame = {
    val threshold = when(col("event_type") === "click", 1000)
      .when(col("event_type") === "view", 500)
      .otherwise(10000)
    Tables(spark, dir, "events")
      .filter(graft.functions.GraftFunctions.md5Bucket(col("event_id")) < threshold)
      .select(col("event_id"), col("event_type"), col("user_id"))
  }
}
