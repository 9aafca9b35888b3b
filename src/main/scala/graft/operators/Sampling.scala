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

  /** Target-mixture resampling — the domain/language-balance control a
    * pretraining pipeline applies before packing: given target corpus
    * shares per class (here `lang`: en 5/10, es 3/10, rest 2/10),
    * compute each class's deterministic keep-rate so the SAMPLED corpus
    * approaches the target mixture, capped at keeping everything (a
    * class below its target can't be upsampled by a filter — the cap is
    * the honest behavior, not silent duplication).
    *
    * Two passes, both cheap: (1) per-class counts — one map-side-combined
    * aggregate, |classes| rows; the class total via an unbounded window
    * over those few rows (no 1-row crossJoin needed); (2) the keep filter
    * itself — the same md5-bucket contract as [[stratifiedEvents]] /
    * `deterministicSplit`, so the sample is reproducible across
    * partitionings and engines. Threshold arithmetic stays in LONGs
    * (rate = num·total·10000 ÷ den·n_class, floor) so DuckDB computes
    * bit-identical thresholds — no double rounding at the boundary.
    */
  def mixtureResample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = Tables(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      .withColumn("total", sum(col("n_lang")).over(w))
      .withColumn("thr", least(lit(10000L),
        expr("(CASE lang WHEN 'en' THEN 5 WHEN 'es' THEN 3 ELSE 2 END)" +
          " * total * 10000 DIV (10 * n_lang)")))
      .select(col("lang"), col("thr"))
    Tables(spark, dir, "documents")
      .join(broadcast(rates), Seq("lang"))
      .filter(graft.functions.GraftFunctions.md5Bucket(col("doc_id")) < col("thr"))
      .select(col("doc_id"), col("lang"), col("thr"))
  }

  /** Fixed-SIZE deterministic sample per group (the complement of the
    * fraction-based samplers above): exactly min(n, |group|) documents
    * per language, chosen by md5-hash rank — a reproducible "reservoir"
    * whose membership is a pure function of the keys, independent of
    * partitioning, cluster size, or engine (the oracle draws the
    * identical sample). The eval-set / human-review draw verb.
    *
    * Scale: rank-by-hash is a window top-k, so WindowGroupLimit pushes
    * the per-group limit below the shuffle — each map task forwards at
    * most n rows per group it sees, and no group's full row set is ever
    * sorted in one task.
    */
  def groupSample(spark: SparkSession, dir: String, n: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")).asc, col("doc_id").asc)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("draw_rank", row_number().over(w))
      .filter(col("draw_rank") <= n)
  }
}
