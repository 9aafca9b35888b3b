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

  /** Weight-proportional deterministic sample (Efraimidis–Spirakis
    * A-Res): per language, the `n` documents maximizing `ln(u) / w`
    * where `u` is the md5-hash uniform and `w` the token count — a
    * without-replacement draw where P(selected) ∝ weight, so quality- or
    * length-weighted training mixtures are reproducible instead of
    * `rand()`-dependent. Same engine-independence contract as
    * [[groupSample]] (`u` from [[graft.functions.GraftFunctions.md5Bucket]],
    * the shared hash arithmetic the oracle replicates); same scale shape
    * (one narrow pass, `WindowGroupLimit` keeps only `n` rows per
    * partition below the shuffle). The key is rounded to 6 dp in the
    * OUTPUT only — ranking uses the raw double, where the libm `ln`
    * difference between engines is ~1 ulp, far below any realistic
    * key gap.
    */
  def weightedSample(spark: SparkSession, dir: String, n: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(col("w") > 0)
    val u = (graft.functions.GraftFunctions.md5Bucket(col("doc_id"), 1000000)
      .cast("double") + 1) / lit(1000001.0)
    val key = log(u) / col("w")
    val win = Window.partitionBy(col("lang")).orderBy(key.desc, col("doc_id").asc)
    d.withColumn("draw_key", round(key, 6))
      .withColumn("draw_rank", row_number().over(win))
      .filter(col("draw_rank") <= n)
      .select(col("doc_id"), col("lang"), col("w"), col("draw_key"), col("draw_rank"))
  }

  /** Deterministic epoch shuffle: a reproducible global training-order
    * permutation of the corpus — every engine, partitioning, and retry
    * derives the SAME order for a given seed, and the next epoch is just
    * a new seed. The permutation key is md5(seed:doc_id); the global
    * position materializes WITHOUT a single-partition row_number: the
    * key's first two hex chars split the key space into 256 ordered
    * range buckets (uniform by construction), each bucket ranks locally
    * under its own partitioning, and a 256-row running sum of bucket
    * sizes (broadcast back) lifts local ranks to global positions — the
    * same two-phase prefix-sum shape as `TextAnalysis.packedOffsets`.
    */
  def epochShuffle(spark: SparkSession, dir: String, seed: String = "epoch8"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        md5(concat(lit(seed + ":"), col("doc_id").cast("string")).cast("binary")).as("k"))
      .withColumn("bucket", substring(col("k"), 1, 2))
    val localW = Window.partitionBy(col("bucket")).orderBy(col("k"), col("doc_id"))
    val within = keyed.withColumn("local_rank", row_number().over(localW).cast("long") - 1)
    val baseW = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val bases = keyed.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .withColumn("base", coalesce(sum(col("n")).over(baseW), lit(0L)))
      .select(col("bucket"), col("base"))
    within.join(broadcast(bases), Seq("bucket"))
      .select(col("doc_id"), col("k"), (col("base") + col("local_rank")).as("pos"))
  }
}
