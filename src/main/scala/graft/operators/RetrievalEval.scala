package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Retrieval-quality EVALUATION — recall@k, MRR, and nDCG@k per query,
  * the scoreboard every ANN/dedup/search change is judged by before it
  * ships. Generic over any (query_id, doc_id, rank) result set and any
  * (query_id, doc_id) relevance set, so it scores the engine's own LSH
  * / IVF / PQ retrievers against brute-force truth (SimilaritySpec
  * does) as readily as the portable fixture the oracle gate replays.
  *
  * Shape at 100 TB: one equi-join of results against truth on
  * (query_id, doc_id) and two aggregations keyed by query_id — fully
  * distributed, cost ∝ |results| + |truth|, no per-query driver work.
  * The nDCG normalizer is computed per query from its relevant count
  * with a bounded k-term fold, not a second pass over data.
  *
  * Cross-engine determinism (the gate hash-compares against DuckDB):
  * every summed DCG/IDCG term is rounded to 9 decimals and accumulated
  * as DECIMAL(20,9) — bit-exact under any fold order — and final
  * metrics are rounded to 6 (the house double-totals contract).
  */
object RetrievalEval {

  private val K = 10

  private def dcgTerm(rank: Column): Column =
    round(lit(1.0) / log2(rank + lit(1)), 9).cast("decimal(20,9)")

  /** Per-query metrics: `results` carries (query_id, doc_id, rank),
    * `truth` the relevant (query_id, doc_id) pairs. Queries absent from
    * `truth` score 0 across the board (never a divide-by-zero — ANSI).
    */
  def metrics(results: DataFrame, truth: DataFrame, k: Int = K): DataFrame = {
    val rel = truth.select(col("query_id"), col("doc_id"), lit(1).as("is_rel"))
    val nRel = rel.groupBy(col("query_id"))
      .agg(sum(col("is_rel")).cast("long").as("n_rel"))
    val top = results.filter(col("rank") <= k)
      .join(rel, Seq("query_id", "doc_id"), "left")
      .withColumn("is_rel", coalesce(col("is_rel"), lit(0)))
    val perQuery = top.groupBy(col("query_id")).agg(
      sum(col("is_rel")).cast("long").as("hits"),
      min(when(col("is_rel") === 1, col("rank"))).as("first_rel"),
      sum(when(col("is_rel") === 1, dcgTerm(col("rank")))
        .otherwise(lit(0).cast("decimal(20,9)"))).cast("double").as("dcg"))
    val idcg = aggregate(
      sequence(lit(1), least(col("n_rel"), lit(k)).cast("int")),
      lit(0).cast("decimal(20,9)"),
      (acc, i) => (acc + dcgTerm(i)).cast("decimal(20,9)")).cast("double")
    perQuery.join(nRel, Seq("query_id"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .select(
        col("query_id"), col("n_rel"),
        round(when(col("n_rel") > 0,
          col("hits").cast("double") / col("n_rel")).otherwise(0.0), 6)
          .as(s"recall_at_$k"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6).as("mrr"),
        round(when(col("n_rel") > 0, col("dcg") / idcg).otherwise(0.0), 6)
          .as(s"ndcg_at_$k"))
  }

  /** Classifier-threshold calibration: precision / recall / F1 at a
    * grid of K score thresholds — the sweep that picks a quality
    * filter's operating point before it gates a corpus. One explode
    * (K rows per scored doc) + one grouped aggregation; fully
    * distributed, cost ∝ K·|docs|. ANSI-guarded: empty predicted or
    * relevant sets give 0.0, never a divide error.
    */
  def prCurve(scored: DataFrame, k: Int = 9): DataFrame = {
    val denomGuard = (num: Column, den: Column) =>
      round(when(den > 0, num.cast("double") / den).otherwise(0.0), 6)
    val g = scored
      .select(col("score"), col("label"),
        explode(sequence(lit(1), lit(k))).as("t"))
      .withColumn("thr", col("t").cast("double") / (k + 1))
      .groupBy(col("t"), col("thr"))
      .agg(
        sum(when(col("score") >= col("thr") && col("label") === 1, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("score") >= col("thr") && col("label") === 0, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("score") < col("thr") && col("label") === 1, 1L)
          .otherwise(0L)).as("fn"))
    val p = denomGuard(col("tp"), col("tp") + col("fp"))
    val r = denomGuard(col("tp"), col("tp") + col("fn"))
    // `prec`/`rec`, not precision/recall: PRECISION is a type keyword
    // in the oracle engine
    g.select(col("t"), round(col("thr"), 6).as("thr"),
        col("tp"), col("fp"), col("fn"),
        p.as("prec"), r.as("rec"))
      .withColumn("f1",
        round(when(col("prec") + col("rec") > 0,
          lit(2.0) * col("prec") * col("rec") /
            (col("prec") + col("rec"))).otherwise(0.0), 6))
  }

  /** ISOTONIC (PAV) CALIBRATION — turn a quality classifier's raw
    * scores into honest probabilities (Zadrozny & Elkan 2002; the
    * standard calibration next to Platt scaling): bin the scored corpus
    * into fixed-width score bins (one distributed aggregation — the
    * bounded-model contract: ≤ `bins` rows to the driver), then run
    * pool-adjacent-violators over the bins so the calibrated positive
    * rate is monotone in score. PAV's pooling comparisons run in EXACT
    * integer cross-multiplication; each block's rate is ONE correctly-
    * rounded division — and since IEEE division is correctly rounded
    * and rounding is monotone, the DuckDB oracle can pin the SAME bits
    * through the max-min characterization (calibrated_i = max_{j≤i}
    * min_{k≥i} pooled-rate(j,k)) without replaying the sequential
    * algorithm: both spellings select the identical block-rate double.
    */
  def isotonicCalibration(spark: SparkSession, dir: String, bins: Int = 50): DataFrame = {
    val binned = Tables(spark, dir, "documents").select(
        least(length(col("text")).cast("double") / lit(1000.0), lit(1.0)).as("score"),
        when(graft.functions.GraftFunctions.md5Bucket(
          concat(lit("lbl_"), col("doc_id").cast("string")), 3) === 0, 1L)
          .otherwise(0L).as("label"))
      .withColumn("bin", least(floor(col("score") * bins), lit(bins - 1)).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("label")).as("pos"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // PAV: (firstIdx, n, pos) blocks; violation = prevRate > curRate,
    // compared exactly as prevPos·curN > curPos·prevN
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    binned.zipWithIndex.foreach { case ((_, n, pos), i) =>
      blocks += ((i, n, pos))
      while (blocks.length > 1 && {
        val (_, n1, p1) = blocks(blocks.length - 2)
        val (_, n2, p2) = blocks.last
        p1 * n2 > p2 * n1
      }) {
        val (s1, n1, p1) = blocks.remove(blocks.length - 2)
        val (_, n2, p2) = blocks.last
        blocks(blocks.length - 1) = (s1, n1 + n2, p1 + p2)
      }
    }
    val cal = new Array[Double](binned.length)
    blocks.zipWithIndex.foreach { case ((start, n, pos), bi) =>
      val end = if (bi + 1 < blocks.length) blocks(bi + 1)._1 else binned.length
      val rate = pos.toDouble / n.toDouble
      (start until end).foreach(cal(_) = rate)
    }
    import spark.implicits._
    // HALF_UP, matching both engines' ROUND on positive values (rint's
    // half-even would diverge exactly at a .5e-6 boundary)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    binned.zipWithIndex.map { case ((bin, n, pos), i) =>
      (bin, n, pos, r6(pos.toDouble / n.toDouble), r6(cal(i)))
    }.toSeq.toDF("bin", "n", "pos", "raw_rate", "calibrated")
  }

  /** The prCurve fixture: a real quality signal (length-saturating
    * score — the shortest docs score lowest, the shape every
    * length-based quality filter has) against portable md5 labels, so
    * both the sweep math AND the operating points are oracle-pinned.
    */
  def prCurveFixture(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables(spark, dir, "documents").select(
      least(length(col("text")).cast("double") / lit(1000.0), lit(1.0)).as("score"),
      when(graft.functions.GraftFunctions.md5Bucket(
        concat(lit("lbl_"), col("doc_id").cast("string")), 3) === 0, 1)
        .otherwise(0).as("label"))
    prCurve(scored)
  }

  /** The oracle-gated fixture: a deterministic retrieval run over the
    * corpus — queries are the %97 doc slice, the candidate pool the %9
    * slice, scores and relevance labels derive from the portable md5
    * contract (same arithmetic in DuckDB), so BOTH the ranking and the
    * metric math are pinned end-to-end. The query set is bounded by
    * construction (an eval set, like decontamination's), so the
    * broadcast cross-score is |candidates| × |queries| with the tiny
    * side broadcast — never a data×data cartesian.
    */
  def evalFixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"))
    val queries = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("query_id"))
    val cands = docs.filter(col("doc_id") % 9 === 0)
    val pairs = cands.crossJoin(broadcast(queries))
      .withColumn("score", graft.functions.GraftFunctions.md5Bucket(
        concat(col("query_id").cast("string"), lit("_"),
          col("doc_id").cast("string")), 1000000))
    val ranked = pairs.withColumn("rank",
      row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))))
    val truth = pairs.filter(graft.functions.GraftFunctions.md5Bucket(
        concat(lit("rel_"), col("query_id").cast("string"), lit("_"),
          col("doc_id").cast("string")), 7) === 0)
      .select(col("query_id"), col("doc_id"))
    metrics(ranked.select(col("query_id"), col("doc_id"), col("rank")), truth)
  }
}
