package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Distribution-comparison verbs — the drift monitors a production
  * training pipeline runs between every data refresh: PSI (population
  * stability index) against a reference window, Jensen–Shannon
  * divergence between cohorts, and the chi-square independence test
  * over a contingency table. The reference engine has no statistics
  * surface at all (`/root/reference/src/pipeline.py` is a 9-operator
  * enrichment pipeline); these generalize its fan-engagement domain to
  * the monitoring tier every 100 TB corpus needs.
  *
  * Scale shape shared by all three: ONE scan builds integer counts
  * (map-side combined, output bounded by |labels|×|bins| — never
  * corpus-sized), and every derived probability/term is O(bins)
  * driver-free arithmetic on that tiny relation.
  *
  * Exactness contract (house rules, see [[Stats]]): counts are exact
  * integers; ratio/log terms are doubles mirrored expression-for-
  * expression in the oracle SQL; cross-bin TOTALS never sum raw
  * doubles (engine-dependent order) — each term is rounded to 9
  * decimals, cast to DECIMAL(38,9), summed exactly, and only then
  * surfaced as a rounded double.
  */
object Drift {

  /** Exact cross-engine total of per-bin double terms: round-9 →
    * exact decimal sum → double → round-6. Addition in DECIMAL is
    * associative, so the shuffle/combine order Spark picks cannot
    * change the bits, and the oracle's sequential sum agrees.
    */
  private def termTotal(term: Column): Column =
    round(sum(round(term, 9).cast(DecimalType(38, 9))).cast("double"), 6)

  /** PSI of the `value` distribution per event type: reference = the
    * first half of the log's time range, current = the second half
    * (the before/after split a scheduled refresh compares). Ten
    * equi-width bins from the REFERENCE side's per-type min/max (one
    * broadcast |types|-row relation); current-side values outside the
    * reference range clamp into the edge bins, as a production PSI
    * must (new mass beyond the historical range is exactly what it
    * should flag). Laplace-smoothed probabilities
    * `(c+1)/(n+bins)` keep empty bins finite. PSI ≥ 0.2 is the
    * conventional "investigate" threshold.
    *
    * The time midpoint is exact: epoch micros are integers < 2^53, so
    * `floor((mn+mx)/2)` computes the same long on both engines.
    */
  def psiDrift(spark: SparkSession, dir: String, bins: Int = 10): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
    val mid = ev.agg(floor((min(col("us")) + max(col("us"))) / 2).cast("long").as("mid"))
    val sided = ev.crossJoin(broadcast(mid))
      .withColumn("is_ref", col("us") < col("mid"))
    // reference-side bin edges per type (|types| rows, broadcast)
    val edges = sided.filter(col("is_ref")).groupBy(col("event_type"))
      .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    val binned = sided.join(broadcast(edges), Seq("event_type"))
      // clamp BOTH ends: current values may fall outside the reference
      // range; constant reference (vmax == vmin) degenerates to bin 0
      .withColumn("bin",
        when(col("vmax") === col("vmin"), lit(0)).otherwise(
          greatest(least(floor((col("value") - col("vmin")) * bins / (col("vmax") - col("vmin"))),
            lit(bins - 1)), lit(0))).cast("int"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(when(col("is_ref"), 1)).as("c_ref"),
        count(when(!col("is_ref"), 1)).as("c_cur"))
    // full |types| × bins grid so empty bins still contribute their
    // smoothed term (the grid is tiny: built from the edges relation)
    val grid = edges.select(col("event_type"),
      explode(sequence(lit(0), lit(bins - 1))).as("bin"))
    val cells = grid.join(binned, Seq("event_type", "bin"), "left")
      .na.fill(0L, Seq("c_ref", "c_cur"))
    val totals = cells.groupBy(col("event_type"))
      .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
    val withP = cells.join(broadcast(totals), Seq("event_type"))
      .withColumn("p_ref", (col("c_ref") + 1).cast("double") / (col("n_ref") + bins))
      .withColumn("p_cur", (col("c_cur") + 1).cast("double") / (col("n_cur") + bins))
      .withColumn("term", (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
    withP.groupBy(col("event_type"))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        termTotal(col("term")).as("psi"))
  }

  /** Jensen–Shannon divergence (nats) between the two deterministic
    * experiment arms' event-type distributions (arm A = even
    * `user_id`, the same persisted assignment [[Stats.welchTTest]]
    * uses). JSD is the symmetric, always-finite cousin of KL — the
    * number a mixture-monitoring job alerts on. Zero-count types are
    * kept (a type one arm never fires IS divergence signal); the
    * `x·ln(x/m)` term uses the `x → 0 ⇒ 0` limit, and `m > 0` holds
    * whenever the type appears in either arm.
    */
  def jsDivergence(spark: SparkSession, dir: String): DataFrame = {
    val byArm = Tables(spark, dir, "events")
      .select(col("event_type"), (pmod(col("user_id"), lit(2)) === 0).as("arm_a"))
      .groupBy(col("event_type"))
      .agg(count(when(col("arm_a"), 1)).as("c_a"),
        count(when(!col("arm_a"), 1)).as("c_b"))
    val tot = byArm.agg(
      sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"),
      count(lit(1)).as("n_types"))
    val terms = byArm.crossJoin(broadcast(tot))
      .withColumn("p", col("c_a").cast("double") / col("n_a"))
      .withColumn("q", col("c_b").cast("double") / col("n_b"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("term",
        when(col("p") > 0, col("p") * log(col("p") / col("m")) / 2).otherwise(0d) +
          when(col("q") > 0, col("q") * log(col("q") / col("m")) / 2).otherwise(0d))
    terms.groupBy(col("n_a"), col("n_b"), col("n_types"))
      .agg(termTotal(col("term")).as("jsd_nats"))
      .select(col("n_a"), col("n_b"), col("n_types"), col("jsd_nats"))
  }

  /** Chi-square test of independence over the corpus's language ×
    * source contingency table — the significance companion of
    * [[Stats.langSourceCrosstab]]: is the language mix the same
    * across ingestion sources? Observed counts come from one grouped
    * aggregate; expected counts `row·col/N` derive from the broadcast
    * marginals; absent (lang, source) cells enter with observed 0 via
    * the marginals' cross-join grid, as the test requires. No
    * logarithms anywhere — every term is ratio/square arithmetic on
    * exact integers, so the oracle mirrors bit-for-bit.
    */
  def chi2Independence(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val obs = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
    val rowT = docs.groupBy(col("lang")).agg(count(lit(1)).as("rl"))
    val colT = docs.groupBy(col("source")).agg(count(lit(1)).as("cl"))
    val n = docs.agg(count(lit(1)).as("n"))
    val grid = rowT.crossJoin(broadcast(colT)).crossJoin(broadcast(n))
      .join(obs, Seq("lang", "source"), "left")
      .na.fill(0L, Seq("o"))
      // e > 0 always: the grid only spans languages/sources that occur
      .withColumn("e",
        col("rl").cast("double") * col("cl").cast("double") / col("n").cast("double"))
      .withColumn("term",
        (col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e")) / col("e"))
    val dims = grid.agg(
      max(col("n")).as("n"),
      count_distinct(col("lang")).as("n_lang"),
      count_distinct(col("source")).as("n_source"),
      termTotal(col("term")).as("chi2"))
    dims.select(col("n"), col("n_lang"), col("n_source"),
      ((col("n_lang") - 1) * (col("n_source") - 1)).as("df"), col("chi2"))
  }

  /** CRAMER'S V — the chi-square statistic normalized to an
    * effect-size in [0,1] (`V = sqrt(chi2 / (n * min(r-1, c-1)))`),
    * the association strength a drift dashboard actually thresholds on
    * (chi2 itself grows with n, V does not). Pure composition on
    * [[chi2Independence]]'s exact-contract output: sqrt is correctly
    * rounded IEEE on both engines, so one more mirrored expression
    * keeps the hash-match.
    */
  def cramersV(spark: SparkSession, dir: String): DataFrame = {
    val k = least(col("n_lang") - 1, col("n_source") - 1).cast("double")
    chi2Independence(spark, dir)
      .select(col("n"), col("n_lang"), col("n_source"), col("chi2"),
        round(when(k > 0, sqrt(col("chi2") / (col("n").cast("double") * k))), 6)
          .as("cramers_v"))
  }
}
