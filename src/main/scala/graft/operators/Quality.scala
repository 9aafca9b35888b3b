package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Data-contract verification for production pipelines — the ASSERT tier
  * above [[Relational.columnProfile]]'s DESCRIBE tier. A training-data
  * pipeline at 100 TB cannot afford one scan per check (the Deequ model:
  * fuse every metric a constraint suite needs into one aggregation pass),
  * and cannot afford a second scan for observability either (the Spark
  * `Observation` model: metrics ride the job that writes the data).
  * Both verbs here follow those models.
  */
object Quality {

  /** One-pass constraint suite over `orders` + a referential-integrity
    * check against `customer`. Every single-table metric — row count,
    * completeness, uniqueness, value range, set membership, pattern
    * conformance — fuses into ONE hash aggregate over one scan
    * (map-side-combined partials; the scan cost is paid once no matter
    * how many constraints the suite holds). Referential integrity is the
    * one constraint that genuinely needs a second relation: a LEFT ANTI
    * join against the distinct foreign keys, which Catalyst plans as a
    * broadcast anti-join when the key side is small and a shuffled one
    * otherwise — never a driver collect.
    *
    * Output is one row per constraint: (constraint, observed, threshold,
    * passed) — the shape a data-contract gate consumes ("fail the
    * pipeline if any `passed` is false").
    */
  def constraintSuite(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")

    // every single-table metric in one aggregate pass
    val m = orders.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
      countDistinct(col("o_orderkey")).as("nd_orderkey"),
      min(col("o_totalprice")).cast("double").as("min_price"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L).otherwise(1L))
        .as("bad_status"),
      sum(when(col("o_orderpriority").rlike("^[1-5]-"), 0L).otherwise(1L))
        .as("bad_priority"))

    // the RI metric: orders whose o_custkey has no customer row
    val orphans = orders.select(col("o_custkey"))
      .join(customer.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_orphans"))

    def c(name: String, observed: org.apache.spark.sql.Column,
        threshold: Double, passed: org.apache.spark.sql.Column) =
      struct(lit(name).as("check_name"),
        observed.cast("double").as("observed"),
        lit(threshold).as("threshold"),
        passed.as("passed"))

    // two independent one-row aggregates, unioned — no join of any kind
    m.select(explode(array(
        c("size_min", col("n_rows"), 1.0, col("n_rows") >= 1L),
        c("complete_custkey", lit(1.0) - col("null_custkey") / col("n_rows"),
          1.0, col("null_custkey") === 0L),
        c("unique_orderkey", col("nd_orderkey") / col("n_rows"),
          1.0, col("nd_orderkey") === col("n_rows")),
        c("min_totalprice", col("min_price"), 0.0, col("min_price") >= 0.0),
        c("status_domain", col("bad_status"), 0.0, col("bad_status") === 0L),
        c("priority_pattern", col("bad_priority"), 0.0,
          col("bad_priority") === 0L))).as("r"))
      .select(col("r.*"))
      .unionByName(orphans.select(
        c("ref_integrity_custkey", col("n_orphans"), 0.0,
          col("n_orphans") === 0L).as("r")).select(col("r.*")))
  }

  /** Pipeline-embedded metrics via `Dataset.observe`: the revenue
    * pipeline (filter → project → write) carries an [[Observation]]
    * whose aggregates are computed BY the write job itself — rows
    * observed, revenue total, null-discount count all materialize with
    * zero extra scans or shuffles, exactly how a production job reports
    * row-level health without a second pass over 100 TB. The observed
    * map then becomes the one-row result (`createDataFrame` of metrics
    * already on the driver — not a collect of data rows).
    *
    * The observed aggregates are deterministic (sums over a decimal
    * column and exact counts), so the row hash-matches a DuckDB oracle
    * computing the same aggregates directly.
    */
  /** K-ANONYMITY screening with a generalization ladder — the
    * release-governance gate for corpus metadata: every document's
    * quasi-identifier tuple (lang, source, length bucket) must be
    * shared by ≥ k documents before metadata can ship with the text.
    * Rows failing at the fine bucket (100 chars) GENERALIZE to the
    * coarse one (500) and re-form equivalence classes among themselves
    * (the standard ladder: a generalized row's anonymity set is the
    * other rows generalized with it); rows still under k are marked
    * for suppression. Two window counts over the same partitioning
    * family — no self-joins, no collect; at 100 TB this is two
    * shuffles keyed on low-cardinality quasi-identifier tuples, with
    * skew handled by the same salting toolkit as any hot-key aggregate.
    */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .withColumn("b_fine", expr("n_chars DIV 100 * 100"))
      .withColumn("b_coarse", expr("n_chars DIV 500 * 500"))
    val fine = docs.withColumn("n_fine",
      count(lit(1)).over(Window.partitionBy(col("lang"), col("source"), col("b_fine"))))
    val coarse = fine.withColumn("n_coarse",
      count(when(col("n_fine") < k, 1)).over(
        Window.partitionBy(col("lang"), col("source"), col("b_coarse"))))
    coarse.select(col("doc_id"), col("lang"), col("source"),
      when(col("n_fine") >= k, lit(1))
        .when(col("n_coarse") >= k, lit(2))
        .otherwise(lit(0)).as("level"),
      when(col("n_fine") >= k, col("n_fine"))
        .otherwise(col("n_coarse")).cast("long").as("set_size"))
  }

  def observedPipeline(spark: SparkSession, dir: String): DataFrame = {
    val obs = Observation()
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.time.LocalDateTime.of(1995, 1, 1, 0, 0)))
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(12,2)")))
          .cast("decimal(18,4)").as("rev"),
        col("l_discount"))
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("rev")).cast("double").as("revenue"),
        sum(when(col("l_discount").isNull, 1L).otherwise(0L)).as("null_disc"))
      .write.mode("overwrite").format("noop").save()
    val m = obs.get
    val row = Row(m("n_rows").asInstanceOf[Long],
      m("revenue").asInstanceOf[Double],
      m("null_disc").asInstanceOf[Long])
    spark.createDataFrame(
      java.util.Arrays.asList(row),
      StructType(Seq(
        StructField("n_rows", LongType, nullable = false),
        StructField("revenue", DoubleType, nullable = false),
        StructField("null_disc", LongType, nullable = false))))
  }

  /** SNAPSHOT PROFILE DRIFT — the data-quality face of time travel:
    * profile two versions of the corpus table THROUGH their manifests
    * (one aggregate scan each) and report per-metric (v1, v2, delta)
    * rows — the "what changed between the corpus I trained on and the
    * corpus I'm about to train on" audit that runs before every
    * re-train at scale. Complements `q_snapshot_diff` (row-level) and
    * `q_cdc_feed` (change rows): this is the STATISTICAL summary whose
    * cost is two scans and whose output is four numbers, readable at a
    * glance on a 100 TB table where the row-level diff is itself big
    * data. Metrics are integer-exact (counts and character sums).
    */
  def profileDrift(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.sources.VersionedTable.buildChain(spark, dir)
    def prof(v: Int): (Long, Long, Long, Long) = {
      val r = graft.sources.VersionedTable.readVersion(spark, root, v)
        .agg(count(lit(1)), sum(length(col("text"))).cast("long"),
          countDistinct(col("source")),
          sum(when(col("source") === "recrawl", 1L).otherwise(0L)))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val (a, b) = (prof(1), prof(2))
    import spark.implicits._
    Seq(
      ("row_count", a._1, b._1),
      ("total_chars", a._2, b._2),
      ("distinct_sources", a._3, b._3),
      ("recrawl_rows", a._4, b._4))
      .toDF("metric", "v1", "v2")
      .withColumn("delta", col("v2") - col("v1"))
  }

  /** BENFORD'S-LAW conformance over `orders.o_totalprice` — the
    * classic fabricated-data screen (Benford 1938; standard in fraud
    * audit): naturally-occurring multi-scale amounts put first digit d
    * at probability log10(1 + 1/d), and a synthetic or tampered column
    * deviates. One scan → 9-row aggregate with map-side combine; the
    * chi-square contribution per digit is the audit statistic (compare
    * to χ²(8) critical values downstream).
    *
    * The first digit comes from INTEGER string length, never from
    * `log10`: `floor(x / 10^(len(floor(x)) - 1))`. A float `log10`
    * at an exact power of ten can land an ulp below the integer and
    * misclassify the digit — engine-dependently, which would also skew
    * the oracle compare.
    */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val digit = floor(col("o_totalprice") /
      pow(lit(10.0), length(floor(col("o_totalprice")).cast("long").cast("string")) - 1))
      .cast("int").as("digit")
    val counts = Tables(spark, dir, "orders")
      .select(digit)
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    counts.crossJoin(broadcast(counts.agg(sum(col("n")).as("total"))))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("observed_p"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("expected_p"),
        round(pow(col("n").cast("double") - col("total") * log10(lit(1.0) + lit(1.0) / col("digit")), 2)
          / (col("total") * log10(lit(1.0) + lit(1.0) / col("digit"))), 4)
          .as("chi2_contrib"))
  }
}
