package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew mitigation for joins whose key distribution is pathological
  * (one user with 10⁹ events joining a dimension row lands every copy on
  * one reducer).
  *
  * AQE's skew-join handling (enabled in GraftSession) fixes this at
  * runtime for sort-merge joins; [[saltedJoin]] is the explicit,
  * planner-independent variant: the big side gets a uniform salt in
  * [0, n), the small side is replicated n times, and the join key becomes
  * (key, salt) — the hot key's rows spread over n reducers at the cost of
  * an n× blowup of the SMALL side only.
  */
object Skew {

  /** Inner equi-join with an n-way salt on the hot (left/big) side. */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      n: Int = 16): DataFrame = {
    // uniform, cheap salt; independent of the key so the hot key spreads
    val salted = big.withColumn("_graft_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(n.toLong)).cast("int"))
    val replicated = small.withColumn("_graft_salt",
      explode(array((0 until n).map(i => lit(i)): _*)))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          salted("_graft_salt") === replicated("_graft_salt"))
      .drop("_graft_salt")
  }

  /** Two-phase distinct count for a skewed group key: pre-aggregate on
    * (key, value-hash-salt) partials, then combine — bounds any single
    * reducer's state even when one key dominates.
    */
  def skewSafeDistinctCount(df: DataFrame, key: Column, value: Column, n: Int = 64): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .withColumn("_salt", pmod(xxhash64(col("v")), lit(n.toLong)).cast("int"))
      .groupBy(col("k"), col("_salt"))
      .agg(countDistinct(col("v")).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("n_distinct"))

  /** Declared-surface query: revenue per market segment through the
    * salted orders⋈customer join. The salt must not change the result —
    * the oracle is the plain join — only the reducer distribution.
    */
  def saltedRevenueBySegment(spark: SparkSession, dir: String): DataFrame =
    saltedJoin(Tables(spark, dir, "orders"), Tables(spark, dir, "customer"),
        "o_custkey", "c_custkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))

  /** Declared-surface query: distinct users per event type via the
    * two-phase salted distinct.
    */
  def distinctUsersPerType(spark: SparkSession, dir: String): DataFrame =
    skewSafeDistinctCount(Tables(spark, dir, "events"), col("event_type"), col("user_id"))

  /** Key-skew profile of the event log's `user_id` — the diagnostic a
    * partition-key choice runs on BEFORE shipping a join/groupBy at
    * 100 TB: key cardinality, the hottest key's share, and the Gini
    * coefficient of the per-key count distribution (0 = uniform keys,
    * → 1 = one key owns everything; high Gini is the signal to reach
    * for [[saltedJoin]] / AQE skew handling). One map-side-combined
    * count per key, then all metrics derive from the |keys|-sized count
    * relation — the rank window runs over per-key COUNTS, never rows
    * (if key cardinality itself is extreme, the two-phase sliced-rank
    * core q_spearman uses applies verbatim). Gini's numerator
    * `Σ (2·rank − n − 1)·cnt` is exact integer (summed in DECIMAL(38,0)
    * against overflow); only the two final ratios are mirrored doubles.
    */
  def keySkewProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val counts = Tables(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val ranked = counts.withColumn("i",
      row_number().over(Window.orderBy(col("cnt").asc, col("user_id").asc)))
    val tot = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    val gnum = ranked.crossJoin(broadcast(tot))
      .agg(sum(((lit(2L) * col("i") - col("n_keys") - 1L) * col("cnt"))
        .cast(DecimalType(38, 0))).as("gnum"))
    tot.crossJoin(broadcast(gnum)).select(
      col("n_rows"), col("n_keys"), col("max_cnt"),
      round(col("max_cnt").cast("double") / col("n_rows"), 6).as("top1_share"),
      round(col("gnum").cast("double") /
        (col("n_keys").cast("double") * col("n_rows").cast("double")), 6).as("gini"))
  }
}
