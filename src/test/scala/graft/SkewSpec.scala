package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted join / skew-safe aggregation: equivalence to the plain
  * formulation on a pathologically skewed key distribution.
  */
class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("saltedJoin equals plain join on 95%-hot-key data") {
    import spark.implicits._
    // 10k rows, 95% key=7
    val big = spark.range(10000)
      .select((when(pmod(col("id"), lit(20)) < 19, 7L).otherwise(pmod(col("id"), lit(5)))).as("k"),
        col("id").as("payload"))
    val small = Seq((0L, "a"), (1L, "b"), (4L, "e"), (7L, "hot")).toDF("sk", "name")
    val plain = big.join(small, $"k" === $"sk")
      .groupBy($"name").agg(count(lit(1)).as("n"), sum($"payload").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", "sk")
      .groupBy($"name").agg(count(lit(1)).as("n"), sum($"payload").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("AQE skew join: runtime splits the 95%-hot partition (skew=true)") {
    // When does the BUILT-IN mitigation suffice vs Skew.saltedJoin?
    // AQE's OptimizeSkewedJoin splits a sort-merge-join partition at
    // runtime when its shuffle bytes exceed max(threshold, 5x median) —
    // no query rewrite needed. Salting remains necessary for (a) joins
    // AQE won't rewrite (it refuses splits that would add a shuffle,
    // unless forced) and (b) skewed AGGREGATIONS, which AQE never
    // splits (state, not shuffle reads — see skewSafeDistinctCount).
    // This test proves the built-in path actually fires on a 95%-hot key.
    val confs = Map(
      // keep it a shuffle join: nothing broadcastable
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // scale the detection thresholds down to test-fixture bytes
      // (defaults are 256m/64m — right for real executors)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50k")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k rows, 95% on key 0, ~64B incompressible payload -> the hot
      // shuffle partition is MBs while the median partition is ~0
      val big = spark.range(100000).select(
        when(col("id") % 100 < 95, 0L).otherwise(col("id") % 100).as("k"),
        concat(md5(col("id").cast("string")),
               md5((col("id") + 1).cast("string"))).as("payload"))
      val small = spark.range(100)
        .select(col("id").as("k2"), md5(col("id").cast("string")).as("dim"))
      // aggregate OVER the payload so column pruning can't strip it from
      // the shuffle — the skew must be in bytes that actually move
      val agg = big.join(small, col("k") === col("k2"))
        .groupBy().agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("payload_bytes"))
      val row = agg.collect()(0)
      assert(row.getLong(0) == 100000L && row.getLong(1) == 100000L * 64)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"AQE did not re-plan:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$plan")
    } finally {
      saved.foreach { case (k, vOpt) =>
        vOpt.fold(spark.conf.unset(k))(v => spark.conf.set(k, v))
      }
    }
  }

  test("skewSafeDistinctCount equals plain countDistinct") {
    val events = graft.sources.Tables(spark, TestSpark.sf0001, "events")
    val plain = events.groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("n_distinct"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val safe = Skew.skewSafeDistinctCount(events, col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(safe == plain)
  }

  test("key skew profile: matches a driver Gini recompute, metrics in range") {
    val out = Skew.keySkewProfile(spark, TestSpark.sf0001).collect()
    assert(out.length == 1)
    val r = out.head
    val counts = graft.sources.Tables(spark, TestSpark.sf0001, "events")
      .groupBy(col("user_id")).count().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val n = counts.length.toLong
    val total = counts.map(_._2).sum
    assert(r.getLong(0) == total && r.getLong(1) == n)
    assert(r.getLong(2) == counts.map(_._2).max)
    // Gini from the sorted-count closed form
    val sorted = counts.sortBy(c => (c._2, c._1)).map(_._2)
    val gnum = sorted.zipWithIndex.map { case (c, i0) => (2L * (i0 + 1) - n - 1) * c }.sum
    val gini = gnum.toDouble / (n.toDouble * total.toDouble)
    assert(math.abs(r.getDouble(4) - gini) < 1e-6, s"gini ${r.getDouble(4)} != $gini")
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
    assert(math.abs(r.getDouble(3) - counts.map(_._2).max.toDouble / total) < 1e-6)
  }
}
