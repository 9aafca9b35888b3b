package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ParquetSink, Tables}

/** Scan-pruning posture: the two mechanisms that cut scanned bytes
  * before rows reach the engine — directory-level partition pruning on
  * a partitioned sink, and runtime bloom-filter row pruning injected
  * across a selective fact-fact join. Both are what makes a 100 TB
  * query read GBs, not TBs.
  */
class ScanPruningSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("partitioned sink read-back prunes to one partition directory") {
    val df = ParquetSink.partitionPrunedEvents(spark, TestSpark.sf0001)
    // pre-AQE physical tree (positive assertion needs real traversal)
    val scans = df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no file scan in plan")
    assert(scans.exists(_.partitionFilters.exists(_.toString.contains("event_type"))),
      s"event_type filter did not become a PartitionFilter:\n${df.queryExecution.sparkPlan}")
    // pruned scan still computes the right thing (vs the unpartitioned original)
    val viaPart = df.collect().map(r => (r.getAs[Any](0).toString, r.getLong(1), r.getDouble(2))).toSet
    val direct = Tables(spark, TestSpark.sf0001, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .collect().map(r => (r.getAs[Any](0).toString, r.getLong(1), r.getDouble(2))).toSet
    assert(viaPart == direct)
  }

  test("runtime bloom filter injects might_contain across a selective fact-fact join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // test-scale overrides: at sf0.001 nothing crosses the production
      // 10 GB application-side threshold and every dim fits a broadcast;
      // zeroing both exposes the plan shape the rule produces at real scale
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val selective = Tables(spark, TestSpark.sf0001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = Tables(spark, TestSpark.sf0001, "lineitem")
        .join(selective, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter in optimized plan:\n$plan")
      // and the filter is semantics-free
      assert(joined.collect().map(_.getLong(1)).sum ==
        Tables(spark, TestSpark.sf0001, "lineitem")
          .join(Tables(spark, TestSpark.sf0001, "orders")
            .filter(col("o_orderpriority") === "1-URGENT"),
            col("l_orderkey") === col("o_orderkey")).count())
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("dpp join: a dim-side predicate prunes fact partitions at runtime") {
    val df = ParquetSink.dppJoin(spark, TestSpark.sf0001)
    // pre-AQE physical tree (AQE wraps the executed plan in an adaptive
    // root that plain collect() does not traverse)
    val scans = df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no file scan in plan")
    // no literal event_type predicate exists — the partition filter must
    // be the runtime dynamicpruning expression planted from the dim side
    assert(scans.exists(_.partitionFilters.exists(_.toString.contains("dynamicpruning"))),
      s"no dynamicpruningexpression on the fact scan:\n${df.queryExecution.sparkPlan}")
    // and pruning never changes the answer
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = Tables(spark, TestSpark.sf0001, "events")
      .filter(col("event_type").isin("purchase", "signup"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == direct)
  }
}
