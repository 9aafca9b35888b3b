package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Bucketing: the pre-shuffle co-location strategy for repeated fact-fact
  * joins at scale — both sides bucketed on the join key means the join
  * runs with ZERO exchanges, which at 100 TB is the difference between a
  * cluster-wide shuffle per query and none.
  */
class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Every node in the plan, INCLUDING inside AQE wrappers. Plain
    * `plan.collect` stops at `AdaptiveSparkPlanExec`/`QueryStageExec`
    * (both are leaf nodes), which would make a no-exchange assertion
    * pass vacuously on exactly the plans that do shuffle — AQE wraps a
    * plan precisely when it contains an exchange.
    */
  private def allNodes(plan: SparkPlan): Seq[SparkPlan] =
    plan.collect { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case q: QueryStageExec => q +: allNodes(q.plan)
      case n => Seq(n)
    }

  test("join of tables bucketed on the key plans with no shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_b_orders")
    spark.sql("DROP TABLE IF EXISTS graft_b_customer")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist — clear them physically too
    for (t <- Seq("graft_b_orders", "graft_b_customer")) {
      val dir = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(dir)) {
        java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    Tables(spark, TestSpark.sf0001, "orders")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_b_orders")
    Tables(spark, TestSpark.sf0001, "customer")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_b_customer")

    val joined = spark.table("graft_b_orders")
      .join(spark.table("graft_b_customer").hint("merge"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))

    val exchangesBelowJoin = allNodes(joined.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeExec => e
    }
    // one exchange for the final groupBy is fine; the JOIN itself must not
    // shuffle — with both sides bucketed by the key there is exactly that
    // one aggregation exchange in the whole plan.
    assert(exchangesBelowJoin.size <= 1,
      s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")

    // and it is correct
    val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables(spark, TestSpark.sf0001, "orders")
      .join(Tables(spark, TestSpark.sf0001, "customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBuckets == direct)
  }

  test("BucketedParquetSink co-located join: ZERO exchanges, only partition-local sorts") {
    import spark.implicits._
    val joined = graft.sources.BucketedParquetSink
      .colocatedOrdersJoin(spark, TestSpark.sf0001)

    val plan = joined.queryExecution.executedPlan
    val exchanges = allNodes(plan).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"co-located bucketed join still shuffles:\n$plan")
    // Spark ≥3.0 bucketed scans never report sortBy output ordering
    // (a bucket may span files), so the merge join keeps an
    // IN-PARTITION sort — O(bucket) local work. What must never appear
    // is a GLOBAL sort: that would mean a range-partitioning exchange.
    val sorts = allNodes(plan).collect { case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.forall(!_.global), s"co-located bucketed join sorts globally:\n$plan")

    // and the layout never changes the answer
    val viaBuckets = joined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    val direct = Tables(spark, TestSpark.sf0001, "orders")
      .join(Tables(spark, TestSpark.sf0001, "customer"), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"o_custkey", $"c_mktsegment", $"o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(viaBuckets == direct)
  }
}
