package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality

/** The data-contract tier: one-pass constraint verification and
  * pipeline-embedded `Observation` metrics.
  */
class QualitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def allNodes(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("constraint suite: all seven contracts hold on the generated data") {
    val rows = Quality.constraintSuite(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(rows.keySet == Set("size_min", "complete_custkey", "unique_orderkey",
      "min_totalprice", "status_domain", "priority_pattern",
      "ref_integrity_custkey"))
    assert(rows.values.forall(identity), s"failed contracts: ${rows.filterNot(_._2)}")
  }

  test("constraint suite detects violations (orphan key + domain breach)") {
    // same constraint expressions over a doctored in-memory pair proves the
    // checks can actually fire — the generated tables are all-green
    import spark.implicits._
    val orders = Seq((1L, 10L, "O", 5.0, "1-URGENT"),
      (1L, 99L, "X", -2.0, "zzz")) // dup key, orphan cust, bad status/price/pattern
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    val customer = Seq(Tuple1(10L)).toDF("c_custkey")
    orders.createOrReplaceTempView("qs_orders")
    customer.createOrReplaceTempView("qs_customer")
    val bad = spark.sql(
      """SELECT
        |  COUNT(DISTINCT o_orderkey) = COUNT(*) AS uniq,
        |  SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) = 0 AS dom,
        |  MIN(o_totalprice) >= 0 AS rng,
        |  SUM(CASE WHEN o_orderpriority RLIKE '^[1-5]-' THEN 0 ELSE 1 END) = 0 AS pat
        |FROM qs_orders""".stripMargin).collect()(0)
    assert(!bad.getBoolean(0) && !bad.getBoolean(1) && !bad.getBoolean(2) && !bad.getBoolean(3))
    val orphans = orders.join(customer,
      orders("o_custkey") === customer("c_custkey"), "left_anti").count()
    assert(orphans == 1L)
  }

  test("one-pass plan: all single-table metrics fuse into one aggregate over one orders scan") {
    val df = Quality.constraintSuite(spark, TestSpark.sf0001)
    val nodes = allNodes(df)
    // two orders scans total: one for the fused metric pass, one for the
    // anti-join's key projection — NOT one scan per constraint
    val ordersScans = nodes.count(n =>
      n.nodeName.contains("Scan") && n.toString.contains("orders.parquet"))
    assert(ordersScans == 2, s"orders scanned $ordersScans times:\n${nodes.mkString("\n")}")
    // the distinct-count rewrite (expand) keeps it to one aggregate chain:
    // final+partial pairs over a single scan, no per-metric jobs
    val aggs = nodes.count {
      case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
      case _ => false
    }
    assert(aggs <= 8, s"aggregate explosion ($aggs):\n${nodes.mkString("\n")}")
  }

  test("observe does not poison later typed-aggregator closures") {
    // Dataset.observe initializes the session's lazy (non-serializable)
    // ObservationManager; a closure capturing the SparkSession then fails
    // task serialization. Pins that our aggregators are session-free:
    // observe first, then the Misra-Gries typed Aggregator must still run.
    Quality.observedPipeline(spark, TestSpark.sf0001).collect()
    val hh = graft.functions.MisraGries.heavyHitters(spark, TestSpark.sf0001)
    assert(hh.count() > 0)
  }

  test("observed pipeline: metrics ride the write job and match a direct aggregate") {
    import org.apache.spark.sql.functions._
    val out = Quality.observedPipeline(spark, TestSpark.sf0001).collect()(0)
    val direct = graft.sources.Tables(spark, TestSpark.sf0001, "lineitem")
      .filter(col("l_shipdate") >= lit(java.time.LocalDateTime.of(1995, 1, 1, 0, 0)))
      .agg(count(lit(1)),
        sum((col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(12,2)")))
          .cast("decimal(18,4)")).cast("double"))
      .collect()(0)
    assert(out.getLong(0) == direct.getLong(0) && out.getLong(0) > 0)
    assert(math.abs(out.getDouble(1) - direct.getDouble(1)) < 1e-6)
    assert(out.getLong(2) == 0L)
  }
}
