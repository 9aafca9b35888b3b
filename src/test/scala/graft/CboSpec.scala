package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cbo

/** ANALYZE-backed cost-based planning (VERDICT r8/r9 carryover): the
  * statistics must exist, the CBO plan must be a genuinely different —
  * stats-driven — join order from the heuristic plan, and both must
  * produce identical results (the oracle identity is the driver gate;
  * here we pin the plan divergence the stats cause).
  */
class CboSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("ANALYZE stores row counts and column stats in the catalog") {
    val tag = Cbo.ensureStats(spark, dir)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(s"lineitem_cbo_$tag"))
    val stats = meta.stats.getOrElse(fail("ANALYZE must store table stats"))
    assert(stats.rowCount.exists(_.toLong > 0), "ANALYZE must store a row count")
    assert(stats.colStats.contains("l_orderkey"),
      s"FOR COLUMNS must store join-key stats, got ${stats.colStats.keySet}")
    assert(stats.colStats("l_orderkey").distinctCount.exists(_.toLong > 0),
      "join-key NDV is what drives the reorder cost model")
  }

  test("stats flip the join order relative to the heuristic plan") {
    // leaf relation names in plan (join) order
    def joinOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString).map(s => "[a-z]+_cbo".r.findFirstIn(s).getOrElse("?"))
    val cboOrder = joinOrder(Cbo.cboMarketShare(spark, dir))
    val heuOrder = joinOrder(Cbo.heuristicMarketShare(spark, dir))
    info(s"cbo order: $cboOrder")
    info(s"heuristic order: $heuOrder")
    assert(cboOrder.toSet == heuOrder.toSet, "same six relations must appear")
    assert(cboOrder != heuOrder,
      s"CBO must reorder the join chain; both plans ordered $heuOrder")
  }

  test("cbo and heuristic plans agree on results") {
    val a = Cbo.cboMarketShare(spark, dir).collect().map(_.toString).sorted
    val b = Cbo.heuristicMarketShare(spark, dir).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("graft_vt zoned scans report native rowCount + column stats, no ANALYZE") {
    Cbo.ensureVtStats(spark, dir)
    val df = spark.table("graft_vt.lineitem_vt")
    val stats = df.queryExecution.optimizedPlan.stats
    val expected = graft.sources.Tables(spark, dir, "lineitem").count()
    assert(stats.rowCount.exists(_.toLong == expected),
      s"native rowCount must equal the exact footer sum, got ${stats.rowCount}")
    val keyStats = stats.attributeStats.find(_._1.name == "l_orderkey")
      .map(_._2).getOrElse(fail("zone column must carry attribute stats"))
    assert(keyStats.distinctCount.exists(_.toLong > 0))
    assert(keyStats.min.isDefined && keyStats.max.isDefined,
      "sidecar min/max must surface as catalyst column stats")
  }

  test("native stats drive the build-side choice: small vt dim broadcasts unhinted") {
    Cbo.ensureVtStats(spark, dir)
    val plan = graft.operators.Cbo.cboNativeVt(spark, dir)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the customer_vt side must broadcast from reported sizes; plan:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("native-stats plan and raw-parquet plan agree on results") {
    val a = graft.operators.Cbo.cboNativeVt(spark, dir)
      .collect().map(_.toString).sorted
    val li = graft.sources.Tables(spark, dir, "lineitem")
    val o = graft.sources.Tables(spark, dir, "orders")
    val c = graft.sources.Tables(spark, dir, "customer")
    li.join(o, org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))
      .join(c, org.apache.spark.sql.functions.col("o_custkey") ===
        org.apache.spark.sql.functions.col("c_custkey"))
      .createOrReplaceTempView("cbo_native_check")
    val b = spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM cbo_native_check GROUP BY c_mktsegment""".stripMargin)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
