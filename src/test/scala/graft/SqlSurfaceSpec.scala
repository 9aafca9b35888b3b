package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** SQL-parser-path subqueries must DECORRELATE (no per-outer-row
  * execution), and the full global sort must plan a range-partitioned
  * parallel sort — the two plan claims VERDICT r5 asked to pin.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("q_sql_exists: correlated EXISTS decorrelates to a left semi join") {
    val df = Relational.sqlExistsLateOrders(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftSemi"), s"no semi join in:\n$optimized")
    assert(!optimized.contains("exists#"), s"live EXISTS predicate survived optimization:\n$optimized")
    assert(df.collect().map(_.getLong(1)).sum > 0)
  }

  test("q_sql_scalar: correlated scalar subquery decorrelates to an aggregate+join") {
    val df = Relational.sqlScalarAvgQuantity(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("scalar-subquery"),
      s"scalar subquery survived optimization (per-row execution):\n$optimized")
    assert(optimized.contains("Join"), s"no join in decorrelated plan:\n$optimized")
    assert(df.collect().nonEmpty)
  }

  test("q_sql_window: parser-path ROW_NUMBER plans one hash exchange + Window") {
    val df = Relational.sqlWindowTopOrders(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"no Window operator in:\n$plan")
    // partitioned by the window key, not collapsed to a single partition
    assert(plan.contains("hashpartitioning(c_custkey"),
      s"window not hash-partitioned on its PARTITION BY key:\n$plan")
    // rn <= 3 must prune inside the window machinery (WindowGroupLimit
    // pushes the limit below the shuffle since Spark 3.5) — never a
    // post-hoc filter over fully materialized row numbers only
    assert(plan.contains("WindowGroupLimit"),
      s"rank limit not pushed into the window (full materialization):\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(3) <= 3))
  }

  test("q_sql_multijoin: dimensions broadcast, fact spine is the only shuffle join") {
    val df = Relational.sqlMarketShare(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // part/supplier/nation/region must all come in as broadcast hash
    // joins — a dim that fell to sort-merge would shuffle the fact table
    // once per dim at scale
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 4, s"expected >=4 broadcast dim joins, got $nBroadcast in:\n$plan")
    val nShuffleJoin = "SortMergeJoin".r.findAllIn(plan).length +
      "ShuffledHashJoin".r.findAllIn(plan).length
    assert(nShuffleJoin <= 1,
      s"more than the lineitem-orders shuffle join ($nShuffleJoin) in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getDouble(2)
      assert(share >= 0.0 && share <= 1.0, s"share out of range: $r")
    }
  }

  test("q_global_sort: range-partitioned global sort, not TakeOrdered, not 1 partition") {
    val df = Relational.globalSortLineitems(spark, sf)
    // the exchange is inserted by EnsureRequirements — inspect the
    // executed (prepared) plan, via toString (it prints through the
    // AdaptiveSparkPlanExec leaf; see memory: collect() cannot)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("rangepartitioning"), s"no range-partitioned exchange in:\n$plan")
    // `Sort [...], true, 0` = global sort (per-partition ranges compose
    // to a total order); `false` would be partition-local only
    assert(plan.contains("], true, 0"), s"no global Sort in:\n$plan")
    // the exchange must declare a multi-partition fan-out (AQE may still
    // coalesce tiny runtime data — that's adaptivity, not a collapse)
    val fanOut = "rangepartitioning\\([^)]*, (\\d+)\\)".r
      .findFirstMatchIn(plan).map(_.group(1).toInt)
    assert(fanOut.exists(_ > 1), s"range exchange declares $fanOut partitions in:\n$plan")
  }

  test("q_sql_lateral: correlated LATERAL LIMIT decorrelates to one windowed pass") {
    val df = Relational.sqlLateralTopOrders(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    // no per-outer-row lateral execution may survive optimization
    assert(!optimized.contains("LateralJoin"),
      s"LateralJoin survived optimization (per-row subquery execution):\n$optimized")
    // the ORDER BY ... LIMIT inside the subquery must become a window
    // rank over ONE pass of orders, joined back on the equi key
    assert(optimized.contains("Window"), s"no Window in decorrelated plan:\n$optimized")
    assert(optimized.contains("Join"), s"no join back to the outer side:\n$optimized")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // per customer: at most 2 rows, and they are that customer's top-2
    // prices (the hash gate pins exact values; this pins the contract)
    val top2 = graft.sources.Tables(spark, sf, "orders")
      .groupBy(org.apache.spark.sql.functions.col("o_custkey"))
      .agg(org.apache.spark.sql.functions.max("o_totalprice").as("p1"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (c, rs) =>
      assert(rs.length <= 2, s"customer $c got ${rs.length} lateral rows")
      assert(rs.map(_.getDouble(2)).max == top2(c),
        s"customer $c: lateral top rows miss the max price")
    }
  }
}
