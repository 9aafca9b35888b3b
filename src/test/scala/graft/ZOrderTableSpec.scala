package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SqlDml
import graft.sources.{GraftVtCatalog, ZoneMapScanBuilder}

/** The Z-ORDERED table layout: one Morton-curve sort order gives every
  * file a narrow [min, max] footprint in BOTH dimensions, and the
  * per-column sidecars turn that into multi-dimensional file skipping.
  * The oracle gate (q_zorder_table) proves results; this suite pins
  * that the layout actually PRUNES — on each dimension ALONE (the
  * property a single-column sort cannot give), harder on the 2-D box,
  * and that the multi-column sidecars also serve aggregate pushdown.
  */
class ZOrderTableSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def prunedCount(sql: String): (Int, Int) = {
    ZoneMapScanBuilder.lastPrune = (0, 0)
    spark.sql(sql).collect(): Unit
    ZoneMapScanBuilder.lastPrune
  }

  test("each z-order dimension alone prunes files; the 2-D box prunes hardest") {
    SqlDml.sqlZOrderTable(spark, dir).collect(): Unit
    // range-relative 20% bands (the fixture's absolute spans differ per SF)
    val b = graft.sources.Tables(spark, dir, "events")
      .agg(min(col("event_id")), max(col("event_id")),
        min(col("user_id")), max(col("user_id"))).collect().head
    val (xmin, xmax, ymin, ymax) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val (xlo, xhi) = (xmin + (xmax - xmin) / 10, xmin + (xmax - xmin) * 3 / 10)
    val (ylo, yhi) = (ymin + (ymax - ymin) * 2 / 10, ymin + (ymax - ymin) * 4 / 10)
    // dimension 1 alone
    val (all1, keptX) = prunedCount(
      s"SELECT count(*) AS n FROM graft_vt.vt_zordered WHERE event_id BETWEEN $xlo AND $xhi")
    assert(all1 >= 8, s"fixture should expose many files, got $all1")
    assert(keptX < all1, s"an event_id range must prune ($keptX/$all1)")
    // dimension 2 alone — the one a lexicographic (event_id, user_id)
    // sort could NOT prune
    val (all2, keptY) = prunedCount(
      s"SELECT count(*) AS n FROM graft_vt.vt_zordered WHERE user_id BETWEEN $ylo AND $yhi")
    assert(keptY < all2, s"a user_id range must prune too ($keptY/$all2)")
    // the 2-D box binds no more than either dimension alone
    val (_, keptBox) = prunedCount(
      s"""SELECT count(*) AS n FROM graft_vt.vt_zordered
         |WHERE event_id BETWEEN $xlo AND $xhi AND user_id BETWEEN $ylo AND $yhi""".stripMargin)
    assert(keptBox <= math.min(keptX, keptY))
    assert(keptBox >= 1, "the box is non-empty in the fixture")
  }

  test("results are exact: box scan equals the raw-corpus recompute") {
    val out = SqlDml.sqlZOrderTable(spark, dir).collect()
    val ev = graft.sources.Tables(spark, dir, "events")
    val b = ev.agg(min(col("event_id")), max(col("event_id")),
      min(col("user_id")), max(col("user_id"))).collect().head
    val (xmin, xmax, ymin, ymax) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val exp = ev.filter(
      col("event_id").between(xmin + (xmax - xmin) / 10, xmin + (xmax - xmin) * 3 / 10) &&
        col("user_id").between(ymin + (ymax - ymin) * 2 / 10, ymin + (ymax - ymin) * 5 / 10))
      .count()
    assert(exp > 0, "the gate box must be non-empty")
    assert(out.length.toLong == exp)
  }

  test("aggregate pushdown answers from either dimension's sidecar") {
    SqlDml.sqlZOrderTable(spark, dir).collect(): Unit
    val df = spark.sql(
      """SELECT count(*) AS n, min(event_id) AS e_lo, max(event_id) AS e_hi,
        |  min(user_id) AS u_lo, max(user_id) AS u_hi
        |FROM graft_vt.vt_zordered""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val r = df.collect().head
    val exp = graft.sources.Tables(spark, dir, "events")
      .agg(count(lit(1)), min("event_id"), max("event_id"),
        min("user_id"), max("user_id")).collect().head
    (0 to 4).foreach(i => assert(r.getLong(i) == exp.getLong(i), s"field $i"))
  }

  test("dropping or renaming a z-order dimension is rejected") {
    SqlDml.sqlZOrderTable(spark, dir).collect(): Unit
    val e1 = intercept[Exception](
      spark.sql("ALTER TABLE graft_vt.vt_zordered DROP COLUMN user_id"))
    assert(e1.getMessage.contains("z-order stats column"))
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE graft_vt.vt_zordered RENAME COLUMN event_id TO eid"))
    assert(e2.getMessage.contains("z-order stats column"))
  }

  test("DDL + OPTIMIZE lifecycle: data lands unpruned, optimize builds the layout") {
    spark.sql("DROP TABLE IF EXISTS graft_vt.zlife")
    spark.sql(
      """CREATE TABLE graft_vt.zlife (event_id BIGINT, user_id BIGINT, event_type STRING)
        |TBLPROPERTIES ('zorder' = 'event_id,user_id')""".stripMargin)
    graft.sources.Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .repartition(6).createOrReplaceTempView("zlife_src")
    spark.sql("INSERT INTO graft_vt.zlife SELECT * FROM zlife_src")
    val total = spark.sql("SELECT * FROM graft_vt.zlife").count()
    assert(total > 0)
    // fresh data has no sidecars: the box query binds everything (the
    // plain parquet path, so the prune hook stays untouched)
    ZoneMapScanBuilder.lastPrune = (-1, -1)
    val boxSql =
      """SELECT count(*) AS n FROM graft_vt.zlife
        |WHERE event_id BETWEEN 100 AND 299 AND user_id BETWEEN 2 AND 5""".stripMargin
    val nBefore = spark.sql(boxSql).collect().head.getLong(0)
    assert(ZoneMapScanBuilder.lastPrune == ((-1, -1)),
      "no sidecar -> no zone-map scan builder")
    // OPTIMIZE lays out the Morton curve and builds both sidecars (a
    // small target size forces a multi-file layout on the tiny fixture)
    val r = spark.sql("CALL graft_vt.optimize('zlife', 8192)").collect().head
    assert(r.getInt(2) >= 2, "optimize must commit a new version")
    ZoneMapScanBuilder.lastPrune = (-1, -1)
    val nAfter = spark.sql(boxSql).collect().head.getLong(0)
    assert(nAfter == nBefore, "optimize must not change content")
    val (all, kept) = ZoneMapScanBuilder.lastPrune
    assert(all > 0 && kept < all, s"optimized layout must prune ($kept/$all)")
    // and the sidecars now serve aggregate pushdown
    val agg = spark.sql("SELECT count(*) AS n, max(user_id) AS hi FROM graft_vt.zlife")
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(agg.collect().head.getLong(0) == total)
  }

  test("a z-ordered file set has narrow spans in both dimensions") {
    SqlDml.sqlZOrderTable(spark, dir).collect(): Unit
    val root = GraftVtCatalog.rootOf("vt_zordered").get
    val ex = graft.sources.ZoneMap.read(root, 1, "event_id").get
    val uy = graft.sources.ZoneMap.read(root, 1, "user_id").get
    def relSpan(stats: Map[String, (Long, Long)]): Double = {
      val lo = stats.values.map(_._1).min
      val hi = stats.values.map(_._2).max
      val mean = stats.values.map { case (a, b) => (b - a).toDouble }.sum / stats.size
      mean / math.max(1.0, (hi - lo).toDouble)
    }
    // a random layout would give every file ~the full span (ratio ≈ 1);
    // Morton tiles keep the AVERAGE per-file span well under it in both
    // dimensions simultaneously
    assert(relSpan(ex) < 0.6, s"event_id mean relative span ${relSpan(ex)}")
    assert(relSpan(uy) < 0.6, s"user_id mean relative span ${relSpan(uy)}")
  }
}
