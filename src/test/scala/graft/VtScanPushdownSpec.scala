package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftVtCatalog, GraftVtTable, VersionedTable, ZoneMap,
  ZoneMapRuntimeScan, ZoneMapScanBuilder}

/** The two scan powers the zone-map sidecar adds beyond static pruning:
  *
  *  - MANIFEST-LEVEL AGGREGATE PUSHDOWN: whole-table COUNT(*) /
  *    COUNT(k) / MIN(k) / MAX(k) answered from the sidecar as a one-row
  *    LocalScan — zero files opened, zero tasks. Pinned: the plan shape
  *    (LocalTableScan, no parquet scan), value correctness vs a forced
  *    full scan, version-pinned answers under time travel, and every
  *    decline edge (filters, GROUP BY, other columns, missing row
  *    counts) falling back to the ordinary scan with identical results.
  *
  *  - RUNTIME (join-driven) FILE PRUNING: a selective dim side delivers
  *    its join keys to the fact scan after the build side executes, and
  *    the scan re-binds to only the files whose [min, max] can hold one
  *    of those keys. Pinned: the file count actually narrows, results
  *    match the unpruned join, and non-key predicates never prune.
  */
class VtScanPushdownSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  /** Fresh 8-file range-clustered documents table with analyzed sidecar. */
  private def mkClustered(name: String): String = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_$name").toString
    val base = graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    base.repartitionByRange(8, col("doc_id"))
      .write.mode("overwrite").parquet(s"$root/files/base_v1")
    VersionedTable.writeManifest(root, 1, Seq("files/base_v1"))
    ZoneMap.analyze(spark, root, 1, "doc_id"): Unit
    GraftVtCatalog.register(spark, name, root, base.schema, clusterCol = Some("doc_id"))
    root
  }

  test("whole-table count/min/max answer from the sidecar as a LocalScan") {
    mkClustered("vt_aggpush")
    ZoneMapScanBuilder.lastAggPushdown = None
    val df = spark.sql(
      """SELECT count(*) AS n, count(doc_id) AS nk,
        |       min(doc_id) AS lo, max(doc_id) AS hi
        |FROM graft_vt.vt_aggpush""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected a metadata answer:\n$plan")
    assert(!plan.toLowerCase.contains("parquet"), s"no file should be touched:\n$plan")
    val r = df.collect().head
    // oracle: the same aggregates computed by a real scan of the corpus
    val exp = graft.sources.Tables(spark, dir, "documents")
      .agg(count(lit(1)), count(col("doc_id")), min("doc_id"), max("doc_id"))
      .collect().head
    assert(r.getLong(0) == exp.getLong(0))
    assert(r.getLong(1) == exp.getLong(1))
    assert(r.getLong(2) == exp.getLong(2))
    assert(r.getLong(3) == exp.getLong(3))
    assert(ZoneMapScanBuilder.lastAggPushdown.isDefined)
  }

  test("aggregate pushdown stays version-accurate under time travel and DML") {
    mkClustered("vt_aggpush_tt")
    val before = spark.sql("SELECT count(*) FROM graft_vt.vt_aggpush_tt")
      .collect().head.getLong(0)
    // metadata delete drops a whole key range -> new version, new counts
    spark.sql("DELETE FROM graft_vt.vt_aggpush_tt WHERE doc_id >= 100")
    val after = spark.sql("SELECT count(*) FROM graft_vt.vt_aggpush_tt")
    assert(after.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val afterN = after.collect().head.getLong(0)
    assert(afterN < before)
    val pinned = spark.sql(
      "SELECT count(*) FROM graft_vt.vt_aggpush_tt VERSION AS OF 1")
    assert(pinned.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(pinned.collect().head.getLong(0) == before)
    val mx = spark.sql("SELECT max(doc_id) FROM graft_vt.vt_aggpush_tt")
      .collect().head.getLong(0)
    assert(mx < 100)
  }

  test("COW DML commits row counts, so pushdown works without re-ANALYZE") {
    mkClustered("vt_aggpush_dml")
    spark.sql(
      "UPDATE graft_vt.vt_aggpush_dml SET text = upper(text) WHERE doc_id % 5 = 0")
    val df = spark.sql(
      "SELECT count(*) AS n, min(doc_id) AS lo FROM graft_vt.vt_aggpush_dml")
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "commit-message row counts must enable pushdown on the DML'd version")
    val exp = graft.sources.Tables(spark, dir, "documents").count()
    assert(df.collect().head.getLong(0) == exp)
  }

  test("declines: filters, GROUP BY, other columns, distinct — all fall back") {
    mkClustered("vt_aggdecline")
    def planOf(sql: String) = spark.sql(sql).queryExecution.executedPlan.toString
    // a WHERE keeps the filter residual -> no pushdown, still correct
    val filtered = spark.sql(
      "SELECT count(*) AS n FROM graft_vt.vt_aggdecline WHERE doc_id < 100")
    assert(!filtered.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(filtered.collect().head.getLong(0) ==
      graft.sources.Tables(spark, dir, "documents").filter(col("doc_id") < 100).count())
    assert(!planOf(
      "SELECT source, count(*) FROM graft_vt.vt_aggdecline GROUP BY source")
      .contains("LocalTableScan"))
    assert(!planOf("SELECT min(text) FROM graft_vt.vt_aggdecline")
      .contains("LocalTableScan"))
    assert(!planOf("SELECT count(DISTINCT doc_id) FROM graft_vt.vt_aggdecline")
      .contains("LocalTableScan"))
    // sum is not metadata-answerable
    assert(!planOf("SELECT sum(doc_id) FROM graft_vt.vt_aggdecline")
      .contains("LocalTableScan"))
  }

  test("legacy sidecars without row counts decline COUNT but still push MIN/MAX") {
    val root = mkClustered("vt_agglegacy")
    // rewrite the sidecar in the pre-row-count format
    val stats = ZoneMap.read(root, 1, "doc_id").get
    val nulls = ZoneMap.readNullCounts(root, 1, "doc_id")
    ZoneMap.write(root, 1, "doc_id", stats, nulls) // no rows
    val cnt = spark.sql("SELECT count(*) FROM graft_vt.vt_agglegacy")
    assert(!cnt.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(cnt.collect().head.getLong(0) ==
      graft.sources.Tables(spark, dir, "documents").count())
    val mm = spark.sql("SELECT min(doc_id), max(doc_id) FROM graft_vt.vt_agglegacy")
    assert(mm.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("join-driven runtime pruning narrows the fact file list") {
    mkClustered("vt_rtprune")
    // the dim's selectivity must NOT be statically inferable onto the
    // fact side (an IN-list would reach the fact scan by predicate
    // inference and static pruning would get there first) — so the dim
    // is a materialized table filtered on a DATA column, and only the
    // executed build side knows which keys survive
    val s = spark
    import s.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("graft_rt_dim").toString
    (Seq((10L, 1), (20L, 1), (30L, 1)) ++ (1000L to 1050L).map((_, 0)))
      .toDF("doc_id", "flag").write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("rt_dim")
    ZoneMapRuntimeScan.lastRuntimePrune = (0, 0)
    val df = spark.sql(
      """SELECT f.doc_id, f.source FROM graft_vt.vt_rtprune f
        |JOIN rt_dim d ON f.doc_id = d.doc_id WHERE d.flag = 1""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 3)
    val (before, after) = ZoneMapRuntimeScan.lastRuntimePrune
    assert(before >= 4, s"fixture should expose several files, got $before")
    assert(after < before,
      s"3 adjacent keys must not bind all $before files (kept $after)")
    // and the runtime-pruned join returns exactly what a plain join does
    val plain = graft.sources.Tables(spark, dir, "documents")
      .filter(col("doc_id").isin(10L, 20L, 30L)).count()
    assert(rows.length.toLong == plain)
  }
}
