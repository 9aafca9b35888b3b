package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftVtCatalog, GraftVtTable, VersionedTable}

/** Metadata tables (`graft_vt.t.history` / `.files` / `.tags`): the
  * oracle gate pins history/files numbers against the corpus; this
  * suite pins the parts the oracle can't see — zero Spark jobs (a
  * LocalScan plan), tag listing, zone-map columns, consistency between
  * `.files` row counts and actual scans, and time travel binding the
  * right manifest's file list.
  */
class MetaTablesSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def register(): String = {
    val root = VersionedTable.buildChain(spark, dir)
    val schema = graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source")).schema
    GraftVtCatalog.register(spark, "vt_documents", root, schema)
    root
  }

  test("history rows match the manifest chain and footer row counts") {
    register()
    val h = spark.sql(
      "SELECT version, n_groups, n_files, total_rows FROM graft_vt.vt_documents.history")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._1)
    assert(h.map(_._1).toSeq == Seq(1, 2))
    assert(h.forall(_._2 == 2), s"both versions name 2 groups: ${h.toSeq}")
    val corpus = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(h.forall(_._4 == corpus),
      s"every version holds the full corpus ($corpus): ${h.toSeq}")
  }

  test("files table is a LocalScan: zero jobs, no data read") {
    register()
    val df = spark.sql("SELECT * FROM graft_vt.vt_documents.files")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"metadata tables must plan as LocalTableScan, got:\n$plan")
  }

  test("files row counts agree with scanning each group") {
    val root = register()
    val byGroup = spark.sql(
      """SELECT group_path, CAST(SUM(row_count) AS BIGINT) AS n
        |FROM graft_vt.vt_documents.files GROUP BY group_path""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    byGroup.foreach { case (g, n) =>
      assert(spark.read.parquet(s"$root/$g").count() == n,
        s"footer rows for $g must equal a scan's count")
    }
    assert(byGroup.keySet == Set("files/cold_v1", "files/hot_v2"))
  }

  test("VERSION AS OF pins which snapshot .files describes") {
    register()
    def groups(v: Int): Set[String] = spark.sql(
      s"SELECT DISTINCT group_path FROM graft_vt.vt_documents.files VERSION AS OF $v")
      .collect().map(_.getString(0)).toSet
    assert(groups(1) == Set("files/cold_v1", "files/hot_v1"))
    assert(groups(2) == Set("files/cold_v1", "files/hot_v2"))
  }

  test("tags table lists named refs with their versions") {
    val root = register()
    GraftVtTable.tag(root, "meta-spec-a", 1)
    GraftVtTable.tag(root, "meta-spec-b", 2)
    val tags = spark.sql("SELECT tag, version FROM graft_vt.vt_documents.tags")
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(tags.get("meta-spec-a").contains(1))
    assert(tags.get("meta-spec-b").contains(2))
  }

  test("branches table lists live refs as a LocalScan; fast-forward empties it") {
    val root = register()
    graft.sources.VtBranch.list(root).foreach { case (n, _) =>
      graft.sources.VtBranch.drop(root, n)
    }
    spark.sql("CALL graft_vt.create_branch('vt_documents', 'meta-br')")
    val df = spark.sql(
      "SELECT branch, fork_version, head_commits, n_files FROM graft_vt.vt_documents.branches")
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "metadata tables must plan as LocalTableScan (zero jobs)")
    val rows = df.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val expectFiles = VersionedTable.manifest(root, 2)
      .flatMap(graft.sources.ZoneMap.leafFiles(root, _)).size
    assert(rows.toSeq == Seq(("meta-br", 2, 0, expectFiles)),
      s"one branch forked at head v2 with the head's file count; got ${rows.toSeq}")
    spark.sql("CALL graft_vt.drop_branch('vt_documents', 'meta-br')")
    assert(spark.sql("SELECT * FROM graft_vt.vt_documents.branches").count() == 0)
  }

  test("clustered tables surface zone-map bounds in .files") {
    import graft.sources.ZoneMap
    val root = java.nio.file.Files.createTempDirectory("graft_meta_zoned").toString
    val base = graft.sources.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    base.repartitionByRange(4, col("doc_id"))
      .write.mode("overwrite").parquet(s"$root/files/base_v1")
    VersionedTable.writeManifest(root, 1, Seq("files/base_v1"))
    ZoneMap.analyze(spark, root, 1, "doc_id"): Unit
    GraftVtCatalog.register(spark, "meta_zoned", root, base.schema,
      clusterCol = Some("doc_id"))
    val rows = spark.sql(
      "SELECT file_path, zmin, zmax FROM graft_vt.meta_zoned.files")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"expected zone bounds on ${r.getString(0)}")
      assert(r.getLong(1) <= r.getLong(2))
    }
    // an UNclustered table reads them as NULL, not garbage
    register()
    val nulls = spark.sql("SELECT zmin FROM graft_vt.vt_documents.files").collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("unknown metadata suffix and unknown base table both fail loudly") {
    register()
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_vt.vt_documents.snapshots").collect()
    }: Unit
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_vt.no_such_table.files").collect()
    }: Unit
  }
}
