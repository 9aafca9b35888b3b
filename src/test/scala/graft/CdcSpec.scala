package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftVtCatalog, VersionedTable, VtMor}

/** Semantics pins for the `graft_vt.t.changes` CDC face
  * ([[graft.sources.GraftVtChangesTable]]).
  */
class CdcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def docsBase = graft.sources.Tables(spark, dir, "documents")
    .select(col("doc_id"), col("text"), col("source"))

  private def registerChain(): String = {
    val root = VersionedTable.buildChain(spark, dir)
    GraftVtCatalog.register(spark, "cdc_chain", root, docsBase.schema)
    root
  }

  test("COW compose: v1 minus deletes plus inserts IS v2, as multisets") {
    registerChain()
    val feed = spark.sql("SELECT * FROM graft_vt.cdc_chain.changes VERSION AS OF 2")
    val dels = feed.filter(col("_change_type") === "delete")
      .select(col("doc_id"), col("text"), col("source"))
    val ins = feed.filter(col("_change_type") === "insert")
      .select(col("doc_id"), col("text"), col("source"))
    val v1 = spark.sql("SELECT * FROM graft_vt.cdc_chain VERSION AS OF 1")
    val v2 = spark.sql("SELECT * FROM graft_vt.cdc_chain VERSION AS OF 2")
    // multiset identity via exceptAll both ways
    val composed = v1.exceptAll(dels).unionByName(ins)
    assert(composed.exceptAll(v2).count() === 0)
    assert(v2.exceptAll(composed).count() === 0)
    assert(feed.filter(col("_commit_version") =!= 2).count() === 0)
  }

  test("COW feed reads only CHANGED files: untouched rows never appear") {
    registerChain()
    val feed = spark.sql("SELECT * FROM graft_vt.cdc_chain.changes VERSION AS OF 2")
    // the chain's v2 re-crawls exactly the doc_id % 7 == 0 slice; the
    // cold group is reused by reference, so no cold row may surface
    assert(feed.filter(col("doc_id") % 7 =!= 0).count() === 0)
    assert(feed.count() > 0)
    // both images of every re-crawled key are present
    val byType = feed.groupBy(col("_change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("insert") === byType("delete"))
  }

  test("changes of version 1 are pure inserts (no parent snapshot)") {
    registerChain()
    val feed = spark.sql("SELECT * FROM graft_vt.cdc_chain.changes VERSION AS OF 1")
    assert(feed.filter(col("_change_type") =!= "insert").count() === 0)
    val v1 = spark.sql("SELECT * FROM graft_vt.cdc_chain VERSION AS OF 1")
    assert(feed.count() === v1.count())
  }

  test("column pruning: a virtual-plus-key projection still answers") {
    registerChain()
    val narrow = spark.sql(
      """SELECT doc_id, _change_type FROM graft_vt.cdc_chain.changes
        |VERSION AS OF 2 WHERE _change_type = 'insert'""".stripMargin)
    assert(narrow.count() > 0)
    assert(narrow.columns.toSeq === Seq("doc_id", "_change_type"))
  }

  test("MOR tombstone-only DELETE commit emits delete rows with full old images") {
    val root = VersionedTable.freshRoot(s"$dir#cdc_mor_spec")
    VtMor.createVersion1(spark, root, docsBase)
    val schema = org.apache.spark.sql.types.StructType(docsBase.schema.fields.map(f =>
      if (f.name == "doc_id") f.copy(nullable = false) else f))
    GraftVtCatalog.registerMor(spark, "cdc_mor_spec", root, schema, keyCol = "doc_id")
    spark.sql("DELETE FROM graft_vt.cdc_mor_spec WHERE doc_id % 9 = 4")
    val feed = spark.sql("SELECT * FROM graft_vt.cdc_mor_spec.changes VERSION AS OF 2")
    assert(feed.filter(col("_change_type") =!= "delete").count() === 0)
    val expected = docsBase.filter(col("doc_id") % 9 === 4)
    assert(feed.count() === expected.count())
    // old images carry the deleted rows' actual content
    val got = feed.select(col("doc_id"), col("text"), col("source"))
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("MOR compose: v1 minus deletes plus inserts IS v2 after an UPDATE") {
    val root = VersionedTable.freshRoot(s"$dir#cdc_mor_upd_spec")
    VtMor.createVersion1(spark, root, docsBase)
    val schema = org.apache.spark.sql.types.StructType(docsBase.schema.fields.map(f =>
      if (f.name == "doc_id") f.copy(nullable = false) else f))
    GraftVtCatalog.registerMor(spark, "cdc_mor_upd", root, schema, keyCol = "doc_id")
    spark.sql(
      "UPDATE graft_vt.cdc_mor_upd SET source = 'touched' WHERE doc_id % 4 = 1")
    val feed = spark.sql("SELECT * FROM graft_vt.cdc_mor_upd.changes VERSION AS OF 2")
    val dels = feed.filter(col("_change_type") === "delete")
      .select(col("doc_id"), col("text"), col("source"))
    val ins = feed.filter(col("_change_type") === "insert")
      .select(col("doc_id"), col("text"), col("source"))
    val v1 = spark.sql("SELECT * FROM graft_vt.cdc_mor_upd VERSION AS OF 1")
    val v2 = spark.sql("SELECT * FROM graft_vt.cdc_mor_upd VERSION AS OF 2")
    val composed = v1.exceptAll(dels).unionByName(ins)
    assert(composed.exceptAll(v2).count() === 0)
    assert(v2.exceptAll(composed).count() === 0)
  }

  test("MOR compaction: compose identity holds; pre-tombstoned rows emit NO spurious deletes") {
    val root = VersionedTable.freshRoot(s"$dir#cdc_mor_compact_spec")
    VtMor.createVersion1(spark, root, docsBase)
    val schema = org.apache.spark.sql.types.StructType(docsBase.schema.fields.map(f =>
      if (f.name == "doc_id") f.copy(nullable = false) else f))
    GraftVtCatalog.registerMor(spark, "cdc_mor_compact", root, schema, keyCol = "doc_id")
    spark.sql("DELETE FROM graft_vt.cdc_mor_compact WHERE doc_id % 9 = 4") // v2: tombstones
    VtMor.compact(spark, "cdc_mor_compact") // v3: layout churn only
    val feed = spark.sql("SELECT * FROM graft_vt.cdc_mor_compact.changes VERSION AS OF 3")
    // rows tombstoned at v2 were NOT part of v2's logical content — the
    // compaction's removed-file deletes must not resurrect them
    assert(feed.filter(col("_change_type") === "delete")
      .filter(col("doc_id") % 9 === 4).count() === 0)
    val dels = feed.filter(col("_change_type") === "delete")
      .select(col("doc_id"), col("text"), col("source"))
    val ins = feed.filter(col("_change_type") === "insert")
      .select(col("doc_id"), col("text"), col("source"))
    val v2 = spark.sql("SELECT * FROM graft_vt.cdc_mor_compact VERSION AS OF 2")
    val v3 = spark.sql("SELECT * FROM graft_vt.cdc_mor_compact VERSION AS OF 3")
    val composed = v2.exceptAll(dels).unionByName(ins)
    assert(composed.exceptAll(v3).count() === 0)
    assert(v3.exceptAll(composed).count() === 0)
    // pure layout churn: every logical row appears as an OFFSETTING
    // delete+insert pair, so a net-change consumer sees zero churn
    assert(dels.exceptAll(ins).count() === 0)
    assert(ins.exceptAll(dels).count() === 0)
  }

  test("changes feed honors RENAME COLUMN: renamed column carries data, not nulls") {
    val root = VersionedTable.buildChain(spark, dir)
    GraftVtCatalog.register(spark, "cdc_renamed", root, docsBase.schema)
    spark.sql("ALTER TABLE graft_vt.cdc_renamed RENAME COLUMN source TO origin")
    val feed = spark.sql(
      """SELECT doc_id, origin, _change_type
        |FROM graft_vt.cdc_renamed.changes VERSION AS OF 2""".stripMargin)
    assert(feed.count() > 0)
    // pre-fix the parquet reader was asked for a column named 'origin'
    // that no file stores — every value silently NULL
    assert(feed.filter(col("origin").isNull).count() === 0)
    // the chain's v2 re-crawl stamps source 'recrawl' on its inserts
    val sources = docsBase.select(col("source")).distinct()
      .collect().map(_.getString(0)).toSet + "recrawl"
    val got = feed.select(col("origin")).distinct().collect().map(_.getString(0)).toSet
    assert(got.nonEmpty && got.subsetOf(sources))
  }

  test("changes over an expired parent fails loudly, not silently-empty") {
    val root = VersionedTable.freshRoot(s"$dir#cdc_expired_spec")
    val base = docsBase
    base.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$root/files/g1")
    VersionedTable.writeManifest(root, 1, Seq("files/g1"))
    base.write.mode("overwrite").parquet(s"$root/files/g2")
    VersionedTable.writeManifest(root, 2, Seq("files/g2"))
    GraftVtCatalog.register(spark, "cdc_expired", root, base.schema)
    // expire v1 (keep only v2), then ask for v2's changes
    VersionedTable.vacuum(root, Seq(2))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_vt.cdc_expired.changes VERSION AS OF 2").collect()
    }
    assert(e.getMessage.contains("expired") || e.getMessage.contains("vacuumed"))
  }
}
