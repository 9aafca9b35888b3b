package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SqlDml
import graft.sources.{BloomMap, GraftVtCatalog, VersionedTable, ZoneMapScanBuilder}

/** Per-file bloom sidecars: point-lookup file skipping on columns the
  * layout does not order. The oracle gate (q_bloom_skip) proves
  * results; this suite pins that the probe actually SKIPS — on a
  * hash-distributed BIGINT key, on a STRING key (hash agreement
  * between the distributed builder and the driver probe), to ZERO
  * files for an absent key — and that a version without sidecars
  * reads unpruned but correct.
  */
class BloomSkipSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def prunedCount(sql: String): (Int, Int) = {
    ZoneMapScanBuilder.lastPrune = (0, 0)
    spark.sql(sql).collect(): Unit
    ZoneMapScanBuilder.lastPrune
  }

  test("a point IN-lookup binds fewer files than the manifest names") {
    SqlDml.sqlBloomSkip(spark, dir).collect(): Unit
    val (all, kept) = prunedCount(
      "SELECT count(*) FROM graft_vt.vt_bloomed WHERE doc_id IN (10, 25, 99)")
    assert(all >= 8, s"fixture should expose 8 hash files, got $all")
    assert(kept < all, s"3 keys must not bind all $all files (kept $kept)")
    assert(kept >= 1, "the keys exist, so their files must be kept")
  }

  test("an absent key prunes every file; results stay exact (gate twin)") {
    val out = SqlDml.sqlBloomSkip(spark, dir).collect()
    val exp = graft.sources.Tables(spark, dir, "documents")
      .filter(col("doc_id").isin(10L, 25L, 99L)).count()
    assert(out.length.toLong == exp && exp == 3)
    val (all, kept) = prunedCount(
      "SELECT count(*) FROM graft_vt.vt_bloomed WHERE doc_id = -12345")
    assert(all >= 8 && kept == 0,
      s"an absent key should prove every file empty ($kept/$all)")
  }

  test("string keys probe consistently (distributed build == driver hash)") {
    val base = graft.sources.Tables(spark, dir, "documents")
      .select(concat(lit("k"), col("doc_id")).as("k"), col("source"))
    val root = java.nio.file.Files.createTempDirectory("graft_bloom_str").toString
    base.repartition(8, col("k")).write.mode("overwrite").parquet(s"$root/files/base_v1")
    VersionedTable.writeManifest(root, 1, Seq("files/base_v1"))
    BloomMap.analyze(spark, root, 1, "k"): Unit
    GraftVtCatalog.register(spark, "bloom_str", root, base.schema)
    GraftVtCatalog.registerBloomCols("bloom_str", Seq("k"))
    val (all, kept) = prunedCount(
      "SELECT count(*) FROM graft_vt.bloom_str WHERE k = 'k42'")
    assert(kept < all, s"a present string key must prune ($kept/$all)")
    assert(spark.sql("SELECT count(*) FROM graft_vt.bloom_str WHERE k = 'k42'")
      .collect().head.getLong(0) == 1,
      "the key's own file must never be pruned (no false negatives)")
  }

  test("a DML'd version has no sidecar: unpruned but correct") {
    SqlDml.sqlBloomSkip(spark, dir).collect(): Unit
    spark.sql("UPDATE graft_vt.vt_bloomed SET source = 'touched' WHERE doc_id = 10")
    ZoneMapScanBuilder.lastPrune = (-1, -1)
    val n = spark.sql(
      "SELECT count(*) FROM graft_vt.vt_bloomed WHERE doc_id IN (10, 25, 99)")
      .collect().head.getLong(0)
    assert(n == 3)
    assert(ZoneMapScanBuilder.lastPrune == ((-1, -1)),
      "no sidecar for the new version -> the plain parquet path")
    assert(spark.sql("SELECT source FROM graft_vt.vt_bloomed WHERE doc_id = 10")
      .collect().head.getString(0) == "touched")
  }
}
