package graft

import org.apache.spark.sql.functions.{col, length}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftVtCatalog, VersionedTable, VtBucket}

/** Bucket-count evolution (`CALL graft_vt.rebucket`): the oracle gate
  * pins q_rebucket's content; this suite pins the contracts — the
  * post-evolution SPJ plans ZERO exchanges at the new count, content is
  * invariant under the rewrite, the PRE-rebucket snapshot reads
  * correctly but must NOT claim the new partitioning (a stale claim
  * would silently mis-align a storage-partitioned join), and the
  * validity boundary follows the table through DROP.
  */
class RebucketSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def base = graft.sources.Tables(spark, dir, "documents")
    .select(col("doc_id"), col("text"), col("source"))

  private def mkBucketed(name: String, df: org.apache.spark.sql.DataFrame, n: Int): String = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_rbk_$name").toString
    VtBucket.writeBucketed(df, "doc_id", n, s"$root/files/base_v1")
    VersionedTable.writeManifest(root, 1, Seq("files/base_v1"))
    GraftVtCatalog.registerBucketed(spark, name, root, df.schema, "doc_id", n)
    root
  }

  test("rebucket 4→8: content invariant, SPJ at the new count plans no exchange") {
    mkBucketed("rbk_t", base, 4)
    mkBucketed("rbk_ann8", base.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars")), 8)
    val before = spark.table("graft_vt.rbk_t").collect().map(_.toString).sorted.toSeq
    val r = spark.sql("CALL graft_vt.rebucket('rbk_t', 8)").collect().head
    assert(r.getInt(0) == 4 && r.getInt(1) == 8 && r.getInt(2) == 2)
    val after = spark.table("graft_vt.rbk_t").collect().map(_.toString).sorted.toSeq
    assert(after == before, "rebucket must not change content")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val joined = spark.sql(
      """SELECT a.doc_id, b.n_chars FROM graft_vt.rbk_t a
        |JOIN graft_vt.rbk_ann8 b ON a.doc_id = b.doc_id""".stripMargin)
    assert(joined.count() == before.length)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"post-rebucket SPJ at the new count must not shuffle:\n$plan")
  }

  test("pre-rebucket snapshot reads correct rows and claims no KeyGroupedPartitioning") {
    mkBucketed("rbk_tt", base, 4)
    spark.sql("CALL graft_vt.rebucket('rbk_tt', 8)").collect()
    val v1 = spark.sql("SELECT * FROM graft_vt.rbk_tt VERSION AS OF 1")
    assert(v1.count() == base.count(), "old snapshot must stay readable")
    // the old layout's b=<i> dirs encode modulus 4 — the scan must not
    // report the new bucket(8) partitioning (a downstream SPJ would
    // align wrong rows); the fallback is a plain parquet scan
    val plan = v1.queryExecution.executedPlan.toString
    assert(!plan.contains("bucketed(8"),
      s"pre-rebucket snapshot must not claim the new layout:\n$plan")
    // and joining the OLD snapshot against an 8-bucketed table must
    // produce correct results (shuffled plan is fine — required, even)
    mkBucketed("rbk_probe8", base.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars")), 8)
    val j = spark.sql(
      """SELECT a.doc_id FROM graft_vt.rbk_tt VERSION AS OF 1 a
        |JOIN graft_vt.rbk_probe8 b ON a.doc_id = b.doc_id""".stripMargin)
    assert(j.count() == base.count())
  }

  test("rebucket refuses non-bucketed tables; boundary cleared on DROP") {
    GraftVtCatalog.ensure(spark)
    spark.sql("DROP TABLE IF EXISTS graft_vt.rbk_plain")
    base.limit(5).createOrReplaceTempView("rbk_plain_src")
    spark.sql("CREATE TABLE graft_vt.rbk_plain AS SELECT * FROM rbk_plain_src")
    val e = intercept[Exception] {
      spark.sql("CALL graft_vt.rebucket('rbk_plain', 8)").collect()
    }
    assert(e.getMessage.contains("not bucketed"))
    spark.sql("DROP TABLE graft_vt.rbk_plain")
    // lifecycle: a rebucketed table's validity boundary dies with the
    // table — a fresh same-name table at version 1 must claim its
    // layout again (a leaked boundary of 2 would silently demote every
    // scan of the new table to the plain-file fallback)
    mkBucketed("rbk_drop", base, 4)
    spark.sql("CALL graft_vt.rebucket('rbk_drop', 8)").collect()
    spark.sql("DROP TABLE graft_vt.rbk_drop")
    mkBucketed("rbk_drop", base.select(col("doc_id"), col("source")), 8)
    mkBucketed("rbk_drop_ann", base.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars")), 8)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val j2 = spark.sql(
      """SELECT a.doc_id FROM graft_vt.rbk_drop a
        |JOIN graft_vt.rbk_drop_ann b ON a.doc_id = b.doc_id""".stripMargin)
    val plan2 = j2.queryExecution.executedPlan.toString
    assert(!plan2.contains("Exchange"),
      s"re-created table must claim its own layout from v1 (stale boundary leaked?):\n$plan2")
  }
}
