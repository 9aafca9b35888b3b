package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftVtCatalog, VersionedTable}

/** Pins for `CALL graft_vt.clone` (q_sql_clone): the zero-copy claim
  * (hard links — shared inodes, no data bytes), divergence isolation in
  * both directions, and the vacuum-safety property the hard-link design
  * makes structural (unlinking a shared group on the source cannot
  * strand the clone — the filesystem refcounts the inodes).
  */
class CloneSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf0001

  test("clone: hard-linked zero-copy, divergence isolated, vacuum-safe") {
    val out = graft.operators.SqlDml.sqlClone(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("clone")._1 == out("src")._1 + 2, s"divergence accounting: $out")
    assert(out("clone")._2 == out("src")._2 + 900001L + 900002L)

    val srcRoot = GraftVtCatalog.rootOf("dml_clone_src").get
    val dstRoot = GraftVtCatalog.rootOf("dml_clone_dst").get
    assert(srcRoot != dstRoot)

    // zero-copy: every cloned v1 group file shares its inode with the
    // source original (hard link, not a byte copy)
    val groups = VersionedTable.manifest(dstRoot, 1)
    assert(groups.nonEmpty)
    var checked = 0
    groups.foreach { g =>
      val from = java.nio.file.Paths.get(s"$srcRoot/$g")
      java.nio.file.Files.walk(from).forEach { p =>
        if (!java.nio.file.Files.isDirectory(p)) {
          val twin = java.nio.file.Paths.get(s"$dstRoot/$g")
            .resolve(from.relativize(p))
          assert(java.nio.file.Files.exists(twin), s"missing clone twin for $p")
          assert(java.nio.file.Files.getAttribute(p, "unix:ino") ==
            java.nio.file.Files.getAttribute(twin, "unix:ino"),
            s"clone file is a copy, not a link: $twin")
          checked += 1
        }
      }
    }
    assert(checked > 0, "no data files checked")

    // independence: a COW delete on the SOURCE must not move the clone
    val cloneBefore = spark.table("graft_vt.dml_clone_dst").count()
    val srcBefore = spark.table("graft_vt.dml_clone_src").count()
    spark.sql("DELETE FROM graft_vt.dml_clone_src WHERE doc_id % 2 = 0")
    assert(spark.table("graft_vt.dml_clone_src").count() < srcBefore)
    assert(spark.table("graft_vt.dml_clone_dst").count() == cloneBefore,
      "source delete leaked into the clone")

    // vacuum-safety: dropping the source's retained history unlinks the
    // shared v1 group on the source side; the clone's links keep the
    // inodes alive and every clone row stays readable
    spark.sql("CALL graft_vt.vacuum('dml_clone_src', 1)").collect()
    assert(spark.table("graft_vt.dml_clone_dst").count() == cloneBefore,
      "vacuuming the source stranded the clone")
  }

  test("clone: refuses an existing destination and unknown sources") {
    graft.operators.SqlDml.sqlClone(spark, sf).collect()
    val dup = intercept[Exception](
      spark.sql("CALL graft_vt.clone('dml_clone_src', 'dml_clone_dst')").collect())
    assert(dup.getMessage.contains("already exists"))
    val missing = intercept[Exception](
      spark.sql("CALL graft_vt.clone('no_such_table', 'dml_clone_x')").collect())
    assert(missing.getMessage.contains("unknown") ||
      missing.getMessage.contains("no_such_table"))
  }
}
