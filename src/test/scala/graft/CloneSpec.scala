package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.sources.{GraftVtCatalog, VersionedTable}

/** Pins for `CALL graft_vt.clone` (q_sql_clone): the zero-copy claim
  * (hard links — shared inodes, no data bytes), divergence isolation in
  * both directions, and the vacuum-safety property the hard-link design
  * makes structural (unlinking a shared group on the source cannot
  * strand the clone — the filesystem refcounts the inodes).
  *
  * The destructive sections (DELETE on the source, vacuum) run on
  * SPEC-PRIVATE tables built fresh per invocation — never on the shared
  * `dml_clone_src`/`dml_clone_dst` pair that q_sql_clone's oracle
  * assumes holds the full `documents` relation (a suite-order-dependent
  * parity gate otherwise).
  */
class CloneSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf0001

  /** Fresh (src, dst) vt-table pair over `documents`; the sequence
    * suffix keeps re-runs in one JVM from tripping clone's
    * destination-exists refusal.
    */
  private def freshPair(): (String, String) = {
    val k = CloneSpec.seq.incrementAndGet()
    val src = s"clone_spec_src_$k"
    val base = sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val root = VersionedTable.freshRoot(s"$sf#$src")
    base.write.mode("overwrite").parquet(s"$root/files/base_v1")
    VersionedTable.writeManifest(root, 1, Seq("files/base_v1"))
    GraftVtCatalog.register(spark, src, root, base.schema)
    (src, s"clone_spec_dst_$k")
  }

  test("clone: hard-linked zero-copy, divergence isolated, vacuum-safe") {
    // the shared q_sql_clone pair is only READ here (sqlClone itself
    // inserts into the clone side — that is the query's own contract)
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
      scala.util.Using.resource(java.nio.file.Files.walk(from)) { walk =>
        walk.forEach { p =>
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
    }
    assert(checked > 0, "no data files checked")

    // destructive half: spec-private tables only
    val (src, dst) = freshPair()
    spark.sql(s"CALL graft_vt.clone('$src', '$dst')").collect()

    // independence: a COW delete on the SOURCE must not move the clone
    val cloneBefore = spark.table(s"graft_vt.$dst").count()
    val srcBefore = spark.table(s"graft_vt.$src").count()
    spark.sql(s"DELETE FROM graft_vt.$src WHERE doc_id % 2 = 0")
    assert(spark.table(s"graft_vt.$src").count() < srcBefore)
    assert(spark.table(s"graft_vt.$dst").count() == cloneBefore,
      "source delete leaked into the clone")

    // vacuum-safety: dropping the source's retained history unlinks the
    // shared v1 group on the source side; the clone's links keep the
    // inodes alive and every clone row stays readable
    spark.sql(s"CALL graft_vt.vacuum('$src', 1)").collect()
    assert(spark.table(s"graft_vt.$dst").count() == cloneBefore,
      "vacuuming the source stranded the clone")
  }

  test("clone: refuses an existing destination and unknown sources") {
    val (src, dst) = freshPair()
    spark.sql(s"CALL graft_vt.clone('$src', '$dst')").collect()
    val dup = intercept[Exception](
      spark.sql(s"CALL graft_vt.clone('$src', '$dst')").collect())
    assert(dup.getMessage.contains("already exists"))
    val missing = intercept[Exception](
      spark.sql("CALL graft_vt.clone('no_such_table', 'clone_spec_x')").collect())
    assert(missing.getMessage.contains("unknown") ||
      missing.getMessage.contains("no_such_table"))
  }
}

object CloneSpec {
  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)
}
