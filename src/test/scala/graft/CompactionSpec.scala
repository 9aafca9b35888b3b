package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Compaction, Tables}

/** Pins the compaction contract the oracle can't see: the output file
  * COUNT is sized from real input bytes, the files come out evenly
  * sized, and content is a perfect multiset round-trip.
  */
class CompactionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def dataFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles.toSeq
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))

  test("compact: ceil(bytes/target) files, even sizes, content untouched") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact-spec-").toString
    val frag = s"$base/frag"
    val out = s"$base/out"
    val events = Tables(spark, TestSpark.sf0001, "events")
    events.repartition(32).write.mode("overwrite").parquet(frag)
    assert(dataFiles(frag).size == 32, "fixture must start fragmented")

    val inBytes = Compaction.dataBytes(spark, frag)
    val target = inBytes / 4 + 1 // force ~4 output files
    val n = Compaction.compact(spark, frag, out, target)
    assert(n == ((inBytes + target - 1) / target).toInt, "count sized from real bytes")

    val outFiles = dataFiles(out)
    assert(outFiles.size == n, s"expected $n data files, found ${outFiles.size}")
    // round-robin repartition → no output file dominates (2x headroom for
    // parquet per-file footer overhead on a small fixture)
    val sizes = outFiles.map(_.length.toDouble)
    assert(sizes.max <= 2.0 * (sizes.sum / sizes.size),
      s"file sizes skewed: ${sizes.sorted.mkString(", ")}")

    // multiset-identical content
    val a = events.groupBy(col("event_id")).count()
    val b = spark.read.parquet(out).groupBy(col("event_id")).count()
    assert(a.except(b).isEmpty && b.except(a).isEmpty, "compaction changed content")
  }

  test("compact: already-compact input collapses to a single file") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact-one-").toString
    val in = s"$base/in"
    val out = s"$base/out"
    Tables(spark, TestSpark.sf0001, "events").repartition(4)
      .write.mode("overwrite").parquet(in)
    val n = Compaction.compact(spark, in, out, targetBytes = 1L << 30)
    assert(n == 1 && dataFiles(out).size == 1)
  }
}
