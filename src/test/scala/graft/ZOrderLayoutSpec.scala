package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Pins the POINT of the z-order layout: one sort order that gives
  * file-level min/max locality on BOTH dimensions, so stats-based file
  * skipping works for predicates on either column — where a
  * single-column sort clusters only its own column.
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import TestSpark.spark.implicits._

  private val Files = 16
  private val Range16 = 65536.0

  /** Per-file (min,max) spans of zx and zy, normalized to [0,1]. */
  private def fileSpans(dir: String): Seq[(Double, Double)] =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min("zx").as("x0"), max("zx").as("x1"),
        min("zy").as("y0"), max("zy").as("y1"))
      .select((col("x1") - col("x0")) / Range16, (col("y1") - col("y0")) / Range16)
      .as[(Double, Double)].collect().toSeq

  test("z-order files are narrow in BOTH dims; x-sort leaves y unclustered") {
    val df = ZOrder.zValuedEvents(spark, TestSpark.sf0001)
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder-").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft-xsort-").toString
    locally {
      ZOrder.writeZOrdered(df, col("zval"), zDir, Files)
      ZOrder.writeZOrdered(df, col("zx"), xDir, Files) // the lexicographic strawman
      val z = fileSpans(zDir)
      val x = fileSpans(xDir)
      assert(z.size >= Files / 2 && x.size >= Files / 2, "enough files to measure")
      def mean(s: Seq[Double]) = s.sum / s.size
      val (zxSpan, zySpan) = (mean(z.map(_._1)), mean(z.map(_._2)))
      val (xxSpan, xySpan) = (mean(x.map(_._1)), mean(x.map(_._2)))
      // x-sort: x tightly clustered, y spans ~everything
      assert(xxSpan < 0.2, s"x-sorted files should be narrow in x (got $xxSpan)")
      assert(xySpan > 0.8, s"x-sorted files should be WIDE in y (got $xySpan)")
      // z-order: BOTH dims substantially narrower than the full range —
      // a z-range tile of 1/16 of the curve bounds each dim's span near
      // sqrt(1/16) = 1/4 of its range
      assert(zxSpan < 0.5 && zySpan < 0.5,
        s"z-ordered files must be narrow in both dims (got $zxSpan, $zySpan)")
      // 2-D box query: fraction of files whose stats intersect the box —
      // the skipping a stats-pruning reader gets for free
      def touched(spans: String): Long =
        spark.read.parquet(spans)
          .groupBy(input_file_name())
          .agg(min("zx").as("x0"), max("zx").as("x1"),
            min("zy").as("y0"), max("zy").as("y1"))
          .filter(col("x1") >= 0 && col("x0") <= 16384 &&
            col("y1") >= 0 && col("y0") <= 16384) // the [0, 1/4)² corner box
          .count()
      assert(touched(zDir) < z.size, "z-order must let a 2-D box skip files")
    }
  }

  test("morton code is a bijection on the 16-bit grid (sampled) and monotone in tiles") {
    // interleave16 must place bit i of x at 2i and of y at 2i+1 — check
    // against a reference implementation on a deterministic sample
    val rows = Seq.tabulate(512) { i => (i * 131L % 65536, i * 7919L % 65536) }
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave16(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (x, y, z) =>
      var expect = 0L
      var i = 0
      while (i < 16) {
        expect |= ((x >> i) & 1L) << (2 * i)
        expect |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      assert(z == expect, s"morton($x, $y)")
      // de-interleave restores the inputs — no bit collides
      var bx = 0L; var by = 0L; var j = 0
      while (j < 16) {
        bx |= ((z >> (2 * j)) & 1L) << j
        by |= ((z >> (2 * j + 1)) & 1L) << j
        j += 1
      }
      assert(bx == x && by == y)
    }
  }
}
