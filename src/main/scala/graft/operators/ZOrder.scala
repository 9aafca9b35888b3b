package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Z-order (Morton-curve) data layout: interleave the bits of two sort
  * dimensions so ONE sort order gives file-level min/max locality on
  * BOTH columns at once.
  *
  * This is the standard answer to "my scans filter on x sometimes and y
  * other times" at 100 TB: a lexicographic sort on (x, y) clusters x
  * perfectly and y not at all, while directory partitioning on both
  * explodes into tiny files. Writing range-partitioned and sorted by
  * the Morton code keeps every parquet file's (min, max) footprint
  * narrow in x AND y simultaneously, so format-level stats skipping
  * (row-group/file pruning on min/max) works for predicates on either
  * dimension. `ZOrderLayoutSpec` measures exactly that: per-file spans
  * shrink in both dimensions vs a single-column sort, and a 2-D box
  * query touches a fraction of the files.
  *
  * The Morton code itself is a STATIC expression tree of built-in
  * bitwise ops (shift/and/or — 16 terms per dimension), so it runs
  * inside whole-stage codegen with no UDF and DuckDB can evaluate the
  * same formula for the oracle.
  */
object ZOrder {

  /** 32-bit Morton code from two 16-bit values: bit i of `x` lands at
    * even position 2i, bit i of `y` at odd position 2i+1. Inputs must
    * already be in [0, 65536) — callers scale/clamp first.
    */
  def interleave16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The z-value projection over `events` used by both the oracle query
    * and the layout writer.
    *
    * Raw column values can't be interleaved directly: if one dimension
    * spans 20 bits and the other 4 (event_id vs user_id here), the wide
    * dimension owns every high Morton bit and the "z-order" silently
    * degenerates to a single-column sort. So, as production z-ordering
    * does, each dimension is first GRIDDED monotonically onto the full
    * 16-bit range from its global min/max — one tiny aggregate over the
    * two columns, broadcast back (the same single-row-stats crossJoin
    * shape as TF-IDF's corpus count; at 100 TB this pass reads two
    * columns and ships 4 longs). Long arithmetic throughout, so the
    * gridding is exact and DuckDB reproduces it with integer division.
    */
  def zValuedEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val bounds = ev.agg(
      min(col("event_id")).as("xmin"), max(col("event_id")).as("xmax"),
      min(col("user_id")).as("ymin"), max(col("user_id")).as("ymax"))
    ev.crossJoin(broadcast(bounds))
      .select(
        col("event_id"),
        expr("(event_id - xmin) * 65535 DIV greatest(xmax - xmin, 1)").as("zx"),
        expr("(user_id - ymin) * 65535 DIV greatest(ymax - ymin, 1)").as("zy"))
      .select(
        col("event_id"), col("zx"), col("zy"),
        interleave16(col("zx"), col("zy")).as("zval"))
  }

  /** Append an overflow-safe Morton `zval` column over two BIGINT
    * dimensions of `df` — the shared gridding used by every z-LAYOUT
    * site (the table format's writer and OPTIMIZE ZORDER). Bounds come
    * from one tiny aggregate broadcast back; the grid arithmetic runs
    * in DECIMAL(38,0), so a dimension spanning the full BIGINT range
    * (where `(x - min) * 65535` overflows Long and ANSI mode would
    * fail the statement) still grids exactly; `span + 1` as the
    * divisor keeps the result in [0, 65535] and dodges div-by-zero in
    * one move. Layout-only: zval never reaches results, so callers'
    * oracles are untouched by the arithmetic choice (unlike
    * [[zValuedEvents]], whose formula IS oracle-mirrored and stays).
    */
  def zValued(df: DataFrame, xc: String, yc: String): DataFrame = {
    val bounds = df.agg(
      min(col(xc)).as("zb_xmin"), max(col(xc)).as("zb_xmax"),
      min(col(yc)).as("zb_ymin"), max(col(yc)).as("zb_ymax"))
    def grid(c: String, lo: String, hi: String) = expr(
      s"""CAST((CAST($c AS DECIMAL(38,0)) - CAST($lo AS DECIMAL(38,0))) * 65535
         | DIV (CAST($hi AS DECIMAL(38,0)) - CAST($lo AS DECIMAL(38,0)) + 1)
         | AS BIGINT)""".stripMargin.replace("\n", ""))
    df.crossJoin(broadcast(bounds))
      .withColumn("zval",
        interleave16(grid(xc, "zb_xmin", "zb_xmax"), grid(yc, "zb_ymin", "zb_ymax")))
      .drop("zb_xmin", "zb_xmax", "zb_ymin", "zb_ymax")
  }

  /** Write `df` in z-order: range-partition by the Morton code (each
    * output file owns a contiguous z-range → a compact 2-D tile) and
    * sort within partitions so row-group stats are tight too. Layout
    * only — content is untouched, which is what the oracle checks.
    */
  def writeZOrdered(df: DataFrame, zcol: Column, outDir: String, files: Int): Unit =
    df.repartitionByRange(files, zcol)
      .sortWithinPartitions(zcol)
      .write.mode("overwrite").parquet(outDir)
}
