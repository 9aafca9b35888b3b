package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet sink (SURVEY §2B source/sink inventory): thin, deliberate
  * wrapper so callers state partitioning intent explicitly — at 100 TB
  * the difference between an unpartitioned dump and a
  * `partitionBy(date)`-style layout is the difference between full scans
  * and partition pruning for every downstream reader.
  */
object ParquetSink {

  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  // JVM-unique so concurrent processes can't clobber each other's files
  // mid-read; the (single, lazy) shutdown hook keeps repeated
  // Verify/Bench/test JVMs from accumulating full event-table copies in
  // the (often tmpfs) tmpdir.
  private val jvmTag = java.util.UUID.randomUUID().toString.take(8)
  private lazy val partDir: String = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_part_$jvmTag")
    sys.addShutdownHook {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
      }
      del(dir)
    }
    dir.getAbsolutePath
  }

  /** Engine query for the partitioned layout: write events partitioned
    * by event_type, read back filtered to ONE partition value, and
    * aggregate. The filter resolves against directory names before any
    * file opens (PartitionFilters on the scan, asserted by
    * `ScanPruningSpec`) — the 100 TB reader touches 1/|event types| of
    * the files; the oracle checks the aggregate over the unpartitioned
    * original, pinning that layout never changes results.
    */
  def partitionPrunedEvents(spark: SparkSession, dir: String): DataFrame = {
    val out = partDir
    write(Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("ts"), col("value")),
      out, partitionBy = Seq("event_type"))
    read(spark, out)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
  }
}
