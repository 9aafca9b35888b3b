package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
