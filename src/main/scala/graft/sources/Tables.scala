package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the `/root/testdata/sf*` star schema.
  * One `spark.read.parquet` per table — Catalyst pushes filters and prunes
  * columns into the scan, so callers never pre-trim anything here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Raw read — `events.ts` arrives as long nanos (see nanosAsLong note
    * in build.sbt: Spark's parquet reader rejects TIMESTAMP(NANOS)).
    */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** ns-epoch long → TIMESTAMP_NTZ (µs). Integer DIV, not `/` — double
    * division would lose precision on 1.7e18-scale nanos.
    */
  val tsFromNanosExpr: String = "CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = raw(spark, dir, name)
    if (name == "events") df.withColumn("ts", org.apache.spark.sql.functions.expr(tsFromNanosExpr))
    else df
  }
}
