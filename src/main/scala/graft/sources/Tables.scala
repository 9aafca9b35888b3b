package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StructType}

/** Parquet table loader for the `/root/testdata/sf*` star schema.
  * One `spark.read.parquet` per table — Catalyst pushes filters and prunes
  * columns into the scan, so callers never pre-trim anything here.
  *
  * `events.ts` has shipped in two physical layouts across testdata
  * generations: TIMESTAMP(NANOS) (which Spark's reader surfaces as long
  * nanos under `nanosAsLong` — it rejects the logical type otherwise) and
  * plain TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ). Everything
  * downstream is schema-driven via [[tsNtzSql]] / [[tsMicrosSql]] so both
  * layouts — and any future regeneration — read identically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Raw read — `events.ts` arrives exactly as stored (long nanos or
    * native timestamp, see the object doc).
    */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** True when the on-disk `ts` column is the legacy long-nanos layout. */
  def tsIsLongNanos(schema: StructType): Boolean =
    schema("ts").dataType == LongType

  /** SQL expression normalizing the stored `ts` to TIMESTAMP_NTZ (µs).
    * Long layout: integer DIV, not `/` — double division would lose
    * precision on 1.7e18-scale nanos.
    */
  def tsNtzSql(schema: StructType): String =
    if (tsIsLongNanos(schema)) "CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"
    else "CAST(ts AS TIMESTAMP_NTZ)"

  /** SQL expression for `ts` as an exact micro-epoch BIGINT — the integer
    * domain the sweep-line/interval operators compute in (µs is the finest
    * resolution both engines preserve, and integer arithmetic is exact
    * where double epoch math is not). The NTZ branch round-trips through
    * the session time zone, which GraftSession pins to UTC, so the naive
    * wall-clock micros come back unshifted.
    */
  def tsMicrosSql(schema: StructType): String =
    if (tsIsLongNanos(schema)) "ts DIV 1000"
    else "unix_micros(CAST(ts AS TIMESTAMP))"

  /** Content fingerprint of `dir/name.parquet` — (path, length, mtime) of
    * every file under the table dir, hashed. Memoized trained models
    * (PQ codebooks, BPE merge tables) key on THIS rather than the raw dir
    * string, so rewriting the parquet in-place within one JVM (a spec
    * reusing a temp dir with mode=overwrite) invalidates the cache instead
    * of silently serving a stale model. Falls back to the path string for
    * non-local URIs (the caches are a local-JVM convenience either way).
    */
  def fingerprint(dir: String, name: String): String = {
    val root = new java.io.File(s"$dir/$name.parquet")
    if (!root.exists()) s"$dir/$name.parquet"
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      def walk(f: java.io.File): Unit = {
        md.update(s"${f.getPath}|${f.length()}|${f.lastModified()};".getBytes("UTF-8"))
        if (f.isDirectory) f.listFiles().sortBy(_.getName).foreach(walk)
      }
      walk(root)
      md.digest().map("%02x".format(_)).mkString
    }
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = raw(spark, dir, name)
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr(tsNtzSql(df.schema)))
    else df
  }
}
