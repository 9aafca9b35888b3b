package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.JsonText.{quote => q}

/** Per-file BLOOM-FILTER sidecars — point-lookup data skipping for
  * columns the layout does NOT order. Zone maps answer range questions
  * on the clustered/z-ordered dimensions; a bloom sidecar answers
  * "which files can possibly hold key = v" on any OTHER column: each
  * file carries a few-KB filter over its values, and an equality/IN
  * probe drops every file whose filter proves the key absent.
  *
  * At 100 TB the shape matters: an unclustered point lookup otherwise
  * schedules a task per file just to let parquet row-group stats reject
  * it (min/max on a hash-distributed column spans everything, so even
  * footers don't help). The bloom sidecar is driver-resident — KBs per
  * file, same cost class as the manifest — and prunes BEFORE planning.
  * False positives only ever ADD files; the residual filter removes
  * their rows, so pruning is provably invisible to results.
  *
  * Filters are built with ONE distributed aggregation per column
  * ([[analyze]], Spark's own `BloomFilterAggregate` grouped by file —
  * the same mergeable sketch `InjectRuntimeFilter` plants), keyed by
  * `xxhash64(col)`; the driver probes with the identical hash, so both
  * sides agree byte-for-byte. Versions written later without fresh
  * sidecars read unpruned (conservative, like every sidecar here).
  */
object BloomMap {

  private def sidecar(root: String, version: Int, col: String) =
    java.nio.file.Paths.get(s"$root/_bloom_v${version}_$col.json")

  /** Build the sidecar for manifest `version`: one bloom per file over
    * `xxhash64(col)`, sized for `itemsPerFile` (~8 bits/key). Returns
    * the number of files analyzed.
    */
  def analyze(spark: SparkSession, root: String, version: Int, col: String,
      itemsPerFile: Long = 100000L): Int = {
    graft.GraftSession.register(spark)
    val files = VersionedTable.manifest(root, version).flatMap(ZoneMap.leafFiles(root, _))
    val prefix = new java.io.File(root).getAbsolutePath + "/"
    val numBits = math.max(64L, itemsPerFile * 8L)
    val rows = spark.read.parquet(files.map(f => s"$root/$f"): _*)
      .groupBy(input_file_name().as("__file"))
      .agg(expr(s"graft_bloom_agg(xxhash64($col), " +
        s"CAST($itemsPerFile AS BIGINT), CAST($numBits AS BIGINT))").as("bloom"))
      .collect()
      .flatMap { r =>
        val abs = java.net.URLDecoder.decode(
          r.getString(0).stripPrefix("file://"), "UTF-8")
        // an all-null column yields a null sketch: leave the file out of
        // the sidecar (kept by every probe — no non-null key to find)
        if (r.isNullAt(1)) None
        else Some(abs.stripPrefix(prefix) ->
          java.util.Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](1)))
      }
    val body = rows.sortBy(_._1).map { case (p, b64) => s"${q(p)}: ${q(b64)}" }
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(sidecar(root, version, col), body): Unit
    rows.length
  }

  private val entryRe = """"([^"]+)":\s*"([^"]*)"""".r

  /** Deserialized filters, memoized per sidecar (path, mtime) — probes
    * are driver-side and repeated, deserialization is not free.
    */
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(String, Long), Map[String, BloomFilter]]

  /** relPath -> filter, or None when no sidecar exists for this
    * (version, column). Files absent from the sidecar are never pruned.
    */
  def read(root: String, version: Int, col: String): Option[Map[String, BloomFilter]] = {
    val p = sidecar(root, version, col)
    if (!java.nio.file.Files.exists(p)) None
    else {
      val key = (p.toString, java.nio.file.Files.getLastModifiedTime(p).toMillis)
      Some(cache.getOrElseUpdate(key, {
        // bound the cache: superseded mtimes of this sidecar always go,
        // and a hard cap stops version churn across many tables from
        // accumulating filters (each entry is files × ~100 KB of heap)
        cache.keys.filter(k => k._1 == key._1 && k._2 != key._2)
          .foreach(cache.remove(_): Unit)
        if (cache.size >= 64) cache.clear()
        entryRe.findAllMatchIn(java.nio.file.Files.readString(p)).map { m =>
          m.group(1) -> BloomFilter.readFrom(new java.io.ByteArrayInputStream(
            java.util.Base64.getDecoder.decode(m.group(2))))
        }.toMap
      }))
    }
  }

  /** The same hash the aggregation inserted: `xxhash64(col)` with
    * Spark's default seed, evaluated driver-side on the literal.
    */
  private def xx(value: Any, dt: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val lit = value match {
      case s: String => Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s), dt)
      case other => Literal(other, dt)
    }
    XxHash64(Seq(lit), 42L).eval(null).asInstanceOf[Long]
  }

  /** The column type a probe literal can stand for — v1 filter values
    * arrive as JVM externals (String) OR catalyst internals
    * (UTF8String) depending on who built the filter; both probe.
    */
  private def litType(v: Any): Option[org.apache.spark.sql.types.DataType] = v match {
    case _: Long => Some(org.apache.spark.sql.types.LongType)
    case _: Int => Some(org.apache.spark.sql.types.IntegerType)
    case _: String => Some(org.apache.spark.sql.types.StringType)
    case _: org.apache.spark.unsafe.types.UTF8String =>
      Some(org.apache.spark.sql.types.StringType)
    case _ => None
  }

  /** Can `filter` possibly match a row of a file with this bloom? Only
    * equality shapes answer (that is what a bloom knows), and only when
    * the literal's runtime type IS the column's type — the aggregation
    * hashed values at the column's width, so probing an Int literal
    * against a BIGINT column would hash differently and mis-prune;
    * mismatches (and every other shape) keep the file.
    */
  def mayMatch(filter: org.apache.spark.sql.sources.Filter, bcol: String,
      colType: org.apache.spark.sql.types.DataType, bloom: BloomFilter): Boolean = {
    import org.apache.spark.sql.sources._
    def probeable(v: Any): Boolean = litType(v).contains(colType)
    filter match {
      case EqualTo(c, v) if c == bcol && probeable(v) =>
        bloom.mightContainLong(xx(v, colType))
      case In(c, vs) if c == bcol && vs.forall(probeable) =>
        vs.isEmpty || vs.exists(v => bloom.mightContainLong(xx(v, colType)))
      case And(l, r) => mayMatch(l, bcol, colType, bloom) && mayMatch(r, bcol, colType, bloom)
      case Or(l, r) => mayMatch(l, bcol, colType, bloom) || mayMatch(r, bcol, colType, bloom)
      case _ => true
    }
  }

  /** The files a scan must read: drop every file whose bloom PROVES the
    * pushed equality filters can't match. Conservative by construction.
    */
  def prune(blooms: Map[String, BloomFilter], col: String,
      colType: org.apache.spark.sql.types.DataType,
      filters: Seq[org.apache.spark.sql.sources.Filter], files: Seq[String]): Seq[String] =
    files.filter { f =>
      blooms.get(f) match {
        case None => true
        case Some(b) => filters.forall(mayMatch(_, col, colType, b))
      }
    }
}
