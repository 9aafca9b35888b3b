package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.JsonText.{quote => q}

/** File-level zone maps for versioned tables — the data-skipping tier a
  * table format adds ABOVE parquet's own row-group statistics: per-file
  * [min, max] of a long cluster column, kept in a sidecar next to the
  * manifest, consulted at scan-build time so a selective predicate
  * binds the scan to the few files whose range can match — no footer is
  * opened, no task is launched for a skipped file.
  *
  * At 100 TB the arithmetic is the point: a manifest names ~10^6 files;
  * pruning happens on the driver against 16 bytes/file of resident
  * stats, and a key-range query that touches 0.1% of the data schedules
  * 0.1% of the tasks. Parquet row-group skipping alone still schedules
  * every task and opens every footer. Effectiveness depends on files
  * being range-clustered — which the DML write path guarantees by
  * requiring an ordered distribution (see [[GraftVtBatchWrite]]).
  *
  * Stats enter the sidecar two ways, mirroring real formats:
  *   - at WRITE time, each task reports its file's min/max in the
  *     commit message (zero extra IO);
  *   - for files written before the column was clustered, [[analyze]]
  *     back-fills with one distributed min/max-by-file aggregation
  *     (the file-level ANALYZE).
  */
object ZoneMap {

  private def sidecar(root: String, version: Int, col: String) =
    java.nio.file.Paths.get(s"$root/_zonemap_v${version}_$col.json")

  /** `nulls` carries the per-file NULL-key count where known — the bit
    * that makes whole-file metadata deletes sound (a null key never
    * satisfies a comparison predicate, so a file with null keys can
    * never be PROVABLY all-deleted from its [lo, hi] range alone).
    * `rows` carries the per-file ROW count where known — the bit that
    * lets a whole-table COUNT(*) answer from the sidecar with zero data
    * IO (see [[ZoneMapScanBuilder]]'s aggregate pushdown). Files absent
    * from `nulls`/`rows` serialize as shorter entries and read back as
    * "unknown" — conservative for drops and for pushed aggregates alike.
    */
  def write(root: String, version: Int, col: String,
      stats: Map[String, (Long, Long)],
      nulls: Map[String, Long] = Map.empty,
      rows: Map[String, Long] = Map.empty): Unit = {
    val body = stats.toSeq.sorted.map { case (p, (lo, hi)) =>
      (nulls.get(p), rows.get(p)) match {
        case (Some(n), Some(r)) => s"${q(p)}: [$lo, $hi, $n, $r]"
        case (Some(n), None) => s"${q(p)}: [$lo, $hi, $n]"
        case _ => s"${q(p)}: [$lo, $hi]"
      }
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(sidecar(root, version, col), body): Unit
  }

  /** relPath -> (min, max), or None when no sidecar exists for this
    * (version, column) — scans then read every manifest file, exactly
    * the pre-zone-map behavior.
    */
  def read(root: String, version: Int, col: String): Option[Map[String, (Long, Long)]] = {
    val p = sidecar(root, version, col)
    if (!java.nio.file.Files.exists(p)) None
    else Some {
      val s = java.nio.file.Files.readString(p)
      entryRe.findAllMatchIn(s)
        .map(m => m.group(1) -> (m.group(2).toLong, m.group(3).toLong)).toMap
    }
  }

  private val entryRe =
    """"([^"]+)":\s*\[(-?\d+),\s*(-?\d+)(?:,\s*(\d+))?(?:,\s*(\d+))?\]""".r

  /** relPath -> known NULL-key count (files with 2-element legacy
    * entries are absent — "unknown", never "zero").
    */
  def readNullCounts(root: String, version: Int, col: String): Map[String, Long] = {
    val p = sidecar(root, version, col)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else entryRe.findAllMatchIn(java.nio.file.Files.readString(p))
      .collect { case m if m.group(4) != null => m.group(1) -> m.group(4).toLong }
      .toMap
  }

  /** relPath -> known ROW count (entries without the 4th element are
    * absent — "unknown", never "zero").
    */
  def readRowCounts(root: String, version: Int, col: String): Map[String, Long] = {
    val p = sidecar(root, version, col)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else entryRe.findAllMatchIn(java.nio.file.Files.readString(p))
      .collect { case m if m.group(5) != null => m.group(1) -> m.group(5).toLong }
      .toMap
  }

  /** Expand a manifest entry (group dir or single file) to leaf parquet
    * files, as root-relative paths. Recursive: bucketed groups nest one
    * `b=<i>` directory layer and every consumer (row-level scans,
    * vacuum's reference check, metadata tables, compaction) must see
    * through it.
    */
  def leafFiles(root: String, entry: String): Seq[String] = {
    val f = new java.io.File(s"$root/$entry")
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).toSeq.sortBy(_.getName).flatMap {
        case d if d.isDirectory => leafFiles(root, s"$entry/${d.getName}")
        case x if x.getName.endsWith(".parquet") => Seq(s"$entry/${x.getName}")
        case _ => Nil
      }
    else Seq(entry)
  }

  /** Back-fill the sidecar for manifest `version` with one distributed
    * aggregation (min/max of `col` grouped by file) — the file-level
    * ANALYZE for data written before clustering existed.
    */
  def analyze(spark: SparkSession, root: String, version: Int, zcol: String): Int = {
    val files = VersionedTable.manifest(root, version).flatMap(leafFiles(root, _))
    val prefix = new java.io.File(root).getAbsolutePath + "/"
    val rows = spark.read.parquet(files.map(f => s"$root/$f"): _*)
      .groupBy(input_file_name().as("__file"))
      .agg(min(zcol).cast("long").as("lo"), max(zcol).cast("long").as("hi"),
        count(when(col(zcol).isNull, 1)).as("nulls"), count(lit(1)).as("rows"))
      .collect()
      .flatMap { r =>
        val abs = java.net.URLDecoder.decode(
          r.getString(0).stripPrefix("file://"), "UTF-8")
        // a file whose keys are ALL null has no range: leave it out of
        // the sidecar (kept by every scan, undecidable for drops)
        if (r.isNullAt(1)) None
        else Some((abs.stripPrefix(prefix), (r.getLong(1), r.getLong(2)),
          r.getLong(3), r.getLong(4)))
      }
    write(root, version, zcol,
      rows.map { case (f, range, _, _) => f -> range }.toMap,
      rows.map { case (f, _, n, _) => f -> n }.toMap,
      rows.map { case (f, _, _, rc) => f -> rc }.toMap)
    rows.length
  }

  /** The files a scan must read: drop every file whose [min, max] range
    * the pushed filters PROVE empty. Conservative by construction —
    * only predicates on the zone column prune, unknown filter shapes
    * keep the file, and a file missing from the sidecar is kept.
    */
  def prune(stats: Map[String, (Long, Long)], col: String,
      filters: Seq[Filter], files: Seq[String]): Seq[String] =
    files.filter { file =>
      stats.get(file) match {
        case None => true
        case Some((lo, hi)) => filters.forall(mayMatch(_, col, lo, hi))
      }
    }

  /** Minimal catalyst→v1 translation of exactly the shapes the
    * zone-map / tombstone readers can use (comparisons/IN on a column
    * vs literals, AND/OR). Anything else maps to None and simply
    * doesn't prune — Spark's own translator is `protected[sql]`, and
    * conservativeness is the contract anyway.
    */
  def toV1Filter(e: org.apache.spark.sql.catalyst.expressions.Expression): Option[Filter] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.{sources => s1}
    e match {
      case ce.EqualTo(a: ce.AttributeReference, ce.Literal(v, _)) => Some(s1.EqualTo(a.name, v))
      case ce.EqualTo(ce.Literal(v, _), a: ce.AttributeReference) => Some(s1.EqualTo(a.name, v))
      case ce.GreaterThan(a: ce.AttributeReference, ce.Literal(v, _)) => Some(s1.GreaterThan(a.name, v))
      case ce.GreaterThan(ce.Literal(v, _), a: ce.AttributeReference) => Some(s1.LessThan(a.name, v))
      case ce.GreaterThanOrEqual(a: ce.AttributeReference, ce.Literal(v, _)) => Some(s1.GreaterThanOrEqual(a.name, v))
      case ce.GreaterThanOrEqual(ce.Literal(v, _), a: ce.AttributeReference) => Some(s1.LessThanOrEqual(a.name, v))
      case ce.LessThan(a: ce.AttributeReference, ce.Literal(v, _)) => Some(s1.LessThan(a.name, v))
      case ce.LessThan(ce.Literal(v, _), a: ce.AttributeReference) => Some(s1.GreaterThan(a.name, v))
      case ce.LessThanOrEqual(a: ce.AttributeReference, ce.Literal(v, _)) => Some(s1.LessThanOrEqual(a.name, v))
      case ce.LessThanOrEqual(ce.Literal(v, _), a: ce.AttributeReference) => Some(s1.GreaterThanOrEqual(a.name, v))
      case ce.In(a: ce.AttributeReference, vs) if vs.forall(_.isInstanceOf[ce.Literal]) =>
        Some(s1.In(a.name, vs.map(_.asInstanceOf[ce.Literal].value).toArray))
      case ce.And(l, r) => (toV1Filter(l), toV1Filter(r)) match {
        case (Some(a), Some(b)) => Some(s1.And(a, b))
        case (one, other) => one.orElse(other) // AND may prune on either side alone
      }
      case ce.Or(l, r) => for (a <- toV1Filter(l); b <- toV1Filter(r)) yield s1.Or(a, b)
      case _ => None
    }
  }

  /** Does EVERY value in [lo, hi] satisfy `filter`? The dual of
    * [[mayMatch]], conservative the other way: unknown shapes and other
    * columns answer false. `mustMatch` true ⇒ a DELETE with this
    * predicate removes the whole file; `mayMatch` false ⇒ it touches
    * none of it — the two bounds that make metadata-only DELETE sound.
    */
  def mustMatch(filter: Filter, zcol: String, lo: Long, hi: Long): Boolean = {
    def asLong(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue)
      case _ => None
    }
    filter match {
      case EqualTo(c, v) if c == zcol => asLong(v).exists(x => lo == hi && lo == x)
      case GreaterThan(c, v) if c == zcol => asLong(v).exists(lo > _)
      case GreaterThanOrEqual(c, v) if c == zcol => asLong(v).exists(lo >= _)
      case LessThan(c, v) if c == zcol => asLong(v).exists(hi < _)
      case LessThanOrEqual(c, v) if c == zcol => asLong(v).exists(hi <= _)
      case In(c, vs) if c == zcol => lo == hi && vs.exists(v => asLong(v).contains(lo))
      case And(l, r) => mustMatch(l, zcol, lo, hi) && mustMatch(r, zcol, lo, hi)
      case Or(l, r) => mustMatch(l, zcol, lo, hi) || mustMatch(r, zcol, lo, hi)
      case Not(f) => !mayMatch(f, zcol, lo, hi)
      case _ => false
    }
  }

  /** Can any value in [lo, hi] satisfy `filter`? (three-valued: unknown
    * shapes and other columns answer true).
    */
  def mayMatch(filter: Filter, zcol: String, lo: Long, hi: Long): Boolean = {
    def asLong(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue)
      case _ => None
    }
    filter match {
      case EqualTo(c, v) if c == zcol =>
        asLong(v).forall(x => x >= lo && x <= hi)
      case GreaterThan(c, v) if c == zcol => asLong(v).forall(_ < hi)
      case GreaterThanOrEqual(c, v) if c == zcol => asLong(v).forall(_ <= hi)
      case LessThan(c, v) if c == zcol => asLong(v).forall(_ > lo)
      case LessThanOrEqual(c, v) if c == zcol => asLong(v).forall(_ >= lo)
      case In(c, vs) if c == zcol =>
        vs.isEmpty || vs.exists(v => asLong(v).forall(x => x >= lo && x <= hi))
      case And(l, r) => mayMatch(l, zcol, lo, hi) && mayMatch(r, zcol, lo, hi)
      case Or(l, r) => mayMatch(l, zcol, lo, hi) || mayMatch(r, zcol, lo, hi)
      case _ => true
    }
  }
}
