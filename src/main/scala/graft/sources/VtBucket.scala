package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** BUCKETED layout for versioned tables → STORAGE-PARTITIONED JOINS:
  * two graft_vt tables bucketed the same way on their join key join
  * with ZERO shuffle. The scan reports [[KeyGroupedPartitioning]] over
  * `bucket(n, key)` (resolved through the catalog's FunctionCatalog),
  * each input partition carries its bucket id as the partition key
  * ([[HasPartitionKey]]), and Spark's EnsureRequirements aligns the two
  * sides partition-for-partition instead of planning exchanges.
  *
  * This is the 100 TB co-location story: the fact-to-fact join that
  * dominates a corpus pipeline (docs ⋈ annotations, docs ⋈ scores)
  * prices as a map-side merge — no terabytes through the wire, no
  * shuffle spill — because the LAYOUT carries the distribution proof.
  * Empty buckets still emit (empty) partitions so both sides always
  * expose exactly `n` aligned partitions.
  *
  * The physical layout is one `b=<i>` directory per bucket under the
  * file group; bucket assignment is the same `((k % n) + n) % n` the
  * SQL-visible `graft_vt.bucket(n, key)` function computes — Spark
  * verifies compatibility through that one function's canonical name.
  */
object VtBucket {

  /** The catalog-resolved bucket function: `((key % n) + n) % n`.
    * `canonicalName` is the identity SPJ compares across the two scan
    * sides — one function, one layout contract.
    */
  object BucketFunction extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, key): non-negative modulo bucket of a long key"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets INT, key BIGINT), got $inputType")
      Bound
    }
    object Bound extends ScalarFunction[Integer]
      with ReducibleFunction[Integer, Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft_vt.bucket"
      override def isResultNullable: Boolean = true
      override def produceResult(input: InternalRow): Integer =
        if (input.isNullAt(0) || input.isNullAt(1)) null
        else {
          val n = input.getInt(0)
          bucketOf(input.getLong(1), n): Integer
        }

      /** COMPATIBLE bucket counts stay shuffle-free: when the other
        * side's count divides this one's, this side's bucket ids
        * REDUCE onto the other's (`((k mod an) mod n) == k mod n`), so
        * Spark coalesces this side's partitions instead of planning
        * exchanges — a bucket(16) fact joins a bucket(8) fact by
        * merging partition pairs. Incompatible counts return null and
        * fall back to the ordinary shuffle.
        */
      override def reducer(thisNumBuckets: Int,
          otherFunc: ReducibleFunction[_, _],
          otherNumBuckets: Int): Reducer[Integer, Integer] =
        if ((otherFunc eq this) && thisNumBuckets != otherNumBuckets &&
            thisNumBuckets % otherNumBuckets == 0)
          ModReducer(otherNumBuckets)
        else null
    }
  }

  /** Standalone (serializable — reducers ship inside task closures):
    * reduce a bucket id onto the coarser count.
    */
  private case class ModReducer(n: Int) extends Reducer[Integer, Integer] {
    override def reduce(v: Integer): Integer = v % n
  }

  def bucketOf(key: Long, n: Int): Int = (((key % n) + n) % n).toInt

  /** Write `df` as a bucketed file group: one `b=<i>` directory per
    * bucket (Spark's `pmod` matches [[bucketOf]] for non-negative n).
    * One distributed job; the dynamic `partitionBy` writer routes rows,
    * and the bucket column itself stays OUT of the data files (it is
    * derivable from the key — the reader never needs it).
    */
  def writeBucketed(df: DataFrame, keyCol: String, n: Int, dest: String): Unit = {
    import org.apache.spark.sql.functions._
    df.withColumn("b", pmod(col(keyCol), lit(n.toLong)).cast("int"))
      .repartition(n, col("b"))
      .write.mode("overwrite").partitionBy("b").parquet(dest)
  }

  /** Root-relative leaf files of `entry` (group dir OR individual
    * committed file), keyed by bucket id parsed from the `b=<i>` path
    * layer. A bucketed manifest may name whole groups (fixture builds)
    * or exact files (DML/INSERT commits) — both carry the layer.
    */
  def bucketFiles(root: String, entry: String): Map[Int, Seq[String]] =
    ZoneMap.leafFiles(root, entry)
      .flatMap { f =>
        f.split("/").find(_.startsWith("b=")).map(seg =>
          seg.stripPrefix("b=").toInt -> f)
      }
      .groupBy(_._1)
      .map { case (b, fs) => b -> fs.map(_._2).sorted }
}

/** Scan builder for a bucketed table: parquet pushdown and column
  * pruning replay into the delegate exactly like the zone-map builder
  * (all filters residual), and the built scan regroups the delegate's
  * input partitions into one partition per bucket, each tagged with
  * its partition key.
  */
class BucketedScanBuilder(tableName: String, root: String, tableSchema: StructType,
    version: Int, keyCol: String, numBuckets: Int, options: CaseInsensitiveStringMap)
  extends ScanBuilder
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns {

  import org.apache.spark.sql.catalyst.expressions.Expression

  private var pushed: Seq[Expression] = Nil
  private var required: StructType = tableSchema

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushed = filters
    filters // ALL residual
  }
  override def pushedFilters(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty
  override def pruneColumns(s: StructType): Unit = required = s

  override def build(): Scan = {
    val byBucket: Map[Int, Seq[String]] = VersionedTable.manifest(root, version)
      .map(VtBucket.bucketFiles(root, _))
      .foldLeft(Map.empty[Int, Seq[String]]) { (acc, m) =>
        (acc.keySet ++ m.keySet).map(b =>
          b -> (acc.getOrElse(b, Nil) ++ m.getOrElse(b, Nil))).toMap
      }
    val fileToBucket: Map[String, Int] = byBucket.flatMap { case (b, fs) =>
      fs.map(f => new java.io.File(s"$root/$f").getAbsolutePath -> b)
    }
    val pt = ParquetTable(tableName, SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      byBucket.values.flatten.toSeq.sorted.map(f => s"$root/$f"),
      Some(tableSchema), classOf[ParquetFileFormat])
    val b = pt.newScanBuilder(options)
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileScanBuilder]
    b.pushFilters(pushed): Unit
    b.pruneColumns(required)
    new BucketedScan(b.build(), keyCol, numBuckets, fileToBucket)
  }
}

/** One [[FilePartition]]-backed partition per bucket, partition key =
  * the bucket id.
  */
case class BucketInputPartition(bucketId: Int, files: Array[PartitionedFile])
  extends InputPartition with HasPartitionKey {
  private lazy val key = new GenericInternalRow(Array[Any](bucketId))
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] =
    FilePartition(bucketId, files).preferredLocations()
}

class BucketedScan(delegate: Scan, keyCol: String, numBuckets: Int,
    fileToBucket: Map[String, Int])
  extends Scan with SupportsReportPartitioning {

  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String =
    s"graft_vt bucketed($numBuckets, $keyCol) ${delegate.description()}"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.bucket(numBuckets, keyCol)), numBuckets)

  override def toBatch: Batch = new Batch {
    private val inner = delegate.toBatch

    override def planInputPartitions(): Array[InputPartition] = {
      // regroup the delegate's PartitionedFiles (splits included) into
      // exactly numBuckets partitions, aligned by bucket id; empty
      // buckets still emit so both join sides expose N partitions
      val splits = inner.planInputPartitions().flatMap {
        case fp: FilePartition => fp.files
        case other => throw new IllegalStateException(
          s"unexpected partition type from parquet: $other")
      }
      val grouped = splits.groupBy { pf =>
        val p = pf.toPath.toUri.getPath
        fileToBucket.getOrElse(p, throw new IllegalStateException(
          s"file $p missing from bucket layout"))
      }
      (0 until numBuckets).map(b =>
        BucketInputPartition(b, grouped.getOrElse(b, Array.empty)): InputPartition
      ).toArray
    }

    override def createReaderFactory(): PartitionReaderFactory = {
      val f = inner.createReaderFactory()
      new PartitionReaderFactory {
        private def unwrap(p: InputPartition): InputPartition = p match {
          case bp: BucketInputPartition => FilePartition(bp.bucketId, bp.files)
          case other => other
        }
        override def createReader(p: InputPartition): PartitionReader[InternalRow] =
          f.createReader(unwrap(p))
        override def createColumnarReader(p: InputPartition)
            : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
          f.createColumnarReader(unwrap(p))
        override def supportColumnarReads(p: InputPartition): Boolean =
          f.supportColumnarReads(unwrap(p))
      }
    }
  }
}
