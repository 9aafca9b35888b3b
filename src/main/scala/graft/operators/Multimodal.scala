package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column support (SURVEY §2B): media payloads ride through the
  * engine as opaque `BinaryType` columns plus typed metadata, and
  * decode/feature-extraction runs as partition-local batch transforms.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic FAKE decoder — but the Spark-side plumbing
  * it validates (binary column schema, per-partition batching, fixed-size
  * float feature output, no driver involvement) is the real contract a
  * codec-backed implementation drops into.
  */
object Multimodal {

  /** Binary-column metadata: byte length and SHA-256 of the payload.
    * (documents.text standing in as the opaque payload; with real media
    * the source would read `binary` straight from parquet.)
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("sha256"))

  /** Feature-extraction pipeline over opaque binary payloads.
    *
    * STUB DECODE: a real implementation would decode image/audio bytes
    * here (JPEG → pixels, WAV → PCM) and emit model features; this fake
    * deterministically folds the payload bytes into an 8-bucket histogram
    * so the distributed plumbing — mapPartitions over binary columns,
    * fixed-width `Array[Float]` output, executor-local batch processing —
    * is real and testable without codecs.
    */
  def decodeStub(spark: SparkSession, dir: String, featureDim: Int = 8): DataFrame = {
    import spark.implicits._
    val src = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { batch =>
      // per-partition setup would initialize the codec once per executor
      // core (e.g. a JNI decoder handle); the fake needs none.
      batch.map { case (docId, payload) =>
        val hist = new Array[Float](featureDim)
        var i = 0
        while (i < payload.length) {
          hist((payload(i) & 0xFF) % featureDim) += 1.0f
          i += 1
        }
        val n = math.max(payload.length, 1).toFloat
        (docId, payload.length, hist.map(_ / n))
      }
    }.toDF("doc_id", "n_bytes", "features")
  }

  /** Flattened, oracle-friendly view of [[decodeStub]]: the histogram is
    * integer counts (exact), so DuckDB can reproduce it with pure SQL.
    */
  def byteHistogram(spark: SparkSession, dir: String, featureDim: Int = 8): DataFrame =
    decodeStub(spark, dir, featureDim)
      .select(col("doc_id"), col("n_bytes"),
        posexplode(col("features")))
      .withColumnRenamed("pos", "bucket")
      .withColumn("count",
        round(col("col").cast("double") * greatest(col("n_bytes"), lit(1))).cast("long"))
      .drop("col")
}
