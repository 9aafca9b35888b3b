package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Keyed upsert / corpus refresh (MERGE semantics without a table
  * format): rows of `updates` replace same-key rows of `base`, base rows
  * with no update pass through, update-only keys insert. The most common
  * verb in a re-crawled-corpus ingestion pipeline.
  *
  * 100 TB shape: the only wide operation is a LEFT ANTI equi-join of
  * `base` against the DISTINCT update keys — a narrow (key-only) right
  * side that AQE broadcasts when the delta is small (the usual case: a
  * daily re-crawl is a sliver of the corpus) and shuffles by key when it
  * isn't. The union itself is metadata-only (no shuffle, no data
  * movement). Nothing ever collects the corpus, and cost is
  * O(|base| + |updates|) regardless of history depth — unlike
  * rewrite-the-world overwrite.
  */
object Upsert {

  /** Replace same-key rows of `base` with the latest revision from
    * `updates`; pass every other base row through unchanged.
    *
    * `updates` may carry several revisions of one key (e.g. two crawl
    * attempts in one batch): the row with the highest `revCol` wins, so
    * callers must supply a total order per key — ties would make the
    * survivor partitioning-dependent, so the row_number window breaks
    * them deterministically on `revCol` desc only (document your own
    * secondary key in `revCol` if revisions can collide).
    */
  def refresh(base: DataFrame, updates: DataFrame, key: String, revCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(revCol).desc)
    val latest = updates
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn", revCol)
    latest.unionByName(
      base.join(latest.select(col(key)), Seq(key), "left_anti"))
  }

  /** Oracle-checkable refresh over the documents corpus: a synthetic
    * deterministic "re-crawl" delta — every doc_id % 7 == 0 document is
    * re-fetched (twice: rev 1 uppercases, rev 2 appends a marker — rev 2
    * must win), and every doc_id % 13 == 0 spawns a brand-new document at
    * doc_id + 100000. Output is (doc_id, source, digest) so the compare
    * moves 16-byte digests, not document text.
    */
  def refreshedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val recrawled = base.filter(col("doc_id") % 7 === 0)
    val updates = recrawled
      .select(col("doc_id"), upper(col("text")).as("text"),
        lit("recrawl").as("source"), lit(1).as("rev"))
      .unionByName(recrawled
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
          lit("recrawl").as("source"), lit(2).as("rev")))
      .unionByName(base.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"),
          lit("recrawl-new").as("source"), lit(1).as("rev")))
    refresh(base, updates, "doc_id", "rev")
      .select(col("doc_id"), col("source"), md5(col("text").cast("binary")).as("digest"))
  }

  /** Snapshot diff — dataset versioning's other half: given two corpus
    * versions keyed by `key` with a content digest, classify every key
    * as added / removed / changed / unchanged. One full-outer equi-join
    * on the key moving (key, digest) pairs only — 24 bytes a row no
    * matter how big the documents are, so diffing two 100 TB snapshots
    * costs one digest-projection scan of each plus a key shuffle.
    */
  def diff(a: DataFrame, b: DataFrame, key: String, digestCol: String): DataFrame =
    a.select(col(key), col(digestCol).as("__graft_a"))
      .join(b.select(col(key), col(digestCol).as("__graft_b")), Seq(key), "full_outer")
      .select(col(key),
        when(col("__graft_a").isNull, "added")
          .when(col("__graft_b").isNull, "removed")
          .when(col("__graft_a") === col("__graft_b"), "unchanged")
          .otherwise("changed").as("status"))

  /** Oracle-checkable diff over the documents corpus: version B is the
    * [[refreshedCorpus]] re-crawl with a deterministic deletion pass
    * (every doc_id % 11 == 3 dropped). The construction makes every
    * status reachable: re-crawled docs are `changed`, spawned docs
    * `added`, deleted docs `removed`, the rest `unchanged`.
    */
  def snapshotDiffCorpus(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("digest"))
    val b = refreshedCorpus(spark, dir).filter(pmod(col("doc_id"), lit(11)) =!= 3)
    diff(a, b, "doc_id", "digest")
  }
}
