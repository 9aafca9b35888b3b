package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert

/** Keyed upsert semantics: replace, pass-through, insert, and the
  * deterministic latest-revision tie-break.
  */
class UpsertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("refresh: updates replace, others pass through, new keys insert, max rev wins") {
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "v")
    val updates = Seq(
      (2L, "two-r1", 1), // superseded by rev 2
      (2L, "two-r2", 2),
      (9L, "nine", 1) // brand-new key
    ).toDF("k", "v", "rev")
    val out = Upsert.refresh(base, updates, "k", "rev")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "one", 2L -> "two-r2", 3L -> "three", 9L -> "nine"))
  }

  test("refreshedCorpus: row count = base + inserts; updated keys carry the rev-2 text") {
    val base = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
    val nBase = base.count()
    val nNew = base.filter($"doc_id" % 13 === 0).count()
    val out = Upsert.refreshedCorpus(spark, TestSpark.sf0001)
    assert(out.count() == nBase + nNew)
    // every doc_id % 7 == 0 row must be the ' v2' re-crawl (rev 2 beat rev 1)
    val updated = out.filter($"doc_id" % 7 === 0 && $"doc_id" < 100000).collect()
    assert(updated.nonEmpty && updated.forall(_.getString(1) == "recrawl"))
    val expected = base.filter($"doc_id" % 7 === 0)
      .selectExpr("doc_id", "md5(cast(concat(text, ' v2') as binary)) AS digest")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(updated.forall(r => expected(r.getLong(0)) == r.getString(2)))
  }
}
