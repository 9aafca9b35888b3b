package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.FanPipeline
import graft.sources.{CsvSource, ParquetSink, Tables}

/** Source/sink edge cases (FIXTURES §A4): permissive JSON drop semantics,
  * filter whitespace handling, missing-field behavior, sniffing CSV reads
  * at the distributed path, parquet round-trips.
  */
class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def tmpFile(suffix: String, content: String): String = {
    val p = Files.createTempFile("graft-src-", suffix)
    Files.writeString(p, content)
    p.toString
  }

  test("JSON scan drops malformed lines and non-object JSON") {
    val path = tmpFile(".json",
      """{"FanID":"F1","DeviceType":"Mobile","RaceID":"Cup 25"}
        |not json at all
        |[1,2,3]
        |42
        |{"FanID":"F2","DeviceType":"Other","RaceID":"x"}
        |{"FanID":"F3"}
        |""".stripMargin)
    val df = FanPipeline.readEvents(spark, path)
    assert(df.count() == 3) // F1, F2, F3 survive; 3 bad lines dropped
    // missing fields → null, row kept
    assert(df.filter(col("FanID") === "F3" && col("DeviceType").isNull).count() == 1)
  }

  test("device filter: whitespace-padded 'Other' dropped, missing kept") {
    val path = tmpFile(".json",
      """{"FanID":"F1","DeviceType":" Other "}
        |{"FanID":"F2","DeviceType":"OTHER"}
        |{"FanID":"F3"}
        |{"FanID":"F4","DeviceType":"Mobile"}
        |""".stripMargin)
    val kept = FanPipeline.readEvents(spark, path)
      .filter(FanPipeline.deviceFilter)
      .select(col("FanID")).collect().map(_.getString(0)).sorted
    // " Other " trimmed → dropped; "OTHER" ≠ "Other" (case-sensitive) → kept
    assert(kept.toSeq == Seq("F2", "F3", "F4"))
  }

  test("CsvSource sniffs non-comma delimiters on a distributed read") {
    for (d <- Seq(";", "|", "\t")) {
      val path = tmpFile(".csv", s"a${d}b${d}c\n1${d}2${d}3\n4${d}5${d}6\n")
      val df = CsvSource.read(spark, path)
      assert(df.columns.toSeq == Seq("a", "b", "c"), s"delimiter '$d'")
      assert(df.count() == 2)
    }
  }

  test("parquet sink round-trip preserves data, partitionBy prunes") {
    val out = Files.createTempDirectory("graft-pq-").toString
    val orders = Tables(spark, TestSpark.sf0001, "orders")
    ParquetSink.write(orders, out, partitionBy = Seq("o_orderstatus"))
    val back = ParquetSink.read(spark, out)
    assert(back.count() == orders.count())
    val statuses = back.select("o_orderstatus").distinct().count()
    assert(statuses == 3)
    // partition pruning visible in the plan: a status filter reads 1 dir
    val plan = back.filter(col("o_orderstatus") === "F")
      .queryExecution.executedPlan.toString
    assert(back.filter(col("o_orderstatus") === "F").count() ==
      orders.filter(col("o_orderstatus") === "F").count())
    assert(plan.contains("o_orderstatus"))
  }

  test("single-shard JSONL sink content is valid NDJSON with nulls kept") {
    import spark.implicits._
    val df = Seq(("a", Option(1L)), ("b", None)).toDF("k", "v")
    val out = Files.createTempDirectory("graft-jsonl-t-").toString
    graft.sources.JsonlSink.write(df, out, "t")
    val lines = Files.readAllLines(java.nio.file.Paths.get(out, "t-00000-of-00001.jsonl"))
    assert(lines.size() == 2)
    assert(lines.stream().anyMatch(_.contains("\"v\":null")))
  }
  test("binaryFile ingestion: glob prunes at listing, metadata length is exact") {
    import org.apache.spark.sql.functions.col
    val rows = graft.sources.BinaryFiles.ingestDocs(spark, TestSpark.sf0001, docCap = 20)
      .collect()
    assert(rows.length == 20)
    // plant a non-matching file next to the staged .bin files; the glob
    // filter must exclude it at LISTING time (re-run sees the same 20)
    java.nio.file.Files.write(
      new java.io.File(graft.sources.BinaryFiles.stageFor(TestSpark.sf0001, 20),
        "decoy.tmp").toPath,
      "not media".getBytes("UTF-8"))
    val again = graft.sources.BinaryFiles.ingestDocs(spark, TestSpark.sf0001, docCap = 20)
    assert(again.count() == 20, "pathGlobFilter must prune the decoy at listing time")
    // staging is keyed by corpus too: a second source dir at the same cap
    // must not inherit the first corpus's staged files
    assert(graft.sources.BinaryFiles.stageFor("/root/testdata/sf0.01", 20).getAbsolutePath
      != graft.sources.BinaryFiles.stageFor(TestSpark.sf0001, 20).getAbsolutePath)
    val docs = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
      .filter(col("doc_id") < 20).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      assert(r.getInt(1) == docs(r.getLong(0)).getBytes("UTF-8").length,
        s"doc ${r.getLong(0)}: binaryFile length metadata wrong")
    }
  }
}
