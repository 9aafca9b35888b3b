package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming

/** Pins for the streaming CDC face
  * ([[graft.sources.ChangesMicroBatchStream]]): one micro-batch per
  * commit, and the drained stream's rollup equals the same rollup over
  * the batch change feeds of the covered version range — the
  * stream-equals-batch contract that makes checkpoint replay
  * exactly-once against any idempotent sink.
  */
class StreamingCdcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("streaming CDC drains one micro-batch per commit") {
    Streaming.cdcSourceStream(spark, dir).collect(): Unit
    // the fixture chain has exactly 2 commits → exactly 2 data batches
    // (noDataMicroBatches disabled in the replay session)
    assert(Streaming.lastReplayBatchCount === 2,
      s"expected one micro-batch per commit (2), got ${Streaming.lastReplayBatchCount}")
  }

  test("stream rollup equals the batch change-feed rollup over the same versions") {
    val got = Streaming.cdcSourceStream(spark, dir)
      .select(col("_commit_version"), col("_change_type"), col("n"), col("total_chars"))
    // same aggregation over the BATCH face, one version at a time
    val batch = (1 to 2).map { v =>
      spark.sql(s"SELECT * FROM graft_vt.vt_cdc_stream.changes VERSION AS OF $v")
        .groupBy(col("_commit_version"), col("_change_type"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).cast("long").as("total_chars"))
    }.reduce(_ unionByName _)
    assert(got.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(got).count() === 0)
  }
}
