package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{VtMicroBatchStream, VtVersionOffset}
import graft.streaming.Streaming

/** The versioned-table streaming source: commit-per-batch admission
  * control, added-files batch planning, and offset round-tripping —
  * the contracts that make "stream a table's commits" restartable.
  */
class VtStreamSourceSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("bounded replay consumes exactly one commit per micro-batch") {
    val out = Streaming.vtSourceStream(spark, TestSpark.sf0001)
    assert(out.count() == 20) // one row per source
    assert(Streaming.lastReplayBatchCount == 3,
      s"3 commits must give 3 micro-batches, got ${Streaming.lastReplayBatchCount}")
  }

  test("batch planning yields exactly the files a version added") {
    Streaming.vtSourceStream(spark, TestSpark.sf0001).count(): Unit
    val root = graft.sources.GraftVtCatalog.rootOf("vt_stream_src").get
    val s = new VtMicroBatchStream(root, null)
    def planned(a: Int, b: Int): Seq[String] =
      s.planInputPartitions(VtVersionOffset(a), VtVersionOffset(b))
        .map(_.asInstanceOf[graft.sources.VtFilePartition].path).toSeq
    val b1 = planned(0, 1); val b2 = planned(1, 2); val b3 = planned(2, 3)
    assert(b1.nonEmpty && b2.nonEmpty && b3.nonEmpty)
    assert(b1.forall(_.contains("append_v1")))
    assert(b2.forall(_.contains("append_v2")), s"v1→v2 must plan only added files: $b2")
    assert(b3.forall(_.contains("append_v3")))
    // full-backlog plan == union of the per-version plans (restart from
    // any offset reads the same rows)
    assert(planned(0, 3).toSet == (b1 ++ b2 ++ b3).toSet)
  }

  test("offsets round-trip through their json form") {
    val root = graft.sources.GraftVtCatalog.rootOf("vt_stream_src").get
    val s = new VtMicroBatchStream(root, null)
    assert(s.deserializeOffset(VtVersionOffset(7).json()) == VtVersionOffset(7))
    assert(s.initialOffset() == VtVersionOffset(0))
  }
}
