package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming.mergeFoldSessions

/** Pins [[graft.streaming.Streaming.mergeFoldSessions]] — the per-batch
  * session fold behind the timer-based sessionizer. Micro-batches are not
  * event-time ordered across batches, so a later batch can deliver
  * in-watermark rows OLDER than the stored tail's `last`; the merge must
  * absorb them instead of moving `last` backwards and mis-splitting
  * (ADVICE r7, Streaming.scala handleInputRows).
  */
class TimerSessionSemanticsSpec extends AnyFunSuite {
  private val gap = 100L
  private val none = (-1L, -1L, 0L)

  private def run(tail: (Long, Long, Long), ts: Long*) =
    mergeFoldSessions(tail, ts.toArray.sorted, gap)

  test("ordered single batch folds into sessions split on >= gap") {
    val ((s, l, n), closed) = run(none, 0L, 10L, 50L, 200L, 250L)
    assert(closed == Seq((0L, 3L)))
    assert((s, l, n) == ((200L, 250L, 2L)))
  }

  test("empty batch leaves the tail untouched") {
    val (tail, closed) = run((200L, 250L, 2L))
    assert(closed.isEmpty && tail == ((200L, 250L, 2L)))
  }

  test("late row inside [start, last] joins the open session without moving last") {
    val ((s, l, n), closed) = run((200L, 300L, 3L), 250L)
    assert(closed.isEmpty)
    assert((s, l, n) == ((200L, 300L, 4L)))
  }

  test("late row just before start extends the tail backward when within gap") {
    val ((s, l, n), closed) = run((200L, 300L, 3L), 150L)
    assert(closed.isEmpty)
    assert((s, l, n) == ((150L, 300L, 4L)))
  }

  test("late rows a full gap before start close as their own session") {
    val ((s, l, n), closed) = run((200L, 300L, 3L), 50L, 90L)
    assert(closed == Seq((50L, 2L)))
    assert((s, l, n) == ((200L, 300L, 3L)))
  }

  test("multiple before-sessions: older ones close, newest merges into the tail") {
    // 0,10 close; 150 bridges into the 200-tail (gap 50 < 100)
    val ((s, l, n), closed) = run((200L, 300L, 3L), 0L, 10L, 150L)
    assert(closed == Seq((0L, 2L)))
    assert((s, l, n) == ((150L, 300L, 4L)))
  }

  test("pre-fix regression shape: an old row no longer drags last backwards") {
    // the unmerged fold would have set last=250 and then treated 320 as
    // in-session (320-250 < gap) even though 320-300 < gap anyway; worse,
    // a tail at last=300 with late=150 then fresh=450 used to see
    // 450-150 >= gap and close the session early at the wrong boundary
    val ((s, l, n), closed) = run((200L, 300L, 3L), 250L, 380L)
    assert(closed.isEmpty)
    assert((s, l, n) == ((200L, 380L, 5L)))
  }

  test("fresh rows past the gap close the (merged) tail") {
    val ((s, l, n), closed) = run((200L, 300L, 3L), 150L, 500L)
    assert(closed == Seq((150L, 4L)))
    assert((s, l, n) == ((500L, 500L, 1L)))
  }

  test("property: row count is conserved across arbitrary two-batch splits") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 500).foreach { _ =>
      val b1 = Array.fill(rnd.nextInt(20))(rnd.nextLong(2000L))
      val b2 = Array.fill(rnd.nextInt(20))(rnd.nextLong(2000L))
      val (t1, c1) = mergeFoldSessions(none, b1.sorted, gap)
      val (t2, c2) = mergeFoldSessions(t1, b2.sorted, gap)
      val emitted = c1 ++ c2
      val tailN = if (t2._1 >= 0) t2._3 else 0L
      assert(emitted.map(_._2).sum + tailN == (b1.length + b2.length).toLong,
        s"b1=${b1.toSeq} b2=${b2.toSeq}")
    }
  }

  test("property: an event-time-ordered batch split equals one combined fold") {
    // when batch 2 only carries rows >= batch 1's max (the in-order replay
    // case), splitting must be indistinguishable from a single batch
    val rnd = new scala.util.Random(8L)
    (1 to 500).foreach { _ =>
      val sorted = Array.fill(1 + rnd.nextInt(40))(rnd.nextLong(2000L)).sorted
      val mid = rnd.nextInt(sorted.length + 1)
      val (t1, c1) = mergeFoldSessions(none, sorted.take(mid), gap)
      val (t2, c2) = mergeFoldSessions(t1, sorted.drop(mid), gap)
      val (tc, cc) = mergeFoldSessions(none, sorted, gap)
      assert(t2 == tc, s"ts=${sorted.toSeq} mid=$mid")
      assert((c1 ++ c2) == cc, s"ts=${sorted.toSeq} mid=$mid")
    }
  }
}
