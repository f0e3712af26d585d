package graft

import graft.backtest.WalkForward

/** Walk-forward split generation invariants. */
class WalkForwardSpec extends SparkSpec {

  test("splits are contiguous, non-overlapping, and cover the range") {
    val ss = WalkForward.splits(1000L, 9000L, 4)
    assert(ss.size == 4)
    assert(ss.head.testStartTs == 1000L && ss.last.testEndTs == 9000L)
    ss.sliding(2).foreach { case Seq(a, b) =>
      assert(a.testEndTs == b.testStartTs)
    }
    ss.foreach(s => assert(s.testEndTs > s.testStartTs))
  }

  test("uneven range: last split absorbs the remainder") {
    val ss = WalkForward.splits(0L, 10L, 3)
    assert(ss.map(s => (s.testStartTs, s.testEndTs)) ==
      Seq((0L, 3L), (3L, 6L), (6L, 10L)))
  }
}
