package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Overlap

/** [[Overlap.par]] backs the round-15 concurrent index builds
  * (ivfPqAdc / pqEncode — guide §2.6 "overlap independent jobs"): results
  * must come back in THUNK order regardless of completion order, and a
  * failing chain must propagate instead of yielding a half-built index. */
class OverlapSpec extends AnyFunSuite {

  test("results preserve thunk order regardless of completion order") {
    val out = Overlap.par(Seq(
      () => { Thread.sleep(150); "slow" },
      () => "fast",
      () => { Thread.sleep(50); "mid" }))
    assert(out === Seq("slow", "fast", "mid"))
  }

  test("thunks actually overlap (both run before either finishes)") {
    val gate = new java.util.concurrent.CountDownLatch(2)
    // each thunk signals arrival then waits for the other: deadlocks
    // (and times out the await) unless both run concurrently
    val out = Overlap.par(Seq.fill(2)(() => {
      gate.countDown()
      assert(gate.await(5, java.util.concurrent.TimeUnit.SECONDS))
      1
    }))
    assert(out === Seq(1, 1))
  }

  test("a failing chain propagates its exception") {
    val e = intercept[IllegalStateException] {
      Overlap.par[Int](Seq(
        () => 1,
        () => throw new IllegalStateException("chain failed")))
    }
    assert(e.getMessage === "chain failed")
  }

  test("single thunk runs inline") {
    assert(Overlap.par(Seq(() => 42)) === Seq(42))
  }
}
