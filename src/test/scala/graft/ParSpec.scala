package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Par

/** Par.both error semantics: the round-22 hardening pins that a
  * throwing `b` can no longer leak a detached running future — `a`
  * is always awaited before the exception propagates. */
class ParSpec extends AnyFunSuite {
  test("happy path returns both results") {
    assert(Par.both(1 + 1, "x" * 2) === ((2, "xx")))
  }

  test("b throwing still awaits a before propagating") {
    val aFinished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[IllegalStateException] {
      Par.both({ Thread.sleep(200); aFinished.set(true); 1 },
        throw new IllegalStateException("b failed"))
    }
    assert(e.getMessage === "b failed")
    // the await inside the catch means a's side effect is visible
    // BEFORE the exception reached us — no detached future
    assert(aFinished.get())
  }

  test("b's exception wins when both phases fail") {
    val e = intercept[IllegalStateException] {
      Par.both[Int, Int](throw new RuntimeException("a failed"),
        throw new IllegalStateException("b failed"))
    }
    assert(e.getMessage === "b failed")
  }

  test("a's failure surfaces when b succeeded") {
    val e = intercept[RuntimeException] {
      Par.both[Int, Int](throw new RuntimeException("a failed"), 7)
    }
    assert(e.getMessage === "a failed")
  }
}
