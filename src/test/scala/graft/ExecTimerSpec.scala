package graft

import org.scalatest.funsuite.AnyFunSuite

/** The construction-vs-execution split Bench relies on (round-15):
  * planning_sec = construction wall − ExecTimer-accumulated embedded
  * execution, so the accumulator's contract — outermost-scope-only,
  * drain-resets, exception-safe — is what keeps that column meaningful. */
class ExecTimerSpec extends AnyFunSuite {

  test("timed accumulates wall time and drain resets") {
    ExecTimer.drainSec()
    ExecTimer.timed(Thread.sleep(30))
    val sec = ExecTimer.drainSec()
    assert(sec >= 0.025 && sec < 5.0, s"accumulated $sec")
    assert(ExecTimer.drainSec() == 0.0)
  }

  test("nested scopes count once (outermost only)") {
    ExecTimer.drainSec()
    ExecTimer.timed {
      ExecTimer.timed(Thread.sleep(20))
      ExecTimer.timed(Thread.sleep(20))
      Thread.sleep(20)
    }
    val sec = ExecTimer.drainSec()
    // ~0.06 s outermost; double-counting the inner scopes would read ~0.10
    assert(sec >= 0.055 && sec < 0.1 * 5, s"nested scopes double-counted: $sec")
  }

  test("an exception inside a timed scope still attributes and rethrows") {
    ExecTimer.drainSec()
    intercept[IllegalStateException] {
      ExecTimer.timed {
        Thread.sleep(20)
        throw new IllegalStateException("boom")
      }
    }
    assert(ExecTimer.drainSec() >= 0.015)
    // the depth counter must have unwound: a fresh scope counts again
    ExecTimer.timed(Thread.sleep(20))
    assert(ExecTimer.drainSec() >= 0.015)
  }

  test("timed returns the body's value") {
    assert(ExecTimer.timed(41 + 1) == 42)
  }
}
