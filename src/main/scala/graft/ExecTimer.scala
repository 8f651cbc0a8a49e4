package graft

/** Driver-side accumulator separating EXECUTION embedded in DataFrame
  * construction (eager localCheckpoints, bounded collects, convergence
  * counts — the materialization barriers the iterative operators need)
  * from genuine planning work (parse + analysis). Bench's construction
  * leg previously read ≈ the whole wall for d02/d05/d07/d09/v04 because
  * their `run` functions END in an eager checkpoint — making the
  * planning_sec column meaningless for exactly the queries whose plans
  * are most interesting. Operators wrap their eager actions in
  * [[timed]]; Bench drains the accumulator around construction and
  * subtracts.
  *
  * Re-entrant: only the OUTERMOST timed scope on a thread contributes,
  * so composed operators (a pipeline whose construction calls another
  * operator's checkpointing constructor) never double-count. The
  * accumulator is global — Bench construction is single-threaded, and
  * concurrent test suites only ever see a conservative over-count
  * drained away at the next query boundary.
  */
object ExecTimer {
  private val acc = new java.util.concurrent.atomic.AtomicLong
  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Run `f`, attributing its wall time to embedded execution (outermost
    * scope only). Returns `f`'s value. */
  def timed[T](f: => T): T = {
    val d = depth.get()
    depth.set(d + 1)
    val t0 = System.nanoTime()
    try f
    finally {
      depth.set(d)
      if (d == 0) acc.addAndGet(System.nanoTime() - t0)
    }
  }

  /** Read and reset the accumulated embedded-execution seconds. */
  def drainSec(): Double = acc.getAndSet(0L) / 1e9
}
