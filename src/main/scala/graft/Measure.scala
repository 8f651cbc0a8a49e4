package graft

/** Shared measurement plumbing for Bench and the diagnostic probes —
  * one definition of the CPU-canary protocol and the listener-bus
  * flush, so a protocol change (or a Spark-version change to the
  * private[spark] listenerBus surface) lands everywhere at once instead
  * of silently diverging across artifact producers. */
object Measure {

  /** Single-thread CPU canary: a fixed 200M-step xorshift loop, timed
    * after one JIT warmup pass. The same commit has measured 11.2 s and
    * 18.3 s suite totals on this box hours apart while the canary moved
    * 2.2 → 3.2 s in step — the ratio against a reference canary
    * normalizes totals across host-speed states the way load_average
    * (runnable queue depth only, no frequency/steal visibility) cannot. */
  def cpuCanary(): Double = {
    def pass(): Long = {
      var x = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < 200000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        i += 1
      }
      x
    }
    pass() // JIT warmup
    val t0 = System.nanoTime()
    val sink = pass()
    val t = (System.nanoTime() - t0) / 1e9
    if (sink == 42L) println("") // keep the loop un-elidable
    t
  }

  /** Spark's listener bus is asynchronous: without a flush, stage events
    * from the last run may not have been delivered when listener counters
    * are read (undercount), and earlier events can land after a reset
    * (overcount). waitUntilEmpty is private[spark], so reach it
    * reflectively; fall back to a generous sleep if the internals move. */
  def flushListenerBus(sc: org.apache.spark.SparkContext): Unit = {
    try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .map(_.invoke(bus))
        .getOrElse(Thread.sleep(1000))
    } catch { case _: Throwable => Thread.sleep(1000) }
    ()
  }
}
