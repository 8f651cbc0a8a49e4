package graft

import org.apache.spark.sql.SparkSession

/** Benchmark runner following BASELINE.md's protocol (adopted from the
  * reference: presto-benchto-benchmarks/src/main/resources/benchmarks/
  * presto/tpch.yaml:3-5 — 2 prewarm runs + 6 measured runs per query);
  * reports the per-query MEDIAN so one GC pause or JIT warm-up can't fake
  * a regression. A failing query is reported in an "errors" field instead
  * of masquerading as a fast timing.
  */
object Bench {
  private val Prewarm = 2
  private val Measured = 6

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cores = cpus, shufflePartitions = cpus)

    val defs = SparkEntry.benchDefs
    var errors = List.empty[(String, String)]

    // Materialize through the noop sink, not count(): under count()
    // Catalyst prunes every column the final projection computes, so a
    // query ending in a pure projection would time only its scan. The
    // noop writer consumes full rows (all output columns evaluated) and
    // discards them — write-path overhead without any I/O.
    def timeOnce(q: Qdef): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      }
      catch {
        case e: Throwable =>
          // one error entry per query — repeated failures would otherwise
          // emit duplicate JSON keys
          if (!errors.exists(_._1 == q.name))
            errors ::= (q.name, Option(e.getMessage).getOrElse(e.getClass.getName))
          None
      }
    }

    // Single-thread CPU canary: a fixed 200M-step xorshift loop, timed
    // after one JIT warmup pass. The SAME COMMIT has measured 11.2 s and
    // 18.3 s totals on this box hours apart while the canary moved
    // 2.2 s → 3.2 s in step — the ratio against a reference canary
    // normalizes totals across host-speed states the way load_average
    // (which only sees runnable queue depth, not frequency/steal
    // throttling) cannot.
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
    val canaryPre = cpuCanary()

    // (name, min, median, max): the spread is the contention detector — on
    // a quiet box min≈median; a loaded box shows median/min ratios of 2-3×
    // on queries whose code didn't change, so a slow total self-flags as
    // environment rather than reading as a regression.
    val results: Seq[(String, Double, Double, Double)] = defs.flatMap { q =>
      (1 to Prewarm).foreach(_ => timeOnce(q))
      val runs = (1 to Measured).flatMap(_ => timeOnce(q)).sorted
      if (runs.isEmpty) None
      else Some((q.name, runs.head, runs(runs.size / 2), runs.last))
    }
    val canaryPost = cpuCanary()

    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map { case (k, _, med, _) => s"${jstr(k)}:$med" }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, mn, med, mx) => s"${jstr(k)}:[$mn,$med,$mx]" }
      .mkString("{", ",", "}")
    val errs = errors.reverse
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._3).sum
    val totalMin = results.map(_._2).sum
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadAvg = osBean.getSystemLoadAverage // -1.0 if unavailable
    val procs = Runtime.getRuntime.availableProcessors
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":${jstr(sfDir)},"total_min":$totalMin,"spread_min_med_max":$spread,"available_processors":$procs,"load_average":$loadAvg,"cpu_canary_sec":[$canaryPre,$canaryPost]}""")
    spark.stop()
  }
}
