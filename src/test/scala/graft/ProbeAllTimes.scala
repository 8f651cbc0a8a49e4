package graft

/** Coverage timing probe (optimization rounds): one prewarm + N measured
  * noop-sink runs of EVERY corpus entry at the given scale, so the
  * operators OUTSIDE the 23-query headline bench get a measured number
  * too (guide §1: measure first — the headline set is the driver's
  * protocol, but "optimize every operator" needs a number per entry).
  * Prints a sorted tab-separated table (median, min, name) plus the
  * canary pair bracketing the run.
  *
  * args: [nameRegex] [measuredRuns (default 2)]
  * env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  */
object ProbeAllTimes {
  def main(args: Array[String]): Unit = {
    val keep: String => Boolean =
      if (args.nonEmpty && args(0).nonEmpty) {
        val r = args(0).r; n => r.findFirstIn(n).isDefined
      } else _ => true
    val measured = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cores = cpus, shufflePartitions = cpus)
    val (c0, c0m) = Measure.canaryPair()
    def once(q: Qdef): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[times] ${q.name} FAILED: ${e.getMessage}")
        None
      }
    }
    val rows = SparkEntry.allDefs.filter(q => keep(q.name)).flatMap { q =>
      spark.sparkContext.setJobDescription(q.name)
      once(q) // prewarm
      val runs = (1 to measured).flatMap(_ => once(q)).sorted
      spark.sparkContext.setJobDescription(null)
      if (runs.isEmpty) None
      else Some((q.name, runs(runs.size / 2), runs.head))
    }
    val (c1, c1m) = Measure.canaryPair()
    println(f"[times] canary pre=[$c0%.3f,$c0m%.3f] post=[$c1%.3f,$c1m%.3f] sf=$sfDir runs=$measured")
    println("median\tmin\tname")
    rows.sortBy(-_._2).foreach { case (n, med, mn) =>
      println(f"$med%.3f\t$mn%.3f\t$n")
    }
    println(f"[times] total-of-medians=${rows.map(_._2).sum}%.2f over ${rows.size} entries")
    spark.stop()
  }
}
