package graft

/** Interleaved A/B of spark.sql.streaming.checkpoint.fileChecksum.enabled
  * (Spark 4.1's per-checkpoint-file checksum writer): the st05 thread
  * dump showed every stateful task parked in
  * ChecksumCheckpointFileManager.awaitResult (132 task-run-seconds vs
  * 2.1 CPU-seconds in one micro-batch), so the knob is measured with
  * the streaming corpus entries alternating on/off in one session.
  */
object ProbeStreamChecksum {
  def main(args: Array[String]): Unit = {
    val names = (if (args.nonEmpty) args(0)
      else "st05_stream_stream_join,st02_stream_dedup,st01_tumbling_window")
      .split(",").toSeq
    val rounds = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cores = cpus, shufflePartitions = cpus)
    val key = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val defs = names.map(n => SparkEntry.allDefs.find(_.name == n)
      .getOrElse(sys.error(s"no such query: $n")))
    def once(q: Qdef): Double = {
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val (c0, c0m) = Measure.canaryPair()
    for (q <- defs) {
      for (mode <- Seq("true", "false")) { spark.conf.set(key, mode); once(q) }
      val results = scala.collection.mutable.Map(
        "true" -> List.empty[Double], "false" -> List.empty[Double])
      for (_ <- 1 to rounds; mode <- Seq("true", "false")) {
        spark.conf.set(key, mode)
        results(mode) ::= once(q)
      }
      for (mode <- Seq("true", "false"))
        println(f"[stchk] ${q.name} checksum=$mode: " +
          results(mode).reverse.map(t => f"$t%.3f").mkString(", "))
    }
    val (c1, c1m) = Measure.canaryPair()
    println(f"[stchk] canary pre=[$c0%.3f,$c0m%.3f] post=[$c1%.3f,$c1m%.3f]")
    spark.stop()
  }
}
