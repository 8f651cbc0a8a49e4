package graft

/** Interleaved A/B of the stateful-shuffle-partition count for the
  * streaming corpus entries: state-store PROVIDER COUNT = shuffle
  * partitions at stream start (32 partitions × 4 join stores = 128
  * providers for st05), and provider load serializes on the global
  * StateStore.loadedProviders lock (thread-dump evidence). Each mode
  * sets spark.sql.shuffle.partitions for the streaming query only.
  */
object ProbeStreamPartitions {
  def main(args: Array[String]): Unit = {
    val names = (if (args.nonEmpty) args(0)
      else "st05_stream_stream_join,st02_stream_dedup,st01_tumbling_window")
      .split(",").toSeq
    val rounds = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cores = cpus, shufflePartitions = cpus)
    val key = "spark.sql.shuffle.partitions"
    val defs = names.map(n => SparkEntry.allDefs.find(_.name == n)
      .getOrElse(sys.error(s"no such query: $n")))
    def once(q: Qdef): Double = {
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val (c0, c0m) = Measure.canaryPair()
    val modes = Seq("32", "8")
    for (q <- defs) {
      for (mode <- modes) { spark.conf.set(key, mode); once(q) }
      val results = scala.collection.mutable.Map(
        modes.map(_ -> List.empty[Double]): _*)
      for (_ <- 1 to rounds; mode <- modes) {
        spark.conf.set(key, mode)
        results(mode) ::= once(q)
      }
      for (mode <- modes)
        println(f"[stpart] ${q.name} partitions=$mode: " +
          results(mode).reverse.map(t => f"$t%.3f").mkString(", "))
    }
    spark.conf.set(key, cpus.toString)
    val (c1, c1m) = Measure.canaryPair()
    println(f"[stpart] canary pre=[$c0%.3f,$c0m%.3f] post=[$c1%.3f,$c1m%.3f]")
    spark.stop()
  }
}
