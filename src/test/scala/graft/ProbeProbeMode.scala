package graft

import org.apache.spark.sql.functions._

/** Interleaved A/B of the d07 probe expansion (graft.d07.probeMode):
  * `zero` (r17 default — own + zero-bit flips, halved multiprobe) vs
  * `all` (the r16 both-directions probe set). Candidate-pair sets are
  * identical by construction (SigKeepRoutedSpec); this measures the
  * join-input halving.
  *
  * args: [rounds (default 3)] [scales... (default 0 10; 0 = headline 1×)]
  */
object ProbeProbeMode {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    val scales: Seq[Int] =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(0, 10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cores = cpus, shufflePartitions = cpus)
    val key = "graft.d07.probeMode"
    val docs = Tables.load(spark, sfDir, "documents")
    val modes = Seq("zero", "all")
    val (c0, c0m) = Measure.canaryPair()
    for (scale <- scales) {
      val (legName, leg, cleanup): (String, () => Double, () => Unit) =
        if (scale <= 1) {
          ("d07", () => {
            val t0 = System.nanoTime()
            graft.ops.EmbeddingDedup
              .nearDuplicates(docs, "doc_id", "text", 0.8)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }, () => ())
        } else {
          val docsK = graft.ops.ScaleStress.multiplyDocs(docs, scale)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val nK = docsK.count()
          val (p, t) = graft.ops.ScaleStress.geometryFor(nK)
          val cap = graft.ops.EmbeddingDedup.occupancyCapFor(nK, p)
          println(s"[pmode] scale=$scale rows=$nK planes=$p tables=$t cap=$cap")
          (s"d07x$scale", () => {
            val t0 = System.nanoTime()
            graft.ops.EmbeddingDedup.nearDuplicates(docsK, "doc_id", "text",
                0.8, planes = p, tables = t, maxOccupancy = cap)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }, () => docsK.unpersist(blocking = true))
        }
      for (m <- modes) { spark.conf.set(key, m); leg() } // prewarm both
      val res = scala.collection.mutable.Map(
        modes.map(_ -> List.empty[Double]): _*)
      for (_ <- 1 to rounds; m <- modes) {
        spark.conf.set(key, m)
        val (lc, _) = Measure.canaryPair()
        val w = leg()
        println(f"[pmode] $legName mode=$m: $w%.3f (leg canary $lc%.3f)")
        res(m) ::= w
      }
      for (m <- modes)
        println(f"[pmode] $legName mode=$m: " +
          res(m).reverse.map(x => f"$x%.3f").mkString(", "))
      cleanup()
    }
    val (c1, c1m) = Measure.canaryPair()
    println(f"[pmode] canary pre=[$c0%.3f,$c0m%.3f] post=[$c1%.3f,$c1m%.3f]")
    spark.conf.unset(key)
    spark.stop()
  }
}
