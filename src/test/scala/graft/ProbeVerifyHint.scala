package graft

import org.apache.spark.sql.functions._

/** Interleaved A/B of the d07 verify-join strategy (graft.d07.verifyHint):
  * `none` lets AQE pick (broadcast when the vector side fits) vs the old
  * forced `shuffle_hash`. Runs the headline d07 AND the 10× stress
  * pipeline (geometry-ruled planes/tables + occupancy cap) in both modes
  * alternating, canary-bracketed.
  */
object ProbeVerifyHint {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cores = cpus, shufflePartitions = cpus)
    val key = "graft.d07.verifyHint"
    val docs = Tables.load(spark, sfDir, "documents")
    val docsK = graft.ops.ScaleStress.multiplyDocs(docs, 10)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nK = docsK.count()
    val (p, t) = graft.ops.ScaleStress.geometryFor(nK)
    val cap = graft.ops.EmbeddingDedup.occupancyCapFor(nK, p)
    def headline(): Double = {
      val t0 = System.nanoTime()
      graft.ops.EmbeddingDedup.nearDuplicates(docs, "doc_id", "text", 0.8)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def stress(): Double = {
      val t0 = System.nanoTime()
      graft.ops.EmbeddingDedup.nearDuplicates(docsK, "doc_id", "text", 0.8,
          planes = p, tables = t, maxOccupancy = cap)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val modes = Seq("none", "shuffle_hash")
    val (c0, c0m) = Measure.canaryPair()
    for ((legName, leg) <- Seq("d07" -> (() => headline()), "d07x10" -> (() => stress()))) {
      for (m <- modes) { spark.conf.set(key, m); leg() } // prewarm both
      val res = scala.collection.mutable.Map(modes.map(_ -> List.empty[Double]): _*)
      for (_ <- 1 to rounds; m <- modes) {
        spark.conf.set(key, m)
        res(m) ::= leg()
      }
      for (m <- modes)
        println(f"[vhint] $legName hint=$m: " +
          res(m).reverse.map(x => f"$x%.3f").mkString(", "))
    }
    val (c1, c1m) = Measure.canaryPair()
    println(f"[vhint] canary pre=[$c0%.3f,$c0m%.3f] post=[$c1%.3f,$c1m%.3f]")
    spark.conf.set(key, "none")
    spark.stop()
  }
}
