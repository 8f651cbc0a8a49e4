package graft

/** One-purpose probe for the adaptive occupancy-cap threshold
  * (EmbeddingDedup.DefaultArmShare): at each requested scale, featurize
  * the multiplied corpus under the continuous geometry rule and print
  * the over-cap Σocc² share — the quantity the arming decision reads.
  * Run: `SPARK_GRAFT_SHARE_SCALES=10,40,100 sbt "Test/runMain
  * graft.ProbeHotShare"`.
  */
object ProbeHotShare {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SHARE_SCALES", "10,40,100")
      .split(",").map(_.trim.toInt)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = Tables.load(spark, sfDir, "documents")
    for (scale <- scales) {
      val docsK = graft.ops.ScaleStress.multiplyDocs(docs, scale).persist(lvl)
      val n = docsK.count()
      val (planes, tables) = graft.ops.ScaleStress.geometryFor(n)
      val cap = graft.ops.EmbeddingDedup.occupancyCapFor(n, planes)
      val base = graft.ops.EmbeddingDedup
        .featurize(docsK, "doc_id", "text", planes, tables).persist(lvl)
      val t0 = System.nanoTime()
      val (hot, share) = graft.ops.EmbeddingDedup
        .occupancyProfile(base, planes, cap, armShare = 0.0)
      val profileSec = (System.nanoTime() - t0) / 1e9
      println(f"scale=$scale n=$n planes=$planes tables=$tables cap=$cap " +
        f"hotCells=${hot.length} hotOcc2Share=$share%.4f " +
        f"profileSec=$profileSec%.2f")
      base.unpersist(blocking = false)
      docsK.unpersist(blocking = false)
    }
    spark.stop()
  }
}
