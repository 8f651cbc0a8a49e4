package graft

import org.apache.spark.sql.functions._

/** Interleaved capped-vs-uncapped d07x measurement at one stress scale
  * (round-15 plan #10): both modes alternate in ONE session (U, C, U, C)
  * with a per-leg CPU canary pair, so the capped win/loss at this scale
  * is measured without host-state caveats, and the adaptive arming
  * decision (EmbeddingDedup.DefaultArmShare) is checked against what it
  * would choose. Pair counts ride along — the cap's retention contract
  * (1.0 at every measured scale) is re-asserted in the same artifact.
  * Run: `SPARK_GRAFT_PROBE_SCALE=100 sbt "Test/runMain graft.ProbeCapAB"
  * > BENCH_r15_ab.json`.
  */
object ProbeCapAB {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_PROBE_SCALE", "100").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "2").toInt
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def canary(): (Double, Double) = Measure.canaryPair()

    val docs = Tables.load(spark, sfDir, "documents")
    val docsK = graft.ops.ScaleStress.multiplyDocs(docs, scale).persist(lvl)
    val n = docsK.count()
    val (planes, tables) = graft.ops.ScaleStress.geometryFor(n)
    val cap = graft.ops.EmbeddingDedup.occupancyCapFor(n, planes)

    // what the adaptive rule would decide at this scale (audit fact)
    val base = graft.ops.EmbeddingDedup
      .featurize(docsK, "doc_id", "text", planes, tables).persist(lvl)
    val (_, hotShare) = graft.ops.EmbeddingDedup
      .occupancyProfile(base, planes, cap, armShare = 0.0)
    base.unpersist(blocking = false)
    val armed = hotShare >= graft.ops.EmbeddingDedup.DefaultArmShare

    // one leg: the full pipeline (ends in an eager checkpoint, so the
    // construction wall IS the execution wall) + the pair count.
    // Modes: "uncapped" (no cap requested), "capped" (cap FORCED armed),
    // "adaptive" (cap requested, the shipped threshold decides — at
    // thin-tail scales this measures the disarmed path's profile-pass
    // overhead against pure uncapped).
    def leg(mode: String): (Double, Long, (Double, Double), (Double, Double)) = {
      val cPre = canary()
      val t0 = System.nanoTime()
      val pairs = graft.ops.EmbeddingDedup.nearDuplicates(
        docsK, "doc_id", "text", 0.8, planes, tables,
        maxOccupancy = if (mode == "uncapped") 0 else cap,
        minHotShare = if (mode == "capped") 0.0
          else graft.ops.EmbeddingDedup.DefaultArmShare)
      val nPairs = pairs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val cPost = canary()
      (sec, nPairs, cPre, cPost)
    }
    val modes = sys.env.getOrElse("SPARK_GRAFT_PROBE_MODES",
      "uncapped,capped").split(",").map(_.trim).toSeq
    // one untimed prewarm leg PER MODE: the routed kernel and hot-key
    // filters only exist on the capped path, so an uncapped-only prewarm
    // would bill their first-run JIT/codegen to the first capped leg —
    // the exact warm-state bias this interleaved probe exists to remove
    modes.foreach(leg)

    val legs = (1 to rounds).flatMap { r =>
      modes.map { mode =>
        val (sec, pairs, (cPre, cPreM), (cPost, cPostM)) = leg(mode)
        System.err.println(f"round $r $mode%-8s $sec%8.2f s pairs=$pairs " +
          f"canary=[$cPre%.3f,$cPost%.3f] multi=[$cPreM%.3f,$cPostM%.3f]")
        s"""{"round":$r,"mode":"$mode","sec":$sec,"pairs":$pairs,""" +
          s""""canary_sec":[$cPre,$cPost],""" +
          s""""canary_multi_sec":[$cPreM,$cPostM]}"""
      }
    }
    docsK.unpersist(blocking = false)
    println(s"""{"metric":"d07x_cap_ab","scale":$scale,"rows":$n,""" +
      s""""planes":$planes,"tables":$tables,"cap":$cap,""" +
      s""""hot_share":$hotShare,"adaptive_would_arm":$armed,""" +
      s""""legs":[${legs.mkString(",")}]}""")
    spark.stop()
  }
}
