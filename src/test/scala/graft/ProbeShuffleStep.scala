package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Attribution probe for the 10×→40× per-doc shuffle step the round-14
  * artifacts show on d02x/d05x/d09x (6.1 KB/doc at 10×, 15.0 at 40× and
  * 100× — cleanly linear after the step). Runs the d02x MinHash pipeline
  * at the requested scales, capturing per-stage shuffle-write bytes with
  * the stage's callsite name, and prints the composed plan's join
  * strategies — enough to say whether the step is a broadcast→exchange
  * regime switch, a compression change, or real per-doc growth. Run:
  * `SPARK_GRAFT_STEP_SCALES=10,40 sbt "Test/runMain graft.ProbeShuffleStep"`.
  */
object ProbeShuffleStep {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scales = sys.env.getOrElse("SPARK_GRAFT_STEP_SCALES", "10,40")
      .split(",").map(_.trim.toInt)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = Tables.load(spark, sfDir, "documents")

    // appended from the listener-bus thread, read from main after the
    // flush — synchronize both sides for the happens-before edge
    final class StageLog extends SparkListener {
      private val buf =
        scala.collection.mutable.Buffer[(Int, String, Long, Long)]()
      def rows: Seq[(Int, String, Long, Long)] =
        buf.synchronized(buf.toVector)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val tm = sc.stageInfo.taskMetrics
        if (tm != null && (tm.shuffleWriteMetrics.bytesWritten > 0 ||
            tm.shuffleReadMetrics.localBytesRead +
              tm.shuffleReadMetrics.remoteBytesRead > 0))
          buf.synchronized {
            buf += ((sc.stageInfo.stageId,
              sc.stageInfo.name.take(90),
              tm.shuffleWriteMetrics.bytesWritten,
              tm.shuffleReadMetrics.localBytesRead +
                tm.shuffleReadMetrics.remoteBytesRead))
          }
      }
    }

    for (scale <- scales) {
      val docsK = graft.ops.ScaleStress.multiplyDocs(docs, scale).persist(lvl)
      val n = docsK.count()
      println(s"===== scale $scale  ($n docs) =====")
      // join strategies in the composed (pre-execution) plan
      val shape = graft.ops.MinHashLSH
        .nearDuplicates(docsK, "doc_id", "text", 0.5, materialize = false)
      val plan = shape.queryExecution.executedPlan.toString
      val joins = plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .map(_.trim.take(110)).toSeq
      println(s"-- plan joins/exchanges (${joins.size}):")
      joins.foreach(l => println(s"   $l"))
      // one measured run with per-stage attribution
      val log = new StageLog
      spark.sparkContext.addSparkListener(log)
      graft.ops.MinHashLSH.nearDuplicates(docsK, "doc_id", "text", 0.5)
        .write.format("noop").mode("overwrite").save()
      Measure.flushListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(log)
      val totalW = log.rows.map(_._3).sum
      println(f"-- stages with shuffle traffic (total write ${totalW / 1e9}%.2f GB, ${totalW / n / 1024.0}%.1f KB/doc):")
      log.rows.foreach { case (id, name, w, r) =>
        println(f"   stage $id%4d  w=${w / 1e6}%9.1f MB  r=${r / 1e6}%9.1f MB  $name")
      }
      docsK.unpersist(blocking = false)
    }
    spark.stop()
  }
}
