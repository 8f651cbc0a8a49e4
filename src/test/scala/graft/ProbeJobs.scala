package graft

import scala.collection.mutable.ArrayBuffer

/** Per-job breakdown probe (optimization rounds, guide §1/§7): runs one
  * named bench query with a listener that records every job's wall,
  * stage count, task count and shuffle bytes — the local[32] stand-in
  * for the Spark UI's Jobs page (spark.ui is off in this sandbox).
  * Shows WHERE a multi-stage pipeline's seconds go: how many jobs the
  * construction triggers (eager checkpoints), how many the noop sink
  * runs, and which stage dominates.
  *
  * args: <queryName> [repeats (default 3)]
  * env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val repeats = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cores = cpus, shufflePartitions = cpus)
    val q = SparkEntry.benchDefs.find(_.name == name)
      .orElse(SparkEntry.allDefs.find(_.name == name))
      .getOrElse(sys.error(s"no such query: $name"))

    final case class JobRec(id: Int, submitted: Long, var finished: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var shuffleRead: Long = 0L,
      var shuffleWrite: Long = 0L, var desc: String = "",
      var runMs: Long = 0L, var cpuMs: Long = 0L)
    val jobs = ArrayBuffer.empty[JobRec]
    val byId = scala.collection.mutable.Map.empty[Int, JobRec]
    val stageToJob = scala.collection.mutable.Map.empty[Int, JobRec]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId, e.time)
        r.desc = Option(e.properties)
          .map(_.getProperty("spark.job.description", "")).getOrElse("")
        r.stages = e.stageIds.size
        jobs.synchronized { jobs += r; byId(e.jobId) = r
          e.stageIds.foreach(s => stageToJob(s) = r) }
      }
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized { byId.get(e.jobId).foreach(_.finished = e.time) }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageInfo.stageId).foreach { r =>
            r.tasks += e.stageInfo.numTasks
            val tm = e.stageInfo.taskMetrics
            if (tm != null) {
              r.shuffleRead += tm.shuffleReadMetrics.totalBytesRead
              r.shuffleWrite += tm.shuffleWriteMetrics.bytesWritten
              r.runMs += tm.executorRunTime
              r.cpuMs += tm.executorCpuTime / 1000000L
              if (sys.env.get("SPARK_GRAFT_PROBE_STAGES").contains("1"))
                println(f"    stage ${e.stageInfo.stageId}%4d job ${r.id}%3d " +
                  f"tasks ${e.stageInfo.numTasks}%4d run ${tm.executorRunTime / 1000.0}%7.2f " +
                  f"cpu ${tm.executorCpuTime / 1e9}%7.2f shW ${tm.shuffleWriteMetrics.bytesWritten}%11d " +
                  f"shR ${tm.shuffleReadMetrics.totalBytesRead}%11d  ${e.stageInfo.name.take(70)}")
            }
          }
        }
    }

    // prewarm (2, matching the bench protocol)
    (1 to 2).foreach { _ =>
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    spark.sparkContext.addSparkListener(listener)
    val walls = (1 to repeats).map { i =>
      jobs.synchronized { jobs.clear(); byId.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      val df = q.run(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      Measure.flushListenerBus(spark.sparkContext)
      val snap = jobs.synchronized { jobs.toVector }
      println(f"== run $i: total ${(t2 - t0) / 1e9}%.3f s (construct ${(t1 - t0) / 1e9}%.3f)")
      var prevEnd = 0L
      snap.sortBy(_.submitted).foreach { r =>
        val wall = (r.finished - r.submitted) / 1e3
        val gap = if (prevEnd == 0) 0.0 else (r.submitted - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, r.finished)
        println(f"  job ${r.id}%4d ${wall}%8.3f s  gap ${gap}%6.3f  stages ${r.stages}%2d tasks ${r.tasks}%4d  run ${r.runMs / 1000.0}%7.2f cpu ${r.cpuMs / 1000.0}%7.2f  shW ${r.shuffleWrite}%10d shR ${r.shuffleRead}%10d  ${r.desc.take(60)}")
      }
      (t2 - t0) / 1e9
    }
    println(f"[jobs] $name walls: ${walls.map(w => f"$w%.3f").mkString(", ")}")
    spark.stop()
  }
}
