package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job profiling harness (the measure-first tool the optimization
  * guide §1 asks for when the UI is unavailable): run each named registry
  * query once with a listener that records every Spark job's wall time,
  * stage count/task count, and submitting call site — so multi-job
  * operators (k-means rounds, CC rounds, eager LSH) show WHERE a query's
  * seconds actually go.
  *
  * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.ProfileMain cp3_selective_pipeline' }}}
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Job(start: Long, site: String, var stages: Int = 0,
        var tasks: Int = 0, var shuffleReadMb: Double = 0,
        var shuffleWriteMb: Double = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, Job(e.time,
          Option(e.properties).flatMap(p =>
            Option(p.getProperty("callSite.short"))).getOrElse("?")))
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val j = stageToJob.get(e.stageInfo.stageId)
        Option(jobs.get(j)).foreach { job =>
          job.stages += 1
          job.tasks += e.stageInfo.numTasks
          job.shuffleReadMb +=
            e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6
          job.shuffleWriteMb +=
            e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(e.jobId)).foreach { j =>
          done.add(f"[job] ${e.jobId}%4d ${(e.time - j.start) / 1e3}%7.2f s " +
            f"stages=${j.stages}%3d tasks=${j.tasks}%5d " +
            f"sRead=${j.shuffleReadMb}%8.1fMB sWrite=${j.shuffleWriteMb}%8.1fMB  ${j.site}")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    args.foreach { name =>
      done.clear()
      val t0 = System.nanoTime()
      Queries.registry(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain the final job's events
      println(s"===== $name ${f"$dt%.2f"} s =====")
      done.forEach(l => println(l))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
