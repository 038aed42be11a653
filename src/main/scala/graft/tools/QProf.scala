package graft.tools

import org.apache.spark.scheduler._

/** Diagnostic: per-stage + per-job breakdown of one registered query (warm
  * run), separating task time from driver/scheduling gaps. args = query
  * names. Same session config as graft.Bench phase A. */
object QProf {
  class Log extends SparkListener {
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var jobs = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val m = si.taskMetrics
      val wall = (for { a <- si.submissionTime; b <- si.completionTime }
        yield (b - a) / 1e3).getOrElse(-1.0)
      lines.add(f"[stage] ${si.stageId}%3d ${si.name.takeWhile(_ != '\n').take(60)}%-60s " +
        f"t=${si.numTasks}%3d wall=$wall%6.2f run=${m.executorRunTime / 1e3}%7.2f " +
        f"cpu=${m.executorCpuTime / 1e9}%7.2f " +
        f"gc=${m.jvmGCTime / 1e3}%6.2f " +
        f"dser=${m.executorDeserializeTime / 1e3}%6.2f " +
        f"in=${m.inputMetrics.bytesRead >> 10}%6dK " +
        f"shR=${(m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead) >> 10}%5dK " +
        f"shW=${m.shuffleWriteMetrics.bytesWritten >> 10}%5dK")
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val work = java.nio.file.Files.createTempDirectory(
      graft.BenchJobs.workRoot, "graft-qprof").toString
    val spark = graft.BenchJobs.session(cpus, s"$work/local")
    try {
      args.foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        fn(spark, dir).count() // warm
        val log = new Log
        spark.sparkContext.addSparkListener(log)
        val t0 = System.nanoTime(); val n = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.removeSparkListener(log)
        Thread.sleep(300) // let listener drain
        println(s"===== $q  total=" + f"$sec%.2f s  jobs=${log.jobs}  rows=$n")
        log.lines.forEach(l => println(l))
      }
    } finally {
      spark.stop()
      graft.lake.LakeTable.deleteRecursively(java.nio.file.Paths.get(work))
    }
  }
}
