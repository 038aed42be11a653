package graft.tools


/** Diagnostic: time individual registered queries (args = query names),
  * under the SAME session config as graft.Bench phase A so numbers are
  * directly comparable (honors SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR). */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val work = java.nio.file.Files.createTempDirectory(
      graft.BenchJobs.workRoot, "graft-qtime").toString
    val spark = graft.BenchJobs.session(cpus, s"$work/local")
    try {
      args.foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        fn(spark, dir).count() // warm
        val t0 = System.nanoTime(); val n = fn(spark, dir).count()
        println(f"[qtime] $q%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      }
    } finally {
      spark.stop()
      graft.lake.LakeTable.deleteRecursively(java.nio.file.Paths.get(work))
    }
  }
}
