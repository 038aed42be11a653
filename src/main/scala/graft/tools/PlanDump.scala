package graft.tools

/** Diagnostic: dump `.explain("formatted")` for registered queries to files.
  *
  * args: outDir suffix query...   (suffix = "before" | "after")
  * Writes outDir/<query>_<suffix>.txt under the same session config as
  * graft.Bench phase A (honors SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR), so
  * the committed plans are the plans the bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    java.nio.file.Files.createDirectories(outDir)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val work = java.nio.file.Files.createTempDirectory(
      graft.BenchJobs.workRoot, "graft-plandump").toString
    val spark = graft.BenchJobs.session(cpus, s"$work/local")
    try {
      names.foreach { q =>
        val df = graft.SparkEntry.queries(q)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"${q}_$suffix.txt"), plan)
        println(s"[plandump] wrote ${q}_$suffix.txt (${plan.length} chars)")
      }
    } finally {
      spark.stop()
      graft.lake.LakeTable.deleteRecursively(java.nio.file.Paths.get(work))
    }
  }
}

/** Extra benchmark (guide §1.4): per-query noop-sink isolation — computes
  * EVERY column of every row and discards it, so the timing is the
  * computation, not count()'s pruned plan or a sink. Separate main so the
  * frozen Bench harness stays untouched. args = query names (default: all).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val work = java.nio.file.Files.createTempDirectory(
      graft.BenchJobs.workRoot, "graft-benchextra").toString
    val spark = graft.BenchJobs.session(cpus, s"$work/local")
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    try {
      names.foreach { q =>
        val fn = graft.SparkEntry.queries(q)
        def noop(): Unit = fn(spark, dir)
          .write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(q)
        noop() // warm
        val t = graft.BenchJobs.timeSec(noop())
        println(f"""{"query":"$q","noop_sec":$t%.3f}""")
      }
    } finally {
      spark.stop()
      graft.lake.LakeTable.deleteRecursively(java.nio.file.Paths.get(work))
    }
  }
}
