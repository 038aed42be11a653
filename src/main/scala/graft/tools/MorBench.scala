package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.lake._

/** Trickle-ingest micro-benchmark: the workload merge-on-read exists for.
  *
  * A CDC destination at the reference's 600 s beat receives SMALL batches
  * against a LARGE table; hash-bucketed keys spread even a 1k-row batch
  * across every bucket, so each copy-on-write beat rewrites the whole
  * table. This main replays the same deterministic trickle twice — COW
  * merges vs delta merges + one fold — and reports wall time and BYTES
  * WRITTEN per mode (summed over each commit's added files, the write
  * amplification that dominates at scale), asserting the final states are
  * checksum-identical.
  *
  * Env knobs: SPARK_GRAFT_MOR_BASE (initial rows, default 2,000,000),
  * SPARK_GRAFT_MOR_BATCH (rows per trickle batch, default 5,000),
  * SPARK_GRAFT_MOR_BATCHES (beats, default 16), SPARK_GRAFT_MOR_BUCKETS
  * (default 32). Scratch under java.io.tmpdir.
  */
object MorBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-mor-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val baseRows = sys.env.getOrElse("SPARK_GRAFT_MOR_BASE", "2000000").toLong
    val batchRows = sys.env.getOrElse("SPARK_GRAFT_MOR_BATCH", "5000").toLong
    val batches = sys.env.getOrElse("SPARK_GRAFT_MOR_BATCHES", "16").toInt
    val buckets = sys.env.getOrElse("SPARK_GRAFT_MOR_BUCKETS", "32").toInt

    // deterministic synthetic rows: key = (repo, path, commit) UNIQUE per id
    // (path carries the id), so the base table holds `baseRows` live keys
    def rows(from: Long, n: Long, lsn0: Long, op: String): DataFrame =
      spark.range(from, from + n).select(
        (col("id") + lsn0).as("lsn"), lit(op).as("op"),
        concat(lit("repo-"), pmod(col("id"), lit(200))).as("repo"),
        concat(lit("src/f"), col("id"), lit(".scala")).as("path"),
        concat(lit("c"), pmod(col("id"), lit(50))).as("commit"),
        lit("scala").as("lang"),
        concat(lit("content-"), col("id"), lit("-"),
          sha2(concat(lit("b"), col("id")), 256)).as("content"))

    def checksum(t: LakeTable): String = {
      val r = t.currentState()
        .agg(sum(crc32(concat_ws("",
          col("repo"), col("path"), col("commit"), col("content"))))).head()
      r.get(0).toString
    }

    def run(delta: Boolean): (Double, Double, Long, String) = {
      val dir = java.nio.file.Files.createTempDirectory(
        if (delta) "mor-d" else "mor-c").toString
      val t = LakeTable.createOrReplace(spark, s"$dir/t",
        CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = buckets)
      t.merge(rows(0, baseRows, 0, "I"), 0) // the big base (not timed)
      val t0 = System.nanoTime()
      var epoch = 1L
      (0 until batches).foreach { b =>
        // each beat updates a deterministic slice of existing keys
        val from = (b.toLong * batchRows * 7) % math.max(baseRows - batchRows, 1)
        t.merge(rows(from, batchRows, baseRows + b * batchRows, "U"),
          epoch, delta = delta)
        epoch += 1
      }
      if (delta) t.foldDeltas()
      val wallS = (System.nanoTime() - t0) / 1e9
      // write amplification: every file some trickle commit (incl. the fold)
      // added, summed by recorded on-disk size
      val m = t.meta
      val baseSnap = m.snapshots.find(_.operation == "merge").get
      val seen = collection.mutable.Set(baseSnap.files.map(_.path): _*)
      var bytes = 0L
      m.snapshots.filter(_.snapshotId > baseSnap.snapshotId).foreach { s =>
        s.files.filterNot(f => seen.contains(f.path)).foreach { f =>
          bytes += f.sizeBytes; seen += f.path
        }
      }
      val chk = checksum(t)
      val evS = batches * batchRows / wallS
      LakeTable.deleteRecursively(java.nio.file.Paths.get(dir))
      (wallS, evS, bytes, chk)
    }

    val (cowWall, cowEv, cowBytes, cowChk) = run(delta = false)
    val (morWall, morEv, morBytes, morChk) = run(delta = true)
    require(cowChk == morChk, s"state diverged: cow=$cowChk mor=$morChk")
    val line = f"""{"bench":"mor_trickle","base_rows":$baseRows,""" +
      f""""batch_rows":$batchRows,"batches":$batches,"buckets":$buckets,""" +
      f""""cow":{"wall_s":$cowWall%.2f,"ev_per_s":$cowEv%.0f,"bytes_written":$cowBytes},""" +
      f""""mor":{"wall_s":$morWall%.2f,"ev_per_s":$morEv%.0f,"bytes_written":$morBytes},""" +
      f""""write_amplification_ratio":${cowBytes.toDouble / math.max(morBytes, 1)}%.1f,""" +
      f""""speedup":${cowWall / morWall}%.2f,"checksums_equal":true}"""
    println(line)
    System.err.println(line)
    spark.stop()
  }
}
