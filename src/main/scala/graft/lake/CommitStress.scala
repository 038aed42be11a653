package graft.lake

import java.nio.file.Paths

/** Child-JVM worker for `CommitTortureSpec`'s cross-process contention
  * tests — a separate PROCESS (not a thread) per writer, because the commit
  * protocol's only coordination is the filesystem: nothing in-process may
  * accidentally serialize the race.
  *
  * Modes:
  *  - `meta <root> <writerId> <n> [posix|store]` — n metadata-only commits
  *    (each appends one no-op snapshot tagged with a writer-unique epoch)
  *    through the raw tryWriteVersion loop, retrying lost races forever.
  *    Session-free: starts in <1 s, so two writers genuinely contend.
  *  - `merge <root> <writerId> <n> <rowsPerMerge>` — n real MERGE commits
  *    from a local SparkSession over writer-disjoint key ranges, then one
  *    compact() — the full data path (stage → footer stats → conditional
  *    commit) under cross-process contention.
  *
  * Prints exactly one `STRESS {...}` line; the parent asserts on it plus
  * the final table state.
  */
object CommitStress {
  def main(args: Array[String]): Unit = args(0) match {
    case "meta" => meta(args(1), args(2).toLong, args(3).toInt,
      if (args.length > 4) args(4) else "posix")
    case "merge" => merge(args(1), args(2).toLong, args(3).toInt, args(4).toInt)
    case other => sys.error(s"unknown mode $other")
  }

  private def meta(root: String, writer: Long, n: Int, backend: String): Unit = {
    val io: CommitIo = backend match {
      case "store" => new ObjectStoreCommitIo(Paths.get(root, ".store"))
      case _ => PosixCommitIo
    }
    val metaDir = Paths.get(root, "metadata")
    var conflicts = 0
    var i = 0
    while (i < n) {
      val m = LakeTable.metaAt(root)
      val sid = m.nextSnapshotId
      val parentFiles = m.currentSnapshot.map(_.files).getOrElse(Seq.empty)
      val snap = Snapshot(sid, m.currentSnapshotId, writer * 100000L + i,
        m.currentSchemaId, "stress", parentFiles, 0L)
      val next = m.copy(snapshots = m.snapshots :+ snap,
        currentSnapshotId = sid, version = m.version + 1)
      if (LakeTable.tryWriteVersion(metaDir, next, io)) i += 1
      else conflicts += 1
    }
    println(s"""STRESS {"mode":"meta","writer":$writer,"commits":$n,"conflicts":$conflicts}""")
  }

  private def merge(root: String, writer: Long, n: Int, rows: Int): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName(s"commit-stress-$writer")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import org.apache.spark.sql.functions._
      val t = LakeTable.forPath(spark, root)
      var conflicts = 0
      // a lost data-changing race aborts LOUDLY (requireSnapshotIdFree /
      // persistent-conflict error) and commitOrClean drops the staged
      // files — re-staging against the new head is the documented caller
      // contract, and epoch idempotence makes the retry safe
      def retrying(op: => Unit): Unit = {
        var done = false
        while (!done) {
          try { op; done = true }
          catch {
            case e: RuntimeException
                if e.getMessage != null &&
                  (e.getMessage.contains("retry against the new head") ||
                   e.getMessage.contains("commit conflict persisted")) =>
              conflicts += 1
          }
        }
      }
      (0 until n).foreach { i =>
        // writer-disjoint keys; lsn only needs per-key uniqueness
        val batch = spark.range(rows.toLong).select(
          (col("id") + i.toLong * rows + 1L).as("lsn"),
          lit("I").as("op"),
          lit(s"repo-w$writer").as("repo"),
          concat(lit(s"b$i/f"), col("id")).as("path"),
          lit("c0").as("commit"),
          lit("scala").as("lang"),
          concat(lit(s"w$writer-b$i-"), col("id")).as("content"))
        retrying(t.merge(batch, epochId = writer * 100000L + i))
      }
      retrying(t.compact(targetFileBytes = 1L << 20))
      val live = t.currentState().count()
      println(s"""STRESS {"mode":"merge","writer":$writer,"commits":$n,"conflicts":$conflicts,"live":$live}""")
    } finally spark.stop()
  }
}
