package graft.lake

import graft.SparkTestBase
import graft.cdc._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Layout maintenance (compact) and the snapshot change feed (changes) —
  * both must be logically invisible: compact preserves state bit-for-bit
  * across every surface (current read, time travel, exactly-once ledger)
  * while shrinking the file count; changes must classify exactly the
  * live-row differences between two versions and see layout-only rewrites
  * as empty. */
class LakeMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(buckets: Int = 4): LakeTable =
    LakeTable.createOrReplace(spark, tmpDir("maint"), CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = buckets)

  private def batch(rows: (Long, String, String, String, String, String, String)*) =
    rows.toDF("lsn", "op", "repo", "path", "commit", "lang", "content")

  private def stateSet(t: LakeTable) =
    t.currentState().collect().map(_.toSeq).toSet

  test("compact bin-packs small files; state, time travel, changes and ledger unchanged") {
    val t = freshTable(buckets = 4)
    // one merge + several appends: appends accumulate small files per bucket
    t.merge(batch((1 to 40).map(i =>
      (i.toLong, "I", s"r$i", s"p$i", s"c$i", "scala", s"v$i")): _*), 0)
    (1 to 4).foreach { a =>
      t.append(Seq((s"ar$a", s"ap$a", s"ac$a", "scala", s"av$a", 100L + a))
        .toDF("repo", "path", "commit", "lang", "content", "lsn"))
    }
    val before = t.meta.currentSnapshot.get.files
    val preSnap = t.meta.currentSnapshotId
    val preState = stateSet(t)
    assert(before.size > t.meta.numBuckets, "need multiple files per bucket to compact")

    val saved = t.compact(targetFileBytes = 32L << 20, minFiles = 2)
    assert(saved > 0)
    val after = t.meta.currentSnapshot.get.files
    assert(after.size == before.size - saved)
    // tiny files all pack into one scan split -> one writer task -> exactly
    // one file per bucket
    after.groupBy(_.bucket).foreach { case (b, fs) =>
      assert(fs.size == 1, s"bucket $b not packed: ${fs.size} files")
    }
    assert(t.meta.currentSnapshot.get.operation == "compact")

    // logical state is untouched on every surface
    assert(stateSet(t) == preState)
    assert(t.currentState(Some(preSnap)).collect().map(_.toSeq).toSet == preState)
    assert(t.changes(preSnap).isEmpty, "layout-only rewrite must yield an empty feed")
    // exactly-once ledger: the pre-compact epoch still refuses replay
    assert(t.merge(batch((1L, "I", "r1", "p1", "c1", "scala", "v1")), epochId = 0).isEmpty)
    // row counts in the manifest survive the rewrite
    assert(after.map(_.rowCount).sum == before.map(_.rowCount).sum)
  }

  test("clustered compact sorts rewritten files; row-group stats become disjoint ranges") {
    val t = freshTable(buckets = 2)
    // keys arrive in scattered repo order across several commits
    def scattered(lo: Int, hi: Int) = (lo until hi).map { i =>
      (i.toLong, "I", f"r${(i * 37) % 400}%03d", s"p$i", s"c$i", "scala", "v" * 80)
    }
    t.merge(batch(scattered(0, 200): _*), 0)
    // appends leave extra small sibling files per bucket (a merge would COW
    // the whole bucket back to one file and give compact nothing to pack)
    (1 to 2).foreach { k =>
      t.append(scattered(200 * k, 200 * (k + 1))
        .map { case (lsn, _, repo, p, c, lang, v) => (repo, p, c, lang, v, lsn) }
        .toDF("repo", "path", "commit", "lang", "content", "lsn"))
    }
    val preState = stateSet(t)
    val preFiles = t.meta.currentSnapshot.get.files.map(_.path).toSet

    // tiny row groups so one compacted file carries many — the unit the
    // clustering exists to make prunable
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    val oldPage = hc.get("parquet.page.size")
    hc.setInt("parquet.block.size", 4096)
    hc.setInt("parquet.page.size", 1024)
    val saved = try t.compact(targetFileBytes = 32L << 20, minFiles = 2,
      sortBy = Seq("repo"))
    finally {
      if (oldBlock != null) hc.set("parquet.block.size", oldBlock) else hc.unset("parquet.block.size")
      if (oldPage != null) hc.set("parquet.page.size", oldPage) else hc.unset("parquet.page.size")
    }
    assert(saved > 0)
    assert(stateSet(t) == preState, "clustering must not change logical state")

    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val newFiles = t.meta.currentSnapshot.get.files.filterNot(f => preFiles(f.path))
    assert(newFiles.nonEmpty)
    // commits record on-disk size in the manifest (metadata-only planning)
    newFiles.foreach { f =>
      assert(f.sizeBytes ==
        java.nio.file.Files.size(java.nio.file.Paths.get(t.root, f.path)))
    }
    var multiGroup = false
    newFiles.foreach { f =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"${t.root}/${f.path}"),
        new org.apache.hadoop.conf.Configuration())
      val r = ParquetFileReader.open(in)
      val repoStats = try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        val c = b.getColumns.asScala.find(_.getPath.toDotString == "repo").get
        val s = c.getStatistics
        (new String(s.getMinBytes, "UTF-8"), new String(s.getMaxBytes, "UTF-8"))
      } finally r.close()
      if (repoStats.size > 1) {
        multiGroup = true
        // clustered: consecutive row groups cover non-overlapping, ascending
        // repo ranges — a range predicate reads only the groups that match
        repoStats.sliding(2).foreach { case Seq((_, max1), (min2, _)) =>
          assert(max1 <= min2, s"row-group ranges overlap: $repoStats")
        }
      }
      assert(repoStats.forall { case (mn, mx) => mn <= mx })
    }
    assert(multiGroup, "expected at least one multi-row-group file to demonstrate pruning")
  }

  test("z-order compact makes row-group stats prunable on BOTH dimensions") {
    val t = freshTable(buckets = 2)
    // a 32x32 grid of two independent dimensions, 4 rows per cell, arriving
    // scattered — parquet cuts row groups every ~100 rows, so a z-ordered
    // group covers a compact ~5x5 curve block instead of a full-width stripe
    def grid(lo: Int, hi: Int) = (lo until hi).map { i =>
      val cell = (i * 131) % 1024 // scatter the grid walk
      (i.toLong, "I", f"r${cell % 32}%03d", f"p${cell / 32}%03d", s"c$i", "scala", "v" * 80)
    }
    t.merge(batch(grid(0, 2048): _*), 0)
    (1 to 2).foreach { k =>
      t.append(grid(1024 * (k + 1), 1024 * (k + 2))
        .map { case (lsn, _, repo, p, c, lang, v) => (repo, p, c, lang, v, lsn) }
        .toDF("repo", "path", "commit", "lang", "content", "lsn"))
    }
    val preState = stateSet(t)
    val preFiles = t.meta.currentSnapshot.get.files.map(_.path).toSet

    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    val oldPage = hc.get("parquet.page.size")
    hc.setInt("parquet.block.size", 4096)
    hc.setInt("parquet.page.size", 1024)
    val saved = try t.compact(targetFileBytes = 32L << 20, minFiles = 2,
      zOrderBy = Seq("repo", "path"))
    finally {
      if (oldBlock != null) hc.set("parquet.block.size", oldBlock) else hc.unset("parquet.block.size")
      if (oldPage != null) hc.set("parquet.page.size", oldPage) else hc.unset("parquet.page.size")
    }
    assert(saved > 0)
    assert(stateSet(t) == preState, "z-ordering must not change logical state")
    intercept[IllegalArgumentException] { // exclusive knobs
      t.compact(sortBy = Seq("repo"), zOrderBy = Seq("path"))
    }

    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val newFiles = t.meta.currentSnapshot.get.files.filterNot(f => preFiles(f.path))
    assert(newFiles.nonEmpty)
    def groupRanges(path: String, column: String): Seq[(String, String)] = {
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), new org.apache.hadoop.conf.Configuration())
      val r = ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        val c = b.getColumns.asScala.find(_.getPath.toDotString == column).get
        (new String(c.getStatistics.getMinBytes, "UTF-8"),
          new String(c.getStatistics.getMaxBytes, "UTF-8"))
      } finally r.close()
    }
    // a mid-domain point predicate on EITHER dimension must skip most row
    // groups: exactly what lexicographic sortBy("repo") cannot give "path"
    var sawMultiGroup = false
    newFiles.foreach { f =>
      val repoRanges = groupRanges(s"${t.root}/${f.path}", "repo")
      val pathRanges = groupRanges(s"${t.root}/${f.path}", "path")
      if (repoRanges.size >= 8) {
        sawMultiGroup = true
        def hits(ranges: Seq[(String, String)], v: String) =
          ranges.count { case (mn, mx) => mn <= v && v <= mx }
        assert(hits(repoRanges, "r011") * 2 <= repoRanges.size,
          s"repo point predicate must skip at least half the row groups: $repoRanges")
        assert(hits(pathRanges, "p011") * 2 <= pathRanges.size,
          s"path point predicate must skip at least half the row groups: $pathRanges")
      }
    }
    assert(sawMultiGroup, "need >= 8 row groups per file to demonstrate pruning")
  }

  test("compact with nothing to gain is a no-op commit-free pass") {
    val t = freshTable(buckets = 2)
    t.merge(batch((1L, "I", "r", "p", "c", "scala", "v")), 0)
    val snap = t.meta.currentSnapshotId
    // every bucket holds a single file: below minFiles, nothing rewritten
    assert(t.compact(targetFileBytes = 32L << 20, minFiles = 2) == 0)
    assert(t.meta.currentSnapshotId == snap, "no-op compact must not commit")
  }

  test("changes classifies insert/update/delete between snapshots") {
    val t = freshTable()
    t.merge(batch(
      (1L, "I", "k1", "p", "c", "scala", "a"),
      (2L, "I", "k2", "p", "c", "scala", "b")), 0)
    val s1 = t.meta.currentSnapshotId
    t.merge(batch(
      (3L, "U", "k2", "p", "c", "scala", "b2"),
      (4L, "I", "k3", "p", "c", "scala", "c"),
      (5L, "D", "k1", "p", "c", "scala", null)), 1)

    val feed = t.changes(s1).collect()
      .map(r => r.getAs[String]("repo") ->
        ((r.getAs[String]("_change_type"), r.getAs[Long](LakeTable.LsnCol),
          r.getAs[String]("content")))).toMap
    assert(feed.keySet == Set("k1", "k2", "k3"))
    // delete carries the DELETING commit's lsn (tombstone), pre-image values
    assert(feed("k1") == (("delete", 5L, "a")))
    assert(feed("k2") == (("update", 3L, "b2")))
    assert(feed("k3") == (("insert", 4L, "c")))

    // same-version diff is empty; so is a diff across a vacuum (tombstone
    // removal is not a live change)
    assert(t.changes(s1, Some(s1)).isEmpty)
    val s2 = t.meta.currentSnapshotId
    assert(t.vacuum() == 1L)
    assert(t.changes(s2).isEmpty)
  }

  test("changes spans schema evolution (old side projected by column id)") {
    val t = freshTable()
    t.merge(batch((1L, "I", "k1", "p", "c", "scala", "a")), 0)
    val s1 = t.meta.currentSnapshotId
    t.evolveSchema(Seq(AddColumn("branch", StringType)))
    val upd = Seq((2L, "U", "k1", "p", "c", "scala", "a2", "main"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content", "branch")
    t.merge(CdcPipeline.toMergeInput(upd, t), 1)

    val rows = t.changes(s1).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("_change_type") == "update")
    assert(rows(0).getAs[String]("branch") == "main")
  }

  test("streaming auto-compact beat packs append leftovers in buckets merges don't touch") {
    // merge already rewrites (and thus packs) every bucket it touches, so
    // the files compaction exists for are append stragglers and long-tail
    // buckets no later merge revisits — seed exactly that layout
    val dir = tmpDir("autocompact")
    val cfg = GenConfig(numEvents = 60, numRepos = 1, pathsPerRepo = 1,
      commitsPerFile = 3, schemaBumps = Seq.empty) // 3 keys -> few touched buckets
    CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg))
      .repartitionByRange(1, col("lsn")).write.mode("overwrite").parquet(s"$dir/log")

    def seeded(root: String): LakeTable = {
      val t = LakeTable.createOrReplace(spark, root,
        CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 8)
      (1 to 3).foreach { a =>
        t.append((1 to 16).map(i => (s"r$i", s"p$i", s"c$a", "scala", s"v$a$i", a.toLong))
          .toDF("repo", "path", "commit", "lang", "content", "lsn"))
      }
      t
    }
    val maintained = seeded(s"$dir/t1")
    val preFiles = maintained.meta.currentSnapshot.get.files.size
    CdcPipeline.run(spark, s"$dir/log", maintained, s"$dir/ckpt1",
      evolution = Map.empty, compactEvery = 1)
    val plain = seeded(s"$dir/t2")
    CdcPipeline.run(spark, s"$dir/log", plain, s"$dir/ckpt2", evolution = Map.empty)

    assert(maintained.meta.snapshots.exists(_.operation == "compact"))
    assert(stateSet(maintained) == stateSet(plain))
    // the beat packed the append stragglers the merge never touched
    assert(maintained.meta.currentSnapshot.get.files.size < preFiles)
    val perBucket = maintained.meta.currentSnapshot.get.files.groupBy(_.bucket)
    assert(perBucket.values.forall(_.size == 1),
      s"unpacked buckets remain: ${perBucket.view.mapValues(_.size).toMap}")
  }

  test("rebucket re-hashes the table; state, merge, pruning and feeds stay consistent") {
    val t = freshTable(buckets = 2)
    t.merge(batch((1 to 50).map(i =>
      (i.toLong, "I", s"r$i", s"p$i", s"c$i", "scala", s"v$i")): _*), 0)
    val preState = stateSet(t)
    val preSnap = t.meta.currentSnapshotId

    t.rebucket(8)
    val m = t.meta
    assert(m.numBuckets == 8)
    assert(m.currentSnapshot.get.operation == "rebucket")
    // layout agrees with the flipped bucket function
    assert(m.currentSnapshot.get.files.forall(f => f.bucket >= 0 && f.bucket < 8))
    assert(m.currentSnapshot.get.files.map(_.bucket).distinct.size > 2)
    // logical state unchanged; pre-rebucket time travel intact; the exact
    // diff sees a rebucket as a pure rewrite
    assert(stateSet(t) == preState)
    assert(t.currentState(Some(preSnap)).collect().map(_.toSeq).toSet == preState)
    assert(t.changes(preSnap).isEmpty)

    // merges after the flip route by the new function and reconcile existing
    // keys (a bucket/layout mismatch would duplicate r1 instead)
    t.merge(batch((100L, "U", "r1", "p1", "c1", "scala", "v1b")), 1)
    val r1 = t.currentState().filter(col("repo") === "r1").collect()
    assert(r1.length == 1 && r1(0).getAs[String]("content") == "v1b")
    assert(t.currentState().count() == 50)

    // shrink works too
    t.rebucket(4)
    assert(t.meta.numBuckets == 4)
    assert(stateSet(t).map(_.take(3)).size == 50)
  }

  test("vacuum discovery is manifest-driven: a tombstone-free table runs zero Spark jobs") {
    val t = freshTable()
    t.merge(batch((1 to 20).map(i =>
      (i.toLong, "I", s"r$i", "p", "c", "scala", s"v$i")): _*), 0)
    assert(t.meta.vacuumLsn == -1L)
    val snap = t.meta.currentSnapshotId
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(t.vacuum() == 0L)
      Thread.sleep(500) // listener bus is async; give a started job time to surface
      assert(jobs.get() == 0,
        "vacuum on a tombstone-free table must prune every file from the manifest, not scan")
      assert(t.meta.currentSnapshotId == snap, "no-op vacuum must not commit")
      assert(t.meta.vacuumLsn == -1L)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("vacuum records the dropped-tombstone high-water for downstream consumers") {
    val t = freshTable()
    t.merge(batch(
      (1L, "I", "k1", "p", "c", "scala", "a"),
      (2L, "I", "k2", "p", "c", "scala", "b")), 0)
    t.merge(batch((3L, "D", "k1", "p", "c", "scala", null)), 1)
    assert(t.vacuum() == 1L)
    val v = t.meta.vacuumLsn
    assert(v >= 3L, s"vacuumLsn $v must cover the dropped tombstone's lsn")
    // a second vacuum with nothing eligible left must not move the gap marker
    assert(t.vacuum() == 0L)
    assert(t.meta.vacuumLsn == v)
  }

  test("changes refuses an expired from-snapshot instead of silently full-diffing") {
    val t = freshTable()
    t.merge(batch((1L, "I", "k1", "p", "c", "scala", "a")), 0)
    val s1 = t.meta.currentSnapshotId
    t.merge(batch((2L, "U", "k1", "p", "c", "scala", "a2")), 1)
    t.expireSnapshots(keepLast = 1)
    intercept[Exception](t.changes(s1))
  }
}
