package graft.lake

import graft.SparkTestBase
import graft.cdc._
import org.apache.spark.sql.functions._

/** DistinctSketchView: HLL approx-distinct rollups maintained incrementally
  * from the base table's commit history (feed-observed semantics — see the
  * class doc in ViewMaintainer.scala). */
class SketchViewSpec extends SparkTestBase {
  import CdcPipeline.baseTableSchema

  private type Row7 = (Long, String, String, String, String, String, String)

  private def mkBatch(rows: Seq[Row7]) = {
    import spark.implicits._
    rows.toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
  }

  private def mergeBatch(t: LakeTable, rows: Seq[Row7], epoch: Long): Unit = {
    val b = mkBatch(rows)
    val stats = CdcPipeline.batchStats(b, t.bucketExpr(t.meta))
    t.merge(CdcPipeline.toMergeInput(b, t), epoch, Some(stats.perBucket))
  }

  private def estimates(vm: ViewMaintainer, name: String): Map[String, Long] =
    vm.table(name).currentState()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("feed-observed distinct: updates/deletes never un-observe, reads ∝ batch, exactly-once") {
    val t = LakeTable.createOrReplace(spark, tmpDir("dsv"), baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 8)
    val vm = new ViewMaintainer(t, tmpDir("dsviews"), Seq(
      DistinctSketchView("repos_by_lang", Seq("lang"), Seq("repo" -> "repos"))))

    mergeBatch(t, Seq(
      (1L, "I", "r1", "p1", "c", "scala", "a"),
      (2L, "I", "r2", "p2", "c", "scala", "b"),
      (3L, "I", "r3", "p3", "c", "scala", "c"),
      (4L, "I", "r9", "p4", "c", "py", "d")), 0L)
    vm.refreshAll()
    assert(estimates(vm, "repos_by_lang") == Map("scala" -> 3L, "py" -> 1L))

    // LWW update moves key (r3,p3,c) from scala to py: live-state distinct
    // would shrink scala to 2, but feed-observed keeps every value a feed
    // consumer saw — scala stays 3, py gains r3.
    mergeBatch(t, Seq((10L, "U", "r3", "p3", "c", "py", "c2")), 1L)
    val totalFiles = t.meta.currentSnapshot.get.files.size
    val scanned = vm.refreshAll()("repos_by_lang")
    assert(scanned < totalFiles, s"incremental refresh read $scanned of $totalFiles files")
    assert(estimates(vm, "repos_by_lang") == Map("scala" -> 3L, "py" -> 2L))

    // delete: the value stays observed
    mergeBatch(t, Seq((20L, "D", "r9", "p4", "c", "py", null)), 2L)
    vm.refreshAll()
    assert(estimates(vm, "repos_by_lang") == Map("scala" -> 3L, "py" -> 2L))

    // up to date: a second refresh must not commit a new view snapshot
    val snapBefore = vm.table("repos_by_lang").meta.currentSnapshotId
    assert(vm.refreshAll()("repos_by_lang") == 0L)
    assert(vm.table("repos_by_lang").meta.currentSnapshotId == snapBefore)
  }

  test("multi-commit catch-up in one union step equals a one-shot sketch over all observed upserts") {
    val t = LakeTable.createOrReplace(spark, tmpDir("dsv2"), baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 8)
    val vm = new ViewMaintainer(t, tmpDir("dsviews2"), Seq(
      DistinctSketchView("repos_by_lang", Seq("lang"), Seq("repo" -> "repos"))))
    // three commits, unique keys per batch (every row survives = observed)
    val batches: Seq[Seq[Row7]] = (0 until 3).map { e =>
      (0 until 40).map { i =>
        val n = e * 40 + i
        (n + 1L, "I", s"r${n % 23}", s"p$n", "c",
          if (n % 3 == 0) "py" else "scala", s"v$n"): Row7
      }
    }
    mergeBatch(t, batches(0), 0L)
    mergeBatch(t, batches(1), 1L)
    mergeBatch(t, batches(2), 2L) // view never refreshed in between
    vm.refreshAll() // must catch up across all three snapshots at once
    val exact = batches.flatten.groupBy(_._6)
      .map { case (lang, rs) => lang -> rs.map(_._3).distinct.size.toLong }
    assert(estimates(vm, "repos_by_lang") == exact)
  }

  test("compaction is a manifest-skip no-op: ledger advances, zero files read, estimates unchanged") {
    val t = LakeTable.createOrReplace(spark, tmpDir("dsv3"), baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    val vm = new ViewMaintainer(t, tmpDir("dsviews3"), Seq(
      DistinctSketchView("repos_by_lang", Seq("lang"), Seq("repo" -> "repos"))))
    mergeBatch(t, (0 until 30).map(i =>
      (i + 1L, "I", s"r${i % 11}", s"p$i", "c", "scala", s"v$i"): Row7), 0L)
    // append (no bucket reconciliation) leaves a SECOND small file per
    // bucket — merge alone cannot, its COW rewrite repacks whole buckets
    t.append(mkBatch((30 until 60).map(i =>
      (i + 1L, "I", s"r${i % 11}", s"p$i", "c", "py", s"v$i"): Row7))
      .select("repo", "path", "commit", "lang", "content", "lsn"), 1L)
    vm.refreshAll()
    val before = estimates(vm, "repos_by_lang")
    assert(t.compact(targetFileBytes = 128L << 20, minFiles = 2) > 0,
      "compaction should have rewritten small files")
    val scanned = vm.refreshAll()("repos_by_lang")
    assert(scanned == 0L, s"rewrite-only commit read $scanned files (lsnMax skip failed)")
    assert(estimates(vm, "repos_by_lang") == before)
  }

  test("rollback resets the sketch to the live state (rolled-back values drop out)") {
    val t = LakeTable.createOrReplace(spark, tmpDir("dsv4"), baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    val vm = new ViewMaintainer(t, tmpDir("dsviews4"), Seq(
      DistinctSketchView("repos_by_lang", Seq("lang"), Seq("repo" -> "repos"))))
    mergeBatch(t, Seq(
      (1L, "I", "r1", "p1", "c", "scala", "a"),
      (2L, "I", "r2", "p2", "c", "scala", "b")), 0L)
    vm.refreshAll()
    val target = t.meta.currentSnapshotId
    mergeBatch(t, Seq((10L, "I", "rX", "p3", "c", "scala", "x")), 1L)
    vm.refreshAll()
    assert(estimates(vm, "repos_by_lang") == Map("scala" -> 3L))
    t.rollback(target) // reverts rX; view floor now covers excluded lsns
    vm.refreshAll()
    assert(estimates(vm, "repos_by_lang") == Map("scala" -> 2L),
      "rollback must force a live-state rebuild, not keep the rolled-back value")
  }

  test("floor snapshot expiry forces a live-state rebuild, then incremental resumes") {
    val t = LakeTable.createOrReplace(spark, tmpDir("dsv7"), baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    val vm = new ViewMaintainer(t, tmpDir("dsviews7"), Seq(
      DistinctSketchView("repos_by_lang", Seq("lang"), Seq("repo" -> "repos"))))
    mergeBatch(t, Seq(
      (1L, "I", "r1", "p1", "c", "scala", "a"),
      (2L, "I", "r2", "p2", "c", "scala", "b")), 0L)
    vm.refreshAll()
    mergeBatch(t, Seq((10L, "I", "r3", "p3", "c", "scala", "x")), 1L)
    mergeBatch(t, Seq((11L, "I", "r4", "p4", "c", "scala", "y")), 2L)
    t.expireSnapshots(keepLast = 1) // the view's floor snapshot is gone
    vm.refreshAll() // must fall back to a full live-state rebuild
    assert(estimates(vm, "repos_by_lang") == Map("scala" -> 4L))
    // and incremental maintenance resumes from the rebuilt floor
    mergeBatch(t, Seq((12L, "I", "r5", "p5", "c", "py", "z")), 3L)
    val scanned = vm.refreshAll()("repos_by_lang")
    assert(scanned < t.meta.currentSnapshot.get.files.size,
      s"post-reset refresh should be incremental again, read $scanned files")
    assert(estimates(vm, "repos_by_lang") == Map("scala" -> 4L, "py" -> 1L))
  }

  test("replace() forces a rebuild: new-generation values observed despite sub-floor lsns") {
    import spark.implicits._
    val t = LakeTable.createOrReplace(spark, tmpDir("dsv6"), baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    val vm = new ViewMaintainer(t, tmpDir("dsviews6"), Seq(
      DistinctSketchView("repos_by_lang", Seq("lang"), Seq("repo" -> "repos"))))
    mergeBatch(t, Seq(
      (100L, "I", "r1", "p1", "c", "scala", "a"),
      (101L, "I", "r2", "p2", "c", "scala", "b")), 0L)
    vm.refreshAll() // floor is now 101
    // new generation WITHOUT an lsn column: rows land with lsn=0 (< floor) —
    // the incremental floor filter would never see them
    t.replace(Seq(("rA", "pA", "c", "go", "x"), ("rB", "pB", "c", "go", "y"))
      .toDF("repo", "path", "commit", "lang", "content"), 1L)
    vm.refreshAll()
    assert(estimates(vm, "repos_by_lang") == Map("go" -> 2L),
      "replace must reset the sketch to the new generation")
  }

  test("estimate accuracy at HGM-mode cardinality and consumer-side sketch mergeability") {
    import spark.implicits._
    val t = LakeTable.createOrReplace(spark, tmpDir("dsv5"), baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    val vm = new ViewMaintainer(t, tmpDir("dsviews5"), Seq(
      DistinctSketchView("repos_by_lang", Seq("lang"), Seq("repo" -> "repos"))))
    val n = 5000 // well past coupon-exact territory for lgK=12
    mergeBatch(t, (0 until n).map(i =>
      (i + 1L, "I", s"repo-$i", s"p$i", "c",
        if (i % 2 == 0) "a" else "b", "v"): Row7), 0L)
    vm.refreshAll()
    val est = estimates(vm, "repos_by_lang")
    assert(math.abs(est("a") - n / 2.0) / (n / 2.0) < 0.05, s"a: ${est("a")}")
    assert(math.abs(est("b") - n / 2.0) / (n / 2.0) < 0.05, s"b: ${est("b")}")
    // the stored sketch column stays mergeable: union across groups
    // approximates the global distinct count without touching the base table
    val global = vm.table("repos_by_lang").currentState()
      .agg(hll_sketch_estimate(hll_union_agg(col("repos_hll"))).as("g"))
      .as[Long].head()
    assert(math.abs(global - n.toDouble) / n < 0.05, s"global: $global")
  }
}
