package graft.cdc

import graft.SparkTestBase
import graft.lake._
import org.apache.spark.sql.functions._

class ViewsAndRepairSpec extends SparkTestBase {
  import CdcPipeline.baseTableSchema

  private def freshTable(): LakeTable =
    LakeTable.createOrReplace(spark, tmpDir("vrtbl"), baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)

  test("maintained rollup views refresh per commit, full-refresh semantics, exactly-once") {
    import spark.implicits._
    val t = freshTable()
    val vm = new ViewMaintainer(t, tmpDir("views"), Seq(
      ViewDef("files_by_lang", st =>
        st.groupBy(col("lang")).agg(count(lit(1)).as("n")))))
    val versions = new TableVersions
    val b1 = Seq(
      (1L, "I", "r1", "p1", "c1", "scala", "a"),
      (2L, "I", "r2", "p2", "c2", "scala", "b"),
      (3L, "I", "r3", "p3", "c3", "py", "c"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    CdcPipeline.processBatch(b1, 0L, t, Map.empty, versions, None, views = Some(vm))
    def viewRows() = vm.table("files_by_lang").currentState()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viewRows() == Map("scala" -> 2L, "py" -> 1L))

    // delete the only py row: full refresh must DROP the py group (an
    // upsert-maintained view would keep a stale py=1 row forever)
    val b2 = Seq((4L, "D", "r3", "p3", "c3", "py", null))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    CdcPipeline.processBatch(b2, 1L, t, Map.empty, versions, None, views = Some(vm))
    assert(viewRows() == Map("scala" -> 2L))

    // replayed epoch: base merge is a no-op, view must not double-refresh
    val snapBefore = vm.table("files_by_lang").meta.currentSnapshotId
    CdcPipeline.processBatch(b2, 1L, t, Map.empty, versions, None, views = Some(vm))
    assert(vm.table("files_by_lang").meta.currentSnapshotId == snapBefore)
    assert(viewRows() == Map("scala" -> 2L))
  }

  test("incremental rollup view: byte-equal to full recompute, reads ∝ batch, catch-up after skipped refresh") {
    import spark.implicits._
    val t = LakeTable.createOrReplace(spark, tmpDir("ivtbl"), baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 32)
    val vmCount = new ViewMaintainer(t, tmpDir("iviews2"), Seq(
      RollupView("langs", Seq("lang"))))
    def mkBatch(rows: Seq[(Long, String, String, String, String, String, String)]) =
      rows.toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    val versions = new TableVersions

    // epoch 0: broad insert batch touching many buckets
    val b0 = mkBatch((1 to 60).map(i =>
      (i.toLong, "I", s"r${i % 7}", s"p$i", "c", if (i % 3 == 0) "py" else "scala", s"v$i")))
    CdcPipeline.processBatch(b0, 0L, t, Map.empty, versions, None, views = Some(vmCount))

    def viewRows() = vmCount.table("langs").currentState()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def fullRecompute() = t.currentState().groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viewRows() == fullRecompute())
    assert(viewRows() == Map("scala" -> 40L, "py" -> 20L))

    // epoch 1: small batch touching ONE key (one bucket of 32): the refresh
    // must read only that bucket's old+new files, not the whole table
    val totalFiles = t.meta.currentSnapshot.get.files.size
    val b1 = mkBatch(Seq((100L, "U", "r1", "p1", "c", "scala", "v1b")))
    val stats1 = CdcPipeline.batchStats(b1, t.bucketExpr(t.meta))
    t.merge(CdcPipeline.toMergeInput(b1, t), 1L, Some(stats1.perBucket))
    val scanned = vmCount.refreshAll(1L)("langs")
    assert(scanned <= 2, s"incremental refresh read $scanned files") // old+new file of 1 bucket
    assert(scanned < totalFiles, s"refresh must not scan all $totalFiles files")
    assert(viewRows() == fullRecompute())

    // epoch 2: delete every py row — the py group must VANISH (count-zero drop)
    val b2 = mkBatch((1 to 60).filter(_ % 3 == 0).map(i =>
      (200L + i, "D", s"r${i % 7}", s"p$i", "c", "py", null: String)))
    CdcPipeline.processBatch(b2, 2L, t, Map.empty, versions, None, views = Some(vmCount))
    assert(viewRows() == fullRecompute())
    assert(!viewRows().contains("py"))

    // crash window: base commits an epoch but the refresh never runs...
    val b3 = mkBatch(Seq((400L, "I", "r9", "p900", "c", "go", "g1")))
    val stats3 = CdcPipeline.batchStats(b3, t.bucketExpr(t.meta))
    t.merge(CdcPipeline.toMergeInput(b3, t), 3L, Some(stats3.perBucket))
    // ...and another epoch lands after it. refreshAll must catch BOTH up, in
    // order, from the view's own base-snapshot ledger.
    val b4 = mkBatch(Seq((401L, "I", "r9", "p901", "c", "go", "g2")))
    CdcPipeline.processBatch(b4, 4L, t, Map.empty, versions, None, views = Some(vmCount))
    assert(viewRows() == fullRecompute())
    assert(viewRows()("go") == 2L)

    // replayed refresh: no new base snapshot → zero reads, state unchanged
    val snapBefore = vmCount.table("langs").meta.currentSnapshotId
    assert(vmCount.refreshAll(4L)("langs") == 0L)
    assert(vmCount.table("langs").meta.currentSnapshotId == snapBefore)
  }

  test("incremental rollup with sum columns matches full recompute under updates and deletes") {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("grp", org.apache.spark.sql.types.StringType, true),
      org.apache.spark.sql.types.StructField("amount", org.apache.spark.sql.types.LongType, true)))
    val t = LakeTable.createOrReplace(spark, tmpDir("svtbl"), schema, Seq("k"), numBuckets = 8)
    val vm = new ViewMaintainer(t, tmpDir("sviews"), Seq(
      RollupView("by_grp", Seq("grp"), sumCols = Seq(("amount", "total")), countAlias = "n")))
    def m(rows: Seq[(Long, String, String, String, java.lang.Long)]): Unit = {
      val epoch = t.meta.currentSnapshotId // any fresh id
      t.merge(rows.toDF("lsn", "op", "k", "grp", "amount"), 1000 + epoch)
      vm.refreshAll()
    }
    def viewRows() = vm.table("by_grp").currentState()
      .collect().map(r => (r.getString(0), (r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2)))).toMap
    def full() = t.currentState().groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("amount")).as("total"))
      .collect().map(r => (r.getString(0), (r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2)))).toMap
    m(Seq((1L, "I", "a", "g1", 10L), (2L, "I", "b", "g1", 5L), (3L, "I", "c", "g2", 7L)))
    assert(viewRows() == full() && viewRows()("g1") == ((2L, 15L)))
    // update moves a row BETWEEN groups: retraction from g1, addition to g2
    m(Seq((4L, "U", "b", "g2", 6L)))
    assert(viewRows() == full() && viewRows() == Map("g1" -> ((1L, 10L)), "g2" -> ((2L, 13L))))
    // delete the last g2 rows: group disappears
    m(Seq((5L, "D", "b", "g2", null), (6L, "D", "c", "g2", null)))
    assert(viewRows() == full() && viewRows() == Map("g1" -> ((1L, 10L))))
  }

  test("ProcessingTime trigger keeps tailing a growing log (reference's scheduled beat)") {
    val cfg = GenConfig(numEvents = 1000, numRepos = 5, pathsPerRepo = 3,
      commitsPerFile = 2, schemaBumps = Seq.empty)
    val log = CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg)).cache()
    val half1 = log.filter(col("lsn") <= 500)
    val half2 = log.filter(col("lsn") > 500)
    val logDir = tmpDir("ptlog")
    half1.write.mode("append").parquet(logDir)
    val t = freshTable()
    val q = CdcPipeline.start(spark, logDir, t, tmpDir("ptckpt"),
      evolution = Map.empty,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(250))
    try {
      def expectedOf(df: org.apache.spark.sql.DataFrame) =
        Reconciler.expectedFromLog(df, ChangeEvent.keyCols).count()
      def await(n: Long): Unit = {
        val deadline = System.nanoTime() + 120L * 1000000000L // generous: shared host
        while (t.currentState().count() != n) {
          assert(System.nanoTime() < deadline, s"timed out waiting for $n rows")
          Thread.sleep(200)
        }
      }
      await(expectedOf(half1))
      // the log GROWS while the query runs — the beat must pick it up
      half2.write.mode("append").parquet(logDir)
      await(expectedOf(log))
      assert(Reconciler.missing(log, t).count() == 0)
    } finally { q.stop(); log.unpersist() }
  }

  test("SQL-declared views refresh on the streaming ingest beat (forTable wiring)") {
    val dir = tmpDir("declviews")
    val t = LakeTable.createOrReplace(spark, s"$dir/t", baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 8)
    t.createMaintainedView(MaintainedViewDef("by_lang", "rollup", Seq("lang")))
    t.createMaintainedView(MaintainedViewDef("repos_by_lang", "distinct_sketch",
      Seq("lang"), Seq(AggColDef("repo", "repos"))))
    val cfg = GenConfig(numEvents = 2000, numRepos = 10, pathsPerRepo = 4,
      commitsPerFile = 2, schemaBumps = Seq.empty)
    val logDir = s"$dir/log"
    CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg))
      .write.parquet(logDir)
    // the CLI `stream` wiring: declared views → ViewMaintainer.forTable on
    // the table's parent dir, refreshed inside every foreachBatch commit
    val vm = ViewMaintainer.forTable(t, dir)
    CdcPipeline.run(spark, logDir, t, s"$dir/ckpt", views = Some(vm))
    // rollup is retraction-exact vs a live recompute
    val got = vm.table("by_lang").currentState()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = t.currentState().groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // the sketch view materialized too; feed-observed ⊇ live per lang
    val sketch = vm.table("repos_by_lang").currentState()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val liveDistinct = t.currentState().groupBy(col("lang"))
      .agg(countDistinct(col("repo")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(liveDistinct.keySet.subsetOf(sketch.keySet))
    liveDistinct.foreach { case (lang, d) =>
      assert(sketch(lang) >= d, s"$lang: observed ${sketch(lang)} < live $d")
    }
  }

  test("id-targeted repair re-syncs an explicit pending-key list") {
    val cfg = GenConfig(numEvents = 2000, numRepos = 8, pathsPerRepo = 4,
      commitsPerFile = 2, schemaBumps = Seq.empty)
    val log = CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg)).cache()
    val t = freshTable()
    // simulate a partial sync: one repo's events never arrived
    val victim = log.select("repo").distinct().orderBy("repo").head().getString(0)
    CdcPipeline.replayBatch(spark, log.filter(col("repo") =!= victim), t, Map.empty)
    val missingBefore = Reconciler.missing(log, t).count()
    assert(missingBefore > 0)
    // the reference's pending-id list: just the keys we know are suspect
    val ids = Reconciler.expectedFromLog(log, ChangeEvent.keyCols)
      .filter(col("repo") === victim)
      .select("repo", "path", "commit")
    val repaired = Reconciler.repairIds(log, t, ids)
    assert(repaired == missingBefore)
    assert(Reconciler.missing(log, t).count() == 0)
    assert(Reconciler.stale(log, t).count() == 0)
    // re-running the same repair is a no-op by LWW idempotence
    assert(Reconciler.repairIds(log, t, ids) == repaired) // rows re-synced, state unchanged
    assert(Reconciler.stale(log, t).count() == 0)
    log.unpersist()
  }
}
