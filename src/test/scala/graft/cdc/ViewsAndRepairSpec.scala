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
