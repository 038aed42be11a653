package graft.lake

import graft.SparkTestBase
import graft.cdc._
import graft.sql.GraftCatalog

/** Snapshot rollback: a metadata-only commit that restores an earlier
  * retained snapshot's file set. Must preserve history (time travel to the
  * rolled-back state still works), never reuse reverted lsns, refuse to
  * cross a rebucket boundary, and fail loudly / full-resync downstream
  * lsn consumers whose base sits inside the reverted span — the exact
  * analogue of the vacuum-gap contract. */
class RollbackSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(buckets: Int = 4): LakeTable =
    LakeTable.createOrReplace(spark, tmpDir("rbk"), CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = buckets)

  private def batch(rows: (Long, String, String, String, String, String, String)*) =
    rows.toDF("lsn", "op", "repo", "path", "commit", "lang", "content")

  private def stateSet(t: LakeTable) =
    t.currentState().collect().map(_.toSeq).toSet

  test("rollback restores an earlier state metadata-only; history and lsns survive") {
    val t = freshTable()
    t.merge(batch((1 to 20).map(i =>
      (i.toLong, "I", s"r$i", "p", "c", "scala", s"v$i")): _*), 0)
    val s1 = t.meta.currentSnapshotId
    val state1 = stateSet(t)
    t.merge(batch(
      (41L, "U", "r1", "p", "c", "scala", "v1b"),
      (42L, "I", "r99", "p", "c", "scala", "new"),
      (43L, "D", "r2", "p", "c", "scala", null)), 1)
    val s2 = t.meta.currentSnapshotId
    val state2 = stateSet(t)
    assert(state2 != state1)

    // the rollback itself is pure metadata: zero Spark jobs
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val s3 = try {
      val id = t.rollback(s1)
      Thread.sleep(500) // listener bus is async
      assert(jobs.get() == 0, "rollback must not read or write data files")
      id
    } finally spark.sparkContext.removeSparkListener(listener)

    assert(stateSet(t) == state1)
    val snap = t.meta.currentSnapshot.get
    assert(snap.operation == "rollback" && snap.rollbackOf == s1)
    // history preserved: the rolled-back state is still time-travelable
    assert(t.currentState(Some(s2)).collect().map(_.toSeq).toSet == state2)
    // the hidden span (20, 43] is recorded on the restored lineage
    assert(t.meta.currentSnapshot.get.excludedLsns == Seq(LsnSpan(20L, 43L)))
    // reverted lsns are never reassigned: the next statement stamps above 43
    assert(t.nextLsn == 44L)
    // the epoch ledger survives: replaying epoch 1 refuses (its data stays
    // discarded — rollback means "drop those events", not "replay them")
    assert(t.merge(batch((41L, "U", "r1", "p", "c", "scala", "v1b")), epochId = 1).isEmpty)
    // writes on top of the restored state behave normally
    t.merge(batch((50L, "U", "r3", "p", "c", "scala", "v3b")), 2)
    assert(t.currentState().filter($"repo" === "r3").head().getAs[String]("content") == "v3b")
    // the exact join diff across the rollback is correct: r3 changed, and
    // nothing from the reverted span resurfaces
    val diff = t.changes(s1).collect()
      .map(r => (r.getAs[String]("repo"), r.getAs[String]("_change_type"))).toSet
    assert(diff == Set(("r3", "update")))
  }

  test("rollback refuses unknown targets and rebucket boundaries") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    val s1 = t.meta.currentSnapshotId
    assert(t.rollback(s1) == s1, "rollback to current is a no-op")
    intercept[RuntimeException](t.rollback(999L)) // unknown (incl. future) ids
    t.merge(batch((2L, "I", "r2", "p", "c", "scala", "v2")), 1)
    t.rebucket(8)
    val e = intercept[RuntimeException](t.rollback(s1))
    assert(e.getMessage.contains("rebucket"))
  }

  test("rollback refuses a rebucket boundary even after its snapshot expired") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    val s1 = t.meta.currentSnapshotId
    t.createTag("pin", Some(s1)) // keep the target itself retained
    t.merge(batch((2L, "I", "r2", "p", "c", "scala", "v2")), 1)
    t.rebucket(8)
    t.merge(batch((3L, "I", "r3", "p", "c", "scala", "v3")), 2)
    t.expireSnapshots(keepLast = 1)
    // the rebucket SNAPSHOT is gone; only the durable marker knows the
    // boundary — without it this rollback would silently restore
    // old-layout files under numBuckets=8
    assert(!t.meta.snapshots.exists(_.operation == "rebucket"))
    val e = intercept[RuntimeException](t.rollback(s1))
    assert(e.getMessage.contains("rebucket"))
    // and a pinned pre-rebucket snapshot must not claim the current layout
    // on the SQL scan (layout proof uses the same marker)
    assert(t.meta.rebucketAtSnapshot > s1)
  }

  test("rebucket refuses while write branches are open") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    t.createBranch("wap")
    val e = intercept[IllegalArgumentException](t.rebucket(8))
    assert(e.getMessage.contains("open write branches"))
    t.dropBranch("wap")
    t.rebucket(8) // legal once the branch is gone
    assert(t.meta.numBuckets == 8)
  }

  test("rolling back a layout-only commit records no gap; feeds keep working") {
    val t = freshTable()
    t.merge(batch((1 to 30).map(i =>
      (i.toLong, "I", s"r$i", "p", "c", "scala", s"v$i")): _*), 0)
    // appends accumulate small files per bucket (merges rewrite whole buckets)
    (1 to 3).foreach { a =>
      t.append(Seq((s"a$a", "p", "c", "scala", s"av$a", 30L + a))
        .toDF("repo", "path", "commit", "lang", "content", "lsn"))
    }
    val preCompact = t.meta.currentSnapshotId
    assert(t.compact(targetFileBytes = 32L << 20, minFiles = 2) > 0)
    t.rollback(preCompact)
    // same rows, same lsns — nothing was hidden, so no gap and no consumer
    // disruption
    assert(t.meta.currentSnapshot.get.excludedLsns.isEmpty)
    assert(t.changes(preCompact).isEmpty)
    assert(t.nextLsn == 34L)
  }

  test("$changes floor feed: exact across a rollback it predates, loud when inside the revert") {
    val wh = tmpDir("rbkwh")
    spark.conf.set("spark.sql.catalog.rbk1", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rbk1.warehouse", wh)
    val cat = new LakeCatalog(spark, wh)
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    t.merge(batch((1L, "I", "k1", "p", "c", "scala", "a")), 0)
    val s1 = t.meta.currentSnapshotId
    t.merge(batch((2L, "I", "k2", "p", "c", "scala", "b")), 1)
    val s2 = t.meta.currentSnapshotId
    t.merge(batch(
      (3L, "I", "k3", "p", "c", "scala", "c"),
      (4L, "D", "k1", "p", "c", "scala", null)), 2)
    t.rollback(s2)

    def feed(from: Long) = spark.read.option("fromSnapshot", from.toString)
      .table("rbk1.ns.`t$changes`").collect()
      .map(x => (x.getAs[String]("repo"), x.getAs[String]("_change_type"),
        x.getAs[Long]("_lsn"))).toSet

    // base predates the restored state: the snapshot diff is exact — only
    // s2's insert, nothing from the reverted commit
    assert(feed(s1) == Set(("k2", "upsert", 2L)))
    // base IS the restored state: empty feed
    assert(feed(s2) == Set.empty)
    // base sits inside the reverted span (it saw k3/the delete): loud error,
    // not a silent half-feed
    val s3 = s2 + 1
    val e = intercept[Exception](feed(s3))
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t => t.getMessage +: msgs(t.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("rollback")), e.getMessage)
    // bootstrap stays exact: the full restored image
    assert(spark.read.table("rbk1.ns.`t$changes`").collect()
      .map(_.getAs[String]("repo")).toSet == Set("k1", "k2"))
  }

  test("rolling FORWARD (undoing a rollback) clears the exclusions it re-covers") {
    val t = freshTable()
    t.merge(batch((1L, "I", "k1", "p", "c", "scala", "a")), 0)
    val s1 = t.meta.currentSnapshotId
    t.merge(batch(
      (2L, "I", "k2", "p", "c", "scala", "b"),
      (3L, "I", "k3", "p", "c", "scala", "c")), 1)
    val s2 = t.meta.currentSnapshotId
    val state2 = stateSet(t)

    // sync a JDBC sink past the span that is about to be reverted
    val url = "jdbc:derby:memory:rbkfwd;create=true"
    val sink = new JdbcUpsertSink(url, "fwd_t", Seq("repo", "path", "commit"))
    sink.ensureTable(t.currentState().schema)
    JdbcWarehouseSync.syncOnce(t, sink)
    assert(sink.watermark() == 3L)

    t.rollback(s1) // mistake...
    assert(t.meta.currentSnapshot.get.excludedLsns == Seq(LsnSpan(1L, 3L)))
    t.rollback(s2) // ...undone: restored lineage covers (1, 3] again
    assert(t.meta.currentSnapshot.get.excludedLsns.isEmpty,
      "roll-forward must clear the spans the restored snapshot re-covers")
    assert(stateSet(t) == state2)

    // the sink synced state2 and state2 is back: NO resync storm, no-op beat
    assert(JdbcWarehouseSync.syncOnce(t, sink) == 0L)
    assert(sink.watermark() == 3L)
    // and a feed based on s2 is exact again (endpooints cover the same lsns)
    assert(t.changes(s2).isEmpty)

    // whereas a sink that DID observe only the rolled-back state resyncs
    // exactly once when the mistake happens, then goes quiet
    val t2 = freshTable()
    val sink2 = new JdbcUpsertSink(url, "fwd_t2", Seq("repo", "path", "commit"))
    sink2.ensureTable(t2.currentState().schema)
    t2.merge(batch((1L, "I", "k1", "p", "c", "scala", "a")), 0)
    val u1 = t2.meta.currentSnapshotId
    t2.merge(batch((2L, "I", "k2", "p", "c", "scala", "b")), 1)
    JdbcWarehouseSync.syncOnce(t2, sink2)
    t2.rollback(u1)
    t2.merge(batch((9L, "I", "k9", "p", "c", "scala", "z")), 2) // new writes above the span
    JdbcWarehouseSync.syncOnce(t2, sink2) // resyncs: wm 2 covered excluded (1,2]
    val rows = spark.read.jdbc(url, "fwd_t2", new java.util.Properties)
      .select("repo").collect().map(_.getString(0)).toSet
    assert(rows == Set("k1", "k9"))
    assert(JdbcWarehouseSync.syncOnce(t2, sink2) == 0L, "same rollback must not re-fire")
  }

  test("a SECOND rollback to the same snapshot re-fires the sink resync") {
    // exclusion spans are IDENTICAL when the same snapshot is rolled back
    // to twice — only the rollback COUNT can tell the instances apart. An
    // lsn-high-water marker (the old guard) skips the second, required
    // resync and strands the re-reverted rows in the warehouse forever.
    val t = freshTable()
    val url = "jdbc:derby:memory:rbk2sink;create=true"
    val sink = new JdbcUpsertSink(url, "rbk2_t", Seq("repo", "path", "commit"))
    sink.ensureTable(t.currentState().schema)
    def targetRepos() = spark.read.jdbc(url, "rbk2_t", new java.util.Properties)
      .select("repo").collect().map(_.getString(0)).toSet
    t.merge(batch((1L, "I", "k1", "p", "c", "scala", "a")), 0)
    val s1 = t.meta.currentSnapshotId
    t.merge(batch((2L, "I", "k2", "p", "c", "scala", "b")), 1)
    val s2 = t.meta.currentSnapshotId
    JdbcWarehouseSync.syncOnce(t, sink)
    assert(targetRepos() == Set("k1", "k2"))

    t.rollback(s1) // mistake #1
    JdbcWarehouseSync.syncOnce(t, sink) // resync drops k2
    assert(targetRepos() == Set("k1"))
    t.rollback(s2) // roll forward: spans cleared
    JdbcWarehouseSync.syncOnce(t, sink) // incremental re-applies k2
    assert(targetRepos() == Set("k1", "k2"))

    t.rollback(s1) // mistake #2 — the SAME span (1, 2] as mistake #1
    JdbcWarehouseSync.syncOnce(t, sink)
    assert(targetRepos() == Set("k1"),
      "second rollback to the same snapshot did not resync — k2 stranded")
    assert(JdbcWarehouseSync.syncOnce(t, sink) == 0L, "resync loop")
  }

  test("incremental rollup views stay exact across a rollback commit") {
    val t = freshTable()
    val vm = new ViewMaintainer(t, tmpDir("rbkviews"), Seq(
      RollupView("langs", Seq("lang"))))
    t.merge(batch((1 to 30).map(i =>
      (i.toLong, "I", s"r$i", "p", "c", if (i % 3 == 0) "py" else "scala", s"v$i")): _*), 0)
    val s1 = t.meta.currentSnapshotId
    t.merge(batch(
      (31L, "I", "go1", "p", "c", "go", "g"),
      (32L, "D", "r3", "p", "c", "py", null)), 1)
    vm.refreshAll()
    def viewRows() = vm.table("langs").currentState()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    t.rollback(s1)
    // the rollback commit's file diff is symmetric (restored files added,
    // reverted files removed), so the ±1-weighted incremental step must
    // retract the go insert and resurrect the deleted py row exactly
    val scanned = vm.refreshAll()("langs")
    assert(viewRows() == Map("scala" -> 20L, "py" -> 10L))
    assert(viewRows() == t.currentState().groupBy(org.apache.spark.sql.functions.col("lang"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    // and it stayed incremental: only the rollback's symmetric difference
    // was read, not the whole table
    assert(scanned < t.meta.currentSnapshot.get.files.size * 2,
      s"rollback refresh read $scanned files")
  }

  test("JDBC warehouse sync full-resyncs a sink whose watermark was rolled back") {
    val t = freshTable()
    val url = "jdbc:derby:memory:rbksink;create=true"
    val sink = new JdbcUpsertSink(url, "rbk_t", Seq("repo", "path", "commit"))
    sink.ensureTable(t.currentState().schema)
    t.merge(batch(
      (1L, "I", "k1", "p", "c", "scala", "a"),
      (2L, "I", "k2", "p", "c", "scala", "b")), 0)
    val s1 = t.meta.currentSnapshotId
    JdbcWarehouseSync.syncOnce(t, sink)
    t.merge(batch(
      (3L, "I", "k3", "p", "c", "scala", "c"),
      (4L, "U", "k2", "p", "c", "scala", "b2")), 1)
    JdbcWarehouseSync.syncOnce(t, sink)
    assert(sink.watermark() == 4L)

    t.rollback(s1)
    // the sink replicated k3 + the k2 update, both now reverted; the lsn path
    // can't express that — the beat must detect the gap and push the full
    // corrected image (k3 deleted, k2 restored)
    JdbcWarehouseSync.syncOnce(t, sink)
    val target = spark.read.jdbc(url, "rbk_t", new java.util.Properties)
      .select("repo", "content").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(target == Set(("k1", "a"), ("k2", "b")))
    // watermark settled at the restored high-water: the next beat is a no-op
    assert(sink.watermark() == 2L)
    assert(JdbcWarehouseSync.syncOnce(t, sink) == 0L)
  }
}
