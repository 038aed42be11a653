package graft.lake

import graft.SparkTestBase
import graft.cdc._
import org.apache.spark.sql.types.LongType

/** TableMirror (lake-to-lake incremental replication) and named snapshot
  * tags (retention-pinned refs). */
class MirrorAndTagsSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(buckets: Int = 4): LakeTable =
    LakeTable.createOrReplace(spark, tmpDir("mir"), CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = buckets)

  private def batch(rows: (Long, String, String, String, String, String, String)*) =
    rows.toDF("lsn", "op", "repo", "path", "commit", "lang", "content")

  private def liveSet(t: LakeTable) =
    t.currentState().collect().map(_.toSeq).toSet

  // ------------------------------------------------------------ mirror

  test("mirror: bootstrap equality, incremental delta beats, delete propagation, idempotence") {
    val src = freshTable()
    src.merge(batch((1 to 30).map(i =>
      (i.toLong, "I", s"r${i % 5}", s"p$i", "c", "scala", s"v$i")): _*), 0)
    val destRoot = tmpDir("mirdst") + "/dst"

    val boot = TableMirror.syncOnce(src, destRoot)
    val dest = LakeTable.forPath(spark, destRoot)
    assert(boot.mode == "bootstrap" && boot.rowsApplied == 30)
    assert(liveSet(dest) == liveSet(src))

    // incremental beat: update + delete + insert; lsn values must replicate
    src.merge(batch(
      (41L, "U", "r1", "p1", "c", "scala", "v1b"),
      (42L, "D", "r2", "p2", "c", "scala", null),
      (43L, "I", "r9", "pX", "c", "go", "new")), 1)
    val inc = TableMirror.syncOnce(src, destRoot)
    assert(inc.mode == "incremental", s"got $inc")
    assert(liveSet(dest) == liveSet(src))
    assert(dest.currentState().count() == 30L) // +1 insert, -1 delete
    // deleted key really gone on the mirror
    assert(dest.currentState().filter($"repo" === "r2" && $"path" === "p2").isEmpty)
    // source lsns carried through (not re-stamped)
    val lsn = dest.read().filter($"repo" === "r1" && $"path" === "p1")
      .select("_lsn").head().getLong(0)
    assert(lsn == 41L)

    // re-running the drained beat is a no-op
    val again = TableMirror.syncOnce(src, destRoot)
    assert(again.mode == "noop" && again.rowsApplied == 0)
    assert(liveSet(dest) == liveSet(src))
  }

  test("mirror: a merge-on-read source (delta commits) replicates exactly") {
    val src = freshTable()
    src.merge(batch((1 to 30).map(i =>
      (i.toLong, "I", s"r${i % 5}", s"p$i", "c", "scala", s"v$i")): _*), 0)
    val destRoot = tmpDir("mirmor") + "/dst"
    TableMirror.syncOnce(src, destRoot)
    val dest = LakeTable.forPath(spark, destRoot)
    // a delta commit layers instead of rewriting; the mirror beat rides
    // changes(), which widens to bucket granularity for delta-touched
    // buckets and classifies updates as updates — the follower must land
    // on the exact merged state, deletes included
    src.merge(batch(
      (41L, "U", "r1", "p1", "c", "scala", "v1-mor"),
      (42L, "D", "r2", "p2", "c", "scala", null),
      (43L, "I", "rX", "pX", "c", "go", "new")), 1, delta = true)
    val inc = TableMirror.syncOnce(src, destRoot)
    assert(inc.mode == "incremental", s"got $inc")
    assert(liveSet(dest) == liveSet(src))
    assert(dest.currentState().filter($"repo" === "r2" && $"path" === "p2").isEmpty)
    // a fold on the source is layout-only: the next beat must be a no-op
    assert(src.foldDeltas() >= 1)
    val after = TableMirror.syncOnce(src, destRoot)
    assert(after.rowsApplied == 0, s"fold leaked rows into the feed: $after")
    assert(liveSet(dest) == liveSet(src))
  }

  test("mirror survives schema evolution AFTER the source's last data commit") {
    val src = freshTable()
    src.merge(batch((1L, "I", "r1", "p1", "c", "scala", "v1"),
      (2L, "I", "r2", "p2", "c", "go", "v2")), 0)
    val destRoot = tmpDir("mirpost") + "/dst"
    TableMirror.syncOnce(src, destRoot)
    // data commit, then evolution with NO further data commit: the feed is
    // in the snapshot's schema, the dest aligns to the CURRENT one — the
    // beat must project the delta by column id, not wedge on a require
    src.merge(batch((3L, "U", "r1", "p1", "c", "scala", "v1b")), 1)
    src.evolveSchema(Seq(RenameColumn("content", "body"),
      AddColumn("stars", org.apache.spark.sql.types.LongType)))
    val s = TableMirror.syncOnce(src, destRoot)
    assert(s.mode == "incremental", s"got $s")
    val dest = LakeTable.forPath(spark, destRoot)
    assert(dest.meta.currentSchema.columns.map(_.name) ==
      src.meta.currentSchema.columns.map(_.name))
    assert(liveSet(dest) == liveSet(src))
    assert(dest.currentState().filter($"body" === "v1b").count() == 1)
  }

  test("mirror replays chained renames from one diff window in dependency order") {
    val src = freshTable()
    src.merge(batch((1L, "I", "r1", "p1", "c", "scala", "v1")), 0)
    val destRoot = tmpDir("mirchain") + "/dst"
    TableMirror.syncOnce(src, destRoot)
    // two legal evolution steps between beats: content→body, then lang→content.
    // In current-column order the diff would try lang→content while content
    // still exists — the renames must apply dependency-first
    src.evolveSchema(Seq(RenameColumn("content", "body")))
    src.evolveSchema(Seq(RenameColumn("lang", "content")))
    src.merge(Seq((2L, "I", "r9", "p9", "c", "py", "v9"))
      .toDF("lsn", "op", "repo", "path", "commit", "content", "body"), 1)
    val s = TableMirror.syncOnce(src, destRoot)
    assert(s.mode == "incremental", s"got $s")
    val dest = LakeTable.forPath(spark, destRoot)
    assert(dest.meta.currentSchema.columns.map(_.name) ==
      src.meta.currentSchema.columns.map(_.name))
    assert(liveSet(dest) == liveSet(src))
  }

  test("mirror recovers when a crash separated schema evolution from its bookmark") {
    val src = freshTable()
    src.merge(batch((1L, "I", "r1", "p1", "c", "scala", "v1")), 0)
    val destRoot = tmpDir("mircrash") + "/dst"
    TableMirror.syncOnce(src, destRoot)
    // simulate: the previous beat evolved the dest but died before
    // recording mirror.source.schema — the dest already matches the target
    src.evolveSchema(Seq(AddColumn("extra", org.apache.spark.sql.types.StringType)))
    val dest = LakeTable.forPath(spark, destRoot)
    dest.evolveSchema(Seq(AddColumn("extra", org.apache.spark.sql.types.StringType)))
    src.merge(Seq((2L, "U", "r1", "p1", "c", "scala", "v1b", "x"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content", "extra"), 1)
    val s = TableMirror.syncOnce(src, destRoot) // must not require-fail
    assert(s.mode == "incremental", s"got $s")
    assert(liveSet(LakeTable.forPath(spark, destRoot)) == liveSet(src))
  }

  test("mirror refuses a source whose data columns collide with the envelope names") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType, true)))
    val t = LakeTable.createOrReplace(spark, tmpDir("mirres"), schema, Seq("k"))
    t.replace(Seq(("a", "keep-me", 1L)).toDF("k", "op", "lsn"))
    val ex = intercept[IllegalArgumentException] {
      TableMirror.syncOnce(t, tmpDir("mirresd") + "/dst")
    }
    assert(ex.getMessage.contains("reserved"), ex.getMessage)
  }

  test("mirror: incremental beat reads only touched buckets, not the table") {
    val src = freshTable(buckets = 8)
    src.merge(batch((1 to 400).map(i =>
      (i.toLong, "I", s"r$i", s"p$i", "c", "scala", s"v$i" * 10)): _*), 0)
    val destRoot = tmpDir("mirdst2") + "/dst"
    TableMirror.syncOnce(src, destRoot)
    // touch exactly one key → COW rewrites that key's bucket only
    src.merge(batch((500L, "U", "r7", "p7", "c", "scala", "v7b")), 1)

    val bytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        bytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead); ()
      }
    }
    val totalBytes = src.meta.currentSnapshot.get.files.map(_.sizeBytes).sum
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = TableMirror.syncOnce(src, destRoot)
      assert(r.mode == "incremental")
      Thread.sleep(500) // listener bus is async
      // the beat reads the changed bucket from BOTH snapshots of the source
      // diff plus the destination's matching bucket — far below 3 table scans
      assert(bytes.get() < totalBytes,
        s"mirror beat read ${bytes.get()} bytes >= source table size $totalBytes")
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(liveSet(LakeTable.forPath(spark, destRoot)) == liveSet(src))
  }

  test("mirror: expired diff base degrades to resync exactly once, state stays equal") {
    val src = freshTable()
    src.merge(batch((1 to 10).map(i =>
      (i.toLong, "I", s"r$i", "p", "c", "scala", s"v$i")): _*), 0)
    val destRoot = tmpDir("mirdst3") + "/dst"
    TableMirror.syncOnce(src, destRoot)
    src.merge(batch((21L, "D", "r3", "p", "c", "scala", null)), 1)
    src.merge(batch((22L, "U", "r4", "p", "c", "scala", "v4b")), 2)
    src.expireSnapshots(keepLast = 1) // the mirror's watermark snapshot is gone
    val r = TableMirror.syncOnce(src, destRoot)
    assert(r.mode == "resync", s"got $r")
    val dest = LakeTable.forPath(spark, destRoot)
    assert(liveSet(dest) == liveSet(src))
    // the vacuumed delete propagated via replace (key absent)
    assert(dest.currentState().filter($"repo" === "r3").isEmpty)
    assert(TableMirror.syncOnce(src, destRoot).mode == "noop")
  }

  test("mirror: source schema evolution is mirrored by name before the beat") {
    val src = freshTable()
    src.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    val destRoot = tmpDir("mirdst4") + "/dst"
    TableMirror.syncOnce(src, destRoot)
    src.evolveSchema(Seq(AddColumn("stars", LongType)))
    val rows = Seq((2L, "U", "r1", "p", "c", "scala", "v1b", 7L))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content", "stars")
    src.merge(rows, 1)
    val r = TableMirror.syncOnce(src, destRoot)
    assert(r.mode == "incremental")
    val dest = LakeTable.forPath(spark, destRoot)
    assert(dest.schema.fieldNames.contains("stars"))
    assert(dest.currentState().select("stars").head().getLong(0) == 7L)
    assert(liveSet(dest) == liveSet(src))
  }

  test("mirror: a source column rename replays as a rename — data intact") {
    val src = freshTable()
    src.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    val destRoot = tmpDir("mirren") + "/dst"
    TableMirror.syncOnce(src, destRoot)
    // metadata-only rename on the source: no file changes, so nothing
    // incremental ever rewrites the untouched key — a drop+add alignment
    // would null the column on the destination forever
    src.evolveSchema(Seq(RenameColumn("lang", "language")))
    val r = TableMirror.syncOnce(src, destRoot)
    val dest = LakeTable.forPath(spark, destRoot)
    assert(dest.schema.fieldNames.contains("language") &&
      !dest.schema.fieldNames.contains("lang"))
    assert(dest.currentState().select("language").head().getString(0) == "scala",
      "rename must preserve existing destination values")
    // a KEY column rename must not wedge the mirror either (drop+add would
    // throw 'cannot drop key column')
    src.evolveSchema(Seq(RenameColumn("repo", "repository")))
    src.merge(Seq((2L, "U", "r1", "p", "c", "scala", "v2"))
      .toDF("lsn", "op", "repository", "path", "commit", "language", "content"), 1)
    TableMirror.syncOnce(src, destRoot)
    val dest2 = LakeTable.forPath(spark, destRoot)
    assert(dest2.meta.keyCols == Seq("repository", "path", "commit"))
    assert(liveSet(dest2) == liveSet(src))
  }

  test("mirror refuses to clobber an unrelated table at the destination") {
    val src = freshTable()
    src.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    val other = freshTable() // unrelated table with its own tableId
    val e = intercept[IllegalArgumentException] {
      TableMirror.syncOnce(src, other.root)
    }
    assert(e.getMessage.contains("not a mirror"))
  }

  // ------------------------------------------------------------ tags

  test("tags pin retention, resolve in time travel, and unpin on drop") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    val pinned = t.meta.currentSnapshotId
    val pinnedState = liveSet(t)
    t.createTag("audit-q3")
    t.merge(batch((2L, "U", "r1", "p", "c", "scala", "v2")), 1)
    t.merge(batch((3L, "U", "r1", "p", "c", "scala", "v3")), 2)

    // expiry keeps the tagged snapshot (and its files) alive
    t.expireSnapshots(keepLast = 1)
    assert(t.meta.snapshotById(pinned).isDefined, "tagged snapshot expired")
    assert(t.currentState(Some(t.resolveRef("audit-q3"))).collect()
      .map(_.toSeq).toSet == pinnedState)
    // numeric refs still resolve as ids; unknown tags fail loudly
    assert(t.resolveRef(pinned.toString) == pinned)
    assert(intercept[RuntimeException](t.resolveRef("nope"))
      .getMessage.contains("no tag"))
    // re-pointing needs replace=true
    intercept[IllegalArgumentException](t.createTag("audit-q3"))
    t.createTag("audit-q3", replace = true)
    assert(t.meta.tags("audit-q3") == t.meta.currentSnapshotId)

    t.dropTag("audit-q3")
    t.expireSnapshots(keepLast = 1)
    assert(t.meta.snapshotById(pinned).isEmpty, "untagged snapshot must expire")
  }

  test("TIMESTAMP AS OF reaches a tag-pinned snapshot below a retention gap") {
    val wh = tmpDir("gapwh")
    spark.conf.set("spark.sql.catalog.gapcat", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gapcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gapcat.ns")
    spark.sql("CREATE TABLE gapcat.ns.t (k STRING, v INT) " +
      "TBLPROPERTIES ('keys'='k', 'buckets'='2')")
    spark.sql("INSERT INTO gapcat.ns.t VALUES ('a', 1)")
    val t = LakeTable.forPath(spark, s"$wh/ns/t")
    t.createTag("era1")
    spark.sql("INSERT INTO gapcat.ns.t VALUES ('a', 2)")
    spark.sql("INSERT INTO gapcat.ns.t VALUES ('a', 3)")
    // retention gap: keep head + the tagged snapshot; the middle expires,
    // so main's parent-chain walk now STOPS above the tag
    t.expireSnapshots(keepLast = 1)
    val taggedWall = t.meta.snapshotById(t.resolveRef("era1")).get.wallClockMs
    assume(t.meta.snapshots.size == 2, "expected exactly head + tagged")
    val iso = java.time.Instant.ofEpochMilli(taggedWall)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    // a timestamp inside the tagged era must resolve the PINNED snapshot —
    // a mainAncestry restriction would strand it (walk truncates at the gap)
    val v = spark.sql(s"SELECT v FROM gapcat.ns.t TIMESTAMP AS OF '$iso'")
      .head().getInt(0)
    assert(v == 1, s"timestamp travel below the retention gap returned v=$v")
    // and the head still resolves for a late timestamp
    assert(spark.sql(
      "SELECT v FROM gapcat.ns.t TIMESTAMP AS OF '2500-01-01 00:00:00'")
      .head().getInt(0) == 3)
  }

  test("SQL surface: VERSION AS OF 'tag', create_tag/drop_tag procedures, properties") {
    val wh = tmpDir("tagwh")
    spark.conf.set("spark.sql.catalog.tagcat", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tagcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tagcat.ns")
    spark.sql("CREATE TABLE tagcat.ns.t (k STRING, v INT) " +
      "TBLPROPERTIES ('keys'='k', 'buckets'='2')")
    spark.sql("INSERT INTO tagcat.ns.t VALUES ('a', 1)")
    val tagged = spark.sql(
      "CALL tagcat.system.create_tag(table => 'ns.t', tag => 'v1')")
      .head().getLong(0)
    spark.sql("INSERT INTO tagcat.ns.t VALUES ('a', 2)")
    assert(spark.sql("SELECT v FROM tagcat.ns.t VERSION AS OF 'v1'")
      .head().getInt(0) == 1)
    assert(spark.sql("SELECT v FROM tagcat.ns.t").head().getInt(0) == 2)
    val props = spark.sql("SHOW TBLPROPERTIES tagcat.ns.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("tags") == s"v1=$tagged")
    assert(spark.sql("CALL tagcat.system.drop_tag(table => 'ns.t', tag => 'v1')")
      .head().getBoolean(0))
    intercept[Exception](
      spark.sql("SELECT v FROM tagcat.ns.t VERSION AS OF 'v1'").collect())

    // free-form properties: SET / UNSET TBLPROPERTIES round-trip; engine
    // facts are read-only
    spark.sql("ALTER TABLE tagcat.ns.t SET TBLPROPERTIES ('team'='data-eng')")
    def prop(k: String): Option[String] =
      spark.sql("SHOW TBLPROPERTIES tagcat.ns.t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap.get(k)
    assert(prop("team").contains("data-eng"))
    spark.sql("ALTER TABLE tagcat.ns.t UNSET TBLPROPERTIES ('team')")
    assert(prop("team").isEmpty)
    val err = intercept[Exception](spark.sql(
      "ALTER TABLE tagcat.ns.t SET TBLPROPERTIES ('buckets'='64')"))
    assert(err.getMessage.contains("engine-managed"))
    // ALTER is atomic: a statement mixing a valid property with a reserved
    // one must apply NEITHER (validation precedes application)
    intercept[Exception](spark.sql(
      "ALTER TABLE tagcat.ns.t SET TBLPROPERTIES ('ok'='1', 'keys'='x')"))
    assert(prop("ok").isEmpty,
      "failed ALTER left a partial property commit behind")
  }

  test("CTAS / RTAS and the mirror procedure through pure SQL") {
    val wh = tmpDir("ctaswh")
    spark.conf.set("spark.sql.catalog.mcat", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcat.ns")

    // CTAS: table born from a query, keyed via TBLPROPERTIES
    spark.sql("CREATE TABLE mcat.ns.src TBLPROPERTIES ('keys'='k','buckets'='2') " +
      "AS SELECT * FROM VALUES ('a', 1), ('b', 2) AS v(k, n)")
    assert(spark.sql("SELECT sum(n) FROM mcat.ns.src").head().getLong(0) == 3)

    // RTAS: full replace of schema + content
    spark.sql("REPLACE TABLE mcat.ns.src TBLPROPERTIES ('keys'='k','buckets'='2') " +
      "AS SELECT * FROM VALUES ('z', 9L) AS v(k, n)")
    assert(spark.sql("SELECT k, n FROM mcat.ns.src").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("z", 9L)))

    // mirror procedure: bootstrap beat creates + fills the DR copy,
    // incremental beat ships the delta, noop when drained
    val boot = spark.sql(
      "CALL mcat.system.mirror(source => 'ns.src', dest => 'ns.src_dr')").head()
    assert(boot.getString(0) == "bootstrap" && boot.getLong(3) == 1L)
    spark.sql("INSERT INTO mcat.ns.src VALUES ('y', 8L)")
    val inc = spark.sql(
      "CALL mcat.system.mirror(source => 'ns.src', dest => 'ns.src_dr')").head()
    assert(inc.getString(0) == "incremental")
    assert(spark.sql("SELECT k FROM mcat.ns.src_dr ORDER BY k").collect()
      .map(_.getString(0)).toSeq == Seq("y", "z"))
    assert(spark.sql(
      "CALL mcat.system.mirror(source => 'ns.src', dest => 'ns.src_dr')")
      .head().getString(0) == "noop")
  }
}
