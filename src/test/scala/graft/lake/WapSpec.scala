package graft.lake

import graft.SparkTestBase
import graft.cdc._

/** Write-audit-publish branches: stage merges on a named branch out of
  * main's sight, audit the branch head, publish = one metadata flip. */
class WapSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(): LakeTable =
    LakeTable.createOrReplace(spark, tmpDir("wap"), CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)

  private def batch(rows: (Long, String, String, String, String, String, String)*) =
    rows.toDF("lsn", "op", "repo", "path", "commit", "lang", "content")

  private def liveKeys(t: LakeTable, snap: Option[Long] = None) =
    t.currentState(snap).select("repo").collect().map(_.getString(0)).toSet

  test("stage on a branch, audit, publish: main is untouched until the metadata flip") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1"),
      (2L, "I", "r2", "p", "c", "scala", "v2")), 0)
    val mainBefore = t.meta.currentSnapshotId

    t.createBranch("audit")
    t.merge(batch(
      (11L, "U", "r1", "p", "c", "scala", "v1b"),
      (12L, "D", "r2", "p", "c", "scala", null),
      (13L, "I", "r3", "p", "c", "go", "v3")), 1, branch = Some("audit"))

    // main unchanged; branch head visible through the ref
    assert(t.meta.currentSnapshotId == mainBefore)
    assert(liveKeys(t) == Set("r1", "r2"))
    val head = t.resolveRef("audit")
    assert(liveKeys(t, Some(head)) == Set("r1", "r3"))
    // audit step: the staged state satisfies invariants (e.g. a constraint
    // probe or reconciliation would run here); then publish
    val published = t.publishBranch("audit")
    assert(published == head)
    assert(t.meta.currentSnapshotId == head && t.meta.branches.isEmpty)
    assert(liveKeys(t) == Set("r1", "r3"))
    // lineage: published snapshot's parent is the branch base
    assert(t.meta.currentSnapshot.get.parentId == mainBefore)
    // branch epochs joined the ledger before the flip — replays no-op
    assert(t.merge(batch((99L, "I", "rX", "p", "c", "scala", "x")), 1).isEmpty)
  }

  test("multi-commit branch publishes as one flip; drop discards staged state") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    t.createBranch("wap")
    t.merge(batch((11L, "I", "r2", "p", "c", "scala", "v2")), 1, branch = Some("wap"))
    t.merge(batch((12L, "I", "r3", "p", "c", "scala", "v3")), 2, branch = Some("wap"))
    assert(liveKeys(t) == Set("r1"))
    t.publishBranch("wap")
    assert(liveKeys(t) == Set("r1", "r2", "r3"))

    t.createBranch("bad")
    t.merge(batch((21L, "I", "r9", "p", "c", "scala", "oops")), 3, branch = Some("bad"))
    assert(t.dropBranch("bad") && !t.dropBranch("bad"))
    assert(liveKeys(t) == Set("r1", "r2", "r3"))
    intercept[RuntimeException](t.merge(batch((22L, "I", "rZ", "p", "c", "scala", "z")),
      4, branch = Some("bad")))
  }

  test("publish refuses when main advanced past the fork; branch heads survive retention") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    t.createBranch("slow")
    t.merge(batch((11L, "I", "r2", "p", "c", "scala", "v2")), 1, branch = Some("slow"))
    // main moves on — the audit never saw this commit
    t.merge(batch((21L, "I", "r3", "p", "c", "scala", "v3")), 2)
    val e = intercept[IllegalArgumentException](t.publishBranch("slow"))
    assert(e.getMessage.contains("main advanced"))

    // retention pins the open branch head AND main's current even when the
    // branch holds the newest snapshot ids
    t.expireSnapshots(keepLast = 1)
    val m = t.meta
    assert(m.snapshotById(m.currentSnapshotId).isDefined, "current expired")
    assert(m.snapshotById(m.branches("slow")).isDefined, "branch head expired")
    assert(liveKeys(t, Some(t.resolveRef("slow"))) == Set("r1", "r2"))
    t.dropBranch("slow")
  }

  test("snapshot ids stay unique across main and branch commits") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    t.createBranch("b")
    t.merge(batch((11L, "I", "r2", "p", "c", "scala", "v2")), 1, branch = Some("b"))
    t.merge(batch((21L, "I", "r3", "p", "c", "scala", "v3")), 2) // main
    val ids = t.meta.snapshots.map(_.snapshotId)
    assert(ids.distinct.size == ids.size, s"duplicate snapshot ids: $ids")
    // both lines of history read correctly
    assert(liveKeys(t) == Set("r1", "r3"))
    assert(liveKeys(t, Some(t.resolveRef("b"))) == Set("r1", "r2"))
  }

  test("dropBranch retracts staged snapshots: epochs re-stageable, files reclaimed") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    val mainFiles = t.meta.currentSnapshot.get.files.map(_.path).toSet

    t.createBranch("audit")
    t.merge(batch((11L, "I", "r2", "p", "c", "scala", "v2")), 1, branch = Some("audit"))
    t.merge(batch((12L, "I", "r3", "p", "c", "scala", "v3")), 2, branch = Some("audit"))
    val staged = t.meta
    val branchSnapIds = {
      val headId = staged.branches("audit")
      staged.ancestry(headId) -- staged.mainAncestry
    }
    assert(branchSnapIds.size == 2)
    val branchOnlyFiles = staged.snapshots
      .filter(s => branchSnapIds.contains(s.snapshotId))
      .flatMap(_.files.map(_.path)).toSet -- mainFiles
    assert(branchOnlyFiles.nonEmpty)

    // audit refuses → drop. The staged snapshots must be RETRACTED, not
    // merely unpinned: their epochs leave the ledger so re-staging applies.
    assert(t.dropBranch("audit"))
    val m = t.meta
    assert(branchSnapIds.forall(id => m.snapshotById(id).isEmpty),
      "dropped branch snapshots still in metadata")
    assert(!m.committedEpochs.contains(1L) && !m.committedEpochs.contains(2L))
    branchOnlyFiles.foreach { rel =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(t.root, rel)),
        s"branch-exclusive file $rel not reclaimed") }
    mainFiles.foreach { rel =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t.root, rel)),
        s"shared file $rel wrongly deleted") }

    // the re-stage flow publishBranch's refusal message prescribes
    t.createBranch("audit2")
    assert(t.merge(batch((11L, "I", "r2", "p", "c", "scala", "v2fixed")), 1,
      branch = Some("audit2")).nonEmpty, "retracted epoch no-opped on re-stage")
    t.publishBranch("audit2")
    assert(liveKeys(t) == Set("r1", "r2"))
    assert(t.currentState().filter($"repo" === "r2").select("content")
      .head().getString(0) == "v2fixed")
  }

  test("dropBranch keeps the lsn high-water above retracted staged lsns") {
    val t = freshTable()
    t.merge(batch((10L, "I", "r1", "p", "c", "scala", "v1")), 0)
    assert(t.nextLsn == 11L)
    t.createBranch("staged")
    t.merge(batch((42L, "I", "r2", "p", "c", "scala", "v2")), 1,
      branch = Some("staged"))
    t.dropBranch("staged")
    // the retracted epoch's events still carry lsns up to 42; the re-stage
    // flow replays them, so allocation (SQL DML) must never re-enter that
    // span — same key + same lsn + different payload breaks LWW
    assert(t.nextLsn == 43L,
      s"lsn allocation retreated into the retracted span: nextLsn=${t.nextLsn}")
  }

  test("dropBranch after publish is a no-op that deletes nothing") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    t.createBranch("audit")
    t.merge(batch((11L, "I", "r2", "p", "c", "scala", "v2")), 1,
      branch = Some("audit"))
    t.publishBranch("audit")
    val files = t.meta.currentSnapshot.get.files.map(_.path).toSet
    assert(!t.dropBranch("audit"), "published branch should already be gone")
    files.foreach { rel =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t.root, rel)),
        s"dropBranch after publish deleted live file $rel") }
    assert(liveKeys(t) == Set("r1", "r2"))
  }

  test("retention pins the whole open branch chain — publish works after expire") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    t.merge(batch((2L, "U", "r1", "p", "c", "scala", "v1b")), 1)
    t.createBranch("long")
    t.merge(batch((11L, "I", "r2", "p", "c", "scala", "v2")), 2, branch = Some("long"))
    t.merge(batch((12L, "I", "r3", "p", "c", "scala", "v3")), 3, branch = Some("long"))
    t.merge(batch((13L, "I", "r4", "p", "c", "scala", "v4")), 4, branch = Some("long"))

    // keepLast=1 keeps only the newest id (the branch head) — the
    // INTERMEDIATE branch snapshots must survive via chain pinning or
    // publishBranch's walk back to main's head is severed forever
    t.expireSnapshots(keepLast = 1)
    val head = t.publishBranch("long")
    assert(t.meta.currentSnapshotId == head)
    assert(liveKeys(t) == Set("r1", "r2", "r3", "r4"))
  }

  test("a tag cannot shadow a live branch (tags win ref resolution)") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    t.createBranch("wip")
    val e = intercept[IllegalArgumentException](t.createTag("wip"))
    assert(e.getMessage.contains("already a branch"))
    t.dropBranch("wip")
    t.createTag("wip") // free once the branch is gone
    assert(t.resolveRef("wip") == t.meta.currentSnapshotId)
  }

  test("maintained views fold ONLY main lineage; staged branch state applies on publish") {
    val t = freshTable()
    val vm = new ViewMaintainer(t, tmpDir("wapviews"), Seq(
      RollupView("langs", Seq("lang"))))
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "v1")), 0)
    vm.refreshAll()
    def viewRows() = vm.table("langs").currentState()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viewRows() == Map("scala" -> 1L))

    t.createBranch("staged")
    t.merge(batch((11L, "I", "r2", "p", "c", "go", "v2")), 1, branch = Some("staged"))
    // refresh while staged: the unpublished merge must NOT appear
    vm.refreshAll()
    assert(viewRows() == Map("scala" -> 1L))

    t.publishBranch("staged")
    vm.refreshAll()
    assert(viewRows() == Map("scala" -> 1L, "go" -> 1L))
  }

  test("SQL: VERSION AS OF 'branch' reads staged state for the audit") {
    val wh = tmpDir("wapwh")
    spark.conf.set("spark.sql.catalog.wcat", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wcat.ns")
    spark.sql("CREATE TABLE wcat.ns.t (k STRING, v INT) " +
      "TBLPROPERTIES ('keys'='k', 'buckets'='2')")
    spark.sql("INSERT INTO wcat.ns.t VALUES ('a', 1)")
    val t = LakeTable.forPath(spark, s"$wh/ns/t")
    t.createBranch("staged")
    t.merge(Seq((10L, "U", "a", 2)).toDF("lsn", "op", "k", "v"),
      10, branch = Some("staged"))
    assert(spark.sql("SELECT v FROM wcat.ns.t").head().getInt(0) == 1)
    assert(spark.sql("SELECT v FROM wcat.ns.t VERSION AS OF 'staged'")
      .head().getInt(0) == 2)
    // TIMESTAMP AS OF resolves over MAIN lineage only — the staged branch
    // commit is the newest by wall clock, but a plain SQL time-travel read
    // must not leak pre-audit state
    assert(spark.sql(
      "SELECT v FROM wcat.ns.t TIMESTAMP AS OF '2500-01-01 00:00:00'")
      .head().getInt(0) == 1)
    t.publishBranch("staged")
    assert(spark.sql("SELECT v FROM wcat.ns.t").head().getInt(0) == 2)
    assert(spark.sql(
      "SELECT v FROM wcat.ns.t TIMESTAMP AS OF '2500-01-01 00:00:00'")
      .head().getInt(0) == 2)
  }
}
