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
    t.publishBranch("staged")
    assert(spark.sql("SELECT v FROM wcat.ns.t").head().getInt(0) == 2)
  }
}
