package graft.lake

import graft.SparkTestBase
import graft.cdc._
import org.apache.spark.sql.functions._

/** Merge-on-read delta commits (`merge(delta = true)`): write cost ∝ batch
  * instead of ∝ touched buckets, with state semantics IDENTICAL to
  * copy-on-write — the anti-stale probe filters losers before the write, a
  * layered read LWW-resolves across files, the change feed stays exact, and
  * `foldDeltas` collapses layers back to base files without changing state.
  * vacuum/compact refuse delta files (a delta tombstone masks older rows in
  * OTHER files). */
class MorSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(name: String, buckets: Int = 4): LakeTable =
    LakeTable.createOrReplace(spark, tmpDir(name), CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = buckets)

  private def batch(rows: (Long, String, String, String, String, String, String)*) =
    rows.toDF("lsn", "op", "repo", "path", "commit", "lang", "content")

  private def stateSet(t: LakeTable) =
    t.currentState().collect().map(_.toSeq).toSet

  // three batches exercising insert, update, delete, redelivery and a
  // stale (lower-lsn) redelivered update that must lose to stored state
  private val b1 = batch((1 to 20).map(i =>
    (i.toLong, "I", s"r${i % 5}", s"p$i", s"c$i", "scala", s"v$i")): _*)
  private val b2 = batch(
    (21L, "U", "r1", "p1", "c1", "scala", "v1-new"),
    (22L, "D", "r2", "p2", "c2", "scala", null),
    (23L, "I", "r9", "p99", "c99", "py", "fresh"),
    (5L, "I", "r0", "p5", "c5", "scala", "v5")) // exact redelivery (same lsn)
  private val b3 = batch(
    (10L, "U", "r1", "p1", "c1", "scala", "stale-must-lose"), // < lsn 21
    (24L, "U", "r9", "p99", "c99", "py", "fresh-2"))

  test("delta merges reach the exact COW state, batch by batch, and never rewrite base files") {
    val cow = freshTable("mor-cow")
    val mor = freshTable("mor-del")
    cow.merge(b1, 0)
    mor.merge(b1, 0) // first batch COW: the base layer
    val baseFiles = mor.meta.currentSnapshot.get.files.map(_.path).toSet
    var epoch = 1L
    Seq(b2, b3).foreach { b =>
      cow.merge(b, epoch)
      mor.merge(b, epoch, delta = true)
      epoch += 1
      assert(stateSet(mor) == stateSet(cow), s"state diverged after epoch $epoch")
    }
    // layering, not rewriting: every base file of the first commit is still live
    val m = mor.meta
    val live = m.currentSnapshot.get.files
    assert(baseFiles.subsetOf(live.map(_.path).toSet),
      "a delta commit rewrote a base file")
    assert(live.exists(_.isDelta) && m.currentSnapshot.get.operation == "delta-merge")
    // delta rows ∝ batch: b2 applied 4 events (one a pure redelivery that the
    // anti-stale probe drops) and b3 applied 2 (one stale) — layers are small
    val deltaRows = live.filter(_.isDelta).map(_.rowCount).sum
    assert(deltaRows <= 4, s"delta layers carry $deltaRows rows; expected the few true winners")
    // the COW table rewrote whole touched buckets instead
    assert(stateSet(mor) == stateSet(cow))

    // exactly-once: replaying a committed epoch through the delta path no-ops
    assert(mor.merge(b2, 1L, delta = true).isEmpty)
    assert(stateSet(mor) == stateSet(cow))
  }

  test("anti-stale probe: a batch of pure losers commits the epoch but layers no rows") {
    val t = freshTable("mor-stale")
    t.merge(b1, 0)
    t.merge(b2, 1, delta = true)
    val filesBefore = t.meta.currentSnapshot.get.files.map(_.path).toSet
    val pre = stateSet(t)
    // both rows lose: lsn 10 < stored 21 for (r1,p1,c1); lsn 3 < stored 3? equal-lsn
    // redelivery of an original insert also must not layer a row
    t.merge(batch(
      (10L, "U", "r1", "p1", "c1", "scala", "stale"),
      (3L, "I", "r3", "p3", "c3", "scala", "v3")), 2, delta = true)
    assert(stateSet(t) == pre)
    val snap = t.meta.currentSnapshot.get
    assert(snap.operation == "delta-merge" && snap.epochId == 2)
    assert(snap.files.map(_.path).toSet == filesBefore,
      "a no-winner delta batch must add no files (epoch records in metadata only)")
    // the epoch is still exactly-once
    assert(t.merge(b3, 2, delta = true).isEmpty)
  }

  test("changes() is exact across delta commits: updates are updates, not inserts") {
    val cow = freshTable("mor-feed-cow")
    val mor = freshTable("mor-feed-del")
    cow.merge(b1, 0); mor.merge(b1, 0)
    val fromCow = cow.meta.currentSnapshotId
    val fromMor = mor.meta.currentSnapshotId
    cow.merge(b2, 1); mor.merge(b2, 1, delta = true)
    cow.merge(b3, 2); mor.merge(b3, 2, delta = true)
    def feed(t: LakeTable, from: Long) =
      t.changes(from).collect()
        .map(r => (r.getAs[String]("repo"), r.getAs[String]("path"),
          r.getAs[String]("commit"), r.getAs[String]("content"),
          r.getAs[String]("_change_type"), r.getAs[Long](LakeTable.LsnCol))).toSet
    val c = feed(cow, fromCow)
    val d = feed(mor, fromMor)
    assert(d == c, s"delta feed diverged:\n cow=$c\n mor=$d")
    // and the classified types are the logical ones
    assert(d.exists(_._5 == "update") && d.exists(_._5 == "delete") &&
      d.exists(_._5 == "insert"))
  }

  test("foldDeltas collapses layers: state, time travel and ledger unchanged; vacuum order") {
    val t = freshTable("mor-fold")
    t.merge(b1, 0)
    t.merge(b2, 1, delta = true)
    t.merge(b3, 2, delta = true)
    val pre = stateSet(t)
    val preSnap = t.meta.currentSnapshotId

    // vacuum BEFORE fold: the delta tombstone (r2,p2,c2 @lsn 22) must be
    // skipped — dropping it would resurrect the base row
    assert(t.vacuum() == 0L, "vacuum must refuse delta tombstones")
    assert(stateSet(t) == pre)

    val folded = t.foldDeltas()
    assert(folded > 0)
    val after = t.meta.currentSnapshot.get
    assert(after.operation == "fold")
    assert(!after.files.exists(_.isDelta), "fold must retire every delta file")
    assert(stateSet(t) == pre, "fold changed logical state")
    assert(t.currentState(Some(preSnap)).collect().map(_.toSeq).toSet == pre,
      "time travel to the layered form broke")
    assert(t.changes(preSnap).isEmpty, "fold is layout-only: empty feed")
    assert(t.foldDeltas() == 0, "second fold finds nothing")
    // folded buckets resolve to one row per key: tombstone kept for vacuum
    val removed = t.vacuum()
    assert(removed == 1L, s"post-fold vacuum should retire the one tombstone, got $removed")
    assert(stateSet(t) == pre)
    // ledger intact across fold + vacuum
    assert(t.merge(b2, 1, delta = true).isEmpty)
  }

  test("a layered-bucket read survives stat pruning: stale base values never resurface") {
    val t = freshTable("mor-prune", buckets = 2)
    t.merge(batch((1L, "I", "rA", "pA", "cA", "scala", "old")), 0)
    t.merge(batch((2L, "U", "rA", "pA", "cA", "scala", "new")), 1, delta = true)
    // compact must refuse the delta layer (repacking it raw would merge
    // layers without the isDelta marker)
    assert(t.compact(targetFileBytes = 1L << 30, minFiles = 1) == 0)
    val rows = t.currentState().select("content").as[String].collect().toSeq
    assert(rows == Seq("new"))
  }

  test("rollup views take the exact incremental step across delta commits (reads ∝ batch)") {
    val t = freshTable("mor-views", buckets = 32)
    val vm = new ViewMaintainer(t, tmpDir("mor-vm"), Seq(
      RollupView("langs", Seq("lang"))))
    def got() = vm.table("langs").currentState().collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n"))).toMap
    def want() = t.currentState().groupBy("lang").count().collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("count"))).toMap
    t.merge(b1, 0)
    vm.refreshAll(0L)
    val totalFiles = t.meta.currentSnapshot.get.files.size
    t.merge(b2, 1, delta = true) // +1 py insert, -1 scala delete, 1 scala update
    // delta commits take the EXACT incremental step: the delta files plus the
    // touched buckets' parent files once — never a full recompute
    val scanned = vm.refreshAll(1L)("langs")
    assert(scanned < totalFiles,
      s"delta refresh read $scanned files, table holds $totalFiles — full recompute?")
    assert(got() == want(), s"view diverged from recompute: ${got()} vs ${want()}")
    // a 1-key delta update that MOVES the row between groups (scala → go):
    // retraction lands in the old group, addition in the new, reading only
    // the one touched bucket's delta file + its parent files
    t.merge(batch((40L, "U", "r1", "p1", "c1", "go", "moved")), 2, delta = true)
    val scanned2 = vm.refreshAll(2L)("langs")
    assert(scanned2 <= 3, s"1-key delta refresh read $scanned2 files")
    assert(got() == want() && got()("go") == 1L,
      s"cross-group delta move diverged: ${got()} vs ${want()}")
  }
}
