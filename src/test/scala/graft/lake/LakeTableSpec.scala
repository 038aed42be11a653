package graft.lake

import graft.SparkTestBase
import graft.cdc._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class LakeTableSpec extends SparkTestBase {
  import CdcPipeline.baseTableSchema

  private def freshTable(buckets: Int = 8): LakeTable =
    LakeTable.createOrReplace(spark, tmpDir("lake"), baseTableSchema,
      ChangeEvent.keyCols, numBuckets = buckets)

  private def logDf(cfg: GenConfig) =
    CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg))

  test("single merge of a full log reproduces the generator's ground truth") {
    val cfg = GenConfig(numEvents = 4000, numRepos = 12, pathsPerRepo = 4,
      commitsPerFile = 2, schemaBumps = Seq.empty)
    val t = freshTable()
    CdcPipeline.replayBatch(spark, logDf(cfg), t, evolution = Map.empty)
    val got = t.currentState().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getAs[String]("content")).toMap
    val exp = ChangeLogGen.expectedFinalState(cfg).map { case (k, e) => k -> e.content }
    assert(got == exp)
  }

  test("chunked merges (many epochs) == single merge, any chunking") {
    val cfg = GenConfig(numEvents = 4000, numRepos = 12, pathsPerRepo = 4,
      commitsPerFile = 2, schemaBumps = Seq.empty)
    val log = logDf(cfg).cache()
    val whole = freshTable()
    CdcPipeline.replayBatch(spark, log, whole, Map.empty)

    for (chunks <- Seq(3, 7)) {
      val t = freshTable()
      (0 until chunks).foreach { c =>
        val part = log.filter(pmod(col("lsn"), lit(chunks)) === c) // arbitrary, interleaved split
        t.merge(CdcPipeline.toMergeInput(Dedup.lwwDf(part, ChangeEvent.keyCols), t), epochId = c)
      }
      val a = whole.currentState().select("repo", "path", "commit", "content")
        .collect().map(_.toSeq).toSet
      val b = t.currentState().select("repo", "path", "commit", "content")
        .collect().map(_.toSeq).toSet
      assert(a == b, s"chunked($chunks) != whole")
    }
    log.unpersist()
  }

  test("epochId commit is exactly-once: re-merging the same epoch is a no-op") {
    val cfg = GenConfig(numEvents = 500, numRepos = 5, pathsPerRepo = 3,
      commitsPerFile = 2, schemaBumps = Seq.empty)
    val t = freshTable()
    val in = CdcPipeline.toMergeInput(Dedup.lwwDf(logDf(cfg), ChangeEvent.keyCols), t)
    assert(t.merge(in, epochId = 7).isDefined)
    val snapAfter = t.meta.currentSnapshotId
    assert(t.merge(in, epochId = 7).isEmpty) // replayed epoch skipped
    assert(t.meta.currentSnapshotId == snapAfter)
  }

  test("merge is idempotent: re-applying the same batch with a new epoch changes nothing") {
    val cfg = GenConfig(numEvents = 800, numRepos = 6, pathsPerRepo = 3,
      commitsPerFile = 2, schemaBumps = Seq.empty)
    val t = freshTable()
    val in = CdcPipeline.toMergeInput(Dedup.lwwDf(logDf(cfg), ChangeEvent.keyCols), t)
    t.merge(in, epochId = 0)
    val beforeSet = t.read().collect().map(_.toSeq).toSet
    t.merge(in, epochId = 1)
    val afterSet = t.read().collect().map(_.toSeq).toSet
    assert(beforeSet == afterSet)
  }

  test("deletes keep tombstones; currentState hides them") {
    val t = freshTable()
    import spark.implicits._
    val rows = Seq(
      (1L, "I", "r1", "p1", "c1", "scala", "v1"),
      (2L, "U", "r1", "p1", "c1", "scala", "v2"),
      (3L, "D", "r1", "p1", "c1", "scala", null),
      (4L, "I", "r2", "p2", "c2", "py", "keep")
    ).toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(rows, 0)
    assert(t.read().count() == 2) // tombstone retained
    val alive = t.currentState().collect()
    assert(alive.length == 1 && alive(0).getAs[String]("repo") == "r2")
  }

  test("vacuum physically drops tombstones behind the lsn watermark") {
    val t = freshTable()
    import spark.implicits._
    val rows = Seq(
      (1L, "I", "r1", "p1", "c1", "scala", "v1"),
      (2L, "D", "r1", "p1", "c1", "scala", null),
      (9L, "D", "r2", "p2", "c2", "py", null)
    ).toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(rows, 0)
    assert(t.read().count() == 2) // two tombstones
    assert(t.vacuum(upToLsn = 5L) == 1L) // only the lsn<=5 tombstone goes
    assert(t.read().count() == 1)
    assert(t.vacuum() == 1L)
    assert(t.read().count() == 0)
    // tombstone protection: after vacuum an older stale update must NOT
    // resurrect unless it predates the vacuum watermark (caller contract)
    assert(t.currentState().count() == 0)
  }

  test("out-of-order cross-epoch delete: stale update cannot resurrect a deleted key") {
    val t = freshTable()
    import spark.implicits._
    val epoch0 = Seq((10L, "D", "r", "p", "c", "scala", Option.empty[String]))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    val epoch1 = Seq((5L, "U", "r", "p", "c", "scala", Some("stale")))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(epoch0, 0)
    t.merge(epoch1, 1) // older lsn arrives later — tombstone must win
    assert(t.currentState().count() == 0)
  }

  test("time travel: each snapshot remains readable") {
    val t = freshTable()
    import spark.implicits._
    def batch(lsn: Long, content: String) = Seq(
      (lsn, "U", "r", "p", "c", "scala", content))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(batch(1, "one"), 0)
    val s1 = t.meta.currentSnapshotId
    t.merge(batch(2, "two"), 1)
    assert(t.currentState(Some(s1)).head().getAs[String]("content") == "one")
    assert(t.currentState().head().getAs[String]("content") == "two")
  }

  test("only touched buckets are rewritten (manifest-level pruning)") {
    val t = freshTable(buckets = 16)
    import spark.implicits._
    val big = (1 to 200).map(i => (i.toLong, "I", s"r$i", s"p$i", s"c$i", "scala", s"v$i"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(big, 0)
    val filesBefore = t.meta.currentSnapshot.get.files
    // one-key batch touches exactly one bucket
    val one = Seq((1000L, "U", "r1", "p1", "c1", "scala", "new"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(one, 1)
    val filesAfter = t.meta.currentSnapshot.get.files
    val changed = filesAfter.map(_.path).toSet -- filesBefore.map(_.path).toSet
    val changedBuckets = filesAfter.filter(f => changed.contains(f.path)).map(_.bucket).toSet
    assert(changedBuckets.size == 1, s"expected 1 rewritten bucket, got $changedBuckets")
    // untouched buckets' files are byte-identical (reused, not rewritten)
    val keptCount = filesAfter.map(_.path).toSet.intersect(filesBefore.map(_.path).toSet).size
    assert(keptCount == filesBefore.size - changedBuckets.size ||
      keptCount >= filesBefore.size - 2)
  }

  test("schema evolution: add, widen, rename; old files stay readable via column IDs") {
    val t = freshTable()
    import spark.implicits._
    val v1 = Seq((1L, "I", "r", "p", "c1", "scala", "body1"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(v1, 0)

    t.evolveSchema(Seq(AddColumn("branch", StringType)))
    t.evolveSchema(Seq(AddColumn("size_bytes", IntegerType)))
    val v3 = Seq((2L, "I", "r", "p", "c2", "scala", "body2", "main", 42))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content", "branch", "size_bytes")
    t.merge(CdcPipeline.toMergeInput(v3, t), 1)

    t.evolveSchema(Seq(WidenType("size_bytes", LongType)))
    t.evolveSchema(Seq(RenameColumn("branch", "ref")))
    val cur = t.currentState().orderBy("commit").collect()
    assert(cur.length == 2)
    assert(cur(0).getAs[String]("ref") == null) // v1 row: added col null
    assert(cur(1).getAs[String]("ref") == "main") // renamed keeps data by column ID
    assert(cur(1).getAs[Long]("size_bytes") == 42L) // widened int -> long
    assert(t.schema.fieldNames.toSeq ==
      Seq("repo", "path", "commit", "lang", "content", "ref", "size_bytes"))
  }

  test("append sink adds rows without key reconciliation (reference S5)") {
    val t = freshTable()
    import spark.implicits._
    val rows = Seq((1L, "I", "r", "p", "c", "scala", "v1"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(rows, 0)
    // append the SAME key again — no dedup, both rows visible
    t.append(Seq(("r", "p", "c", "scala", "v2", 2L))
      .toDF("repo", "path", "commit", "lang", "content", "lsn"))
    assert(t.currentState().count() == 2)
  }

  test("expireSnapshots prunes history and deletes unreferenced files") {
    val t = freshTable()
    import spark.implicits._
    def batch(lsn: Long, content: String) = Seq(
      (lsn, "U", "r", "p", "c", "scala", content))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(batch(1, "one"), 0)
    t.merge(batch(2, "two"), 1)
    t.merge(batch(3, "three"), 2)
    val before = LakeTable.listParquet(
      java.nio.file.Paths.get(t.root, "data")).size
    val removed = t.expireSnapshots(keepLast = 1)
    assert(removed > 0)
    val after = LakeTable.listParquet(
      java.nio.file.Paths.get(t.root, "data")).size
    assert(after == before - removed)
    assert(t.meta.snapshots.size == 1)
    // current state untouched
    assert(t.currentState().head().getAs[String]("content") == "three")
    // expired snapshot no longer time-travelable
    intercept[Exception](t.read(Some(1L)).count())
  }

  test("null-key rows are rejected at commit on every new-data write path") {
    // the SQL schema declares keys non-nullable (Catalyst folds
    // `key IS NULL` to false; COUNT(key) answers from the manifest) — a
    // null-key row landing would be silently unreachable and miscounted.
    // Enforcement rides the footer-stats pass (parquet null counts), and
    // the failed staging is cleaned up.
    val t = freshTable()
    import spark.implicits._
    val bad = Seq((1L, "I", Option.empty[String], "p", "c", "scala", "x"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    val good = Seq((2L, "I", Option("r1"), "p", "c", "scala", "y"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    val e = intercept[Exception](t.merge(bad, 0))
    assert(e.getMessage.contains("key column"), e.getMessage)
    intercept[Exception](t.append(bad.drop("op")))
    intercept[Exception](t.replace(bad.drop("op"), 1))
    // nothing committed, no staging left behind
    assert(t.meta.snapshots.isEmpty || t.currentState().count() == 0)
    assert(t.cleanOrphanedStaging(olderThanMs = 0L) == 0,
      "rejected write left staging files behind")
    // a clean batch still lands
    t.merge(good, 2)
    assert(t.currentState().count() == 1)
  }

  test("expireSnapshots(olderThanMs) is wall-clock retention on top of keepLast") {
    val t = freshTable()
    import spark.implicits._
    def batch(lsn: Long, content: String) = Seq(
      (lsn, "U", "r", "p", "c", "scala", content))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(batch(1, "one"), 0)
    t.merge(batch(2, "two"), 1)
    t.merge(batch(3, "three"), 2)
    // cutoff before every commit → nothing is old enough, nothing expires
    val oldest = t.meta.snapshots.map(_.wallClockMs).min
    assert(t.expireSnapshots(keepLast = 1, olderThanMs = Some(oldest - 1)) == 0L)
    assert(t.meta.snapshots.size == 3)
    // cutoff strictly above snapshot 1's commit but at snapshot 2's: only
    // snapshot 1 is old enough; snapshot 2 survives even though keepLast=1
    val wall = t.meta.snapshots.sortBy(_.snapshotId).map(_.wallClockMs)
    assume(wall(0) < wall(1), "same-ms commits — cutoff would be ambiguous")
    assert(t.expireSnapshots(keepLast = 1, olderThanMs = Some(wall(1))) > 0L)
    assert(t.meta.snapshots.map(_.snapshotId).sorted == Seq(2L, 3L))
    // no cutoff → plain keepLast retention clears the rest
    t.expireSnapshots(keepLast = 1)
    assert(t.meta.snapshots.size == 1)
    assert(t.currentState().head().getAs[String]("content") == "three")
  }

  test("crashed staging dirs are orphaned, ignored by replay, and reaped with an age guard") {
    import java.nio.file.{Files, Paths}
    val t = freshTable()
    import spark.implicits._
    val in = Seq((1L, "I", "r", "p", "c", "scala", "v1"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    // simulate a crash after staging was partially written but before commit:
    // staging dirs are per-attempt unique, so the dead attempt's dir can never
    // collide with (or be clobbered by) the recovery attempt — the pre-r3
    // deterministic-path overwrite let a losing racer delete a winner's files
    val dead = Paths.get(t.root,
      f"data/snap-${t.meta.currentSnapshotId + 1}%012d-deadbeef")
    Files.createDirectories(dead)
    Files.writeString(dead.resolve("part-garbage.parquet"), "junk")
    assert(t.merge(in, epochId = 0).isDefined)
    assert(t.currentState().count() == 1)
    // the orphan is untouched by the commit (unreferenced, harmless) ...
    assert(Files.exists(dead))
    // ... kept by the reaper while younger than the age guard (it could be a
    // concurrent in-flight writer's staging) ...
    assert(t.cleanOrphanedStaging(olderThanMs = 3600000L) == 0)
    // ... and reaped once old enough; committed data dirs are never touched
    assert(t.cleanOrphanedStaging(olderThanMs = -1L) == 1)
    assert(!Files.exists(dead))
    assert(t.currentState().count() == 1)
  }

  test("snapshot expiry preserves the epoch ledger (exactly-once survives retention)") {
    val t = freshTable()
    import spark.implicits._
    def batch(lsn: Long, content: String) = Seq(
      (lsn, "U", "r", "p", "c", "scala", content))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(batch(1, "one"), 0)
    t.merge(batch(2, "two"), 1)
    t.merge(batch(3, "three"), 2)
    t.expireSnapshots(keepLast = 1)
    // epochs 0 and 1 only exist in expired snapshots — they must STILL be
    // treated as committed, or a checkpoint replay re-applies them. They
    // retire as compacted SPANS (O(gaps) metadata, not O(lifetime)), so the
    // contiguous 0..1 collapse into one span and the flat list stays empty
    assert(Seq(0L, 1L, 2L).forall(t.meta.epochCommitted))
    assert(t.meta.committedEpochCount == 3)
    assert(t.meta.retiredEpochs.isEmpty && t.meta.retiredEpochSpans.size == 1)
    assert(t.merge(batch(1, "one"), epochId = 0).isEmpty)
    assert(t.currentState().head().getAs[String]("content") == "three")
  }

  test("renaming a key column propagates into keyCols in the same commit") {
    val t = freshTable()
    import spark.implicits._
    val v1 = Seq((1L, "I", "r", "p", "c", "scala", "v1"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(v1, 0)
    t.evolveSchema(Seq(RenameColumn("repo", "repository")))
    assert(t.meta.keyCols == Seq("repository", "path", "commit"))
    // reads and merges keep working: bucketExpr resolves the new name
    assert(t.currentState().count() == 1)
    val v2 = Seq((2L, "U", "r", "p", "c", "scala", "v2"))
      .toDF("lsn", "op", "repository", "path", "commit", "lang", "content")
    t.merge(v2, 1)
    val cur = t.currentState().collect()
    assert(cur.length == 1 && cur(0).getAs[String]("content") == "v2")
  }

  test("catalog rejects table names that would escape the warehouse") {
    val cat = new LakeCatalog(spark, tmpDir("wh"))
    intercept[IllegalArgumentException](cat.tablePath("ns", "../evil"))
    intercept[IllegalArgumentException](cat.tablePath("ns", "a/b"))
    assert(cat.tablePath("ns", "code_files").endsWith("ns/code_files"))
  }

  test("drop column forbidden on key; add of existing name rejected") {
    val t = freshTable()
    intercept[Exception](t.evolveSchema(Seq(DropColumn("repo"))))
    intercept[Exception](t.evolveSchema(Seq(AddColumn("content", StringType))))
    intercept[Exception](t.evolveSchema(Seq(WidenType("content", LongType))))
  }

  test("widening a key column is refused (bucket routing would change)") {
    val t = freshTable()
    val e = intercept[IllegalArgumentException](
      t.evolveSchema(Seq(WidenType("repo", LongType))))
    assert(e.getMessage.contains("widen key column"))
    // non-key widens remain legal (schema has no widenable non-key column
    // in the base fixture, so the refusal above must be the KEY guard, not
    // the widen-legality check — message asserted)
  }
}
