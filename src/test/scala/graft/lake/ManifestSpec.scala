package graft.lake

import graft.SparkTestBase
import graft.cdc._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Manifest indirection (Iceberg's manifest-list shape): each snapshot's
  * file list lives in an immutable content-addressed side file, the version
  * JSON carries only pointers, and a commit writes O(its own files) of
  * metadata instead of re-serializing every retained snapshot's list. */
class ManifestSpec extends SparkTestBase {
  import CdcPipeline.baseTableSchema

  private def batch(lsn: Long, repo: String) = {
    import spark.implicits._
    Seq((lsn, "I", repo, "p", "c", "scala", s"v$lsn"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
  }

  private def manifestNames(root: String): Set[String] = {
    val d = Paths.get(root, "metadata", "manifests")
    if (!Files.isDirectory(d)) return Set.empty
    val s = Files.list(d)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("m-")).toSet
    finally s.close()
  }

  private def latestVersionText(root: String): String = {
    val d = Paths.get(root, "metadata")
    val s = Files.list(d)
    val latest = try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json")).max
    finally s.close()
    Files.readString(d.resolve(latest))
  }

  test("version files carry manifest pointers, not inline file lists") {
    val root = tmpDir("mf")
    val t = LakeTable.createOrReplace(spark, root, baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    t.merge(batch(1, "r1"), 1)
    t.merge(batch(2, "r2"), 2)
    val text = latestVersionText(root)
    assert(text.contains("manifestFile"), "snapshot stubs must point at manifests")
    assert(!text.contains(".parquet"),
      "no data-file path may appear inline in the version file")
    // state fully readable through the indirection
    assert(t.currentState().count() == 2)
    assert(t.meta.currentSnapshot.get.files.nonEmpty, "load must hydrate files")
  }

  test("metadata-only commits and rollback reuse manifests (content-addressed)") {
    val root = tmpDir("mfreuse")
    val t = LakeTable.createOrReplace(spark, root, baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    t.merge(batch(1, "r1"), 1)
    val target = t.meta.currentSnapshotId
    t.merge(batch(2, "r2"), 2)
    val afterData = manifestNames(root)
    assert(afterData.size == 2, s"one manifest per distinct file set: $afterData")
    // metadata-only commits add zero manifests
    t.setProperty("audit", Some("yes"))
    t.createTag("pin", Some(target))
    assert(manifestNames(root) == afterData)
    // rollback restores an old FILE SET — same content hash, shared manifest
    t.rollback(target)
    assert(manifestNames(root) == afterData,
      "rollback must share the target's manifest, not duplicate it")
    assert(t.currentState().count() == 1)
  }

  test("expiry reclaims manifests no retained snapshot references") {
    val root = tmpDir("mfexp")
    val t = LakeTable.createOrReplace(spark, root, baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    (1 to 4).foreach(i => t.merge(batch(i, s"r$i"), i))
    val before = manifestNames(root)
    assert(before.size == 4)
    t.expireSnapshots(keepLast = 1)
    val after = manifestNames(root)
    assert(after.size == 1, s"only the current snapshot's manifest survives: $after")
    assert(before.intersect(after) == after)
    assert(t.currentState().count() == 4) // data unharmed
  }

  test("legacy inline metadata (no pointers) loads and re-externalizes on commit") {
    val root = tmpDir("mflegacy")
    val t = LakeTable.createOrReplace(spark, root, baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    t.merge(batch(1, "r1"), 1)
    // rewrite the current version as an old-format file: lists inline,
    // pointers cleared (bypassing tryWriteVersion's externalization)
    val m = t.meta
    val legacy = m.copy(version = m.version + 1,
      snapshots = m.snapshots.map(_.copy(manifestFile = "")))
    Files.writeString(Paths.get(root, "metadata", f"v${legacy.version}%012d.json"),
      TableMeta.toJson(legacy))
    val t2 = LakeTable.forPath(spark, root)
    assert(t2.currentState().count() == 1) // inline lists still readable
    t2.merge(batch(2, "r2"), 2) // next commit externalizes everything
    val text = latestVersionText(root)
    assert(!text.contains(".parquet"))
    assert(t2.currentState().count() == 2)
  }

  test("superseded version files are pruned to a bounded window") {
    val root = tmpDir("mfprune")
    val t = LakeTable.createOrReplace(spark, root, baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    t.merge(batch(1, "r1"), 1)
    (1 to 80).foreach(i => t.setProperty("beat", Some(i.toString)))
    val d = Paths.get(root, "metadata")
    val s = Files.list(d)
    val versions = try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json")).toSeq
    finally s.close()
    assert(versions.size <= 65, s"metadata dir must stay bounded: ${versions.size}")
    // full history (snapshots) lives in the CURRENT version — nothing lost
    val t2 = LakeTable.forPath(spark, root)
    assert(t2.currentState().count() == 1)
    assert(t2.meta.properties("beat") == "80")
    assert(t2.meta.snapshots.nonEmpty)
  }

  test("orphaned manifests and stray tmp files are reaped with an age guard") {
    val root = tmpDir("mforphan")
    val t = LakeTable.createOrReplace(spark, root, baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    t.merge(batch(1, "r1"), 1)
    t.merge(batch(2, "r2"), 2)
    val referenced = manifestNames(root)
    assert(referenced.size == 2)
    // plant what a lost commit race / crashed writer leaves behind: a
    // manifest no snapshot references and a half-written temp file
    val mdir = Paths.get(root, "metadata", "manifests")
    Files.writeString(mdir.resolve("m-00deadbeef.json"), """{"files":[]}""")
    Files.writeString(mdir.resolve(".tmp-crashed.json"), "{")
    // ... and a version writer killed mid-commit leaves a temp in metadata/
    Files.writeString(Paths.get(root, "metadata", ".tmp-vcrash.json"), "{")
    // age guard: fresh artifacts may belong to an in-flight writer
    assert(t.cleanOrphanedStaging(olderThanMs = 3600000L) == 0)
    assert(Files.exists(mdir.resolve("m-00deadbeef.json")))
    // past the guard they are orphans; referenced manifests are untouched
    assert(t.cleanOrphanedStaging(olderThanMs = -1L) == 3)
    assert(!Files.exists(mdir.resolve("m-00deadbeef.json")))
    assert(!Files.exists(mdir.resolve(".tmp-crashed.json")))
    assert(!Files.exists(Paths.get(root, "metadata", ".tmp-vcrash.json")))
    assert(manifestNames(root) == referenced)
    assert(t.currentState().count() == 2)
  }

  test("commit metadata write cost is O(new files), not O(snapshots x files)") {
    val root = tmpDir("mfcost")
    val t = LakeTable.createOrReplace(spark, root, baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    (1 to 6).foreach(i => t.merge(batch(i, s"r$i"), i))
    // version-file size must not grow with the file count of history: the
    // first and the sixth version differ only by snapshot STUBS (a few
    // hundred bytes each), never by embedded file lists
    val d = Paths.get(root, "metadata")
    val s = Files.list(d)
    val sizes = try s.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("v"))
      .map(Files.size(_)).toSeq.sorted
    finally s.close()
    val growth = (sizes.max - sizes.min).toDouble / 6
    assert(growth < 2048, s"per-commit version growth $growth B looks like inline file lists")
  }
}
