package graft.lake

import graft.SparkTestBase
import graft.cdc.{CdcPipeline, ChangeEvent}
import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit
import scala.jdk.CollectionConverters._

/** Round-5 commit-protocol torture (round-4 verdict items 3 and 4):
  *  - real cross-PROCESS contention — two JVMs committing metadata and
  *    merges to one table, nothing coordinated but the filesystem;
  *  - a deterministic kill-9 sweep: one simulated process death at EVERY
  *    commit-I/O step (tmp write, link/conditional-put, manifest
  *    publication, post-publish housekeeping), asserting the table always
  *    reloads consistent, the epoch retry converges to the exact expected
  *    state, and the orphan sweep reaps what the dead process left;
  *  - the same commit path over BOTH backends: POSIX link and the S3-style
  *    conditional-put [[ObjectStoreCommitIo]].
  */
class CommitTortureSpec extends SparkTestBase {
  import spark.implicits._

  private def storeIo(root: String): CommitIo =
    new ObjectStoreCommitIo(Paths.get(root, ".store"))
  private def ioFor(backend: String, root: String): CommitIo =
    if (backend == "store") storeIo(root) else PosixCommitIo

  private def batch(lsnBase: Long, repo: String, n: Int = 5) =
    (0 until n).map(i =>
      (lsnBase + i, "I", repo, s"p$i", "c", "scala", s"v$lsnBase-$i"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")

  private def stateRows(t: LakeTable): Set[Seq[Any]] =
    t.currentState().select("repo", "path", "commit", "lang", "content")
      .collect().map(_.toSeq).toSet

  // ---------------------------------------------------------------- children

  private def childCmd(args: Seq[String]): Seq[String] = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val moduleOpts = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().trim.split("\\s+").toSeq
    Seq(javaBin) ++ moduleOpts ++ Seq("-Xmx2g",
      "-Dspark.ui.enabled=false", "-Dspark.driver.host=localhost",
      "-cp", System.getProperty("java.class.path"),
      "graft.lake.CommitStress") ++ args
  }

  /** Spawn two stress children CONCURRENTLY and return their outputs. */
  private def run2(argsA: Seq[String], argsB: Seq[String]): (String, String) = {
    def spawn(a: Seq[String]) = {
      val pb = new ProcessBuilder(childCmd(a): _*).redirectErrorStream(true)
      val p = pb.start()
      val buf = new StringBuilder
      val t = new Thread(() =>
        scala.io.Source.fromInputStream(p.getInputStream).getLines()
          .foreach(l => buf.synchronized { buf.append(l).append('\n') }))
      t.setDaemon(true); t.start()
      (p, t, buf)
    }
    val (pa, ta, ba) = spawn(argsA)
    val (pb, tb, bb) = spawn(argsB)
    assert(pa.waitFor(600, TimeUnit.SECONDS), "writer A timed out")
    assert(pb.waitFor(600, TimeUnit.SECONDS), "writer B timed out")
    ta.join(5000); tb.join(5000)
    val (oa, ob) = (ba.synchronized(ba.toString), bb.synchronized(bb.toString))
    assert(pa.exitValue() == 0, s"writer A failed:\n${oa.takeRight(3000)}")
    assert(pb.exitValue() == 0, s"writer B failed:\n${ob.takeRight(3000)}")
    (oa, ob)
  }

  private def metaContention(backend: String): Unit = {
    val root = tmpDir(s"torture-meta-$backend")
    LakeTable.createOrReplace(spark, root, CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4, io = ioFor(backend, root))
    val v0 = LakeTable.metaAt(root).version
    val n = 120
    val (oa, ob) = run2(Seq("meta", root, "1", n.toString, backend),
      Seq("meta", root, "2", n.toString, backend))
    assert(oa.contains("STRESS") && ob.contains("STRESS"), s"$oa\n$ob")
    val m = LakeTable.metaAt(root)
    // every version number consumed exactly once: losers retried on a fresh
    // load, so the version advanced by exactly the total successful commits
    assert(m.version == v0 + 2 * n,
      s"version ${m.version} != ${v0 + 2 * n}: a commit was lost or doubled")
    val stressEpochs = m.snapshots.map(_.epochId).filter(_ >= 100000L)
    val expected = ((0 until n).map(i => 100000L + i) ++
      (0 until n).map(i => 200000L + i)).toSet
    assert(stressEpochs.size == 2 * n, s"${stressEpochs.size} stress snapshots")
    assert(stressEpochs.toSet == expected, "epoch set incomplete")
    assert(m.snapshots.map(_.snapshotId).distinct.size == m.snapshots.size,
      "duplicate snapshot ids survived the race")
  }

  test("cross-process: 2 JVMs x 120 contended metadata commits (posix) lose nothing") {
    metaContention("posix")
  }

  test("cross-process: same metadata contention on the conditional-put backend") {
    metaContention("store")
  }

  private def mergeContention(root: String, properties: Map[String, String]): Unit = {
    LakeTable.createOrReplace(spark, root, CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 8, properties = properties)
    val (n, rows) = (4, 200)
    val (oa, ob) = run2(Seq("merge", root, "1", n.toString, rows.toString),
      Seq("merge", root, "2", n.toString, rows.toString))
    assert(oa.contains("\"mode\":\"merge\"") && ob.contains("\"mode\":\"merge\""),
      s"$oa\n$ob")
    val t = LakeTable.forPath(spark, root)
    val m = t.meta
    // all 8 epochs exactly once, all rows present, no key doubled
    val epochs = (0 until n).map(i => 100000L + i) ++ (0 until n).map(i => 200000L + i)
    epochs.foreach(e => assert(m.epochCommitted(e), s"epoch $e missing"))
    assert(t.currentState().count() == 2L * n * rows)
    val perRepo = t.currentState().groupBy("repo").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perRepo == Map("repo-w1" -> (n * rows).toLong, "repo-w2" -> (n * rows).toLong))
  }

  test("cross-process: 2 Spark JVMs merging + compacting concurrently") {
    mergeContention(tmpDir("torture-merge"), Map.empty)
  }

  test("cross-process merges on the conditional-put backend (via commit.io)") {
    // the stress children open the table with plain forPath — the persisted
    // commit.io property is what routes BOTH writer JVMs through the
    // conditional-put primitive, which is exactly how a real deployment
    // would select it
    val root = tmpDir("torture-merge-store")
    mergeContention(root, Map("commit.io" -> "conditional-put"))
    assert(LakeTable.forPath(spark, root).commitIo.name == "store")
  }

  // ------------------------------------------------------------ kill-9 sweep

  test("kill-9 sweep over every commit step, posix and conditional-put backends") {
    def newTable(root: String, backend: String): LakeTable =
      LakeTable.createOrReplace(spark, root, CdcPipeline.baseTableSchema,
        ChangeEvent.keyCols, numBuckets = 4, io = ioFor(backend, root))

    // the expected post-recovery state, built on an unfaulted twin
    val refRoot = tmpDir("sweep-ref")
    val ref = newTable(refRoot, "posix")
    ref.merge(batch(1, "seed"), 1)
    ref.merge(batch(100, "probe"), 2)
    val expected = stateRows(ref)

    for (backend <- Seq("posix", "store")) {
      // enumerate the fault points one epoch-2 merge announces
      val countRoot = tmpDir(s"sweep-count-$backend")
      val tc = newTable(countRoot, backend)
      tc.merge(batch(1, "seed"), 1)
      val points = scala.collection.mutable.ArrayBuffer.empty[String]
      CommitFault.hook = p => points.synchronized { points += p }
      try tc.merge(batch(100, "probe"), 2) finally CommitFault.reset()
      assert(points.nonEmpty, s"$backend announced no fault points")

      for (i <- points.indices) {
        val root = tmpDir(s"sweep-$backend-$i")
        val t = newTable(root, backend)
        t.merge(batch(1, "seed"), 1)
        val hits = new java.util.concurrent.atomic.AtomicInteger(0)
        CommitFault.hook =
          p => if (hits.incrementAndGet() == i + 1) throw new CommitFault.SimulatedCrash(p)
        val crashed =
          try { t.merge(batch(100, "probe"), 2); false }
          catch { case _: CommitFault.SimulatedCrash => true }
        CommitFault.reset()
        assert(crashed, s"$backend point $i (${points(i)}) did not fire")

        // a NEW handle = the recovering process: the table must load
        // cleanly from whatever the dead writer left behind
        val t2 = LakeTable.forPath(spark, root, ioFor(backend, root))
        assert(t2.meta.formatVersion == 1)
        // retrying the epoch converges: either the crash pre-dated
        // durability (the merge re-applies) or the commit had landed
        // (exactly-once makes the retry a no-op)
        t2.merge(batch(100, "probe"), 2)
        assert(stateRows(t2) == expected,
          s"$backend crash at ${points(i)}: state diverged after recovery")
        assert(t2.meta.epochCommitted(1) && t2.meta.epochCommitted(2))

        // the dead writer's debris is reaped: orphaned staging dirs and
        // stray tmp files (negative age disables the in-flight guard)
        t2.cleanOrphanedStaging(olderThanMs = -5000)
        val mdir = Paths.get(root, "metadata")
        // recursive: the manifest-stage crash points leave their tmp files
        // in metadata/manifests/, not metadata/ itself (review finding)
        val strayTmp = {
          val s = Files.walk(mdir)
          try s.iterator().asScala.count(_.getFileName.toString.startsWith(".tmp-"))
          finally s.close()
        }
        assert(strayTmp == 0, s"$backend crash at ${points(i)}: tmp debris survived the sweep")
        // every staging dir still on disk is referenced by a live snapshot
        val referenced = t2.meta.snapshots
          .flatMap(_.files.map(f => Paths.get(root).resolve(f.path).getParent.getParent))
          .toSet
        val dataDirs = {
          val s = Files.list(Paths.get(root, "data"))
          try s.iterator().asScala.filter(Files.isDirectory(_)).toList finally s.close()
        }
        assert(dataDirs.forall(referenced.contains),
          s"$backend crash at ${points(i)}: unreferenced staging survived the sweep")
      }
    }
  }

  test("commit.io table property selects the backend from plain SQL") {
    val wh = tmpDir("iosqlwh")
    spark.conf.set("spark.sql.catalog.giosql",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.giosql.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS giosql.ns")
    spark.sql("CREATE TABLE giosql.ns.t (k STRING, v INT) TBLPROPERTIES " +
      "('keys'='k', 'buckets'='4', 'commit.io'='conditional-put')")
    spark.sql("INSERT INTO giosql.ns.t VALUES ('a', 1), ('b', 2)")
    spark.sql("UPDATE giosql.ns.t SET v = 3 WHERE k = 'a'")
    val got = spark.sql("SELECT k, v FROM giosql.ns.t ORDER BY k")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("a", 3), ("b", 2)))
    // every handle auto-resolves the backend from the persisted property
    val root = Paths.get(wh, "ns", "t").toString
    val t = LakeTable.forPath(spark, root)
    assert(t.commitIo.name == "store", "forPath did not resolve commit.io")
    assert(t.meta.properties.get("commit.io").contains("conditional-put"))
    // the conditional-put path never writes tmp files into the metadata
    // namespace (its spool lives in .store/); version files are present
    val mdir = Paths.get(root, "metadata")
    val names = {
      val s = Files.walk(mdir)
      try s.iterator().asScala.map(_.getFileName.toString).toList
      finally s.close()
    }
    assert(!names.exists(_.startsWith(".tmp-")),
      s"conditional-put SQL table leaked tmp files: $names")
    assert(names.count(n => n.startsWith("v") && n.endsWith(".json")) >= 3)
    // an unknown backend value fails loud at create
    intercept[RuntimeException](
      spark.sql("CREATE TABLE giosql.ns.bad (k STRING) TBLPROPERTIES " +
        "('keys'='k', 'commit.io'='carrier-pigeon')"))
    // ... and at ALTER (an invalid value committed here would brick every
    // later open, including the corrective ALTER itself)
    intercept[Exception](
      spark.sql("ALTER TABLE giosql.ns.t SET TBLPROPERTIES ('commit.io'='nope')"))
    assert(LakeTable.forPath(spark, root).commitIo.name == "store",
      "failed ALTER must not have clobbered the backend")
    // a contradictory EXPLICIT io at create fails loud instead of writing
    // v1 through a different primitive than later handles resolve
    intercept[IllegalArgumentException](
      LakeTable.create(spark, tmpDir("io-contradict") + "/t",
        CdcPipeline.baseTableSchema, ChangeEvent.keyCols,
        io = PosixCommitIo,
        properties = Map("commit.io" -> "conditional-put")))
    // engine-derived keys can no longer be smuggled in at CREATE
    spark.sql("CREATE TABLE giosql.ns.clean (k STRING) TBLPROPERTIES " +
      "('keys'='k', 'tags'='bogus')")
    assert(!LakeTable.forPath(spark, Paths.get(wh, "ns", "clean").toString)
      .meta.properties.contains("tags"),
      "reserved key persisted through CREATE TBLPROPERTIES")
  }

  test("conditional-put backend: full lifecycle matches the posix twin") {
    def lifecycle(root: String, io: CommitIo): (Set[Seq[Any]], Seq[String]) = {
      val t = LakeTable.createOrReplace(spark, root, CdcPipeline.baseTableSchema,
        ChangeEvent.keyCols, numBuckets = 4, io = io)
      t.merge(batch(1, "alpha"), 1)
      t.merge(batch(50, "beta"), 2)
      t.evolveSchema(Seq(AddColumn("note", org.apache.spark.sql.types.StringType)))
      t.merge((0 until 3).map(i => (200L + i, "I", "alpha", s"p$i", "c", "scala",
          s"v200-$i", s"note$i"))
        .toDF("lsn", "op", "repo", "path", "commit", "lang", "content", "note"), 3)
      t.compact(targetFileBytes = 1L << 20)
      t.expireSnapshots(keepLast = 2)
      val t2 = LakeTable.forPath(spark, root, io)
      (t2.currentState().select("repo", "path", "content", "note")
        .collect().map(_.toSeq).toSet,
        t2.meta.currentSchema.columns.map(_.name))
    }
    val (posixState, posixSchema) = lifecycle(tmpDir("twin-posix"), PosixCommitIo)
    val storeRoot = tmpDir("twin-store")
    val (storeState, storeSchema) = lifecycle(storeRoot, storeIo(storeRoot))
    assert(storeState == posixState, "object-store lifecycle diverged from posix")
    assert(storeSchema == posixSchema)
    // and the store table namespace never saw a tmp file beside a target
    val mdir = Paths.get(storeRoot, "metadata")
    val tmps = {
      val s = Files.walk(mdir)
      try s.iterator().asScala.count(_.getFileName.toString.startsWith(".tmp-"))
      finally s.close()
    }
    assert(tmps == 0, "conditional-put backend leaked tmp files into the table namespace")
  }
}
