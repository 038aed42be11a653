package graft.cdc

import graft.SparkTestBase
import graft.lake._
import org.apache.spark.sql.functions._

class CdcPipelineSpec extends SparkTestBase {

  private val cfg = GenConfig(numEvents = 12000, numRepos = 20, pathsPerRepo = 6,
    commitsPerFile = 3)

  private def writeLog(dir: String, files: Int): Unit =
    CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg))
      .repartitionByRange(files, col("lsn"))
      .write.mode("overwrite").parquet(dir)

  private def freshTable(root: String): LakeTable =
    LakeTable.createOrReplace(spark, root, CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 8)

  private def stateSha(t: LakeTable): Seq[String] =
    t.currentState()
      .select(concat_ws("|", col("repo"), col("path"), col("commit"),
        sha2(coalesce(col("content"), lit("")), 256),
        coalesce(col("ref"), lit("-")),
        coalesce(col("size_bytes").cast("string"), lit("-"))).as("line"))
      .collect().map(_.getString(0)).sorted.toSeq

  // evolution plan exercising add + widen + rename mid-stream
  private val evolution: Map[Int, Seq[SchemaChange]] = Map(
    2 -> Seq(AddColumn("branch", org.apache.spark.sql.types.StringType)),
    3 -> Seq(AddColumn("size_bytes", org.apache.spark.sql.types.IntegerType)),
    4 -> Seq(WidenType("size_bytes", org.apache.spark.sql.types.LongType),
      RenameColumn("branch", "ref")))

  test("streaming replay == single batch replay (byte-identical state incl. evolved cols)") {
    val dir = tmpDir("pipe")
    writeLog(s"$dir/log", 6)

    val streamed = freshTable(s"$dir/t1")
    CdcPipeline.run(spark, s"$dir/log", streamed, s"$dir/ckpt1",
      evolution = evolution, maxFilesPerTrigger = Some(1),
      lineageDir = Some(s"$dir/lineage"))
    assert(streamed.meta.committedEpochs.size == 6)

    val batch = freshTable(s"$dir/t2")
    CdcPipeline.replayBatch(spark,
      spark.read.schema(CdcPipeline.envelopeSchema).parquet(s"$dir/log"),
      batch, evolution)

    assert(stateSha(streamed) == stateSha(batch))

    // lineage emitted per epoch with plausible bounds
    val lin = spark.read.parquet(s"$dir/lineage")
    assert(lin.select("epochId").distinct().count() == 6)
    assert(lin.filter(col("rowsApplied") <= 0).count() == 0)
    assert(lin.filter(col("lsnMin") > col("lsnMax")).count() == 0)
  }

  test("merge-on-read streaming (delta + foldEvery) == COW replay, byte-identical incl. evolution") {
    val dir = tmpDir("pipemor")
    writeLog(s"$dir/log", 6)
    val mor = freshTable(s"$dir/t1")
    // every beat a delta commit, folded every 2 epochs — the trickle-beat
    // write path end-to-end through the streaming entry (the CLI's
    // [foldEvery] arg drives exactly this)
    CdcPipeline.run(spark, s"$dir/log", mor, s"$dir/ckpt1",
      evolution = evolution, maxFilesPerTrigger = Some(1),
      delta = true, foldEvery = 2)
    val cow = freshTable(s"$dir/t2")
    CdcPipeline.replayBatch(spark,
      spark.read.schema(CdcPipeline.envelopeSchema).parquet(s"$dir/log"),
      cow, evolution)
    assert(stateSha(mor) == stateSha(cow))
    assert(mor.meta.committedEpochs.size == 6)
    assert(mor.meta.snapshots.exists(_.operation == "delta-merge"))
    assert(mor.meta.snapshots.exists(_.operation == "fold"))
  }

  test("kill/resume mid-stream from checkpoint reproduces identical state") {
    val dir = tmpDir("pipe")
    writeLog(s"$dir/log", 8)

    // reference: uninterrupted
    val ref = freshTable(s"$dir/ref")
    CdcPipeline.run(spark, s"$dir/log", ref, s"$dir/ckptRef", evolution = evolution)

    // interrupted: process only some files per trigger, stop after first run
    // with a partial directory, then 'restart' twice more
    val t = freshTable(s"$dir/t")
    val partial = s"$dir/logPartial"
    val all = new java.io.File(s"$dir/log").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    def copyFirst(k: Int): Unit = {
      new java.io.File(partial).mkdirs()
      all.take(k).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(partial, f.getName),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    copyFirst(3)
    CdcPipeline.run(spark, partial, t, s"$dir/ckptT", evolution = evolution,
      maxFilesPerTrigger = Some(1))
    copyFirst(6)
    CdcPipeline.run(spark, partial, t, s"$dir/ckptT", evolution = evolution,
      maxFilesPerTrigger = Some(2))
    copyFirst(8)
    CdcPipeline.run(spark, partial, t, s"$dir/ckptT", evolution = evolution)

    assert(stateSha(t) == stateSha(ref))
  }

  test("kill/resume in merge-on-read mode: layered restarts still reach the COW state") {
    val dir = tmpDir("pipemorkr")
    writeLog(s"$dir/log", 8)
    val ref = freshTable(s"$dir/ref")
    CdcPipeline.run(spark, s"$dir/log", ref, s"$dir/ckptRef", evolution = evolution)
    // interrupted MOR ingest: restarts land mid-layer and mid-fold cadence —
    // the epoch ledger must keep delta commits exactly-once and a fold that
    // never ran just leaves layers for the next matching epoch
    val t = freshTable(s"$dir/t")
    val partial = s"$dir/logPartial"
    val all = new java.io.File(s"$dir/log").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    def copyFirst(k: Int): Unit = {
      new java.io.File(partial).mkdirs()
      all.take(k).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(partial, f.getName),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    copyFirst(3)
    CdcPipeline.run(spark, partial, t, s"$dir/ckptT", evolution = evolution,
      maxFilesPerTrigger = Some(1), delta = true, foldEvery = 2)
    copyFirst(6)
    CdcPipeline.run(spark, partial, t, s"$dir/ckptT", evolution = evolution,
      maxFilesPerTrigger = Some(2), delta = true, foldEvery = 2)
    copyFirst(8)
    CdcPipeline.run(spark, partial, t, s"$dir/ckptT", evolution = evolution,
      delta = true, foldEvery = 2)
    assert(stateSha(t) == stateSha(ref))
    assert(t.meta.snapshots.exists(_.operation == "delta-merge"))
  }

  test("reconciler finds zero missing and zero stale rows after replay") {
    val dir = tmpDir("pipe")
    writeLog(s"$dir/log", 4)
    val t = freshTable(s"$dir/t")
    CdcPipeline.run(spark, s"$dir/log", t, s"$dir/ckpt", evolution = evolution)
    val log = spark.read.schema(CdcPipeline.envelopeSchema).parquet(s"$dir/log")
    assert(Reconciler.missing(log, t).count() == 0)
    assert(Reconciler.stale(log, t).count() == 0)
  }

  test("reconciler repair re-ingests artificially removed keys") {
    val dir = tmpDir("pipe")
    writeLog(s"$dir/log", 4)
    val t = freshTable(s"$dir/t")
    val log = spark.read.schema(CdcPipeline.envelopeSchema).parquet(s"$dir/log")
    // replay only a prefix — the tail is 'missed' data the repair must find
    CdcPipeline.replayBatch(spark, log.filter(col("lsn") < cfg.numEvents / 2), t, evolution)
    val repaired = Reconciler.repair(log, t, 0, cfg.numEvents)
    assert(repaired > 0)
    assert(Reconciler.missing(log, t).count() == 0)
  }

  test("golden replay: committed sha256 of final state is stable across code changes") {
    val golden = GenConfig(numEvents = 5000, numRepos = 8, pathsPerRepo = 4,
      commitsPerFile = 2, schemaBumps = Seq(0.5))
    val dir = tmpDir("golden")
    CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, golden))
      .repartitionByRange(3, col("lsn")).write.parquet(s"$dir/log")
    val t = freshTable(s"$dir/t")
    CdcPipeline.run(spark, s"$dir/log", t, s"$dir/ckpt",
      evolution = Map(2 -> Seq(AddColumn("branch", org.apache.spark.sql.types.StringType))))
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    t.currentState()
      .select(concat_ws("|", col("repo"), col("path"), col("commit"),
        sha2(coalesce(col("content"), lit("")), 256)).as("line"))
      .collect().map(_.getString(0)).sorted
      .foreach(l => digest.update((l + "\n").getBytes("UTF-8")))
    val hex = digest.digest().map("%02x".format(_)).mkString
    val goldenFile = new java.io.File("src/test/resources/golden/final_state.sha256")
    if (!goldenFile.exists()) {
      goldenFile.getParentFile.mkdirs()
      java.nio.file.Files.writeString(goldenFile.toPath, hex)
      info(s"golden recorded: $hex")
    } else {
      val expected = java.nio.file.Files.readString(goldenFile.toPath).trim
      assert(hex == expected,
        s"final-state digest drifted: got $hex, golden $expected")
    }
  }

  test("quarantine: malformed envelopes dead-letter with reasons; state unaffected") {
    val dir = tmpDir("quarantine")
    val clean = CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg))
    // malform three envelopes: null key, null lsn, unknown op — ids pushed
    // past the generator's lsn range so they collide with nothing
    val bad = clean.limit(3).collect().zipWithIndex.map { case (r, i) =>
      val s = r.toSeq.toArray
      i match {
        case 0 => s(4) = null                    // repo (key) null
        case 1 => s(0) = null                    // lsn null
        case 2 => s(2) = "X"                     // op garbage
      }
      org.apache.spark.sql.Row.fromSeq(s.toSeq)
    }
    import scala.jdk.CollectionConverters._
    // all-nullable copy of the envelope schema: the malformed rows carry
    // nulls exactly where the contract says they must not
    val loose = org.apache.spark.sql.types.StructType(
      clean.schema.map(_.copy(nullable = true)))
    val badDf = spark.createDataFrame(bad.toSeq.asJava, loose)
    val dirty = clean.unionByName(badDf)

    // with a quarantine sink: state == clean-only replay, bad rows captured
    val t1 = freshTable(s"$dir/t1")
    CdcPipeline.replayBatch(spark, dirty, t1, evolution,
      quarantineDir = Some(s"$dir/q"))
    val t2 = freshTable(s"$dir/t2")
    CdcPipeline.replayBatch(spark, clean, t2, evolution)
    assert(stateSha(t1) == stateSha(t2),
      "malformed rows leaked into the merged state")
    // reconciliation applies the same validity contract: a dirty log with a
    // quarantined tail must still reconcile clean against the table
    assert(Reconciler.missing(dirty, t1).isEmpty && Reconciler.stale(dirty, t1).isEmpty,
      "reconciler counts quarantined envelopes as misses")
    val q = spark.read.parquet(s"$dir/q")
    val reasons = q.select("q_reason").collect().map(_.getString(0)).sorted
    assert(reasons.toSeq == Seq("bad_op", "null_key", "null_lsn"), reasons.mkString(","))
    assert(q.select("epoch").distinct().collect().map(_.get(0).toString).toSeq == Seq("-1"))

    // without a sink: the batch fails loudly instead of corrupting state
    val t3 = freshTable(s"$dir/t3")
    val ex = intercept[IllegalStateException](
      CdcPipeline.replayBatch(spark, dirty, t3, evolution))
    assert(ex.getMessage.contains("3 malformed"))
    assert(t3.currentState().isEmpty, "failed batch must not commit")
  }
}
