package graft.cdc

import graft.SparkTestBase
import graft.lake._
import org.apache.spark.sql.functions._

/** Debezium-envelope interop: the JSON codec must be lossless over the
  * engine envelope, and a Debezium JSON feed must replay to BYTE-IDENTICAL
  * table state vs the native parquet feed — through both the batch source
  * and the streaming tail. */
class DebeziumSpec extends SparkTestBase {

  private val cfg = GenConfig(numEvents = 12000, numRepos = 20,
    pathsPerRepo = 6, commitsPerFile = 3)

  private def envelopes = CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg))

  private def freshTable(root: String): LakeTable =
    LakeTable.createOrReplace(spark, root, CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 8)

  private def stateSha(t: LakeTable): Seq[String] =
    t.currentState()
      .select(concat_ws("|", col("repo"), col("path"), col("commit"),
        sha2(coalesce(col("content"), lit("")), 256),
        coalesce(col("branch"), lit("-")),
        coalesce(col("size_bytes").cast("string"), lit("-"))).as("line"))
      .collect().map(_.getString(0)).sorted.toSeq

  test("encode ∘ decode is the identity on the envelope (all ops, all versions)") {
    val env = envelopes
    val back = DebeziumFormat.decode(DebeziumFormat.encode(env))
    assert(back.schema.fields.map(f => f.name -> f.dataType).toSeq ==
      env.schema.fields.map(f => f.name -> f.dataType).toSeq)
    val a = env.orderBy("lsn").collect().map(_.toSeq)
    val b = back.orderBy("lsn").collect().map(_.toSeq)
    assert(a.length == b.length && a.length == cfg.numEvents)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"row mismatch: $x vs $y") }
    // the generator must exercise every op and the delete image must ride
    // in `before` (the Debezium convention), not `after`
    val ops = env.select("op").distinct().collect().map(_.getString(0)).toSet
    assert(ops == Set("I", "U", "D"))
    val sample = DebeziumFormat.encode(env.filter(col("op") === "D").limit(1))
      .head().getString(0)
    assert(sample.contains("\"before\"") && !sample.contains("\"after\""))
    assert(sample.contains("\"op\":\"d\""))
  }

  test("snapshot-read op 'r' decodes as an upsert, unknown op quarantines") {
    val json = Seq(
      """{"payload":{"after":{"repo":"r1","path":"p","commit":"c1","lang":"scala","content":"x"},"source":{"lsn":7,"ts_us":1000000,"schema_version":1},"op":"r","ts_ms":1000}}""",
      """{"payload":{"after":{"repo":"r1","path":"p","commit":"c2","lang":"scala","content":"y"},"source":{"lsn":8,"ts_us":2000000,"schema_version":1},"op":"x","ts_ms":2000}}""",
      "not json at all")
    import spark.implicits._
    val decoded = DebeziumFormat.decode(json.toDF("value")).collect()
    val byLsn = decoded.filter(!_.isNullAt(0)).map(r => r.getLong(0) -> r).toMap
    assert(byLsn(7L).getString(2) == "I") // r -> I
    assert(byLsn(8L).isNullAt(2)) // unknown op -> null -> quarantine reason
    assert(decoded.count(_.isNullAt(0)) == 1) // garbage line -> null lsn

    val dir = tmpDir("dbz-q")
    val t = freshTable(s"$dir/t")
    CdcPipeline.replayBatch(spark, DebeziumFormat.decode(json.toDF("value")),
      t, evolution = Map.empty, quarantineDir = Some(s"$dir/q"))
    assert(t.currentState().count() == 1) // only the clean 'r' row merged
    val q = spark.read.parquet(s"$dir/q/epoch=-1")
    assert(q.count() == 2, "bad op + garbage line both dead-lettered")
  }

  test("Debezium JSON replay == native parquet replay (byte-identical state, batch + stream)") {
    val dir = tmpDir("dbz")
    val env = envelopes
    env.write.mode("overwrite").parquet(s"$dir/plog")
    DebeziumFormat.encode(env).repartitionByRange(4, col("value"))
      .write.mode("overwrite").text(s"$dir/jlog")

    val native = freshTable(s"$dir/tn")
    CdcPipeline.replayBatch(spark,
      spark.read.schema(CdcPipeline.envelopeSchema).parquet(s"$dir/plog"), native)

    // batch path through the ChangeSource trait
    val src = new DebeziumFileSource(spark, s"$dir/jlog")
    assert(src.maxLsn() == cfg.numEvents - 1)
    val viaBatch = freshTable(s"$dir/tb")
    CdcPipeline.replayBatch(spark, src.batch(-1L), viaBatch)
    assert(stateSha(viaBatch) == stateSha(native))

    // streaming tail through the same foreachBatch pipeline
    val viaStream = freshTable(s"$dir/ts")
    CdcPipeline.startFrom(src.stream, viaStream, s"$dir/ckpt")
      .awaitTermination()
    assert(stateSha(viaStream) == stateSha(native))
    assert(viaStream.meta.committedEpochs.nonEmpty)
  }

  test("a corrupt op never round-trips into a delete; batch path dead-letters garbage") {
    import spark.implicits._
    // seed one live row
    val dir = tmpDir("dbz-corrupt")
    val t = freshTable(s"$dir/t")
    val seed = Seq(("r1", "p", "c1", "scala", "keep-me")).toDF(
      "repo", "path", "commit", "lang", "content")
      .withColumn("lsn", org.apache.spark.sql.functions.lit(1L))
      .withColumn("txn_ts", org.apache.spark.sql.functions.lit(
        new java.sql.Timestamp(1000L)))
      .withColumn("op", org.apache.spark.sql.functions.lit("I"))
      .withColumn("schema_version", org.apache.spark.sql.functions.lit(1))
      .withColumn("branch", org.apache.spark.sql.functions.lit(null: String))
      .withColumn("size_bytes",
        org.apache.spark.sql.functions.lit(null).cast("long"))
    CdcPipeline.replayBatch(spark, seed, t, Map.empty)
    assert(t.currentState().count() == 1)

    // the same row with a CORRUPT op (quarantine-class) at a higher lsn:
    // encode must NOT default it to Debezium 'd' — decoded back it must be
    // a null-op quarantine row, and the merge must not delete the live row
    val corrupt = seed
      .withColumn("lsn", org.apache.spark.sql.functions.lit(2L))
      .withColumn("op", org.apache.spark.sql.functions.lit("X"))
    val decoded = DebeziumFormat.decode(DebeziumFormat.encode(corrupt))
    assert(decoded.head().isNullAt(2), "corrupt op must decode to null op")
    CdcPipeline.replayBatch(spark, decoded, t, Map.empty,
      quarantineDir = Some(s"$dir/q"))
    assert(t.currentState().count() == 1, "corrupt event must not delete the row")

    // batch()+syncOnce over a feed with a garbage line: the line cannot be
    // lsn-positioned, so it must ride EVERY window into the quarantine
    // (never silently dropped by the window filter); the beat itself
    // succeeds when a quarantine sink is configured and fails loudly when
    // it is not
    DebeziumFormat.encode(envelopes.filter(col("lsn") < 100))
      .write.mode("overwrite").text(s"$dir/jlog")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/jlog/garbage.txt"), "not json at all\n")
    val src = new DebeziumFileSource(spark, s"$dir/jlog")
    val t2 = freshTable(s"$dir/t2")
    intercept[Exception] {
      IncrementalSync.syncOnce(src, t2, CdcPipeline.defaultEvolution)
    }
    val t3 = freshTable(s"$dir/t3")
    assert(IncrementalSync.syncOnce(src, t3, CdcPipeline.defaultEvolution,
      quarantineDir = Some(s"$dir/q3")) > 0)
    val q = spark.read.parquet(s"$dir/q3")
    assert(q.filter(col("q_reason").isNotNull).count() == 1,
      "the garbage line must be dead-lettered, not dropped")
  }

  test("CDC out: change-feed export replicates a lagging follower to byte-identical state") {
    val dir = tmpDir("dbz-out")
    val env = envelopes
    val (first, second) = (env.filter(col("lsn") < 6000), env.filter(col("lsn") >= 6000))

    // leader applies both halves; follower only the first
    val leader = freshTable(s"$dir/leader")
    CdcPipeline.replayBatch(spark, first, leader)
    val snapA = leader.meta.currentSnapshotId
    CdcPipeline.replayBatch(spark, second, leader)
    val follower = freshTable(s"$dir/follower")
    CdcPipeline.replayBatch(spark, first, follower)

    // export the leader's A→HEAD feed as Debezium JSON, decode, apply:
    // inserts/updates upsert, deletes delete, lsn order preserved
    // stamp the full envelope version: the follower may have stopped at an
    // earlier schema (its half of the log may not reach v4), and an
    // unevolved follower would silently drop the evolved columns
    val exported = DebeziumFormat.encodeFeed(leader.changes(snapA), schemaVersion = 4)
    exported.write.mode("overwrite").text(s"$dir/feed")
    val decoded = DebeziumFormat.decode(spark.read.text(s"$dir/feed"))
    assert(decoded.filter(col("op") === "D").count() > 0,
      "the window must contain deletes for this to prove delete propagation")
    CdcPipeline.replayBatch(spark, decoded, follower)
    assert(stateSha(follower) == stateSha(leader))
  }

  test("CDC out: unknown feed change types encode op-less and quarantine, never fabricate an update") {
    import spark.implicits._
    // a foreign CDF's update_preimage (or any corrupt change type) must NOT
    // become a well-formed 'u' — applying a pre-image as an update would
    // overwrite the follower's newer value
    val feed = Seq(
      (1L, "insert", "r1", "p", "c1"),
      (2L, "update_preimage", "r1", "p", "cOLD"),
      (3L, "update", "r1", "p", "cNEW"),
      (4L, "delete", "r2", "p", "c2"))
      .toDF("_lsn", "_change_type", "repo", "path", "commit")
    val decoded = DebeziumFormat.decode(DebeziumFormat.encodeFeed(feed))
      .orderBy("lsn").collect()
    assert(decoded.map(r => if (r.isNullAt(2)) null else r.getString(2)).toSeq ==
      Seq("I", null, "U", "D"))
  }

  test("incremental sync beats over a Debezium feed are exactly-once") {
    val dir = tmpDir("dbz-sync")
    val env = envelopes
    val (first, second) = (env.filter(col("lsn") < 6000), env.filter(col("lsn") >= 6000))
    DebeziumFormat.encode(first).write.mode("overwrite").text(s"$dir/jlog")
    val t = freshTable(s"$dir/t")
    val src = new DebeziumFileSource(spark, s"$dir/jlog")
    val evo = CdcPipeline.defaultEvolution
    val versions = new TableVersions
    assert(IncrementalSync.syncOnce(src, t, evo, versions) > 0)
    assert(IncrementalSync.syncOnce(src, t, evo, versions) == 0L) // drained: no-op beat
    DebeziumFormat.encode(second).write.mode("append").text(s"$dir/jlog")
    assert(IncrementalSync.syncOnce(src, t, evo, versions) > 0)

    val native = freshTable(s"$dir/tn")
    CdcPipeline.replayBatch(spark, env, native)
    assert(stateSha(t) == stateSha(native))
  }
}
