package graft.cdc

import graft.SparkTestBase
import graft.lake._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression specs for the CDC-layer adversarial-review fixes: every test
  * here failed (crash, silent row loss, or silent skip) against the
  * pre-review code and pins the hardened behavior. */
class CdcHardeningSpec extends SparkTestBase {
  import spark.implicits._

  /** A routed-style table keyed on columns that do NOT exist in the default
    * change-event envelope — the review's crash/row-loss scenario. */
  private def kvTable(root: String, buckets: Int = 8): LakeTable =
    LakeTable.createOrReplace(spark, root, StructType(Seq(
      StructField("k1", StringType, nullable = false),
      StructField("k2", IntegerType, nullable = false),
      StructField("v", StringType, nullable = true))),
      Seq("k1", "k2"), numBuckets = buckets)

  private def kvBatch(rows: Seq[(Long, String, String, Int, String)]): DataFrame =
    rows.toDF("lsn", "op", "k1", "k2", "v")

  test("custom-key table: quarantine, stats and salted dedup all use the table's keys") {
    val t = kvTable(tmpDir("hard-keys"))
    // 50 keys × 3 versions each; salts forced ON so the pre-merge salted
    // LWW dedup runs — with the old envelope-key hardcoding this path
    // threw (no repo/path/commit columns) and, on tables whose keys merely
    // EXTENDED the envelope's, silently discarded live rows
    val rows = for {
      a <- 'a' to 'j'; b <- 1 to 5; ver <- 0 to 2
    } yield ((a - 'a') * 15L + b * 3L + ver, "U", a.toString, b, s"v$ver")
    CdcPipeline.processBatch(kvBatch(rows), 0L, t, Map.empty,
      new TableVersions, None, salts = 4)
    val state = t.currentState().select("k1", "k2", "v").collect()
    assert(state.length == 50, s"expected 50 live keys, got ${state.length}")
    assert(state.forall(_.getString(2) == "v2"),
      "salted dedup kept a non-max-lsn row for some key")
  }

  test("touched-bucket stats hash keys post-cast, matching merge's bucketing") {
    // key column declared LONG; the change feed delivers it as INT.
    // hash(5: Int) != hash(5L: Long), so the old pre-cast stats marked the
    // wrong buckets touched and the merge left a stale live row behind.
    val t = LakeTable.createOrReplace(spark, tmpDir("hard-cast"), StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true))), Seq("k"), numBuckets = 8)
    def batch(v: String, lsnBase: Long): DataFrame =
      (1 to 50).map(i => (lsnBase + i, "U", i, v)).toDF("lsn", "op", "k", "v")
    val versions = new TableVersions
    CdcPipeline.processBatch(batch("old", 0L), 0L, t, Map.empty, versions, None)
    CdcPipeline.processBatch(batch("new", 100L), 1L, t, Map.empty, versions, None)
    val state = t.currentState().select("k", "v").collect()
    assert(state.length == 50, s"expected 50 live rows, got ${state.length} " +
      "(an un-reconciled bucket kept its stale row)")
    assert(state.forall(_.getString(1) == "new"))
  }

  test("envelope version recovers from the migration ledger across restarts (sparse plan)") {
    val root = tmpDir("hard-ledger")
    val t = LakeTable.createOrReplace(spark, root, StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("v", StringType, nullable = true))), Seq("k"), numBuckets = 4)
    // v3 intentionally absent: the old currentSchemaId heuristic re-derived
    // 3 after a restart and re-applied plan(4) — 'column c exists', a
    // permanently poisoned stream
    val plan: Map[Int, Seq[SchemaChange]] = Map(
      2 -> Seq(AddColumn("b", StringType)),
      4 -> Seq(AddColumn("c", StringType)))
    def batch(lsnBase: Long): DataFrame =
      (1 to 10).map(i => (lsnBase + i, "U", 4, s"k$i", s"v$lsnBase"))
        .toDF("lsn", "op", "schema_version", "k", "v")
    CdcPipeline.processBatch(batch(0L), 0L, t, plan, new TableVersions, None)
    assert(LakeTable.metaAt(root).appliedMigrations
      .count(_.startsWith("envelope-v")) == 2)
    // 'restart': a fresh tracker must re-derive 4, not 3
    val restarted = new TableVersions
    assert(restarted.get(root, plan) == 4)
    CdcPipeline.processBatch(batch(100L), 1L, t, plan, restarted, None)
    val cols = t.currentState().columns.toSet
    assert(cols.contains("b") && cols.contains("c"))
  }

  test("out-of-band DDL does not skip envelope evolution steps") {
    val root = tmpDir("hard-oob")
    val t = LakeTable.createOrReplace(spark, root, StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("v", StringType, nullable = true))), Seq("k"), numBuckets = 4)
    // an operator runs a SQL-ALTER-style schema commit BEFORE streaming:
    // the old heuristic counted it as envelope v2 and silently dropped the
    // 'b' column from every event forever
    t.evolveSchema(Seq(AddColumn("x", StringType)))
    val plan: Map[Int, Seq[SchemaChange]] = Map(2 -> Seq(AddColumn("b", StringType)))
    val batch = (1 to 5).map(i => (i.toLong, "U", 2, s"k$i", "v", s"b$i"))
      .toDF("lsn", "op", "schema_version", "k", "v", "b")
    CdcPipeline.processBatch(batch, 0L, t, plan, new TableVersions, None)
    val live = t.currentState().select("k", "b").collect()
    assert(live.length == 5 && live.forall(!_.isNullAt(1)),
      "envelope step v2 was skipped: 'b' values lost")
  }

  test("evolveTo refuses a key-column rename mid-stream, loudly") {
    val t = kvTable(tmpDir("hard-rename"))
    val plan: Map[Int, Seq[SchemaChange]] = Map(2 -> Seq(RenameColumn("k1", "kk")))
    val batch = kvBatch(Seq((1L, "U", "a", 1, "v")))
      .withColumn("schema_version", lit(2))
    val ex = intercept[RuntimeException](
      CdcPipeline.processBatch(batch, 0L, t, plan, new TableVersions, None))
    assert(ex.getMessage.contains("renames key column"), ex.getMessage)
    assert(t.currentState().isEmpty, "refused batch must not commit")
  }

  test("incremental-sync beats cannot collide with past stream epoch ids") {
    // stream epochs 0..4 commit lsns 1..3 (redelivered); a later sync beat
    // sees source maxLsn = 4 — with the old epochId = maxLsn, epoch 4 was
    // already in the ledger, the merge silently no-op'd and the beat
    // stalled forever with the watermark stuck at 3
    val t = LakeTable.createOrReplace(spark, tmpDir("hard-epoch"),
      CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 4)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def env(lsns: Long*): DataFrame = lsns.map(l =>
      (l, ts, "U", 1, s"r$l", s"p$l", s"c$l", "scala", s"content$l"))
      .toDF("lsn", "txn_ts", "op", "schema_version", "repo", "path",
        "commit", "lang", "content")
    val versions = new TableVersions
    Seq(Seq(1L), Seq(2L), Seq(2L), Seq(3L), Seq(3L)).zipWithIndex.foreach {
      case (lsns, epoch) =>
        CdcPipeline.processBatch(env(lsns: _*), epoch.toLong, t, Map.empty,
          versions, None)
    }
    assert(t.meta.committedEpochs.size == 5)
    assert(IncrementalSync.tableWatermark(t) == 3L)
    val logDir = tmpDir("hard-epoch-log")
    env(1L, 2L, 3L, 4L).write.mode("overwrite").parquet(logDir)
    val src = new FileChangeSource(spark, logDir)
    assert(IncrementalSync.syncOnce(src, t) == 1L)
    assert(IncrementalSync.tableWatermark(t) == 4L,
      "beat's merge was swallowed by an epoch-id collision")
    assert(t.currentState().filter(col("repo") === "r4").count() == 1)
    assert(IncrementalSync.syncOnce(src, t) == 0L) // drained
  }

  test("stale detection compares the full payload on any schema") {
    val t = LakeTable.createOrReplace(spark, tmpDir("hard-stale"), StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("v1", StringType, nullable = true),
      StructField("v2", IntegerType, nullable = true))), Seq("k"), numBuckets = 4)
    val log = Seq((1L, "U", "a", "x", 1), (2L, "U", "b", "y", 2))
      .toDF("lsn", "op", "k", "v1", "v2")
    CdcPipeline.processBatch(log, 0L, t, Map.empty, new TableVersions, None)
    // old code: col("content") → AnalysisException on this schema; and a
    // corrupted non-content column was invisible to the verifier
    assert(Reconciler.stale(log, t).count() == 0)
    // corrupt a NON-first payload column out of band (higher lsn, direct merge)
    t.merge(Seq(("a", "x", 99, 10L, "U")).toDF("k", "v1", "v2", "lsn", "op"),
      epochId = 999L)
    val stale = Reconciler.stale(log, t)
    assert(stale.count() == 1, "stale v2 value not detected")
    assert(stale.select("k").head().getString(0) == "a")
  }

  test("streaming router plumbs the fixed-salts override through to each merge") {
    val dir = tmpDir("hard-router-salts")
    val cfg = GenConfig(numEvents = 4000, numRepos = 8, pathsPerRepo = 4,
      commitsPerFile = 2)
    val feed = CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg))
      .withColumn("table",
        when(pmod(xxhash64(col("repo")), lit(2)) === 0, lit("a")).otherwise(lit("b")))
    feed.repartitionByRange(2, col("lsn")).write.mode("overwrite").parquet(s"$dir/log")
    def routes(sub: String, lineage: Boolean = false) = Map(
      "a" -> CdcRouter.RouteTarget(LakeTable.createOrReplace(spark, s"$dir/$sub/a",
        CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 4),
        lineageDir = if (lineage) Some(s"$dir/$sub/a-lineage") else None),
      "b" -> CdcRouter.RouteTarget(LakeTable.createOrReplace(spark, s"$dir/$sub/b",
        CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 4)))
    val schema = StructType(CdcPipeline.envelopeSchema :+
      StructField("table", StringType, nullable = true))
    val salted = routes("salted", lineage = true)
    CdcRouter.run(spark, s"$dir/log", schema, salted, s"$dir/ckpt", salts = 3)
    val plain = routes("plain")
    CdcRouter.processBatch(feed, -1L, plain)
    def dump(t: LakeTable) =
      t.currentState().collect().map(_.toString).sorted.toSeq
    assert(dump(salted("a").table) == dump(plain("a").table))
    assert(dump(salted("b").table) == dump(plain("b").table))
    // the override must REACH the merge, not just produce equal results
    // (equality holds even with salting silently dropped): lineage records
    // the salt count each batch actually deduped with
    val saltsUsed = spark.read.parquet(s"$dir/salted/a-lineage")
      .select("salts_used").distinct().collect().map(_.getInt(0)).toSet
    assert(saltsUsed == Set(3), s"salts_used=$saltsUsed, override not plumbed")
  }
}
