package graft.cdc

import graft.SparkTestBase
import graft.lake._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

class CdcRouterSpec extends SparkTestBase {

  private val cfg = GenConfig(numEvents = 8000, numRepos = 16, pathsPerRepo = 5,
    commitsPerFile = 3)

  /** Two-table feed: every event routes by a deterministic repo hash. */
  private def feed = CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg))
    .withColumn("table",
      when(pmod(xxhash64(col("repo")), lit(2)) === 0, lit("code"))
        .otherwise(lit("docs")))

  // table B drops `content` — per-table projection must hold
  private val docsSchema = StructType(
    CdcPipeline.baseTableSchema.filterNot(_.name == "content"))

  private def freshRoutes(dir: String): Map[String, CdcRouter.RouteTarget] = Map(
    "code" -> CdcRouter.RouteTarget(LakeTable.createOrReplace(spark, s"$dir/code",
      CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 8)),
    "docs" -> CdcRouter.RouteTarget(LakeTable.createOrReplace(spark, s"$dir/docs",
      docsSchema, ChangeEvent.keyCols, numBuckets = 4)))

  private def dump(t: LakeTable): Seq[String] =
    t.currentState().collect().map(_.toString).sorted.toSeq

  test("routed ingest ≡ per-table replays; unrouted events quarantined with reason") {
    val dir = tmpDir("router")
    val withLegacy = feed.withColumn("table",
      when(col("lsn") % 211 === 0, lit("legacy")).otherwise(col("table")))
    val routes = freshRoutes(s"$dir/r")
    CdcRouter.processBatch(withLegacy, -1L, routes,
      quarantineDir = Some(s"$dir/q"))

    // ground truth: each table ingested alone from its filtered slice
    val solo = freshRoutes(s"$dir/solo")
    Seq("code", "docs").foreach { name =>
      CdcPipeline.replayBatch(spark,
        withLegacy.filter(col("table") === name).drop("table"),
        solo(name).table, evolution = Map.empty)
    }
    assert(dump(routes("code").table) == dump(solo("code").table))
    assert(dump(routes("docs").table) == dump(solo("docs").table))
    // projection held: docs table has no content column
    assert(!routes("docs").table.currentState().columns.contains("content"))

    val q = spark.read.parquet(s"$dir/q")
    val nLegacy = withLegacy.filter(col("table") === "legacy").count()
    assert(nLegacy > 0, "fixture produced no unroutable rows — recalibrate")
    assert(q.count() == nLegacy)
    // reason carries the offending discriminator value; the DATA column is
    // folded away so the root reads as one dataset — `table` resurfaces only
    // as the partition column from the `table=__unknown/` directory
    assert(q.select("q_reason").distinct().collect().map(_.getString(0)).toSeq
      == Seq("unknown_table:legacy"))
    assert(q.select("table").distinct().collect().map(_.getString(0)).toSeq
      == Seq("__unknown"))

    // no sink configured → loud failure, nothing committed
    val bare = freshRoutes(s"$dir/bare")
    intercept[IllegalStateException](
      CdcRouter.processBatch(withLegacy, -1L, bare))
    assert(bare("code").table.currentState().isEmpty)
  }

  test("per-target merge-on-read: delta-routed tables reach the COW-routed state") {
    val dir = tmpDir("routermor")
    val f = feed.cache()
    try {
      // two micro-batches so the delta target actually layers, then folds
      val routesMor = Map(
        "code" -> CdcRouter.RouteTarget(LakeTable.createOrReplace(spark,
          s"$dir/mor/code", CdcPipeline.baseTableSchema, ChangeEvent.keyCols,
          numBuckets = 8), delta = true, foldEvery = 2),
        "docs" -> CdcRouter.RouteTarget(LakeTable.createOrReplace(spark,
          s"$dir/mor/docs", docsSchema, ChangeEvent.keyCols, numBuckets = 4)))
      val routesCow = freshRoutes(s"$dir/cow")
      Seq(0L, 1L).foreach { epoch =>
        val half = f.filter(pmod(col("lsn"), lit(2)) === epoch)
        CdcRouter.processBatch(half, epoch, routesMor)
        CdcRouter.processBatch(half, epoch, routesCow)
      }
      assert(dump(routesMor("code").table) == dump(routesCow("code").table))
      assert(dump(routesMor("docs").table) == dump(routesCow("docs").table))
      // the delta target really took the MOR path (and folded on epoch 1);
      // the COW-configured sibling never did
      val ops = routesMor("code").table.meta.snapshots.map(_.operation)
      assert(ops.contains("delta-merge") && ops.contains("fold"), ops.toString)
      assert(!routesCow("code").table.meta.snapshots.map(_.operation)
        .contains("delta-merge"))
    } finally f.unpersist()
  }

  test("non-string discriminator routes by its string rendering — consistently") {
    val dir = tmpDir("router-int")
    // integer discriminator (a numeric table id, as some feeds carry):
    // presence probe, quarantine filter, and slice filter must all agree on
    // the STRING rendering, or typed-vs-cast comparison can diverge
    val intFeed = feed.withColumn("table",
      when(col("table") === "code", lit(1)).otherwise(lit(2)))
    val routes = Map(
      "1" -> CdcRouter.RouteTarget(LakeTable.createOrReplace(spark, s"$dir/t1",
        CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 4)),
      "2" -> CdcRouter.RouteTarget(LakeTable.createOrReplace(spark, s"$dir/t2",
        CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 4)))
    CdcRouter.processBatch(intFeed, -1L, routes,
      quarantineDir = Some(s"$dir/q"))
    assert(routes("1").table.currentState().count() > 0)
    assert(routes("2").table.currentState().count() > 0)
    assert(!new java.io.File(s"$dir/q").exists(),
      "fully-routed int-discriminator batch wrote quarantine output")
    // and the routed split matches the string-rendered ground truth
    val solo1 = LakeTable.createOrReplace(spark, s"$dir/solo1",
      CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 4)
    CdcPipeline.replayBatch(spark,
      intFeed.filter(col("table").cast("string") === "1").drop("table"),
      solo1, evolution = Map.empty)
    assert(dump(routes("1").table) == dump(solo1))
  }

  test("partial-epoch crash replay is exactly-once per table") {
    val dir = tmpDir("router-eo")
    val batch = feed
    val routes = freshRoutes(s"$dir/r")
    // crash simulation: epoch 0 committed only for `code` (routes commit in
    // sorted order, so a crash between the two commits leaves this state)...
    CdcPipeline.processBatch(batch.filter(col("table") === "code").drop("table"),
      0L, routes("code").table, Map.empty, new TableVersions, None)
    // ...then the epoch replays in full: code's ledger skips, docs applies
    CdcRouter.processBatch(batch, 0L, routes)

    val clean = freshRoutes(s"$dir/clean")
    CdcRouter.processBatch(batch, 0L, clean)
    assert(dump(routes("code").table) == dump(clean("code").table),
      "replayed epoch double-applied on the already-committed table")
    assert(dump(routes("docs").table) == dump(clean("docs").table))
    assert(routes("code").table.meta.committedEpochs.size == 1)
  }

  test("streaming router drains a multi-table log to the same state as batch routing") {
    val dir = tmpDir("router-stream")
    feed.repartitionByRange(4, col("lsn"))
      .write.mode("overwrite").parquet(s"$dir/log")
    val schema = StructType(CdcPipeline.envelopeSchema :+
      StructField("table", StringType, nullable = true))
    val routes = freshRoutes(s"$dir/r")
    CdcRouter.run(spark, s"$dir/log", schema, routes, s"$dir/ckpt",
      maxFilesPerTrigger = Some(1))
    assert(routes("code").table.meta.committedEpochs.size == 4)

    val batchRoutes = freshRoutes(s"$dir/b")
    CdcRouter.processBatch(feed, -1L, batchRoutes)
    assert(dump(routes("code").table) == dump(batchRoutes("code").table))
    assert(dump(routes("docs").table) == dump(batchRoutes("docs").table))
  }
}
