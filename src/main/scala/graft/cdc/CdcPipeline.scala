package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.lake._

/** The CDC engine: change-feed tail → LWW dedup → exactly-once MERGE into a
  * [[LakeTable]], with per-partition lineage and throughput metrics emitted
  * each micro-batch.
  *
  * Reference lifecycle analogue (SURVEY.md §3.1): Celery beat every 600 s →
  * watermark read → extract → upsert → lineage record. Here:
  * Structured Streaming checkpoint replaces the `sync_records` watermark
  * table (ST2), `Trigger.AvailableNow` drains a bounded log (replay), and
  * the epochId ledger inside the table's snapshot log turns foreachBatch's
  * at-least-once into exactly-once (ST5).
  */
object CdcPipeline {

  /** Envelope → merge-input normalization for a given table schema: selects
    * the table's data columns (missing ones as null) + lsn + op. */
  def toMergeInput(batch: DataFrame, table: LakeTable): DataFrame = {
    val dataCols = table.meta.currentSchema.columns
    val cols = dataCols.map { c =>
      if (batch.columns.contains(c.name)) col(c.name).cast(c.dataType).as(c.name)
      else lit(null).cast(c.dataType).as(c.name)
    } ++ Seq(col("lsn"), col("op"))
    batch.select(cols: _*)
  }

  /** Evolve the table if this batch contains envelopes from a newer schema
    * version, per the evolution plan (version -> DDL ops). Reference
    * analogue: yoyo migration runner (`cron_tasks.py:31-59`). */
  def evolveTo(maxV: Int, table: LakeTable,
      plan: Map[Int, Seq[SchemaChange]], tableVersionTracker: TableVersions): Unit = {
    var cur = tableVersionTracker.get(table.root)
    while (cur < maxV) {
      cur += 1
      plan.get(cur).filter(_.nonEmpty).foreach(table.evolveSchema)
      tableVersionTracker.set(table.root, cur)
    }
  }

  /** Default evolution plan matching [[ChangeLogGen]]'s envelope versions. */
  val defaultEvolution: Map[Int, Seq[SchemaChange]] = Map(
    2 -> Seq(AddColumn("branch", StringType)),
    3 -> Seq(AddColumn("size_bytes", IntegerType)),
    4 -> Seq(WidenType("size_bytes", LongType)))

  /** Envelope column name mapping for the generator's Dataset[ChangeEvent]. */
  def envelopeDf(events: Dataset[ChangeEvent]): DataFrame =
    events.toDF()
      .withColumnRenamed("txnTs", "txn_ts")
      .withColumnRenamed("schemaVersion", "schema_version")
      .withColumnRenamed("sizeBytes", "size_bytes")

  val envelopeSchema: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("txn_ts", TimestampType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("schema_version", IntegerType, nullable = false),
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("content", StringType, nullable = true),
    StructField("branch", StringType, nullable = true),
    StructField("size_bytes", LongType, nullable = true)))

  val baseTableSchema: StructType = StructType(Seq(
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("content", StringType, nullable = true)))

  /** Per-key histogram summary of a batch (column-pruned: keys only, no
    * payload). Drives the salt decision and is emitted with the lineage so
    * skew is VISIBLE per batch (north rule; SURVEY.md ST9: "salt count
    * derived from per-key batch histograms"). */
  case class KeyHistogram(distinctKeys: Long, maxKeyCount: Long, totalRows: Long) {
    /** Salts sized so a storm on one key splits into ~targetPerSalt-row
      * partial groups; 0 = unsalted (the common case: partial aggregation
      * already collapses per-partition duplicates map-side). */
    def saltsFor(stormThreshold: Long, targetPerSalt: Long): Int =
      if (maxKeyCount <= stormThreshold) 0
      else math.min(64, math.max(2, (maxKeyCount / targetPerSalt).toInt))
  }

  def keyHistogram(batch: DataFrame): KeyHistogram = {
    val r = batch.groupBy(ChangeEvent.keyCols.map(col): _*)
      .agg(count(lit(1)).as("c"))
      .agg(count(lit(1)), max(col("c")), sum(col("c"))).head()
    if (r.isNullAt(1)) KeyHistogram(0, 0, 0)
    else KeyHistogram(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** One micro-batch: evolve schema if the batch crosses a version bump →
    * skew-aware dedup decision (auto-salt from the key histogram, or a
    * fixed `salts` override) → idempotent MERGE (whose single LWW
    * aggregation is simultaneously the within-batch dedup and the merge
    * against stored state) → lineage + skew metrics. */
  def processBatch(batch: DataFrame, epochId: Long, table: LakeTable,
      evolution: Map[Int, Seq[SchemaChange]], versions: TableVersions,
      lineageDir: Option[String], salts: Int = 0,
      autoSaltThreshold: Long = 500000L): Unit = {
    val t0 = System.nanoTime()
    // One summary pass replaces a separate isEmpty job + max(schema_version)
    // scan — and is skipped entirely once every planned evolution step has
    // been applied (the steady state after bootstrap: zero extra passes).
    val planExhausted = evolution.isEmpty ||
      versions.get(table.root) >= evolution.keys.max
    if (!planExhausted) {
      val summary = batch.agg(count(lit(1)), max(col("schema_version"))).head()
      if (summary.getLong(0) == 0L) return
      evolveTo(summary.getInt(1), table, evolution, versions)
    }

    // skew probe only when lineage is on or auto-salt can trigger: keys-only
    // scan, payload column pruned at the source
    val hist = if (lineageDir.isDefined || salts == 0) keyHistogram(batch)
      else KeyHistogram(-1, -1, -1)
    val effectiveSalts =
      if (salts > 1) salts
      else hist.saltsFor(stormThreshold = autoSaltThreshold, targetPerSalt = autoSaltThreshold / 4)
    val deduped = if (effectiveSalts > 1)
      Dedup.lwwDf(batch, ChangeEvent.keyCols, effectiveSalts)
    else batch

    val lineage = table.merge(toMergeInput(deduped, table), epochId)
    lineage.foreach { lin =>
      lineageDir.foreach { dir =>
        val spark = batch.sparkSession
        import spark.implicits._
        val elapsedSec = (System.nanoTime() - t0) / 1e9
        val rows = lin.toDF()
          .withColumn("events_per_sec",
            lit(lin.map(_.rowsApplied).sum / math.max(elapsedSec, 1e-9)))
          .withColumn("distinct_keys", lit(hist.distinctKeys))
          .withColumn("max_key_count", lit(hist.maxKeyCount))
          .withColumn("salts_used", lit(effectiveSalts))
        rows.coalesce(1).write.mode("append").parquet(dir)
      }
    }
  }

  /** Stream a change-log parquet directory into the table. Returns after
    * draining all available input (Trigger.AvailableNow). `checkpoint`
    * makes the run resumable: offsets live there, applied epochs live in
    * the table's snapshot log. */
  def run(spark: SparkSession, logDir: String, table: LakeTable,
      checkpoint: String, lineageDir: Option[String] = None,
      evolution: Map[Int, Seq[SchemaChange]] = defaultEvolution,
      maxFilesPerTrigger: Option[Int] = None, salts: Int = 0): Unit = {
    val versions = new TableVersions
    val reader = spark.readStream.schema(envelopeSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(logDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        processBatch(batch, epochId, table, evolution, versions, lineageDir, salts)
      }
      .start()
    q.awaitTermination()
  }

  /** Batch replay of a bounded log (same code path as one giant micro-batch). */
  def replayBatch(spark: SparkSession, log: DataFrame, table: LakeTable,
      evolution: Map[Int, Seq[SchemaChange]] = defaultEvolution, salts: Int = 0): Unit = {
    val versions = new TableVersions
    processBatch(log, -1L, table, evolution, versions, None, salts)
  }
}

/** Tracks the envelope schema_version each table has been evolved to.
  * Persisted implicitly: on restart it is re-derived from the table's
  * current schema (count of applied evolution steps). */
class TableVersions {
  private val m = scala.collection.concurrent.TrieMap.empty[String, Int]
  def get(root: String): Int = m.getOrElseUpdate(root, {
    // schemaId starts at 1 and each applied envelope version bumps it by
    // at most one metadata commit, so the table's currentSchemaId equals
    // the last applied envelope version with a non-empty change list.
    LakeTable.forPath(null, root).meta.currentSchemaId
  })
  def set(root: String, v: Int): Unit = m.put(root, v)
}
