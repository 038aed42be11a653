package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
    var cur = tableVersionTracker.get(table.root, plan)
    while (cur < maxV) {
      cur += 1
      plan.get(cur).filter(_.nonEmpty).foreach { changes =>
        // a KEY column rename cannot be applied mid-stream: the stream's
        // envelope schema is fixed at start, so every later batch still
        // carries the OLD name, toMergeInput would fill the new key with
        // null and the merge would refuse — fail here with the real cause
        changes.foreach {
          case RenameColumn(from, _) if table.meta.keyCols.contains(from) =>
            sys.error(s"evolution step $cur renames key column '$from': " +
              "unsupported mid-stream (the envelope schema is fixed at " +
              "start) — stop the stream, rename via the table API, and " +
              "restart with an envelope carrying the new key name")
          case _ => ()
        }
        // each step lands through the migration ledger, so a crash between
        // the schema commit and the tracker update replays as a no-op
        // instead of a 'column exists' poison pill
        table.applyMigration(s"envelope-v$cur", changes)
      }
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

  /** Everything the driver side needs to know about a micro-batch, from ONE
    * column-pruned scan (keys + lsn + schema_version — `content`, the bulk of
    * the bytes, is never read): per-bucket applied counts and lsn bounds
    * (touched-bucket discovery + lineage), the key histogram (salt decision +
    * skew metrics), and the max envelope schema version (evolution trigger).
    * Replaces the three separate probe passes the round-1 hot path paid. */
  case class BatchStats(
      perBucket: Map[Int, (Long, Long, Long)], // bucket -> (rows, lsnMin, lsnMax)
      hist: KeyHistogram,
      maxSchemaVersion: Int,
      invalidRows: Long = 0L) {
    def isEmpty: Boolean = perBucket.isEmpty
  }

  def batchStats(batch: DataFrame, bucket: Column,
      invalid: Column = lit(false),
      keyCols: Seq[String] = ChangeEvent.keyCols): BatchStats = {
    val sv = if (batch.columns.contains("schema_version")) col("schema_version")
      else lit(1)
    // Two-level aggregation: per (bucket, key) first — its partial (map-side)
    // phase collapses hot keys before the shuffle — then per bucket. The key
    // is a 64-bit hash, NOT the string triple: the histogram is advisory
    // (salt sizing + skew metrics), a ~zero probability of hash collision is
    // fine, and fixed-width group keys shuffle ~4× fewer bytes and compare
    // without string equality. Malformed rows (per `invalid`) are routed to
    // pseudo-bucket −1 IN THE SAME PASS — a valid batch pays nothing for
    // quarantine detection, and the per-bucket stats that feed merge's
    // precomputed plan never count rows that will be filtered out.
    val perKey = batch
      .groupBy(when(invalid, lit(-1)).otherwise(bucket).as("__b"),
        xxhash64(keyCols.map(col): _*).as("__kh"))
      .agg(count(lit(1)).as("c"), min(coalesce(col("lsn"), lit(-1L))).as("mn"),
        max(coalesce(col("lsn"), lit(-1L))).as("mx"), max(sv).as("sv"))
    val rows = perKey.groupBy(col("__b"))
      .agg(sum(col("c")).as("cnt"), count(lit(1)).as("keys"),
        max(col("c")).as("maxk"), min(col("mn")).as("mn"),
        max(col("mx")).as("mx"), max(col("sv")).as("sv"))
      .collect()
    val (bad, good) = rows.partition(_.getInt(0) == -1)
    val invalidRows = bad.map(_.getLong(1)).sum
    if (good.isEmpty)
      return BatchStats(Map.empty, KeyHistogram(0, 0, 0), 1, invalidRows)
    val perBucket = good.map(r =>
      r.getInt(0) -> (r.getLong(1), r.getLong(4), r.getLong(5))).toMap
    val hist = KeyHistogram(
      distinctKeys = good.map(_.getLong(2)).sum, // each key lives in exactly one bucket
      maxKeyCount = good.map(_.getLong(3)).max,
      totalRows = good.map(_.getLong(1)).sum)
    BatchStats(perBucket, hist, good.map(_.getInt(6)).max, invalidRows)
  }

  /** Why a change envelope cannot be applied (null = valid): a null lsn has
    * no place in the LWW order, an unknown op has no merge action, a null
    * key column cannot address a row. The predicate is cheap enough to ride
    * the stats probe — see [[batchStats]]. */
  def quarantineReason(keyCols: Seq[String] = ChangeEvent.keyCols): Column = {
    val nullKey = keyCols.map(col(_).isNull).reduce(_ || _)
    when(col("lsn").isNull, "null_lsn")
      .when(col("op").isNull || !col("op").isin("I", "U", "D"), "bad_op")
      .when(nullKey, "null_key")
  }

  /** One micro-batch: evolve schema if the batch crosses a version bump →
    * skew-aware dedup decision (auto-salt from the key histogram, or a
    * fixed `salts` override) → idempotent MERGE (whose single LWW
    * aggregation is simultaneously the within-batch dedup and the merge
    * against stored state) → lineage + skew metrics. */
  def processBatch(batch: DataFrame, epochId: Long, table: LakeTable,
      evolution: Map[Int, Seq[SchemaChange]], versions: TableVersions,
      lineageDir: Option[String], salts: Int = 0,
      autoSaltThreshold: Long = 500000L,
      views: Option[ViewMaintainer] = None,
      compactEvery: Int = 0,
      quarantineDir: Option[String] = None,
      delta: Boolean = false,
      foldEvery: Int = 0): Unit = {
    val t0 = System.nanoTime()
    val phaseLog = sys.env.contains("GRAFT_PHASE_LOG")
    def phase[A](name: String)(f: => A): A = {
      val p0 = System.nanoTime(); val r = f
      if (phaseLog) println(f"[phase] $name%-10s ${(System.nanoTime() - p0) / 1e9}%6.2f s")
      r
    }
    // ONE column-pruned probe pass per batch (was three in round 1: emptiness
    // + max schema_version, key histogram, per-bucket applied-stats inside
    // merge). Everything driver-side decisions need comes out of it —
    // including the malformed-row count (pseudo-bucket −1), so the common
    // all-valid batch detects quarantine for free.
    // ONE metadata load per batch: keyCols, constraints and bucketing must
    // come from the SAME snapshot (and each .meta call is a disk load)
    val m0 = table.meta
    val keyCols = m0.keyCols
    // envelope validity first (null lsn/key, bad op), then the table's
    // declared constraints — violating events dead-letter with
    // constraint:<name> instead of failing the stream, riding the SAME
    // stats probe (zero extra cost for clean batches; deletes exempt)
    val reason = table.applicableConstraints(batch.columns.toSeq, m0)
      .foldLeft(quarantineReason(keyCols)) { case (r, (cond, name)) =>
        r.when(col("op") =!= "D" && cond, s"constraint:$name")
      }
    // bucket stats hash the keys AFTER casting to their declared types,
    // exactly as merge does (hash(5: Int) != hash(5L: Long)): an uncast
    // probe could mark bucket A touched while merge writes bucket B,
    // leaving B's stored file un-reconciled
    val castBucket = {
      val byName = m0.currentSchema.columns.map(c => c.name -> c).toMap
      pmod(hash(keyCols.map(k => byName.get(k)
        .map(c => col(k).cast(c.dataType)).getOrElse(col(k))): _*),
        lit(m0.numBuckets))
    }
    val stats = phase("stats")(
      batchStats(batch, castBucket, invalid = reason.isNotNull, keyCols = keyCols))
    // Dead-letter path: malformed envelopes either land in the quarantine
    // sink (one idempotent overwrite per epoch — crash-replay safe) or fail
    // the batch loudly. They are NEVER silently merged: a null key would
    // address no row and a null lsn would corrupt the LWW order.
    if (stats.invalidRows > 0) quarantineDir match {
      case Some(dir) => phase("quarantine") {
        batch.withColumn("q_reason", reason).filter(col("q_reason").isNotNull)
          .write.mode("overwrite").parquet(s"$dir/epoch=$epochId")
      }
      case None => throw new IllegalStateException(
        s"${stats.invalidRows} malformed change event(s) in epoch $epochId " +
          "and no quarantine sink configured (pass quarantineDir to dead-letter them)")
    }
    val cleanBatch = if (stats.invalidRows > 0) batch.filter(reason.isNull) else batch
    if (stats.isEmpty) return
    val versionBefore = versions.get(table.root, evolution)
    val planExhausted = evolution.isEmpty || versionBefore >= evolution.keys.max
    if (!planExhausted) evolveTo(stats.maxSchemaVersion, table, evolution, versions)
    // the precomputed touched-bucket set stays valid across evolution:
    // evolveTo refuses key-column renames mid-stream (the one change that
    // could move bucket assignment), and bucket count is rebucket-only

    val hist = stats.hist
    val effectiveSalts =
      if (salts > 1) salts
      else hist.saltsFor(stormThreshold = autoSaltThreshold, targetPerSalt = autoSaltThreshold / 4)
    val deduped = if (effectiveSalts > 1)
      Dedup.lwwDf(cleanBatch, keyCols, effectiveSalts)
    else cleanBatch

    // lineage row counts are change events routed to the bucket (pre-dedup):
    // the number the source delivered, which is what throughput reports mean
    val lineage = phase("merge")(table.merge(toMergeInput(deduped, table), epochId,
      precomputedStats = Some(stats.perBucket), delta = delta))
    // view refresh runs UNCONDITIONALLY for non-empty batches: if the process
    // crashed after the base commit but before the refresh, the replayed
    // epoch's merge is a no-op (None) — skipping refresh then would leave the
    // views stale forever in a drained replay. refreshAll is idempotent per
    // epoch via each view's own ledger, so re-running it costs a no-op.
    views.foreach(_.refreshAll(epochId))
    // scheduled layout maintenance (reference analogue: Postgres autovacuum
    // keeps the destination compact without operator action): every Nth
    // epoch, bin-pack the small files continuous ingest leaves behind.
    // Layout-only + idempotent (a replayed epoch's second compact finds
    // nothing small and no-ops), so it composes with exactly-once replay.
    if (compactEvery > 0 && epochId >= 0 && (epochId + 1) % compactEvery == 0)
      phase("compact")(table.compact())
    // merge-on-read cadence: delta commits keep each beat's write ∝ batch;
    // every Nth epoch the accumulated layers fold back into base files
    // (read amplification repaid off the hot path — Hudi's
    // ingest/compaction split). Layout-only + idempotent like compact.
    if (foldEvery > 0 && epochId >= 0 && (epochId + 1) % foldEvery == 0)
      phase("fold")(table.foldDeltas())
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
          .withColumn("rows_quarantined", lit(stats.invalidRows))
        rows.coalesce(1).write.mode("append").parquet(dir)
      }
    }
  }

  /** Start streaming a change-log parquet directory into the table
    * (non-blocking). `checkpoint` makes the run resumable: offsets live
    * there, applied epochs live in the table's snapshot log.
    *
    * `trigger` selects the lifecycle: `Trigger.AvailableNow()` drains the
    * bounded log and terminates (replay); `Trigger.ProcessingTime(...)` is
    * the reference's scheduled beat (`celery_config.py:24`: every 600 s) —
    * the query keeps tailing the growing log until stopped. */
  def start(spark: SparkSession, logDir: String, table: LakeTable,
      checkpoint: String, lineageDir: Option[String] = None,
      evolution: Map[Int, Seq[SchemaChange]] = defaultEvolution,
      maxFilesPerTrigger: Option[Int] = None, salts: Int = 0,
      trigger: Trigger = Trigger.AvailableNow(),
      views: Option[ViewMaintainer] = None,
      compactEvery: Int = 0,
      quarantineDir: Option[String] = None,
      delta: Boolean = false,
      foldEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(envelopeSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    startFrom(reader.parquet(logDir), table, checkpoint, lineageDir,
      evolution, salts, trigger, views, compactEvery, quarantineDir,
      delta = delta, foldEvery = foldEvery)
  }

  /** Source-agnostic streaming entry: any envelope-schema stream (the
    * native parquet tail, a [[DebeziumFileSource]].stream decode, a Kafka
    * value decode) drives the same foreachBatch pipeline.
    *
    * `cacheBatches` persists each micro-batch for the duration of its
    * processing. Leave OFF for columnar sources (parquet re-scans are
    * pruned and near-free; caching only costs memory) and turn ON when
    * the source decode is expensive per pass — a JSON/Avro parse would
    * otherwise re-run for every pass the pipeline makes over the batch
    * (stats probe, merge, lineage). */
  def startFrom(stream: DataFrame, table: LakeTable,
      checkpoint: String, lineageDir: Option[String] = None,
      evolution: Map[Int, Seq[SchemaChange]] = defaultEvolution,
      salts: Int = 0,
      trigger: Trigger = Trigger.AvailableNow(),
      views: Option[ViewMaintainer] = None,
      compactEvery: Int = 0,
      quarantineDir: Option[String] = None,
      cacheBatches: Boolean = false,
      delta: Boolean = false,
      foldEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val versions = new TableVersions
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val b = if (cacheBatches) batch.persist() else batch
        try processBatch(b, epochId, table, evolution, versions, lineageDir,
          salts, views = views, compactEvery = compactEvery,
          quarantineDir = quarantineDir, delta = delta, foldEvery = foldEvery)
        finally if (cacheBatches) b.unpersist()
      }
      .start()
  }

  /** Blocking replay: run to termination (AvailableNow drains and returns). */
  def run(spark: SparkSession, logDir: String, table: LakeTable,
      checkpoint: String, lineageDir: Option[String] = None,
      evolution: Map[Int, Seq[SchemaChange]] = defaultEvolution,
      maxFilesPerTrigger: Option[Int] = None, salts: Int = 0,
      trigger: Trigger = Trigger.AvailableNow(),
      views: Option[ViewMaintainer] = None,
      compactEvery: Int = 0,
      quarantineDir: Option[String] = None,
      delta: Boolean = false,
      foldEvery: Int = 0): Unit =
    start(spark, logDir, table, checkpoint, lineageDir, evolution,
      maxFilesPerTrigger, salts, trigger, views, compactEvery, quarantineDir,
      delta = delta, foldEvery = foldEvery)
      .awaitTermination()

  /** Batch replay of a bounded log (same code path as one giant micro-batch). */
  def replayBatch(spark: SparkSession, log: DataFrame, table: LakeTable,
      evolution: Map[Int, Seq[SchemaChange]] = defaultEvolution, salts: Int = 0,
      quarantineDir: Option[String] = None, delta: Boolean = false): Unit = {
    val versions = new TableVersions
    processBatch(log, -1L, table, evolution, versions, None, salts,
      quarantineDir = quarantineDir, delta = delta)
  }
}

/** Tracks the envelope schema_version each table has been evolved to.
  * Persisted in the table's migration ledger (`envelope-v<N>` ids recorded
  * by [[CdcPipeline.evolveTo]] in the SAME commit as the schema change), so
  * a restart recovers the exact applied version — sparse plans (gaps with
  * no changes) and out-of-band schema commits (operator migrations, SQL
  * ALTERs, mirror syncs) do not skew it the way a schema-id count would:
  * the ledger is the ONLY authority. The failure mode this buys: if an
  * operator hand-applies an envelope step's DDL out of band (ALTER ADD of
  * the same column), the replayed step fails loudly ('column exists')
  * instead of silently skipping a different step — recover by recording
  * `applyMigration("envelope-v<N>", Nil)` for the hand-applied version. */
class TableVersions {
  private val m = scala.collection.concurrent.TrieMap.empty[String, Int]
  def get(root: String, plan: Map[Int, Seq[SchemaChange]]): Int =
    m.getOrElseUpdate(root, {
      // metaAt is session-free file I/O — no SparkSession needed (or
      // allowed: this can run before the session is fully wired)
      val applied = LakeTable.metaAt(root).appliedMigrations.toSet
      // highest version whose every non-empty step at or below it is in
      // the ledger (empty steps need no commit to count as applied)
      val vmax = plan.keys.foldLeft(1)(math.max)
      (2 to vmax).takeWhile(v => plan.get(v).forall(_.isEmpty) ||
        applied.contains(s"envelope-v$v")).lastOption.getOrElse(1)
    })
  def set(root: String, v: Int): Unit = m.put(root, v)
}
