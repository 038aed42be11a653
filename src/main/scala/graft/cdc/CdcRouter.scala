package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.lake._

/** Multi-table CDC routing: one LSN-ordered change log carrying events for
  * MANY tables (the Debezium/WAL reality — the reference syncs fact_studies,
  * dim_technicians, organizations… each from its own poll, but a real feed
  * interleaves them) fans out to per-table LWW merges in one ingest pass.
  *
  * Semantics:
  *  - events route by a discriminator column (default `table`);
  *  - every routed slice goes through the full [[CdcPipeline.processBatch]]
  *    path — schema evolution, salting, quarantine, lineage — against its
  *    own [[LakeTable]];
  *  - exactly-once is PER TABLE: all targets commit under the same epoch id,
  *    each against its own epoch ledger. A crash between two tables' commits
  *    replays the epoch; the table that already applied it no-ops (ledger
  *    skip) and the one that didn't applies — per-table effectively-once,
  *    cross-table eventually consistent within one replayed epoch;
  *  - events whose discriminator matches no route are dead-lettered to
  *    `<quarantineDir>/table=__unknown/epoch=N` (idempotent overwrite per
  *    epoch, like the malformed-row path) or fail the batch loudly when no
  *    quarantine sink is configured — never silently dropped.
  *
  * Scale note: routing is T filtered passes over the micro-batch (T = number
  * of routes), each pushed down as a `table = 't'` scan predicate. A
  * single-pass multi-sink write is not expressible without a custom sink;
  * at warehouse scale the log is usually already partitioned by table dir,
  * which turns each pass into partition pruning.
  */
object CdcRouter {

  /** One routing target: the table plus the per-table ingest state that must
    * survive across micro-batches (schema-version tracker, evolution plan,
    * lineage sink). `delta`/`foldEvery` opt the target into merge-on-read
    * beats — the routed-feed case is where COW write amplification bites
    * hardest, since each beat's per-table slice is tiny but still rewrites
    * that table's touched buckets. */
  final case class RouteTarget(
      table: LakeTable,
      evolution: Map[Int, Seq[SchemaChange]] = Map.empty,
      lineageDir: Option[String] = None,
      delta: Boolean = false,
      foldEvery: Int = 0) {
    private[cdc] val versions = new TableVersions
  }

  /** Route one heterogeneous micro-batch to its targets. Deterministic
    * order (sorted route key) so replays commit tables in the same
    * sequence. */
  def processBatch(batch: DataFrame, epochId: Long,
      routes: Map[String, RouteTarget],
      discriminator: String = "table",
      quarantineDir: Option[String] = None,
      salts: Int = 0): Unit = {
    require(routes.nonEmpty, "router needs at least one route")
    require(batch.columns.contains(discriminator),
      s"batch has no discriminator column '$discriminator'")
    // Routing compares the discriminator by its STRING RENDERING (route
    // keys are strings), and every comparison below — presence, quarantine,
    // slicing — uses the same cast("string") so they can never disagree on
    // a non-string column (typed `===` would implicitly cast the KEY to the
    // column type, a different relation: decimal 1.50 === "1.5" is true,
    // but renders as "1.50" ∉ routes).
    val disc = col(discriminator).cast("string")
    // ONE column-pruned pass over the discriminator tells us everything the
    // routing plan needs: which routes this batch actually touches (absent
    // tables skip their filtered pass entirely — a batch hitting 2 of 20
    // routes runs 2 slice scans, not 20) and whether any events are
    // unrouted. (The previous `unknown.isEmpty` probe was worse than it
    // looked: limit-1 can't short-circuit when there ARE no unknowns, so
    // the common clean batch paid a full scan for a boolean.)
    val present: Map[Option[String], Long] = batch
      .groupBy(disc.as("_t"))
      .agg(count(lit(1)).as("_n")).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val unknownTables = present.keySet.filter(_.forall(k => !routes.contains(k)))
    if (unknownTables.nonEmpty) quarantineDir match {
      case Some(dir) =>
        // the discriminator folds into q_reason and leaves the data columns:
        // keeping it as a column would collide with the `table=` partition
        // directory and make the quarantine root unreadable as one dataset
        batch.filter(disc.isNull || !disc.isin(routes.keys.toSeq: _*))
          .withColumn("q_reason", concat(lit("unknown_table:"),
            coalesce(disc, lit("null"))))
          .drop(discriminator)
          .write.mode("overwrite").parquet(s"$dir/table=__unknown/epoch=$epochId")
      case None => throw new IllegalStateException(
        s"epoch $epochId carries events for unrouted table(s) " +
          s"${unknownTables.map(_.getOrElse("null")).toSeq.sorted.mkString(", ")} " +
          "and no quarantine sink is configured")
    }
    routes.toSeq.sortBy(_._1)
      .filter { case (name, _) => present.contains(Some(name)) }
      .foreach { case (name, rt) =>
        val slice = batch.filter(disc === lit(name)).drop(discriminator)
        CdcPipeline.processBatch(slice, epochId, rt.table, rt.evolution,
          rt.versions, rt.lineageDir, salts = salts,
          quarantineDir = quarantineDir.map(d => s"$d/table=$name"),
          delta = rt.delta, foldEvery = rt.foldEvery)
      }
  }

  /** Stream a multi-table change log into its targets (non-blocking).
    * `schema` is the log's envelope schema INCLUDING the discriminator
    * column. Offsets checkpoint once for the whole feed; per-table epoch
    * ledgers split that single offset stream into per-table exactly-once. */
  def start(spark: SparkSession, logDir: String, schema: StructType,
      routes: Map[String, RouteTarget], checkpoint: String,
      discriminator: String = "table",
      quarantineDir: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None,
      salts: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(logDir).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        processBatch(batch, epochId, routes, discriminator, quarantineDir,
          salts = salts)
      }
      .start()
  }

  /** Blocking drain (AvailableNow replay). */
  def run(spark: SparkSession, logDir: String, schema: StructType,
      routes: Map[String, RouteTarget], checkpoint: String,
      discriminator: String = "table",
      quarantineDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None,
      salts: Int = 0): Unit =
    start(spark, logDir, schema, routes, checkpoint, discriminator,
      quarantineDir, Trigger.AvailableNow(), maxFilesPerTrigger, salts)
      .awaitTermination()
}
