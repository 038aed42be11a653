package graft.lake

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** A keyed, snapshot-versioned lake table over Parquet with copy-on-write
  * MERGE at hash-bucket granularity, exactly-once epoch commits, in-place
  * schema evolution and time travel. See [[TableMeta]] for the format.
  *
  * Spark-first design notes:
  *  - MERGE is expressed as a declarative plan — union(existing-bucket scan,
  *    change batch) → hash aggregate `max_by(row, (lsn, opPriority))` per
  *    key — so Catalyst gives partial aggregation, WholeStageCodegen and AQE
  *    for free; only the commit protocol is custom code.
  *  - Only buckets actually present in a batch are read and rewritten
  *    (partition pruning by manifest), so merge cost scales with batch
  *    key-coverage, not table size.
  *  - Deletes always persist a tombstone (`_deleted=true`) — required for
  *    correctness when an out-of-order older update can arrive in a later
  *    micro-batch (the tombstone's LSN must keep outranking it). This also
  *    mirrors the reference's soft-delete views
  *    (`migrations/20230426_01_BozYM.sql:10`). `vacuum(upToLsn)` physically
  *    drops tombstones once the stream watermark guarantees nothing older
  *    can still arrive.
  */
class LakeTable private (val spark: SparkSession, val root: String,
    private[graft] val commitIo: CommitIo) {
  import LakeTable._

  def meta: TableMeta = load(root)

  private def dataRoot = Paths.get(root, "data")
  private def metaDir = Paths.get(root, "metadata")

  // ---------------------------------------------------------------- schema

  def schema: StructType = meta.currentSchema.toStruct

  /** Apply schema changes as a metadata-only commit (no data rewrite; old
    * files stay readable through column-ID mapping). */
  def evolveSchema(changes: Seq[SchemaChange]): Unit =
    retryCommit(m => applyChanges(m, changes))

  /** Record a SQL-declared maintained-view definition in table metadata
    * (pure metadata commit — the materialization happens on refresh; see
    * [[MaintainedViewDef]]). Validates columns against the CURRENT schema
    * and the name against the same path-safety rule as catalog tables. */
  def createMaintainedView(d: MaintainedViewDef): Unit = {
    require(d.name.matches("[A-Za-z0-9_]+"),
      s"illegal view name '${d.name}' (allowed: [A-Za-z0-9_]+)")
    require(Set("rollup", "distinct_sketch").contains(d.kind),
      s"unknown view kind '${d.kind}' (rollup | distinct_sketch)")
    require(d.groupCols.nonEmpty, "view needs at least one group column")
    require(d.kind != "distinct_sketch" || d.aggCols.nonEmpty,
      "distinct_sketch view needs at least one distinct column")
    require(d.lgK >= 4 && d.lgK <= 21, s"lgK ${d.lgK} outside DataSketches [4,21]")
    retryCommit { m =>
      val have = m.currentSchema.columns.map(_.name).toSet
      val want = d.groupCols ++ d.aggCols.map(_.src)
      require(want.forall(have.contains),
        s"view '${d.name}' references missing columns: " +
          want.filterNot(have.contains).mkString(", "))
      val aliases = d.aggCols.map(_.alias) ++
        (if (d.kind == "rollup") Seq(d.countAlias)
         // distinct_sketch also derives '<alias>_hll' sketch columns —
         // they collide with user aliases just as hard
         else d.aggCols.map(a => s"${a.alias}_hll"))
      require((d.groupCols ++ aliases).distinct.size ==
        d.groupCols.size + aliases.size,
        s"view '${d.name}' has duplicate output column names " +
          "(note: each distinct alias also claims '<alias>_hll')")
      require(!m.maintainedViews.exists(_.name == d.name),
        s"maintained view '${d.name}' already defined")
      m.copy(maintainedViews = m.maintainedViews :+ d)
    }
  }

  /** Remove a maintained-view definition; returns false if it didn't exist.
    * The materialized view table (a derived artifact) is the caller's to
    * delete — the SQL procedure does both. */
  def dropMaintainedView(name: String): Boolean = {
    var existed = false
    retryCommit { m =>
      existed = m.maintainedViews.exists(_.name == name)
      m.copy(maintainedViews = m.maintainedViews.filterNot(_.name == name))
    }
    existed
  }

  /** Apply a named migration exactly once: the schema change and the ledger
    * entry land in one atomic metadata commit (reference: yoyo applies the
    * DDL and records the id in `_yoyo_migration` in one transaction,
    * `cron_tasks.py:31-59`). Returns false if `id` was already applied. */
  def applyMigration(id: String, changes: Seq[SchemaChange]): Boolean =
    retryCommitIf { m =>
      if (m.appliedMigrations.contains(id)) None
      else Some(applyChanges(m, changes)
        .copy(appliedMigrations = m.appliedMigrations :+ id))
    }

  private def applyChanges(m: TableMeta, changes: Seq[SchemaChange]): TableMeta = {
    var cols = m.currentSchema.columns
    var keyCols = m.keyCols
    var nextId = m.schemas.flatMap(_.columns.map(_.id)).max + 1
    changes.foreach {
      case AddColumn(name, dt, nullable) =>
        require(!cols.exists(_.name == name), s"column $name exists")
        cols = cols :+ ColumnDef(nextId, name, dt.json, nullable)
        nextId += 1
      case RenameColumn(from, to) =>
        require(cols.exists(_.name == from), s"no column $from")
        require(!cols.exists(_.name == to), s"column $to exists")
        cols = cols.map(c => if (c.name == from) c.copy(name = to) else c)
        // a key column rename must land in keyCols in the SAME commit, or
        // every later read/merge (bucketExpr resolves keys by name) fails
        keyCols = keyCols.map(k => if (k == from) to else k)
      case WidenType(name, to) =>
        // widening a KEY column changes bucket routing for every key
        // (hash(5: Int) != hash(5L: Long)) while stored files keep their
        // old-layout bucket numbers — the merge would stop reconciling
        // against stored rows and point lookups would prune to the wrong
        // bucket. Rebucket-after-widen can't heal it either (the widen
        // lands first). Refused, like dropping a key column.
        require(!keyCols.contains(name),
          s"cannot widen key column $name: the key hash routes bucket " +
            "placement and would change for every stored row")
        val cur = cols.find(_.name == name).getOrElse(sys.error(s"no column $name"))
        require(canWiden(cur.dataType, to), s"illegal widen ${cur.dataType} -> $to")
        cols = cols.map(c => if (c.name == name) c.copy(dataTypeJson = to.json) else c)
      case DropColumn(name) =>
        require(!m.keyCols.contains(name), s"cannot drop key column $name")
        cols = cols.filterNot(_.name == name)
    }
    val newSchema = SchemaVersion(m.currentSchemaId + 1, cols)
    m.copy(schemas = m.schemas :+ newSchema, currentSchemaId = newSchema.schemaId,
      keyCols = keyCols)
  }

  /** Child snapshot of the validated head `m`: inherits the parent's
    * excluded-lsn spans verbatim — every commit carries its lineage's lsn
    * coverage forward, so [[TableMeta]] consumers can read consistency off
    * the current snapshot alone (see [[Snapshot.excludedLsns]]). All commit
    * paths except rollback (which rebuilds the list) go through here. */
  private def childSnapshot(m: TableMeta, snapshotId: Long, epochId: Long,
      operation: String, files: Seq[DataFileMeta]): Snapshot =
    Snapshot(snapshotId, m.currentSnapshotId, epochId, m.currentSchemaId,
      operation, files, System.currentTimeMillis(),
      excludedLsns = m.currentSnapshot.map(_.excludedLsns).getOrElse(Seq.empty))

  /** Optimistic commit that `f` may abort (None). Returns true iff OUR
    * commit landed — a racer that loses and then aborts on reload gets
    * false (the distinction is what makes applyMigration's return value an
    * exactly-once signal, not just the state). */
  private def retryCommitIf(f: TableMeta => Option[TableMeta]): Boolean = {
    var attempts = 0
    while (true) {
      val m = load(root)
      f(m) match {
        case None => return false // aborted: someone else already did it
        case Some(next) =>
          if (tryWriteVersion(metaDir, next.copy(version = m.version + 1), commitIo))
            return true
      }
      attempts += 1
      if (attempts > 5) sys.error(s"commit conflict persisted after $attempts attempts at $root")
    }
    false
  }

  /** Commit-time guard for every path that allocates its snapshot id from a
    * pre-commit `meta` read: with write branches, a concurrent BRANCH commit
    * allocates from the same id space without moving `currentSnapshotId`, so
    * the per-ref pointer checks alone would let two snapshots land with the
    * SAME id (corrupting snapshotById / branch refs / time travel). Abort
    * loudly instead — `commitOrClean` then removes the staged files.
    * (`<=` rather than `==`: dropBranch can retract ids, which leaves a
    * pre-allocated higher id unused but still unique.) */
  private def requireSnapshotIdFree(m: TableMeta, id: Long): Unit =
    require(m.nextSnapshotId <= id,
      s"concurrent commit allocated snapshot ids past $id " +
        s"(next free is now ${m.nextSnapshotId}) — retry against the new head")

  // ---------------------------------------------------------------- reads

  /** Current (or time-travel) table state as a DataFrame in the current
    * schema, plus `_lsn` and `_deleted`. Old-schema data
    * files are mapped by column ID: renamed columns resolve to their stored
    * name, added columns fill with null, widened types are up-cast. */
  def read(snapshotId: Option[Long] = None): DataFrame = {
    val m = meta
    val snap = snapshotId.map(id => m.snapshotById(id)
      .getOrElse(sys.error(s"no snapshot $id"))).orElse(m.currentSnapshot)
    // current reads always use the table's current schema (evolution applies
    // immediately, Iceberg-style); explicit time travel pins the schema the
    // snapshot was committed under
    val readSchemaId = snapshotId.flatMap(_ => snap.map(_.schemaId))
      .getOrElse(m.currentSchemaId)
    val files = snap.map(_.files).getOrElse(Seq.empty)
    readFiles(m, files, readSchemaId)
  }

  /** Live rows, data columns only (soft-deleted rows filtered out). */
  def currentState(snapshotId: Option[Long] = None): DataFrame = {
    val m = meta
    val df = read(snapshotId)
    val alive = df.filter(!col(DeletedCol))
    alive.select(m.schemaById(
      snapshotId.flatMap(id => m.snapshotById(id)).map(_.schemaId)
        .getOrElse(m.currentSchemaId)).columns.map(c => col(c.name)): _*)
  }

  def bucketExpr(m: TableMeta): Column =
    pmod(hash(m.keyCols.map(col): _*), lit(m.numBuckets))

  // ---------------------------------------------------------------- merge

  /** Idempotent keyed MERGE of a change batch. `changes` must carry the
    * current schema's data columns plus `lsn` and `op` ("I"/"U"/"D").
    * Returns per-bucket lineage, or None when `epochId` was already
    * committed (exactly-once under foreachBatch replay, ST5).
    *
    * Within the batch AND against stored state, last writer wins by
    * (lsn, op priority); stored rows lose ties to incoming rows with the
    * same lsn (idempotent redelivery carries identical payloads).
    *
    * `delta = true` commits MERGE-ON-READ instead of copy-on-write: the
    * batch's LWW winners land as small per-bucket DELTA files layered on
    * top of the existing files (nothing is rewritten), so write cost is
    * ∝ BATCH where COW is ∝ touched-bucket bytes — under hash-bucketed
    * keys even a trickle batch touches every bucket, making each COW beat
    * a near-full-table rewrite at the reference's 600 s cadence. State
    * semantics are IDENTICAL to COW (pure layout difference): rows that
    * lose to stored state are filtered before the write by a
    * column-pruned (keys + lsn + tombstone) probe of the touched buckets,
    * so a delta file never carries a stale winner — reads LWW-resolve
    * across layers ([[readFiles]]), the SQL scan merges per bucket, and
    * the `$changes` floor feed emits delta rows as-is (every row is new
    * and post-floor). Read amplification accumulates with layers;
    * [[foldDeltas]] collapses buckets back to base files (the
    * Hudi-compaction / Delta-OPTIMIZE division of labor). */
  def merge(changes: DataFrame, epochId: Long = -1L,
      precomputedStats: Option[Map[Int, (Long, Long, Long)]] = None,
      branch: Option[String] = None,
      delta: Boolean = false): Option[Seq[graft.cdc.PartitionLineage]] = {
    graft.functions.LwwMaxBy.tuneSession(spark)
    val m0 = meta
    if (epochId >= 0 && m0.epochCommitted(epochId)) return None

    val dataCols = m0.currentSchema.columns.map(_.name)
    require(ChangeCols.forall(changes.columns.contains) &&
      dataCols.forall(changes.columns.contains),
      s"merge input needs columns ${dataCols ++ ChangeCols}, got ${changes.columns.toSeq}")

    // Write-audit-publish: a branch merge applies against the BRANCH head's
    // state and advances the branch pointer; main is untouched until
    // publishBranch flips it in one metadata commit.
    val base: Option[Snapshot] = branch match {
      case Some(b) => Some(m0.snapshotById(m0.branches.getOrElse(b,
        sys.error(s"no branch '$b' on table (createBranch first)")))
        .getOrElse(sys.error(s"branch '$b' head expired")))
      case None => m0.currentSnapshot
    }
    val snapshotId = m0.nextSnapshotId
    // cast every data column to its declared type — guards the storage
    // format against NullType/narrower inputs from ad-hoc callers
    val typedDataCols = typedDataColsOf(m0)
    // bucket is computed AFTER the cast (over the schema-typed key columns):
    // hash(Int 5) != hash(Long 5), so an ad-hoc caller passing a narrower
    // key type must still land in the same bucket that schema-typed merges
    // and the SQL point-lookup pruning (GraftScanBuilder.bucketOf) compute
    val incoming = changes
      .select((typedDataCols ++ Seq(col("lsn").cast(LongType).as(LsnCol),
        col("op"))): _*)
      .withColumn(BucketCol, bucketExpr(m0))

    // Declared constraints: direct merges fail loudly on a violating batch
    // (one extra agg pass, constrained tables only). The CDC pipeline path
    // (precomputedStats) enforces upstream instead — violations dead-letter
    // to its quarantine with reason constraint:<name> and never reach here.
    if (precomputedStats.isEmpty) enforceConstraints(m0, incoming, opAware = true)

    // Per-bucket applied-row counts and lsn bounds: touched-bucket discovery
    // for manifest-level partition pruning, and the lineage record. The CDC
    // pipeline precomputes this inside its single batch-probe pass
    // (CdcPipeline.batchStats); direct merge() callers pay one light
    // column-pruned scan (bucket + lsn only) here.
    val appliedStats = precomputedStats.getOrElse {
      incoming.groupBy(col(BucketCol)).agg(
        count(lit(1)).as("cnt"), min(col(LsnCol)).as("mn"), max(col(LsnCol)).as("mx"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    }
    if (appliedStats.isEmpty) return None // empty batch: nothing to commit
    val touched = appliedStats.keySet
    val oldFiles = base.map(_.files).getOrElse(Seq.empty)
    val (rewritten, kept) = oldFiles.partition(f => touched.contains(f.bucket))

    val existing0 = if (rewritten.isEmpty || delta) None
      else Some(readFiles(m0, rewritten, m0.currentSchemaId))
    val existing = existing0.map { df =>
      val opCol = when(col(DeletedCol), lit("D")).otherwise(lit("S"))
      df.select((dataCols.map(col) ++ Seq(col(LsnCol), opCol.as("op"),
        bucketExpr(m0).as(BucketCol))): _*)
    }
    val unioned = existing.map(_.unionByName(incoming)).getOrElse(incoming)

    // LWW winner per key via the native TypedImperativeAggregate —
    // ObjectHashAggregate with map-side partial agg: no per-row sort (the
    // built-in max_by(struct) would SortAggregate), no window (a window
    // would sort-shuffle every row of every touched bucket). This single
    // aggregation is simultaneously the within-batch dedup and the
    // merge-against-stored-state.
    val pri = graft.cdc.Dedup.opPriority(col("op"))
    val rowStruct = struct((dataCols.map(col) ++ Seq(col(LsnCol), col("op"), col(BucketCol))): _*)
    val winners0 = unioned
      .groupBy(m0.keyCols.map(col): _*)
      .agg(graft.functions.LwwMaxBy.lwwMaxBy(rowStruct, col(LsnCol), pri).as("__w"))
      .select(col("__w.*"))

    // Delta mode: drop batch winners that DO NOT CHANGE stored state, so a
    // delta file never layers a stale or redundant row (the feed and every
    // LWW-unaware follower can then treat delta rows as true changes,
    // exactly like COW output). Keep a winner iff its key is new, its lsn
    // beats the stored high-water, or — on the lsn tie, where the engine
    // invariant makes payloads identical — it is a DELETE over a live row
    // (the one tie COW's stored-row priority lets flip state; a redelivered
    // insert/update is a no-op and a redelivered delete is already
    // tombstoned). The probe reads ONLY keys + lsn + tombstone of the
    // touched buckets — with parquet column pruning that is a small
    // fraction of what the COW path both reads AND rewrites. Raw read on
    // purpose: the per-key max over layered rows IS the resolved
    // high-water.
    val winners = if (!delta || rewritten.isEmpty) winners0 else {
      val storedPri = graft.cdc.Dedup.opPriority(
        when(col(DeletedCol), lit("D")).otherwise(lit("S")))
      val storedMax = readFilesRaw(m0, rewritten, m0.currentSchemaId)
        .select((m0.keyCols.map(col) :+ col(LsnCol) :+ storedPri.as("__p")): _*)
        .groupBy(m0.keyCols.map(col): _*)
        .agg(max(struct(col(LsnCol).as("l"), col("__p").as("p"))).as("__s"))
      winners0.join(storedMax, m0.keyCols, "left")
        .filter(col("__s").isNull || col(LsnCol) > col("__s.l") ||
          (col(LsnCol) === col("__s.l") && pri === 2 && col("__s.p") =!= 2))
        .drop("__s")
    }

    // No extra shuffle before the write: the agg's own hash partitioning
    // already distributes keys, and `partitionBy(bucket)` routes rows to the
    // right bucket directory from WHATEVER task holds them — total file
    // count stays ~max(shuffle partitions, touched buckets). The round-1
    // `repartition(buckets)` here was a whole extra (winners-sized) shuffle
    // + stage for zero correctness benefit.
    val out = winners.withColumn(DeletedCol, col("op") === "D").drop("op")

    // single heavy pass: aggregate + write staging; per-file stats come from
    // re-reading the staged files' (bucket, lsn) columns — a metadata-cheap
    // columnar scan, instead of persisting the whole merged output
    val staging = timed("stage_write")(stageWrite(out, snapshotId))

    val newFiles0 = timed("footer_stats")(commitOrClean(staging)(
      statsFromFooters(staging, m0.currentSchemaId, requireKeysNonNull = true)))
    val newFiles = if (delta) newFiles0.map(_.copy(isDelta = true)) else newFiles0

    val applied = appliedStats.toSeq.map { case (bucket, (cnt, mn, mx)) =>
      graft.cdc.PartitionLineage(epochId, bucket, mn, mx, cnt, snapshotId)
    }

    // delta commits layer: every pre-existing file stays live
    val surviving = if (delta) oldFiles else kept

    timed("commit")(commitOrClean(staging) {
      retryCommit { m =>
        requireSnapshotIdFree(m, snapshotId)
        val snap = Snapshot(snapshotId, base.map(_.snapshotId).getOrElse(-1L),
          epochId, m.currentSchemaId, if (delta) "delta-merge" else "merge",
          surviving ++ newFiles,
          System.currentTimeMillis(),
          excludedLsns = base.map(_.excludedLsns).getOrElse(Seq.empty))
        branch match {
          case Some(b) =>
            require(m.branches.get(b).contains(base.get.snapshotId),
              s"concurrent commit on branch '$b' (base ${base.get.snapshotId}, " +
                s"now ${m.branches.get(b)})")
            m.copy(snapshots = m.snapshots :+ snap,
              branches = m.branches + (b -> snapshotId))
          case None =>
            require(m.currentSnapshotId == m0.currentSnapshotId,
              s"concurrent commit detected (base ${m0.currentSnapshotId}, now ${m.currentSnapshotId})")
            m.copy(snapshots = m.snapshots :+ snap, currentSnapshotId = snapshotId)
        }
      }
    })
    Some(applied)
  }

  /** Append rows without key reconciliation (reference S5: the technicians
    * insert has no ON CONFLICT, `queries/dim_technicians.py:14-21`). */
  /** The applied-lsn high-water + 1: the lsn a new SQL statement stamps its
    * rows with (one definition — the DML surfaces must not drift apart).
    * Computed over ALL retained history, not just the current snapshot:
    * after a rollback the visible maximum drops, but re-using a reverted lsn
    * would violate the LWW invariant across the rollback boundary. */
  def nextLsn: Long = meta.lsnHighWater + 1

  /** One row per key for a single-lsn statement: every row of one SQL
    * statement shares one lsn, and the engine's LWW invariant (same key +
    * same lsn ⇒ identical payload) underpins merge ties, changes() and the
    * change feed — so duplicate keys WITHIN the statement are deduped
    * first, deterministically (max payload-hash wins; full-duplicate rows
    * tie on identical payloads, which is exactly the invariant). */
  def dedupStatementKeys(data: DataFrame): DataFrame = {
    val dataCols = data.columns.toSeq
    data.groupBy(meta.keyCols.map(col): _*)
      .agg(max_by(struct(dataCols.map(col): _*),
        xxhash64(dataCols.map(col): _*)).as("__r"))
      .select(col("__r.*"))
  }

  def append(rows: DataFrame, epochId: Long = -1L): Unit = {
    val m0 = meta
    if (epochId >= 0 && m0.epochCommitted(epochId)) return
    val snapshotId = m0.nextSnapshotId
    val withMeta0 = rows.select((typedDataColsOf(m0) :+
      (if (rows.columns.contains("lsn")) col("lsn").cast(LongType).as(LsnCol)
       else lit(0L).as(LsnCol))): _*)
      .withColumn(BucketCol, bucketExpr(m0)) // bucket from cast keys (see merge)
    val withMeta = withMeta0.withColumn(DeletedCol, lit(false)).persist()
    try {
      enforceConstraints(m0, withMeta, opAware = false)
      val staging = stageWrite(withMeta, snapshotId)
      val newFiles = commitOrClean(staging)(statsFromFooters(staging,
        m0.currentSchemaId, requireKeysNonNull = true))
      commitOrClean(staging) {
        retryCommit { m =>
          require(m.currentSnapshotId == m0.currentSnapshotId, "concurrent commit")
          requireSnapshotIdFree(m, snapshotId)
          val snap = childSnapshot(m, snapshotId, epochId, "append",
            m.currentSnapshot.map(_.files).getOrElse(Seq.empty) ++ newFiles)
          m.copy(snapshots = m.snapshots :+ snap, currentSnapshotId = snapshotId)
        }
      }
    } finally withMeta.unpersist()
  }

  /** Replace the whole table content with `rows` in one snapshot commit
    * (full-refresh semantics for maintained rollup views: groups that
    * disappeared from the source must disappear here, which an upsert can't
    * express without tombstoning every absent key). */
  def replace(rows: DataFrame, epochId: Long = -1L): Unit = {
    val m0 = meta
    if (epochId >= 0 && m0.epochCommitted(epochId)) return
    val snapshotId = m0.nextSnapshotId
    val withMeta = rows.select((typedDataColsOf(m0) :+
      (if (rows.columns.contains("lsn")) col("lsn").cast(LongType).as(LsnCol)
       else lit(0L).as(LsnCol))): _*)
      .withColumn(BucketCol, bucketExpr(m0)) // bucket from cast keys (see merge)
      .withColumn(DeletedCol, lit(false))
    enforceConstraints(m0, withMeta, opAware = false)
    val staging = stageWrite(withMeta, snapshotId)
    val newFiles = commitOrClean(staging)(statsFromFooters(staging,
      m0.currentSchemaId, requireKeysNonNull = true))
    commitOrClean(staging) {
      retryCommit { m =>
        require(m.currentSnapshotId == m0.currentSnapshotId, "concurrent commit")
        requireSnapshotIdFree(m, snapshotId)
        val snap = childSnapshot(m, snapshotId, epochId, "replace", newFiles)
        m.copy(snapshots = m.snapshots :+ snap, currentSnapshotId = snapshotId)
      }
    }
  }

  /** Physically drop tombstones with `_lsn <= upToLsn`. Safe once BOTH
    *  - the stream's replay watermark has passed `upToLsn` (no event that old
    *    can still arrive, so the tombstone's anti-resurrection job is done),
    *  - every downstream tombstone consumer (JDBC warehouse sync, `$changes`
    *    lsn-floor stream) has consumed past `upToLsn` — a vacuumed tombstone
    *    can no longer be observed as a delete. The commit records the
    *    high-water in [[TableMeta.vacuumLsn]] so lagging consumers can detect
    *    the gap and full-resync instead of silently stranding deleted rows.
    *
    * Candidate discovery is manifest-only: a file can contain an eligible
    * tombstone only if its footer flagged tombstones at all AND its lsn range
    * dips below the cutoff — vacuum on a tombstone-free table reads zero
    * files, and only candidate files (not whole buckets) are rewritten.
    *
    * DELTA files are never candidates: a delta tombstone masks older rows
    * in the bucket's OTHER files, so dropping it would resurrect them
    * (where a base tombstone masks nothing — the COW merge already removed
    * what it deleted). Run [[foldDeltas]] first; the fold keeps tombstones
    * but moves them into base files where vacuum can retire them. */
  def vacuum(upToLsn: Long = Long.MaxValue): Long = {
    val m0 = meta
    val snap = m0.currentSnapshot.getOrElse(return 0L)
    val (candidates, kept) = snap.files.partition(f =>
      !f.isDelta && f.hasTombstones && f.lsnMin <= upToLsn)
    if (candidates.isEmpty) return 0L
    // probe pass over candidates only (column-pruned: _deleted + _lsn):
    // the EXACT high-water of what this vacuum drops. File-level bounds
    // (candidates' lsnMax) would over-state the gap and force downstream
    // consumers into spurious full resyncs; and zero eligible tombstones
    // (conservatively-flagged files) means nothing to rewrite at all.
    val probe = readFiles(m0, candidates, m0.currentSchemaId)
      .filter(col(DeletedCol) && col(LsnCol) <= upToLsn)
      .agg(count(lit(1)).as("c"), max(col(LsnCol)).as("mx")).head()
    if (probe.getLong(0) == 0) return 0L
    val droppedHighWater = probe.getLong(1)
    // input files are already bucket-partitioned (one task reads one bucket
    // file and writes one bucket dir) — no shuffle needed
    val surviving = readFiles(m0, candidates, m0.currentSchemaId)
      .filter(!(col(DeletedCol) && col(LsnCol) <= upToLsn))
      .withColumn(BucketCol, bucketExpr(m0))
      .persist()
    try {
      val snapshotId = m0.nextSnapshotId
      val staging = stageWrite(surviving, snapshotId)
      val newFiles = commitOrClean(staging)(
        statsFromFooters(staging, m0.currentSchemaId))
      val removed = candidates.map(_.rowCount).sum - newFiles.map(_.rowCount).sum
      commitOrClean(staging) {
        retryCommit { m =>
          require(m.currentSnapshotId == m0.currentSnapshotId, "concurrent commit")
          requireSnapshotIdFree(m, snapshotId)
          val s = childSnapshot(m, snapshotId, -1, "vacuum", kept ++ newFiles)
            .copy(vacuumHw = droppedHighWater)
          m.copy(snapshots = m.snapshots :+ s, currentSnapshotId = snapshotId,
            vacuumLsn = math.max(m.vacuumLsn, droppedHighWater))
        }
      }
      removed
    } finally surviving.unpersist()
  }

  /** Bin-pack small data files (reference analogue: Postgres auto-vacuum /
    * CLUSTER keep the heap compact for free; a file-based lake must do it
    * explicitly). Continuous ingest leaves many sub-target files per bucket:
    * every `append` adds files, and a merge writes one file per task that
    * held rows of a touched bucket — at a 600 s commit beat that is
    * thousands of small files per bucket per week, and scan cost becomes
    * file-open-bound instead of byte-bound.
    *
    * Layout-only rewrite: buckets with at least `minFiles` files under
    * `targetFileBytes` get those small files re-read and re-written as ONE
    * file per bucket; right-sized files are kept as-is. The rows are
    * hash-repartitioned on the stored bucket — a shuffle, but only of the
    * small files being packed (bounded by ingest since the last compact,
    * never table size), and it is what guarantees each bucket's stragglers
    * land in a single writer task = a single output file (split-planner
    * packing cannot promise that: it caps splits at totalBytes/parallelism
    * and freely mixes buckets). Content is byte-identical; time travel to
    * pre-compact snapshots still sees the old layout. Returns the net
    * reduction in live file count.
    *
    * `sortBy` additionally CLUSTERS each rewritten file by the given data
    * columns (the OPTIMIZE/CLUSTER analogue — the reference gets this from
    * Postgres CLUSTER on an index): rows land sorted within the file, so
    * parquet row-group/page min-max statistics become tight, disjoint
    * ranges and a range predicate on a clustered column skips whole row
    * groups inside the scan (on top of the manifest's per-file skipping).
    * Merge commits deliberately do NOT sort — ingest stays cheap and the
    * periodic compact is where layout is repaid, same division as
    * Delta/Iceberg OPTIMIZE. The sort rides the existing pack shuffle
    * (sortWithinPartitions; the bucket prefix also satisfies the
    * partitionBy writer's required ordering, so no second sort is added).
    *
    * `zOrderBy` clusters by a space-filling curve instead (exclusive with
    * `sortBy`): per-column equi-depth range buckets, bit-interleaved into
    * one Morton key (see [[graft.functions.ZOrderHelpers]]) — row-group
    * stats become narrow on EVERY z column at once, so predicates on any
    * of them prune, where a lexicographic sort serves only its leading
    * column. */
  def compact(targetFileBytes: Long = 128L << 20, minFiles: Int = 2,
      sortBy: Seq[String] = Nil, zOrderBy: Seq[String] = Nil): Int = {
    val schemaCols = meta.currentSchema.columns.map(_.name).toSet
    require(sortBy.forall(schemaCols.contains),
      s"sortBy ${sortBy.filterNot(schemaCols.contains).mkString(", ")} not in table schema")
    require(zOrderBy.forall(schemaCols.contains),
      s"zOrderBy ${zOrderBy.filterNot(schemaCols.contains).mkString(", ")} not in table schema")
    require(sortBy.isEmpty || zOrderBy.isEmpty,
      "sortBy (lexicographic) and zOrderBy (space-filling curve) are exclusive")
    val m0 = meta
    val snap = m0.currentSnapshot.getOrElse(return 0)
    // planning is pure metadata: sizes come from the manifest (recorded at
    // commit by the footer pass); only legacy files missing the field pay a
    // stat. (The first version re-stat'ed every file inside the partition
    // predicate — O(files²) syscalls at exactly the file counts compaction
    // exists for.)
    val sizeByPath: Map[String, Long] = snap.files.map(f => f.path ->
      (if (f.sizeBytes > 0) f.sizeBytes else Files.size(Paths.get(root, f.path)))).toMap
    val smallPerBucket: Map[Int, Int] = snap.files
      .filter(f => !f.isDelta && sizeByPath(f.path) < targetFileBytes)
      .groupBy(_.bucket).map { case (b, fs) => b -> fs.size }
    // delta files are excluded: compact's raw re-pack would mix layered
    // rows into one file and could leave a bucket with duplicate keys but
    // no isDelta marker — collapsing layers is foldDeltas' job
    val (rewritten, kept) = snap.files.partition { f =>
      !f.isDelta && sizeByPath(f.path) < targetFileBytes &&
        smallPerBucket.getOrElse(f.bucket, 0) >= minFiles
    }
    if (rewritten.isEmpty) return 0
    val snapshotId = m0.nextSnapshotId
    val buckets = rewritten.map(_.bucket).distinct.size
    val packSrc = readFiles(m0, rewritten, m0.currentSchemaId)
      .withColumn(BucketCol, bucketExpr(m0)) // identical to stored bucket (cast keys)
    // the z sample reads the PRE-shuffle scan (one column-pruned pass over
    // the small files); sampling the repartitioned side would re-run the
    // whole pack shuffle per sampling job
    val zKey = if (zOrderBy.isEmpty) None
      else Some(zOrderKey(packSrc, zOrderBy, rewritten.map(_.rowCount).sum))
    val repacked = packSrc.repartition(buckets, col(BucketCol))
    val packed = zKey match {
      case Some(k) => repacked.sortWithinPartitions(col(BucketCol), k)
      case None if sortBy.isEmpty => repacked
      case None => repacked.sortWithinPartitions((BucketCol +: sortBy).map(col): _*)
    }
    val staging = stageWrite(packed, snapshotId)
    val newFiles = commitOrClean(staging)(
      statsFromFooters(staging, m0.currentSchemaId))
    commitOrClean(staging) {
      retryCommit { m =>
        require(m.currentSnapshotId == m0.currentSnapshotId, "concurrent commit")
        requireSnapshotIdFree(m, snapshotId)
        val s = childSnapshot(m, snapshotId, -1, "compact", kept ++ newFiles)
        m.copy(snapshots = m.snapshots :+ s, currentSnapshotId = snapshotId)
      }
    }
    rewritten.size - newFiles.size
  }

  /** Collapse merge-on-read DELTA layers back into copy-on-write base files
    * (the Hudi-compaction analogue; `compact`/`vacuum` deliberately refuse
    * delta files and this is the op that retires them). Every bucket holding
    * at least one delta file has ALL its files read, LWW-resolved to one row
    * per key ([[readFiles]] resolution), and rewritten as one base file per
    * bucket; buckets without deltas are untouched. Tombstone winners are
    * KEPT (they still mask late redelivery — dropping them is `vacuum`'s
    * decision, which becomes legal again once the rows are base). Logical
    * state is unchanged — a layout-only commit like compact: the change
    * feed's lsn-floor skip reads nothing from it, and time travel to
    * pre-fold snapshots still sees the layered form. Cost ∝ the
    * delta-carrying buckets' bytes, never the table. Returns the number of
    * buckets folded. */
  def foldDeltas(): Int = {
    val m0 = meta
    val snap = m0.currentSnapshot.getOrElse(return 0)
    val deltaBuckets = snap.files.filter(_.isDelta).map(_.bucket).toSet
    if (deltaBuckets.isEmpty) return 0
    val (folded, kept) = snap.files.partition(f => deltaBuckets.contains(f.bucket))
    val snapshotId = m0.nextSnapshotId
    val resolved = readFiles(m0, folded, m0.currentSchemaId)
      .withColumn(BucketCol, bucketExpr(m0))
      .repartition(deltaBuckets.size, col(BucketCol))
    val staging = stageWrite(resolved, snapshotId)
    val newFiles = commitOrClean(staging)(
      statsFromFooters(staging, m0.currentSchemaId, requireKeysNonNull = true))
    commitOrClean(staging) {
      retryCommit { m =>
        require(m.currentSnapshotId == m0.currentSnapshotId, "concurrent commit")
        requireSnapshotIdFree(m, snapshotId)
        val s = childSnapshot(m, snapshotId, -1, "fold", kept ++ newFiles)
        m.copy(snapshots = m.snapshots :+ s, currentSnapshotId = snapshotId)
      }
    }
    deltaBuckets.size
  }

  /** The Morton sort key for `compact(zOrderBy = ...)`: per column, up to
    * 255 equi-depth boundaries from a bounded driver-side sample of the
    * rows being rewritten (equi-depth so skew cannot collapse the curve;
    * strings sort in UTF8 binary order, matching the runtime comparator),
    * then the per-row bucket ranks bit-interleave into one BIGINT. ONE
    * sampling job covers every z column (column-pruned pass over the SMALL
    * files only, pre-shuffle) and caps at ~64k rows regardless of scale. */
  private def zOrderKey(df: DataFrame, cols: Seq[String], totalRows: Long): Column = {
    import graft.functions.ZOrderHelpers
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}
    import org.apache.spark.unsafe.types.UTF8String
    // one orderable double/string projection per z column
    val projected: Seq[(String, Column, Boolean)] = cols.map { name =>
      df.schema(name).dataType match {
        case org.apache.spark.sql.types.StringType => (name, col(name), true)
        case _: NumericType => (name, col(name).cast(DoubleType), false)
        case TimestampType => (name, col(name).cast(DoubleType), false)
        case DateType => (name, unix_date(col(name)).cast(DoubleType), false)
        case other => throw new IllegalArgumentException(
          s"zOrderBy column $name has unsupported type ${other.simpleString}: " +
            "numeric, string, date and timestamp columns can be z-ordered")
      }
    }
    val frac = math.min(1.0, 65536.0 / math.max(totalRows, 1L))
    val sampled = df.select(projected.map { case (n, c, _) => c.as(n) }: _*)
      .sample(frac, 42L).collect()
    val buckets = projected.zipWithIndex.map { case ((name, c, isString), i) =>
      if (isString) {
        val vals = sampled.filterNot(_.isNullAt(i))
          .map(r => UTF8String.fromString(r.getString(i)))
          .sortWith(_.compareTo(_) < 0)
        ZOrderHelpers.rangeBucketS(c, ZOrderHelpers.boundariesOf(vals.toIndexedSeq).toArray)
      } else {
        val vals = sampled.filterNot(_.isNullAt(i)).map(_.getDouble(i)).sorted
        ZOrderHelpers.rangeBucketD(c, ZOrderHelpers.boundariesOf(vals.toIndexedSeq).toArray)
      }
    }
    ZOrderHelpers.interleave(buckets)
  }

  /** Re-hash the table into `newBuckets` hash buckets (bucket-count
    * evolution — the format fixes the bucket count at create time and sizes
    * it for the expected scale; a table that outgrew it re-buckets once
    * rather than living with oversized buckets forever). One full COW
    * rewrite: every row is re-routed by `pmod(hash(keys), newBuckets)` with
    * one writer task per NEW bucket (task size ≈ the new bucket size, which
    * is exactly what `newBuckets` is being chosen to bound), committed
    * together with the `numBuckets` flip in a single snapshot — readers and
    * mergers always see file layout and bucket function agree. Logical
    * state is unchanged: the change feed sees a rebucket as pure rewrite
    * (every new file's rows keep their lsn, so the lsn-floor manifest skip
    * reads nothing), and time travel to pre-rebucket snapshots still uses
    * the old layout. */
  def rebucket(newBuckets: Int): Unit = {
    require(newBuckets > 0, "newBuckets must be positive")
    val m0 = meta
    if (m0.numBuckets == newBuckets) return
    // open write branches staged their state under the CURRENT layout: a
    // later branch merge would mix old-layout file bucket numbers with the
    // new bucket function and silently corrupt the audit state — publish or
    // drop branches first
    require(m0.branches.isEmpty,
      s"cannot rebucket with open write branches (${m0.branches.keys.toSeq.sorted
        .mkString(", ")}): publish or drop them first")
    val snap = m0.currentSnapshot.getOrElse {
      // empty table: just flip the metadata
      retryCommit { m =>
        require(m.currentSnapshot.isEmpty, "concurrent first commit")
        m.copy(numBuckets = newBuckets)
      }
      return
    }
    val snapshotId = m0.nextSnapshotId
    val keyCols = m0.keyCols.map(c => col(c))
    val rerouted = readFiles(m0, snap.files, m0.currentSchemaId)
      .withColumn(BucketCol, pmod(hash(keyCols: _*), lit(newBuckets)))
      .repartition(newBuckets, col(BucketCol))
    val staging = stageWrite(rerouted, snapshotId)
    val newFiles = commitOrClean(staging)(statsFromFooters(staging, m0.currentSchemaId))
    commitOrClean(staging) {
      retryCommit { m =>
        require(m.currentSnapshotId == m0.currentSnapshotId, "concurrent commit")
        require(m.branches.isEmpty, "branch opened during rebucket")
        requireSnapshotIdFree(m, snapshotId)
        val s = childSnapshot(m, snapshotId, -1, "rebucket", newFiles)
        m.copy(snapshots = m.snapshots :+ s, currentSnapshotId = snapshotId,
          numBuckets = newBuckets, rebucketAtSnapshot = snapshotId)
      }
    }
  }

  /** Roll the table's visible state back to an earlier retained snapshot in
    * one metadata-only commit (no data is read or written — the new snapshot
    * simply references the target's immutable file set, Iceberg
    * `rollback_to_snapshot`-style). History is preserved: the rolled-back
    * snapshots stay time-travelable until retention expires them, and the
    * epoch ledger keeps their epochs committed — rolling back streamed data
    * is an explicit decision to discard those events, not to replay them.
    *
    * Data-only: the CURRENT schema keeps applying (old files map by column
    * id, like any other read); columns added after the target read null for
    * restored rows, dropped columns stay dropped. Refused across a
    * `rebucket` boundary — the restored files' bucket numbers were computed
    * under the old bucket count and every merge/read since the flip would
    * route keys wrong.
    *
    * Downstream contract: lsns in `(target high-water, table high-water]`
    * drop out of the restored lineage, recorded on the new snapshot as
    * [[LsnSpan]] exclusions (the target's own exclusions plus the span
    * this rollback reverts) — the `$changes` floor feed fails loudly when
    * its base covered lsns the range's end excludes, and
    * [[graft.cdc.JdbcWarehouseSync]] full-resyncs a sink whose watermark
    * covers excluded lsns (mirror of the vacuum contract). A rollback that
    * hides nothing (undoing a compaction) adds no span, and rolling
    * FORWARD to a pre-rollback snapshot clears the spans it re-covers —
    * consumers that never observed the mistake are never disturbed.
    * Returns the new snapshot id. */
  def rollback(toSnapshotId: Long): Long = {
    val m0 = meta
    val target = m0.snapshotById(toSnapshotId).getOrElse(
      sys.error(s"no snapshot $toSnapshotId (expired by retention?)"))
    if (toSnapshotId == m0.currentSnapshotId) return m0.currentSnapshotId
    // the durable marker survives retention; the retained-snapshot scan
    // covers legacy tables whose metadata predates the marker
    if (toSnapshotId < m0.rebucketAtSnapshot) sys.error(
      s"cannot roll back across rebucket snapshot ${m0.rebucketAtSnapshot}: " +
        s"the restored files' bucket layout predates numBuckets=${m0.numBuckets}")
    m0.snapshots.find(s => s.snapshotId > toSnapshotId && s.operation == "rebucket")
      .foreach(s => sys.error(
        s"cannot roll back across rebucket snapshot ${s.snapshotId}: the " +
          s"restored files' bucket layout predates numBuckets=${m0.numBuckets}"))
    val targetHw = target.files.map(_.lsnMax).foldLeft(0L)(math.max)
    val hiddenHw = m0.lsnHighWater
    val snapshotId = m0.nextSnapshotId
    retryCommit { m =>
      require(m.currentSnapshotId == m0.currentSnapshotId, "concurrent commit")
      requireSnapshotIdFree(m, snapshotId)
      val s = Snapshot(snapshotId, m0.currentSnapshotId, -1, m.currentSchemaId,
        "rollback", target.files, System.currentTimeMillis(),
        rollbackOf = toSnapshotId,
        excludedLsns = LsnSpan.normalize(target.excludedLsns ++
          (if (hiddenHw > targetHw) Seq(LsnSpan(targetHw, hiddenHw)) else Nil)))
      m.copy(snapshots = m.snapshots :+ s, currentSnapshotId = snapshotId,
        rollbackCount = m.rollbackCount + 1)
    }
    snapshotId
  }

  /** Tag a retained snapshot with a stable name (Iceberg-style ref): the
    * snapshot becomes retention-pinned (expireSnapshots keeps it and its
    * files) and addressable by name in time travel (`VERSION AS OF 'tag'`,
    * CLI/`resolveRef`). Idempotent re-tag of the same snapshot; re-pointing
    * an existing tag requires `replace = true` — audit pins should not move
    * silently. */
  def createTag(name: String, snapshotId: Option[Long] = None,
      replace: Boolean = false): Long = {
    require(name.nonEmpty && !name.forall(_.isDigit),
      s"tag name '$name' must be non-empty and not purely numeric (ambiguous with snapshot ids)")
    var tagged = -1L
    retryCommit { m =>
      val id = snapshotId.getOrElse(m.currentSnapshotId)
      require(m.snapshotById(id).isDefined, s"no snapshot $id (expired by retention?)")
      m.tags.get(name).foreach { existing =>
        require(existing == id || replace,
          s"tag '$name' already points at snapshot $existing; pass replace=true to move it")
      }
      // symmetric with createBranch's tag check: resolveRef gives tags
      // precedence, so a tag shadowing a live branch would silently redirect
      // every `VERSION AS OF '$name'` from the branch head to a frozen pin
      require(!m.branches.contains(name), s"'$name' is already a branch")
      tagged = id
      m.copy(tags = m.tags + (name -> id))
    }
    tagged
  }

  /** Drop a tag (the snapshot becomes expirable again). Returns false if
    * the tag did not exist. */
  def dropTag(name: String): Boolean = {
    var existed = false
    retryCommit { m =>
      existed = m.tags.contains(name)
      m.copy(tags = m.tags - name)
    }
    existed
  }

  /** Resolve a snapshot REF — a numeric snapshot id, a tag name, or a
    * branch name (its current head) — for every surface that time-travels
    * by user input. Tags win a tag/branch name collision. */
  def resolveRef(ref: String): Long = {
    // toLongOption: an all-digit ref beyond Long range (corrupted id) must
    // fall through to the descriptive no-such-ref error, not crash parsing
    if (ref.nonEmpty && ref.forall(_.isDigit))
      ref.toLongOption.foreach(id => return id)
    val m = meta
    m.tags.get(ref).orElse(m.branches.get(ref)).getOrElse(
      sys.error(s"no tag or branch '$ref' on table (tags: " +
        s"${m.tags.keys.toSeq.sorted.mkString(", ")}; branches: " +
        s"${m.branches.keys.toSeq.sorted.mkString(", ")})"))
  }

  // -------------------------------------------------------------- branches

  /** Open a write branch at the current main head (write-audit-publish,
    * Iceberg's WAP refs): branch merges stage state out of main's sight,
    * an audit reads the branch head (`resolveRef(name)` / `read(Some(id))` /
    * SQL `VERSION AS OF 'name'`), and [[publishBranch]] flips main to the
    * audited state in one metadata commit. Heads are retention-pinned. */
  def createBranch(name: String): Long = {
    require(name.nonEmpty && !name.forall(_.isDigit),
      s"branch name '$name' must be non-empty and not purely numeric")
    var head = -1L
    retryCommit { m =>
      require(!m.branches.contains(name), s"branch '$name' already exists")
      require(!m.tags.contains(name), s"'$name' is already a tag")
      require(m.currentSnapshotId > 0, "cannot branch an empty table")
      head = m.currentSnapshotId
      m.copy(branches = m.branches + (name -> head))
    }
    head
  }

  /** Publish the branch: main fast-forwards to the branch head in ONE
    * metadata commit (atomic, zero data movement) and the branch closes.
    * Requires main not to have advanced since the branch forked — the
    * branch head's parent chain must reach the CURRENT main head; anything
    * else means concurrent main commits the audit never saw (re-stage). */
  def publishBranch(name: String): Long = {
    var published = -1L
    retryCommit { m =>
      val head = m.branches.getOrElse(name, sys.error(s"no branch '$name'"))
      require(m.ancestry(head).contains(m.currentSnapshotId),
        s"main advanced to ${m.currentSnapshotId} after branch '$name' forked — " +
          "the audited state does not include those commits; re-stage the branch")
      published = head
      m.copy(currentSnapshotId = head, branches = m.branches - name)
    }
    published
  }

  /** Discard a branch AND its branch-exclusive staged snapshots (their data
    * files are deleted unless another retained snapshot references them).
    * Retraction — not mere unpinning — is what makes the publish-refused →
    * dropBranch → re-stage flow work: the dead snapshots' epoch ids leave
    * [[TableMeta.committedEpochs]] with them, so re-merging the same epochs
    * onto a fresh branch applies instead of silently no-opping (and expiry
    * can never fold an unpublished epoch into the permanent retired ledger).
    * Returns false if the branch did not exist. */
  def dropBranch(name: String): Boolean = {
    var existed = false
    var dead: Set[String] = Set.empty
    var deadManifests: Set[String] = Set.empty
    retryCommit { m =>
      // recompute from scratch on EVERY attempt: a lost race leaves the
      // closure re-entered against new metadata, and stale state from the
      // losing attempt must not survive it — in particular `dead` (a
      // concurrent publishBranch of this very branch makes its files main's
      // live data; deleting attempt-1's list after a no-op attempt-2 commit
      // would corrupt the published table)
      existed = m.branches.contains(name)
      dead = Set.empty
      deadManifests = Set.empty
      if (!existed) m
      else {
        // branch-exclusive segment: head's parent chain up to (excluding)
        // the first snapshot still reachable from main, a tag, or another
        // branch — shared history is never retracted
        val keepIds = ((m.branches - name).values.flatMap(m.ancestry) ++
          m.tags.values.flatMap(m.ancestry) ++ m.mainAncestry).toSet
        val drop = m.chainUntil(m.branches(name), keepIds)
        val dropped = m.snapshots.filter(s => drop.contains(s.snapshotId))
        val keep = m.snapshots.filterNot(s => drop.contains(s.snapshotId))
        val live = keep.flatMap(_.files.map(_.path)).toSet
        dead = dropped.flatMap(_.files.map(_.path)).toSet -- live
        deadManifests = dropped.map(_.manifestFile).filter(_.nonEmpty).toSet --
          keep.map(_.manifestFile).toSet
        // lsn allocation must never retreat into the retracted span: the
        // re-stage flow replays the retracted epochs' events, which still
        // carry these lsns (see TableMeta.retractedLsn)
        val droppedLsnHw = (dropped.flatMap(_.files.map(_.lsnMax)) :+ 0L).max
        m.copy(branches = m.branches - name, snapshots = keep,
          retractedLsn = math.max(m.retractedLsn, droppedLsnHw))
      }
    }
    // physical deletion strictly AFTER the metadata commit (same contract as
    // expireSnapshots): a failed commit must never orphan-reference files
    dead.foreach(rel => Files.deleteIfExists(Paths.get(root, rel)))
    deadManifests.foreach(n =>
      Files.deleteIfExists(Paths.get(root, "metadata", "manifests", n)))
    existed
  }

  /** Set (value nonEmpty) or unset (None) one free-form table property in a
    * metadata-only commit. */
  def setProperty(key: String, value: Option[String]): Unit =
    setProperties(Seq(key -> value))

  /** Apply several property sets/unsets in ONE metadata commit — the unit
    * an `ALTER TABLE ... SET TBLPROPERTIES ('a'='1','b'='2')` statement
    * needs to be atomic. */
  def setProperties(kvs: Seq[(String, Option[String])]): Unit = {
    // commit.io is validated HERE (the engine level, covering SQL ALTER and
    // API callers alike): an invalid value would otherwise commit fine and
    // then brick every later default open at resolveIo — including the
    // corrective ALTER, whose loadTable resolves first (review finding).
    kvs.foreach {
      case ("commit.io", Some(v)) =>
        require(LakeTable.CommitIoModes.contains(v),
          s"unknown commit.io '$v' (${LakeTable.CommitIoModes.mkString(" | ")})")
      case _ => ()
    }
    retryCommit { m =>
      m.copy(properties = kvs.foldLeft(m.properties) {
        case (acc, (k, Some(v))) => acc + (k -> v)
        case (acc, (k, None)) => acc - k
      })
    }
  }

  // ---------------------------------------------------------- constraints

  /** Declare a row constraint (reference analogue: the destination DDL's
    * NOT NULL / CHECK, which Postgres enforces for the reference — a lake
    * table must enforce its own). `kind` = "not_null" (expr = column name)
    * or "check" (expr = boolean SQL over data columns; ANSI semantics, NULL
    * passes). Existing LIVE rows are validated first (one scan) so a
    * constraint can never be born already violated; writes then enforce it
    * forever: direct merge/append/replace fail loudly, the CDC pipeline
    * dead-letters violating events to its quarantine. Deletes are exempt. */
  def addConstraint(name: String, kind: String, expr: String): Unit = {
    require(kind == "not_null" || kind == "check", s"unknown constraint kind '$kind'")
    val m0 = meta
    require(!m0.constraints.exists(_.name == name), s"constraint '$name' already exists")
    val dataCols = m0.currentSchema.columns.map(_.name)
    val refs = kind match {
      case "not_null" =>
        require(dataCols.contains(expr), s"not_null column '$expr' not in schema")
        Seq(expr)
      case "check" =>
        // resolve against the current schema: catches typos and captures the
        // referenced columns so enforcement can skip old-schema batches that
        // do not carry them yet
        val probe = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m0.currentSchema.toStruct)
        val checked = probe.select(F.expr(expr).as("__c"))
        require(checked.schema.head.dataType == org.apache.spark.sql.types.BooleanType,
          s"check expression '$expr' is not boolean")
        checked.queryExecution.analyzed.expressions
          .flatMap(_.references.map(_.name)).distinct.toSeq
    }
    val d = ConstraintDef(name, kind, expr, refs)
    if (m0.currentSnapshot.exists(_.files.nonEmpty)) {
      val cond = violationCond(d)
      val bad = currentState().filter(cond).count()
      require(bad == 0L, s"cannot add constraint '$name': $bad existing live row(s) violate it")
    }
    retryCommit { m =>
      require(!m.constraints.exists(_.name == name), s"constraint '$name' already exists")
      m.copy(constraints = m.constraints :+ d)
    }
  }

  /** Drop a constraint. Returns false if it did not exist. */
  def dropConstraint(name: String): Boolean = {
    var existed = false
    retryCommit { m =>
      existed = m.constraints.exists(_.name == name)
      m.copy(constraints = m.constraints.filterNot(_.name == name))
    }
    existed
  }

  private def violationCond(c: ConstraintDef): Column = c.kind match {
    case "not_null" => col(c.expr).isNull
    // ANSI CHECK: NULL result passes; only an explicit false violates
    case _ => !coalesce(F.expr(c.expr), lit(true))
  }

  /** (violation condition, constraint name) for every declared constraint a
    * batch with these columns can evaluate — a constraint referencing a
    * column an old-schema batch does not carry yet is skipped (it will bind
    * from the first schema version that has the column). Callers must
    * exempt op = "D" rows themselves (tombstone payloads are not rows). */
  def applicableConstraints(batchCols: Seq[String]): Seq[(Column, String)] =
    applicableConstraints(batchCols, meta)

  /** Same, against a caller-held metadata snapshot — hot paths that already
    * loaded `meta` must not pay (or race) a second disk load. */
  def applicableConstraints(batchCols: Seq[String], m: TableMeta): Seq[(Column, String)] = {
    val cols = batchCols.toSet
    m.constraints.filter(_.cols.forall(cols.contains))
      .map(c => violationCond(c) -> c.name)
  }

  /** Count violations per constraint with ONE aggregate over `rows` (only
    * called on paths that did not already probe the batch) and fail loudly
    * when any constraint is violated. */
  private def enforceConstraints(m: TableMeta, rows: DataFrame,
      opAware: Boolean): Unit = {
    if (m.constraints.isEmpty) return
    // filter the WRITE's own metadata snapshot `m` — applicableConstraints
    // re-loads meta from disk, which both costs a metadata load per write
    // and can disagree with the emptiness check above under a concurrent
    // add/drop constraint
    val cols = rows.columns.toSet
    val checks = m.constraints.filter(_.cols.forall(cols.contains))
      .map(c => violationCond(c) -> c.name)
    if (checks.isEmpty) return
    val aggs = checks.map { case (cond, name) =>
      val c = if (opAware) cond && col("op") =!= "D" else cond
      sum(when(c, 1L).otherwise(0L)).as(name)
    }
    val counts = rows.agg(aggs.head, aggs.tail: _*).head()
    val violated = checks.zipWithIndex.collect {
      case ((_, name), i) if !counts.isNullAt(i) && counts.getLong(i) > 0 =>
        s"$name=${counts.getLong(i)}"
    }
    if (violated.nonEmpty) throw new IllegalStateException(
      s"constraint violation(s) in write to $root: ${violated.mkString(", ")} " +
        "(fix the rows, route them through a CdcPipeline quarantine, or drop the constraint)")
  }

  /** Row-level change feed between two committed snapshots (net-changes
    * semantics, like Iceberg's changelog scan / Delta CDF): every key whose
    * LIVE value differs between `fromSnapshotId` and `toSnapshotId` (default
    * current) comes back once with `_change_type` ∈ {insert, update, delete}
    * — post-image for insert/update, pre-image for delete — plus the
    * winning `_lsn`. The generic downstream-consumer surface (the built-in
    * [[graft.cdc.JdbcWarehouseSync]] uses the cheaper lsn-watermark path;
    * `changes` serves consumers that need explicit deletes/updates keyed to
    * table versions rather than lsn ranges).
    *
    * Cost ∝ touched buckets, not table size: copy-on-write merge rewrites
    * whole bucket files, so the file-set symmetric difference between the
    * snapshots is exactly the buckets any intervening commit touched — only
    * those files are read, and the old/new full-outer join co-partitions on
    * the same keys. Layout-only rewrites (compact, vacuumed tombstones)
    * reproduce rows with their stored `_lsn`, so they compare equal and
    * yield an empty feed. Rows are compared by `_lsn`: the engine's LWW
    * invariant (same key + same lsn ⇒ identical payload, see merge) makes
    * that sufficient. Both sides are projected to the `to` snapshot's
    * schema by column id, so evolution between the versions is transparent.
    * `fromSnapshotId` must still be in metadata (retention must keep any
    * snapshot a consumer still needs to diff from). Requires merge-maintained
    * key uniqueness (one live row per key); append-mode duplicate keys would
    * cross-multiply in the diff join. */
  def changes(fromSnapshotId: Long, toSnapshotId: Option[Long] = None): DataFrame = {
    val m = meta
    val from = m.snapshotById(fromSnapshotId)
      .getOrElse(sys.error(s"no snapshot $fromSnapshotId (expired?)"))
    val to = toSnapshotId
      .map(id => m.snapshotById(id).getOrElse(sys.error(s"no snapshot $id")))
      .orElse(m.currentSnapshot).getOrElse(sys.error("empty table"))
    val fromPaths = from.files.map(_.path).toSet
    val toPaths = to.files.map(_.path).toSet
    val removed0 = from.files.filterNot(f => toPaths.contains(f.path))
    val added0 = to.files.filterNot(f => fromPaths.contains(f.path))
    // Merge-on-read widening: where the file diff touches DELTA files, the
    // file-granular sides are wrong — a delta commit removes nothing, so a
    // replaced key's pre-image lives in a KEPT file and the diff would
    // misread updates as inserts (and resolution needs complete bucket
    // sets anyway). Those buckets diff at BUCKET granularity: both sides
    // read the bucket's full file set (each LWW-resolved by readFiles),
    // and the equal-lsn filter below strips the untouched carry-over keys
    // exactly as it strips compaction copies. COW-only diffs keep the
    // tighter file-granular sides.
    val deltaBuckets = (removed0 ++ added0).filter(_.isDelta).map(_.bucket).toSet
    val removed = from.files.filter(f =>
      deltaBuckets.contains(f.bucket) || !toPaths.contains(f.path))
    val added = to.files.filter(f =>
      deltaBuckets.contains(f.bucket) || !fromPaths.contains(f.path))
    val dataCols = m.schemaById(to.schemaId).columns.map(_.name)
    // both sides keep tombstones: a key is "live" only when present AND not
    // deleted, but a new-side tombstone still carries the DELETING commit's
    // lsn (the feed's delete rows should order by when the delete happened,
    // not by the pre-image's last write)
    def side(files: Seq[DataFileMeta], tag: String): DataFrame =
      readFiles(m, files, to.schemaId)
        .select((dataCols :+ LsnCol :+ DeletedCol).map(col): _*)
        .withColumn(s"__${tag}_present", lit(true)).alias(tag)
    val o = side(removed, "o")
    val n = side(added, "n")
    val cond = m.keyCols.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val oLive = col("__o_present").isNotNull && !col(s"o.$DeletedCol")
    val nLive = col("__n_present").isNotNull && !col(s"n.$DeletedCol")
    val changeType = when(!nLive, lit("delete"))
      .when(!oLive, lit("insert")).otherwise(lit("update"))
    o.join(n, cond, "full_outer")
      // live→dead = delete, dead→live = insert, live→live with a different
      // winner lsn = update; equal-lsn live rows are bucket-rewrite copies
      // (compact/vacuum/merge carry-over), dead→dead is tombstone churn —
      // neither is a logical change (LWW invariant: same key + same lsn ⇒
      // identical payload, so lsn equality is a sufficient row comparison)
      .filter((oLive && !nLive) || (!oLive && nLive) ||
        (oLive && nLive && col(s"o.$LsnCol") =!= col(s"n.$LsnCol")))
      // image side by LIVENESS, not value coalesce: an update whose
      // post-image column is legitimately NULL must not leak the old value
      .select(dataCols.map(c =>
        when(nLive, col(s"n.$c")).otherwise(col(s"o.$c")).as(c)) ++ Seq(
        changeType.as("_change_type"),
        when(col("__n_present").isNotNull, col(s"n.$LsnCol"))
          .otherwise(col(s"o.$LsnCol")).as(LsnCol)): _*)
  }

  /** Expire old snapshots: keep the latest `keepLast`, drop older snapshot
    * entries from metadata and delete data files no surviving snapshot
    * references. Bounds table-directory growth under continuous ingest
    * (every COW merge supersedes whole bucket files; without expiry the
    * table retains every historical bucket file for time travel forever).
    *
    * `olderThanMs` adds wall-clock retention on top (Iceberg's
    * `older_than`): when set, only snapshots committed BEFORE that
    * epoch-millis instant are eligible — "expire everything older than 7
    * days but always keep the last 3" is `expireSnapshots(3,
    * Some(now - 7d))`. Wall clock here is operational retention policy,
    * not data-path state, so it does not violate replay determinism. */
  def expireSnapshots(keepLast: Int = 1, olderThanMs: Option[Long] = None): Long = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    var dead: Set[String] = Set.empty
    var deadManifests: Set[String] = Set.empty
    retryCommit { m =>
      val ordered = m.snapshots.sortBy(_.snapshotId)
      // retention pins: tagged snapshots (audit refs), open branch CHAINS
      // (staged WAP state — publishBranch walks the head's parent links down
      // to main's head, so expiring an intermediate branch snapshot would
      // sever the chain and permanently block publish), and main's current
      // head — with branches, the newest ids can all sit on a branch, so
      // "keep the last K" alone could otherwise expire the CURRENT main
      // snapshot. Only the branch-exclusive segment is pinned (the walk
      // stops at the first main-lineage snapshot): main history below the
      // fork keeps normal retention.
      val pinned = m.tags.values.toSet ++ m.branches.values ++
        m.branchExclusive + m.currentSnapshotId
      val (keepTail, older) = (ordered.takeRight(keepLast), ordered.dropRight(keepLast))
      // a snapshot survives if pinned, in the keep-last tail, or (when a
      // wall-clock cutoff is given) not yet old enough
      def retained(s: Snapshot): Boolean = pinned.contains(s.snapshotId) ||
        olderThanMs.exists(cut => s.wallClockMs >= cut)
      val keep = older.filter(retained) ++ keepTail
      val expired = older.filterNot(retained)
      if (expired.isEmpty) return 0L
      val live = keep.flatMap(_.files.map(_.path)).toSet
      dead = expired.flatMap(_.files.map(_.path)).toSet -- live
      // manifests are content-addressed and shared — reclaim only those no
      // retained snapshot still points at
      deadManifests = expired.map(_.manifestFile).filter(_.nonEmpty).toSet --
        keep.map(_.manifestFile).toSet
      // fold expired snapshots' epoch ids into the durable ledger: retention
      // must not reopen the exactly-once window (a replayed old epoch would
      // re-append rows or resurrect vacuumed deletes). Compacted to merged
      // SPANS (plus the legacy flat list, migrated here): a streaming table
      // retires one contiguous epoch per beat forever — the span form stays
      // O(gaps) instead of O(table lifetime) per metadata version.
      val spans = LsnSpan.normalize(m.retiredEpochSpans ++
        (m.retiredEpochs ++ expired.map(_.epochId).filter(_ >= 0))
          .map(e => LsnSpan(e - 1, e)))
      m.copy(snapshots = keep, retiredEpochs = Seq.empty,
        retiredEpochSpans = spans)
    }
    // physical deletion strictly AFTER the metadata commit — a failed commit
    // must never orphan-reference deleted files
    dead.foreach(rel => Files.deleteIfExists(Paths.get(root, rel)))
    deadManifests.foreach(n =>
      Files.deleteIfExists(Paths.get(root, "metadata", "manifests", n)))
    dead.size
  }

  /** Per-file stats from parquet footers — row counts and `_lsn` min/max
    * come free from file metadata (block statistics), replacing a cluster
    * job per commit with O(files) driver-side footer reads. (At real scale
    * these stats come back from the write tasks themselves; footer reads
    * are the equivalent for the file-system commit path.) */
  private def statsFromFooters(staging: Path, schemaId: Int,
      requireKeysNonNull: Boolean = false): Seq[DataFileMeta] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.collection.parallel.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val metaNow = load(root)
    // New-data commits (merge/append/replace) must not land null-key rows:
    // keys are the merge identity and the SQL schema declares them
    // non-nullable, so Catalyst folds `key IS NULL` to false and the
    // manifest COUNT(key) pushdown assumes no nulls — a null-key row would
    // be silently unreachable/miscounted. Parquet block stats carry null
    // counts, so the check rides the footer pass for free; the throw lands
    // inside commitOrClean, which removes the staged files. Maintenance
    // rewrites (compact/vacuum/rebucket) preserve rows and skip the check.
    val keySet: Set[String] = if (requireKeysNonNull) metaNow.keyCols.toSet else Set.empty
    // column-id + spark-type lookup for data-column min/max collection
    val colDefs = metaNow.schemaById(schemaId).columns
      .map(c => c.name -> (c.id, c.dataType)).toMap
    // footer reads are independent I/O — do them in parallel; a serial loop
    // over O(buckets) files is a fixed driver-side cost per commit that eats
    // into scaling efficiency (the commit doesn't get faster with cores)
    listParquet(staging).par.map { p =>
      val rel = Paths.get(root).relativize(p).toString
      val bucket = p.getParent.getFileName.toString.stripPrefix(s"$BucketCol=").toInt
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p.toString), conf))
      try {
        val blocks = reader.getFooter.getBlocks
        var cnt = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
        var tombstones = false
        var deletedColSeen = false
        // per-column running min/max as comparable values (BigDecimal for
        // numerics, String for strings); a column with ANY unusable block
        // stat is dropped (absence = "cannot prune", always safe)
        val accMin = scala.collection.mutable.Map.empty[Int, Any]
        val accMax = scala.collection.mutable.Map.empty[Int, Any]
        val invalid = scala.collection.mutable.Set.empty[Int]
        def lt(a: Any, b: Any): Boolean = (a, b) match {
          case (x: BigDecimal, y: BigDecimal) => x < y
          // UTF-8 binary order, matching parquet footer stats and the SQL
          // pruner's comparison — java.lang.String order (UTF-16 code units)
          // diverges for supplementary characters
          case (x: String, y: String) =>
            org.apache.spark.unsafe.types.UTF8String.fromString(x)
              .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0
          case _ => false
        }
        blocks.forEach { b =>
          cnt += b.getRowCount
          b.getColumns.forEach { c =>
            val name = c.getPath.toDotString
            val st = c.getStatistics
            val ok = st != null && !st.isEmpty && st.hasNonNullValue
            name match {
              case LsnCol if ok =>
                st.genericGetMin match {
                  case l: java.lang.Long =>
                    if (l < mn) mn = l
                    val hi = st.genericGetMax.asInstanceOf[java.lang.Long]
                    if (hi > mx) mx = hi
                  case _ =>
                }
              case DeletedCol =>
                deletedColSeen = true
                // no usable stats ⇒ conservatively assume tombstones present
                if (!ok) tombstones = true
                else st.genericGetMax match {
                  case bl: java.lang.Boolean => if (bl) tombstones = true
                  case _ => tombstones = true
                }
              case n if colDefs.contains(n) =>
                if (keySet.contains(n) && st != null && st.isNumNullsSet &&
                    st.getNumNulls > 0)
                  sys.error(s"write rejected: key column '$n' has " +
                    s"${st.getNumNulls} null value(s) in ${p.getFileName} — " +
                    "keys are the merge identity and must be non-null " +
                    "(the CDC path quarantines such events; direct callers " +
                    "must filter or repair them)")
                val (id, dt) = colDefs(n)
                if (!invalid.contains(id)) {
                  val parsed: Option[(Any, Any)] =
                    if (!ok) None
                    else scala.util.Try {
                      (st.genericGetMin, st.genericGetMax) match {
                        case (a: org.apache.parquet.io.api.Binary,
                              b2: org.apache.parquet.io.api.Binary) if dt == StringType =>
                          Some((a.toStringUsingUTF8: Any, b2.toStringUsingUTF8: Any))
                        case (a: java.lang.Number, b2: java.lang.Number)
                            if dt.isInstanceOf[NumericType] =>
                          Some((BigDecimal(a.toString): Any, BigDecimal(b2.toString): Any))
                        case _ => None
                      }
                    }.toOption.flatten
                  parsed match {
                    case Some((lo, hi)) =>
                      if (!accMin.contains(id) || lt(lo, accMin(id))) accMin(id) = lo
                      if (!accMax.contains(id) || lt(accMax(id), hi)) accMax(id) = hi
                    case None =>
                      invalid += id; accMin -= id; accMax -= id
                  }
                }
              case _ =>
            }
          }
        }
        if (cnt == 0) { mn = 0L; mx = 0L }
        // cap rendered length: min/max of a KB-sized content column would
        // bloat every metadata load (the merge path reads metadata per commit)
        def render(m: collection.Map[Int, Any]): Map[String, String] =
          m.iterator.map { case (id, v) => id.toString -> v.toString }
            .filter(_._2.length <= 64).toMap
        val (mins, maxs) = (render(accMin), render(accMax))
        val shared = mins.keySet.intersect(maxs.keySet) // both bounds or neither
        DataFileMeta(rel, bucket, schemaId, cnt, if (mn == Long.MaxValue) 0L else mn,
          if (mx == Long.MinValue) 0L else mx,
          colMins = mins.filter(kv => shared(kv._1)),
          colMaxs = maxs.filter(kv => shared(kv._1)),
          hasTombstones = tombstones || (!deletedColSeen && cnt > 0),
          sizeBytes = Files.size(p), statsUtf8 = true)
      } finally reader.close()
    }.seq.toSeq
  }

  // ------------------------------------------------------------- internals

  /** Sub-phase wall-clock diagnostic (GRAFT_PHASE_LOG=1), for pinning down
    * driver-side fixed costs that erode scaling efficiency. */
  private def timed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    if (sys.env.contains("GRAFT_PHASE_LOG"))
      println(f"[lake]  $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  /** Data columns cast to their declared types (storage-format guard for
    * ad-hoc callers passing narrower/NullType inputs). */
  private def typedDataColsOf(m: TableMeta): Seq[Column] =
    m.currentSchema.columns.map(c => col(c.name).cast(c.dataType).as(c.name))

  /** Write `df` to a fresh per-attempt staging directory. The unique token
    * means two concurrent writers starting from the same snapshot (e.g.
    * vacuum racing a merge) can never target the same dir — a deterministic
    * overwrite path would let the losing racer delete files the winner's
    * committed snapshot references. Crashed attempts leave unreferenced
    * (harmless) dirs, reaped by [[cleanOrphanedStaging]]. */
  private def stageWrite(df: DataFrame, snapshotId: Long): Path = {
    // token is path-only randomness — never on the data path (F12)
    val token = java.util.UUID.randomUUID().toString.take(8)
    val staging = Paths.get(root, f"data/snap-$snapshotId%012d-$token")
    // Parquet BLOOM FILTERS on the key columns: hash-distributed keys make
    // min/max row-group stats useless for point lookups (every group's range
    // spans the keyspace), but a bloom answers "key provably absent" per row
    // group — with the scan's per-file FilterPredicates (GraftParquetFilters)
    // a `WHERE key = x` reads 1 bucket (manifest) × ~1 row group (bloom) at
    // any table size. Adaptive sizing right-sizes the bitmap to each
    // group's observed NDV, so small files don't pay a fixed 1 MiB bloat.
    // Conf-gated (default on): spark.graft.keyBlooms=false turns it off for
    // benchmarking or ingest-only tables nobody point-queries. Tolerant
    // parse — a typo'd value must not start failing every commit.
    val blooms = spark.conf.getOption("spark.graft.keyBlooms")
      .forall(v => !Set("false", "0", "off", "no").contains(v.trim.toLowerCase))
    val keyed =
      if (!blooms) df.write
      else meta.keyCols.foldLeft(
        df.write.option("parquet.bloom.filter.adaptive.enabled", "true")) {
        (w, k) => w.option(s"parquet.bloom.filter.enabled#$k", "true")
      }
    keyed.partitionBy(BucketCol).parquet(staging.toString)
    staging
  }

  /** Run the metadata commit, deleting the staging dir if it throws
    * (lost optimistic race / persistent conflict): staged files must be
    * referenced by a successful commit or removed. */
  private def commitOrClean[A](staging: Path)(commit: => A): A =
    try commit catch {
      case e: Throwable =>
        // a simulated kill -9 must leave the staging dir behind exactly as
        // a dead process would — recovering it is cleanOrphanedStaging's
        // job, and the torture spec asserts precisely that
        if (!CommitFault.isSimulatedCrash(e)) deleteRecursively(staging)
        throw e
    }

  /** Reap write artifacts nothing references and older than `olderThanMs`:
    * staging dirs (crashed attempts, lost commit races whose cleanup itself
    * crashed) plus manifest files no retained snapshot points at (a lost
    * race rebased onto a different parent hashes to a DIFFERENT manifest, so
    * its first one is referenced by nothing — without this sweep the
    * manifests directory grows one file per lost data-changing race forever)
    * and stray `.tmp-` files from writers that died mid-write. The age guard
    * protects concurrent in-flight writers, whose artifacts are legitimately
    * unreferenced until their commit lands; manifest REUSE by an in-flight
    * commit freshens the file's mtime first (see [[externalize]]), so a
    * reused-then-still-uncommitted manifest is equally protected. Deletes
    * re-stat the mtime immediately before removing (a freshen that landed
    * after the listing rescues the file; a vanished file is skipped, not an
    * error), and the committer re-asserts its manifests exist AFTER its
    * version lands (see [[tryWriteVersion]]) — together these close the
    * reuse-vs-sweep window down to adjacent syscalls on both sides, and the
    * post-commit re-assert heals even that by re-creating the
    * content-addressed file. */
  def cleanOrphanedStaging(olderThanMs: Long = 3600000L): Int = {
    val m = meta
    val referenced = m.snapshots
      .flatMap(_.files.map(f => Paths.get(root).resolve(f.path).getParent.getParent))
      .toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    // vanished-while-sweeping is normal on a live table (a committer's tmp
    // file, a concurrent expiry's reclaim): treat it as "not an orphan"
    def mtimeBefore(p: Path, t: Long): Boolean =
      try Files.getLastModifiedTime(p).toMillis < t
      catch { case _: java.io.IOException => false }
    val candidates = {
      val s = Files.list(dataRoot)
      try s.iterator().asScala.filter(Files.isDirectory(_)).toSeq finally s.close()
    }
    val orphans = candidates.filterNot(referenced.contains)
      .filter(mtimeBefore(_, cutoff))
    orphans.foreach(deleteRecursively)

    val keepManifests = m.snapshots.map(_.manifestFile).filter(_.nonEmpty).toSet
    def sweepTmp(dir: Path, alsoManifests: Boolean): Int = {
      if (!Files.isDirectory(dir)) return 0
      val listed = {
        val s = Files.list(dir)
        try s.iterator().asScala.filter { p =>
          val n = p.getFileName.toString
          (n.startsWith(".tmp-") || (alsoManifests && n.startsWith("m-"))) &&
            !keepManifests.contains(n) && mtimeBefore(p, cutoff)
        }.toList finally s.close()
      }
      // re-stat at the instant of deletion: an in-flight reuse freshens the
      // mtime (externalize), so a manifest that became referenced since the
      // listing is rescued here instead of deleted
      listed.count(p => mtimeBefore(p, cutoff) && Files.deleteIfExists(p))
    }
    orphans.size + sweepTmp(metaDir.resolve("manifests"), alsoManifests = true) +
      sweepTmp(metaDir, alsoManifests = false)
  }

  /** Read an explicit data-file subset (incremental view maintenance diffs
    * per-snapshot file sets; scan cost is the caller's responsibility). */
  private[graft] def readFileSubset(files: Seq[DataFileMeta], targetSchemaId: Int): DataFrame =
    readFiles(meta, files, targetSchemaId)

  /** Read a set of data files, projecting every file group (by the schema
    * it was written under) into `targetSchemaId` via column-ID mapping.
    *
    * Merge-on-read: when the set contains DELTA files (see
    * [[DataFileMeta.isDelta]]) a key may appear in several files, newer
    * layers superseding older ones — the raw union is LWW-resolved to one
    * row per key by (lsn, tombstone-priority) before serving. Pure-base
    * sets (the copy-on-write invariant: one row per key) skip the
    * resolution entirely, so COW tables pay nothing. Resolution is sound
    * only over COMPLETE per-bucket file sets; callers that read partial
    * subsets of a delta-carrying bucket must use [[readFilesRaw]] and own
    * the semantics (vacuum/compact simply refuse delta files instead). */
  private def readFiles(m: TableMeta, files: Seq[DataFileMeta], targetSchemaId: Int): DataFrame = {
    val raw = readFilesRaw(m, files, targetSchemaId)
    if (!files.exists(_.isDelta)) raw
    else resolveLww(m, raw, targetSchemaId)
  }

  /** LWW winner per key over possibly-layered rows: the same native
    * ObjectHashAggregate the write path uses (map-side partial agg, no
    * sort/window), with stored-row priorities (tombstone beats live on the
    * impossible-by-invariant lsn tie, mirroring `Dedup.opPriority`). */
  private def resolveLww(m: TableMeta, df: DataFrame, targetSchemaId: Int): DataFrame = {
    graft.functions.LwwMaxBy.tuneSession(spark)
    val cols = m.schemaById(targetSchemaId).columns.map(_.name) ++
      Seq(LsnCol, DeletedCol)
    val pri = graft.cdc.Dedup.opPriority(
      when(col(DeletedCol), lit("D")).otherwise(lit("S")))
    df.groupBy(m.keyCols.map(col): _*)
      .agg(graft.functions.LwwMaxBy.lwwMaxBy(
        struct(cols.map(col): _*), col(LsnCol), pri).as("__w"))
      .select(col("__w.*"))
  }

  private def readFilesRaw(m: TableMeta, files: Seq[DataFileMeta], targetSchemaId: Int): DataFrame = {
    val target = m.schemaById(targetSchemaId)
    val extra = metaCols(m)
    if (files.isEmpty) {
      val full = StructType(target.toStruct.fields ++ extra)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
    }
    files.groupBy(_.schemaId).map { case (sid, fs) =>
      val written = m.schemaById(sid)
      val writtenById = written.byId
      val df = spark.read
        .schema(StructType(written.toStruct.fields ++ extra))
        .parquet(fs.map(f => s"$root/${f.path}"): _*)
      val projected = target.columns.map { c =>
        writtenById.get(c.id) match {
          case Some(old) if old.dataTypeJson == c.dataTypeJson => col(old.name).as(c.name)
          case Some(old) => col(old.name).cast(c.dataType).as(c.name)
          case None => lit(null).cast(c.dataType).as(c.name)
        }
      } ++ extra.map(f => col(f.name))
      df.select(projected: _*)
    }.reduce(_ unionByName _)
  }

  private def metaCols(m: TableMeta): Seq[StructField] = Seq(
    StructField(LsnCol, LongType, nullable = false),
    StructField(DeletedCol, BooleanType, nullable = false))

  private def retryCommit(f: TableMeta => TableMeta): Unit = {
    var attempts = 0
    while (true) {
      val m = load(root)
      val next = f(m).copy(version = m.version + 1)
      if (tryWriteVersion(metaDir, next, commitIo)) return
      attempts += 1
      if (attempts > 5) sys.error(s"commit conflict persisted after $attempts attempts at $root")
    }
  }
}

object LakeTable {
  val LsnCol = "_lsn"
  val DeletedCol = "_deleted"
  val BucketCol = "__b"
  val ChangeCols: Seq[String] = Seq("lsn", "op")

  /** Resolve the commit backend a table's properties declare ("commit.io":
    * "posix" (default) | "conditional-put" — the S3-style whole-object
    * conditional-PUT mode). Persisted WITH the table so every handle
    * (catalog loads, SQL writes, streaming commits) publishes through the
    * right primitive without threading. */
  val CommitIoModes: Set[String] = Set("posix", "conditional-put")

  private[graft] def resolveIo(root: String, props: Map[String, String]): CommitIo =
    props.get("commit.io") match {
      case Some("conditional-put") => new ObjectStoreCommitIo(Paths.get(root, ".store"))
      case Some("posix") | None => PosixCommitIo
      case Some(other) =>
        sys.error(s"unknown commit.io '$other' (posix | conditional-put)")
    }

  def create(spark: SparkSession, root: String, schema: StructType,
      keyCols: Seq[String], lsnCol: String = "lsn",
      numBuckets: Int = 32,
      tableId: Option[String] = None,
      io: CommitIo = null,
      properties: Map[String, String] = Map.empty): LakeTable = {
    require(keyCols.forall(schema.fieldNames.contains), "key cols must be in schema")
    val metaDir = Paths.get(root, "metadata")
    Files.createDirectories(metaDir)
    Files.createDirectories(Paths.get(root, "data"))
    val m = TableMeta(
      formatVersion = 1,
      // metadata-only id, not on the data path; callers may pin a
      // deterministic id to mark DERIVED tables they own (ViewMaintainer
      // stamps "view:<base-id>:<name>" so a refresh can never clobber an
      // unrelated table that happens to share the name)
      tableId = tableId.getOrElse(java.util.UUID.randomUUID().toString),
      location = root,
      keyCols = keyCols, lsnCol = lsnCol, numBuckets = numBuckets,
      schemas = Seq(TableMeta.schemaVersionOf(1, schema, 1)),
      currentSchemaId = 1,
      snapshots = Seq.empty, currentSnapshotId = 0L, version = 0L,
      properties = properties)
    // validate the declared backend even when an explicit io overrides it:
    // an invalid value would persist silently and detonate on the first
    // default open; a CONTRADICTORY explicit io would commit v1 through a
    // different primitive than every later handle resolves (review finding)
    val declared = resolveIo(root, properties)
    val useIo = if (io != null) io else declared
    require(io == null || !properties.contains("commit.io") ||
      io.name == declared.name,
      s"explicit commit io '${useIo.name}' contradicts declared " +
        s"commit.io '${properties("commit.io")}'")
    // an explicit non-posix io with NO declared commit.io would commit v1
    // through that backend while every later default open resolves posix — a
    // silent mixed-backend table (ADVICE r5). Persist the matching mode so
    // default opens route through the same primitive; an explicit io whose
    // backend has no named mode must be declared by the caller.
    val ioMode = Map("posix" -> "posix", "store" -> "conditional-put")
    val mFinal =
      if (io != null && !properties.contains("commit.io") && io.name != "posix") {
        require(ioMode.contains(io.name),
          s"explicit commit io '${io.name}' has no commit.io mode — declare " +
            "one in properties so later default opens resolve the same backend")
        m.copy(properties = properties + ("commit.io" -> ioMode(io.name)))
      } else m
    require(tryWriteVersion(metaDir, mFinal.copy(version = 1L), useIo),
      s"table exists at $root")
    new LakeTable(spark, root, useIo)
  }

  /** Open an existing table. `io = null` (the default) resolves the commit
    * backend from the table's own `commit.io` property — explicit values
    * override (test harnesses, migrations between backends). */
  def forPath(spark: SparkSession, root: String,
      io: CommitIo = null): LakeTable = {
    require(exists(root), s"no lake table at $root")
    // raw parse of the latest version file only: resolveIo needs the
    // properties map, never the hydrated manifests — a full load() here
    // would double the metadata work of every table open (review finding)
    val useIo = if (io != null) io else resolveIo(root, rawProperties(root))
    new LakeTable(spark, root, useIo)
  }

  /** Properties of the latest committed version, without manifest
    * hydration. The latest version file is never pruned (retention keeps a
    * 64-version window behind it), so the direct read is safe. */
  private def rawProperties(root: String): Map[String, String] = {
    val d = Paths.get(root, "metadata")
    val v = latestVersion(d).getOrElse(sys.error(s"no metadata at $root"))
    TableMeta.fromJson(Files.readString(d.resolve(f"v$v%012d.json"))).properties
  }

  /** Session-free metadata read — for callers that only need the table's
    * metadata (schema version trackers, catalogs listing tables) and must
    * not depend on a live SparkSession. */
  def metaAt(root: String): TableMeta = load(root)

  def exists(root: String): Boolean = {
    val d = Paths.get(root, "metadata")
    Files.isDirectory(d) && latestVersion(d).isDefined
  }

  def createOrReplace(spark: SparkSession, root: String, schema: StructType,
      keyCols: Seq[String], numBuckets: Int = 32,
      io: CommitIo = null,
      properties: Map[String, String] = Map.empty): LakeTable = {
    val p = Paths.get(root)
    if (Files.exists(p)) deleteRecursively(p)
    create(spark, root, schema, keyCols, numBuckets = numBuckets, io = io,
      properties = properties)
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }

  private[lake] def load(root: String): TableMeta = {
    val d = Paths.get(root, "metadata")
    // A concurrent expiry/dropBranch can reclaim a manifest between our
    // version read and hydration (the metadata twin of reading an expired
    // snapshot's data files). Unlike data files, metadata self-heals: the
    // reclaim only happens AFTER a newer version (which no longer references
    // the manifest) committed, so re-resolving the latest version makes
    // progress. Retry only while the latest version actually advances.
    var lastSeen = -1L
    while (true) {
      val v = latestVersion(d).getOrElse(sys.error(s"no metadata at $root"))
      try return hydrate(d, TableMeta.fromJson(Files.readString(d.resolve(f"v$v%012d.json"))))
      catch {
        case e: java.nio.file.NoSuchFileException =>
          if (v == lastSeen) throw e // nothing newer to heal from
          lastSeen = v
      }
    }
    sys.error("unreachable")
  }

  /** Process-wide cache of hydrated manifest files. Manifests are immutable
    * AND content-addressed (name = sha-256 of content), so a cache entry can
    * never go stale — even a delete-and-recreate of the same name carries
    * identical content by construction. Metadata loads happen every
    * commit/beat; without the cache a long-lived driver would re-parse every
    * retained snapshot's manifest on each of them. Bounded by approximate
    * BYTE weight (a stats-bearing DataFileMeta is ~0.5–2 KB: path string +
    * two per-column min/max maps), not entry count — one 100 TB table's
    * manifest alone holds ~10^5 file entries, so a count bound either OOMs
    * before it fires or, when it fires, evicts the hot current-snapshot
    * manifests along with the cold ones. LRU (access-order) eviction keeps
    * the manifests every load touches. */
  private val manifestCacheMaxBytes = 256L << 20
  private var manifestCacheBytes = 0L
  private val manifestCache =
    new java.util.LinkedHashMap[String, Seq[DataFileMeta]](64, 0.75f, true)

  private def manifestWeight(files: Seq[DataFileMeta]): Long =
    files.foldLeft(0L)((a, f) => a + 160L + 2L * f.path.length +
      (f.colMins.size + f.colMaxs.size) * 96L)

  /** Get-or-load. The lock covers only the map check/insert — the disk read
    * + JSON parse of a miss runs OUTSIDE it, so hydrating one table's large
    * manifest never blocks another table's cache hit (racing duplicate loads
    * are benign: content-addressed, same value). Eviction drops
    * least-recently-used entries until the weight bound holds; the entry
    * just touched is never evicted. */
  private def cachedManifest(path: String): Seq[DataFileMeta] = {
    val hit = manifestCache.synchronized(manifestCache.get(path))
    if (hit != null) return hit
    val files = TableMeta.manifestFromJson(Files.readString(Paths.get(path)))
    manifestCache.synchronized(cacheManifestLocked(path, files))
    files
  }

  private def cacheManifestLocked(path: String, files: Seq[DataFileMeta]): Unit = {
    if (manifestCache.put(path, files) == null)
      manifestCacheBytes += manifestWeight(files)
    val it = manifestCache.entrySet().iterator()
    while (manifestCacheBytes > manifestCacheMaxBytes && it.hasNext) {
      val e = it.next() // access-order: least recently used first
      if (e.getKey != path) {
        manifestCacheBytes -= manifestWeight(e.getValue)
        it.remove()
      }
    }
  }

  /** Fill each snapshot's `files` from its manifest pointer. Legacy version
    * files (inline lists, empty pointer) pass through untouched. */
  private def hydrate(metaDir: Path, raw: TableMeta): TableMeta = {
    if (raw.snapshots.forall(_.manifestFile.isEmpty)) return raw
    val dir = metaDir.resolve("manifests")
    raw.copy(snapshots = raw.snapshots.map { s =>
      if (s.manifestFile.isEmpty) s
      else s.copy(files = cachedManifest(dir.resolve(s.manifestFile).toString))
    })
  }

  /** Iceberg-style manifest indirection on the write side: externalize every
    * not-yet-externalized snapshot's file list into an immutable
    * content-addressed manifest file, and strip the inline lists from the
    * version file. Snapshots hydrated from a previous version keep their
    * pointer (no loaded snapshot's file list is ever mutated — verified
    * invariant: all Snapshot constructions build fresh instances), so a
    * commit writes exactly the NEW snapshot's manifest — O(its files), not
    * O(retained snapshots × files). Content addressing makes the write
    * idempotent across commit-race retries (same staged files ⇒ same hash ⇒
    * reuse) and dedups identical file sets outright: a rollback's restored
    * snapshot or a metadata-only commit shares its target's/parent's
    * manifest at zero cost. */
  private def externalize(metaDir: Path, m: TableMeta, io: CommitIo): TableMeta = {
    if (m.snapshots.isEmpty) return m
    val dir = metaDir.resolve("manifests")
    m.copy(snapshots = m.snapshots.map { s =>
      if (s.manifestFile.nonEmpty) s.copy(files = Seq.empty)
      else {
        val json = TableMeta.manifestJson(s.files)
        val name = "m-" + sha256Hex(json).take(32) + ".json"
        ensureManifestFile(dir, name, json, io)
        manifestCache.synchronized {
          cacheManifestLocked(dir.resolve(name).toString, s.files)
        }
        s.copy(files = Seq.empty, manifestFile = name)
      }
    })
  }

  /** Create-or-protect one content-addressed manifest file: write it
    * atomically if absent; if present (reuse — possibly a currently-ORPHANED
    * manifest from a lost race with an identical file set), freshen its
    * mtime so the age-guarded orphan reclaim cannot sweep it between this
    * check and the version link landing. A freshen failure FAILS the commit
    * (safe: the caller cleans staging and retries) — silently proceeding
    * could publish a version whose manifest the sweeper still sees as
    * expired. Idempotent by content addressing. */
  private def ensureManifestFile(dir: Path, name: String, json: String,
      io: CommitIo): Unit = {
    val f = dir.resolve(name)
    if (!Files.exists(f)) {
      // atomic create-if-absent; a concurrent identical write is benign
      // (content-addressed — the loser's bytes are the winner's bytes)
      io.putIfAbsent(f, json)
      ()
    } else io.freshen(f)
  }

  /** Iceberg's previous-versions retention: superseded version files are
    * never read again (every load resolves the LATEST version), so keep a
    * bounded debugging window and delete the rest — otherwise the metadata
    * dir grows one file per commit forever and `latestVersion`'s listing
    * becomes O(total table commits). Reader-safe: a reader only opens the
    * newest version it just listed, always inside the retained window. */
  private val PreviousVersionsMax = 64L
  private def pruneOldVersions(metaDir: Path, current: Long): Unit = {
    val cutoff = current - PreviousVersionsMax
    if (cutoff <= 0) return
    val s = Files.list(metaDir)
    val old = try s.iterator().asScala.filter { p =>
      val n = p.getFileName.toString
      n.startsWith("v") && n.endsWith(".json") &&
        n.stripPrefix("v").stripSuffix(".json").toLongOption.exists(_ < cutoff)
    }.toList finally s.close()
    old.foreach(Files.deleteIfExists(_))
  }

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private[lake] def latestVersion(metaDir: Path): Option[Long] = {
    if (!Files.isDirectory(metaDir)) return None
    // Files.list streams hold a directory fd until closed — a long-running
    // streaming driver loads metadata every micro-batch and would leak one
    // fd per load without the explicit close
    val s = Files.list(metaDir)
    val vs = try {
      s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
        .toSeq
    } finally s.close()
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Atomic create-if-absent of the next metadata version — the whole
    * optimistic-concurrency protocol is one [[CommitIo.putIfAbsent]] of the
    * version file: a concurrent writer that won the name makes it return
    * false. The backend decides the mechanism ([[PosixCommitIo]]: temp file
    * + link(2) EEXIST, as HDFS create-no-overwrite; [[ObjectStoreCommitIo]]:
    * S3-style conditional PUT) — nothing above this call may assume
    * rename/link semantics, which is what lets the same commit path run on
    * an object store (CommitTortureSpec runs both). */
  private[lake] def tryWriteVersion(metaDir: Path, m: TableMeta,
      io: CommitIo = PosixCommitIo): Boolean = {
    val target = metaDir.resolve(f"v${m.version}%012d.json")
    if (Files.exists(target)) return false
    val ext = externalize(metaDir, m, io)
    val linked = io.putIfAbsent(target, TableMeta.toJson(ext))
    if (linked) CommitFault.hit(s"version.published:${target.getFileName}")
    // The conditional put decided commit durability; everything below is
    // best-effort housekeeping that must NEVER make a durable commit look
    // failed — the data-writing callers wrap this in commitOrClean, which
    // would delete the staged files the just-published version references.
    // Non-fatal failures are logged, never rethrown; interruption is
    // re-flagged.
    try {
      if (linked) {
        // Heal the last sliver of the reuse-vs-sweep race: a sweeper that
        // stat'ed a reused manifest as expired BEFORE our freshen landed may
        // have deleted it just now — re-create any missing manifest from the
        // hydrated lists we still hold (content-addressed ⇒ idempotent;
        // exists() is one stat per retained snapshot).
        val mdir = metaDir.resolve("manifests")
        ext.snapshots.zip(m.snapshots).foreach { case (e, orig) =>
          if (e.manifestFile.nonEmpty && !Files.exists(mdir.resolve(e.manifestFile)))
            ensureManifestFile(mdir, e.manifestFile,
              TableMeta.manifestJson(orig.files), io)
        }
        pruneOldVersions(metaDir, m.version)
      }
    } catch {
      case _: InterruptedException => Thread.currentThread().interrupt()
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] post-commit housekeeping failed " +
          s"(commit v${m.version} is durable): $e")
    }
    linked
  }

  private[lake] def listParquet(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq.sortBy(_.toString)
    finally s.close()
  }

  private[lake] def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (IntegerType, LongType) => true
    case (IntegerType, DoubleType) => true
    case (FloatType, DoubleType) => true
    case (ShortType, IntegerType | LongType) => true
    case (d1: DecimalType, d2: DecimalType) =>
      d2.precision >= d1.precision && d2.scale >= d1.scale
    case _ => false
  }
}
