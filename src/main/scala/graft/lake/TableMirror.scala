package graft.lake

import org.apache.spark.sql.functions._

/** Lake-to-lake incremental replication: keep a destination lake table equal
  * to a source table's live state, one beat at a time, reading only what
  * changed (reference analogue: the 10-minute incremental sync into the
  * warehouse, `sync/sync_base.py` — here both ends are lake tables, the
  * multi-region / disaster-recovery / dev-fork shape).
  *
  * Each `syncOnce` beat diffs the source between the last mirrored snapshot
  * and the current one via [[LakeTable.changes]] (cost ∝ touched buckets —
  * COW merges rewrite whole bucket files, so unchanged data is never read)
  * and applies the delta as a native LWW merge carrying the SOURCE lsns, so
  * deletes propagate and replays are idempotent. The merge commits under
  * epochId = source snapshot id against the destination's epoch ledger:
  * exactly-once per source snapshot range even when a crash lands between
  * the merge commit and the watermark property update (the replayed epoch
  * no-ops; the re-merged rows tie on identical (key, lsn) payloads).
  *
  * The watermark (`mirror.source.snapshot`) lives in the DESTINATION table's
  * metadata, so the mirror state travels with the table it protects. State
  * diffs are exact across source rollbacks and vacuums by construction (they
  * compare snapshots, not lsn ranges) — the only gap is RETENTION: when the
  * watermark snapshot has expired on the source, the diff base is gone and
  * the beat degrades to a full resync (replace with the source's live
  * state), exactly once, loudly reported in the result.
  *
  * The destination is ownership-stamped (`tableId = mirror:<source-id>`):
  * syncOnce refuses to clobber an unrelated table that happens to live at
  * the destination path. Source schema evolution is mirrored by NAME before
  * each beat (add / widen / drop; a rename arrives as drop+add — the data
  * still replicates exactly, column history does not).
  */
object TableMirror {
  val WatermarkProp = "mirror.source.snapshot"

  def destTableId(srcTableId: String): String = s"mirror:$srcTableId"

  /** One replication beat. `mode` ∈ bootstrap | incremental | resync | noop. */
  case class MirrorSync(mode: String, fromSnapshot: Long, toSnapshot: Long,
      rowsApplied: Long)

  def syncOnce(src: LakeTable, destRoot: String): MirrorSync = {
    val srcMeta = src.meta
    val toSnap = srcMeta.currentSnapshotId
    val dest: LakeTable =
      if (!LakeTable.exists(destRoot))
        LakeTable.create(src.spark, destRoot, srcMeta.currentSchema.toStruct,
          srcMeta.keyCols, srcMeta.lsnCol, srcMeta.numBuckets,
          tableId = Some(destTableId(srcMeta.tableId)))
      else {
        val d = LakeTable.forPath(src.spark, destRoot)
        require(d.meta.tableId == destTableId(srcMeta.tableId),
          s"$destRoot is not a mirror of this source (tableId ${d.meta.tableId}); " +
            "refusing to overwrite an unrelated table")
        d
      }
    if (toSnap == 0L) return MirrorSync("noop", -1L, toSnap, 0L)

    alignSchema(srcMeta, dest)
    val watermark = dest.meta.properties.get(WatermarkProp).map(_.toLong)

    val sync = watermark match {
      case Some(from) if from == toSnap => MirrorSync("noop", from, toSnap, 0L)
      case Some(from) if srcMeta.snapshotById(from).isDefined =>
        val feed = src.changes(from, Some(toSnap))
        val delta = feed
          .withColumn("op",
            when(col("_change_type") === "delete", lit("D")).otherwise(lit("U")))
          .withColumnRenamed(LakeTable.LsnCol, "lsn")
          .drop("_change_type")
        val applied = dest.merge(delta, epochId = toSnap)
          .map(_.map(_.rowsApplied).sum).getOrElse(0L)
        MirrorSync("incremental", from, toSnap, applied)
      case stale => // never synced, or the diff base expired on the source
        val live = src.read().filter(!col(LakeTable.DeletedCol))
          .select(srcMeta.currentSchema.columns.map(c => col(c.name)) :+
            col(LakeTable.LsnCol).as("lsn"): _*)
        dest.replace(live, epochId = toSnap)
        // row count from the committed manifest — no second source scan
        val rows = dest.meta.currentSnapshot.map(_.files.map(_.rowCount).sum)
          .getOrElse(0L)
        MirrorSync(if (stale.isEmpty) "bootstrap" else "resync",
          stale.getOrElse(-1L), toSnap, rows)
    }
    if (sync.mode != "noop")
      dest.setProperty(WatermarkProp, Some(toSnap.toString))
    sync
  }

  /** Mirror the source's CURRENT schema onto the destination by column
    * name: add missing columns, widen narrower ones, drop extras. Fails
    * loudly on a narrowing (a mirror must never lose source data). */
  private def alignSchema(srcMeta: TableMeta, dest: LakeTable): Unit = {
    val want = srcMeta.currentSchema.columns
    val have = dest.meta.currentSchema.columns
    val haveByName = have.map(c => c.name -> c).toMap
    val wantNames = want.map(_.name).toSet
    val changes: Seq[SchemaChange] =
      have.collect { case c if !wantNames.contains(c.name) => DropColumn(c.name) } ++
        want.flatMap { c =>
          haveByName.get(c.name) match {
            case None => Some(AddColumn(c.name, c.dataType, c.nullable))
            case Some(d) if d.dataTypeJson != c.dataTypeJson =>
              Some(WidenType(c.name, c.dataType)) // evolveSchema rejects narrowing
            case _ => None
          }
        }
    if (changes.nonEmpty) dest.evolveSchema(changes)
  }
}
