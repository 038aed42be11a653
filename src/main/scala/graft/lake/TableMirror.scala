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
  * the destination path. Source schema evolution is mirrored before each
  * beat by diffing the source's OWN schema history by column id (the last
  * mirrored schemaId is recorded on the destination): a source rename is
  * replayed as a true rename — never drop+add, which would null the column
  * for every key not later rewritten (and permanently wedge the mirror if
  * the renamed column is a key). Legacy mirrors without the recorded
  * schemaId fall back to a by-name diff once, then record it.
  */
object TableMirror {
  val WatermarkProp = "mirror.source.snapshot"
  val SchemaProp = "mirror.source.schema"

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
    // the delta transform claims 'op'/'lsn' and the feed claims
    // '_change_type': a source DATA column with one of those names would be
    // silently overwritten (op) or make every merge ambiguous (lsn) —
    // refuse loudly instead (names compared the way Spark resolves them:
    // case-insensitively)
    val reserved = Set("op", "lsn", "_change_type")
    val clash = srcMeta.currentSchema.columns.map(_.name)
      .filter(n => reserved.contains(n.toLowerCase(java.util.Locale.ROOT)))
    require(clash.isEmpty,
      s"source data column(s) ${clash.mkString(", ")} collide with the " +
        "mirror's reserved envelope names (op, lsn, _change_type): rename " +
        "them before mirroring")

    alignSchema(srcMeta, dest)
    val watermark = dest.meta.properties.get(WatermarkProp).map(_.toLong)

    val sync = watermark match {
      case Some(from) if from == toSnap => MirrorSync("noop", from, toSnap, 0L)
      case Some(from) if srcMeta.snapshotById(from).isDefined =>
        val feed = src.changes(from, Some(toSnap))
        // changes() emits the SNAPSHOT's schema; the dest was just aligned
        // to the source's CURRENT schema. When the source evolved after its
        // last data commit the two differ — project by COLUMN ID in one
        // select: survivors take their current name, vanished ids drop, and
        // columns added after the snapshot null-fill (exact: the source's
        // own stored value for every pre-add row is null too)
        val snapSchema = srcMeta.schemaById(
          srcMeta.snapshotById(toSnap).get.schemaId)
        val cur = srcMeta.currentSchema
        val curById = cur.byId
        val snapIds = snapSchema.columns.map(_.id).toSet
        val dataCols = snapSchema.columns.flatMap(c =>
          curById.get(c.id).map(cc => col(c.name).as(cc.name)))
        val addedCols = cur.columns.filterNot(c => snapIds.contains(c.id))
          .map(c => lit(null).cast(c.dataType).as(c.name))
        val delta = feed.select(dataCols ++ addedCols :+
          when(col("_change_type") === "delete", lit("D")).otherwise(lit("U")).as("op") :+
          col(LakeTable.LsnCol).as("lsn"): _*)
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

  /** Mirror the source's CURRENT schema onto the destination. The exact
    * path diffs the source's schema HISTORY by column id (source column ids
    * are stable across renames — TableMeta's Iceberg-style rule), from the
    * last schemaId this mirror aligned to (`mirror.source.schema` property)
    * to the current one: same id + new name → RenameColumn, new id →
    * AddColumn, vanished id → DropColumn, same id + wider type → WidenType
    * (evolveSchema rejects narrowing — a mirror must never lose source
    * data). A legacy destination without the recorded schemaId (or whose
    * recorded version aged out of the source's history) falls back to a
    * BY-NAME diff once — renames degrade to drop+add there — and records
    * the schemaId for every later beat. */
  private def alignSchema(srcMeta: TableMeta, dest: LakeTable): Unit = {
    val baseId = dest.meta.properties.get(SchemaProp).map(_.toInt)
    val changes: Seq[SchemaChange] = baseId match {
      case Some(b) if b == srcMeta.currentSchemaId => Seq.empty
      case Some(b) if srcMeta.schemas.exists(_.schemaId == b) =>
        diffById(srcMeta.schemaById(b), srcMeta.currentSchema)
      case _ =>
        diffByName(srcMeta.currentSchema.columns, dest.meta.currentSchema.columns)
    }
    // crash-safety: evolveSchema and the SchemaProp update are two separate
    // metadata commits. If a previous beat died between them, the dest
    // ALREADY matches the target (evolveSchema applies its whole change
    // list in one atomic commit) and re-applying would require-fail
    // forever — detect the already-aligned case and just record the id.
    def aligned: Boolean =
      dest.meta.currentSchema.columns.map(c => (c.name, c.dataTypeJson)) ==
        srcMeta.currentSchema.columns.map(c => (c.name, c.dataTypeJson))
    if (changes.nonEmpty && !aligned) dest.evolveSchema(changes)
    if (!baseId.contains(srcMeta.currentSchemaId))
      dest.setProperty(SchemaProp, Some(srcMeta.currentSchemaId.toString))
  }

  /** Exact change list between two versions of the SOURCE schema, keyed by
    * column id. Order matters for sequential apply: drops first (freeing
    * names a rename may take), then renames, then widens (which refer to
    * post-rename names), then adds. A name-swap pair of renames (a→b, b→a)
    * is refused downstream by evolveSchema's target-exists check — loud,
    * not silent. */
  private def diffById(old: SchemaVersion, now: SchemaVersion): Seq[SchemaChange] = {
    val oldById = old.byId
    val nowById = now.byId
    val drops = old.columns.filterNot(c => nowById.contains(c.id))
      .map(c => DropColumn(c.name))
    val renames = orderRenames(now.columns.flatMap(c => oldById.get(c.id).collect {
      case o if o.name != c.name => RenameColumn(o.name, c.name)
    }))
    val widens = now.columns.flatMap(c => oldById.get(c.id).collect {
      case o if o.dataTypeJson != c.dataTypeJson => WidenType(c.name, c.dataType)
    })
    val adds = now.columns.filterNot(c => oldById.contains(c.id))
      .map(c => AddColumn(c.name, c.dataType, c.nullable))
    drops ++ renames ++ widens ++ adds
  }

  /** Dependency-order the renames for sequential apply: a rename whose
    * TARGET name is still the SOURCE of a pending rename must wait for that
    * rename to free the name (chained b→c, a→b across one diff window would
    * otherwise apply a→b first and trip evolveSchema's target-exists guard,
    * wedging the mirror on a legal source evolution). A true name-swap
    * CYCLE (a→b, b→a) makes no progress here and falls through unordered —
    * evolveSchema then refuses it loudly, as documented. */
  private def orderRenames(rs: Seq[RenameColumn]): Seq[RenameColumn] = {
    var pending = rs
    val out = Seq.newBuilder[RenameColumn]
    var progress = true
    while (pending.nonEmpty && progress) {
      val sources = pending.map(_.from).toSet
      val (ready, rest) = pending.partition(r => !sources.contains(r.to))
      progress = ready.nonEmpty
      out ++= ready
      pending = rest
    }
    out.result() ++ pending
  }

  /** Fallback by-name diff (legacy mirrors only): renames are indistinguishable
    * from drop+add here. */
  private def diffByName(want: Seq[ColumnDef], have: Seq[ColumnDef]): Seq[SchemaChange] = {
    val haveByName = have.map(c => c.name -> c).toMap
    val wantNames = want.map(_.name).toSet
    have.collect { case c if !wantNames.contains(c.name) => DropColumn(c.name) } ++
      want.flatMap { c =>
        haveByName.get(c.name) match {
          case None => Some(AddColumn(c.name, c.dataType, c.nullable))
          case Some(d) if d.dataTypeJson != c.dataTypeJson =>
            Some(WidenType(c.name, c.dataType)) // evolveSchema rejects narrowing
          case _ => None
        }
      }
  }
}
