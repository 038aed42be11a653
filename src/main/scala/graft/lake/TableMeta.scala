package graft.lake

import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.json4s._
import org.json4s.jackson.Serialization

/** Metadata model of the minimal snapshot table format (Iceberg-style
  * semantics re-implemented from scratch over Parquet — the sandbox ships no
  * Iceberg/Delta jar, and the north rule wants a brand-new engine anyway):
  * column-ID-tracked schema versions, an append-only snapshot list whose
  * entries carry the complete data-file manifest, an epochId ledger for
  * exactly-once streaming commits, and hash-bucket partitioning on the key.
  *
  * Each table version is one JSON file `metadata/v%012d.json` committed by
  * atomic rename (create-fails-if-exists), so readers always see a complete,
  * consistent table state and writers detect conflicts optimistically.
  *
  * Scale note (100 TB design): snapshot file lists are NOT embedded in the
  * version file — each snapshot's manifest lives in an immutable
  * content-addressed side file `metadata/manifests/m-<sha>.json`
  * (Iceberg's manifest-list indirection), written once and shared by every
  * snapshot with the same file set (metadata-only commits, tags, rollbacks
  * reuse their parent's/target's manifest for free). A commit therefore
  * writes O(changed files), not O(retained snapshots × files); the version
  * file itself stays O(snapshots) small stubs. [[LakeTable.load]] hydrates
  * `files` back through a process-wide immutable-content cache, so callers
  * never see the indirection. Bucket count is fixed at create time and sized
  * for the target scale (e.g. 4096 buckets at 100 TB ≈ 25 GB/bucket before
  * file splitting). Rebucket lifts the limit later if sizing was wrong.
  */
case class ColumnDef(id: Int, name: String, dataTypeJson: String, nullable: Boolean) {
  def dataType: DataType = DataType.fromJson(dataTypeJson)
  def toField: StructField = StructField(name, dataType, nullable)
}

case class SchemaVersion(schemaId: Int, columns: Seq[ColumnDef]) {
  def toStruct: StructType = StructType(columns.map(_.toField))
  def byId: Map[Int, ColumnDef] = columns.map(c => c.id -> c).toMap
}

case class DataFileMeta(
    path: String, // relative to table root
    bucket: Int,
    schemaId: Int,
    rowCount: Long,
    lsnMin: Long,
    lsnMax: Long,
    // Per-file data-column min/max from the parquet footer, keyed by COLUMN
    // ID (string-keyed for JSON; values rendered from the stored type) —
    // drives manifest-level file skipping for SQL range/equality predicates
    // (Iceberg keeps the same stats in its manifests; the reference gets
    // this from Postgres indexes). Columns with unusable footer stats are
    // simply absent; readers must treat absence as "cannot prune".
    colMins: Map[String, String] = Map.empty,
    colMaxs: Map[String, String] = Map.empty,
    // false ⇒ the file provably contains no `_deleted=true` rows (footer
    // boolean max), making it eligible for the vectorized columnar SQL read
    // path (no per-row tombstone filter needed). Missing/legacy ⇒ true.
    hasTombstones: Boolean = true,
    // on-disk size recorded at commit (the footer pass already holds the
    // file): compaction planning and SQL scan-size estimation become pure
    // metadata — no per-file stat storm on the driver. 0 = legacy/unknown,
    // readers fall back to Files.size / row-width estimates.
    sizeBytes: Long = 0L,
    // true ⇒ string colMins/colMaxs were accumulated in UTF-8 binary order
    // (matching parquet footers and Spark's runtime comparison). Legacy
    // manifests (false) used java.lang.String UTF-16 order, which diverges
    // for supplementary characters — pruners must not trust their STRING
    // bounds (numeric bounds are order-agnostic and stay usable).
    statsUtf8: Boolean = false,
    // true ⇒ merge-on-read DELTA file (written by `merge(delta = true)`):
    // its rows are the batch's LWW winners LAYERED ON TOP of the bucket's
    // older files instead of replacing them — a key may appear in several
    // files of the bucket, and readers must resolve last-writer-wins by
    // (lsn, tombstone-priority) across ALL the bucket's files before
    // serving rows. Consequences readers/maintenance must honor:
    //  - any read of a file set containing a delta file goes through LWW
    //    resolution (LakeTable.readFiles) or a per-bucket merge reader
    //    (SQL scan) — never raw union;
    //  - file-granular stat pruning inside a delta-carrying bucket is
    //    UNSOUND (dropping one file breaks resolution) — prune whole
    //    buckets only; row counts over-count superseded rows, so manifest
    //    aggregate pushdown must bail;
    //  - vacuum/compact must not rewrite delta files (a delta tombstone
    //    masks older rows in OTHER files; dropping or repacking it outside
    //    full resolution resurrects them) — `foldDeltas` is the maintenance
    //    op that collapses a bucket back to one-row-per-key base files.
    // Missing/legacy ⇒ false (copy-on-write base file).
    isDelta: Boolean = false)

case class Snapshot(
    snapshotId: Long,
    parentId: Long, // -1 for first
    epochId: Long, // -1 for non-stream commits
    schemaId: Int,
    operation: String, // "merge" | "append" | "evolve" | "create" | ...
    files: Seq[DataFileMeta],
    wallClockMs: Long, // lineage only; never on the data path
    // for operation == "rollback": the snapshot whose file set this commit
    // restored (introspection; the consumer-facing signal is excludedLsns)
    rollbackOf: Long = -1L,
    // The lsn spans this snapshot's LINEAGE never applied: empty for normal
    // history; a rollback commit inherits its TARGET's spans plus the span
    // it reverted, and every later commit inherits its parent's verbatim.
    // This is the snapshot's lsn coverage in closed form — state(s) is the
    // LWW fold of exactly the writes with lsn <= its high-water MINUS these
    // spans — which is what lets incremental consumers decide consistency:
    // the `$changes` floor feed is exact iff from/to exclude the SAME spans
    // below the feed's floor, and a sink watermark is stale iff the current
    // snapshot excludes lsns under it (both guards fail loud / resync). A
    // roll-FORWARD (rollback to a pre-rollback snapshot) naturally clears
    // the spans it re-covers, because it inherits the TARGET's list.
    excludedLsns: Seq[LsnSpan] = Seq.empty,
    // for operation == "vacuum": the exact high-water of the tombstone lsns
    // THIS commit dropped (-1 otherwise / legacy). The `$changes` vacuum
    // guard needs the in-range vacuum's own reach — judging a pinned
    // historical range by the table-CURRENT vacuumLsn would spuriously fail
    // it after any later, harmless vacuum.
    vacuumHw: Long = -1L,
    // Name of the immutable content-addressed manifest file (under
    // `metadata/manifests/`) holding this snapshot's `files` list. "" means
    // not yet externalized: a snapshot freshly built in memory, or a legacy
    // version file with the list inline. Set by the metadata writer; `files`
    // is hydrated from it on load, so all other code reads `files` as if it
    // were stored inline.
    manifestFile: String = "")

/** A half-open lsn span `(afterLsn, toLsn]`. */
case class LsnSpan(afterLsn: Long, toLsn: Long)

object LsnSpan {
  /** Sort + merge overlapping/adjacent spans, so span lists have one
    * canonical form and list equality is span-set equality. */
  def normalize(spans: Seq[LsnSpan]): Seq[LsnSpan] =
    spans.filter(s => s.toLsn > s.afterLsn).sortBy(_.afterLsn)
      .foldLeft(List.empty[LsnSpan]) {
        case (acc @ (h :: t), s) if s.afterLsn <= h.toLsn =>
          h.copy(toLsn = math.max(h.toLsn, s.toLsn)) :: t
        case (acc, s) => s :: acc
      }.reverse

  /** The portion of `spans` at or under `floor`, in canonical form — THE
    * comparator every floor-based incremental consumer shares (`$changes`
    * endpoint check, ViewMaintainer sketch catch-up): an increment over
    * (from, to] is exact iff both endpoints exclude the SAME lsns below the
    * consumer's floor. One shared definition so a change to span semantics
    * (or a producer emitting unnormalized inherited lists) can never break
    * one consumer but not another. */
  def belowFloor(spans: Seq[LsnSpan], floor: Long): Seq[LsnSpan] =
    normalize(spans.map(g => g.copy(toLsn = math.min(g.toLsn, floor))))
}

/** A declared row constraint (reference analogue: the destination DDL's
  * NOT NULL / CHECK constraints, `migrations/20221214_01_9Jm6L.sql` — there
  * Postgres enforces them; a lake table must enforce its own). `kind` is
  * "not_null" (expr = column name) or "check" (expr = boolean SQL over data
  * columns, ANSI semantics: NULL passes). `cols` caches the referenced
  * columns (resolved at add time) so enforcement can skip a constraint when
  * an old-schema batch does not carry them yet. Deletes are exempt — a
  * tombstone's payload is not a row. */
case class ConstraintDef(name: String, kind: String, expr: String,
    cols: Seq[String])

/** One aggregated column of a SQL-declared maintained view. */
case class AggColDef(src: String, alias: String)

/** SQL-declared maintained-view definition, persisted in the BASE table's
  * metadata so the view travels with the table (the reference keeps its
  * rollup-view DDL in the same migration stream as the fact tables —
  * `migrations/20230207_01_53Bud.sql`). `kind` selects the maintainer:
  * "rollup" → retraction-exact incremental [[RollupView]] (count + sums),
  * "distinct_sketch" → union-only HLL [[DistinctSketchView]]. The
  * materialized view itself is a normal lake table named `name` in the base
  * table's namespace, refreshed by `CALL <cat>.system.refresh_views`. */
case class MaintainedViewDef(
    name: String,
    kind: String, // "rollup" | "distinct_sketch"
    groupCols: Seq[String],
    aggCols: Seq[AggColDef] = Seq.empty,
    countAlias: String = "n",
    lgK: Int = 12)

case class TableMeta(
    formatVersion: Int,
    tableId: String,
    location: String,
    keyCols: Seq[String],
    lsnCol: String,
    numBuckets: Int,
    schemas: Seq[SchemaVersion],
    currentSchemaId: Int,
    snapshots: Seq[Snapshot],
    currentSnapshotId: Long,
    version: Long,
    // Epoch ids whose snapshots were expired: snapshot retention must never
    // erase commit idempotence (Iceberg separates the two the same way) — a
    // replayed epoch whose snapshot aged out would otherwise re-apply.
    // Legacy form: an explicit id list. Expiry now compacts into
    // `retiredEpochSpans` (below) and leaves this empty — a long-lived
    // streaming table retires one epoch per beat forever, so the flat list
    // grows O(lifetime) and is re-parsed and re-written with every metadata
    // version; spans stay O(gaps).
    retiredEpochs: Seq[Long] = Seq.empty,
    // Compacted form of retired epoch ids: merged half-open spans
    // `(afterLsn, toLsn]` (LsnSpan reused — values are epoch ids here).
    // Safe because retirement is FINAL: expiry pins open branch chains, so
    // a retired epoch can never be retracted back out of the ledger (only
    // dropBranch retracts epochs, and only branch-exclusive — hence
    // unexpired — ones).
    retiredEpochSpans: Seq[LsnSpan] = Seq.empty,
    // Ledger of applied migration-file ids (reference: yoyo's _yoyo_migration
    // table) — recorded in the SAME commit as the schema change they carry.
    appliedMigrations: Seq[String] = Seq.empty,
    // High-water of physically dropped tombstones: every tombstone with
    // `_lsn <= vacuumLsn` MAY have been vacuumed away. Downstream consumers
    // that derive deletes from tombstones (JdbcWarehouseSync's lsn watermark,
    // the `$changes` lsn-floor stream) must have consumed past this point —
    // a lagging consumer can no longer observe those deletes and must full
    // resync instead (enforced in JdbcWarehouseSync.syncOnce). -1 = never
    // vacuumed.
    vacuumLsn: Long = -1L,
    // SQL-declared maintained views over this table (see MaintainedViewDef);
    // empty for tables with no declared views — absent in legacy manifests.
    maintainedViews: Seq[MaintainedViewDef] = Seq.empty,
    // Named snapshot refs (Iceberg-style tags): audit pins that survive
    // retention — expireSnapshots keeps every tagged snapshot and the files
    // it references, and time travel accepts the tag name wherever it
    // accepts a snapshot id. Metadata-only; never on the data path.
    tags: Map[String, Long] = Map.empty,
    // Free-form table properties (metadata-only): consumer state that must
    // travel WITH the table rather than beside it — e.g. TableMirror's
    // source watermark — plus anything an operator pins via SQL. Engine
    // behavior never keys off unknown properties.
    properties: Map[String, String] = Map.empty,
    // Declared row constraints, enforced on every write path (see
    // ConstraintDef). Empty for unconstrained tables — zero write cost.
    constraints: Seq[ConstraintDef] = Seq.empty,
    // Named write branches (Iceberg-style refs) for write-audit-publish:
    // name → branch head snapshot id. Branch commits append to `snapshots`
    // like any commit but advance the branch pointer instead of
    // currentSnapshotId; `publishBranch` flips the table to the audited
    // head in one metadata commit. Heads are retention-pinned like tags.
    branches: Map[String, Long] = Map.empty,
    // High-water of lsns carried by RETRACTED snapshots (dropBranch removes
    // staged snapshots outright, unlike expiry): folded into lsnHighWater so
    // lsn allocation (SQL DML's nextLsn) never retreats into a span the
    // retracted epochs' events still carry — the documented re-stage flow
    // replays exactly those events, and same key + same lsn + different
    // payload would break the engine-wide LWW invariant. 0 = never
    // retracted.
    retractedLsn: Long = 0L,
    // Snapshot id of the most recent rebucket commit (-1 = never / legacy).
    // Survives retention where the rebucket SNAPSHOT may not: the rollback
    // guard and the SQL layout proof (storage-partitioned joins) must know
    // the boundary even after the snapshot itself expires — a rollback
    // across it, or a pre-rebucket time-travel scan claiming the current
    // bucket layout, silently corrupts routing/joins.
    rebucketAtSnapshot: Long = -1L,
    // Monotone count of rollback commits over the table's lifetime. This is
    // what lets a downstream sink tell rollback INSTANCES apart: exclusion
    // spans are identical when the same snapshot is rolled back to twice,
    // and rollback snapshots themselves can expire — the count survives
    // both. JdbcWarehouseSync resyncs when spans under its watermark exist
    // AND this count is ahead of the sink's reconciled count.
    rollbackCount: Long = 0L) {
  /** Next snapshot id: ids must be unique across ALL retained snapshots —
    * with write branches, the max id can sit on a branch, not on main, so
    * `currentSnapshotId + 1` would collide. */
  def nextSnapshotId: Long =
    snapshots.foldLeft(currentSnapshotId)((a, s) => math.max(a, s.snapshotId)) + 1

  /** Snapshot ids reachable from `headId` over parent links, stopping at
    * the first expired parent OR the first id in `stop`. The one chain walk
    * every tree-shaped surface shares: ancestry is `chainUntil(h, ∅)`, a
    * branch's exclusive segment is `chainUntil(head, mainAncestry)`. */
  def chainUntil(headId: Long, stop: Set[Long]): Set[Long] = {
    val byId = snapshots.map(s => s.snapshotId -> s).toMap
    Iterator.iterate(byId.get(headId))(_.flatMap(s => byId.get(s.parentId)))
      .takeWhile(_.isDefined).map(_.get.snapshotId)
      .takeWhile(id => !stop.contains(id)).toSet
  }

  /** Snapshot ids reachable from `headId` over parent links (retained
    * snapshots only — the walk stops at the first expired parent). With
    * write branches, `snapshots` is a TREE: surfaces that mean "the table's
    * history" (timestamp time travel, view maintenance, epoch retirement)
    * must exclude [[branchExclusive]] or they leak unpublished branch state
    * into main's timeline. (Restricting to `mainAncestry` instead is WRONG
    * for tables with retention gaps: the walk stops at the first expired
    * parent, so a tag-pinned snapshot below the gap — retained precisely so
    * audits can read that era — would fall outside it.) */
  def ancestry(headId: Long): Set[Long] = chainUntil(headId, Set.empty)
  /** Main's lineage: ancestry of the current head. */
  def mainAncestry: Set[Long] = ancestry(currentSnapshotId)

  /** Snapshot ids reachable ONLY via an open branch head — the staged,
    * unpublished segment of each branch (the walk from the head stops at
    * the first main-lineage snapshot). History surfaces exclude these. */
  def branchExclusive: Set[Long] = {
    if (branches.isEmpty) return Set.empty
    val mainAnc = mainAncestry
    branches.values.flatMap(h => chainUntil(h, mainAnc)).toSet
  }

  def currentSchema: SchemaVersion = schemas.find(_.schemaId == currentSchemaId).get
  def schemaById(id: Int): SchemaVersion = schemas.find(_.schemaId == id).get
  def currentSnapshot: Option[Snapshot] = snapshots.find(_.snapshotId == currentSnapshotId)
  def snapshotById(id: Long): Option[Snapshot] = snapshots.find(_.snapshotId == id)
  /** Enumerable committed epochs (live snapshots + the legacy retired-id
    * list). Span-compacted retirements are NOT enumerated — use
    * [[epochCommitted]] for membership and [[committedEpochCount]] /
    * [[epochHighWater]] for totals. */
  def committedEpochs: Set[Long] =
    (snapshots.map(_.epochId).filter(_ >= 0) ++ retiredEpochs).toSet
  /** THE exactly-once membership test: epoch already applied to this table
    * (on a live snapshot, in the legacy retired list, or inside a
    * compacted retired span). */
  def epochCommitted(e: Long): Boolean =
    e >= 0 && (committedEpochs.contains(e) ||
      retiredEpochSpans.exists(s => e > s.afterLsn && e <= s.toLsn))
  def committedEpochCount: Long =
    committedEpochs.size + retiredEpochSpans.map(s => s.toLsn - s.afterLsn).sum
  /** Highest committed epoch id, -1 when none. */
  def epochHighWater: Long =
    (snapshots.map(_.epochId) ++ retiredEpochs ++
      retiredEpochSpans.map(_.toLsn) :+ -1L).max
  /** The highest lsn this table has EVER assigned or absorbed, across all
    * retained snapshots (not just the current one — a rollback or replace
    * can lower the visible maximum) plus excluded-span and vacuum
    * high-waters (which survive even when the snapshots carrying those lsns
    * expire, because the current snapshot inherits its exclusion list). New
    * statements must stamp above this: re-using an lsn would break the
    * engine-wide LWW invariant (same key + same lsn ⇒ identical payload)
    * across a rollback boundary, and would blur a recorded exclusion span. */
  def lsnHighWater: Long =
    (snapshots.flatMap(_.files.map(_.lsnMax)) ++
      snapshots.flatMap(_.excludedLsns.map(_.toLsn)) :+
      vacuumLsn :+ retractedLsn :+ 0L).max
}

/** On-disk shape of one snapshot manifest (the externalized `files` list). */
case class ManifestDoc(files: Seq[DataFileMeta])

object TableMeta {
  implicit val formats: Formats = Serialization.formats(NoTypeHints)
  def toJson(m: TableMeta): String = Serialization.writePretty(m)
  def fromJson(s: String): TableMeta = Serialization.read[TableMeta](s)
  def manifestJson(files: Seq[DataFileMeta]): String =
    Serialization.writePretty(ManifestDoc(files))
  def manifestFromJson(s: String): Seq[DataFileMeta] =
    Serialization.read[ManifestDoc](s).files

  def schemaVersionOf(schemaId: Int, struct: StructType, startId: Int): SchemaVersion =
    SchemaVersion(schemaId, struct.fields.zipWithIndex.map { case (f, i) =>
      ColumnDef(startId + i, f.name, f.dataType.json, f.nullable)
    }.toSeq)
}

/** Schema-evolution operations (reference analogue: yoyo ALTER TABLE
  * migrations, `migrations/20241029_01_JnkId.sql:4-17`). Column identity is
  * the numeric id, so renames never lose old data files and adds never
  * resurrect dropped data (Iceberg rules). */
sealed trait SchemaChange
case class AddColumn(name: String, dataType: DataType, nullable: Boolean = true) extends SchemaChange
case class RenameColumn(from: String, to: String) extends SchemaChange
case class WidenType(name: String, to: DataType) extends SchemaChange
case class DropColumn(name: String) extends SchemaChange
