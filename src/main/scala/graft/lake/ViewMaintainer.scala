package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Maintained aggregate views (reference: query-side rollup views kept
  * next to the fact tables and refreshed by the sync cron —
  * `migrations/20230207_01_53Bud.sql:4-24`, `20230606_01_cY4nG.sql:4-17`).
  *
  * Two flavors:
  *
  *  - [[ViewDef]] — an arbitrary `DataFrame => DataFrame` transform,
  *    recomputed from the base table's full live state each refresh and
  *    committed with full-refresh `replace` semantics (groups that
  *    disappeared from the source must disappear here). Exactly-once per
  *    epoch via the view table's own ledger. Use only for small bases or
  *    transforms that aren't incrementally maintainable.
  *
  *  - [[RollupView]] — a count/sum rollup maintained INCREMENTALLY from the
  *    base table's snapshot file diffs: each refresh reads only the data
  *    files the base commit added or removed (∝ batch key-coverage, because
  *    merge rewrites only touched buckets), never the full base table. At
  *    100 TB with a 600 s commit beat, a full base scan per epoch per view
  *    is a scale-killer; the rollup delta is
  *    `Σ weight·value` over (added files, +1) ∪ (removed files, −1),
  *    combined with the stored view by a full-outer join and re-written
  *    (the view itself is aggregate-small). Counts/sums are exact under
  *    retraction; groups whose row count reaches zero are dropped —
  *    byte-equal to a full recompute.
  *
  * RollupView's ledger records the BASE SNAPSHOT ID (as the view table's
  * commit epoch), so refresh is self-catching-up: a crash between base
  * commit and view refresh just leaves base snapshots pending, applied in
  * order on the next refresh — no dependence on stream epoch replay. If
  * retention expired the parent snapshot a diff would need, refresh falls
  * back to one full recompute and resumes incremental from there.
  */
sealed trait ViewSpec { def name: String }

case class ViewDef(name: String, transform: DataFrame => DataFrame) extends ViewSpec

/** Incrementally-maintained rollup: `groupBy(groupCols).agg(count(*) as
  * countAlias, sum(src) as alias...)`. Sum columns should be integral for
  * bit-exact equivalence with a full recompute (float addition order
  * differs); group columns follow SQL GROUP BY null semantics (null-safe
  * grouped via a null-safe join on the delta path). */
case class RollupView(name: String, groupCols: Seq[String],
    sumCols: Seq[(String, String)] = Seq.empty, // (source column, output alias)
    countAlias: String = "n") extends ViewSpec

/** Approx-distinct rollup maintained from the table's own commit history
  * ("feed-observed" semantics): per group, one HLL sketch (Apache
  * DataSketches via Spark's `hll_sketch_agg`/`hll_union`) of every distinct
  * value that survived at least one commit — exactly the value set a
  * change-feed consumer at this view's floor observes. Sketches union
  * monotonically, so each refresh reads ONLY rows with `lsn > floor` inside
  * files the new commits added (manifest-skipped by `lsnMax`) — work
  * ∝ ingest, never table size, and no retraction problem: HLL cannot
  * subtract, and feed-observed semantics never asks it to (an LWW update or
  * delete does not un-observe the old value).
  *
  * Live-state distinct (retraction-exact) is deliberately NOT offered
  * incrementally — an LWW merge physically supersedes old payloads, so exact
  * live distinct needs a full recompute; use a [[ViewDef]] for that.
  *
  * Each `(source, alias)` pair yields two view columns: `alias` (BIGINT
  * rounded estimate — the user-facing number) and `alias_hll` (the sketch
  * BINARY, kept so refreshes stay mergeable and consumers can union across
  * groups/views). At ≲ thousands of distinct values per group the
  * DataSketches estimate is exact (coupon modes); beyond that the error is
  * the published ~1.04/√2^lgK.
  *
  * Reset semantics (loud in lineage: the view commit after a reset is a
  * fresh bootstrap): if the view's floor snapshot expired from metadata, a
  * rollback changed which lsns at-or-under the floor are covered, or a
  * replace() started a new table generation (whose rows need not carry
  * post-floor lsns), the sketch is rebuilt from the CURRENT live state —
  * values observed only in rolled-back or fully superseded history drop
  * out. Vacuum needs no guard here (it removes only tombstones; upsert rows
  * keep their lsns).
  */
case class DistinctSketchView(name: String, groupCols: Seq[String],
    distinctCols: Seq[(String, String)], // (source column, output alias)
    lgK: Int = 12) extends ViewSpec

object ViewMaintainer {
  /** Above this manifest-reported batch size the delta-step key probe joins
    * plain instead of broadcast (a forced broadcast of a bulk commit's keys
    * would OOM the driver; trickle beats stay broadcast-cheap). Byte-based:
    * the key set is a subset of the files' content, so on-disk bytes bound
    * the broadcast from above — a row-count gate would wave through a
    * near-cutoff batch of wide string keys. Legacy files without a recorded
    * size estimate conservatively at 64 B/row. */
  val BroadcastKeyBytes: Long = 64L << 20
  private[lake] def approxBytes(f: DataFileMeta): Long =
    if (f.sizeBytes > 0) f.sizeBytes else f.rowCount * 64L

  /** Ownership id stamped on a base table's view materializations (see
    * `existingViewTable` — the guard against name collisions). */
  def viewTableId(baseTableId: String, name: String): String =
    s"view:$baseTableId:$name"

  /** The runtime ViewSpec for a persisted SQL-declared definition. */
  def specOf(d: MaintainedViewDef): ViewSpec = d.kind match {
    case "rollup" =>
      RollupView(d.name, d.groupCols, d.aggCols.map(a => a.src -> a.alias),
        d.countAlias)
    case "distinct_sketch" =>
      DistinctSketchView(d.name, d.groupCols,
        d.aggCols.map(a => a.src -> a.alias), d.lgK)
    case other => sys.error(s"unknown maintained-view kind '$other'")
  }

  /** Maintainer over every SQL-declared view of `base`, materializing into
    * `viewsRoot` — for SQL views that is the base table's namespace
    * directory, so refreshed views are directly SELECTable lake tables.
    * DYNAMIC: the declared set is re-read from table metadata on every
    * refresh, so a long-running ingest stream sees `create_view` /
    * `drop_view` issued while it runs (a snapshot taken at stream start
    * would silently ignore new views and RESURRECT dropped ones — the
    * bootstrap path recreates a missing materialization). */
  def forTable(base: LakeTable, viewsRoot: String): ViewMaintainer =
    new ViewMaintainer(base, viewsRoot,
      () => base.meta.maintainedViews.map(specOf))
}

class ViewMaintainer(base: LakeTable, viewsRoot: String,
    defsFn: () => Seq[ViewSpec]) {
  def this(base: LakeTable, viewsRoot: String, defs: Seq[ViewSpec]) =
    this(base, viewsRoot, () => defs)

  private val spark = base.spark

  /** Deterministic id stamped on this base table's materializations: the
    * ownership check that makes a name collision with a real table (or with
    * another base's view of the same name) a loud error instead of a silent
    * replace()/delete of someone else's data. */
  private def viewTableId(name: String): String =
    ViewMaintainer.viewTableId(base.meta.tableId, name)

  /** The view's existing materialization, ownership-verified. */
  private def existingViewTable(name: String): Option[LakeTable] = {
    val path = s"$viewsRoot/$name"
    if (!LakeTable.exists(path)) None
    else {
      val t = LakeTable.forPath(spark, path)
      require(t.meta.tableId == viewTableId(name),
        s"'$path' exists but is not view '$name' of this base table — " +
          "a user table or another base's view holds the name; refusing to touch it")
      Some(t)
    }
  }

  /** View tables are created lazily on first refresh (schema = transform
    * output; keyed on the group/leading columns — replace never reconciles
    * keys, the key only drives bucketing). */
  private def viewTableFor(name: String, schema: StructType, keyCols: Seq[String]): LakeTable =
    existingViewTable(name).getOrElse(
      LakeTable.create(spark, s"$viewsRoot/$name", schema, keyCols,
        numBuckets = 1, // rollups are small; one bucket, one file per refresh
        tableId = Some(viewTableId(name))))

  def table(name: String): LakeTable =
    existingViewTable(name).getOrElse(
      sys.error(s"view '$name' has no materialization under $viewsRoot"))

  /** Refresh every view. Idempotent: ViewDef per `epochId`, RollupView per
    * base snapshot id. Returns data files READ from the base table per view
    * (the incremental-maintenance cost metric — ∝ batch for RollupView). */
  def refreshAll(epochId: Long = -1L): Map[String, Long] =
    defsFn().map {
      case d: ViewDef => d.name -> refreshFull(d, epochId)
      case r: RollupView => r.name -> refreshRollup(r)
      case s: DistinctSketchView => s.name -> refreshDistinct(s)
    }.toMap

  // ------------------------------------------------------------ full refresh

  private def refreshFull(d: ViewDef, epochId: Long): Long = {
    val out = d.transform(base.currentState())
    viewTableFor(d.name, out.schema, Seq(out.schema.fieldNames.head))
      .replace(out, epochId)
    base.meta.currentSnapshot.map(_.files.size.toLong).getOrElse(0L)
  }

  // ----------------------------------------------------------------- rollups

  private def rollupAgg(state: DataFrame, r: RollupView): DataFrame =
    state.groupBy(r.groupCols.map(col): _*)
      .agg(count(lit(1)).as(r.countAlias),
        r.sumCols.map { case (src, alias) => sum(col(src)).as(alias) }: _*)

  /** Apply every base snapshot the view hasn't seen, in order: incremental
    * file-diff delta when the parent snapshot is still in metadata, full
    * recompute otherwise (first refresh, or retention expired the parent). */
  private def refreshRollup(r: RollupView): Long = {
    val m = base.meta
    val cur = m.currentSnapshot.getOrElse(return 0L)
    var applied: Long = existingViewTable(r.name)
      .map(_.meta.epochHighWater).getOrElse(-1L)
    if (applied >= cur.snapshotId) return 0L // up to date
    var scanned = 0L
    // exclude staged branch state: an unpublished write-branch merge must
    // not fold into a maintained view while the base table still serves the
    // pre-branch state (publishBranch makes those snapshots lineage, and
    // THEN they apply here) — exclusion rather than a mainAncestry
    // restriction, because the lineage walk truncates at retention gaps
    val staged = m.branchExclusive
    m.snapshots.filter(s => s.snapshotId > applied &&
      !staged.contains(s.snapshotId)).sortBy(_.snapshotId).foreach { s =>
      val parent = m.snapshotById(s.parentId)
      scanned +=
        (if (s.parentId == applied && parent.isDefined) incrementalStep(r, parent.get, s)
         else fullStep(r, s))
      applied = s.snapshotId
    }
    scanned
  }

  private def fullStep(r: RollupView, s: Snapshot): Long = {
    val out = rollupAgg(base.currentState(Some(s.snapshotId)), r)
    viewTableFor(r.name, out.schema, r.groupCols).replace(out, s.snapshotId)
    s.files.size.toLong
  }

  /** One snapshot's delta: read ONLY files added/removed by the commit
    * (merge rewrites whole touched buckets, so the symmetric difference is
    * exactly the touched-bucket files), weight +1/−1, aggregate, combine
    * with the stored view, drop groups whose live-row count hits zero. */
  private def incrementalStep(r: RollupView, parent: Snapshot, s: Snapshot): Long = {
    val parentPaths = parent.files.map(_.path).toSet
    val curPaths = s.files.map(_.path).toSet
    val added = s.files.filterNot(f => parentPaths.contains(f.path))
    val removed = parent.files.filterNot(f => curPaths.contains(f.path))
    if (added.exists(_.isDelta)) {
      // a merge-on-read DELTA commit removes nothing: a replaced key's
      // pre-image stays live in a KEPT file (and a delta tombstone's masked
      // row stays counted), so the file-diff retraction math below cannot
      // see it. But the commit's own rows name exactly the keys whose state
      // changed — the anti-stale probe guarantees every delta row is a true
      // winner — so the exact diff is the delta rows (+1) against the
      // PARENT winners of those keys (−1): read the touched buckets' parent
      // file sets once (LWW-resolved by readFileSubset), key-pruned by a
      // broadcast semi join on the batch's keys. Cost = batch + touched
      // buckets read ONCE — cheaper than the COW incremental step (which
      // reads touched buckets on both diff sides) and never the table.
      // (A `fold` commit takes the file-granular path below: both sides are
      // complete bucket sets, netting zero like a compaction.)
      if (removed.nonEmpty || added.exists(!_.isDelta))
        return fullStep(r, s) // unknown mixed commit shape: stay correct
      val touched = added.map(_.bucket).toSet
      val parentFiles = parent.files.filter(f => touched.contains(f.bucket))
      // cached: the batch subplan feeds BOTH the key probe and applyDiff's
      // +1 side — without the cache each delta file would be parquet-decoded
      // and LWW-aggregated twice per view per snapshot
      val newRows = base.readFileSubset(added, s.schemaId).cache()
      try {
        val keys = newRows.select(base.meta.keyCols.map(col): _*)
        // broadcast the key probe only when the manifest says the batch is
        // small (the steady-state trickle beat); a bulk delta commit would
        // blow the driver through a forced broadcast, so it takes a plain
        // (bucket-colocated) semi join instead — sizeBytes is free metadata
        val keyProbe =
          if (added.map(ViewMaintainer.approxBytes).sum <= ViewMaintainer.BroadcastKeyBytes)
            broadcast(keys)
          else keys
        val prevRows = base.readFileSubset(parentFiles, s.schemaId)
          .join(keyProbe, base.meta.keyCols, "left_semi")
        applyDiff(r, s, newRows, prevRows)
      } finally newRows.unpersist()
      return (added.size + parentFiles.size).toLong
    }
    if (added.isEmpty && removed.isEmpty) {
      // nothing changed (e.g. metadata-only commit): just advance the ledger
      val vt = table(r.name)
      vt.replace(vt.currentState(), s.snapshotId)
      return 0L
    }
    applyDiff(r, s, base.readFileSubset(added, s.schemaId),
      base.readFileSubset(removed, s.schemaId))
    (added.size + removed.size).toLong
  }

  /** One snapshot's diff applied to the stored view: live rows weighted
    * +1 (new side) / −1 (old side), aggregated, full-outer combined with
    * the stored groups, groups whose live-row count hits zero dropped. */
  private def applyDiff(r: RollupView, s: Snapshot,
      addedRows: DataFrame, removedRows: DataFrame): Unit = {
    val vt = table(r.name)
    def weighted(df: DataFrame, w: Long): DataFrame =
      df.filter(!col(LakeTable.DeletedCol))
        .select((r.groupCols.map(col) ++
          r.sumCols.map { case (src, _) => col(src) } :+
          lit(w).as("__w")): _*)
    val delta = weighted(addedRows, 1L).unionByName(weighted(removedRows, -1L))
      .groupBy(r.groupCols.map(col): _*)
      .agg(sum(col("__w")).as("__dn"),
        r.sumCols.map { case (src, alias) =>
          sum(col(src) * col("__w")).as(s"__d_$alias") }: _*)
    val stored = vt.currentState()
    // null-safe join: a null group key must merge with its stored row, not
    // fork a duplicate group (SQL GROUP BY treats nulls as one group)
    val cond = r.groupCols.map(c => stored(c) <=> delta(c)).reduce(_ && _)
    val merged = stored.join(delta, cond, "full_outer")
      .select((r.groupCols.map(c => coalesce(stored(c), delta(c)).as(c)) :+
        (coalesce(stored(r.countAlias), lit(0L)) +
          coalesce(delta("__dn"), lit(0L))).as(r.countAlias)) ++
        r.sumCols.map { case (_, alias) =>
          (coalesce(stored(alias), lit(0L)) +
            coalesce(delta(s"__d_$alias"), lit(0L))).as(alias) }: _*)
      .filter(col(r.countAlias) > 0)
    vt.replace(merged, s.snapshotId)
  }

  // ---------------------------------------------------- distinct sketch views

  private def sketchCol(alias: String): String = s"${alias}_hll"

  /** Per-group HLL sketches over `rows` (one sketch column per distinct
    * spec), estimates attached. */
  private def sketchAgg(rows: DataFrame, d: DistinctSketchView): DataFrame = {
    val aggs = d.distinctCols.map { case (src, alias) =>
      hll_sketch_agg(col(src), d.lgK).as(sketchCol(alias)) }
    rows.groupBy(d.groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Final view projection: per spec, the BIGINT rounded estimate (the
    * user-facing column) next to the mergeable sketch bytes. */
  private def withEstimates(df: DataFrame, d: DistinctSketchView): DataFrame =
    df.select(d.groupCols.map(col) ++ d.distinctCols.flatMap { case (_, alias) =>
      Seq(round(hll_sketch_estimate(col(sketchCol(alias)))).cast("long").as(alias),
        col(sketchCol(alias)))
    }: _*)

  /** Apply every base snapshot the view hasn't seen. Incremental path: union
    * sketches of rows with `lsn > floor` from files added since the view's
    * floor snapshot (applied in ONE step — sketch union is associative, so
    * unlike RollupView there is no need to walk snapshots one by one).
    * Reset path (floor snapshot expired, or a rollback changed lsn coverage
    * at-or-under the floor): rebuild from the current live state. */
  private def refreshDistinct(d: DistinctSketchView): Long = {
    require(d.distinctCols.nonEmpty, "DistinctSketchView needs >= 1 distinct column")
    val m = base.meta
    val cur = m.currentSnapshot.getOrElse(return 0L)
    val applied: Long = existingViewTable(d.name)
      .map(_.meta.epochHighWater).getOrElse(-1L)
    if (applied >= cur.snapshotId) return 0L // up to date
    val from = m.snapshotById(applied)
    val floor = from.map(_.files.map(_.lsnMax).foldLeft(-1L)(math.max)).getOrElse(-1L)
    // same rollback discipline as the `$changes` floor feed: incremental is
    // exact iff both endpoints cover the SAME lsns at-or-under the floor.
    // No vacuum guard: vacuum drops only tombstones, and this view never
    // consumes deletes.
    def excludedBelowFloor(s: Snapshot): Seq[LsnSpan] =
      LsnSpan.belowFloor(s.excludedLsns, floor)
    // replace() starts a new table generation whose rows need not carry
    // post-floor lsns (lsn defaults to 0 when the input has no lsn column) —
    // the floor discipline cannot see them, so rebuild instead.
    val replaceInRange = m.snapshots.exists(s =>
      s.snapshotId > applied && s.snapshotId <= cur.snapshotId &&
        s.operation == "replace")
    from match {
      case Some(f) if !replaceInRange &&
          excludedBelowFloor(f) == excludedBelowFloor(cur) =>
        val fromPaths = f.files.map(_.path).toSet
        val added = cur.files.filterNot(x => fromPaths.contains(x.path))
          .filter(_.lsnMax > floor) // manifest skip: pure rewrites carry no news
        val vt = table(d.name)
        if (added.isEmpty) { // metadata-only / rewrite-only: advance the ledger
          vt.replace(vt.currentState(), cur.snapshotId)
          return 0L
        }
        val srcCols = (d.groupCols ++ d.distinctCols.map(_._1)).distinct
        val rows = base.readFileSubset(added, cur.schemaId)
          .filter(!col(LakeTable.DeletedCol) &&
            col(LakeTable.LsnCol) > floor) // only NEW observations
          .select(srcCols.map(col): _*)
        val delta = sketchAgg(rows, d)
        val stored = vt.currentState()
        val cond = d.groupCols.map(c => stored(c) <=> delta(c)).reduce(_ && _)
        val merged = stored.join(delta, cond, "full_outer")
          .select(d.groupCols.map(c => coalesce(stored(c), delta(c)).as(c)) ++
            d.distinctCols.map { case (_, alias) =>
              val sc = sketchCol(alias)
              when(stored(sc).isNull, delta(sc))
                .when(delta(sc).isNull, stored(sc))
                .otherwise(hll_union(stored(sc), delta(sc))).as(sc)
            }: _*)
        vt.replace(withEstimates(merged, d), cur.snapshotId)
        added.size.toLong
      case _ => // bootstrap or reset: sketch the current LIVE state
        val srcCols = (d.groupCols ++ d.distinctCols.map(_._1)).distinct
        val out = withEstimates(
          sketchAgg(base.currentState().select(srcCols.map(col): _*), d), d)
        viewTableFor(d.name, out.schema, d.groupCols).replace(out, cur.snapshotId)
        cur.files.size.toLong
    }
  }
}
