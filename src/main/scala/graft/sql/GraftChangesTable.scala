package graft.sql

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._
import graft.lake.{LakeTable, SchemaVersion, TableMeta}

/** `ns.`t$changes`` — a lake table's change feed as a DSv2 metadata table
  * (Iceberg exposes `db.t.changes` the same way; the reference's analogue is
  * downstream consumers tailing the warehouse by sync watermark,
  * `queries/sync_records.py:3-5`). Schema = data columns + `_change_type`
  * ("upsert" | "delete") + `_lsn`.
  *
  *  - BATCH_READ: `SELECT * FROM graftsql.ns.\`t$changes\``; options
  *    `fromSnapshot` (exclusive, default −1 = bootstrap: every live row as
  *    an upsert plus current tombstones as deletes) and `toSnapshot`
  *    (default current).
  *  - MICRO_BATCH_READ: `spark.readStream.table("graftsql.ns.\`t$changes\`")`
  *    — offsets are SNAPSHOT IDS; each micro-batch covers the snapshots
  *    committed since the last trigger. Option `startingSnapshot` (default:
  *    current at stream start = tail new changes only; 0 = full bootstrap
  *    then tail).
  *
  * Scale + exactness contract: a batch reads ONLY the data files the
  * snapshot range ADDED, skipping files whose manifest `lsnMax` is at or
  * under the range's lsn floor (pure rewrites), and filters rows to
  * `lsn > floor` — work ∝ ingest in the range, never table size, with no
  * join and no per-task state. The floor discipline is exact while winner
  * lsns stay above the previous snapshot's high-water (the normal log-tail
  * case, and the same contract as [[graft.cdc.JdbcWarehouseSync]]); an
  * out-of-order winner BELOW the floor (late event beyond the overlap
  * window) is the reconciliation path's job — `LakeTable.changes` computes
  * the exact join-based diff, mirroring the reference's incremental-sync +
  * nightly-validator split (`sync/sync_validator.py:24-62`). Offsets only
  * reference snapshots still in metadata: retention must keep any snapshot
  * a stream may resume from (expiry ⇒ explicit error, never silent loss).
  */
class GraftChangesTable(root: String, displayName: String) extends Table with SupportsRead {
  private val meta0: TableMeta = LakeTable.metaAt(root)

  override def name(): String = displayName
  override def schema(): StructType =
    GraftChangesTable.changeSchema(meta0.currentSchema.toStruct)
  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): util.Map[String, String] =
    Map("location" -> root, "format" -> "graft-lake-changes").asJava
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftChangesScanBuilder(root, options)
}

/** Column pruning for the feed (a consumer tailing a wide table usually
  * wants keys + `_change_type`, not full-width rows): the pruned projection
  * reaches the parquet readers, and `_change_type`/`_lsn` themselves prune
  * away when unreferenced. (Batch reads only — Spark builds a streaming scan
  * before any pushdown runs, so the micro-batch path keeps the full schema.) */
class GraftChangesScanBuilder(root: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private val schemaAtPlan: SchemaVersion = {
    val m = LakeTable.metaAt(root)
    m.schemaById(m.currentSchemaId)
  }
  private val full: StructType = GraftChangesTable.changeSchema(schemaAtPlan.toStruct)
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep declared column order; requiredSchema may reorder
    val names = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => names.contains(f.name)))
  }

  override def build(): Scan = new GraftChangesScan(root, options, schemaAtPlan, required)
}

object GraftChangesTable {
  val Suffix = "$changes"
  val ChangeTypeCol = "_change_type"
  def changeSchema(data: StructType): StructType = StructType(data.fields :+
    StructField(ChangeTypeCol, StringType, nullable = false) :+
    StructField(LakeTable.LsnCol, LongType, nullable = false))
}

class GraftChangesScan(root: String, options: CaseInsensitiveStringMap,
    // the read schema is pinned at scan creation (streams must keep a stable
    // schema for their whole life); later file schemas map to it by column id
    schemaAtPlan: SchemaVersion, required: StructType) extends Scan {

  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftChangesScan($root, cols=${required.fieldNames.mkString(",")})"

  override def toBatch: Batch = new Batch {
    private val m = LakeTable.metaAt(root)
    private val from = Option(options.get("fromSnapshot")).map(_.toLong).getOrElse(-1L)
    private val to = Option(options.get("toSnapshot")).map(_.toLong)
      .getOrElse(m.currentSnapshotId)
    private lazy val parts =
      GraftChangesScan.partitions(root, m, schemaAtPlan, required, from, to)
    override def planInputPartitions(): Array[InputPartition] = parts
    // whole-scan columnar decision, like GraftScan: Spark rejects mixed
    // row/columnar scans, so vectorize iff every selected file qualifies
    // (bootstrap merge partitions over layered buckets never do)
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftChangesReaderFactory(parts.nonEmpty && parts.forall {
        case g: GraftChangesPartition => g.columnar
        case _ => false
      }, GraftStreamingWrite.sessionHadoopConf())
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftChangesStream(root, schemaAtPlan, required, options)
}

object GraftChangesScan {
  /** One partition per data file the range (from, to] added, minus the
    * files manifest-provably free of post-floor rows. A file is vectorizable
    * when no per-row work remains: footer-proven tombstone-free (every row is
    * an "upsert"), lsnMin above the floor (no carry-over rows to filter), and
    * the projection identity-maps to stored columns. */
  private[sql] def partitions(root: String, m: TableMeta, target: SchemaVersion,
      required: StructType, fromSnapshotId: Long, toSnapshotId: Long): Array[InputPartition] = {
    val fromSnap =
      if (fromSnapshotId <= 0) None
      else Some(m.snapshotById(fromSnapshotId).getOrElse(sys.error(
        s"changes offset snapshot $fromSnapshotId no longer in metadata " +
          "(expired by retention?) — full re-bootstrap required")))
    val toSnap = m.snapshotById(toSnapshotId).orElse {
      if (toSnapshotId <= 0) None
      else sys.error(s"no snapshot $toSnapshotId")
    }
    val fromPaths = fromSnap.map(_.files.map(_.path).toSet).getOrElse(Set.empty)
    val lsnFloor = fromSnap.map(_.files.map(_.lsnMax).foldLeft(-1L)(math.max))
      .getOrElse(-1L)
    // vacuum gap: tombstones at or under vacuumLsn may be physically gone —
    // a consumer whose floor is below that can no longer observe those
    // deletes from added files. Fail loudly (re-bootstrap restores a correct
    // full image) instead of silently dropping deletes; bootstrap reads
    // (no fromSnapshot) emit the complete current state and are unaffected.
    // The gap only exists when a vacuum commit lies INSIDE (from, to]: a
    // vacuum at-or-before `from` could only drop tombstones the base image
    // already reflects (its droppable lsns are ≤ the floor by definition),
    // and a vacuum after `to` rewrites files in a LATER snapshot — the
    // range's own added files still physically carry their tombstones. So a
    // pinned historical range keeps working after later retention.
    // each in-range vacuum is judged by ITS OWN dropped high-water
    // (Snapshot.vacuumHw; legacy vacuum snapshots without one fall back to
    // the conservative table-current vacuumLsn) — judging by the current
    // vacuumLsn alone would spuriously fail a pinned historical range after
    // any LATER vacuum, even though its files are immutable and exact
    val inRangeVacuumHw = m.snapshots.filter(s =>
      s.operation == "vacuum" && s.snapshotId > fromSnapshotId &&
        toSnap.forall(s.snapshotId <= _.snapshotId))
      .map(s => if (s.vacuumHw >= 0) s.vacuumHw else m.vacuumLsn)
      .foldLeft(-1L)(math.max)
    if (fromSnap.isDefined && inRangeVacuumHw > lsnFloor)
      sys.error(s"tombstones up to lsn $inRangeVacuumHw were vacuumed past this " +
        s"feed's floor ($lsnFloor): deletes in that range are unobservable — " +
        "re-bootstrap the consumer (fromSnapshot/startingSnapshot = 0)")
    // rollback gap: the added-files + lsn-floor discipline is exact iff the
    // range's two endpoints cover the SAME lsns below the floor — a rollback
    // between them that reverted writes the base already includes (or
    // resurrected writes the base excludes) can never emit those keys' net
    // change through the floor filter, because the restored files carry only
    // at-or-under-floor lsns. Exclusion spans are per-snapshot lineage
    // metadata, so this compares endpoints only: intermediate rollbacks that
    // were rolled FORWARD again (net no-op by `to`) correctly pass.
    def excludedBelowFloor(s: graft.lake.Snapshot): Seq[graft.lake.LsnSpan] =
      graft.lake.LsnSpan.belowFloor(s.excludedLsns, lsnFloor)
    for (f <- fromSnap; t <- toSnap)
      if (excludedBelowFloor(t) != excludedBelowFloor(f))
        sys.error(s"a rollback between snapshots ${f.snapshotId} and " +
          s"${t.snapshotId} changed which lsns at or under this feed's floor " +
          s"($lsnFloor) are applied (excluded: ${excludedBelowFloor(f)} vs " +
          s"${excludedBelowFloor(t)}): the revert is unobservable " +
          "incrementally — re-bootstrap the consumer " +
          "(fromSnapshot/startingSnapshot = 0)")
    val added = toSnap.map(_.files).getOrElse(Seq.empty)
      .filterNot(f => fromPaths.contains(f.path))
      .filter(_.lsnMax > lsnFloor) // manifest skip: pure rewrites carry no news
    val targetByName = target.columns.map(c => c.name -> c).toMap
    val dataFields = required.fields.filter(f =>
      f.name != GraftChangesTable.ChangeTypeCol && f.name != LakeTable.LsnCol)
    val wantCt = required.fieldNames.contains(GraftChangesTable.ChangeTypeCol)
    val wantLsn = required.fieldNames.contains(LakeTable.LsnCol)
    // Merge-on-read: a BOOTSTRAP read (no fromSnapshot) over a table with
    // live delta layers must not serve raw files — a key superseded by a
    // delta layer would emit BOTH versions as upserts, and a delta
    // tombstone's masked pre-image would emit alongside its delete. Buckets
    // holding delta files plan as one merge partition that LWW-resolves the
    // bucket's complete file set and emits live winners as upserts and
    // tombstone winners as deletes — exactly the documented bootstrap image.
    // Incremental ranges need none of this: the anti-stale probe in
    // `merge(delta = true)` guarantees every delta row is a TRUE change, so
    // per-file planning + the lsn floor stays exact (multiple layers of one
    // key in a range emit as multiple change events, like any CDC log).
    val mergeBuckets: Set[Int] =
      if (fromSnap.isDefined) Set.empty
      else added.filter(_.isDelta).map(_.bucket).toSet
    val (layered, plain) = added.partition(f => mergeBuckets.contains(f.bucket))
    def colSpecsFor(f: graft.lake.DataFileMeta,
        fields: Seq[StructField]): Array[ColSpec] = {
      val storedById = m.schemaById(f.schemaId).byId
      fields.map { rf =>
        if (rf.name == LakeTable.LsnCol || rf.name == LakeTable.DeletedCol)
          ColSpec(rf.name, rf.dataType.json, rf.name, rf.dataType.json)
        else {
          val cd = targetByName(rf.name)
          storedById.get(cd.id) match {
            case Some(st) => ColSpec(cd.name, cd.dataTypeJson, st.name, st.dataTypeJson)
            case None => ColSpec(cd.name, cd.dataTypeJson, null, null)
          }
        }
      }.toArray
    }
    val plainParts: Seq[InputPartition] = plain.map { f =>
      val cols = colSpecsFor(f, dataFields.toSeq)
      val identity = cols.forall(c => c.storedName == c.outName &&
        c.storedTypeJson == c.outTypeJson && GraftScan.vectorizable(c.outTypeJson))
      val columnar = !f.hasTombstones && f.lsnMin > lsnFloor && identity &&
        (cols.nonEmpty || wantLsn) // ≥1 stored column must drive the reader
      GraftChangesPartition(s"$root/${f.path}", cols, lsnFloor, wantCt, wantLsn, columnar)
    }
    val mergeParts: Seq[InputPartition] =
      if (layered.isEmpty) Seq.empty
      else {
        val ml = MergeLayout.of(dataFields.toSeq, m.keyCols,
          target.columns.map(c =>
            c.name -> StructField(c.name, c.dataType, c.nullable)).toMap)
        layered.groupBy(_.bucket).toSeq.sortBy(_._1).map { case (_, fs) =>
          val slices = fs.map(f =>
            MergeFileSlice(s"$root/${f.path}", colSpecsFor(f, ml.fields)))
          GraftChangesMergePartition(slices.toArray, ml.keyIdx, ml.lsnIdx,
            ml.delIdx, dataFields.length, wantCt, wantLsn)
        }
      }
    (plainParts ++ mergeParts).toArray
  }
}

/** Snapshot-id offset of the change stream. */
case class GraftChangesOffset(snapshotId: Long) extends Offset {
  override def json: String = snapshotId.toString
}

class GraftChangesStream(root: String, target: SchemaVersion,
    required: StructType, options: CaseInsensitiveStringMap) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles}

  private def meta: TableMeta = LakeTable.metaAt(root)

  /** Trigger.AvailableNow contract: pin the drain target when the query
    * starts, so the rate-limited catch-up below runs batch after batch until
    * exactly this snapshot and then terminates — commits landing mid-drain
    * wait for the next run. (Without this interface Spark demotes
    * AvailableNow to a single batch, which would defeat the pacing.) */
  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(meta.currentSnapshotId)

  override def initialOffset(): Offset = GraftChangesOffset(
    Option(options.get("startingSnapshot")).map(_.toLong)
      .getOrElse(meta.currentSnapshotId)) // default: tail from now
  override def latestOffset(): Offset = GraftChangesOffset(meta.currentSnapshotId)
  override def deserializeOffset(json: String): Offset =
    GraftChangesOffset(json.trim.toLong)

  /** Admission control (`maxFilesPerTrigger` option): without it, a consumer
    * restarting from an old floor — or bootstrapping a large table — gets
    * ONE micro-batch covering the whole backlog, which at warehouse scale
    * means an unbounded task wave and a checkpoint that only lands at the
    * very end. With it, each micro-batch ends at the FURTHEST snapshot whose
    * cumulative added-file count (the exact per-file work `partitions()`
    * will plan, pure rewrites already excluded) stays within the cap —
    * always advancing at least one snapshot, since offsets are
    * snapshot-granular (one commit is the smallest replayable unit, as in
    * Delta/Iceberg rate limiting). Progress is checkpointed per batch, so a
    * kill mid-backlog resumes where it stopped instead of restarting the
    * whole catch-up. */
  override def getDefaultReadLimit: ReadLimit =
    Option(options.get("maxFilesPerTrigger"))
      .map(n => ReadLimit.maxFiles(n.toInt)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val m = meta
    val startId = start.asInstanceOf[GraftChangesOffset].snapshotId
    val latest = availableNowTarget.getOrElse(m.currentSnapshotId)
    limit match {
      case mf: ReadMaxFiles if latest > startId =>
        val startPaths = m.snapshotById(startId)
          .map(_.files.map(_.path).toSet).getOrElse(Set.empty)
        val floor =
          if (startId <= 0) -1L
          else m.snapshotById(startId)
            .map(_.files.map(_.lsnMax).foldLeft(-1L)(math.max)).getOrElse(-1L)
        def addedCount(s: graft.lake.Snapshot): Int = s.files
          .count(f => !startPaths.contains(f.path) && f.lsnMax > floor)
        val candidates = m.snapshots
          .filter(s => s.snapshotId > startId && s.snapshotId <= latest)
          .sortBy(_.snapshotId)
        if (candidates.isEmpty) GraftChangesOffset(startId)
        else {
          var end = candidates.head.snapshotId // always advance one snapshot
          candidates.drop(1).takeWhile(addedCount(_) <= mf.maxFiles)
            .foreach(s => end = s.snapshotId)
          GraftChangesOffset(end)
        }
      case _ => GraftChangesOffset(latest)
    }
  }

  override def reportLatestOffset(): Offset = GraftChangesOffset(meta.currentSnapshotId)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GraftChangesScan.partitions(root, meta, target, required,
      start.asInstanceOf[GraftChangesOffset].snapshotId,
      end.asInstanceOf[GraftChangesOffset].snapshotId)
  // row readers only: the factory is created once for the stream's life but
  // columnar eligibility varies per micro-batch's file set
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftChangesReaderFactory(allColumnar = false,
      GraftStreamingWrite.sessionHadoopConf())
}

case class GraftChangesPartition(filePath: String, cols: Array[ColSpec],
    lsnFloor: Long, wantChangeType: Boolean, wantLsn: Boolean,
    columnar: Boolean) extends InputPartition

/** One merge-on-read BUCKET of a bootstrap feed read: every file of a
  * delta-carrying bucket, LWW-resolved before serving so the bootstrap
  * image holds exactly one event per key — live winners as "upsert",
  * tombstone winners as "delete" (see [[GraftChangesMergeReader]]). */
case class GraftChangesMergePartition(files: Array[MergeFileSlice],
    keyIdx: Array[Int], lsnIdx: Int, delIdx: Int, dataLen: Int,
    wantChangeType: Boolean, wantLsn: Boolean) extends InputPartition

/** Ships the driver-captured session hadoop conf to executor readers — a
  * bare `new Configuration()` there misses every `spark.hadoop.*` setting
  * (defaultFS, object-store credentials); see [[GraftReaderFactory]]. */
class GraftChangesReaderFactory(allColumnar: Boolean,
    hadoopConf: Map[String, String]) extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = allColumnar
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case m: GraftChangesMergePartition =>
        new GraftChangesMergeReader(m, GraftStreamingWrite.toConfiguration(hadoopConf))
      case p: GraftChangesPartition =>
        new GraftChangesPartitionReader(p, GraftStreamingWrite.toConfiguration(hadoopConf))
    }
  override def createColumnarReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new GraftChangesColumnarReader(partition.asInstanceOf[GraftChangesPartition],
      GraftStreamingWrite.toConfiguration(hadoopConf))
}

/** Vectorized read of one tombstone-free, above-floor, identity-mapped added
  * file: the data columns (+ `_lsn`) stream through Spark's own
  * VectorizedParquetRecordReader untouched, and `_change_type` — constant
  * "upsert" for such a file — is a ConstantColumnVector spliced into each
  * batch. No per-row materialization anywhere. */
class GraftChangesColumnarReader(p: GraftChangesPartition,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.datasources.parquet.{GraftVectorizedBridge, VectorizedParquetRecordReader}
  import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val storedNames: Array[String] =
    p.cols.map(_.storedName) ++ (if (p.wantLsn) Array(LakeTable.LsnCol) else Array.empty[String])
  private val reader = new VectorizedParquetRecordReader(
    /* useOffHeap = */ false, /* capacity = */ 4096)
  locally {
    // manual open with the SHIPPED conf (the one-call initialize builds a
    // bare Configuration internally) — same path as GraftColumnarReader
    import org.apache.parquet.HadoopReadOptions
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val hPath = new org.apache.hadoop.fs.Path(p.filePath)
    val fr = new ParquetFileReader(HadoopInputFile.fromPath(hPath, conf),
      HadoopReadOptions.builder(conf, hPath).build())
    val fileSchema = fr.getFooter.getFileMetaData.getSchema
    val want = storedNames.toSet
    val requested = new org.apache.parquet.schema.MessageType(fileSchema.getName,
      fileSchema.getFields.asScala.filter(f => want.contains(f.getName)).asJava)
    GraftVectorizedBridge.initFiltered(reader, requested, fileSchema, fr)
  }
  private val fileBatch = reader.resultBatch()
  reader.enableReturningBatches()

  private val out: ColumnarBatch = {
    val n = p.cols.length + (if (p.wantChangeType) 1 else 0) + (if (p.wantLsn) 1 else 0)
    val vecs = new Array[ColumnVector](n)
    var i = 0
    while (i < p.cols.length) { vecs(i) = fileBatch.column(i); i += 1 }
    if (p.wantChangeType) {
      val ct = new ConstantColumnVector(4096, StringType)
      ct.setUtf8String(UTF8String.fromString("upsert"))
      vecs(i) = ct; i += 1
    }
    if (p.wantLsn) vecs(i) = fileBatch.column(p.cols.length)
    new ColumnarBatch(vecs)
  }

  override def next(): Boolean = {
    val has = reader.nextBatch()
    if (has) out.setNumRows(fileBatch.numRows())
    has
  }
  override def get(): ColumnarBatch = out
  override def close(): Unit = reader.close()
}

/** Row reader over one added data file: rows at or under the lsn floor are
  * rewrite carry-overs (skipped); live rows emit as "upsert" post-images,
  * tombstones as "delete" (key columns + whatever the delete stored). */
class GraftChangesPartitionReader(p: GraftChangesPartition,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.schema.MessageType

  private val hPath = new org.apache.hadoop.fs.Path(p.filePath)

  private val reader: ParquetReader[Group] = {
    val fr = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
    val fileSchema = try fr.getFooter.getFileMetaData.getSchema finally fr.close()
    val want = (p.cols.flatMap(c => Option(c.storedName)) :+
      LakeTable.DeletedCol :+ LakeTable.LsnCol).toSet
    val projected = new MessageType(fileSchema.getName,
      fileSchema.getFields.asScala.filter(f => want.contains(f.getName)).asJava)
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projected.toString)
    // lsn > floor as a parquet filter: append-path files are lsn-ordered, so
    // their row groups carry narrow lsn stats — a catch-up feed over a big
    // mixed file (lsnMin ≤ floor < lsnMax) decodes only the post-floor
    // groups instead of scanning carry-over history. Merge-rewritten files
    // interleave lsns (broad stats) and simply don't skip; the reader's own
    // per-row floor check below stays as the exactness backstop either way.
    val b = ParquetReader.builder(new GroupReadSupport(), hPath).withConf(conf)
    val floorPred = org.apache.parquet.filter2.predicate.FilterApi.gt(
      org.apache.parquet.filter2.predicate.FilterApi.longColumn(LakeTable.LsnCol),
      java.lang.Long.valueOf(p.lsnFloor))
    (if (p.lsnFloor >= 0)
       b.withFilter(org.apache.parquet.filter2.compat.FilterCompat.get(floorPred))
     else b).build()
  }

  private val upsert = UTF8String.fromString("upsert")
  private val delete = UTF8String.fromString("delete")
  private var current: InternalRow = _

  override def next(): Boolean = {
    var g = reader.read()
    while (g != null) {
      val lsn = g.getLong(LakeTable.LsnCol, 0)
      if (lsn > p.lsnFloor) { current = toRow(g, lsn); return true }
      g = reader.read()
    }
    false
  }

  private val colReaders = new ColReaders(p.cols)

  private def toRow(g: Group, lsn: Long): InternalRow = {
    val deleted = GroupReads.isDeleted(g)
    val vals = new Array[Any](p.cols.length +
      (if (p.wantChangeType) 1 else 0) + (if (p.wantLsn) 1 else 0))
    var i = 0
    while (i < p.cols.length) { vals(i) = colReaders.read(g, i); i += 1 }
    if (p.wantChangeType) { vals(i) = if (deleted) delete else upsert; i += 1 }
    if (p.wantLsn) vals(i) = lsn
    new GenericInternalRow(vals)
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

/** Bootstrap feed reader for ONE merge-on-read bucket: LWW-resolves the
  * bucket's complete file set (base + delta layers) via
  * [[BucketMergeResolve]], then emits each winner once — live rows as
  * "upsert" post-images, tombstone winners as "delete" — so the bootstrap
  * image is exactly the table's current state, never a superseded layer. */
class GraftChangesMergeReader(p: GraftChangesMergePartition,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val winners: java.util.Iterator[Array[Any]] =
    BucketMergeResolve.winners(p.files, p.keyIdx, p.lsnIdx, p.delIdx, conf)

  private val upsert = UTF8String.fromString("upsert")
  private val delete = UTF8String.fromString("delete")
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!winners.hasNext) false
    else {
      val v = winners.next()
      val deleted = v(p.delIdx).asInstanceOf[Boolean]
      val vals = new Array[Any](p.dataLen +
        (if (p.wantChangeType) 1 else 0) + (if (p.wantLsn) 1 else 0))
      System.arraycopy(v, 0, vals, 0, p.dataLen)
      var i = p.dataLen
      if (p.wantChangeType) { vals(i) = if (deleted) delete else upsert; i += 1 }
      if (p.wantLsn) vals(i) = v(p.lsnIdx)
      current = new GenericInternalRow(vals)
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
