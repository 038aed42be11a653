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
    new ScanBuilder {
      override def build(): Scan = new GraftChangesScan(root, options)
    }
}

object GraftChangesTable {
  val Suffix = "$changes"
  val ChangeTypeCol = "_change_type"
  def changeSchema(data: StructType): StructType = StructType(data.fields :+
    StructField(ChangeTypeCol, StringType, nullable = false) :+
    StructField(LakeTable.LsnCol, LongType, nullable = false))
}

class GraftChangesScan(root: String, options: CaseInsensitiveStringMap) extends Scan {
  // the read schema is pinned at scan creation (streams must keep a stable
  // schema for their whole life); later file schemas map to it by column id
  private val schemaAtPlan: SchemaVersion = {
    val m = LakeTable.metaAt(root)
    m.schemaById(m.currentSchemaId)
  }

  override def readSchema(): StructType =
    GraftChangesTable.changeSchema(schemaAtPlan.toStruct)
  override def description(): String = s"GraftChangesScan($root)"

  override def toBatch: Batch = new Batch {
    private val m = LakeTable.metaAt(root)
    private val from = Option(options.get("fromSnapshot")).map(_.toLong).getOrElse(-1L)
    private val to = Option(options.get("toSnapshot")).map(_.toLong)
      .getOrElse(m.currentSnapshotId)
    override def planInputPartitions(): Array[InputPartition] =
      GraftChangesScan.partitions(root, m, schemaAtPlan, from, to)
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftChangesReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftChangesStream(root, schemaAtPlan, options)
}

object GraftChangesScan {
  /** One InputPartition per data file the range (from, to] added, minus the
    * files manifest-provably free of post-floor rows. */
  private[sql] def partitions(root: String, m: TableMeta, target: SchemaVersion,
      fromSnapshotId: Long, toSnapshotId: Long): Array[InputPartition] = {
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
    val added = toSnap.map(_.files).getOrElse(Seq.empty)
      .filterNot(f => fromPaths.contains(f.path))
      .filter(_.lsnMax > lsnFloor) // manifest skip: pure rewrites carry no news
    added.map { f =>
      val storedById = m.schemaById(f.schemaId).byId
      val cols = target.columns.map { cd =>
        storedById.get(cd.id) match {
          case Some(st) => ColSpec(cd.name, cd.dataTypeJson, st.name, st.dataTypeJson)
          case None => ColSpec(cd.name, cd.dataTypeJson, null, null)
        }
      }.toArray
      GraftChangesPartition(s"$root/${f.path}", cols, lsnFloor): InputPartition
    }.toArray
  }
}

/** Snapshot-id offset of the change stream. */
case class GraftChangesOffset(snapshotId: Long) extends Offset {
  override def json: String = snapshotId.toString
}

class GraftChangesStream(root: String, target: SchemaVersion,
    options: CaseInsensitiveStringMap) extends MicroBatchStream {
  private def meta: TableMeta = LakeTable.metaAt(root)

  override def initialOffset(): Offset = GraftChangesOffset(
    Option(options.get("startingSnapshot")).map(_.toLong)
      .getOrElse(meta.currentSnapshotId)) // default: tail from now
  override def latestOffset(): Offset = GraftChangesOffset(meta.currentSnapshotId)
  override def deserializeOffset(json: String): Offset =
    GraftChangesOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GraftChangesScan.partitions(root, meta, target,
      start.asInstanceOf[GraftChangesOffset].snapshotId,
      end.asInstanceOf[GraftChangesOffset].snapshotId)
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftChangesReaderFactory
}

case class GraftChangesPartition(filePath: String, cols: Array[ColSpec],
    lsnFloor: Long) extends InputPartition

class GraftChangesReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftChangesPartitionReader(partition.asInstanceOf[GraftChangesPartition])
}

/** Row reader over one added data file: rows at or under the lsn floor are
  * rewrite carry-overs (skipped); live rows emit as "upsert" post-images,
  * tombstones as "delete" (key columns + whatever the delete stored). */
class GraftChangesPartitionReader(p: GraftChangesPartition)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.schema.MessageType

  private val conf = new org.apache.hadoop.conf.Configuration()
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
    ParquetReader.builder(new GroupReadSupport(), hPath).withConf(conf).build()
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

  private def toRow(g: Group, lsn: Long): InternalRow = {
    val deleted = g.getType.containsField(LakeTable.DeletedCol) &&
      g.getFieldRepetitionCount(LakeTable.DeletedCol) > 0 &&
      g.getBoolean(LakeTable.DeletedCol, 0)
    val vals = new Array[Any](p.cols.length + 2)
    var i = 0
    while (i < p.cols.length) {
      val c = p.cols(i)
      vals(i) =
        if (c.storedName == null || !g.getType.containsField(c.storedName) ||
            g.getFieldRepetitionCount(c.storedName) == 0) null
        else GroupReads.widen(
          GroupReads.read(g, c.storedName, DataType.fromJson(c.storedTypeJson)),
          DataType.fromJson(c.storedTypeJson), DataType.fromJson(c.outTypeJson))
      i += 1
    }
    vals(p.cols.length) = if (deleted) delete else upsert
    vals(p.cols.length + 1) = lsn
    new GenericInternalRow(vals)
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
