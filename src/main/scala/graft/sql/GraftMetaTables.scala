package graft.sql

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._
import graft.lake.{LakeTable, TableMeta}

/** Iceberg-style introspection metadata tables, addressed by suffix:
  * `SELECT * FROM graftsql.ns.\`t$snapshots\`` (commit history: operation,
  * wall clock, file/row/byte totals, files added vs parent, lsn high-water)
  * and `t$files` (the CURRENT snapshot's manifest: per-file bucket, row
  * count, lsn range, size, tombstone flag and column min/max stats keyed by
  * column NAME). Everything answers from table metadata on the driver —
  * zero data files read — which is what makes `$files` the right way to
  * inspect layout health (small-file counts, skew, stats coverage) on a
  * 100 TB table. The reference's analogue is Postgres catalog queries; the
  * operational need it serves is the `sync_records` bookkeeping the
  * reference inspects per beat (`queries/sync_records.py:3-5`). */
object GraftMetaTables {
  val SnapshotsSuffix = "$snapshots"
  val FilesSuffix = "$files"
  val ViewsSuffix = "$views"

  val snapshotsSchema: StructType = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false),
    StructField("parent_id", LongType, nullable = false),
    StructField("epoch_id", LongType, nullable = false),
    StructField("schema_id", IntegerType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("file_count", IntegerType, nullable = false),
    StructField("total_rows", LongType, nullable = false),
    StructField("total_bytes", LongType, nullable = false),
    StructField("added_files", IntegerType, nullable = false),
    StructField("lsn_max", LongType, nullable = false),
    // -1 unless operation = 'rollback': the snapshot whose state was restored
    StructField("rollback_of", LongType, nullable = false),
    // content-addressed manifest holding this snapshot's file list (Iceberg's
    // manifest_list analogue); "" for legacy inline metadata. Snapshots with
    // identical file sets share one manifest, so equal values here mean
    // "same physical state" — a zero-cost layout-health signal.
    StructField("manifest_file", StringType, nullable = false)))

  val filesSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("schema_id", IntegerType, nullable = false),
    StructField("row_count", LongType, nullable = false),
    StructField("lsn_min", LongType, nullable = false),
    StructField("lsn_max", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("has_tombstones", BooleanType, nullable = false),
    StructField("is_delta", BooleanType, nullable = false),
    StructField("col_mins", MapType(StringType, StringType), nullable = false),
    StructField("col_maxs", MapType(StringType, StringType), nullable = false)))

  /** `t$views`: the table's declared maintained views with their refresh
    * state — definition columns straight from metadata, `materialized` /
    * `refreshed_to_snapshot` from the (ownership-verified) view table's own
    * ledger. `refreshed_to_snapshot < current_snapshot` = the view is stale
    * and the next `refresh_views` will catch it up. */
  val viewsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("group_cols", StringType, nullable = false),
    StructField("agg_cols", StringType, nullable = false), // src:alias csv
    StructField("count_alias", StringType, nullable = false),
    StructField("lg_k", IntegerType, nullable = false),
    StructField("materialized", BooleanType, nullable = false),
    StructField("refreshed_to_snapshot", LongType, nullable = false), // -1 = never
    StructField("current_snapshot", LongType, nullable = false)))

  def viewRows(m: TableMeta, root: String): Seq[InternalRow] = {
    val parent = java.nio.file.Paths.get(root).toAbsolutePath.getParent
    m.maintainedViews.map { v =>
      val path = parent.resolve(v.name).toString
      // ONE metadata load per view (exists + scala.util.Try absorbs a
      // concurrent drop between the listing and the load), reused for both
      // the ownership check and the refresh watermark
      val vm = if (LakeTable.exists(path))
        scala.util.Try(LakeTable.metaAt(path)).toOption else None
      val owned = vm.exists(_.tableId ==
        graft.lake.ViewMaintainer.viewTableId(m.tableId, v.name))
      val refreshedTo = if (owned) vm.get.epochHighWater else -1L
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(v.name), UTF8String.fromString(v.kind),
        UTF8String.fromString(v.groupCols.mkString(",")),
        UTF8String.fromString(v.aggCols.map(a => s"${a.src}:${a.alias}").mkString(",")),
        UTF8String.fromString(v.countAlias), v.lgK,
        owned, refreshedTo, m.currentSnapshotId))
    }
  }

  def snapshotRows(m: TableMeta): Seq[InternalRow] = {
    val byId = m.snapshots.map(s => s.snapshotId -> s).toMap
    m.snapshots.map { s =>
      val parentPaths = byId.get(s.parentId).map(_.files.map(_.path).toSet)
        .getOrElse(Set.empty[String])
      new GenericInternalRow(Array[Any](
        s.snapshotId, s.parentId, s.epochId, s.schemaId,
        UTF8String.fromString(s.operation), s.wallClockMs * 1000L,
        s.files.size, s.files.map(_.rowCount).sum, s.files.map(_.sizeBytes).sum,
        s.files.count(f => !parentPaths.contains(f.path)),
        s.files.map(_.lsnMax).foldLeft(0L)(math.max), s.rollbackOf,
        UTF8String.fromString(s.manifestFile)))
    }
  }

  def fileRows(m: TableMeta): Seq[InternalRow] =
    m.currentSnapshot.map(_.files).getOrElse(Seq.empty).map { f =>
      // stats are stored by column ID; resolve to names through the schema
      // the file was written under (a renamed column shows its CURRENT name
      // only if the id still resolves there — use the file's own schema, the
      // names its footer actually carried)
      val names = m.schemaById(f.schemaId).columns.map(c => c.id.toString -> c.name).toMap
      def toMap(stats: Map[String, String]) = ArrayBasedMapData(
        stats.toSeq.sortBy(_._1).map { case (id, v) =>
          UTF8String.fromString(names.getOrElse(id, s"#$id")) }.toArray[Any],
        stats.toSeq.sortBy(_._1).map(kv => UTF8String.fromString(kv._2)).toArray[Any])
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(f.path), f.bucket, f.schemaId, f.rowCount,
        f.lsnMin, f.lsnMax, f.sizeBytes, f.hasTombstones, f.isDelta,
        toMap(f.colMins), toMap(f.colMaxs)))
    }
}

class GraftMetaTable(root: String, displayName: String, kind: String)
    extends Table with SupportsRead {
  override def name(): String = displayName
  override def schema(): StructType = kind match {
    case "files" => GraftMetaTables.filesSchema
    case "views" => GraftMetaTables.viewsSchema
    case _ => GraftMetaTables.snapshotsSchema
  }
  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): util.Map[String, String] =
    Map("location" -> root, "format" -> "graft-lake-meta").asJava
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  /** Spark's own LocalScan: rows are computed on the driver at scan build
    * (pinned metadata read) and planned as a LocalTableScan — no tasks, no
    * partitions, no InternalRow serialization. Same mechanism procedure
    * results use (GraftProcedures). */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => {
      val m = LakeTable.metaAt(root)
      val out = schema()
      val data = (kind match {
        case "files" => GraftMetaTables.fileRows(m)
        case "views" => GraftMetaTables.viewRows(m, root)
        case _ => GraftMetaTables.snapshotRows(m)
      }).toArray
      new LocalScan {
        override def readSchema(): StructType = out
        override def rows(): Array[InternalRow] = data
        override def description(): String = s"GraftMetaScan(rows=${data.length})"
      }
    }
}
