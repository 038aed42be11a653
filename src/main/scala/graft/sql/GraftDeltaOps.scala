package graft.sql

import java.util.Optional
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.lake.{DataFileMeta, LakeTable, TableMeta}

/** SQL row-level DML — `UPDATE`, `MERGE INTO`, and predicate-shaped `DELETE`
  * that metadata delete can't absorb (e.g. subqueries) — via Spark's
  * delta-based row-level operation API ([[SupportsDelta]]).
  *
  * Spark rewrites the statement into a join/filter plan over this
  * operation's scan and streams per-row actions into [[GraftDeltaWriter]]s:
  * inserts carry the full new row, deletes carry only the row id (= the
  * table's key columns — the engine's natural row identity, so no physical
  * position tracking is needed and matched files are NOT rewritten by
  * Spark). Updates are represented as delete + insert
  * (`representUpdateAsDeleteAndInsert`), which also makes key-changing
  * `UPDATE ... SET <key> = ...` correct: the old key is tombstoned, the new
  * key upserted.
  *
  * Executor tasks stage their actions as parquet (same Group-API staging as
  * [[GraftStreamingWrite]]); the driver-side commit resolves the actions
  * into ONE native LWW merge commit at lsn = high-water + 1:
  *  - a key with any staged insert wins as an upsert (a split update's
  *    delete of the same key is subsumed — at one lsn the engine's tiebreak
  *    is D > I, so the delete half must not reach the merge);
  *  - a key with only deletes becomes a tombstone (`op = "D"`);
  *  - duplicate inserts per key dedup deterministically (max payload hash),
  *    the same in-statement rule as SQL INSERT.
  * The change feed, vacuum and downstream syncs therefore see SQL
  * UPDATE/MERGE exactly like native merges. Reference analogue: the ON
  * CONFLICT upsert + soft-delete flag (`queries/fact_studies.py:63-83`).
  */
class GraftRowLevelOperation(root: String, meta: TableMeta, schemaId: Int,
    files: Seq[DataFileMeta], full: StructType, cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"GraftRowLevelOperation($cmd)"

  /** The rows Spark matches against: the live-table scan, with the same
    * column pruning + manifest file skipping as any SQL read. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // the row-level scan is always the CURRENT snapshot, so the current
    // bucket layout holds — a lake-to-lake MERGE source can co-locate
    new GraftScanBuilder(root, meta, schemaId, files, full, Some(meta.numBuckets))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new GraftDeltaWrite(root, full, info)
    }

  /** Row identity = the table's key columns (LWW merge identity). */
  override def rowId(): Array[NamedReference] =
    meta.keyCols.map(Expressions.column).toArray

  override def representUpdateAsDeleteAndInsert(): Boolean = true
}

class GraftDeltaWrite(root: String, tableSchema: StructType, info: LogicalWriteInfo)
    extends DeltaWrite {
  override def toBatch: DeltaBatchWrite = new GraftDeltaBatchWrite(root, tableSchema,
    info.queryId(), info.schema(),
    info.rowIdSchema().orElse(new StructType()))
}

class GraftDeltaBatchWrite(root: String, tableSchema: StructType, queryId: String,
    rowSchema: StructType, rowIdSchema: StructType) extends DeltaBatchWrite {

  private def stageDir = java.nio.file.Paths.get(root, "_deltastage", queryId)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftDeltaWriterFactory(stageDir.toString, tableSchema, rowSchema, rowIdSchema,
      GraftStreamingWrite.sessionHadoopConf())

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case StagedEpochFile(p) if p != null => p }
    try {
      if (files.nonEmpty) {
        import org.apache.spark.sql.functions._
        val spark = SparkSession.active
        val t = LakeTable.forPath(spark, root)
        val dataCols = t.meta.currentSchema.columns.map(_.name)
        val keyCols = t.meta.keyCols
        val stagedSchema = StructType(
          tableSchema.fields :+ StructField(GraftDeltaBatchWrite.OpCol, StringType))
        val staged = spark.read.schema(stagedSchema).parquet(files.toIndexedSeq: _*)
        // per-key action resolution (see class doc): any insert beats every
        // delete of the same key; among inserts, max payload hash wins
        val ordering = struct(
          (col(GraftDeltaBatchWrite.OpCol) === "I").cast("int").as("i"),
          xxhash64(dataCols.map(col): _*).as("h"))
        val resolved = staged
          .groupBy(keyCols.map(col): _*)
          .agg(
            max((col(GraftDeltaBatchWrite.OpCol) === "I").cast("int")).as("__hasI"),
            max_by(struct(dataCols.map(col): _*), ordering).as("__r"))
          .select(col("__r.*"),
            when(col("__hasI") === 1, "I").otherwise("D").as("op"))
        t.merge(resolved.withColumn("lsn", lit(t.nextLsn)))
      }
    } finally LakeTable.deleteRecursively(stageDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    LakeTable.deleteRecursively(stageDir)
}

object GraftDeltaBatchWrite {
  /** Staged-action column: "I" (insert/upsert) or "D" (delete by key). */
  val OpCol = "__op"
}

class GraftDeltaWriterFactory(stageRoot: String, tableSchema: StructType,
    rowSchema: StructType, rowIdSchema: StructType,
    hadoopConf: Map[String, String]) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(s"$stageRoot/part-$partitionId-$taskId.parquet",
      tableSchema, rowSchema, rowIdSchema, hadoopConf)
}

/** Stages row-level actions as parquet rows of (table columns + __op):
  * inserts land with their full payload, deletes with key columns only.
  * Rows are rebuilt into staged order driver-declared schemas say — the
  * insert row arrives in the write's row schema, the delete id in the
  * row-id schema (Spark projects both; see `LogicalWriteInfo.rowIdSchema`).
  * Value copies happen synchronously inside [[GraftStagingWriter.write]],
  * so Spark's reused row buffers are never retained. */
class GraftDeltaWriter(path: String, tableSchema: StructType,
    rowSchema: StructType, rowIdSchema: StructType,
    hadoopConf: Map[String, String] = Map.empty) extends DeltaWriter[InternalRow] {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  private val staged = StructType(
    tableSchema.fields :+ StructField(GraftDeltaBatchWrite.OpCol, StringType))
  private val out = new GraftStagingWriter(path, staged, hadoopConf)
  private val opI = org.apache.spark.unsafe.types.UTF8String.fromString("I")
  private val opD = org.apache.spark.unsafe.types.UTF8String.fromString("D")

  // staged field i ← insert-row position (rowSchema is empty for DELETE
  // commands, where insert() is never called — resolve lazily)
  private lazy val insertIdx: Array[Int] =
    tableSchema.fields.map(f => rowSchema.fieldIndex(f.name))
  // staged field i ← row-id position, or -1 (non-key fields stage null)
  private val idIdx: Array[Int] = tableSchema.fields.map(f =>
    if (rowIdSchema.fieldNames.contains(f.name)) rowIdSchema.fieldIndex(f.name) else -1)

  private def stage(vals: Array[Any], op: Any): Unit = {
    vals(staged.length - 1) = op
    out.write(new GenericInternalRow(vals))
  }

  override def insert(row: InternalRow): Unit = {
    val vals = new Array[Any](staged.length)
    var i = 0
    while (i < tableSchema.length) {
      val src = insertIdx(i)
      vals(i) = if (row.isNullAt(src)) null else row.get(src, tableSchema(i).dataType)
      i += 1
    }
    stage(vals, opI)
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    val vals = new Array[Any](staged.length)
    var i = 0
    while (i < tableSchema.length) {
      val src = idIdx(i)
      vals(i) = if (src < 0 || id.isNullAt(src)) null else id.get(src, tableSchema(i).dataType)
      i += 1
    }
    stage(vals, opD)
  }

  /** Not used while `representUpdateAsDeleteAndInsert` is true, but the
    * semantics hold either way: the commit-side resolution turns the
    * delete+insert pair back into one upsert when the key is unchanged. */
  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(metadata, id); insert(row)
  }
  override def reinsert(metadata: InternalRow, row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage = out.commit()
  override def abort(): Unit = out.abort()
  override def close(): Unit = out.close()
}
