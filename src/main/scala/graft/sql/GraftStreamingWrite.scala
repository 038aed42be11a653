package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.LakeTable

/** Streaming SQL writes: `df.writeStream.toTable("graftsql.ns.t")`.
  *
  * Shape: executor tasks spill their micro-batch partition to staging
  * parquet (Group API — no Spark machinery needed executor-side), and the
  * EPOCH COMMIT on the driver runs the engine's native plan over exactly
  * the files the committed tasks reported:
  *  - append mode — keyed MERGE upsert at lsn = high-water + 1 (same
  *    semantics as SQL INSERT INTO, including deterministic in-batch key
  *    dedup), so the stream is a CDC upsert feed into the table;
  *  - complete mode (`truncate()`) — full `replace` per epoch, for
  *    streaming aggregation results.
  *
  * Exactly-once: merge/replace are epoch-ledgered (a replayed epoch after a
  * crash is a no-op), task retries are excluded because the commit reads
  * only the file paths carried in committed tasks' messages, and staging is
  * deleted after commit (also on abort). One streaming query per table at a
  * time — the epoch ledger is per-table, the same contract as the native
  * [[graft.cdc.CdcPipeline]]. */
class GraftStreamingWrite(root: String, queryId: String, writeSchema: StructType,
    overwrite: Boolean, cdc: Boolean = false) extends StreamingWrite {

  private def stageDir(epochId: Long) =
    java.nio.file.Paths.get(root, "_streamstage", queryId, s"epoch-$epochId")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamingWriterFactory(
      java.nio.file.Paths.get(root, "_streamstage", queryId).toString, writeSchema,
      GraftStreamingWrite.sessionHadoopConf())

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case StagedEpochFile(p) if p != null => p }
    val dir = stageDir(epochId)
    try {
      if (files.nonEmpty) {
        val spark = SparkSession.active
        val t = LakeTable.forPath(spark, root)
        val df = spark.read.schema(writeSchema).parquet(files.toIndexedSeq: _*)
        if (cdc) t.merge(GraftStreamingWrite.cdcToMergeInput(df), epochId)
        // complete mode stamps lsn 0 on every row — dedup duplicate keys
        // exactly like append mode or the same-key-same-lsn invariant breaks
        else if (overwrite) t.replace(t.dedupStatementKeys(df), epochId)
        else t.merge(t.dedupStatementKeys(df) // same dedup as SQL INSERT
          .withColumn("lsn", lit(t.nextLsn)).withColumn("op", lit("I")),
          epochId)
      }
    } finally LakeTable.deleteRecursively(dir)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    LakeTable.deleteRecursively(stageDir(epochId))
}

object GraftStreamingWrite {
  import org.apache.spark.sql.DataFrame
  import graft.sql.{GraftChangesTable => Feed}

  /** Session hadoop conf captured ON THE DRIVER for executor-side staging
    * writers: a bare `new Configuration()` on the executor would miss every
    * `spark.hadoop.*` setting (defaultFS, object-store credentials), so the
    * staging write would only ever work against local paths. Captured once
    * per write as a plain serializable map. */
  private[sql] def sessionHadoopConf(): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    SparkSession.active.sessionState.newHadoopConf().iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap
  }

  private[sql] def toConfiguration(entries: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Feed-shaped rows → merge input: `_change_type` becomes the op
    * (delete → tombstone, else upsert) and `_lsn` passes through as the
    * SOURCE lsn — no per-statement lsn stamping and NO in-batch key dedup,
    * because the feed's lsns are already a total per-key order and the
    * merge's LWW aggregate is the correct resolver when one catch-up batch
    * carries several changes of the same key (e.g. an upsert superseded by
    * a delete two snapshots later). Replaying the same feed range is a
    * no-op by the same LWW argument, independent of the epoch ledger. */
  private[sql] def cdcToMergeInput(df: DataFrame): DataFrame =
    df.withColumn("op",
        when(col(Feed.ChangeTypeCol) === "delete", lit("D")).otherwise(lit("U")))
      .withColumn("lsn", col(LakeTable.LsnCol))
}

case class StagedEpochFile(path: String) extends WriterCommitMessage

class GraftStreamingWriterFactory(stageRoot: String, schema: StructType,
    hadoopConf: Map[String, String])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new GraftStagingWriter(
      s"$stageRoot/epoch-$epochId/part-$partitionId-$taskId.parquet", schema, hadoopConf)
}

/** Writes one task partition to one staging parquet file via the parquet
  * Group API (works in any executor; at real scale the file lands on the
  * cluster FS via the executor's hadoop conf). Lazy-opens so empty
  * partitions stage nothing. */
class GraftStagingWriter(path: String, schema: StructType,
    hadoopConf: Map[String, String] = Map.empty)
    extends DataWriter[InternalRow] {
  import org.apache.parquet.example.data.simple.SimpleGroup
  import org.apache.parquet.hadoop.example.ExampleParquetWriter
  import org.apache.parquet.hadoop.metadata.CompressionCodecName
  import org.apache.parquet.io.api.Binary

  private val messageType = GroupWrites.toMessageType(schema)
  private var writer: org.apache.parquet.hadoop.ParquetWriter[org.apache.parquet.example.data.Group] = _

  private def open(): Unit = if (writer == null) {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path).getParent)
    // the DRIVER's session hadoop conf, shipped through the factory — a
    // bare executor-side Configuration would drop spark.hadoop.* settings
    val conf =
      if (hadoopConf.isEmpty) new org.apache.hadoop.conf.Configuration()
      else GraftStreamingWrite.toConfiguration(hadoopConf)
    writer = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
          new org.apache.hadoop.fs.Path(path), conf))
      .withConf(conf).withType(messageType)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  override def write(row: InternalRow): Unit = {
    open()
    val g = new SimpleGroup(messageType)
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val name = schema(i).name
        // bytes are COPIED out of the (Spark-reused) row buffer: parquet
        // dictionary writers retain Binary references past this call
        schema(i).dataType match {
          case StringType => g.add(name, Binary.fromString(row.getUTF8String(i).toString))
          case LongType => g.add(name, row.getLong(i))
          case IntegerType => g.add(name, row.getInt(i))
          case DoubleType => g.add(name, row.getDouble(i))
          case FloatType => g.add(name, row.getFloat(i))
          case BooleanType => g.add(name, row.getBoolean(i))
          case BinaryType =>
            val b = row.getBinary(i)
            g.add(name, Binary.fromConstantByteArray(java.util.Arrays.copyOf(b, b.length)))
          case other => sys.error(s"unsupported streaming-write type $other")
        }
      }
      i += 1
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) { writer.close(); writer = null; StagedEpochFile(path) }
    else StagedEpochFile(null) // empty partition: nothing staged
  }
  override def abort(): Unit = close()
  override def close(): Unit = if (writer != null) { writer.close(); writer = null }
}

/** Spark → parquet schema mapping for the staging writer (simple types —
  * the same set the lake's storage format and SQL readers support). */
private[sql] object GroupWrites {
  import org.apache.parquet.schema.{MessageType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
  import org.apache.parquet.schema.LogicalTypeAnnotation

  def toMessageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case StringType => b.addField(Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name))
        case LongType => b.addField(Types.optional(INT64).named(f.name))
        case IntegerType => b.addField(Types.optional(INT32).named(f.name))
        case DoubleType => b.addField(Types.optional(DOUBLE).named(f.name))
        case FloatType => b.addField(Types.optional(FLOAT).named(f.name))
        case BooleanType => b.addField(Types.optional(BOOLEAN).named(f.name))
        case BinaryType => b.addField(Types.optional(BINARY).named(f.name))
        case other => sys.error(s"unsupported streaming-write type $other")
      }
    }
    b.named("graft_stream_stage")
  }
}
