package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.{LakeTable, SchemaChange}

/** Where change envelopes come from. The reference reads its change feed
  * from Postgres tables over a DB connection (`database.py:10-41`) on a
  * Celery beat; this engine's native feed is a parquet change log tailed by
  * Structured Streaming. Both are the same operator behind this trait:
  * a bounded lsn-window batch read plus a source watermark.
  */
trait ChangeSource {
  /** Envelopes with `lsn` in (fromLsn, toLsn], in envelope schema. */
  def batch(fromLsn: Long, toLsn: Long = Long.MaxValue): DataFrame

  /** Highest lsn currently available at the source (its watermark). */
  def maxLsn(): Long
}

/** Parquet change-log directory. `batch` reads an lsn window (the predicate
  * pushes down to the scan and prunes row groups via parquet lsn stats —
  * the log is written in lsn-range files); `stream` is the streaming tail
  * used by [[CdcPipeline.run]]. */
class FileChangeSource(spark: SparkSession, logDir: String) extends ChangeSource {
  override def batch(fromLsn: Long, toLsn: Long): DataFrame =
    spark.read.schema(CdcPipeline.envelopeSchema).parquet(logDir)
      .filter(col("lsn") > fromLsn && col("lsn") <= toLsn)

  override def maxLsn(): Long = {
    val r = spark.read.schema(CdcPipeline.envelopeSchema).parquet(logDir)
      .agg(max(col("lsn"))).head()
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  def stream: DataFrame =
    spark.readStream.schema(CdcPipeline.envelopeSchema).parquet(logDir)
}

/** JDBC change table (reference `database.py:10-41`: psycopg reads of a
  * WAL-ordered rows table). Reads are partitioned on `lsn` so one window
  * fans out over `numPartitions` parallel connections — the Spark-native
  * version of the reference's batched keyset pagination
  * (`sync/studies.py:35-41`). Tested against embedded Derby; the SQL is
  * ANSI and works unchanged against Postgres. */
class JdbcChangeSource(spark: SparkSession, url: String, table: String,
    numPartitions: Int = 8,
    properties: java.util.Properties = new java.util.Properties)
    extends ChangeSource {

  // ANSI-quoted identifier: Spark's JDBC writer creates case-exact quoted
  // columns, so unquoted names would fold to the database's default case
  private val LSN = "\"lsn\""

  override def batch(fromLsn: Long, toLsn: Long): DataFrame = {
    val hi = if (toLsn == Long.MaxValue) maxLsn() else toLsn
    if (hi <= fromLsn) return emptyEnvelopes
    val pruned = s"(SELECT * FROM $table WHERE $LSN > $fromLsn AND $LSN <= $hi) src"
    val cols = CdcPipeline.envelopeSchema.fields.map(f => col(f.name))
    spark.read.jdbc(url, pruned, LSN, fromLsn + 1, hi,
        math.max(1, numPartitions), properties)
      .select(cols.map(c => c): _*) // envelope column order + pruned projection
  }

  override def maxLsn(): Long = {
    val r = spark.read.jdbc(url,
      s"(SELECT MAX($LSN) AS mx FROM $table) src", properties).head()
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  private def emptyEnvelopes: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      CdcPipeline.envelopeSchema)
}

/** Reference-style scheduled incremental sync (`celery_config.py:24`: a
  * 600 s beat calling sync since the stored watermark): one `syncOnce` per
  * beat. The watermark is the table's own applied lsn high-water (derived
  * from file stats in the current snapshot — state lives in the table,
  * ST7), and the epoch id is the source watermark, so a crashed-and-retried
  * beat is exactly-once via the table's epoch ledger. */
object IncrementalSync {

  /** Max lsn the table has applied (−1 for an empty table). */
  def tableWatermark(table: LakeTable): Long =
    table.meta.currentSnapshot.map(_.files.map(_.lsnMax).foldLeft(-1L)(math.max))
      .getOrElse(-1L)

  /** Beat epoch ids live in their own range so they can NEVER collide with
    * the dense 0,1,2,... ids a streaming CdcPipeline commits to the same
    * table's single epoch ledger — a collision (e.g. source maxLsn == some
    * past stream epoch) would make the merge silently no-op and the beat
    * stall forever, error-free. */
  val SyncEpochBase: Long = 1L << 61

  /** One sync beat: read (watermark, sourceMax], merge exactly-once.
    * Returns the number of lsn positions advanced (0 = nothing new).
    * `quarantineDir` dead-letters malformed envelopes (a JSON source can
    * deliver unparseable lines); without it the beat FAILS on the first
    * malformed event — and, because the watermark never advances past a
    * failing window, every subsequent beat re-reads it and fails again. */
  def syncOnce(source: ChangeSource, table: LakeTable,
      evolution: Map[Int, Seq[SchemaChange]] = Map.empty,
      versions: TableVersions = new TableVersions, salts: Int = 0,
      quarantineDir: Option[String] = None): Long = {
    val wm = tableWatermark(table)
    val hi = source.maxLsn()
    if (hi <= wm) return 0L
    CdcPipeline.processBatch(source.batch(wm, hi), epochId = SyncEpochBase + hi,
      table, evolution, versions, lineageDir = None, salts = salts,
      quarantineDir = quarantineDir)
    hi - wm
  }
}
