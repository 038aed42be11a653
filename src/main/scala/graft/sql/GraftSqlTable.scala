package graft.sql

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._
import graft.lake.{LakeTable, TableMeta}

/** DSv2 surface of one lake table: reads over live rows (tombstones
  * filtered), optionally pinned to a snapshot (`VERSION AS OF`), plus SQL
  * writes — see [[GraftWriteBuilder]].
  *
  * The scan plans one InputPartition per data file and materializes rows with
  * a parquet row-group reader, mapping each file's stored columns to the read
  * schema BY COLUMN ID (renamed columns resolve to their stored name, added
  * columns read as null, widened types up-cast) — the same evolution
  * semantics as `LakeTable.read`. Column pruning is pushed into the parquet
  * projection. This path is the SQL convenience surface; the engine's hot
  * paths (merge/replay) use the native vectorized reader via `LakeTable`.
  */
class GraftSqlTable(root: String, displayName: String, snapshotId: Option[Long],
    cdcWrite: Boolean = false)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  // metadata is pinned at load time: one SQL query = one consistent snapshot
  private val meta: TableMeta = LakeTable.metaAt(root)
  private val snap = snapshotId.map(id => meta.snapshotById(id)
    .getOrElse(sys.error(s"no snapshot $id in $displayName"))).orElse(meta.currentSnapshot)
  private val readSchemaId: Int =
    snapshotId.flatMap(_ => snap.map(_.schemaId)).getOrElse(meta.currentSchemaId)

  override def name(): String = displayName
  /** Key columns are declared non-nullable: they are the merge identity
    * (bucketing + LWW grouping assume present keys) and Spark's row-level
    * DML rejects nullable row-id attributes. */
  override def schema(): StructType = StructType(
    meta.schemaById(readSchemaId).toStruct.fields.map(f =>
      if (meta.keyCols.contains(f.name)) f.copy(nullable = false) else f))
  /** The physical layout, declared: every data file belongs to exactly one
    * `bucket(numBuckets, key...)` partition ([[GraftBucketFunction]]). This
    * is what SHOW CREATE/DESCRIBE report; the SCAN re-reports it per query as
    * a KeyGroupedPartitioning for storage-partitioned joins. */
  override def partitioning(): Array[Transform] = Array(
    org.apache.spark.sql.connector.expressions.Expressions.bucket(
      meta.numBuckets, meta.keyCols: _*))

  /** The bucket layout the scanned snapshot conforms to, or None when it
    * cannot be proven: a time-travel read BEFORE a later rebucket sees files
    * laid out under the OLD bucket count, and reporting the current one
    * would let Spark skip a needed exchange — silent wrong joins. */
  private def layoutBuckets: Option[Int] =
    // durable marker first (survives retention of the rebucket snapshot
    // itself — without it an expired rebucket would let a tag-pinned
    // pre-rebucket read claim the current layout); retained-snapshot scan
    // covers legacy metadata that predates the marker
    if (snap.forall(s => s.snapshotId >= meta.rebucketAtSnapshot &&
      !meta.snapshots.exists(r =>
        r.operation == "rebucket" && r.snapshotId > s.snapshotId)))
      Some(meta.numBuckets)
    else None
  override def properties(): util.Map[String, String] =
    // free-form table properties first, then the engine facts a SQL-only
    // operator needs from SHOW TBLPROPERTIES / DESCRIBE EXTENDED (engine
    // keys win a name collision)
    (meta.properties ++ Map(
      "location" -> root, "format" -> "graft-lake",
      "snapshot-id" -> snap.map(_.snapshotId.toString).getOrElse("-"),
      "keys" -> meta.keyCols.mkString(","),
      "buckets" -> meta.numBuckets.toString,
      "lsn-high-water" -> meta.lsnHighWater.toString,
      "vacuum-lsn" -> meta.vacuumLsn.toString,
      "maintained-views" -> meta.maintainedViews
        .map(v => s"${v.name}(${v.kind})").mkString(","),
      "tags" -> meta.tags.toSeq.sortBy(_._1)
        .map { case (n, id) => s"$n=$id" }.mkString(","),
      "constraints" -> meta.constraints
        .map(c => s"${c.name}:${c.kind}(${c.expr})").mkString(","),
      "branches" -> meta.branches.toSeq.sortBy(_._1)
        .map { case (n, id) => s"$n=$id" }.mkString(","))).asJava
  override def capabilities(): util.Set[TableCapability] =
    if (cdcWrite)
      // the `t$cdc` write view accepts feed-shaped rows (data columns +
      // `_change_type` + `_lsn`), which never match the table schema — so
      // schema resolution is ours (validated in newWriteBuilder); no
      // TRUNCATE: a CDC apply stream is append-only by definition
      Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
        TableCapability.STREAMING_WRITE, TableCapability.ACCEPT_ANY_SCHEMA).asJava
    else
      Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
        TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, meta, readSchemaId,
      snap.map(_.files).getOrElse(Seq.empty), schema(), layoutBuckets)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(snapshotId.isEmpty, s"cannot write to time-travel view $displayName")
    if (cdcWrite) GraftSqlTable.validateCdcSchema(info.schema(), meta, displayName)
    new GraftWriteBuilder(root, info, cdc = cdcWrite)
  }

  /** SQL UPDATE / MERGE INTO / subquery DELETE — the delta-based row-level
    * path ([[GraftRowLevelOperation]]). Plain predicate DELETEs still take
    * the metadata path below (Spark's optimizer converts the row-level plan
    * back to `deleteWhere` when `canDeleteWhere` accepts the predicates). */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo): org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(snapshotId.isEmpty, s"cannot modify time-travel view $displayName")
    () => new GraftRowLevelOperation(root, meta, readSchemaId,
      snap.map(_.files).getOrElse(Seq.empty), schema(), info.command())
  }

  /** SQL row-level DELETE (`DELETE FROM graftsql.ns.t WHERE ...`): the
    * matching live rows become one merge commit with `op = "D"` at
    * lsn = high-water + 1 — i.e. tombstones, exactly what the Scala API's
    * delete path writes, so the change feed, vacuum and downstream syncs all
    * see SQL deletes identically to native ones. Reference analogue: the
    * soft-delete flag set through its upsert (`queries/fact_studies.py:73`,
    * `ON CONFLICT ... DO UPDATE SET ... deleted = excluded.deleted`). */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    snapshotId.isEmpty && filters.forall(GraftSqlTable.supportedDeleteFilter)

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    require(snapshotId.isEmpty, s"cannot delete from time-travel view $displayName")
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.active
    val t = LakeTable.forPath(spark, root)
    val m = t.meta
    val cond = filters.map(GraftSqlTable.filterToColumn)
      .foldLeft(lit(true))(_ && _) // empty WHERE = delete everything
    // same manifest pruning as the read path: a key-equality DELETE reads
    // one bucket's files and a range DELETE only the files whose min/max
    // can match — not the whole table. Pruning is safe-side only (kept
    // files are still row-filtered by `cond`), so delete semantics are
    // identical to scanning everything.
    val files = m.currentSnapshot.map(_.files).getOrElse(Seq.empty)
    // deleteWhere acts on the CURRENT snapshot: layout always proven
    val candidates = GraftScanBuilder.pruneFiles(m, m.currentSchemaId, files, filters,
      bucketLayout = Some(m.numBuckets))
    val dataCols = m.currentSchema.columns.map(c => col(c.name))
    t.merge(t.readFileSubset(candidates, m.currentSchemaId)
      .filter(!col(LakeTable.DeletedCol))
      .select(dataCols: _*)
      .filter(cond)
      .withColumn("lsn", lit(t.nextLsn)).withColumn("op", lit("D")))
  }
}

object GraftSqlTable {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.Column

  /** Suffix addressing for the CDC-apply write view (the write-side mirror
    * of reading `t$changes`): `writeStream.toTable("graftsql.ns.`t$cdc`")`
    * applies feed-shaped rows — data columns + `_change_type` + `_lsn` — as
    * native LWW merges carrying the SOURCE lsn, so deletes propagate and
    * replays/reorderings resolve exactly like the source table's own
    * ingest. */
  val CdcSuffix = "$cdc"

  /** A CDC apply must carry exactly the table's data columns plus the feed
    * metadata pair — a missing data column would silently null a field on
    * every upsert, an extra one is a mis-wired pipeline. */
  private[sql] def validateCdcSchema(schema: StructType, meta: TableMeta,
      displayName: String): Unit = {
    val metaCols = Set(GraftChangesTable.ChangeTypeCol, LakeTable.LsnCol)
    val dataCols = meta.currentSchema.columns.map(_.name).toSet
    val have = schema.fieldNames.toSet
    val missingMeta = metaCols -- have
    require(missingMeta.isEmpty,
      s"$displayName expects feed columns ${metaCols.mkString(", ")}; missing ${missingMeta.mkString(", ")} " +
        s"(write the result of reading a `t$$changes` feed)")
    val missing = dataCols -- have
    val extra = have -- dataCols -- metaCols
    require(missing.isEmpty && extra.isEmpty,
      s"$displayName expects data columns ${dataCols.mkString(", ")} + feed metadata; " +
        s"missing ${missing.mkString(", ")}; unexpected ${extra.mkString(", ")}")
  }

  private[sql] def supportedDeleteFilter(f: Filter): Boolean = f match {
    case _: EqualTo | _: EqualNullSafe | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: In | _: IsNull | _: IsNotNull |
         _: StringStartsWith | _: StringEndsWith | _: StringContains |
         _: AlwaysTrue | _: AlwaysFalse => true
    case And(l, r) => supportedDeleteFilter(l) && supportedDeleteFilter(r)
    case Or(l, r) => supportedDeleteFilter(l) && supportedDeleteFilter(r)
    case Not(c) => supportedDeleteFilter(c)
    case _ => false
  }

  private[sql] def filterToColumn(f: Filter): Column = f match {
    case EqualTo(a, v) => col(a) === lit(v)
    case EqualNullSafe(a, v) => col(a) <=> lit(v)
    case GreaterThan(a, v) => col(a) > lit(v)
    case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case LessThan(a, v) => col(a) < lit(v)
    case LessThanOrEqual(a, v) => col(a) <= lit(v)
    case In(a, vs) => col(a).isin(vs.toIndexedSeq: _*)
    case IsNull(a) => col(a).isNull
    case IsNotNull(a) => col(a).isNotNull
    case StringStartsWith(a, v) => col(a).startsWith(v)
    case StringEndsWith(a, v) => col(a).endsWith(v)
    case StringContains(a, v) => col(a).contains(v)
    case And(l, r) => filterToColumn(l) && filterToColumn(r)
    case Or(l, r) => filterToColumn(l) || filterToColumn(r)
    case Not(c) => !filterToColumn(c)
    case _: AlwaysTrue => lit(true)
    case _: AlwaysFalse => lit(false)
    case other => sys.error(s"unsupported DELETE filter $other")
  }
}

/** SQL write path (the reference's entire write surface is SQL — ON
  * CONFLICT upserts in `queries/fact_studies.py:63-83`):
  *
  *  - `INSERT INTO graftsql.ns.t ...` — keyed MERGE upsert: each statement
  *    is one lake commit at lsn = the table's applied high-water + 1, so
  *    rows whose keys already exist are updated (ON CONFLICT DO UPDATE
  *    semantics), new keys are inserted, and a later INSERT outranks this
  *    one by LWW.
  *  - `INSERT OVERWRITE graftsql.ns.t ...` — full-replace snapshot commit.
  *  - `df.writeStream.toTable("graftsql.ns.t")` — streaming writes: each
  *    micro-batch's rows land as ONE epoch-ledgered lake commit — append
  *    mode = keyed upserts (the same merge as INSERT), complete mode
  *    (`truncate()`) = full replace per epoch. See [[GraftStreamingWrite]].
  *
  * V1Write hands the insert a driver-side DataFrame, which lands directly
  * on the engine's native merge/replace — the distributed heavy lifting
  * (bucket pruning, LWW aggregation, staging write) is exactly the plan the
  * streaming path runs; no second write implementation to keep correct. */
class GraftWriteBuilder(root: String, info: LogicalWriteInfo, cdc: Boolean = false)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = {
    require(!cdc, "a CDC apply view is append-only; overwrite/complete mode unsupported")
    overwrite = true; this
  }
  override def build(): Write = new V1Write {
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new GraftStreamingWrite(root, info.queryId(), info.schema(), overwrite, cdc)
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: org.apache.spark.sql.DataFrame, overwriteFlag: Boolean): Unit = {
        import org.apache.spark.sql.functions._
        val t = LakeTable.forPath(data.sparkSession, root)
        if (cdc) {
          // batch CDC apply (`INSERT INTO ns.`t$cdc` SELECT ... FROM
          // ns.`s$changes``): same source-lsn merge as the streaming path
          require(!(overwrite || overwriteFlag), "CDC apply is append-only")
          t.merge(GraftStreamingWrite.cdcToMergeInput(data))
        } else if (overwrite || overwriteFlag)
          // replace stamps every row lsn 0: duplicate keys within the
          // statement would break the same-key-same-lsn LWW invariant just
          // like INSERT's would — dedup both paths identically
          t.replace(t.dedupStatementKeys(data))
        else
          t.merge(t.dedupStatementKeys(data)
            .withColumn("lsn", lit(t.nextLsn)).withColumn("op", lit("I")))
      }
    }
  }
}

class GraftScanBuilder(root: String, meta: TableMeta, schemaId: Int,
    files: Seq[graft.lake.DataFileMeta], full: StructType,
    layoutBuckets: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = full
  private var prunedFiles: Seq[graft.lake.DataFileMeta] = files
  private var agg: Option[(StructType, Seq[Any])] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep declared column order; requiredSchema may reorder
    val names = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => names.contains(f.name)))
  }

  // --------------------------------------------------- aggregate pushdown

  /** `COUNT(*)` / `COUNT(key)` / `MIN` / `MAX` answered from the MANIFEST —
    * zero data files read — when provably exact: every selected file is
    * footer-proven tombstone-free (a tombstone both inflates rowCount and
    * pollutes key-column bounds) and, for MIN/MAX, carries trusted stats for
    * the column on every file. Rendered stats reverse exactly for integral
    * and string types only (float NaN and decimal rendering are not
    * round-trip-safe, so those fall back to the scan). Spark only attempts
    * the pushdown when no residual filter remains, and this source never
    * absorbs filters — so a WHERE query always takes the normal scan. At
    * warehouse scale this turns `SELECT count(*)`/`max(lsn)` monitoring
    * queries on a 100 TB table into metadata lookups (Iceberg answers the
    * same from its manifests). */
  // Spark calls supportCompletePushDown then pushAggregation back to back:
  // memoize the manifest stats walk so it runs once per aggregate query
  private var answered: Option[(org.apache.spark.sql.connector.expressions.aggregate.Aggregation, Option[(StructType, Seq[Any])])] = None
  private def answerMemo(aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Option[(StructType, Seq[Any])] =
    answered match {
      case Some((a, r)) if a eq aggregation => r
      case _ =>
        val r = answer(aggregation)
        answered = Some((aggregation, r))
        r
    }

  override def supportCompletePushDown(aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    answerMemo(aggregation).isDefined

  override def pushAggregation(aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    agg = answerMemo(aggregation)
    agg.isDefined
  }

  private def answer(aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Seq[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (aggregation.groupByExpressions.nonEmpty) return None
    if (prunedFiles.exists(_.hasTombstones)) return None
    // merge-on-read layers: superseded rows inflate rowCount and can own a
    // column bound no live row has — only LWW-resolved reads are exact
    if (prunedFiles.exists(_.isDelta)) return None
    val cols = meta.schemaById(schemaId).columns
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[graft.lake.ColumnDef] =
      e match {
        case r: NamedReference if r.fieldNames.length == 1 =>
          cols.find(_.name == r.fieldNames.head)
        case _ => None
      }
    // exact bound of one column across the selection, already rendered in a
    // reversible type — None when any file lacks a trusted stat
    def bound(c: graft.lake.ColumnDef, maxSide: Boolean): Option[Any] = {
      val dt = c.dataType
      val reversible = dt == IntegerType || dt == LongType || dt == ShortType ||
        dt == ByteType || dt == StringType
      if (!reversible) return None
      if (prunedFiles.isEmpty) return Some(null) // empty selection ⇒ NULL
      val rendered = prunedFiles.map { f =>
        if (dt == StringType && !f.statsUtf8) None
        else (if (maxSide) f.colMaxs else f.colMins).get(c.id.toString)
      }
      if (rendered.exists(_.isEmpty)) return None
      val vs = rendered.flatten
      dt match {
        case StringType =>
          val pick = vs.map(UTF8String.fromString)
          Some(if (maxSide) pick.max else pick.min)
        case _ =>
          val longs = vs.map(_.toLong)
          val v = if (maxSide) longs.max else longs.min
          Some(dt match {
            case IntegerType => v.toInt
            case ShortType => v.toShort
            case ByteType => v.toByte
            case _ => v
          })
      }
    }
    val rows = prunedFiles.map(_.rowCount).sum
    val answers: Seq[Option[(StructField, Any)]] = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        Some((StructField("count(*)", LongType, nullable = false), rows))
      case c: Count if !c.isDistinct =>
        // COUNT(col) = rowCount only for provably non-null columns = keys
        colOf(c.column).collect { case cd if meta.keyCols.contains(cd.name) =>
          (StructField(s"count(${cd.name})", LongType, nullable = false), rows)
        }
      case m: Min => colOf(m.column).flatMap(cd => bound(cd, maxSide = false)
        .map(v => (StructField(s"min(${cd.name})", cd.dataType), v)))
      case m: Max => colOf(m.column).flatMap(cd => bound(cd, maxSide = true)
        .map(v => (StructField(s"max(${cd.name})", cd.dataType), v)))
      case _ => None
    }
    if (answers.exists(_.isEmpty)) None
    else Some((StructType(answers.flatten.map(_._1)), answers.flatten.map(_._2)))
  }

  /** Manifest-level file skipping, two mechanisms (filters are never fully
    * absorbed — `pushedFilters` stays empty — so Spark re-applies them
    * post-scan and correctness never depends on the pruning):
    *
    *  1. Key-equality point lookups prune to ONE hash bucket's files
    *     (127/128 of a table skipped) — the same pruning the merge path uses.
    *  2. Per-file column min/max (parquet footer stats recorded in the
    *     manifest by column ID) skip files whose value range is disjoint
    *     from =, <, <=, >, >= and BETWEEN predicates — so an lsn/time/id
    *     range query reads only the files that can match (the reference
    *     gets the equivalent from Postgres indexes; Iceberg from manifest
    *     stats). Columns or files without usable stats are never pruned. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    prunedFiles = GraftScanBuilder.pruneFiles(meta, schemaId, prunedFiles, filters,
      layoutBuckets)
    residual = filters.toSeq // also evaluated per-file against row-group stats
    filters
  }
  private var residual: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def build(): Scan = agg match {
    case Some((schema, values)) => new GraftManifestAggScan(schema, values)
    case None =>
      new GraftScan(root, meta, schemaId, prunedFiles, required, layoutBuckets,
        residual)
  }
}

/** The pre-computed answer of a fully-pushed aggregation: one partition, one
  * row, no data file touched (see `GraftScanBuilder.answer`). */
class GraftManifestAggScan(schema: StructType, values: Seq[Any])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftManifestAggScan(${schema.fieldNames.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftAggPartition(values.toArray))
  override def createReaderFactory(): PartitionReaderFactory = new GraftAggReaderFactory
}

case class GraftAggPartition(values: Array[Any]) extends InputPartition

class GraftAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val row = new GenericInternalRow(
        partition.asInstanceOf[GraftAggPartition].values)
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

object GraftScanBuilder {
  /** Same function as `LakeTable.bucketExpr` — `pmod(hash(keys), n)` with
    * Spark's Murmur3 (seed 42) — evaluated driver-side on literal values. */
  def bucketOf(keyValues: Seq[Any], numBuckets: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val h = Murmur3Hash(keyValues.map(v => Literal.create(v)), 42)
      .eval(null).asInstanceOf[Int]
    ((h % numBuckets) + numBuckets) % numBuckets
  }

  /** Manifest file skipping shared by the SQL scan and `deleteWhere` (one
    * pruner — a fix to its comparison semantics must reach both).
    * `bucketLayout` is the bucket count the SCANNED FILES are proven to be
    * laid out under (the scan's layoutBuckets proof), or None when unproven
    * — a time-travel read pinned BEFORE a later rebucket carries files
    * numbered under the OLD count, and hashing the key with the current
    * count would prune the very file that holds it (file pruning is
    * exactness-bearing: the post-scan filter cannot recover unread rows).
    * Min/max stat pruning is layout-independent and always applies. */
  def pruneFiles(meta: TableMeta, schemaId: Int,
      files: Seq[graft.lake.DataFileMeta],
      filters: Array[org.apache.spark.sql.sources.Filter],
      bucketLayout: Option[Int]): Seq[graft.lake.DataFileMeta] = {
    import org.apache.spark.sql.sources._
    var prunedFiles = files
    val eqs = filters.collect { case EqualTo(a, v) if meta.keyCols.contains(a) => a -> v }.toMap
    bucketLayout.foreach { n =>
      if (meta.keyCols.forall(eqs.contains)) {
        val b = GraftScanBuilder.bucketOf(meta.keyCols.map(eqs), n)
        prunedFiles = prunedFiles.filter(_.bucket == b)
      }
    }
    // merge-on-read: LWW resolution is sound only over a bucket's COMPLETE
    // file set — dropping one file of a delta-carrying bucket could prune
    // the very winner that supersedes a surviving stale row (or vice
    // versa). Bucket-equality pruning above keeps/drops whole buckets and
    // stays exact; the file-granular stat pruning below must keep every
    // file of a delta bucket.
    val deltaBuckets = files.filter(_.isDelta).map(_.bucket).toSet
    val colId: Map[String, String] = meta.schemaById(schemaId).columns
      .map(c => c.name -> c.id.toString).toMap
    def cmp(f: graft.lake.DataFileMeta, rendered: String, v: Any): Option[Int] =
      cmpStat(f, rendered, v)
    def keep(f: graft.lake.DataFileMeta, attr: String,
        test: (graft.lake.DataFileMeta, Option[String], Option[String]) => Option[Boolean]): Boolean =
      if (deltaBuckets.contains(f.bucket)) true
      else colId.get(attr) match {
        case None => true
        case Some(id) => test(f, f.colMins.get(id), f.colMaxs.get(id)).getOrElse(true)
      }
    filters.foreach {
      case EqualTo(a, v) => prunedFiles = prunedFiles.filter(keep(_, a, (f, mn, mx) =>
        for { lo <- mn; hi <- mx; c1 <- cmp(f, lo, v); c2 <- cmp(f, hi, v) }
          yield c1 <= 0 && c2 >= 0))
      case GreaterThan(a, v) => prunedFiles = prunedFiles.filter(keep(_, a, (f, _, mx) =>
        for { hi <- mx; c <- cmp(f, hi, v) } yield c > 0))
      case GreaterThanOrEqual(a, v) => prunedFiles = prunedFiles.filter(keep(_, a, (f, _, mx) =>
        for { hi <- mx; c <- cmp(f, hi, v) } yield c >= 0))
      case LessThan(a, v) => prunedFiles = prunedFiles.filter(keep(_, a, (f, mn, _) =>
        for { lo <- mn; c <- cmp(f, lo, v) } yield c < 0))
      case LessThanOrEqual(a, v) => prunedFiles = prunedFiles.filter(keep(_, a, (f, mn, _) =>
        for { lo <- mn; c <- cmp(f, lo, v) } yield c <= 0))
      case _ =>
    }
    prunedFiles
  }

  /** Rendered-manifest-stat vs literal comparison; None = incomparable ⇒
    * keep file. Strings compare in UTF-8 BINARY order (UTF8String.compareTo),
    * matching parquet footer min/max and Spark's runtime comparison —
    * String.compareTo (UTF-16 code units) diverges for supplementary
    * characters, and a wrongly pruned file is silent data loss (the
    * post-scan filter can't recover rows that were never read). String
    * bounds from LEGACY manifest entries (statsUtf8 = false, accumulated in
    * UTF-16 order by older code) are therefore never trusted; their numeric
    * bounds stay usable. */
  private def cmpStat(f: graft.lake.DataFileMeta, rendered: String, v: Any): Option[Int] = v match {
    case _: String if !f.statsUtf8 => None
    case s: String => Some(UTF8String.fromString(rendered)
      .compareTo(UTF8String.fromString(s)))
    case _: Int | _: Long | _: Short | _: Byte | _: Float | _: Double |
         _: java.math.BigDecimal =>
      scala.util.Try(BigDecimal(rendered).compare(BigDecimal(v.toString))).toOption
    case _ => None
  }

  /** Decomposes a runtime V2 predicate into (column, external values) —
    * `IN(col, v...)` and `=(col, v)`, the shapes Spark's DSv2 runtime
    * filtering delivers after the join's build side materializes. Catalyst
    * internals map back to externals (UTF8String → String, Decimal → java);
    * date/timestamp internals stay as their int/long encodings, which both
    * the bucket hash and the numeric stat comparison treat identically to
    * how the write path hashed/recorded them. */
  def inPredicate(p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[(String, Seq[Any])] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (p.name != "IN" && p.name != "=") return None
    p.children() match {
      case Array(ref: NamedReference, rest @ _*) if ref.fieldNames.length == 1 =>
        val vals = rest.collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value match {
              case u: UTF8String => u.toString
              case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
              case x => x
            }
        }
        if (vals.nonEmpty && vals.size == rest.size)
          Some((ref.fieldNames.head, vals.toSeq))
        else None
      case _ => None
    }
  }

  /** Runtime IN pruning — sound, never exactness-bearing (Spark re-applies
    * the join itself): keep only files that can contain SOME of the values.
    * Bucket membership applies when the column IS the single-column merge
    * key (each value hashes to one bucket — a selective dim cuts the fact
    * scan to the few buckets its keys live in); manifest min/max range
    * skipping applies to any column with trusted stats (tight after
    * clustered compaction). */
  def pruneFilesIn(meta: TableMeta, schemaId: Int,
      files: Seq[graft.lake.DataFileMeta], attr: String,
      values: Seq[Any],
      bucketLayout: Option[Int]): Seq[graft.lake.DataFileMeta] = {
    var sel = files
    val hashable = values.forall {
      case _: String | _: Int | _: Long | _: Short | _: Byte | _: Boolean |
           _: Float | _: Double => true
      case _ => false
    }
    bucketLayout.foreach { n =>
      if (meta.keyCols == Seq(attr) && hashable) {
        val buckets = values.map(v => bucketOf(Seq(v), n)).toSet
        sel = sel.filter(f => buckets.contains(f.bucket))
      }
    }
    // file-granular stat pruning must keep delta buckets whole (see
    // pruneFiles) — bucket-membership pruning above is bucket-granular
    val deltaBuckets = files.filter(_.isDelta).map(_.bucket).toSet
    meta.schemaById(schemaId).columns.find(_.name == attr).foreach { c =>
      val cid = c.id.toString
      sel = sel.filter { f =>
        deltaBuckets.contains(f.bucket) ||
        ((f.colMins.get(cid), f.colMaxs.get(cid)) match {
          case (Some(mn), Some(mx)) => values.exists { v =>
            (cmpStat(f, mn, v), cmpStat(f, mx, v)) match {
              case (Some(c1), Some(c2)) => c1 <= 0 && c2 >= 0
              case _ => true // incomparable value ⇒ the file must stay
            }
          }
          case _ => true // no stats ⇒ the file must stay
        })
      }
    }
    sel
  }
}

class GraftScan(root: String, meta: TableMeta, schemaId: Int,
    files: Seq[graft.lake.DataFileMeta], required: StructType,
    layoutBuckets: Option[Int] = None,
    residualFilters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsReportPartitioning with SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan(files=${files.size}, cols=${required.fieldNames.mkString(",")})"

  // ------------------------------------------------------ runtime filtering

  /** Files surviving static (planning-time) pruning, further narrowed by
    * runtime filters before partition planning. */
  private var selected: Seq[graft.lake.DataFileMeta] = files
  private var runtimeSkipped: Long = 0L

  /** Every projected column is runtime-filterable: a broadcast join's build
    * keys arrive as an IN after the build side materializes (DPP for the
    * lake), and [[GraftScanBuilder.pruneFilesIn]] turns them into manifest
    * bucket/min-max file skipping. At 100 TB this is what makes
    * dim-filtered fact queries read buckets, not the table. */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fieldNames.map(org.apache.spark.sql.connector.expressions.Expressions.column)

  /** Runtime IN filters kept for the per-file parquet predicates: beyond
    * whole-file pruning, the surviving files' readers get an eq-or-chain so
    * row-group stats and the key-column BLOOM filters skip inside files —
    * a broadcast join's build keys become point lookups down to the row
    * group. Capped (the translator drops INs over 20 values) — dropping
    * only costs I/O, Spark's join re-applies the semantics. */
  private var runtimeIn: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty

  override def filter(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    predicates.foreach { p =>
      GraftScanBuilder.inPredicate(p).foreach { case (attr, values) =>
        val before = selected.size
        selected = GraftScanBuilder.pruneFilesIn(meta, schemaId, selected, attr, values,
          layoutBuckets)
        runtimeSkipped += before - selected.size
        runtimeIn :+= org.apache.spark.sql.sources.In(attr, values.toArray)
      }
    }

  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new GraftScan.RuntimeSkippedFilesMetric, new GraftScan.PlannedFilesMetric)
  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(GraftScan.DriverMetric("runtimeSkippedFiles", runtimeSkipped),
      GraftScan.DriverMetric("plannedFiles", selected.size.toLong))

  /** Declares the on-disk clustering — `bucket(n, key)` backed by
    * [[GraftBucketFunction]] — as a KeyGroupedPartitioning. With Spark's v2
    * bucketing (on by default) a join of two co-bucketed lake tables on
    * their key becomes a storage-partitioned join: no exchange on either
    * side, each task joins one bucket in place; `GROUP BY key` likewise
    * aggregates shuffle-free. Tasks = buckets present in the (pruned)
    * selection; missing buckets on one join side are backfilled as empty
    * partitions by Spark (`pushPartValues`). At 100 TB this is THE
    * fact-to-fact join strategy: co-located joins with zero network, the
    * broadcast path covering small dims.
    *
    * Single-column keys only: Spark's SPJ machinery accepts exactly one
    * reference per partition transform (`V2ExpressionUtils.
    * toCatalystTransformOpt` guards `refs.length == 1`, and physical
    * `KeyGroupedPartitioning.supportsExpressions` requires one child) — a
    * multi-column key's combined-hash bucket cannot be expressed, so those
    * tables report UnknownPartitioning and join through the normal
    * exchange. */
  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning =
    layoutBuckets match {
      case Some(n) if files.nonEmpty && meta.keyCols.size == 1 =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(
            n, meta.keyCols.head)),
          files.map(_.bucket).distinct.size)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(files.size)
    }

  /** Manifest-backed size estimate — what lets Catalyst auto-broadcast a
    * small lake table in a SQL join instead of defaulting to a sort-merge
    * join of unknown-size relations. Bytes are the PRUNED files' recorded
    * on-disk sizes scaled by the projected-column fraction (the same
    * column-pruning discount Spark's own FileScan applies); legacy files
    * without a recorded size fall back to rowCount × row width. */
  override def estimateStatistics(): Statistics = {
    val full = meta.schemaById(schemaId).toStruct
    val fraction =
      if (full.isEmpty) 1.0
      else required.map(_.dataType.defaultSize).sum.toDouble /
        math.max(1, full.map(_.dataType.defaultSize).sum)
    val rows = files.map(_.rowCount).sum
    val bytes = files.map { f =>
      if (f.sizeBytes > 0) (f.sizeBytes * fraction).toLong
      else f.rowCount * math.max(1, required.map(_.dataType.defaultSize).sum)
    }.sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, bytes))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }

  // planInputPartitions() and createReaderFactory() both need the planned
  // set; per-file ColSpec resolution + parquet predicate building over a
  // large selection is driver work worth doing once. Keyed on the selected
  // list, which runtime filter() can shrink between calls.
  private var plannedCache: Option[(Seq[graft.lake.DataFileMeta], Array[InputPartition])] = None
  private def plannedPartitions: Array[InputPartition] = plannedCache match {
    case Some((sel, parts)) if sel eq selected => parts
    case _ =>
      val parts = buildPartitions()
      plannedCache = Some((selected, parts))
      parts
  }

  private def colSpecsFor(f: graft.lake.DataFileMeta,
      fields: Seq[StructField]): Array[ColSpec] = {
    val target = meta.schemaById(schemaId)
    val storedById = meta.schemaById(f.schemaId).byId
    fields.map { rf =>
      if (rf.name == LakeTable.LsnCol || rf.name == LakeTable.DeletedCol)
        ColSpec(rf.name, rf.dataType.json, rf.name, rf.dataType.json)
      else {
        val cd = target.columns.find(_.name == rf.name)
          .getOrElse(sys.error(s"column ${rf.name} not in schema $schemaId"))
        storedById.get(cd.id) match {
          case Some(st) => ColSpec(rf.name, rf.dataType.json, st.name, st.dataTypeJson)
          case None => ColSpec(rf.name, rf.dataType.json, null, null) // added later: null
        }
      }
    }.toArray
  }

  private def buildPartitions(): Array[InputPartition] = {
    // merge-on-read: buckets holding DELTA files plan as ONE partition per
    // bucket whose reader LWW-resolves across all the bucket's files (the
    // Hudi realtime-read shape); resolution is bucket-local because the
    // bucket hash co-locates every version of a key, so no shuffle is
    // needed — the task holds one bucket's winners in memory, the same
    // bound the write path's bucket sizing already assumes. Buckets
    // without deltas keep the per-file readers (and the vectorized path).
    val deltaBuckets = selected.filter(_.isDelta).map(_.bucket).toSet
    val (layered, plain) = selected.partition(f => deltaBuckets.contains(f.bucket))
    val plainParts: Seq[InputPartition] = plain.map { f =>
      val cols = colSpecsFor(f, required.fields.toSeq)
      // columnar eligibility: no tombstones to filter (footer-proven), every
      // required column identity-mapped (no rename/widen remapping), and a
      // non-empty simple-typed projection
      val columnar = !f.hasTombstones && cols.nonEmpty && cols.forall { c =>
        c.storedName == c.outName && c.storedTypeJson == c.outTypeJson &&
          GraftScan.vectorizable(c.outTypeJson)
      }
      // residual + runtime-join predicates translated to THIS file's stored
      // names/types: parquet-mr drops row groups by stats/blooms before
      // decoding a page, which is what makes sortBy/zOrderBy clustering
      // effective inside a file
      val pred = GraftParquetFilters.build(residualFilters ++ runtimeIn, cols.toSeq)
      GraftInputPartition(s"$root/${f.path}", cols, columnar, f.bucket, pred)
    }
    val mergeParts: Seq[InputPartition] =
      if (layered.isEmpty) Seq.empty
      else {
        val ml = MergeLayout.of(required.fields.toSeq, meta.keyCols,
          meta.schemaById(schemaId).columns.map(c =>
            c.name -> StructField(c.name, c.dataType, c.nullable)).toMap)
        layered.groupBy(_.bucket).toSeq.sortBy(_._1).map { case (b, fs) =>
          // NO per-file parquet predicates here: row-group/record filtering
          // before resolution could drop the winner that supersedes a
          // surviving stale row; Spark re-applies all filters post-scan
          val slices = fs.map(f =>
            MergeFileSlice(s"$root/${f.path}", colSpecsFor(f, ml.fields)))
          GraftMergeInputPartition(b, slices.toArray, ml.keyIdx, ml.lsnIdx,
            ml.delIdx, required.fields.length)
        }
      }
    (plainParts ++ mergeParts).toArray
  }

  override def planInputPartitions(): Array[InputPartition] = plannedPartitions

  /** Whole-scan columnar decision: Spark requires every partition of one
    * scan to agree (mixed row/columnar scans are rejected), so the scan is
    * vectorized iff ALL selected files qualify — true for append-mostly
    * tables (no tombstones), falling back to the row reader once a file in
    * the selection carries deletes, needs column-ID remapping, or sits in a
    * merge-on-read bucket. */
  override def createReaderFactory(): PartitionReaderFactory = {
    val parts = plannedPartitions
    val allColumnar = parts.nonEmpty && parts.forall {
      case g: GraftInputPartition => g.columnar
      case _ => false
    }
    new GraftReaderFactory(allColumnar, GraftStreamingWrite.sessionHadoopConf())
  }
}

object GraftScan {
  private val simple: Set[String] = Set(StringType, IntegerType, LongType,
    DoubleType, FloatType, BooleanType, BinaryType, ShortType, ByteType)
    .map(_.json)
  def vectorizable(typeJson: String): Boolean = simple.contains(typeJson)

  import org.apache.spark.sql.connector.metric.{CustomSumMetric, CustomTaskMetric}
  class RuntimeSkippedFilesMetric extends CustomSumMetric {
    override def name(): String = "runtimeSkippedFiles"
    override def description(): String = "data files skipped by runtime (join) filters"
  }
  class PlannedFilesMetric extends CustomSumMetric {
    override def name(): String = "plannedFiles"
    override def description(): String = "data files read after all pruning"
  }
  case class DriverMetric(metricName: String, metricValue: Long) extends CustomTaskMetric {
    override def name(): String = metricName
    override def value(): Long = metricValue
  }
}

/** One stored-file column mapping: output name/type + the name/type it was
  * written under (null if the column didn't exist when the file was written). */
case class ColSpec(outName: String, outTypeJson: String,
    storedName: String, storedTypeJson: String) extends Serializable

case class GraftInputPartition(filePath: String, cols: Array[ColSpec],
    columnar: Boolean = false, bucket: Int = 0,
    pred: Option[org.apache.parquet.filter2.predicate.FilterPredicate] = None)
    extends InputPartition with HasPartitionKey {
  /** The file's bucket id — the value `bucket(n, key...)` yields for every
    * row in it. Spark groups same-key splits into one task when planning a
    * storage-partitioned join (all files of bucket i, both sides, one task). */
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** One file of a merge-on-read bucket: its path plus the READ LAYOUT
  * projection (required columns, then resolution extras — unprojected keys,
  * `_lsn`, `_deleted`) mapped to this file's stored names/types. */
case class MergeFileSlice(filePath: String, cols: Array[ColSpec])
    extends Serializable

/** One merge-on-read BUCKET: every file (base + delta layers) of a bucket
  * that holds at least one delta file. The reader resolves last-writer-wins
  * across the layers before serving rows — see [[GraftBucketMergeReader]].
  * Carries the bucket as its partition key, so storage-partitioned joins
  * keep working over layered tables. */
case class GraftMergeInputPartition(bucket: Int, files: Array[MergeFileSlice],
    keyIdx: Array[Int], lsnIdx: Int, delIdx: Int, outLen: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** `hadoopConf` is the session hadoop conf captured ON THE DRIVER (a bare
  * `new Configuration()` on an executor misses every `spark.hadoop.*`
  * setting — defaultFS, object-store credentials — so reads would only ever
  * work against local paths; the write path ships its staging conf the same
  * way). One map per factory, not per partition. */
class GraftReaderFactory(allColumnar: Boolean,
    hadoopConf: Map[String, String]) extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = allColumnar
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case m: GraftMergeInputPartition =>
        new GraftBucketMergeReader(m, GraftStreamingWrite.toConfiguration(hadoopConf))
      case p: GraftInputPartition =>
        new GraftPartitionReader(p, GraftStreamingWrite.toConfiguration(hadoopConf))
    }
  override def createColumnarReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new GraftColumnarReader(partition.asInstanceOf[GraftInputPartition],
      GraftStreamingWrite.toConfiguration(hadoopConf))
}

/** Vectorized read of one tombstone-free, identity-mapped data file via
  * Spark's own VectorizedParquetRecordReader — ColumnarBatches flow straight
  * into the query (no per-row object materialization), putting the SQL scan
  * on the same engine the native parquet source uses. */
class GraftColumnarReader(p: GraftInputPartition,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.datasources.parquet.{GraftVectorizedBridge, VectorizedParquetRecordReader}

  private val reader = new VectorizedParquetRecordReader(
    /* useOffHeap = */ false, /* capacity = */ 4096)
  locally {
    // one path for filtered AND unfiltered: open the file reader OURSELVES
    // with the driver-captured conf (Spark's one-call initialize builds a
    // bare Configuration internally) and an optional record filter so
    // parquet-mr drops row groups by statistics up front, then hand the
    // surviving groups to the vectorized reader (GraftVectorizedBridge —
    // the row-group hook is package-private in Spark)
    import org.apache.parquet.HadoopReadOptions
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val hPath = new org.apache.hadoop.fs.Path(p.filePath)
    val opts = HadoopReadOptions.builder(conf, hPath)
    p.pred.foreach(pr => opts.withRecordFilter(FilterCompat.get(pr)))
    val fr = new ParquetFileReader(HadoopInputFile.fromPath(hPath, conf),
      opts.build())
    val fileSchema = fr.getFooter.getFileMetaData.getSchema
    val want = p.cols.map(_.storedName).toSet
    val requested = new org.apache.parquet.schema.MessageType(fileSchema.getName,
      fileSchema.getFields.asScala.filter(f => want.contains(f.getName)).asJava)
    GraftVectorizedBridge.initFiltered(reader, requested, fileSchema, fr)
  }
  reader.resultBatch() // allocate the batch vectors
  reader.enableReturningBatches()

  override def next(): Boolean = reader.nextBatch()
  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = reader.resultBatch()
  override def close(): Unit = reader.close()
}

/** Row-materializing parquet reader for one data file. Projects only the
  * stored columns the query needs plus `_deleted` (tombstone filter). Not
  * vectorized — acceptable for the SQL convenience surface; wide analytical
  * scans belong on the engine's native read path. */
class GraftPartitionReader(p: GraftInputPartition,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.schema.MessageType

  private val hPath = new org.apache.hadoop.fs.Path(p.filePath)

  // projection: the file's own schema filtered to needed fields (reading the
  // footer schema avoids re-deriving parquet types from Spark types)
  private val reader: ParquetReader[Group] = {
    val fr = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
    val fileSchema = try fr.getFooter.getFileMetaData.getSchema finally fr.close()
    val want = (p.cols.flatMap(c => Option(c.storedName)) :+ LakeTable.DeletedCol).toSet
    val projected = new MessageType(fileSchema.getName,
      fileSchema.getFields.asScala.filter(f => want.contains(f.getName)).asJava)
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projected.toString)
    val b = ParquetReader.builder(new GroupReadSupport(), hPath).withConf(conf)
    // row-group stats skipping (plus record-level filtering — harmless:
    // Spark re-applies every filter post-scan anyway)
    p.pred.fold(b)(pr => b.withFilter(
      org.apache.parquet.filter2.compat.FilterCompat.get(pr))).build()
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    var g = reader.read()
    while (g != null) {
      if (!isDeleted(g)) { current = toRow(g); return true }
      g = reader.read()
    }
    false
  }

  private def isDeleted(g: Group): Boolean = GroupReads.isDeleted(g)

  private val colReaders = new ColReaders(p.cols)

  private def toRow(g: Group): InternalRow =
    new GenericInternalRow(colReaders.readAll(g))

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

/** Shared parquet-Group value extraction for the row-materializing SQL
  * readers (live-row scan and change feed). */
private[sql] object GroupReads {
  import org.apache.parquet.example.data.Group

  def isDeleted(g: Group): Boolean =
    g.getType.containsField(LakeTable.DeletedCol) &&
      g.getFieldRepetitionCount(LakeTable.DeletedCol) > 0 &&
      g.getBoolean(LakeTable.DeletedCol, 0)

  def read(g: Group, name: String, dt: DataType): Any = dt match {
    case StringType => UTF8String.fromBytes(g.getBinary(name, 0).getBytes)
    case IntegerType => g.getInteger(name, 0)
    case LongType => g.getLong(name, 0)
    case DoubleType => g.getDouble(name, 0)
    case FloatType => g.getFloat(name, 0)
    case BooleanType => g.getBoolean(name, 0)
    case BinaryType => g.getBinary(name, 0).getBytes
    case other => sys.error(s"unsupported SQL-read type $other for column $name")
  }

  def widen(v: Any, from: DataType, to: DataType): Any =
    if (from == to) v
    else (from, to, v) match {
      case (IntegerType, LongType, i: Int) => i.toLong
      case (IntegerType, DoubleType, i: Int) => i.toDouble
      case (FloatType, DoubleType, f: Float) => f.toDouble
      case _ => sys.error(s"unsupported widen $from -> $to")
    }
}

/** Per-file column extraction with the DataType JSON parsed ONCE per column
  * (the row loops are hot; parsing a type per cell is O(rows × cols) JSON
  * work — a layered-bucket merge read of a 2M-row bucket would otherwise
  * spend its CPU in the JSON parser, not the parquet decoder). */
private[sql] final class ColReaders(cols: Array[ColSpec]) {
  private val storedTypes: Array[DataType] = cols.map(c =>
    if (c.storedTypeJson == null) null else DataType.fromJson(c.storedTypeJson))
  private val outTypes: Array[DataType] = cols.map(c =>
    if (c.outTypeJson == null) null else DataType.fromJson(c.outTypeJson))
  def read(g: org.apache.parquet.example.data.Group, i: Int): Any = {
    val c = cols(i)
    if (c.storedName == null || !g.getType.containsField(c.storedName) ||
        g.getFieldRepetitionCount(c.storedName) == 0) null
    else GroupReads.widen(GroupReads.read(g, c.storedName, storedTypes(i)),
      storedTypes(i), outTypes(i))
  }
  def readAll(g: org.apache.parquet.example.data.Group): Array[Any] = {
    val vals = new Array[Any](cols.length)
    var i = 0
    while (i < cols.length) { vals(i) = read(g, i); i += 1 }
    vals
  }
}

/** Shared last-writer-wins resolution over one bucket's layered files (base
  * + merge-on-read deltas): reads every file through its own stored-schema
  * projection and keeps, per key, the (lsn, tombstone-priority) max — the
  * same order as the engine's stored-row LWW (`Dedup.opPriority`: D beats S
  * on the impossible-by-invariant lsn tie). Bucket-local resolution is
  * globally correct because the bucket hash co-locates every version of a
  * key. Used by the live scan's [[GraftBucketMergeReader]] (which then
  * drops tombstone winners) and the change feed's bootstrap merge reader
  * (which emits them as deletes). */
/** Merge-read layout shared by the live scan's and the change feed's
  * layered-bucket planners: the projected fields, then any key column the
  * projection misses, then `_lsn` + `_deleted`, plus the index positions
  * [[BucketMergeResolve.winners]] needs. One implementation so the two
  * merge planners cannot silently diverge (the reader emits only the first
  * |projected| values). */
private[sql] case class MergeLayout(fields: Seq[StructField],
    keyIdx: Array[Int], lsnIdx: Int, delIdx: Int)

private[sql] object MergeLayout {
  def of(projected: Seq[StructField], keyCols: Seq[String],
      targetField: Map[String, StructField]): MergeLayout = {
    val fields = projected ++
      keyCols.filterNot(projected.map(_.name).contains).map(k =>
        targetField.getOrElse(k,
          sys.error(s"key column $k missing from the target schema"))) ++
      Seq(StructField(LakeTable.LsnCol, LongType, nullable = false),
        StructField(LakeTable.DeletedCol, BooleanType, nullable = false))
    MergeLayout(fields,
      keyCols.map(k => fields.indexWhere(_.name == k)).toArray,
      fields.indexWhere(_.name == LakeTable.LsnCol),
      fields.indexWhere(_.name == LakeTable.DeletedCol))
  }
}

private[sql] object BucketMergeResolve {
  import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.schema.MessageType

  def winners(files: Array[MergeFileSlice], keyIdx: Array[Int], lsnIdx: Int,
      delIdx: Int, conf: org.apache.hadoop.conf.Configuration): java.util.Iterator[Array[Any]] = {
    def lsnOf(v: Array[Any]): Long = v(lsnIdx).asInstanceOf[Long]
    def deletedOf(v: Array[Any]): Boolean = v(delIdx).asInstanceOf[Boolean]
    def newer(a: Array[Any], b: Array[Any]): Boolean = {
      val la = lsnOf(a); val lb = lsnOf(b)
      la > lb || (la == lb && deletedOf(a) && !deletedOf(b))
    }
    val map = new java.util.HashMap[Seq[Any], Array[Any]]()
    files.foreach { slice =>
      val hPath = new org.apache.hadoop.fs.Path(slice.filePath)
      val fr = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
      val fileSchema = try fr.getFooter.getFileMetaData.getSchema finally fr.close()
      val want = slice.cols.flatMap(c => Option(c.storedName)).toSet
      val projected = new MessageType(fileSchema.getName,
        fileSchema.getFields.asScala.filter(f => want.contains(f.getName)).asJava)
      val sliceConf = new org.apache.hadoop.conf.Configuration(conf)
      sliceConf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
        projected.toString)
      val readers = new ColReaders(slice.cols)
      val reader: ParquetReader[org.apache.parquet.example.data.Group] =
        ParquetReader.builder(new GroupReadSupport(), hPath).withConf(sliceConf).build()
      try {
        var g = reader.read()
        while (g != null) {
          val vals = readers.readAll(g)
          // binary key components get value equality via ByteBuffer wrapping
          val key: Seq[Any] = keyIdx.toSeq.map { ki =>
            vals(ki) match {
              case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
              case v => v
            }
          }
          val prev = map.get(key)
          if (prev == null || newer(vals, prev)) map.put(key, vals)
          g = reader.read()
        }
      } finally reader.close()
    }
    map.values().iterator()
  }
}

/** Merge-on-read reader for ONE bucket: reads every file of the bucket
  * (base + delta layers, each through its own stored-schema projection),
  * resolves last-writer-wins per key by (lsn, tombstone-priority) in a local
  * hash map — bucket-local is globally correct because the bucket hash
  * co-locates every version of a key — and serves the live winners. Memory
  * is one bucket's keys × the projected width, the same bound the write
  * path's bucket sizing (`numBuckets` chosen so a bucket fits a task)
  * already assumes; `foldDeltas` retires the layers and returns the bucket
  * to the per-file (and vectorized) readers. Tombstone winners resolve like
  * any other row and are then filtered — a delta tombstone must be able to
  * beat a live base row. No record filters are pushed to the files: a
  * predicate dropping the superseding row before resolution would resurrect
  * the stale one (Spark re-applies every filter post-scan). */
class GraftBucketMergeReader(p: GraftMergeInputPartition,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val winners: java.util.Iterator[Array[Any]] =
    BucketMergeResolve.winners(p.files, p.keyIdx, p.lsnIdx, p.delIdx, conf)

  private def deletedOf(v: Array[Any]): Boolean =
    v(p.delIdx).asInstanceOf[Boolean]

  private var current: InternalRow = _
  override def next(): Boolean = {
    while (winners.hasNext) {
      val v = winners.next()
      if (!deletedOf(v)) {
        current = new GenericInternalRow(java.util.Arrays.copyOf(
          v.asInstanceOf[Array[AnyRef]], p.outLen).asInstanceOf[Array[Any]])
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
