package graft.sql

import java.util.Collections
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.lake.{AggColDef, LakeCatalog, LakeTable, MaintainedViewDef, TableMirror, ViewMaintainer}

/** SQL stored procedures for lake maintenance (Spark 4 DSv2
  * `ProcedureCatalog`), so a SQL-only operator can run the table lifecycle
  * the same way a SQL-only consumer can already run the full DML surface:
  *
  * {{{
  * CALL graftsql.system.compact(table => 'ns.t')
  * CALL graftsql.system.vacuum(table => 'ns.t', up_to_lsn => 1000)
  * CALL graftsql.system.rebucket(table => 'ns.t', num_buckets => 64)
  * CALL graftsql.system.expire_snapshots(table => 'ns.t', keep_last => 3)
  * CALL graftsql.system.create_view(table => 'ns.t', view => 'daily', group_by => 'day')
  * CALL graftsql.system.refresh_views(table => 'ns.t')
  * }}}
  *
  * Each procedure resolves its `'namespace.table'` argument through the
  * warehouse, runs the corresponding [[LakeTable]] maintenance operation
  * (same code path as the Scala API and the CLI — one implementation, three
  * surfaces), and returns metrics rows. The reference's analogue is
  * operational SQL against Postgres (VACUUM / CLUSTER / retention jobs);
  * here they are catalog procedures because the lake format must do its own
  * maintenance.
  */
object GraftProcedures {
  val Namespace = "system"

  val names: Seq[String] =
    Seq("compact", "vacuum", "rebucket", "fold_deltas", "expire_snapshots",
      "rollback",
      "create_view", "refresh_views", "drop_view", "create_tag", "drop_tag",
      "add_constraint", "drop_constraint", "mirror",
      "create_branch", "publish_branch", "drop_branch")

  def load(warehouse: String, name: String): UnboundProcedure = name.toLowerCase match {
    case "compact" => Proc(
      "compact",
      "bin-pack small data files (optionally clustering each rewritten file " +
        "by sort_by columns); returns the net reduction in live file count",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'"),
        in("target_file_bytes", LongType, Some((128L << 20).toString),
          "files below this size are pack candidates"),
        in("min_files", IntegerType, Some("2"),
          "minimum small files in a bucket before it is repacked"),
        in("sort_by", StringType, Some("''"),
          "comma-separated data columns to cluster rewritten files by"),
        in("z_order_by", StringType, Some("''"),
          "comma-separated data columns to Z-order cluster by (exclusive with sort_by)")),
      new StructType().add("files_removed", IntegerType, nullable = false),
      (wh, input) => {
        val n = table(wh, input)
          .compact(input.getLong(1), input.getInt(2), csv(input, 3), csv(input, 4))
        Array[InternalRow](new GenericInternalRow(Array[Any](n)))
      }, warehouse)
    case "vacuum" => Proc(
      "vacuum",
      "physically drop tombstones with lsn <= up_to_lsn; returns rows removed",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'"),
        in("up_to_lsn", LongType, Some(Long.MaxValue.toString),
          "must not exceed the slowest downstream consumer's watermark")),
      new StructType().add("tombstones_removed", LongType, nullable = false),
      (wh, input) => {
        val n = table(wh, input).vacuum(input.getLong(1))
        Array[InternalRow](new GenericInternalRow(Array[Any](n)))
      }, warehouse)
    case "rebucket" => Proc(
      "rebucket",
      "re-hash the table into num_buckets buckets in one COW commit",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'"),
        in("num_buckets", IntegerType, None, "new hash bucket count")),
      new StructType().add("num_buckets", IntegerType, nullable = false),
      (wh, input) => {
        val t = table(wh, input)
        t.rebucket(input.getInt(1))
        Array[InternalRow](new GenericInternalRow(Array[Any](t.meta.numBuckets)))
      }, warehouse)
    case "fold_deltas" => Proc(
      "fold_deltas",
      "collapse merge-on-read delta layers into one base file per affected " +
        "bucket (layout-only; tombstones kept for vacuum to retire)",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'")),
      new StructType().add("buckets_folded", IntegerType, nullable = false),
      (wh, input) => {
        val n = table(wh, input).foldDeltas()
        Array[InternalRow](new GenericInternalRow(Array[Any](n)))
      }, warehouse)
    case "expire_snapshots" => Proc(
      "expire_snapshots",
      "drop all but the keep_last newest snapshots and delete unreferenced " +
        "files; older_than_ms further restricts expiry to snapshots " +
        "committed before that epoch-millis instant",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'"),
        in("keep_last", IntegerType, Some("1"), "snapshots to retain"),
        in("older_than_ms", LongType, Some("-1"),
          "only expire snapshots committed before this epoch-ms (-1 = any age)")),
      new StructType().add("files_deleted", LongType, nullable = false),
      (wh, input) => {
        val cut = input.getLong(2)
        val n = table(wh, input).expireSnapshots(input.getInt(1),
          if (cut >= 0) Some(cut) else None)
        Array[InternalRow](new GenericInternalRow(Array[Any](n)))
      }, warehouse)
    case "create_branch" => Proc(
      "create_branch",
      "open a write-audit-publish branch at the current main head: stage " +
        "merges on it, audit via VERSION AS OF '<branch>', then publish",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'"),
        in("branch", StringType, None, "branch name (non-numeric)")),
      new StructType().add("forked_at_snapshot", LongType, nullable = false),
      (wh, input) => {
        val head = table(wh, input).createBranch(input.getUTF8String(1).toString)
        Array[InternalRow](new GenericInternalRow(Array[Any](head)))
      }, warehouse)
    case "publish_branch" => Proc(
      "publish_branch",
      "fast-forward main to the audited branch head in ONE metadata commit " +
        "and close the branch; refuses if main advanced past the fork",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'"),
        in("branch", StringType, None, "branch name")),
      new StructType().add("published_snapshot", LongType, nullable = false),
      (wh, input) => {
        val id = table(wh, input).publishBranch(input.getUTF8String(1).toString)
        Array[InternalRow](new GenericInternalRow(Array[Any](id)))
      }, warehouse)
    case "drop_branch" => Proc(
      "drop_branch",
      "discard a branch (staged state stays time-travelable until retention)",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'"),
        in("branch", StringType, None, "branch name")),
      new StructType().add("existed", BooleanType, nullable = false),
      (wh, input) => {
        val existed = table(wh, input).dropBranch(input.getUTF8String(1).toString)
        Array[InternalRow](new GenericInternalRow(Array[Any](existed)))
      }, warehouse)
    case "mirror" => Proc(
      "mirror",
      "one lake-to-lake replication beat: dest := source live state, " +
        "reading only buckets changed since the last beat (see TableMirror); " +
        "dest is created on first call and ownership-stamped",
      Array(
        in("source", StringType, None, "source table as 'namespace.table'"),
        in("dest", StringType, None, "destination table as 'namespace.table'")),
      new StructType().add("mode", StringType, nullable = false)
        .add("from_snapshot", LongType, nullable = false)
        .add("to_snapshot", LongType, nullable = false)
        .add("rows_applied", LongType, nullable = false),
      (wh, input) => {
        val destIdent = input.getUTF8String(1).toString
        val parts = destIdent.split('.')
        require(parts.length == 2 && parts.forall(_.nonEmpty),
          s"dest must be 'namespace.table', got '$destIdent'")
        val Array(dns, dt) = parts
        val destRoot = java.nio.file.Paths.get(wh, dns, dt).toString
        require(new java.io.File(java.nio.file.Paths.get(wh, dns).toString).isDirectory,
          s"namespace $dns does not exist")
        val r = TableMirror.syncOnce(table(wh, input), destRoot)
        Array[InternalRow](new GenericInternalRow(Array[Any](
          UTF8String.fromString(r.mode), r.fromSnapshot, r.toSnapshot,
          r.rowsApplied)))
      }, warehouse)
    case "add_constraint" => Proc(
      "add_constraint",
      "declare a NOT NULL / CHECK row constraint: existing rows are " +
        "validated first, then every write enforces it (direct writes fail " +
        "loudly, the CDC pipeline dead-letters violations)",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'"),
        in("name", StringType, None, "constraint name"),
        in("expr", StringType, None,
          "column name (not_null) or boolean SQL over data columns (check)"),
        in("kind", StringType, Some("'check'"), "not_null | check")),
      new StructType().add("name", StringType, nullable = false),
      (wh, input) => {
        val name = input.getUTF8String(1).toString
        table(wh, input).addConstraint(name,
          input.getUTF8String(3).toString, input.getUTF8String(2).toString)
        Array[InternalRow](new GenericInternalRow(Array[Any](
          UTF8String.fromString(name))))
      }, warehouse)
    case "drop_constraint" => Proc(
      "drop_constraint",
      "drop a declared row constraint",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'"),
        in("name", StringType, None, "constraint name")),
      new StructType().add("existed", BooleanType, nullable = false),
      (wh, input) => {
        val existed = table(wh, input)
          .dropConstraint(input.getUTF8String(1).toString)
        Array[InternalRow](new GenericInternalRow(Array[Any](existed)))
      }, warehouse)
    case "create_tag" => Proc(
      "create_tag",
      "pin a retained snapshot under a stable name: expire_snapshots keeps " +
        "it, and VERSION AS OF 'name' time-travels to it",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'"),
        in("tag", StringType, None, "tag name (non-numeric)"),
        in("snapshot_id", LongType, Some("-1"),
          "snapshot to pin; default -1 = current"),
        in("replace", BooleanType, Some("false"),
          "allow re-pointing an existing tag")),
      new StructType().add("tagged_snapshot_id", LongType, nullable = false),
      (wh, input) => {
        val snapId = input.getLong(2)
        val id = table(wh, input).createTag(input.getUTF8String(1).toString,
          if (snapId < 0) None else Some(snapId), input.getBoolean(3))
        Array[InternalRow](new GenericInternalRow(Array[Any](id)))
      }, warehouse)
    case "drop_tag" => Proc(
      "drop_tag",
      "drop a named snapshot tag (the snapshot becomes expirable again)",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'"),
        in("tag", StringType, None, "tag name")),
      new StructType().add("existed", BooleanType, nullable = false),
      (wh, input) => {
        val existed = table(wh, input).dropTag(input.getUTF8String(1).toString)
        Array[InternalRow](new GenericInternalRow(Array[Any](existed)))
      }, warehouse)
    case "rollback" => Proc(
      "rollback",
      "restore the table state of an earlier retained snapshot in one " +
        "metadata-only commit (pick the target from t$snapshots); history " +
        "stays time-travelable and lagging lsn consumers full-resync",
      Array(
        in("table", StringType, None, "target table as 'namespace.table'"),
        in("snapshot_id", LongType, None, "snapshot to restore (see t$snapshots)")),
      new StructType().add("current_snapshot_id", LongType, nullable = false),
      (wh, input) => {
        val id = table(wh, input).rollback(input.getLong(1))
        Array[InternalRow](new GenericInternalRow(Array[Any](id)))
      }, warehouse)
    // Maintained views, SQL-declared (reference keeps its rollup-view DDL in
    // the migration stream next to the fact tables and refreshes on the sync
    // cron — migrations/20230207_01_53Bud.sql + cron_tasks.py). Here the
    // definition is table metadata, the materialization is a normal lake
    // table in the same namespace (SELECTable), and refresh is incremental
    // per kind: rollup = retraction-exact snapshot-diff maintenance,
    // distinct_sketch = union-only HLL over post-floor rows.
    case "create_view" => Proc(
      "create_view",
      "declare a maintained view over a lake table; 'rollup' = exact " +
        "incremental count+sums, 'distinct_sketch' = HLL approx-distinct; " +
        "materializes as table '<namespace>.<view>' on refresh_views",
      Array(
        in("table", StringType, None, "base table as 'namespace.table'"),
        in("view", StringType, None, "view (and result table) name"),
        in("group_by", StringType, None, "comma-separated group columns"),
        in("kind", StringType, Some("'rollup'"), "rollup | distinct_sketch"),
        in("agg_by", StringType, Some("''"),
          "comma-separated src:alias pairs — sum columns for rollup, " +
            "distinct-value columns for distinct_sketch"),
        in("count_alias", StringType, Some("'n'"), "rollup count column name"),
        in("lg_k", IntegerType, Some("12"), "HLL lgK (distinct_sketch only)")),
      new StructType().add("view", StringType, nullable = false)
        .add("kind", StringType, nullable = false),
      (wh, input) => {
        val (ns, _) = nsTable(input)
        val t = table(wh, input)
        val view = input.getUTF8String(1).toString
        val kind = input.getUTF8String(3).toString
        val groupBy = csv(input, 2)
        val aggs = csv(input, 4).map { p =>
          val parts = p.split(':')
          require(parts.length == 2, s"agg_by entry '$p' is not 'src:alias'")
          AggColDef(parts(0).trim, parts(1).trim)
        }
        // the view will materialize at <warehouse>/<ns>/<view> — refuse a
        // name an unrelated lake table already occupies
        val cat = new LakeCatalog(SparkSession.active, wh)
        require(!cat.tableExists(ns, view),
          s"'$ns.$view' already exists as a table")
        t.createMaintainedView(MaintainedViewDef(view, kind, groupBy, aggs,
          input.getUTF8String(5).toString, input.getInt(6)))
        Array[InternalRow](new GenericInternalRow(Array[Any](
          UTF8String.fromString(view), UTF8String.fromString(kind))))
      }, warehouse)
    case "refresh_views" => Proc(
      "refresh_views",
      "refresh every maintained view of the table (incremental per view " +
        "kind); returns one row per view with the base data files read",
      Array(in("table", StringType, None, "base table as 'namespace.table'")),
      new StructType().add("view", StringType, nullable = false)
        .add("files_read", LongType, nullable = false),
      (wh, input) => {
        val (ns, _) = nsTable(input)
        val t = table(wh, input)
        val viewsRoot = java.nio.file.Paths.get(wh, ns).toString
        ViewMaintainer.forTable(t, viewsRoot).refreshAll().toSeq.sortBy(_._1)
          .map { case (v, filesRead) =>
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(v), filesRead)): InternalRow
          }.toArray
      }, warehouse)
    case "drop_view" => Proc(
      "drop_view",
      "remove a maintained-view definition and delete its materialized table",
      Array(
        in("table", StringType, None, "base table as 'namespace.table'"),
        in("view", StringType, None, "view name")),
      new StructType().add("dropped", BooleanType, nullable = false),
      (wh, input) => {
        val (ns, _) = nsTable(input)
        val view = input.getUTF8String(1).toString
        val t = table(wh, input)
        val existed = t.dropMaintainedView(view)
        // delete only the view's OWN artifact (ownership-stamped table id) —
        // never an unrelated table that happens to hold the name
        val path = java.nio.file.Paths.get(wh, ns, view)
        if (existed && LakeTable.exists(path.toString) &&
            LakeTable.metaAt(path.toString).tableId ==
              ViewMaintainer.viewTableId(t.meta.tableId, view))
          LakeTable.deleteRecursively(path)
        Array[InternalRow](new GenericInternalRow(Array[Any](existed)))
      }, warehouse)
    case other =>
      throw new UnsupportedOperationException(
        s"unknown procedure $Namespace.$other; available: ${names.mkString(", ")}")
  }

  private def csv(input: InternalRow, i: Int): Seq[String] =
    input.getUTF8String(i).toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  private def nsTable(input: InternalRow): (String, String) = {
    val ref = input.getUTF8String(0).toString
    val parts = ref.split('.')
    require(parts.length == 2, s"table must be 'namespace.table', got '$ref'")
    (parts(0), parts(1))
  }

  private def in(name: String, dt: DataType, default: Option[String],
      comment: String): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt).comment(comment)
    default.foreach(b.defaultValue)
    b.build()
  }

  private def table(warehouse: String, input: InternalRow): LakeTable = {
    val ref = input.getUTF8String(0).toString
    val parts = ref.split('.')
    require(parts.length == 2, s"table must be 'namespace.table', got '$ref'")
    new LakeCatalog(SparkSession.active, warehouse).loadTable(parts(0), parts(1))
  }

  /** One class serves as both the unbound and bound form: parameters are
    * static (no overloads), so `bind` is identity. `call` runs the
    * maintenance eagerly and hands Spark one driver-local result row —
    * maintenance work itself is distributed inside the LakeTable op; only
    * the metrics row is local. */
  private case class Proc(
      procName: String,
      desc: String,
      params: Array[ProcedureParameter],
      outSchema: StructType,
      run: (String, InternalRow) => Array[InternalRow],
      warehouse: String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val out = run(warehouse, input)
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType = outSchema
        override def rows(): Array[InternalRow] = out
      }
      Collections.singletonList(scan).iterator()
    }
  }
}
