package graft.sql

import java.util
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, NamespaceAlreadyExistsException, TableAlreadyExistsException}
import scala.jdk.CollectionConverters._
import graft.lake._

/** DataSourceV2 `TableCatalog` over the lake-table warehouse, so the engine's
  * tables are reachable from plain SQL (the reference serves all consumers
  * through SQL views — `queries/schema_organizations.py:16-23`):
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/path/wh")
  * spark.sql("CREATE NAMESPACE graft.org1")
  * spark.sql("SELECT * FROM graft.org1.code_files WHERE lang = 'scala'")
  * spark.sql("SELECT * FROM graft.org1.code_files VERSION AS OF 3")
  * }}}
  *
  * Namespaces are single-level directories under the warehouse (one per
  * tenant, like the reference's per-organization Postgres schemas). Tables
  * expose live rows (tombstones filtered) in the table's current schema;
  * `VERSION AS OF <snapshotId>` time-travels exactly like
  * `LakeTable.read(Some(id))`. Key columns for `CREATE TABLE` come from the
  * `keys` table property (default: the first column).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces with ProcedureCatalog
    with FunctionCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
      .getOrElse(sys.error(s"catalog $name needs spark.sql.catalog.$name.warehouse"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(warehouse))
  }

  override def name(): String = catalogName

  private def spark = org.apache.spark.sql.SparkSession.active
  private def cat = new LakeCatalog(spark, warehouse)

  private def ns1(namespace: Array[String]): String = {
    if (namespace.length != 1) throw new NoSuchNamespaceException(namespace)
    namespace(0)
  }

  // ------------------------------------------------------------ namespaces

  override def listNamespaces(): Array[Array[String]] =
    cat.listNamespaces().map(n => Array(n)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // single-level: no children
    else throw new NoSuchNamespaceException(namespace)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && cat.listNamespaces().contains(namespace(0))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map("location" -> s"$warehouse/${ns1(namespace)}").asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    cat.createNamespace(ns1(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespace properties are immutable")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val tables = cat.listTables(ns1(namespace))
    if (tables.nonEmpty && !cascade)
      sys.error(s"namespace ${ns1(namespace)} is not empty: $tables")
    LakeTable.deleteRecursively(java.nio.file.Paths.get(warehouse, ns1(namespace)))
    true
  }

  // ---------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] =
    cat.listTables(ns1(namespace)).map(t => Identifier.of(namespace, t)).toArray

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 &&
      cat.tableExists(ident.namespace()(0), baseName(ident))

  /** `t$changes` resolves to t's change-feed metadata table, `t$cdc` to
    * t's CDC-apply write view, and `t$snapshots` / `t$files` to driver-side
    * introspection tables over the commit log and current manifest
    * (Iceberg-style suffix addressing; backquote in SQL:
    * FROM graftsql.ns.`t$changes`, toTable("graftsql.ns.`t$cdc`")). */
  private val metaSuffixes = Seq(GraftChangesTable.Suffix, GraftSqlTable.CdcSuffix,
    GraftMetaTables.SnapshotsSuffix, GraftMetaTables.FilesSuffix,
    GraftMetaTables.ViewsSuffix)

  private def baseName(ident: Identifier): String =
    metaSuffixes.foldLeft(ident.name)(_ stripSuffix _)

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val path = cat.tablePath(ident.namespace()(0), baseName(ident))
    if (ident.name.endsWith(GraftChangesTable.Suffix))
      new GraftChangesTable(path, ident.toString)
    else if (ident.name.endsWith(GraftSqlTable.CdcSuffix))
      new GraftSqlTable(path, ident.toString, snapshotId = None, cdcWrite = true)
    else if (ident.name.endsWith(GraftMetaTables.SnapshotsSuffix))
      new GraftMetaTable(path, ident.toString, kind = "snapshots")
    else if (ident.name.endsWith(GraftMetaTables.FilesSuffix))
      new GraftMetaTable(path, ident.toString, kind = "files")
    else if (ident.name.endsWith(GraftMetaTables.ViewsSuffix))
      new GraftMetaTable(path, ident.toString, kind = "views")
    else new GraftSqlTable(path, ident.toString, snapshotId = None)
  }

  /** SQL time travel: `VERSION AS OF <snapshotId | 'tag'>`. Non-numeric
    * versions resolve through the table's named tags (retention-pinned
    * refs), so an audit query can say `VERSION AS OF 'q3-close'` instead of
    * carrying a raw snapshot id. Metadata views (`$changes`, `$cdc`) are
    * themselves range/write surfaces — version-pinning them has no meaning,
    * so reject instead of resolving the raw suffixed name into a
    * nonexistent path. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    require(baseName(ident) == ident.name,
      s"VERSION AS OF is not supported on metadata views ($ident); " +
        "time-travel the base table, or use fromSnapshot/toSnapshot options on the feed")
    val path = cat.tablePath(ident.namespace()(0), ident.name)
    val id = graft.lake.LakeTable.forPath(spark, path).resolveRef(version)
    new GraftSqlTable(path, s"$ident@$version", snapshotId = Some(id))
  }

  /** SQL time travel by wall clock: `TIMESTAMP AS OF <ts>` resolves to the
    * LATEST snapshot committed at or before the timestamp — Delta/Iceberg's
    * rule. DSv2 hands the timestamp over in microseconds; snapshots record
    * commit wall clock in millis (lineage metadata — this is its read
    * surface, the data path itself never touches the clock). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    require(baseName(ident) == ident.name,
      s"TIMESTAMP AS OF is not supported on metadata views ($ident); " +
        "time-travel the base table, or use fromSnapshot/toSnapshot options on the feed")
    val path = cat.tablePath(ident.namespace()(0), ident.name)
    val tsMs = Math.floorDiv(timestamp, 1000L)
    // exclude staged branch state: snapshots is a tree under write branches,
    // and an unpublished branch commit is often the newest by wall clock —
    // resolving into it would leak pre-audit state to a plain SQL reader.
    // (Exclusion, not a mainAncestry restriction: the lineage walk truncates
    // at retention gaps, which would strand tag-pinned snapshots below one.)
    val m = graft.lake.LakeTable.metaAt(path)
    val staged = m.branchExclusive
    val snap = m.snapshots
      .filter(s => !staged.contains(s.snapshotId) && s.wallClockMs <= tsMs)
      .sortBy(_.snapshotId).lastOption.getOrElse(sys.error(
        s"no snapshot of $ident committed at or before epoch-ms $tsMs " +
          "(before table creation, or expired by retention)"))
    new GraftSqlTable(path, s"$ident@ts$tsMs", snapshotId = Some(snap.snapshotId))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // reserved suffixes: a table literally named `x$changes`/`x$cdc`/
    // `x$snapshots`/`x$files` could never be addressed (reads would always
    // resolve it as x's view) and would leave an orphaned directory behind
    // the failed CREATE
    require(baseName(ident) == ident.name,
      s"table names ending in ${metaSuffixes.mkString("/")} are reserved for metadata views: $ident")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala
    val keys = props.get("keys").map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq(schema.fieldNames.head))
    // the ONLY physical layout this format has is bucket(keys): accept a
    // matching PARTITIONED BY (bucket(n, key...)) clause as the bucket
    // count; refuse anything else LOUDLY — silently dropping a
    // PARTITIONED BY (days(ts)) would leave the user believing their
    // retention/pruning layout exists
    val bucketFromPartitioning: Option[Int] = partitions.toSeq match {
      case Seq() => None
      case Seq(t) =>
        val parsed = "bucket\\((\\d+), (.+)\\)".r
        t.describe() match {
          case parsed(n, cols) if cols.split(", ").map(_.stripPrefix("`")
              .stripSuffix("`")).toSeq == keys => Some(n.toInt)
          case other => sys.error(
            s"unsupported partitioning '$other': this format is hash-bucketed " +
              s"by its key columns (${keys.mkString(", ")}) only — declare " +
              "PARTITIONED BY (bucket(n, <keys...>)) or the 'buckets' property")
        }
      case other => sys.error(
        s"unsupported partitioning ${other.map(_.describe()).mkString(", ")}: " +
          "one bucket(n, <keys...>) transform at most")
    }
    val buckets = bucketFromPartitioning
      .orElse(props.get("buckets").map(_.toInt)).getOrElse(32)
    // free-form TBLPROPERTIES persist with the table (previously they were
    // silently dropped at CREATE); engine-derived keys (the SAME reserved
    // set ALTER refuses — a stray 'tags'/'snapshot-id' persisted at CREATE
    // could never be unset) and Spark-internal keys are excluded. This is
    // how `commit.io` = 'conditional-put' selects the object-store commit
    // backend from plain SQL.
    val dropProps = GraftCatalog.ReservedProps ++ Set("provider", "owner",
      "comment", "external", "path")
    val userProps = props.toMap.filterNot { case (k, _) =>
      dropProps.contains(k) || k.startsWith("option.") }
    cat.createTable(ident.namespace()(0), ident.name, schema, keys, buckets,
      userProps)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = cat.loadTable(ident.namespace()(0), ident.name)
    // property changes (ALTER TABLE SET/UNSET TBLPROPERTIES) are metadata
    // commits on the free-form properties map; engine-reserved keys stay
    // read-only (they are derived facts, not settings)
    val reserved = GraftCatalog.ReservedProps
    // validate the WHOLE change list before applying ANY of it, and batch
    // all property changes into one metadata commit: Spark hands ALTER's
    // changes as one list, and a reserved-key (or unsupported-change) error
    // surfacing mid-application would leave earlier property commits behind
    // while the statement reports failure
    var props: Seq[(String, Option[String])] = Seq.empty
    val ops: Seq[SchemaChange] = changes.flatMap {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1, "nested columns unsupported")
        Some(AddColumn(a.fieldNames()(0), a.dataType, a.isNullable))
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1, "nested columns unsupported")
        Some(RenameColumn(r.fieldNames()(0), r.newName))
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1, "nested columns unsupported")
        Some(WidenType(u.fieldNames()(0), u.newDataType))
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1, "nested columns unsupported")
        Some(DropColumn(d.fieldNames()(0)))
      case p: TableChange.SetProperty =>
        require(!reserved.contains(p.property),
          s"table property '${p.property}' is engine-managed and read-only")
        props :+= p.property -> Some(p.value); None
      case p: TableChange.RemoveProperty =>
        require(!reserved.contains(p.property),
          s"table property '${p.property}' is engine-managed and read-only")
        props :+= p.property -> None; None
      case other => throw new UnsupportedOperationException(s"table change $other")
    }
    // schema changes FIRST: evolveSchema still validates per-op (key-column
    // guards), so a mixed list must not land its property commit before a
    // schema refusal — properties only fail on I/O, schema ops on semantics
    if (ops.nonEmpty) t.evolveSchema(ops)
    if (props.nonEmpty) t.setProperties(props)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    require(baseName(ident) == ident.name,
      s"cannot drop a metadata view ($ident); drop the base table")
    if (!tableExists(ident)) return false
    cat.dropTable(ident.namespace()(0), ident.name)
    true
  }

  // ------------------------------------------------------------ procedures

  /** Maintenance procedures live under the reserved `system` namespace:
    * `CALL graftsql.system.compact(table => 'ns.t')` — see
    * [[GraftProcedures]]. */
  override def loadProcedure(ident: Identifier): procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array(GraftProcedures.Namespace)),
      s"procedures live in the ${GraftProcedures.Namespace} namespace, got $ident")
    GraftProcedures.load(warehouse, ident.name)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array(GraftProcedures.Namespace)))
      GraftProcedures.names.map(n => Identifier.of(namespace, n)).toArray
    else Array.empty

  // ------------------------------------------------------------- functions

  /** [[GraftBucketFunction]] backs the bucket transforms the scans report for
    * storage-partitioned joins. Spark resolves a reported transform by
    * loading its function from THIS catalog with an empty namespace
    * (`V2ExpressionUtils.toCatalyst`); `graftsql.system.bucket(...)` also
    * resolves for ad hoc SQL (e.g. inspecting a row's bucket). */
  override def loadFunction(ident: Identifier): functions.UnboundFunction =
    if (ident.name == GraftBucketFunction.Name) GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array(GraftProcedures.Namespace)))
      Array(Identifier.of(namespace, GraftBucketFunction.Name))
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def functionExists(ident: Identifier): Boolean =
    ident.name == GraftBucketFunction.Name

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    require(baseName(oldIdent) == oldIdent.name && baseName(newIdent) == newIdent.name,
      s"metadata-view names cannot be renamed: $oldIdent -> $newIdent")
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(cat.tablePath(oldIdent.namespace()(0), oldIdent.name)),
      java.nio.file.Paths.get(cat.tablePath(newIdent.namespace()(0), newIdent.name)))
  }
}

object GraftCatalog {
  /** Engine-managed table-property keys: derived facts surfaced through
    * SHOW TBLPROPERTIES, never settings. ONE list shared by CREATE's
    * pass-through filter and ALTER's refusal — two hand-maintained copies
    * drifted once already (a key filtered at neither site could be set at
    * CREATE but never unset, review finding). */
  val ReservedProps: Set[String] = Set("location", "format", "snapshot-id",
    "keys", "buckets", "lsn-high-water", "vacuum-lsn", "maintained-views",
    "tags", "constraints", "branches")
}
