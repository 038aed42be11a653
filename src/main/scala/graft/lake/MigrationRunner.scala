package graft.lake

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** File-based schema-migration runner (reference: yoyo migration files with
  * `-- depends:` headers applied in dependency order per tenant schema under
  * a lock — `cron_tasks.py:31-59`, `migrations/20230510_01_V14Kk.sql:2`).
  *
  * A migration file is named `<id>.sql` and contains:
  * {{{
  * -- id: 0002_add_branch          (optional; defaults to the file name)
  * -- depends: 0001_init           (zero or more, space-separated)
  * ALTER TABLE ADD COLUMN branch STRING;
  * ALTER TABLE WIDEN COLUMN size_bytes BIGINT;
  * ALTER TABLE RENAME COLUMN a TO b;
  * ALTER TABLE DROP COLUMN tmp;
  * }}}
  *
  * Files are topologically ordered by their `depends` DAG (ties broken by id
  * for determinism), applied exactly once per table — the applied-id ledger
  * lives in the table's metadata and commits atomically with the schema
  * change ([[LakeTable.applyMigration]]). The optimistic metadata commit is
  * the lock: two concurrent runners cannot both apply the same migration.
  */
object MigrationRunner {

  case class Migration(id: String, depends: Seq[String], changes: Seq[SchemaChange])

  def parse(id: String, text: String): Migration = {
    var mid = id
    val depends = Seq.newBuilder[String]
    val changes = Seq.newBuilder[SchemaChange]
    text.linesIterator.map(_.trim).filter(_.nonEmpty).foreach {
      case l if l.toLowerCase.startsWith("-- id:") =>
        mid = l.drop("-- id:".length).trim
      case l if l.toLowerCase.startsWith("-- depends:") =>
        depends ++= l.drop("-- depends:".length).trim.split("\\s+").filter(_.nonEmpty)
      case l if l.startsWith("--") &&
          l.replaceAll("\\s", "").toLowerCase.matches("--(id|depends):.*") =>
        // '--id:' / '-- id :' would otherwise be swallowed as a comment and
        // the migration silently keep its filename id — dependents then fail
        // on an 'unknown dependency', or worse the file applies under an
        // unintended ledger id. Refuse the near-miss loudly.
        sys.error(s"malformed migration directive '$l' in $id — " +
          "write exactly '-- id: <id>' or '-- depends: <ids>'")
      case l if l.startsWith("--") => // comment
      case stmt => changes += parseStatement(stmt.stripSuffix(";").trim)
    }
    Migration(mid, depends.result(), changes.result())
  }

  private val AddRe = """(?i)ALTER TABLE ADD COLUMN (\w+) (\w+)""".r
  private val WidenRe = """(?i)ALTER TABLE WIDEN COLUMN (\w+) (\w+)""".r
  private val RenameRe = """(?i)ALTER TABLE RENAME COLUMN (\w+) TO (\w+)""".r
  private val DropRe = """(?i)ALTER TABLE DROP COLUMN (\w+)""".r

  def parseStatement(s: String): SchemaChange = s match {
    case AddRe(name, tpe) => AddColumn(name, dataType(tpe))
    case WidenRe(name, tpe) => WidenType(name, dataType(tpe))
    case RenameRe(from, to) => RenameColumn(from, to)
    case DropRe(name) => DropColumn(name)
    case other => sys.error(s"unparseable migration statement: '$other'")
  }

  def dataType(t: String): DataType = t.toUpperCase match {
    case "STRING" | "VARCHAR" | "TEXT" => StringType
    case "INT" | "INTEGER" => IntegerType
    case "BIGINT" | "LONG" => LongType
    case "DOUBLE" => DoubleType
    case "FLOAT" => FloatType
    case "BOOLEAN" | "BOOL" => BooleanType
    case "BINARY" | "BYTEA" => BinaryType
    case other => sys.error(s"unsupported migration type $other")
  }

  /** Load every `*.sql` under `dir` (id = file name without extension unless
    * the file declares one). */
  def load(dir: String): Seq[Migration] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    // close the Files.list stream: scheduled migrateAll beats otherwise leak
    // one directory fd per beat in a long-running driver
    val s = Files.list(d)
    val sqlFiles = try {
      s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".sql")).toSeq.sortBy(_.toString)
    } finally s.close()
    sqlFiles.map { p: Path =>
      parse(p.getFileName.toString.stripSuffix(".sql"), Files.readString(p))
    }
  }

  /** Kahn topological order, deterministic (ready set processed in id order).
    * Fails on unknown dependencies and cycles. */
  def topoSort(ms: Seq[Migration]): Seq[Migration] = {
    // duplicate ids (a copy-pasted file keeping a stale `-- id:` header)
    // would silently collapse in the map and never apply the losing file
    val dup = ms.groupBy(_.id).collect { case (id, fs) if fs.size > 1 => id }
    require(dup.isEmpty, s"duplicate migration id(s): ${dup.toSeq.sorted.mkString(", ")}")
    val byId = ms.map(m => m.id -> m).toMap
    ms.foreach(m => m.depends.foreach(d =>
      require(byId.contains(d), s"migration ${m.id} depends on unknown '$d'")))
    val pending = scala.collection.mutable.SortedSet.empty[String] ++ byId.keys
    val done = scala.collection.mutable.LinkedHashSet.empty[String]
    while (pending.nonEmpty) {
      val ready = pending.find(id => byId(id).depends.forall(done.contains))
        .getOrElse(sys.error(s"migration cycle among ${pending.mkString(", ")}"))
      pending -= ready; done += ready
    }
    done.toSeq.map(byId)
  }

  /** Apply all unapplied migrations from `dir` to one table, in DAG order.
    * Returns the ids applied by THIS call (already-applied ids are skipped
    * via the table's ledger). */
  def migrate(table: LakeTable, dir: String): Seq[String] =
    applyOrdered(table, topoSort(load(dir)))

  private def applyOrdered(table: LakeTable, ordered: Seq[Migration]): Seq[String] =
    ordered.filter(m => table.applyMigration(m.id, m.changes)).map(_.id)

  /** Reference `cron_tasks.py:48-56`: loop every tenant namespace and bring
    * each one's `tableName` up to date. Returns ns -> newly applied ids.
    *
    * Per-tenant ISOLATION (the reference's per-tenant cron shape): one
    * drifted tenant must not block the schema rollout for the fleet — a
    * failing namespace is recorded and the loop continues; after the sweep
    * the collected failures raise ONE aggregate error (loud, but every
    * healthy tenant is already migrated). The migration set is loaded and
    * topo-sorted ONCE so every tenant sees the same consistent file set
    * (and N tenants don't cost N directory re-parses per beat). */
  def migrateAll(cat: LakeCatalog, tableName: String, dir: String): Map[String, Seq[String]] = {
    val ordered = topoSort(load(dir))
    val failures = Seq.newBuilder[(String, Throwable)]
    val applied = cat.listNamespaces().flatMap { ns =>
      if (!cat.tableExists(ns, tableName)) None
      else try Some(ns -> applyOrdered(cat.loadTable(ns, tableName), ordered))
      catch { case e: Exception => failures += ns -> e; None }
    }.toMap
    val failed = failures.result()
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"migration failed for ${failed.size} namespace(s) " +
          s"(${failed.map(_._1).sorted.mkString(", ")}); the rest migrated — " +
          s"first cause: ${failed.head._2.getMessage}", failed.head._2)
    applied
  }
}
