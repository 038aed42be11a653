package graft.lake

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Multi-tenant namespace layer: one directory per namespace, one lake table
  * per (namespace, table) pair (reference: one Postgres schema per
  * organization, created per-org by the migration runner —
  * `queries/schema_organizations.py:16-18`, `cron_tasks.py:48-56`;
  * namespace names sanitized exactly like the reference's `utils.py:6-12`).
  */
class LakeCatalog(val spark: SparkSession, val warehouse: String) {

  /** Sanitize a tenant slug to a namespace name (reference `utils.py:6-12`:
    * strip everything outside [A-Za-z0-9]). */
  def namespaceName(slug: String): String = {
    val n = slug.replaceAll("[^A-Za-z0-9]+", "")
    require(n.nonEmpty, s"slug '$slug' sanitizes to empty")
    n
  }

  def createNamespace(slug: String): String = {
    val ns = namespaceName(slug)
    Files.createDirectories(Paths.get(warehouse, ns))
    ns
  }

  def listNamespaces(): Seq[String] = {
    val w = Paths.get(warehouse)
    if (!Files.isDirectory(w)) return Seq.empty
    // close the Files.list stream — every SQL catalog op calls this, and an
    // unclosed stream leaks a directory fd per call in long-running drivers
    val s = Files.list(w)
    try s.iterator().asScala.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted
    finally s.close()
  }

  /** Table names are restricted to [A-Za-z0-9_] — a name containing '/' or
    * '..' would escape the warehouse directory (and dropTable would then
    * delete an arbitrary path). */
  def tableName(table: String): String = {
    require(table.matches("[A-Za-z0-9_]+"),
      s"illegal table name '$table' (allowed: [A-Za-z0-9_]+)")
    table
  }

  def tablePath(ns: String, table: String): String =
    Paths.get(warehouse, namespaceName(ns), tableName(table)).toString

  def createTable(ns: String, table: String, schema: StructType,
      keyCols: Seq[String], numBuckets: Int = 32,
      properties: Map[String, String] = Map.empty): LakeTable = {
    createNamespace(ns)
    LakeTable.create(spark, tablePath(ns, table), schema, keyCols,
      numBuckets = numBuckets, properties = properties)
  }

  def tableExists(ns: String, table: String): Boolean =
    LakeTable.exists(tablePath(ns, table))

  def loadTable(ns: String, table: String): LakeTable =
    LakeTable.forPath(spark, tablePath(ns, table))

  def listTables(ns: String): Seq[String] = {
    val d = Paths.get(warehouse, namespaceName(ns))
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try s.iterator().asScala
      .filter(p => LakeTable.exists(p.toString))
      .map(_.getFileName.toString).toSeq.sorted
    finally s.close()
  }

  def dropTable(ns: String, table: String): Unit =
    LakeTable.deleteRecursively(Paths.get(tablePath(ns, table)))
}
