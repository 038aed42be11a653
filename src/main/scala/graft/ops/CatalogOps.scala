package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Operators routed through the DSv2 SQL catalog — proves the SQL surface
  * end-to-end against the DuckDB oracle (reference serves every consumer
  * through SQL: `queries/schema_organizations.py:16-23`). */
object CatalogOps {

  val all: Seq[OpQuery] = Seq(

    // S8 + SQL surface — ingest `documents` through the CDC merge into a
    // lake table, answer a rollup from PLAIN SQL through the catalog. The
    // oracle runs the same rollup on the source parquet: merge of pure
    // inserts must be lossless, and the SQL read path must agree with DuckDB.
    OpQuery("q36_sql_catalog_rollup",
      (s, d) => {
        // warehouse path is a pure function of the sf dir: catalog instances
        // are cached per session by name, so the conf must never change
        val wh = s"${System.getProperty("java.io.tmpdir")}/graft-sqlwh-" +
          Integer.toHexString(d.hashCode)
        s.conf.set("spark.sql.catalog.graftsql",
          classOf[graft.sql.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.graftsql.warehouse", wh)
        val cat = new graft.lake.LakeCatalog(s, wh)
        cat.createNamespace("main")
        val schema = StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("lang", StringType), StructField("source", StringType),
          StructField("n_chars", LongType)))
        val t = graft.lake.LakeTable.createOrReplace(s,
          cat.tablePath("main", "docs"), schema, Seq("doc_id"), numBuckets = 8)
        val docs = Tables.t(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .withColumn("lsn", col("doc_id")).withColumn("op", lit("I"))
        t.merge(docs, 0)
        s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars
                 FROM graftsql.main.docs GROUP BY lang""")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM documents GROUP BY lang""".stripMargin)))
}
