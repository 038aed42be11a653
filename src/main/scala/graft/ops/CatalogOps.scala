package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Operators routed through the DSv2 SQL catalog — proves the SQL surface
  * end-to-end against the DuckDB oracle (reference serves every consumer
  * through SQL: `queries/schema_organizations.py:16-23`, and writes through
  * SQL upserts: `queries/fact_studies.py:63-83`).
  *
  * Catalog/table setup and ingest run ONCE per JVM (memoized): the
  * registered queries are side-effect-free SQL reads, so their bench times
  * measure the read path, not ingest. */
object CatalogOps {

  private val initialized =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Idempotent per JVM: wire the catalog conf (pure function of the sf dir,
    * so cached catalog instances never see a conf change) and ingest the two
    * SQL-surface tables. Concurrent callers block until the first finishes
    * (computeIfAbsent is the completion barrier), and a failed ingest
    * never records the key (a throwing mapper inserts nothing) so the next
    * call retries instead of reading a half-built warehouse forever. */
  private def ensureCatalog(s: SparkSession, d: String): Unit = {
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft-sqlwh-" +
      Integer.toHexString(d.hashCode)
    // Spark's CatalogManager caches the instantiated catalog with the
    // warehouse it FIRST saw; re-pointing the conf at a second dir in the
    // same JVM would silently keep reading the old warehouse. Refuse.
    val prev = s.conf.getOption("spark.sql.catalog.graftsql.warehouse")
    require(prev.forall(_ == wh),
      s"graftsql catalog already bound to ${prev.get} in this JVM; " +
        s"cannot re-point it at $wh (cached catalog instances keep the " +
        "first warehouse) — use a fresh SparkSession for a different sf dir")
    s.conf.set("spark.sql.catalog.graftsql", classOf[graft.sql.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graftsql.warehouse", wh)
    initialized.computeIfAbsent(wh, _ => { ingest(s, d, wh); java.lang.Boolean.TRUE })
  }

  private def ingest(s: SparkSession, d: String, wh: String): Unit = {
    val cat = new graft.lake.LakeCatalog(s, wh)
    cat.createNamespace("main")

    // q36 table: CDC-merged through the native API
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

    // q37 table: populated ENTIRELY through SQL — CREATE, INSERT, then an
    // overlapping-key INSERT whose rows must upsert (ON CONFLICT DO UPDATE)
    s.sql("DROP TABLE IF EXISTS graftsql.main.docs_up")
    s.sql("""CREATE TABLE graftsql.main.docs_up (doc_id BIGINT, lang STRING, n_chars BIGINT)
             TBLPROPERTIES ('keys'='doc_id', 'buckets'='8')""")
    Tables.t(s, d, "documents").createOrReplaceTempView("graft_docs_src")
    s.sql("INSERT INTO graftsql.main.docs_up SELECT doc_id, lang, n_chars FROM graft_docs_src")
    s.sql("""INSERT INTO graftsql.main.docs_up
             SELECT doc_id, 'redacted', 0 FROM graft_docs_src WHERE doc_id % 10 = 0""")

    // q38 table: populated through SQL, then rows retired through SQL
    // row-level DELETE (tombstone merge underneath)
    s.sql("DROP TABLE IF EXISTS graftsql.main.docs_del")
    s.sql("""CREATE TABLE graftsql.main.docs_del (doc_id BIGINT, lang STRING, n_chars BIGINT)
             TBLPROPERTIES ('keys'='doc_id', 'buckets'='8')""")
    s.sql("INSERT INTO graftsql.main.docs_del SELECT doc_id, lang, n_chars FROM graft_docs_src")
    s.sql("DELETE FROM graftsql.main.docs_del WHERE doc_id >= 100 AND doc_id < 200")

    // q39 table: seeded with even doc_ids through SQL, then one MERGE INTO
    // statement applies update/delete/insert actions from a source query
    // (the delta-based row-level path → one LWW merge commit)
    s.sql("DROP TABLE IF EXISTS graftsql.main.docs_mrg")
    s.sql("""CREATE TABLE graftsql.main.docs_mrg (doc_id BIGINT, lang STRING, n_chars BIGINT)
             TBLPROPERTIES ('keys'='doc_id', 'buckets'='8')""")
    s.sql("""INSERT INTO graftsql.main.docs_mrg
             SELECT doc_id, lang, n_chars FROM graft_docs_src WHERE doc_id % 2 = 0""")
    s.sql("""MERGE INTO graftsql.main.docs_mrg AS t
             USING (SELECT doc_id, lang, n_chars FROM graft_docs_src WHERE doc_id % 3 = 0) AS s
             ON t.doc_id = s.doc_id
             WHEN MATCHED AND s.doc_id % 5 = 0 THEN DELETE
             WHEN MATCHED THEN UPDATE SET lang = 'merged', n_chars = s.n_chars + 1
             WHEN NOT MATCHED THEN INSERT (doc_id, lang, n_chars) VALUES (s.doc_id, 'new', s.n_chars)""")

    // q77 table: MERGE-ON-READ ingest — one COW base commit, then two DELTA
    // commits (updates, deletes, and stale redeliveries that must lose to
    // stored state) layered WITHOUT rewriting the base files. The table is
    // deliberately left UNFOLDED so the registered query reads through the
    // per-bucket LWW merge reader — the scale path for trickle ingest,
    // where a COW beat would rewrite every hash bucket.
    val tm = graft.lake.LakeTable.createOrReplace(s,
      cat.tablePath("main", "docs_mor"), schema, Seq("doc_id"), numBuckets = 8)
    val src = Tables.t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    tm.merge(src.withColumn("lsn", col("doc_id")).withColumn("op", lit("I")), 0)
    tm.merge(src.filter(col("doc_id") % 7 === 0)
      .withColumn("lang", lit("mor-u"))
      .withColumn("n_chars", col("n_chars") + 10)
      .withColumn("lsn", col("doc_id") + 1000000L).withColumn("op", lit("U")),
      1, delta = true)
    tm.merge(
      src.filter(col("doc_id") % 11 === 0)
        .withColumn("lsn", col("doc_id") + 2000000L).withColumn("op", lit("D"))
        .unionByName(src.filter(col("doc_id") % 13 === 0)
          .withColumn("lang", lit("stale-must-lose"))
          .withColumn("lsn", lit(5L)).withColumn("op", lit("U"))),
      2, delta = true)
    require(tm.meta.currentSnapshot.exists(_.files.exists(_.isDelta)),
      "q77 setup must leave delta layers in place")

    // q41 table: the vector side of the co-bucketed fact-to-fact join —
    // same bucket count as `docs` and a single-column key, so the join
    // below qualifies for a storage-partitioned join (zero exchanges)
    s.sql("DROP TABLE IF EXISTS graftsql.main.vecs")
    s.sql("""CREATE TABLE graftsql.main.vecs (vec_id BIGINT, label INT)
             TBLPROPERTIES ('keys'='vec_id', 'buckets'='8')""")
    Tables.t(s, d, "embeddings").createOrReplaceTempView("graft_vecs_src")
    s.sql("INSERT INTO graftsql.main.vecs SELECT vec_id, label FROM graft_vecs_src")
  }

  val all: Seq[OpQuery] = Seq(

    // S8 + SQL surface — `documents` ingested through the CDC merge into a
    // lake table (setup, once per JVM), answered by a PLAIN SQL rollup
    // through the catalog. The oracle runs the same rollup on the source
    // parquet: merge of pure inserts must be lossless, and the SQL read
    // path must agree with DuckDB.
    OpQuery("q36_sql_catalog_rollup",
      (s, d) => {
        ensureCatalog(s, d)
        s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars
                 FROM graftsql.main.docs GROUP BY lang""")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM documents GROUP BY lang""".stripMargin)),

    // SQL WRITE surface — the table was created and twice-INSERTed through
    // pure SQL (setup above); the second INSERT hit existing keys and must
    // have upserted them. The oracle recomputes the expected post-upsert
    // state from the source parquet.
    OpQuery("q37_sql_insert_upsert",
      (s, d) => {
        ensureCatalog(s, d)
        s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars
                 FROM graftsql.main.docs_up GROUP BY lang""")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM (SELECT doc_id,
             |        CASE WHEN doc_id % 10 = 0 THEN 'redacted' ELSE lang END AS lang,
             |        CASE WHEN doc_id % 10 = 0 THEN 0 ELSE n_chars END AS n_chars
             |      FROM documents)
             |GROUP BY lang""".stripMargin)),

    // SQL row-level DELETE — the table lost doc_ids [100, 200) through
    // `DELETE FROM ... WHERE` (setup above), which the engine executes as a
    // tombstone merge. The oracle recomputes the post-delete state from the
    // source parquet; agreement proves the deletes removed exactly the
    // matching keys and nothing else.
    OpQuery("q38_sql_delete",
      (s, d) => {
        ensureCatalog(s, d)
        s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars
                 FROM graftsql.main.docs_del GROUP BY lang""")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM documents WHERE NOT (doc_id >= 100 AND doc_id < 200)
             |GROUP BY lang""".stripMargin)),

    // SQL MERGE INTO — the table held even doc_ids; one MERGE statement
    // (setup above) deleted matched multiples of 5, updated the other
    // matched rows and inserted the unmatched source rows. The oracle
    // recomputes the post-merge state from the source parquet; agreement
    // proves each WHEN branch hit exactly its rows.
    OpQuery("q39_sql_merge",
      (s, d) => {
        ensureCatalog(s, d)
        s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars
                 FROM graftsql.main.docs_mrg GROUP BY lang""")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 6 = 0 THEN 'merged'
             |         WHEN doc_id % 2 <> 0 THEN 'new'
             |         ELSE lang END AS lang,
             |    CASE WHEN doc_id % 6 = 0 THEN n_chars + 1 ELSE n_chars END AS n_chars
             |  FROM documents
             |  WHERE (doc_id % 2 = 0 OR doc_id % 3 = 0)
             |    AND NOT (doc_id % 6 = 0 AND doc_id % 5 = 0))
             |GROUP BY lang""".stripMargin)),

    // Storage-partitioned fact-to-fact join — `docs` and `vecs` are both
    // hash-bucketed 8 ways on their single-column key, and the scans report
    // that layout as a KeyGroupedPartitioning, so this id-equi join runs
    // with zero exchanges on either side when broadcast doesn't apply
    // (PlanSpec asserts the exchange-free shape; at 100 TB this is the
    // co-located join path for two large synced tables). The oracle runs
    // the same join + rollup on the source parquet in DuckDB.
    OpQuery("q41_sql_spj_join",
      (s, d) => {
        ensureCatalog(s, d)
        s.sql("""SELECT d.lang, count(*) AS n_pairs, sum(v.label) AS total_label
                 FROM graftsql.main.docs d
                 JOIN graftsql.main.vecs v ON d.doc_id = v.vec_id
                 GROUP BY d.lang""")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs,
             |  CAST(sum(label) AS BIGINT) AS total_label
             |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
             |GROUP BY lang""".stripMargin)),

    // MERGE-ON-READ ingest (S4's delta mode) — the table carries a COW base
    // plus two unfolded delta layers (setup above): updates, deletes, and
    // stale redeliveries that must lose to stored state. This rollup reads
    // through the per-bucket LWW merge reader, so agreement with the oracle
    // proves the layered read resolves exactly the state a full
    // copy-on-write replay would have produced — updates applied, deleted
    // keys gone, stale rows invisible.
    OpQuery("q77_sql_mor_ingest",
      (s, d) => {
        ensureCatalog(s, d)
        s.sql("""SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars
                 FROM graftsql.main.docs_mor GROUP BY lang""")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 7 = 0 THEN 'mor-u' ELSE lang END AS lang,
             |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 10 ELSE n_chars END AS n_chars
             |  FROM documents WHERE doc_id % 11 <> 0)
             |GROUP BY lang""".stripMargin)))
}
