package graft.sql

import graft.SparkTestBase
import graft.cdc._
import graft.lake._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DSv2 SQL surface (VERDICT round-1 "What's missing" #2): pure SQL
  * reads of merged+evolved lake tables, namespace DDL, time travel. */
class SqlCatalogSpec extends SparkTestBase {

  private def setupCatalog(name: String): LakeCatalog = {
    val wh = tmpDir("sqlwh")
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    new LakeCatalog(spark, wh)
  }

  test("pure SQL reads a merged, evolved table; matches the API read exactly") {
    val cat = setupCatalog("g1")
    val t = cat.createTable("org1", "code_files", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 8)
    import spark.implicits._
    val v1 = Seq(
      (1L, "I", "r1", "p1", "c1", "scala", "body1"),
      (2L, "I", "r2", "p2", "c2", "py", "body2"),
      (3L, "D", "r2", "p2", "c2", "py", null))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(v1, 0)
    t.evolveSchema(Seq(AddColumn("branch", StringType), AddColumn("size_bytes", IntegerType)))
    val v2 = Seq((4L, "I", "r3", "p3", "c3", "scala", "body3", "main", 42))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content", "branch", "size_bytes")
    t.merge(CdcPipeline.toMergeInput(v2, t), 1)
    // rename + widen AFTER data was written: SQL read must map by column id
    t.evolveSchema(Seq(RenameColumn("branch", "ref"), WidenType("size_bytes", LongType)))

    val sql = spark.sql(
      "SELECT repo, lang, content, ref, size_bytes FROM g1.org1.code_files ORDER BY repo")
      .collect().map(_.toSeq).toSeq
    assert(sql == Seq(
      Seq("r1", "scala", "body1", null, null), // tombstoned r2 hidden
      Seq("r3", "scala", "body3", "main", 42L))) // renamed + widened via column id
    val api = t.currentState()
      .select("repo", "lang", "content", "ref", "size_bytes")
      .orderBy("repo").collect().map(_.toSeq).toSeq
    assert(sql == api)
    // filters and aggregates over the scan
    assert(spark.sql(
      "SELECT count(*) FROM g1.org1.code_files WHERE lang = 'scala'").head().getLong(0) == 2)
  }

  test("namespace + table DDL round-trips through plain SQL") {
    val cat = setupCatalog("g2")
    spark.sql("CREATE NAMESPACE g2.org2")
    assert(spark.sql("SHOW NAMESPACES IN g2").collect().map(_.getString(0)).contains("org2"))
    spark.sql("""CREATE TABLE g2.org2.files
      (repo STRING, path STRING, commit STRING, content STRING)
      TBLPROPERTIES ('keys'='repo,path,commit', 'buckets'='4')""")
    assert(spark.sql("SHOW TABLES IN g2.org2").collect().map(_.getString(1)).contains("files"))
    import spark.implicits._
    val t = cat.loadTable("org2", "files")
    assert(t.meta.keyCols == Seq("repo", "path", "commit") && t.meta.numBuckets == 4)
    t.merge(Seq((1L, "I", "r", "p", "c", "v1"))
      .toDF("lsn", "op", "repo", "path", "commit", "content"), 0)
    // ALTER TABLE routes through the engine's schema evolution
    spark.sql("ALTER TABLE g2.org2.files ADD COLUMN lang STRING")
    assert(spark.sql("SELECT lang FROM g2.org2.files").head().isNullAt(0))
    spark.sql("ALTER TABLE g2.org2.files RENAME COLUMN lang TO language")
    assert(spark.sql("SELECT language FROM g2.org2.files").count() == 1)
    spark.sql("DROP TABLE g2.org2.files")
    assert(!cat.tableExists("org2", "files"))
    spark.sql("DROP NAMESPACE g2.org2")
    assert(!spark.sql("SHOW NAMESPACES IN g2").collect().map(_.getString(0)).contains("org2"))
  }

  test("VERSION AS OF time travel via SQL") {
    val cat = setupCatalog("g3")
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    import spark.implicits._
    def batch(lsn: Long, content: String) =
      Seq((lsn, "U", "r", "p", "c", "scala", content))
        .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(batch(1, "one"), 0)
    val s1 = t.meta.currentSnapshotId
    t.merge(batch(2, "two"), 1)
    assert(spark.sql(s"SELECT content FROM g3.ns.t VERSION AS OF $s1")
      .head().getString(0) == "one")
    assert(spark.sql("SELECT content FROM g3.ns.t").head().getString(0) == "two")

    // TIMESTAMP AS OF: latest snapshot committed at or before the instant
    val ts1 = t.meta.snapshotById(s1).get.wallClockMs
    assert(spark.sql(
      s"SELECT content FROM g3.ns.t TIMESTAMP AS OF timestamp_millis($ts1)")
      .head().getString(0) == "one")
    val now = t.meta.currentSnapshot.get.wallClockMs + 60000L
    assert(spark.sql(
      s"SELECT content FROM g3.ns.t TIMESTAMP AS OF timestamp_millis($now)")
      .head().getString(0) == "two")
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM g3.ns.t TIMESTAMP AS OF timestamp_millis(${ts1 - 100000L})")
      .collect())
    assert(e.getMessage.contains("no snapshot"), e.getMessage)
  }

  test("key-equality SQL point lookup prunes to one bucket's files") {
    val cat = setupCatalog("g5")
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 16)
    import spark.implicits._
    val rows = (1 to 200).map(i => (i.toLong, "I", s"r$i", s"p$i", s"c$i", "scala", s"v$i"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(rows, 0)
    val totalFiles = t.meta.currentSnapshot.get.files.size
    assert(totalFiles > 4) // multiple buckets written
    val q = spark.sql(
      "SELECT content FROM g5.ns.t WHERE repo='r7' AND path='p7' AND commit='c7'")
    val plan = q.queryExecution.executedPlan.toString
    val filesScanned = "files=(\\d+)".r.findFirstMatchIn(plan).get.group(1).toInt
    assert(filesScanned < totalFiles, s"no bucket pruning: $filesScanned of $totalFiles\n$plan")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("v7")) // still correct
    // a non-key filter must not prune (and must still be applied post-scan)
    assert(spark.sql("SELECT count(*) FROM g5.ns.t WHERE lang='scala'")
      .head().getLong(0) == 200)
  }

  test("INSERT INTO is a keyed upsert; INSERT OVERWRITE replaces; reads see each commit") {
    val cat = setupCatalog("g6")
    spark.sql("CREATE NAMESPACE g6.ns")
    spark.sql("""CREATE TABLE g6.ns.docs (id BIGINT, lang STRING, n BIGINT)
      TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    spark.sql("INSERT INTO g6.ns.docs VALUES (1, 'en', 10), (2, 'de', 20), (3, 'fr', 30)")
    def rows() = spark.sql("SELECT id, lang, n FROM g6.ns.docs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows() == Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "fr", 30L)))

    // overlapping keys: ON CONFLICT DO UPDATE semantics, one row per key
    spark.sql("INSERT INTO g6.ns.docs VALUES (2, 'de', 99), (4, 'es', 40)")
    assert(rows() == Seq((1L, "en", 10L), (2L, "de", 99L), (3L, "fr", 30L), (4L, "es", 40L)))

    // INSERT ... SELECT through the same surface
    spark.sql("INSERT INTO g6.ns.docs SELECT id + 10, lang, n * 2 FROM g6.ns.docs WHERE id <= 2")
    assert(rows().map(_._1) == Seq(1L, 2L, 3L, 4L, 11L, 12L))

    // each statement is one lake commit (native snapshots underneath)
    val t = cat.loadTable("ns", "docs")
    assert(t.meta.snapshots.count(_.operation == "merge") == 3)

    // INSERT OVERWRITE: full replace, old keys gone
    spark.sql("INSERT OVERWRITE g6.ns.docs VALUES (7, 'it', 70)")
    assert(rows() == Seq((7L, "it", 70L)))

    // time-travel views are read-only
    val s1 = t.meta.currentSnapshotId
    intercept[Exception](
      spark.sql(s"INSERT INTO g6.ns.docs VERSION AS OF $s1 VALUES (8, 'pt', 80)"))
  }

  test("SQL DELETE tombstones matching rows; feed, time travel and q-surface agree") {
    val cat = setupCatalog("g9")
    spark.sql("CREATE NAMESPACE g9.ns")
    spark.sql("""CREATE TABLE g9.ns.docs (id BIGINT, lang STRING, n BIGINT)
      TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    spark.sql("INSERT INTO g9.ns.docs VALUES (1,'en',10), (2,'de',20), (3,'fr',30), (4,'es',40)")
    val t = cat.loadTable("ns", "docs")
    val s1 = t.meta.currentSnapshotId

    // key-predicate delete
    spark.sql("DELETE FROM g9.ns.docs WHERE id = 2")
    def ids() = spark.sql("SELECT id FROM g9.ns.docs ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids() == Seq(1L, 3L, 4L))
    // non-key predicate delete (scan-filter → tombstone merge)
    spark.sql("DELETE FROM g9.ns.docs WHERE n >= 30 AND lang <> 'nope'")
    assert(ids() == Seq(1L))
    // the deletes are real tombstone commits: change feed sees them, time
    // travel still sees the pre-delete state
    val feed = t.changes(s1).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("_change_type")).toMap
    assert(feed == Map(2L -> "delete", 3L -> "delete", 4L -> "delete"))
    assert(t.currentState(Some(s1)).count() == 4)
    // delete with no matches is a no-op, not an error
    val preSnap = t.meta.currentSnapshotId
    spark.sql("DELETE FROM g9.ns.docs WHERE id = 999")
    assert(t.meta.currentSnapshotId == preSnap)
    // unconditional DELETE empties the table
    spark.sql("DELETE FROM g9.ns.docs")
    assert(ids().isEmpty)
  }

  test("duplicate keys inside one INSERT dedup deterministically (LWW invariant holds)") {
    val cat = setupCatalog("g10")
    spark.sql("CREATE NAMESPACE g10.ns")
    spark.sql("""CREATE TABLE g10.ns.kv (id BIGINT, v STRING)
      TBLPROPERTIES ('keys'='id', 'buckets'='2')""")
    // key 1 appears three times in ONE statement: exactly one survivor, and
    // repeating the identical statement must reproduce the identical choice
    val stmt = "INSERT INTO g10.ns.kv VALUES (1,'a'), (1,'b'), (2,'x'), (1,'c')"
    spark.sql(stmt)
    val first = spark.sql("SELECT id, v FROM g10.ns.kv ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(first.map(_._1) == Seq(1L, 2L), s"dup keys not deduped: $first")
    spark.sql(stmt) // same statement again → same winner (determinism)
    val second = spark.sql("SELECT id, v FROM g10.ns.kv ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(second == first)
    // engine invariant: one row per (key, lsn) in the stored state
    val t = cat.loadTable("ns", "kv")
    val perKeyLsn = t.read().groupBy(col("id"), col("_lsn")).count()
      .filter(col("count") > 1).count()
    assert(perKeyLsn == 0, "duplicate (key, lsn) rows violate the LWW invariant")
  }

  test("min/max manifest stats skip files for range predicates; results unchanged") {
    val cat = setupCatalog("g7")
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("day", org.apache.spark.sql.types.LongType, true),
      org.apache.spark.sql.types.StructField("tag", org.apache.spark.sql.types.StringType, true)))
    val t = cat.createTable("ns", "evts", schema, Seq("id"), numBuckets = 1)
    // 5 append commits = 5 files with DISJOINT day ranges (the natural
    // lsn/time layout of an append-mostly CDC log): range queries must read
    // only the overlapping file(s)
    (0 until 5).foreach { w =>
      t.append((0 until 20).map(i =>
        ((w * 20 + i).toLong, (w * 100 + i).toLong, s"t$w"))
        .toDF("id", "day", "tag").coalesce(1)) // one file per append window
    }
    val totalFiles = t.meta.currentSnapshot.get.files.size
    assert(totalFiles == 5)
    def filesScanned(sql: String): Int = {
      val plan = spark.sql(sql).queryExecution.executedPlan.toString
      "files=(\\d+)".r.findFirstMatchIn(plan).get.group(1).toInt
    }
    // single-file range hit
    assert(filesScanned("SELECT id FROM g7.ns.evts WHERE day BETWEEN 210 AND 215") == 1)
    assert(spark.sql("SELECT count(*) FROM g7.ns.evts WHERE day BETWEEN 210 AND 215")
      .head().getLong(0) == 6)
    // open-ended ranges
    assert(filesScanned("SELECT id FROM g7.ns.evts WHERE day > 399") == 1)
    assert(filesScanned("SELECT id FROM g7.ns.evts WHERE day < 100") == 1)
    // equality on a stats column (string)
    assert(filesScanned("SELECT id FROM g7.ns.evts WHERE tag = 't3'") == 1)
    assert(spark.sql("SELECT count(*) FROM g7.ns.evts WHERE tag = 't3'")
      .head().getLong(0) == 20)
    // disjoint range: zero files, zero rows, no error
    assert(filesScanned("SELECT id FROM g7.ns.evts WHERE day > 100000") == 0)
    assert(spark.sql("SELECT count(*) FROM g7.ns.evts WHERE day > 100000")
      .head().getLong(0) == 0)
    // unpruned correctness: full scan still sees everything
    assert(spark.sql("SELECT count(*) FROM g7.ns.evts").head().getLong(0) == 100)
  }

  test("insert-only tables read through the vectorized columnar path; deletes fall back") {
    val cat = setupCatalog("g8")
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    import spark.implicits._
    val rows = (1 to 100).map(i => (i.toLong, "I", s"r$i", s"p$i", s"c$i", "scala", s"v$i"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(rows, 0)
    def plan(sql: String) = spark.sql(sql).queryExecution.executedPlan.toString
    val q = "SELECT repo, content FROM g8.ns.t WHERE lang = 'scala'"
    // insert-only: every file is footer-proven tombstone-free → ColumnarToRow
    // above the scan means ColumnarBatches flowed out of the reader
    assert(plan(q).contains("ColumnarToRow"), s"columnar path not used:\n${plan(q)}")
    assert(spark.sql(q).count() == 100)
    // a delete writes tombstones into one bucket → whole-scan fallback to the
    // row reader (Spark rejects mixed row/columnar scans), results correct
    t.merge(Seq((101L, "D", "r7", "p7", "c7", "scala", null: String))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content"), 1)
    assert(!plan(q).contains("ColumnarToRow"), s"columnar path must fall back:\n${plan(q)}")
    assert(spark.sql(q).count() == 99)
    assert(spark.sql("SELECT repo FROM g8.ns.t WHERE repo='r7'").count() == 0)
  }

  test("SQL UPDATE rewrites matching rows as one LWW upsert commit") {
    val cat = setupCatalog("g12")
    spark.sql("CREATE NAMESPACE g12.ns")
    spark.sql("""CREATE TABLE g12.ns.t (id BIGINT, v STRING, n INT)
      TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    spark.sql("INSERT INTO g12.ns.t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    def state() = spark.sql("SELECT id, v, n FROM g12.ns.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq

    // plain value update with an expression over existing columns
    spark.sql("UPDATE g12.ns.t SET v = concat(v, '!'), n = n + 1 WHERE n >= 20")
    assert(state() == Seq((1L, "a", 10), (2L, "b!", 21), (3L, "c!", 31)))

    // key-changing update: old key tombstoned, new key upserted
    spark.sql("UPDATE g12.ns.t SET id = 10 WHERE id = 1")
    assert(state() == Seq((2L, "b!", 21), (3L, "c!", 31), (10L, "a", 10)))

    // no-match update is a no-op commit-wise
    val t = cat.loadTable("ns", "t")
    val snaps = t.meta.currentSnapshotId
    spark.sql("UPDATE g12.ns.t SET v = 'x' WHERE id = 999")
    assert(state().size == 3 && t.meta.currentSnapshotId == snaps)
    // staging is cleaned up after every statement
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(t.root, "_deltastage")) ||
      { val s = java.nio.file.Files.list(java.nio.file.Paths.get(t.root, "_deltastage"))
        try !s.iterator().hasNext finally s.close() })
  }

  test("SQL MERGE INTO: matched update/delete + not-matched insert, one commit") {
    val cat = setupCatalog("g13")
    spark.sql("CREATE NAMESPACE g13.ns")
    spark.sql("""CREATE TABLE g13.ns.t (id BIGINT, v STRING, n INT)
      TBLPROPERTIES ('keys'='id', 'buckets'='4')""")
    spark.sql("INSERT INTO g13.ns.t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    import spark.implicits._
    Seq((2L, "b2", 200, "U"), (3L, null: String, 0, "D"), (4L, "d", 40, "U"))
      .toDF("id", "v", "n", "op").createOrReplaceTempView("src")

    val t = cat.loadTable("ns", "t")
    val before = t.meta.currentSnapshotId
    spark.sql("""MERGE INTO g13.ns.t AS t USING src AS s ON t.id = s.id
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n
      WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (s.id, s.v, s.n)""")
    val state = spark.sql("SELECT id, v, n FROM g13.ns.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(state == Seq((1L, "a", 10), (2L, "b2", 200), (4L, "d", 40)))
    // the whole statement is ONE merge commit, visible to the change feed
    assert(t.meta.currentSnapshotId == before + 1)
    val feed = t.changes(before).select("id", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed == Set((2L, "update"), (3L, "delete"), (4L, "insert")))

    // NOT MATCHED BY SOURCE sweeps rows absent from the source
    Seq(2L).toDF("id").createOrReplaceTempView("keep")
    spark.sql("""MERGE INTO g13.ns.t AS t USING keep AS s ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(spark.sql("SELECT id FROM g13.ns.t").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("CTAS creates + populates in one statement; subquery DELETE rides the row-level path") {
    setupCatalog("g14")
    spark.sql("CREATE NAMESPACE g14.ns")
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v").createOrReplaceTempView("ctas_src")
    spark.sql("""CREATE TABLE g14.ns.t TBLPROPERTIES ('keys'='id', 'buckets'='2')
      AS SELECT id, v FROM ctas_src""")
    assert(spark.sql("SELECT id FROM g14.ns.t").count() == 4)

    // IN-subquery can't become a source Filter → metadata delete is
    // ineligible and the delta-based row-level plan must handle it
    Seq(2L, 4L).toDF("id").createOrReplaceTempView("drop_ids")
    spark.sql("DELETE FROM g14.ns.t WHERE id IN (SELECT id FROM drop_ids)")
    assert(spark.sql("SELECT id FROM g14.ns.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("streaming SQL writes: micro-batches land as epoch-ledgered upsert commits") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val cat = setupCatalog("g11")
    spark.sql("CREATE NAMESPACE g11.ns")
    spark.sql("""CREATE TABLE g11.ns.st (id BIGINT, v STRING)
      TBLPROPERTIES ('keys'='id', 'buckets'='2')""")
    val src = tmpDir("stsrc")
    val ckpt = tmpDir("stckpt")
    def drain(): Unit = {
      val q = spark.readStream.schema("id BIGINT, v STRING").parquet(src)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("g11.ns.st")
      q.awaitTermination()
    }
    def state() = spark.sql("SELECT id, v FROM g11.ns.st ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("append").parquet(src)
    drain()
    assert(state() == Seq((1L, "a"), (2L, "b")))

    // a later micro-batch upserts an existing key and inserts a new one
    Seq((2L, "b2"), (3L, "c")).toDF("id", "v").write.mode("append").parquet(src)
    drain()
    assert(state() == Seq((1L, "a"), (2L, "b2"), (3L, "c")))

    // drained restart: offsets caught up, no new table commits, no staging left
    val t = cat.loadTable("ns", "st")
    val snap = t.meta.currentSnapshotId
    drain()
    assert(t.meta.currentSnapshotId == snap)
    val stage = java.nio.file.Paths.get(t.root, "_streamstage")
    if (java.nio.file.Files.exists(stage)) {
      import scala.jdk.CollectionConverters._
      val w = java.nio.file.Files.walk(stage)
      val leftover = try w.iterator().asScala
        .exists(_.getFileName.toString.startsWith("epoch-")) finally w.close()
      assert(!leftover, "staging epoch dirs not cleaned after commit")
    }
  }

  test("column pruning is pushed into the parquet projection") {
    val cat = setupCatalog("g4")
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    import spark.implicits._
    t.merge(Seq((1L, "I", "r", "p", "c", "scala", "v"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content"), 0)
    val p = spark.sql("SELECT repo FROM g4.ns.t")
      .queryExecution.executedPlan.toString
    assert(p.contains("cols=repo"), s"projection not pruned to repo:\n$p")
    assert(!p.contains("cols=repo,path"), s"over-wide scan:\n$p")
  }

  test("INSERT OVERWRITE dedups duplicate keys in-statement (replace stamps one lsn)") {
    setupCatalog("g17")
    spark.sql("CREATE NAMESPACE g17.ns")
    spark.sql("""CREATE TABLE g17.ns.t (k STRING, v INT)
      TBLPROPERTIES ('keys'='k', 'buckets'='2')""")
    // duplicate key within one OVERWRITE: without the dedup both rows land
    // at lsn 0 and the same-key-same-lsn LWW invariant is broken
    spark.sql("INSERT OVERWRITE g17.ns.t VALUES ('a', 1), ('a', 2), ('b', 3)")
    val rows = spark.sql("SELECT k, v FROM g17.ns.t ORDER BY k")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows.map(_._1) == Seq("a", "b"), s"duplicate key stored: $rows")
    // deterministic winner (max payload-hash) and a later merge stays sane
    spark.sql("INSERT INTO g17.ns.t VALUES ('a', 9)")
    assert(spark.sql("SELECT v FROM g17.ns.t WHERE k = 'a'").head().getInt(0) == 9)
  }

  test("reserved view suffixes are rejected by DDL instead of leaving orphans") {
    setupCatalog("g18")
    spark.sql("CREATE NAMESPACE g18.ns")
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE g18.ns.`x$cdc` (k STRING, v INT) TBLPROPERTIES ('keys'='k')"))
    assert(e.getMessage.contains("reserved"), e.getMessage)
    intercept[Exception](spark.sql(
      "CREATE TABLE g18.ns.`x$changes` (k STRING, v INT) TBLPROPERTIES ('keys'='k')"))
    // time travel on a view addresses nothing meaningful — loud error
    spark.sql("CREATE TABLE g18.ns.t (k STRING, v INT) TBLPROPERTIES ('keys'='k')")
    spark.sql("INSERT INTO g18.ns.t VALUES ('a', 1)")
    val tv = intercept[Exception](spark.sql(
      "SELECT * FROM g18.ns.`t$changes` VERSION AS OF 1").collect())
    assert(tv.getMessage.contains("not supported on metadata views") ||
      (tv.getCause != null && tv.getCause.getMessage.contains("not supported on metadata views")),
      tv.getMessage)
  }

  test("manifest-backed scan statistics auto-broadcast small lake tables in SQL joins") {
    val cat = setupCatalog("g16")
    import spark.implicits._
    def mk(name: String, n: Int) = {
      val t = cat.createTable("ns", name, CdcPipeline.baseTableSchema,
        Seq("repo", "path", "commit"), numBuckets = 2)
      t.merge((1 to n).map(i => (i.toLong, "I", s"r$i", s"p$i", s"c$i", "scala", s"v$i"))
        .toDF("lsn", "op", "repo", "path", "commit", "lang", "content"), 0)
      t
    }
    mk("big", 500); mk("small", 5)
    // without estimateStatistics a DSv2 relation defaults to "unknown =
    // huge" and the join degrades to sort-merge; the manifest sizes let
    // Catalyst pick a broadcast join on its own (no hint)
    val q = spark.sql("""SELECT a.repo, b.content FROM g16.ns.big a
      JOIN g16.ns.small b ON a.repo = b.repo""")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"stats not used for join planning:\n$p")
    assert(!p.contains("SortMergeJoin"), s"degraded to SMJ:\n$p")
    assert(q.count() == 5)
  }

  test("SQL maintenance procedures: CALL compact / vacuum / rebucket / expire_snapshots") {
    val cat = setupCatalog("g15")
    spark.sql("CREATE NAMESPACE g15.ops")
    spark.sql("""CREATE TABLE g15.ops.t (k STRING, v INT)
      TBLPROPERTIES ('keys'='k', 'buckets'='4')""")
    spark.sql("INSERT INTO g15.ops.t VALUES ('a', 1), ('b', 2), ('c', 3)")
    spark.sql("DELETE FROM g15.ops.t WHERE k = 'b'")
    val t = cat.loadTable("ops", "t")
    import spark.implicits._
    (1 to 3).foreach { i => // appends accumulate small sibling files per bucket
      t.append(Seq((s"x$i", 10 + i, 100L + i)).toDF("k", "v", "lsn"))
    }
    val filesBefore = t.meta.currentSnapshot.get.files.size

    // compact: packs the small files, returns the net file reduction
    val removed = spark.sql("CALL g15.system.compact(table => 'ops.t')")
      .head().getInt(0)
    assert(removed > 0)
    assert(t.meta.currentSnapshot.get.files.size == filesBefore - removed)

    // vacuum: default up_to_lsn drops the one tombstone ('b')
    assert(spark.sql("CALL g15.system.vacuum(table => 'ops.t')")
      .head().getLong(0) == 1L)

    // rebucket (positional args) flips the bucket count in one commit
    assert(spark.sql("CALL g15.system.rebucket('ops.t', 8)").head().getInt(0) == 8)
    assert(t.meta.numBuckets == 8)

    // logical state survived all three maintenance ops
    assert(spark.sql("SELECT k, v FROM g15.ops.t ORDER BY k")
      .collect().map(_.toSeq).toSeq ==
      Seq(Seq("a", 1), Seq("c", 3), Seq("x1", 11), Seq("x2", 12), Seq("x3", 13)))

    // expire_snapshots: history trimmed, old version unreadable, head intact
    val deleted = spark.sql(
      "CALL g15.system.expire_snapshots(table => 'ops.t', keep_last => 1)")
      .head().getLong(0)
    assert(deleted >= 1L)
    intercept[Exception](spark.sql("SELECT * FROM g15.ops.t VERSION AS OF 1").collect())
    assert(spark.sql("SELECT count(*) FROM g15.ops.t").head().getLong(0) == 5)

    // discovery + error surface (Spark wraps the catalog's error in
    // FAILED_TO_LOAD_ROUTINE; our "unknown procedure" detail is the cause)
    val e = intercept[Exception](spark.sql("CALL g15.system.no_such_proc('ops.t')"))
    assert(e.getMessage.contains("FAILED_TO_LOAD_ROUTINE") ||
      e.getMessage.contains("unknown procedure"))
    assert(spark.sql("SHOW PROCEDURES IN g15.system").collect()
      .map(_.getAs[String]("procedure_name")).toSet ==
      Set("compact", "vacuum", "rebucket", "fold_deltas", "expire_snapshots",
        "rollback",
        "create_view", "refresh_views", "drop_view", "create_tag", "drop_tag",
        "add_constraint", "drop_constraint", "mirror",
        "create_branch", "publish_branch", "drop_branch"))
  }

  test("CALL rollback restores an earlier snapshot picked from t$snapshots") {
    setupCatalog("g16")
    spark.sql("CREATE NAMESPACE g16.ops")
    spark.sql("""CREATE TABLE g16.ops.t (k STRING, v INT)
      TBLPROPERTIES ('keys'='k', 'buckets'='4')""")
    spark.sql("INSERT INTO g16.ops.t VALUES ('a', 1), ('b', 2)")
    spark.sql("INSERT INTO g16.ops.t VALUES ('a', 99), ('c', 3)")
    spark.sql("DELETE FROM g16.ops.t WHERE k = 'b'")
    // a SQL-only operator finds the pre-mistake snapshot in the history view
    val target = spark.sql(
      """SELECT min(snapshot_id) FROM g16.ops.`t$snapshots`
         WHERE operation = 'merge'""").head().getLong(0)
    val newId = spark.sql(
      s"CALL g16.system.rollback(table => 'ops.t', snapshot_id => $target)")
      .head().getLong(0)
    assert(spark.sql("SELECT k, v FROM g16.ops.t ORDER BY k")
      .collect().map(_.toSeq).toSeq == Seq(Seq("a", 1), Seq("b", 2)))
    // the history view shows the rollback commit and what it restored
    val row = spark.sql(
      s"SELECT operation, rollback_of FROM g16.ops.`t$$snapshots` " +
        s"WHERE snapshot_id = $newId").head()
    assert(row.getString(0) == "rollback" && row.getLong(1) == target)
    // new SQL writes stamp above the reverted span (no lsn reuse)
    spark.sql("INSERT INTO g16.ops.t VALUES ('d', 4)")
    assert(spark.sql(
      s"SELECT lsn_max FROM g16.ops.`t$$snapshots` " +
        "ORDER BY snapshot_id DESC LIMIT 1").head().getLong(0) == 4L)
  }
}
