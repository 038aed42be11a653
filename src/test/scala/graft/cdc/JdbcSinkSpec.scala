package graft.cdc

import graft.SparkTestBase
import graft.lake._
import org.apache.spark.sql.functions._

/** The warehouse DESTINATION surface (reference: batched Postgres upserts,
  * `sync/studies.py:35-41`; watermark table `queries/sync_records.py:7-19`)
  * against embedded Derby: lake state → JDBC upserts/deletes → read-back
  * equality, watermark-incremental beats, idempotent replay. */
/** Simulates JDBC drivers that return Statement.SUCCESS_NO_INFO (−2) for
  * batched statements (MySQL rewriteBatchedStatements, some Postgres modes):
  * the real batch executes, but per-row counts are withheld. Top-level class
  * so the foreachPartition closure serializes without capturing the spec. */
class NoInfoBatchSink(url: String, table: String, keyCols: Seq[String], batchSize: Int)
    extends JdbcUpsertSink(url, table, keyCols, batchSize = batchSize) {
  import java.lang.reflect.{InvocationHandler, Method, Proxy}
  override protected def connect(): java.sql.Connection = {
    val real = super.connect()
    def proxy[T](iface: Class[T], target: AnyRef, h: (Method, Array[AnyRef]) => AnyRef): T =
      Proxy.newProxyInstance(getClass.getClassLoader, Array(iface),
        new InvocationHandler {
          override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = h(m, args)
        }).asInstanceOf[T]
    def call(target: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
      if (args == null) m.invoke(target) else m.invoke(target, args: _*)
    proxy(classOf[java.sql.Connection], real, (m, args) => {
      val r = call(real, m, args)
      if (m.getName == "prepareStatement" && args != null &&
          args(0).asInstanceOf[String].startsWith("UPDATE")) {
        val ps = r.asInstanceOf[java.sql.PreparedStatement]
        proxy(classOf[java.sql.PreparedStatement], ps, (m2, a2) => {
          if (m2.getName == "executeBatch") {
            val n = ps.executeBatch().length
            Array.fill(n)(java.sql.Statement.SUCCESS_NO_INFO)
          } else call(ps, m2, a2)
        })
      } else r
    })
  }
}

class JdbcSinkSpec extends SparkTestBase {

  private def freshLake(): LakeTable =
    LakeTable.createOrReplace(spark, tmpDir("jstbl"), CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 8)

  private def readBack(url: String, table: String) =
    spark.read.jdbc(url, table, new java.util.Properties)
      .select("repo", "path", "commit", "lang", "content")
      .collect().map(_.toSeq).toSet

  private def lakeState(t: LakeTable) =
    t.currentState().select("repo", "path", "commit", "lang", "content")
      .collect().map(_.toSeq).toSet

  test("lake -> JDBC warehouse sync: round-trip equality, incremental beats, deletes, replay") {
    import spark.implicits._
    val url = "jdbc:derby:memory:jsink1;create=true"
    val t = freshLake()
    val sink = new JdbcUpsertSink(url, "code_files", ChangeEvent.keyCols.toSeq,
      batchSize = 7) // tiny pages: exercise multi-batch paging
    sink.ensureTable(CdcPipeline.baseTableSchema)
    sink.ensureTable(CdcPipeline.baseTableSchema) // idempotent

    // beat 1: initial inserts
    val b1 = (1 to 40).map(i =>
      (i.toLong, "I", s"r${i % 5}", s"p$i", s"c$i", "scala", s"v$i"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(b1, 0)
    assert(JdbcWarehouseSync.syncOnce(t, sink) == 40)
    assert(readBack(url, "code_files") == lakeState(t))
    assert(sink.watermark() == 40L)

    // idle beat: nothing new, nothing pushed
    assert(JdbcWarehouseSync.syncOnce(t, sink) == 0)

    // beat 2: updates + a delete — upsert must overwrite, delete must remove
    val b2 = Seq(
      (41L, "U", "r1", "p1", "c1", "scala", "v1-updated"),
      (42L, "D", "r2", "p2", "c2", "scala", null),
      (43L, "I", "r9", "p99", "c99", "go", "new"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(b2, 1)
    assert(JdbcWarehouseSync.syncOnce(t, sink) > 0)
    assert(readBack(url, "code_files") == lakeState(t))
    assert(!readBack(url, "code_files").exists(r =>
      r(0) == "r2" && r(1) == "p2" && r(2) == "c2"))

    // crashed-beat replay: reset the watermark (as if the beat died before
    // recording it) — re-pushing must converge to the identical state
    val wm = sink.watermark()
    sink.setWatermark(0L)
    JdbcWarehouseSync.syncOnce(t, sink)
    assert(sink.watermark() == wm)
    assert(readBack(url, "code_files") == lakeState(t))

    // beat 3 lands as a merge-on-read DELTA commit: manifest pruning picks
    // only the delta layer (its rows are true winners by the anti-stale
    // probe) and the sink still converges — update overwrites, delete lands
    val b3 = Seq(
      (51L, "U", "r1", "p1", "c1", "scala", "v1-mor"),
      (52L, "D", "r9", "p99", "c99", "go", null))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
    t.merge(b3, 2, delta = true)
    assert(JdbcWarehouseSync.syncOnce(t, sink) > 0)
    assert(readBack(url, "code_files") == lakeState(t))
    assert(!readBack(url, "code_files").exists(r =>
      r(0) == "r9" && r(1) == "p99"))
  }

  test("upsert survives drivers reporting SUCCESS_NO_INFO batch counts (no lost inserts)") {
    import spark.implicits._
    val url = "jdbc:derby:memory:jsink3;create=true"
    val sink = new NoInfoBatchSink(url, "noinfo_kv", Seq("k"), batchSize = 5)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType, true)))
    sink.ensureTable(schema)
    // all-new keys: with counts == −2 a count==0-only miss check would skip
    // phase-2 INSERT entirely and silently write NOTHING
    sink.upsert((1 to 17).map(i => (s"k$i", i.toLong)).toDF("k", "v"))
    val back = spark.read.jdbc(url, "noinfo_kv", new java.util.Properties)
    assert(back.count() == 17, "new keys lost under SUCCESS_NO_INFO")
    // mixed page: updates must apply AND the new key must be inserted
    sink.upsert(Seq(("k1", 100L), ("k18", 18L)).toDF("k", "v"))
    val m = back.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.size == 18 && m("k1") == 100L && m("k18") == 18L)
  }

  test("syncOnce detects a vacuum gap and full-resyncs instead of stranding deletes") {
    import spark.implicits._
    val url = "jdbc:derby:memory:jsink4;create=true"
    val t = freshLake()
    val sink = new JdbcUpsertSink(url, "gap_files", ChangeEvent.keyCols.toSeq, batchSize = 7)
    sink.ensureTable(CdcPipeline.baseTableSchema)
    t.merge(Seq(
      (1L, "I", "r1", "p1", "c1", "scala", "a"),
      (2L, "I", "r2", "p2", "c2", "scala", "b"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content"), 0)
    JdbcWarehouseSync.syncOnce(t, sink)
    assert(readBack(url, "gap_files") == lakeState(t))

    // the sink now lags: a delete lands AND its tombstone is vacuumed before
    // the next beat — the lsn-watermark path could never see the delete
    t.merge(Seq(
      (3L, "D", "r1", "p1", "c1", "scala", null),
      (4L, "I", "r3", "p3", "c3", "go", "c"))
      .toDF("lsn", "op", "repo", "path", "commit", "lang", "content"), 1)
    assert(t.vacuum() == 1L)
    assert(sink.watermark() < t.meta.vacuumLsn, "test premise: sink lags the vacuum")

    JdbcWarehouseSync.syncOnce(t, sink)
    val target = readBack(url, "gap_files")
    assert(target == lakeState(t), "full resync must converge the target")
    assert(!target.exists(_.head == "r1"), "vacuumed delete stranded in the warehouse")
    // next beat is incremental again
    assert(JdbcWarehouseSync.syncOnce(t, sink) == 0L)
  }

  test("upsert repartitions by key so concurrent tasks never race one key") {
    import spark.implicits._
    val url = "jdbc:derby:memory:jsink2;create=true"
    val sink = new JdbcUpsertSink(url, "kv", Seq("k"), batchSize = 3)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType, true)))
    sink.ensureTable(schema)
    // many partitions, few keys: without key-repartitioning two tasks would
    // both miss the UPDATE and double-INSERT the same PK
    val df = spark.range(200).select(
      concat(lit("k"), (col("id") % 4).cast("string")).as("k"), col("id").as("v"))
      .repartition(16)
    sink.upsert(df) // must not throw PK violations
    val back = spark.read.jdbc(url, "kv", new java.util.Properties)
    assert(back.count() == 4) // one row per key survived, LWW-arbitrary value
    // second upsert with a single value per key: deterministic final state
    sink.upsert(Seq(("k0", 100L), ("k1", 101L), ("k2", 102L), ("k3", 103L)).toDF("k", "v"))
    assert(back.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("k0" -> 100L, "k1" -> 101L, "k2" -> 102L, "k3" -> 103L))
  }
}
