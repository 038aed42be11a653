package graft.sql

import graft.SparkTestBase
import graft.cdc._
import graft.lake._
import org.apache.spark.sql.functions._

/** The SQL surface over merge-on-read tables: layered buckets read through
  * the per-bucket merge reader (LWW-resolved, stale values can never
  * resurface through file/row-group pruning), manifest aggregate pushdown
  * bails (raw rowCounts over-count superseded rows), bucket-clustered
  * GROUP BY stays exchange-free, the `$changes` feed stays exact, and
  * maintenance (fold) is CALL-able. */
class SqlMorSpec extends SparkTestBase {
  import spark.implicits._

  private def setupCatalog(name: String): LakeCatalog = {
    val wh = tmpDir("morwh")
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    new LakeCatalog(spark, wh)
  }

  private def batch(rows: (Long, String, String, String, String, String, String)*) =
    rows.toDF("lsn", "op", "repo", "path", "commit", "lang", "content")

  private def layeredTable(cat: LakeCatalog, ns: String): LakeTable = {
    val t = cat.createTable(ns, "files", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    t.merge(batch((1 to 30).map(i =>
      (i.toLong, "I", s"r${i % 6}", s"p$i", s"c$i", "scala", s"v$i")): _*), 0)
    t.merge(batch(
      (31L, "U", "r1", "p1", "c1", "scala", "updated"),
      (32L, "D", "r2", "p2", "c2", "scala", null),
      (33L, "I", "rX", "pX", "cX", "py", "new")), 1, delta = true)
    t
  }

  test("SQL reads a layered table exactly; point lookups and stale values stay correct") {
    val cat = setupCatalog("mor1")
    val t = layeredTable(cat, "nsa")
    val sql = spark.sql("SELECT repo, path, commit, lang, content FROM mor1.nsa.files")
      .collect().map(_.toSeq).toSet
    val api = t.currentState().select("repo", "path", "commit", "lang", "content")
      .collect().map(_.toSeq).toSet
    assert(sql == api && sql.size == 30) // 30 inserts +1 new -1 delete
    // the superseded pre-image must be unreachable — if pruning dropped the
    // delta layer (content='updated' excludes 'v1') while keeping the base
    // file, the stale row would leak back
    assert(spark.sql(
      "SELECT count(*) FROM mor1.nsa.files WHERE content = 'v1'").head().getLong(0) == 0)
    assert(spark.sql(
      "SELECT content FROM mor1.nsa.files WHERE repo='r1' AND path='p1' AND commit='c1'")
      .as[String].collect().toSeq == Seq("updated"))
    // the tombstoned key is gone through SQL too
    assert(spark.sql(
      "SELECT count(*) FROM mor1.nsa.files WHERE repo='r2' AND path='p2'").head().getLong(0) == 0)
    // aggregates are exact: the manifest COUNT shortcut must bail on delta
    // files (raw rowCount = 34 here; the true live count is 30)
    assert(spark.sql("SELECT count(*) FROM mor1.nsa.files").head().getLong(0) == 30)
  }

  test("bucket-clustered GROUP BY stays exchange-free over merge partitions") {
    val cat = setupCatalog("mor2")
    val t = cat.createTable("nsb", "km", CdcPipeline.baseTableSchema,
      Seq("repo"), numBuckets = 4)
    t.merge(batch((1 to 12).map(i =>
      (i.toLong, "I", s"r$i", s"p$i", s"c$i", "scala", s"v$i")): _*), 0)
    t.merge(batch((13L, "U", "r1", "pZ", "cZ", "scala", "v1b")), 1, delta = true)
    val q = spark.sql("SELECT repo, count(*) AS n FROM mor2.nsb.km GROUP BY repo")
    assert(q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .forall(_._2 == 1L))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket layout must still serve the aggregation clustering:\n$plan")
  }

  test("$files exposes is_delta; CALL fold_deltas retires the layers through SQL") {
    val cat = setupCatalog("mor3")
    val t = layeredTable(cat, "nsc")
    val flagged = spark.sql(
      "SELECT count(*) FROM mor3.nsc.`files$files` WHERE is_delta").head().getLong(0)
    assert(flagged >= 1)
    val pre = spark.sql("SELECT * FROM mor3.nsc.files").collect().map(_.toSeq).toSet
    val folded = spark.sql("CALL mor3.system.fold_deltas(table => 'nsc.files')")
      .head().getInt(0)
    assert(folded >= 1)
    assert(spark.sql(
      "SELECT count(*) FROM mor3.nsc.`files$files` WHERE is_delta").head().getLong(0) == 0)
    assert(spark.sql("SELECT * FROM mor3.nsc.files").collect().map(_.toSeq).toSet == pre)
    // post-fold the manifest COUNT shortcut may serve again — and must be 30
    assert(spark.sql("SELECT count(*) FROM mor3.nsc.files").head().getLong(0) == 30)
    assert(t.currentState().count() == 30)
  }

  test("$changes floor feed emits exactly the delta commits' changes") {
    val cat = setupCatalog("mor4")
    val t = layeredTable(cat, "nsd")
    // snapshot after the base merge = the feed floor
    val baseSnap = t.meta.snapshots.find(_.operation == "merge").get.snapshotId
    val feed = spark.read
      .option("fromSnapshot", baseSnap.toString)
      .table("mor4.nsd.`files$changes`")
      .select("repo", "path", "commit", "content", "_change_type", "_lsn")
      .collect().map(_.toSeq).toSet
    assert(feed == Set(
      Seq("r1", "p1", "c1", "updated", "upsert", 31L),
      Seq("r2", "p2", "c2", null, "delete", 32L),
      Seq("rX", "pX", "cX", "new", "upsert", 33L)))
  }

  test("$changes bootstrap over a layered table serves the merged image, one event per key") {
    val cat = setupCatalog("mor5")
    val t = layeredTable(cat, "nse")
    // no fromSnapshot → bootstrap: buckets carrying delta layers must be
    // LWW-resolved before serving, or a superseded base row would emit as a
    // second upsert next to its replacement, and the deleted key's masked
    // pre-image would emit next to its delete
    val feed = spark.read.table("mor5.nse.`files$changes`")
      .select("repo", "path", "commit", "content", "_change_type")
      .collect().map(_.toSeq)
    val perKey = feed.groupBy(r => (r(0), r(1), r(2))).view.mapValues(_.size)
    assert(perKey.values.forall(_ == 1),
      s"bootstrap emitted a key more than once: ${perKey.filter(_._2 > 1)}")
    val m = feed.map(r => (r(0), r(1), r(2)) -> ((r(3), r(4)))).toMap
    assert(m(("r1", "p1", "c1")) == (("updated", "upsert"))) // post-image, not v1
    assert(m(("r2", "p2", "c2")) == ((null, "delete")))
    assert(m(("rX", "pX", "cX")) == (("new", "upsert")))
    assert(feed.length == 31) // 28 untouched upserts + 1 updated + 1 new + 1 delete
    // the upsert set IS the live table
    val upserts = feed.filter(_(4) == "upsert").map(_.take(4)).toSet
    val live = t.currentState().select("repo", "path", "commit", "content")
      .collect().map(_.toSeq).toSet
    assert(upserts == live)
    // column pruning through the merge partitions: a narrow projection still
    // resolves on the full key + lsn internally but serves only what's asked
    val narrow = spark.read.table("mor5.nse.`files$changes`")
      .select("content", "_change_type").collect().map(_.toSeq).toSet
    assert(narrow.contains(Seq("updated", "upsert")) &&
      !narrow.exists(_.head == "v1"))
  }

  test("streaming bootstrap over a layered table serves the merged image, then tails deltas raw") {
    import org.apache.spark.sql.streaming.Trigger
    val cat = setupCatalog("mor6")
    val t = layeredTable(cat, "nsf")
    val ckpt = tmpDir("morckpt")
    val out = tmpDir("morout")
    def drain(): Unit = {
      val q = spark.readStream
        .option("startingSnapshot", "0")
        .table("mor6.nsf.`files$changes`")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", out).outputMode("append").start()
      q.awaitTermination()
    }
    def emitted = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("repo"), r.getAs[String]("path"),
        r.getAs[String]("content"), r.getAs[String]("_change_type"))).toSeq
    drain()
    // the bootstrap micro-batch must already be merged: one event per key,
    // the updated key's post-image only, the tombstoned key as a delete
    val first = emitted
    assert(first.length == 31 &&
      first.groupBy(e => (e._1, e._2)).values.forall(_.size == 1))
    assert(first.contains(("r1", "p1", "updated", "upsert")) &&
      first.contains(("r2", "p2", null, "delete")) &&
      !first.exists(_._3 == "v1"))
    // a delta commit while the stream is down: the incremental batch serves
    // the delta rows raw (true changes by the anti-stale probe), exactly once
    t.merge(batch((40L, "U", "rX", "pX", "cX", "py", "new-2")), 2, delta = true)
    drain()
    assert(emitted.length == 32 &&
      emitted.contains(("rX", "pX", "new-2", "upsert")))
  }
}
