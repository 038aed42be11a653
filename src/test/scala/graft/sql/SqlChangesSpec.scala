package graft.sql

import graft.SparkTestBase
import graft.cdc._
import graft.lake._
import org.apache.spark.sql.streaming.Trigger

/** The `t$changes` metadata table: batch + Structured-Streaming change feed
  * out of the lake (the "CDC out" surface; the exact join-based diff lives
  * in LakeTable.changes / LakeMaintenanceSpec). */
class SqlChangesSpec extends SparkTestBase {
  import spark.implicits._

  private def setupCatalog(name: String): LakeCatalog = {
    val wh = tmpDir("chwh")
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    new LakeCatalog(spark, wh)
  }

  private def batch(rows: (Long, String, String, String, String, String, String)*) =
    rows.toDF("lsn", "op", "repo", "path", "commit", "lang", "content")

  test("batch feed: bootstrap, snapshot range, upserts and deletes") {
    val cat = setupCatalog("ch1")
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    t.merge(batch(
      (1L, "I", "k1", "p", "c", "scala", "a"),
      (2L, "I", "k2", "p", "c", "scala", "b")), 0)
    val s1 = t.meta.currentSnapshotId
    t.merge(batch(
      (3L, "U", "k2", "p", "c", "scala", "b2"),
      (4L, "I", "k3", "p", "c", "scala", "c"),
      (5L, "D", "k1", "p", "c", "scala", null)), 1)

    def feed(opts: Map[String, String]) = {
      val r = spark.read
      opts.foreach { case (k, v) => r.option(k, v) }
      r.table("ch1.ns.`t$changes`").collect()
        .map(x => (x.getAs[String]("repo"), x.getAs[String]("_change_type"),
          x.getAs[Long]("_lsn"))).toSet
    }
    // incremental range: exactly epoch 1's changes, deletes carry the
    // tombstone's lsn
    assert(feed(Map("fromSnapshot" -> s1.toString)) ==
      Set(("k2", "upsert", 3L), ("k3", "upsert", 4L), ("k1", "delete", 5L)))
    // bootstrap (no options): every key's current winner — live rows as
    // upserts, the k1 tombstone as a delete
    assert(feed(Map.empty) ==
      Set(("k2", "upsert", 3L), ("k3", "upsert", 4L), ("k1", "delete", 5L)))
    // pinned upper bound reproduces the past range
    assert(feed(Map("toSnapshot" -> s1.toString)) ==
      Set(("k1", "upsert", 1L), ("k2", "upsert", 2L)))
    // SQL works too (suffix addressing needs backquotes)
    assert(spark.sql(
      "SELECT count(*) FROM ch1.ns.`t$changes` WHERE _change_type = 'delete'")
      .head().getLong(0) == 1)
  }

  test("floor inside a multi-row-group append file: lsn filter skips history, feed stays exact") {
    val cat = setupCatalog("ch9")
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 1)
    t.merge(batch((1L, "I", "seed", "p", "c", "scala", "s")), 0)
    val s1 = t.meta.currentSnapshotId
    // one big lsn-ordered append (many tiny row groups): a feed from s1 has
    // floor = 1, and the file's lsnMax > floor — the mixed-file row path
    // must emit EVERY row above the floor while the parquet lsn filter
    // group-skips none of them (and the pre-floor... nothing here is below)
    val hc = spark.sparkContext.hadoopConfiguration
    val (ob, op) = (hc.get("parquet.block.size"), hc.get("parquet.page.size"))
    hc.setInt("parquet.block.size", 4096); hc.setInt("parquet.page.size", 1024)
    try t.append(batch((2 to 2001).map(i =>
        (i.toLong, "I", s"r$i", "p", "c", "scala", "v" * 64)): _*)
      .select("repo", "path", "commit", "lang", "content", "lsn").coalesce(1))
    finally {
      if (ob != null) hc.set("parquet.block.size", ob) else hc.unset("parquet.block.size")
      if (op != null) hc.set("parquet.page.size", op) else hc.unset("parquet.page.size")
    }
    val s2 = t.meta.currentSnapshotId
    val mid = spark.read.option("fromSnapshot", s1.toString)
      .option("toSnapshot", s2.toString).table("ch9.ns.`t$changes`")
    assert(mid.count() == 2000L) // every appended row, none lost to the filter
    assert(mid.agg(org.apache.spark.sql.functions.min("_lsn")).head().getLong(0) == 2L)

    // the scenario the lsn group-skip exists for: an overlap-REDELIVERY
    // append (ST3) whose single lsn-ordered multi-group file STRADDLES the
    // feed's floor (2001) — groups wholly at-or-under the floor are
    // stats-skippable, the straddling group must survive, and the feed must
    // emit exactly the post-floor rows
    val (ob2, op2) = (hc.get("parquet.block.size"), hc.get("parquet.page.size"))
    hc.setInt("parquet.block.size", 4096); hc.setInt("parquet.page.size", 1024)
    try t.append(batch((1800 to 2801).map(i => // 1800..2001 redelivered
        (i.toLong, "I", s"r$i", "p", "c", "scala", "v" * 64)): _*)
      .select("repo", "path", "commit", "lang", "content", "lsn").coalesce(1))
    finally {
      if (ob2 != null) hc.set("parquet.block.size", ob2) else hc.unset("parquet.block.size")
      if (op2 != null) hc.set("parquet.page.size", op2) else hc.unset("parquet.page.size")
    }
    val tail = spark.read.option("fromSnapshot", s2.toString)
      .table("ch9.ns.`t$changes`")
    assert(tail.count() == 800L) // 2002..2801 — boundary group kept exactly
    assert(tail.agg(org.apache.spark.sql.functions.min("_lsn")).head().getLong(0) == 2002L)
    assert(tail.agg(org.apache.spark.sql.functions.max("_lsn")).head().getLong(0) == 2801L)
  }

  test("feed scan prunes columns and vectorizes tombstone-free reads") {
    val cat = setupCatalog("ch3")
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    t.merge(batch((1 to 30).map(i =>
      (i.toLong, "I", s"k$i", "p", "c", "scala", s"v$i")): _*), 0)

    // narrow tail: only (repo, _change_type) reach the readers — content,
    // the bulk of the bytes, is never materialized
    val q = spark.sql("SELECT repo, _change_type FROM ch3.ns.`t$changes`")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("cols=repo,_change_type"), s"feed scan not pruned:\n$plan")
    assert(!plan.contains("content"), s"content survived pruning:\n$plan")
    // insert-only files above the lsn floor have no per-row work left →
    // vectorized batches (constant "upsert" spliced in per batch)
    assert(plan.contains("ColumnarToRow"), s"tombstone-free feed not vectorized:\n$plan")
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      (1 to 30).map(i => (s"k$i", "upsert")).toSet)
    // full-width read vectorizes too, and _lsn comes from the file
    val all = spark.sql("SELECT repo, _lsn FROM ch3.ns.`t$changes`")
    assert(all.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(all.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      (1 to 30).map(i => (s"k$i", i.toLong)).toSet)

    // a delete writes tombstones into one file → whole-scan row fallback
    // (mixed row/columnar scans are rejected), results stay exact
    t.merge(batch((31L, "D", "k1", "p", "c", "scala", null)), 1)
    val q2 = spark.sql("SELECT repo, _change_type FROM ch3.ns.`t$changes`")
    assert(!q2.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(q2.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      ((2 to 30).map(i => (s"k$i", "upsert")).toSet + (("k1", "delete"))))
  }

  test("feed refuses a floor behind the vacuum high-water instead of dropping deletes") {
    val cat = setupCatalog("ch4")
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    t.merge(batch(
      (1L, "I", "k1", "p", "c", "scala", "a"),
      (2L, "I", "k2", "p", "c", "scala", "b")), 0)
    val s1 = t.meta.currentSnapshotId
    t.merge(batch((3L, "D", "k1", "p", "c", "scala", null)), 1)
    assert(t.vacuum() == 1L) // the tombstone this consumer never saw is gone

    // incremental read from the pre-delete snapshot can no longer observe
    // the delete — must error, not silently emit nothing
    val e = intercept[Exception] {
      spark.read.option("fromSnapshot", s1.toString)
        .table("ch4.ns.`t$changes`").collect()
    }
    assert(e.getMessage != null || e.getCause != null) // fails loudly
    // bootstrap read (full current image) stays available and correct
    val boot = spark.read.table("ch4.ns.`t$changes`").collect()
      .map(r => (r.getAs[String]("repo"), r.getAs[String]("_change_type"))).toSet
    assert(boot == Set(("k2", "upsert")))
  }

  test("streaming feed tails commits across restarts exactly once") {
    val cat = setupCatalog("ch2")
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    t.merge(batch((1L, "I", "k1", "p", "c", "scala", "a")), 0)
    val ckpt = tmpDir("chckpt")
    val out = tmpDir("chout")

    // a durable (recoverable) sink: each drain appends only what the
    // checkpointed offsets haven't seen — the cumulative parquet content is
    // the exactly-once evidence
    def drain(): Unit = {
      val q = spark.readStream
        .option("startingSnapshot", "0") // bootstrap, then tail
        .table("ch2.ns.`t$changes`")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .outputMode("append")
        .start()
      q.awaitTermination()
    }
    def emitted: Set[(String, String, Long)] = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("repo"), r.getAs[String]("_change_type"),
        r.getAs[Long]("_lsn"))).toSet

    drain()
    assert(emitted == Set(("k1", "upsert", 1L)))

    // a commit while the stream is down; the restart drains exactly it
    t.merge(batch((2L, "U", "k1", "p", "c", "scala", "a2")), 1)
    drain()
    assert(emitted == Set(("k1", "upsert", 1L), ("k1", "upsert", 2L)))

    // TWO commits while down: the catch-up batch spans the snapshot range
    // and its diff is NET — the mid-range upsert (lsn 3) is superseded by
    // the tombstone (lsn 4) within the range, so only the delete emits
    t.merge(batch((3L, "U", "k1", "p", "c", "scala", "a3")), 2)
    t.merge(batch((4L, "D", "k1", "p", "c", "scala", null)), 3)
    drain()
    assert(emitted == Set(("k1", "upsert", 1L), ("k1", "upsert", 2L),
      ("k1", "delete", 4L)))

    // nothing new: another restart emits nothing (offsets already caught up)
    drain()
    assert(emitted.size == 3)
  }

  test("vacuum guard fires only for ranges spanning the vacuum; pinned history keeps working") {
    val cat = setupCatalog("ch7")
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    t.merge(batch((1L, "I", "k1", "p", "c", "scala", "a")), 0)
    val s1 = t.meta.currentSnapshotId
    t.merge(batch(
      (2L, "I", "k2", "p", "c", "scala", "b"),
      (3L, "D", "k1", "p", "c", "scala", null)), 1)
    val s2 = t.meta.currentSnapshotId
    t.merge(batch((4L, "I", "k3", "p", "c", "scala", "c")), 2)
    val s3 = t.meta.currentSnapshotId
    assert(t.vacuum() == 1L) // drops k1's tombstone in a NEW snapshot

    // a pinned historical range BEFORE the vacuum commit: its added files
    // still physically carry their tombstones — the audit read must work
    val hist = spark.read.option("fromSnapshot", s1.toString)
      .option("toSnapshot", s2.toString)
      .table("ch7.ns.`t$changes`").collect()
      .map(r => (r.getAs[String]("repo"), r.getAs[String]("_change_type"))).toSet
    assert(hist == Set(("k2", "upsert"), ("k1", "delete")))

    // a range SPANNING the vacuum with a floor below it: deletes in the gap
    // are physically gone — must error, not silently under-report
    val e = intercept[Exception] {
      spark.read.option("fromSnapshot", s1.toString)
        .table("ch7.ns.`t$changes`").collect()
    }
    assert(e.getMessage.contains("vacuumed") ||
      (e.getCause != null && e.getCause.getMessage.contains("vacuumed")))

    // a range entirely AFTER the floor-relevant deletes (floor ≥ vacuumLsn):
    // fine even though it spans the vacuum snapshot
    val tail = spark.read.option("fromSnapshot", s3.toString)
      .table("ch7.ns.`t$changes`").collect()
    assert(tail.isEmpty) // vacuum itself adds no logical changes

    // a LATER vacuum must not retro-fail a pinned range that spans only the
    // OLD one: each in-range vacuum is judged by ITS OWN dropped high-water
    // (Snapshot.vacuumHw), not the table-current vacuumLsn
    t.merge(batch(
      (5L, "I", "k4", "p", "c", "scala", "d"),
      (6L, "D", "k2", "p", "c", "scala", null)), 3)
    val s4 = t.meta.currentSnapshotId
    assert(t.vacuum() == 1L) // drops k2's tombstone: table vacuumLsn → 6
    val pinned = spark.read.option("fromSnapshot", s3.toString)
      .option("toSnapshot", s4.toString)
      .table("ch7.ns.`t$changes`").collect()
      .map(r => (r.getAs[String]("repo"), r.getAs[String]("_change_type"))).toSet
    assert(pinned == Set(("k4", "upsert"), ("k2", "delete")),
      "later vacuum spuriously failed (or corrupted) a pinned exact range")
  }

  test("feed restart after expire_snapshots fails loudly, never silently mis-reads") {
    val cat = setupCatalog("ch6")
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    val ckpt = tmpDir("expckpt")
    val out = tmpDir("expout")
    def drain(): Unit = {
      val q = spark.readStream.option("startingSnapshot", "0")
        .table("ch6.ns.`t$changes`")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", out).outputMode("append").start()
      q.awaitTermination()
    }
    t.merge(batch((1L, "I", "k1", "p", "c", "scala", "a")), 0)
    drain() // checkpoint now holds this snapshot as its offset

    // retention trims the stream's offset snapshot out of metadata while
    // the consumer is down; the restart must error (re-bootstrap required),
    // not silently emit a wrong diff against a missing base
    t.merge(batch((2L, "U", "k1", "p", "c", "scala", "a2")), 1)
    t.merge(batch((3L, "I", "k2", "p", "c", "scala", "b")), 2)
    assert(t.expireSnapshots(keepLast = 1) >= 0)
    val e = intercept[Exception](drain())
    def messages(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ messages(x.getCause)
    assert(messages(e).exists(_.contains("no longer in metadata")),
      s"expected loud expiry error, got: ${messages(e).mkString(" | ")}")
  }

  test("SQL streaming cascade: a$changes -> filter -> b$cdc propagates upserts AND deletes") {
    import org.apache.spark.sql.functions.col
    val cat = setupCatalog("ch5")
    val a = cat.createTable("ns", "a", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    val b = cat.createTable("ns", "b", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 2)
    val ckpt = tmpDir("cascckpt")

    // the derived table is maintained ENTIRELY through the SQL streaming
    // surface: tail a's feed, transform, apply into b with source lsns
    def drain(): Unit = {
      val q = spark.readStream
        .option("startingSnapshot", "0")
        .table("ch5.ns.`a$changes`")
        .filter(col("lang") === "scala") // the cascade's transform
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("ch5.ns.`b$cdc`")
      q.awaitTermination()
    }
    def bState: Set[(String, String)] =
      spark.sql("SELECT repo, content FROM ch5.ns.b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet

    a.merge(batch(
      (1L, "I", "k1", "p", "c", "scala", "a1"),
      (2L, "I", "k2", "p", "c", "py", "b1")), 0) // k2 filtered out
    drain()
    assert(bState == Set(("k1", "a1")))

    // update + a new key while the cascade is down; restart catches up
    a.merge(batch((3L, "U", "k1", "p", "c", "scala", "a2")), 1)
    a.merge(batch((4L, "I", "k3", "p", "c", "scala", "c1")), 2)
    drain()
    assert(bState == Set(("k1", "a2"), ("k3", "c1")))

    // DELETE propagates (the reason $cdc exists: plain toTable can only
    // upsert); the catch-up batch nets upsert(5) ⊂ delete(6) for k3 via LWW
    a.merge(batch((5L, "U", "k3", "p", "c", "scala", "c2")), 3)
    a.merge(batch((6L, "D", "k3", "p", "c", "scala", null)), 4)
    drain()
    assert(bState == Set(("k1", "a2")))

    // b carries a's SOURCE lsns: replay-idempotent and feed-composable
    assert(b.read().filter(col("repo") === "k1")
      .select(LakeTable.LsnCol).head().getLong(0) == 3L)

    // drained restart: no new commits on b
    val snap = b.meta.currentSnapshotId
    drain()
    assert(b.meta.currentSnapshotId == snap)

    // mis-wired pipelines fail at plan time, not by silently nulling fields
    val e = intercept[Exception] {
      spark.readStream.option("startingSnapshot", "0")
        .table("ch5.ns.`a$changes`")
        .drop("content") // missing data column
        .writeStream.option("checkpointLocation", tmpDir("cascbad"))
        .trigger(Trigger.AvailableNow())
        .toTable("ch5.ns.`b$cdc`")
        .awaitTermination()
    }
    assert(e.getMessage.contains("missing") || e.getCause != null)
  }

  test("maxFilesPerTrigger paces a backlog into bounded micro-batches, exactly once") {
    val cat = setupCatalog("ch8")
    val t = cat.createTable("ns", "t", CdcPipeline.baseTableSchema,
      Seq("repo", "path", "commit"), numBuckets = 4)
    // 5 commits = a 5-snapshot backlog, each adding a handful of files
    (0 until 5).foreach { i =>
      t.merge(batch(
        (i * 2 + 1L, "I", s"k${i * 2}", "p", "c", "scala", s"v$i"),
        (i * 2 + 2L, "I", s"k${i * 2 + 1}", "p", "c", "scala", s"v$i")), i)
    }

    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q0 = spark.readStream
      .option("startingSnapshot", "0") // full backlog: bootstrap + tail
      .option("maxFilesPerTrigger", "3")
      .table("ch8.ns.`t$changes`")
      .writeStream
      .option("checkpointLocation", tmpDir("chrate"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches += ((id, df.count())); ()
      }
      .start()
    q0.awaitTermination()

    // the backlog split into several batches instead of one unbounded one,
    // and nothing was lost or duplicated across the splits
    assert(batches.size > 1, s"expected a paced catch-up, got $batches")
    assert(batches.map(_._2).sum == 10, s"exactly-once across batches: $batches")
    // without the option the same backlog drains in one batch
    val one = scala.collection.mutable.ArrayBuffer.empty[Long]
    spark.readStream.option("startingSnapshot", "0")
      .table("ch8.ns.`t$changes`")
      .writeStream
      .option("checkpointLocation", tmpDir("chrate1"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        one += df.count(); ()
      }
      .start().awaitTermination()
    assert(one.toSeq == Seq(10))
  }
}
