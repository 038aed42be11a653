package graft.sql

import graft.SparkTestBase
import graft.lake._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Storage-partitioned joins over the declared bucket layout: two lake
  * tables bucketed the same way on a single-column key join on it with ZERO
  * exchanges — each task joins one bucket of both sides in place — and
  * keyed aggregation over one table is likewise shuffle-free. This is the
  * co-located fact-to-fact join path a 100 TB warehouse needs where
  * broadcast can't apply (both sides large); the documents/embeddings-style
  * id-keyed tables are exactly this shape. (Spark's SPJ supports only
  * single-reference transforms, so multi-column-key tables keep the normal
  * exchange — asserted below.) */
class SqlPartitionJoinSpec extends SparkTestBase {

  private def setupCatalog(name: String): LakeCatalog = {
    val wh = tmpDir("spjwh")
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    new LakeCatalog(spark, wh)
  }

  private val schemaA = StructType(Seq(
    StructField("doc_id", StringType), StructField("lang", StringType)))
  private val schemaB = StructType(Seq(
    StructField("doc_id", StringType), StructField("stars", IntegerType)))

  private def fill(t: LakeTable, n: Int, payload: Int => Seq[(String, Any)]): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two separate commits: several files per bucket, so split grouping
    // (many files, one bucket, one task) is exercised too
    Seq(0, 1).foreach { half =>
      val ids = (half * n / 2 until (half + 1) * n / 2).map(i => s"d$i")
      var df = ids.toDF("doc_id")
        .withColumn("lsn", lit(half.toLong)).withColumn("op", lit("I"))
      payload(half).foreach { case (name, v) => df = df.withColumn(name, lit(v)) }
      t.merge(df)
    }
  }

  /** Executed plan of a collected query (AQE-final). */
  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def withSmj[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1") // keep the small test tables off the broadcast path
    try body finally spark.conf.set(key, old)
  }

  test("co-bucketed tables join with zero exchanges; result matches a plain join") {
    val cat = setupCatalog("spj1")
    val a = cat.createTable("ns", "ta", schemaA, Seq("doc_id"), numBuckets = 8)
    val b = cat.createTable("ns", "tb", schemaB, Seq("doc_id"), numBuckets = 8)
    fill(a, 40, h => Seq("lang" -> s"l$h"))
    fill(b, 30, h => Seq("stars" -> h))

    withSmj {
      val q = spark.sql(
        """SELECT a.doc_id, a.lang, b.stars
          |FROM spj1.ns.ta a JOIN spj1.ns.tb b ON a.doc_id = b.doc_id
          |""".stripMargin)
      val plan = planOf(q)
      assert(!plan.contains("Exchange"), s"expected a storage-partitioned join, got:\n$plan")
      assert(q.count() == 30) // d0..d29 on both sides
      // same rows as the non-co-located join of the raw states
      val naive = a.currentState().as("a")
        .join(b.currentState().as("b"), Seq("doc_id"))
        .select("doc_id", "lang", "stars")
      assert(q.collect().map(_.toSeq).toSet == naive.collect().map(_.toSeq).toSet)
    }
  }

  test("GROUP BY the key column aggregates without a shuffle") {
    val cat = setupCatalog("spj2")
    val a = cat.createTable("ns", "ta", schemaA, Seq("doc_id"), numBuckets = 4)
    fill(a, 40, h => Seq("lang" -> s"l$h"))
    val q = spark.sql(
      "SELECT doc_id, count(*) AS c FROM spj2.ns.ta GROUP BY doc_id")
    val plan = planOf(q)
    assert(!plan.contains("Exchange"), s"expected bucket-clustered aggregation, got:\n$plan")
    assert(q.count() == 40)
  }

  test("mismatched bucket counts fall back to a shuffled join, still exact") {
    val cat = setupCatalog("spj3")
    val a = cat.createTable("ns", "ta", schemaA, Seq("doc_id"), numBuckets = 8)
    val b = cat.createTable("ns", "tb", schemaB, Seq("doc_id"), numBuckets = 3)
    fill(a, 24, h => Seq("lang" -> s"l$h"))
    fill(b, 24, h => Seq("stars" -> h))
    withSmj {
      val q = spark.sql(
        """SELECT a.doc_id, b.stars FROM spj3.ns.ta a
          |JOIN spj3.ns.tb b ON a.doc_id = b.doc_id""".stripMargin)
      val plan = planOf(q)
      assert(plan.contains("Exchange"), s"incompatible layouts must exchange:\n$plan")
      assert(q.count() == 24)
    }
  }

  test("multi-column keys keep the normal exchange (SPJ is single-reference only)") {
    val cat = setupCatalog("spj5")
    val s2 = StructType(Seq(
      StructField("repo", StringType), StructField("path", StringType),
      StructField("lang", StringType)))
    val a = cat.createTable("ns", "ta", s2, Seq("repo", "path"), numBuckets = 4)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    a.merge(Seq(("r1", "p1", "s"), ("r2", "p2", "t"), ("r1", "p3", "u"))
      .toDF("repo", "path", "lang")
      .withColumn("lsn", lit(1L)).withColumn("op", lit("I")))
    val q = spark.sql(
      "SELECT repo, path, count(*) AS c FROM spj5.ns.ta GROUP BY repo, path")
    assert(planOf(q).contains("Exchange")) // honest fallback, not a wrong claim
    assert(q.count() == 3)
  }

  test("time travel to a pre-rebucket snapshot does not claim the new layout") {
    val cat = setupCatalog("spj4")
    val a = cat.createTable("ns", "ta", schemaA, Seq("doc_id"), numBuckets = 3)
    val b = cat.createTable("ns", "tb", schemaB, Seq("doc_id"), numBuckets = 8)
    fill(a, 24, h => Seq("lang" -> s"l$h"))
    fill(b, 24, h => Seq("stars" -> h))
    val oldSnap = a.meta.currentSnapshotId
    a.rebucket(8) // same bucket count as b — but oldSnap's files are 3-bucketed
    withSmj {
      // current snapshots: both 8-bucketed now, co-located
      val cur = spark.sql(
        """SELECT a.doc_id, b.stars FROM spj4.ns.ta a
          |JOIN spj4.ns.tb b ON a.doc_id = b.doc_id""".stripMargin)
      assert(!planOf(cur).contains("Exchange"))
      assert(cur.count() == 24)
      // the 3-bucket-era snapshot must NOT report the 8-bucket layout:
      // claiming it would co-locate wrongly and silently drop matches
      val tt = spark.sql(
        s"""SELECT a.doc_id, b.stars FROM spj4.ns.ta VERSION AS OF $oldSnap a
           |JOIN spj4.ns.tb b ON a.doc_id = b.doc_id""".stripMargin)
      assert(planOf(tt).contains("Exchange"), "stale layout must not co-locate")
      assert(tt.count() == 24)
      // ... and key-equality file pruning must not hash with the NEW bucket
      // count against OLD-layout file numbers: every key must still be found
      // in the pre-rebucket snapshot (file pruning is exactness-bearing —
      // a wrongly pruned file silently loses the row)
      (0 until 24).foreach { i =>
        assert(spark.sql(
          s"SELECT * FROM spj4.ns.ta VERSION AS OF $oldSnap WHERE doc_id = 'd$i'")
          .count() == 1, s"key d$i lost to stale-layout bucket pruning")
      }
    }
  }
}
