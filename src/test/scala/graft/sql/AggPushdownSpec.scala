package graft.sql

import graft.SparkTestBase
import graft.lake._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Manifest-answered aggregates: `COUNT(*)` / `COUNT(key)` / `MIN` / `MAX`
  * over a tombstone-free selection push down to a metadata lookup — zero
  * data files read (`GraftManifestAggScan` in the plan). Any condition that
  * could make the manifest answer inexact — tombstones, a residual WHERE,
  * untrusted or missing stats, non-reversible types — falls back to the
  * normal scan, and the result is identical either way. */
class AggPushdownSpec extends SparkTestBase {
  import spark.implicits._

  private def setupCatalog(name: String): LakeCatalog = {
    val wh = tmpDir("aggwh")
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    new LakeCatalog(spark, wh)
  }

  private def pushed(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("GraftManifestAggScan")

  test("count/min/max answer from the manifest; mutations and filters fall back exactly") {
    val cat = setupCatalog("agg1")
    val t = cat.createTable("ns", "t", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("lang", StringType), StructField("score", DoubleType))),
      Seq("id"), numBuckets = 4)
    import org.apache.spark.sql.functions._
    t.merge((1L to 100L).toDF("id")
      .withColumn("lang", concat(lit("l"), col("id") % 7))
      .withColumn("score", col("id") * lit(1.5))
      .withColumn("lsn", col("id")).withColumn("op", lit("I")))

    val q1 = spark.sql("SELECT count(*) AS n, min(id) AS lo, max(id) AS hi, " +
      "min(lang) AS ls, max(lang) AS hs, count(id) AS nk FROM agg1.ns.t")
    assert(pushed(q1), s"expected manifest answer:\n${q1.queryExecution.executedPlan}")
    assert(q1.collect().head.toSeq == Seq(100L, 1L, 100L, "l0", "l6", 100L))

    // double MIN/MAX is not round-trip-safe from rendered stats → scan path
    val qd = spark.sql("SELECT max(score) AS m FROM agg1.ns.t")
    assert(!pushed(qd))
    assert(qd.collect().head.getDouble(0) == 150.0)

    // COUNT(col) on a nullable non-key column cannot use rowCount → scan
    val qn = spark.sql("SELECT count(lang) AS m FROM agg1.ns.t")
    assert(!pushed(qn))
    assert(qn.collect().head.getLong(0) == 100L)

    // a WHERE leaves a residual filter → never pushed, still exact
    val qf = spark.sql("SELECT count(*) AS n FROM agg1.ns.t WHERE id > 40")
    assert(!pushed(qf))
    assert(qf.collect().head.getLong(0) == 60L)

    // GROUP BY is not a metadata shape
    val qg = spark.sql("SELECT lang, count(*) FROM agg1.ns.t GROUP BY lang")
    assert(!pushed(qg) && qg.count() == 7)

    // the pre-delete snapshot stays manifest-answerable (time travel)
    val preDelete = t.meta.currentSnapshotId
    spark.sql("DELETE FROM agg1.ns.t WHERE id <= 10")
    val qtt = spark.sql(
      s"SELECT count(*) AS n, max(id) AS hi FROM agg1.ns.t VERSION AS OF $preDelete")
    assert(pushed(qtt))
    assert(qtt.collect().head.toSeq == Seq(100L, 100L))

    // tombstones poison both rowCount and key bounds → live read falls back
    val qdel = spark.sql("SELECT count(*) AS n, min(id) AS lo FROM agg1.ns.t")
    assert(!pushed(qdel))
    assert(qdel.collect().head.toSeq == Seq(90L, 11L))

    // vacuum physically drops the tombstones → manifest answers again
    t.vacuum()
    val qv = spark.sql("SELECT count(*) AS n, min(id) AS lo FROM agg1.ns.t")
    assert(pushed(qv))
    assert(qv.collect().head.toSeq == Seq(90L, 11L))
  }

  test("empty table answers count 0 and NULL bounds from metadata") {
    val cat = setupCatalog("agg2")
    cat.createTable("ns", "e", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))), Seq("id"), numBuckets = 2)
    val q = spark.sql("SELECT count(*) AS n, max(id) AS hi, min(v) AS lo FROM agg2.ns.e")
    assert(pushed(q))
    val r = q.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }
}
