package graft.sql

import graft.SparkTestBase
import graft.lake._
import org.apache.spark.sql.types._

/** `t$snapshots` / `t$files` introspection tables: commit history and the
  * current manifest served straight from table metadata on the driver —
  * the plan must be a LocalTableScan (zero parquet reads, zero tasks),
  * because on a 100 TB table "how many small files per bucket" must not
  * cost a scan. */
class MetaTablesSpec extends SparkTestBase {
  import spark.implicits._

  test("$snapshots and $files answer from metadata; suffixes are reserved") {
    val wh = tmpDir("metawh")
    spark.conf.set("spark.sql.catalog.meta1", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.meta1.warehouse", wh)
    val cat = new LakeCatalog(spark, wh)
    val t = cat.createTable("ns", "t", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType))), Seq("id"), numBuckets = 4)
    import org.apache.spark.sql.functions._
    t.merge((1L to 50L).toDF("id").withColumn("v", concat(lit("x"), $"id"))
      .withColumn("lsn", $"id").withColumn("op", lit("I")))
    t.merge(Seq((7L, "y7", 100L, "I"), (8L, null: String, 101L, "D"))
      .toDF("id", "v", "lsn", "op"))

    val snaps = spark.sql(
      "SELECT * FROM meta1.ns.`t$snapshots` ORDER BY snapshot_id")
    assert(snaps.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      s"expected metadata-only plan:\n${snaps.queryExecution.executedPlan}")
    val sRows = snaps.collect()
    assert(sRows.map(_.getAs[String]("operation")).count(_ == "merge") == 2)
    val last = sRows.last
    assert(last.getAs[Long]("total_rows") == 50L) // 49 live + 1 tombstone for key 8
    assert(last.getAs[Long]("lsn_max") == 101L)
    assert(last.getAs[Int]("added_files") > 0)
    assert(last.getAs[Long]("parent_id") == sRows(sRows.length - 2).getAs[Long]("snapshot_id"))
    // every snapshot points at its content-addressed manifest; distinct file
    // sets mean distinct manifests
    assert(sRows.forall(_.getAs[String]("manifest_file").startsWith("m-")))
    assert(sRows.map(_.getAs[String]("manifest_file")).distinct.length == sRows.length)

    val files = spark.sql("SELECT * FROM meta1.ns.`t$files`")
    assert(files.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val fRows = files.collect()
    assert(fRows.map(_.getAs[Long]("row_count")).sum == 50L)
    assert(fRows.map(_.getAs[Int]("bucket")).toSet.subsetOf((0 until 4).toSet))
    assert(fRows.exists(_.getAs[Boolean]("has_tombstones")))
    assert(fRows.forall(_.getAs[Long]("size_bytes") > 0L))
    // stats maps are keyed by column NAME (ids resolved via the file's schema)
    val mins = fRows.map(_.getAs[Map[String, String]]("col_mins"))
    assert(mins.forall(m => m.keySet.subsetOf(Set("id", "v"))), mins.toSeq)
    assert(mins.flatMap(_.get("id")).map(_.toLong).min == 1L)

    // layout-health query: small-file count per bucket, still metadata-only
    val health = spark.sql("SELECT bucket, count(*) AS files, sum(row_count) AS rows " +
      "FROM meta1.ns.`t$files` GROUP BY bucket")
    assert(health.collect().map(_.getAs[Long]("rows")).sum == 50L)

    // reserved: CREATE with the suffix is rejected; VERSION AS OF is rejected
    intercept[Exception] {
      spark.sql("CREATE TABLE meta1.ns.`x$files` (id BIGINT) ")
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM meta1.ns.`t$snapshots` VERSION AS OF 1").collect()
    }
  }
}
