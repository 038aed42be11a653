package graft.lake

import graft.SparkTestBase
import graft.cdc._

/** Declared row constraints (NOT NULL / CHECK): validated at add time,
  * enforced loudly on direct writes, dead-lettered by the pipeline. */
class ConstraintsSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(): LakeTable =
    LakeTable.createOrReplace(spark, tmpDir("cons"), CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)

  private def batch(rows: (Long, String, String, String, String, String, String)*) =
    rows.toDF("lsn", "op", "repo", "path", "commit", "lang", "content")

  test("add-time validation: a constraint cannot be born violated; typos fail") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", ""),
      (2L, "I", "r2", "p", "c", "scala", "ok")), 0)
    val e = intercept[IllegalArgumentException](
      t.addConstraint("content_nonempty", "check", "length(content) > 0"))
    assert(e.getMessage.contains("1 existing live row"))
    intercept[Exception](t.addConstraint("bad", "check", "no_such_col > 0"))
    intercept[IllegalArgumentException](t.addConstraint("bad", "not_null", "no_such_col"))
    intercept[IllegalArgumentException](t.addConstraint("bad", "check", "length(content)")) // not boolean
    assert(t.meta.constraints.isEmpty)
  }

  test("direct merge/append/replace fail loudly on violations; deletes are exempt") {
    val t = freshTable()
    t.merge(batch((1L, "I", "r1", "p", "c", "scala", "ok")), 0)
    t.addConstraint("lang_not_null", "not_null", "lang")
    t.addConstraint("content_nonempty", "check", "length(content) > 0")

    val e = intercept[IllegalStateException](t.merge(batch(
      (2L, "I", "r2", "p", "c", null, "ok2"),
      (3L, "I", "r3", "p", "c", "scala", "")), 1))
    assert(e.getMessage.contains("lang_not_null=1") &&
      e.getMessage.contains("content_nonempty=1"), e.getMessage)
    // nothing committed
    assert(t.currentState().count() == 1)

    // a delete whose payload is null/empty must pass (tombstones are not rows)
    t.merge(batch((4L, "D", "r1", "p", "c", null, null)), 2)
    assert(t.currentState().count() == 0)

    // valid rows flow; ANSI CHECK: a NULL check result passes
    t.merge(batch((5L, "I", "r5", "p", "c", "scala", "ok5")), 3)
    assert(t.currentState().count() == 1)
    t.addConstraint("null_passes", "check",
      "CASE WHEN content = 'never' THEN NULL ELSE length(content) > 0 END")
    t.merge(batch((6L, "U", "r5", "p", "c", "scala", "ok6")), 4)
    assert(t.currentState().select("content").head().getString(0) == "ok6")

    intercept[IllegalStateException](
      t.append(batch((7L, "I", "r7", "p", "c", null, "x")).drop("op")))

    // drop → the same rows are accepted again
    assert(t.dropConstraint("lang_not_null"))
    assert(!t.dropConstraint("lang_not_null"))
    t.merge(batch((8L, "I", "r8", "p", "c", null, "ok8")), 5)
    assert(t.currentState().count() == 2)
  }

  test("pipeline dead-letters constraint violations with reason, clean rows merge") {
    val dir = tmpDir("conspipe")
    val t = LakeTable.create(spark, s"$dir/t", CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    t.addConstraint("content_nonempty", "check", "length(content) > 0")
    val log = batch(
      (1L, "I", "r1", "p", "c", "scala", "good"),
      (2L, "I", "r2", "p", "c", "scala", ""), // violates
      (3L, "I", "r3", "p", "c", "scala", "also good"),
      (4L, "D", "r9", "p", "c", "scala", null)) // delete exempt
      .withColumn("txn_ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.lit("2024-01-01 00:00:00")))
      .withColumn("schema_version", org.apache.spark.sql.functions.lit(1))
    CdcPipeline.processBatch(log, epochId = 0, t, Map.empty,
      new TableVersions, lineageDir = None,
      quarantineDir = Some(s"$dir/q"))
    assert(t.currentState().count() == 2) // good rows merged, violation absent
    val q = spark.read.parquet(s"$dir/q/epoch=0")
    assert(q.count() == 1)
    assert(q.select("q_reason").head().getString(0) == "constraint:content_nonempty")
    assert(q.select("repo").head().getString(0) == "r2")
  }

  test("SQL surface: add_constraint/drop_constraint procedures, INSERT enforcement, properties") {
    val wh = tmpDir("conswh")
    spark.conf.set("spark.sql.catalog.ccat", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ccat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ccat.ns")
    spark.sql("CREATE TABLE ccat.ns.t (k STRING, v INT) " +
      "TBLPROPERTIES ('keys'='k', 'buckets'='2')")
    spark.sql("CALL ccat.system.add_constraint(table => 'ns.t', " +
      "name => 'v_positive', expr => 'v > 0')")
    spark.sql("INSERT INTO ccat.ns.t VALUES ('a', 1)")
    val e = intercept[Exception](
      spark.sql("INSERT INTO ccat.ns.t VALUES ('b', -5)"))
    assert(e.getMessage.contains("v_positive") ||
      Option(e.getCause).exists(_.getMessage.contains("v_positive")), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM ccat.ns.t").head().getLong(0) == 1)
    val props = spark.sql("SHOW TBLPROPERTIES ccat.ns.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("constraints") == "v_positive:check(v > 0)")
    assert(spark.sql(
      "CALL ccat.system.drop_constraint(table => 'ns.t', name => 'v_positive')")
      .head().getBoolean(0))
    spark.sql("INSERT INTO ccat.ns.t VALUES ('b', -5)")
    assert(spark.sql("SELECT count(*) FROM ccat.ns.t").head().getLong(0) == 2)
  }
}
