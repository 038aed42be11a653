package graft.sql

import graft.SparkTestBase

/** SQL-declared maintained views: CALL create_view / refresh_views /
  * drop_view, materializing as SELECTable lake tables in the base table's
  * namespace (definition persisted in the base table's metadata). */
class SqlViewsSpec extends SparkTestBase {

  private def setupCatalog(name: String): String = {
    val wh = tmpDir("sqlvwh")
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  test("SQL-only lifecycle: create_view, refresh_views, SELECT, incremental semantics per kind") {
    setupCatalog("g19")
    spark.sql("CREATE NAMESPACE g19.org")
    spark.sql("CREATE TABLE g19.org.files (repo STRING, path STRING, " +
      "commit STRING, lang STRING, size BIGINT) " +
      "TBLPROPERTIES ('keys'='repo,path,commit','buckets'='4')")
    spark.sql("INSERT INTO g19.org.files VALUES " +
      "('r1','p1','c','scala',10),('r2','p2','c','scala',20),('r3','p3','c','py',30)")

    spark.sql("CALL g19.system.create_view(table => 'org.files', " +
      "view => 'lang_stats', group_by => 'lang', agg_by => 'size:total_size')")
    spark.sql("CALL g19.system.create_view(table => 'org.files', " +
      "view => 'lang_repos', group_by => 'lang', kind => 'distinct_sketch', " +
      "agg_by => 'repo:repos')")

    // declared views (and the table's operational facts) surface through
    // plain SHOW TBLPROPERTIES — no Scala API needed to inspect a table
    val props = spark.sql("SHOW TBLPROPERTIES g19.org.files")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("keys") == "repo,path,commit" && props("buckets") == "4")
    assert(props("maintained-views") ==
      "lang_stats(rollup),lang_repos(distinct_sketch)")

    // $views metadata table: definitions visible, nothing materialized yet
    def viewsMeta() = spark.sql("SELECT * FROM g19.org.`files$views`")
      .collect().map(r => r.getAs[String]("name") ->
        ((r.getAs[String]("kind"), r.getAs[Boolean]("materialized"),
          r.getAs[Long]("refreshed_to_snapshot"), r.getAs[Long]("current_snapshot"))))
      .toMap
    val before = viewsMeta()
    assert(before("lang_stats") == (("rollup", false, -1L, before("lang_stats")._4)))
    assert(before("lang_repos")._1 == "distinct_sketch" && !before("lang_repos")._2)

    val refreshed = spark.sql("CALL g19.system.refresh_views(table => 'org.files')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(refreshed.keySet == Set("lang_stats", "lang_repos"))
    // ...and fully caught up afterwards
    viewsMeta().foreach { case (n, (_, mat, to, cur)) =>
      assert(mat && to == cur, s"$n not caught up: refreshed_to=$to current=$cur")
    }

    def rollup() = spark.sql(
      "SELECT lang, n, total_size FROM g19.org.lang_stats")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def sketch() = spark.sql("SELECT lang, repos FROM g19.org.lang_repos")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rollup() == Map("scala" -> ((2L, 30L)), "py" -> ((1L, 30L))))
    assert(sketch() == Map("scala" -> 2L, "py" -> 1L))
    // views are ordinary tables in the namespace — visible to SHOW TABLES
    val shown = spark.sql("SHOW TABLES IN g19.org")
      .collect().map(_.getString(1)).toSet
    assert(Set("files", "lang_stats", "lang_repos").subsetOf(shown))

    // new rows + a SQL DELETE: the rollup retracts exactly, the sketch
    // keeps every observed value (feed-observed semantics)
    spark.sql("INSERT INTO g19.org.files VALUES ('r9','p9','c','py',5)")
    spark.sql("DELETE FROM g19.org.files WHERE repo = 'r3'")
    spark.sql("CALL g19.system.refresh_views(table => 'org.files')")
    assert(rollup() == Map("scala" -> ((2L, 30L)), "py" -> ((1L, 5L))))
    assert(sketch() == Map("scala" -> 2L, "py" -> 2L))

    // idempotent: refresh with no new base commit reads zero files
    val again = spark.sql("CALL g19.system.refresh_views(table => 'org.files')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again.values.forall(_ == 0L))
  }

  test("create_view validation and drop_view artifact cleanup") {
    val wh = setupCatalog("g20")
    spark.sql("CREATE NAMESPACE g20.org")
    spark.sql("CREATE TABLE g20.org.t (k STRING, grp STRING, v BIGINT) " +
      "TBLPROPERTIES ('keys'='k','buckets'='2')")
    spark.sql("INSERT INTO g20.org.t VALUES ('a','x',1),('b','y',2)")
    spark.sql("CALL g20.system.create_view(table => 'org.t', " +
      "view => 'by_grp', group_by => 'grp', agg_by => 'v:total')")

    // duplicate definition
    val dup = intercept[Exception](spark.sql(
      "CALL g20.system.create_view(table => 'org.t', view => 'by_grp', " +
        "group_by => 'grp')"))
    assert(dup.getMessage.contains("already defined"))
    // unknown source column
    val badCol = intercept[Exception](spark.sql(
      "CALL g20.system.create_view(table => 'org.t', view => 'v2', " +
        "group_by => 'nope')"))
    assert(badCol.getMessage.contains("missing columns"))
    // name taken by a real table
    val taken = intercept[Exception](spark.sql(
      "CALL g20.system.create_view(table => 'org.t', view => 't', " +
        "group_by => 'grp')"))
    assert(taken.getMessage.contains("already exists as a table"))
    // distinct_sketch requires distinct columns
    val noAgg = intercept[Exception](spark.sql(
      "CALL g20.system.create_view(table => 'org.t', view => 'v3', " +
        "group_by => 'grp', kind => 'distinct_sketch')"))
    assert(noAgg.getMessage.contains("distinct column"))

    // distinct aliases also claim '<alias>_hll' — collisions must be rejected
    val hllClash = intercept[Exception](spark.sql(
      "CALL g20.system.create_view(table => 'org.t', view => 'v4', " +
        "group_by => 'grp', kind => 'distinct_sketch', agg_by => 'k:x,v:x_hll')"))
    assert(hllClash.getMessage.contains("duplicate output column"))

    spark.sql("CALL g20.system.refresh_views(table => 'org.t')")
    assert(spark.sql("SELECT * FROM g20.org.by_grp").count() == 2)

    assert(spark.sql("CALL g20.system.drop_view(table => 'org.t', view => 'by_grp')")
      .head().getBoolean(0))
    // definition gone, artifact gone, second drop reports false
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(wh, "org", "by_grp")))
    assert(!spark.sql("CALL g20.system.drop_view(table => 'org.t', view => 'by_grp')")
      .head().getBoolean(0))
    assert(spark.sql("CALL g20.system.refresh_views(table => 'org.t')")
      .count() == 0)
  }

  test("a user table squatting a declared view's name is never overwritten or deleted") {
    setupCatalog("g22")
    spark.sql("CREATE NAMESPACE g22.org")
    spark.sql("CREATE TABLE g22.org.t (k STRING, grp STRING, v BIGINT) " +
      "TBLPROPERTIES ('keys'='k','buckets'='2')")
    spark.sql("INSERT INTO g22.org.t VALUES ('a','x',1)")
    spark.sql("CALL g22.system.create_view(table => 'org.t', " +
      "view => 'squat', group_by => 'grp')")
    // a REAL table lands on the view's name before the first refresh —
    // refresh must refuse (ownership id mismatch), never replace() over it
    spark.sql("CREATE TABLE g22.org.squat (id STRING, payload STRING) " +
      "TBLPROPERTIES ('keys'='id','buckets'='2')")
    spark.sql("INSERT INTO g22.org.squat VALUES ('u1','precious')")
    val e = intercept[Exception](
      spark.sql("CALL g22.system.refresh_views(table => 'org.t')"))
    assert(e.getMessage.contains("refusing"), e.getMessage)
    // drop_view removes the definition but must NOT delete the user's table
    assert(spark.sql("CALL g22.system.drop_view(table => 'org.t', view => 'squat')")
      .head().getBoolean(0))
    assert(spark.sql("SELECT payload FROM g22.org.squat")
      .head().getString(0) == "precious")
  }
}
