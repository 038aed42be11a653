package graft.lake

import graft.SparkTestBase
import graft.cdc._
import org.apache.spark.sql.types._

class MigrationSpec extends SparkTestBase {

  private def writeMigrations(dir: String): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    def w(name: String, body: String) =
      java.nio.file.Files.writeString(d.resolve(name), body)
    // file names deliberately NOT in application order — only the
    // `-- depends:` DAG can order these correctly
    w("a_widen_size.sql",
      """-- depends: c_add_size
        |ALTER TABLE WIDEN COLUMN size_bytes BIGINT;""".stripMargin)
    w("b_rename_branch.sql",
      """-- depends: d_add_branch a_widen_size
        |ALTER TABLE RENAME COLUMN branch TO ref;""".stripMargin)
    w("c_add_size.sql",
      """-- depends: d_add_branch
        |ALTER TABLE ADD COLUMN size_bytes INT;""".stripMargin)
    w("d_add_branch.sql", "ALTER TABLE ADD COLUMN branch STRING;")
  }

  test("migration files apply in DAG order, exactly once, ledger survives restarts") {
    val dir = tmpDir("migs")
    writeMigrations(dir)
    val t = LakeTable.createOrReplace(spark, tmpDir("migtbl"),
      CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 4)

    val applied = MigrationRunner.migrate(t, dir)
    assert(applied == Seq("d_add_branch", "c_add_size", "a_widen_size", "b_rename_branch"))
    assert(t.schema.fieldNames.toSeq ==
      Seq("repo", "path", "commit", "lang", "content", "ref", "size_bytes"))
    assert(t.schema("size_bytes").dataType == LongType)

    // second run (or a second runner): ledger makes it a no-op
    assert(MigrationRunner.migrate(t, dir).isEmpty)
    // ledger is durable metadata, not runner state
    val reopened = LakeTable.forPath(spark, t.root)
    assert(MigrationRunner.migrate(reopened, dir).isEmpty)
    assert(reopened.meta.appliedMigrations.size == 4)
  }

  test("per-tenant loop migrates every namespace's table (reference cron_tasks)") {
    val dir = tmpDir("migs2")
    writeMigrations(dir)
    val cat = new LakeCatalog(spark, tmpDir("migwh"))
    Seq("org1", "org2").foreach(ns =>
      cat.createTable(ns, "code_files", CdcPipeline.baseTableSchema,
        ChangeEvent.keyCols, numBuckets = 4))
    val res = MigrationRunner.migrateAll(cat, "code_files", dir)
    assert(res.keySet == Set("org1", "org2"))
    assert(res.values.forall(_.size == 4))
    assert(cat.loadTable("org2", "code_files").schema.fieldNames.contains("ref"))
    // a tenant added later catches up on the next beat
    cat.createTable("org3", "code_files", CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 4)
    val res2 = MigrationRunner.migrateAll(cat, "code_files", dir)
    assert(res2("org1").isEmpty && res2("org3").size == 4)
  }

  test("a drifted tenant fails loudly but does not block the rest of the fleet") {
    val dir = tmpDir("migs3")
    writeMigrations(dir)
    val cat = new LakeCatalog(spark, tmpDir("migwh3"))
    Seq("orga", "orgb", "orgc").foreach(ns =>
      cat.createTable(ns, "code_files", CdcPipeline.baseTableSchema,
        ChangeEvent.keyCols, numBuckets = 4))
    // drift orgb: hand-apply the column the first migration adds — its
    // AddColumn replay will require-fail
    cat.loadTable("orgb", "code_files").evolveSchema(Seq(
      AddColumn("branch", org.apache.spark.sql.types.StringType)))
    val e = intercept[IllegalStateException] {
      MigrationRunner.migrateAll(cat, "code_files", dir)
    }
    assert(e.getMessage.contains("orgb"), e.getMessage)
    // the healthy tenants migrated despite the failure
    Seq("orga", "orgc").foreach { ns =>
      assert(cat.loadTable(ns, "code_files").schema.fieldNames.contains("ref"),
        s"$ns was blocked by orgb's drift")
    }
  }

  test("malformed directives are refused, not silently swallowed as comments") {
    import MigrationRunner._
    // '--id:' (no space) would otherwise parse as a comment, the file keeps
    // its filename id, and dependents referencing the declared id break
    val e = intercept[Exception] {
      parse("0007_x", "--id: 0007_add_branch\nALTER TABLE ADD COLUMN b STRING")
    }
    assert(e.getMessage.contains("malformed migration directive"), e.getMessage)
    val e2 = intercept[Exception] {
      parse("0008_x", "-- depends : 0007_x\nALTER TABLE ADD COLUMN c STRING")
    }
    assert(e2.getMessage.contains("malformed migration directive"), e2.getMessage)
    // the exact forms still parse
    val ok = parse("f", "-- id: real_id\n-- depends: a b\nALTER TABLE ADD COLUMN d STRING")
    assert(ok.id == "real_id" && ok.depends == Seq("a", "b"))
  }

  test("two concurrent runners apply each migration exactly once (optimistic lock)") {
    val dir = tmpDir("migs3")
    writeMigrations(dir)
    val t = LakeTable.createOrReplace(spark, tmpDir("migtbl3"),
      CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 4)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runners = Seq(
      Future(MigrationRunner.migrate(LakeTable.forPath(spark, t.root), dir)),
      Future(MigrationRunner.migrate(LakeTable.forPath(spark, t.root), dir)))
    val applied = Await.result(Future.sequence(runners), 60.seconds)
    // every migration applied by EXACTLY one of the two racing runners
    assert(applied.flatten.sorted ==
      Seq("a_widen_size", "b_rename_branch", "c_add_size", "d_add_branch"))
    assert(t.meta.appliedMigrations.size == 4)
    assert(t.schema.fieldNames.contains("ref") &&
      t.schema("size_bytes").dataType == org.apache.spark.sql.types.LongType)
  }

  test("unknown dependency and cycles are rejected") {
    import MigrationRunner._
    val a = Migration("a", Seq("b"), Seq.empty)
    val b = Migration("b", Seq("a"), Seq.empty)
    intercept[Exception](topoSort(Seq(a, b)))
    intercept[Exception](topoSort(Seq(a)))
    intercept[Exception](parseStatement("CREATE INDEX foo"))
  }

  test("duplicate migration ids are rejected, not silently collapsed") {
    import MigrationRunner._
    // a copy-pasted file keeping a stale `-- id:` header must fail loudly:
    // the old toMap collapse would silently never apply one of the files
    val m1 = Migration("0002_add_x", Seq.empty, Seq.empty)
    val m2 = Migration("0002_add_x", Seq.empty, Seq.empty)
    val e = intercept[IllegalArgumentException](topoSort(Seq(m1, m2)))
    assert(e.getMessage.contains("duplicate migration id"))
  }
}
