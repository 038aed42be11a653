package graft.cdc

import graft.SparkTestBase
import graft.lake.LakeTable
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  /** Update storm: one hot key receives most of the batch (the reference's
    * hot-tenant pattern, SURVEY.md ST9). */
  private def stormLog(n: Int, hotShare: Double) = {
    val hot = (n * hotShare).toInt
    val events = (0 until n).map { i =>
      if (i < hot) (i.toLong, "U", "hot/repo", "hot/path", "hotcommit", "scala", s"v$i")
      else (i.toLong, "U", s"r${i % 50}", s"p${i % 7}", s"c${i % 11}", "scala", s"v$i")
    }
    events.toDF("lsn", "op", "repo", "path", "commit", "lang", "content")
  }

  test("key histogram sees the storm and sizes salts from it") {
    val log = stormLog(20000, 0.6)
    val hist = CdcPipeline.keyHistogram(log)
    assert(hist.maxKeyCount == 12000)
    assert(hist.saltsFor(stormThreshold = 10000, targetPerSalt = 2500) > 1)
    assert(hist.saltsFor(stormThreshold = 50000, targetPerSalt = 2500) == 0) // below threshold: unsalted
  }

  test("auto-salted storm batch produces identical state to unsalted; skew visible in lineage") {
    val log = stormLog(20000, 0.6)

    val plain = LakeTable.createOrReplace(spark, tmpDir("t"),
      CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 8)
    CdcPipeline.processBatch(log, 0, plain, Map.empty, new TableVersions,
      lineageDir = None, salts = 0, autoSaltThreshold = Long.MaxValue)

    val saltedDir = tmpDir("t")
    val salted = LakeTable.createOrReplace(spark, saltedDir,
      CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 8)
    CdcPipeline.processBatch(log, 0, salted, Map.empty, new TableVersions,
      lineageDir = Some(s"$saltedDir/_lineage"), salts = 0,
      autoSaltThreshold = 10000) // storm of 12000 > threshold → auto-salt

    val a = plain.currentState().select("repo", "path", "commit", "content")
      .collect().map(_.toSeq).toSet
    val b = salted.currentState().select("repo", "path", "commit", "content")
      .collect().map(_.toSeq).toSet
    assert(a == b)

    val lin = spark.read.parquet(s"$saltedDir/_lineage")
    val r = lin.select("max_key_count", "salts_used", "distinct_keys").head()
    assert(r.getLong(0) == 12000)
    assert(r.getInt(2 - 1) > 1 || r.getAs[Int]("salts_used") > 1)
    assert(r.getLong(2) > 100)
  }
}
