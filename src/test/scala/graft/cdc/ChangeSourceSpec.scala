package graft.cdc

import graft.SparkTestBase
import graft.lake._
import org.apache.spark.sql.functions._

/** S1 completion: the same pipeline over a real JDBC database (embedded
  * Derby — the reference's equivalent surface is Postgres, `database.py:
  * 10-41`) and over the parquet change feed must produce identical tables. */
class ChangeSourceSpec extends SparkTestBase {

  private val cfg = GenConfig(numEvents = 2000, numRepos = 8, pathsPerRepo = 4,
    commitsPerFile = 2, schemaBumps = Seq.empty)

  private def freshTable(): LakeTable =
    LakeTable.createOrReplace(spark, tmpDir("cstbl"), CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = 8)

  test("JDBC source ≡ file source: identical final state, watermark-incremental beats") {
    val env = CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg)).cache()
    val logDir = tmpDir("cslog")
    env.write.mode("overwrite").parquet(logDir)

    // ground truth: file-source replay
    val fileSrc = new FileChangeSource(spark, logDir)
    val tFile = freshTable()
    assert(IncrementalSync.syncOnce(fileSrc, tFile) > 0)

    // JDBC: load HALF the log into embedded Derby, sync, load the rest, sync
    val url = "jdbc:derby:memory:cs1;create=true"
    val props = new java.util.Properties
    val mid = env.agg(expr("percentile_approx(lsn, 0.5)")).head().getLong(0)
    env.filter(col("lsn") <= mid).write.mode("overwrite").jdbc(url, "changes", props)
    val jdbcSrc = new JdbcChangeSource(spark, url, "changes", numPartitions = 4)
    val tJdbc = freshTable()
    assert(IncrementalSync.syncOnce(jdbcSrc, tJdbc) > 0)
    val wmAfterFirst = IncrementalSync.tableWatermark(tJdbc)
    assert(wmAfterFirst == mid, s"watermark $wmAfterFirst != first-beat max $mid")

    env.filter(col("lsn") > mid).write.mode("append").jdbc(url, "changes", props)
    assert(IncrementalSync.syncOnce(jdbcSrc, tJdbc) > 0) // only the delta
    assert(IncrementalSync.syncOnce(jdbcSrc, tJdbc) == 0L) // idle beat is a no-op

    val a = tFile.currentState().select("repo", "path", "commit", "content")
      .collect().map(_.toSeq).toSet
    val b = tJdbc.currentState().select("repo", "path", "commit", "content")
      .collect().map(_.toSeq).toSet
    assert(a == b, "JDBC-sourced table diverges from file-sourced table")
    env.unpersist()
  }

  test("JDBC lsn-window read prunes at the database and partitions the scan") {
    val url = "jdbc:derby:memory:cs2;create=true"
    val env = CdcPipeline.envelopeDf(ChangeLogGen.generate(spark,
      cfg.copy(numEvents = 500)))
    env.write.mode("overwrite").jdbc(url, "changes", new java.util.Properties)
    val src = new JdbcChangeSource(spark, url, "changes", numPartitions = 4)
    val lo = 100L; val hi = 200L
    val df = src.batch(lo, hi)
    assert(df.columns.toSeq == CdcPipeline.envelopeSchema.fieldNames.toSeq)
    val lsns = df.select("lsn").collect().map(_.getLong(0))
    assert(lsns.forall(l => l > lo && l <= hi))
    assert(df.rdd.getNumPartitions == 4) // window fans out over 4 connections
    // watermark matches the table's true max
    assert(src.maxLsn() == env.agg(max("lsn")).head().getLong(0))
  }
}
