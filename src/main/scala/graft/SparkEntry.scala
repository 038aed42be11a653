package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the registered operator surface (SURVEY.md §2 inventory plus
  * the training-data-pipeline suite); `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible operator. Ops whose results are
  * hash-function-specific (minhash/simhash/LSH) have no oracle and are
  * instead recall-tested against their exact counterparts in ScalaTest.
  */
object SparkEntry {

  val allOps: Seq[OpQuery] =
    RelationalOps.all ++ EventOps.all ++ TextOps.all ++ DedupOps.all ++
      SimilarityOps.all ++ MultimodalOps.all ++ CatalogOps.all ++ CodeOps.all

  /** Flagship: the CDC engine end-to-end at smoke scale — synthesize a
    * change log, replay it through LWW dedup + MERGE into a lake table,
    * return the final state (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    import graft.cdc._
    import graft.lake._
    val dir = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val cfg = GenConfig(numEvents = 20000, numRepos = 50, pathsPerRepo = 10)
    val table = LakeTable.createOrReplace(spark, s"$dir/table",
      CdcPipeline.baseTableSchema, ChangeEvent.keyCols, numBuckets = 16)
    CdcPipeline.replayBatch(spark,
      CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg)), table)
    table.currentState()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
