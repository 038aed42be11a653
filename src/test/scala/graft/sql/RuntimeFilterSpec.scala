package graft.sql

import graft.SparkTestBase
import graft.lake._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.types._

/** Runtime (dynamic) file skipping on the lake scan: a selective dim in a
  * broadcast join delivers its join keys to [[GraftScan]] as an IN predicate
  * after the build side materializes, and the scan re-prunes its manifest
  * file list — key values to their hash buckets, stat columns by min/max —
  * before any task is planned. The DPP analogue for the lake: a dim-filtered
  * fact query reads the few buckets its keys live in, not the table. */
class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  private def setupCatalog(name: String): LakeCatalog = {
    val wh = tmpDir("rtfwh")
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    new LakeCatalog(spark, wh)
  }

  /** All BatchScanExec nodes, descending through AQE wrappers and stages. */
  private def scans(p: SparkPlan): Seq[BatchScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case b: BatchScanExec => Seq(b)
    case other =>
      other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
  }

  private val factSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", StringType)))

  test("broadcast dim keys runtime-prune the fact scan to their buckets") {
    val cat = setupCatalog("rtf1")
    val fact = cat.createTable("ns", "fact", factSchema, Seq("id"), numBuckets = 16)
    // ~1 KB payloads: the fact side must NOT itself broadcast under the
    // lowered threshold, or no runtime filter is planned
    import org.apache.spark.sql.functions._
    fact.merge((0L until 200L).toDF("id")
      .withColumn("payload", concat_ws("", array_repeat(lit("x"), 1024)))
      .withColumn("lsn", col("id")).withColumn("op", lit("I")))
    assert(fact.meta.snapshots.last.files.size == 16)

    // the dim predicate must look SELECTIVE to Spark's PartitionPruning
    // rule (equality qualifies; a bare boolean column does not), and must
    // survive as a Filter node — a LocalRelation would constant-fold it
    // away, so the dim lives in parquet
    val dimPath = tmpDir("rtfdim")
    Seq((3L, "on"), (77L, "on"), (150L, "off")).toDF("id", "tag")
      .write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("rtf_dim")

    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, (64 * 1024).toString) // dim under, 200 KB fact over
    try {
      val q = spark.sql(
        """SELECT f.id, d.tag FROM rtf1.ns.fact f
          |JOIN rtf_dim d ON f.id = d.id WHERE d.tag = 'on'""".stripMargin)
      assert(q.collect().map(_.getLong(0)).toSet == Set(3L, 77L))

      val p = q.queryExecution.executedPlan
      assert(p.toString.toLowerCase.contains("dynamicpruningexpression"),
        s"no runtime filter planned on the fact scan:\n$p")
      val factScans = scans(p).filter(_.toString.contains("fact"))
      assert(factScans.nonEmpty, s"fact BatchScan not found:\n$p")
      val skipped = factScans.map(_.metrics("runtimeSkippedFiles").value).sum
      val planned = factScans.map(_.metrics("plannedFiles").value).sum
      // 2 live keys hash to at most 2 of 16 buckets — ≥14 files never read
      assert(skipped >= 14, s"expected ≥14 of 16 files skipped, got $skipped (planned=$planned)")
      assert(planned == 16 - skipped)
    } finally spark.conf.set(key, old)
  }

  test("pruneFilesIn: bucket membership on the key, min/max on stat columns, absence keeps") {
    val cat = setupCatalog("rtf2")
    val t = cat.createTable("ns", "t", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("day", LongType), StructField("note", StringType))),
      Seq("id"), numBuckets = 8)
    import org.apache.spark.sql.functions._
    t.merge((0L until 80L).toDF("id")
      .withColumn("day", col("id") % 10).withColumn("note", concat(lit("n"), col("id")))
      .withColumn("lsn", col("id")).withColumn("op", lit("I")))
    val m = t.meta
    val files = m.snapshots.last.files
    val sid = m.currentSchemaId

    // key values → exactly their buckets' files
    val keyVals = Seq[Any](5L, 42L)
    val buckets = keyVals.map(v => GraftScanBuilder.bucketOf(Seq(v), m.numBuckets)).toSet
    val byKey = GraftScanBuilder.pruneFilesIn(m, sid, files, "id", keyVals, Some(m.numBuckets))
    assert(byKey.map(_.bucket).toSet == buckets && byKey.size < files.size)
    // unproven layout (time travel below a rebucket): bucket pruning is OFF
    // — hashing with the wrong count would prune the file holding the key —
    // while layout-independent stat pruning still applies
    val unproven = GraftScanBuilder.pruneFilesIn(m, sid, files, "id", keyVals, None)
    assert(unproven.size == files.size)

    // a stat column value outside every file's range prunes everything;
    // an in-range value keeps a (possibly full) subset
    assert(GraftScanBuilder.pruneFilesIn(m, sid, files, "day", Seq(Long.box(999L)), Some(m.numBuckets)).isEmpty)
    assert(GraftScanBuilder.pruneFilesIn(m, sid, files, "day", Seq(Long.box(3L)), Some(m.numBuckets)).nonEmpty)
    // one matching value among misses is enough to keep a file (IN = any)
    assert(GraftScanBuilder.pruneFilesIn(m, sid, files, "day",
      Seq(Long.box(999L), Long.box(3L)), Some(m.numBuckets)).nonEmpty)
    // unknown column or incomparable value: keep everything (sound default)
    assert(GraftScanBuilder.pruneFilesIn(m, sid, files, "nope", Seq(Long.box(1L)), Some(m.numBuckets)).size == files.size)
    assert(GraftScanBuilder.pruneFilesIn(m, sid, files, "day", Seq(new Object), Some(m.numBuckets)).size == files.size)
  }

  test("inPredicate decomposes the IN and = shapes runtime filtering emits") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.connector.expressions.Expression

    val in = new Predicate("IN", Array[Expression](Expressions.column("id"),
      Expressions.literal(1L), Expressions.literal(2L)))
    assert(GraftScanBuilder.inPredicate(in).contains(("id", Seq(1L, 2L))))

    val eq = new Predicate("=", Array[Expression](Expressions.column("lang"),
      Expressions.literal("scala")))
    assert(GraftScanBuilder.inPredicate(eq).contains(("lang", Seq("scala"))))

    // non-literal children or other operators: not a prunable shape
    val and = new Predicate("AND", Array[Expression](in, eq))
    assert(GraftScanBuilder.inPredicate(and).isEmpty)
  }

  test("runtime IN keys land in the per-file parquet predicates (row-group/bloom point lookups)") {
    val cat = setupCatalog("rtf3")
    val t = cat.createTable("ns", "t", factSchema, Seq("id"), numBuckets = 4)
    import org.apache.spark.sql.functions._
    t.merge((0L until 40L).toDF("id").withColumn("payload", lit("p"))
      .withColumn("lsn", col("id")).withColumn("op", lit("I")))
    val m = t.meta
    val scan = new GraftScan(t.root, m, m.currentSchemaId,
      m.currentSnapshot.get.files, StructType(factSchema.fields), None, Seq.empty)
    import org.apache.spark.sql.connector.expressions.{Expression, Expressions}
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    scan.filter(Array(new Predicate("IN", Array[Expression](
      Expressions.column("id"),
      Expressions.literal(5L), Expressions.literal(9L)))))
    val parts = scan.planInputPartitions().map(_.asInstanceOf[GraftInputPartition])
    assert(parts.nonEmpty)
    assert(parts.forall(_.pred.exists(_.toString.contains("id"))),
      s"runtime IN keys missing from partition predicates: ${parts.map(_.pred).toSeq}")
  }
}
