package graft.ops

import graft.SparkTestBase
import graft.SparkEntry
import graft.cdc.{ChangeEvent, CdcPipeline, Dedup, GenConfig, ChangeLogGen}

/** Physical-plan assertions: the optimizations this engine's design leans on
  * must be visible in `explain`, not assumed. Guards against plan rot (a
  * refactor that silently un-pushes a filter or turns the LWW aggregate back
  * into a sort would pass result checks and still be wrong at 100 TB). */
class PlanSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q01: filter and projection reach the parquet scan") {
    val p = plan("q01_pushdown_projection")
    assert(p.contains("PushedFilters:") && p.contains("l_returnflag"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
    // projection pruned to the 6 referenced columns (4 out + 2 filter)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_suppkey"), s"scan reads unused columns: $readSchema")
  }

  test("q03: dim joins are broadcast, fact side never shuffles before the join") {
    val p = plan("q03_join_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join degraded to SMJ:\n$p")
  }

  test("q10: timestamp watermark predicate is pushed to the scan") {
    val p = plan("q10_watermark_incremental")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(ts"),
      s"watermark filter not pushed:\n$p")
  }

  test("q05 anti / q06 semi joins plan as join operators, not subquery loops") {
    assert(plan("q05_anti_join").contains("LeftAnti"))
    assert(plan("q06_semi_join").contains("LeftSemi"))
  }

  test("LWW dedup plans as ObjectHashAggregate with partial aggregation, no sort") {
    val log = CdcPipeline.envelopeDf(
      ChangeLogGen.generate(spark, GenConfig(numEvents = 1000)))
    val p = Dedup.lwwDf(log, ChangeEvent.keyCols)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"dedup lost the hash path:\n$p")
    assert(!p.contains("SortAggregate"), s"dedup degraded to sort agg:\n$p")
    // partial + final = exactly two aggregate operators around one exchange
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2)
  }

  test("codegen'd kernels stay inside WholeStageCodegen") {
    import org.apache.spark.sql.functions._
    // a scan→cosine projection must be one fused codegen stage ("*(n)"
    // markers); q26 itself plans a BroadcastNestedLoopJoin (non-equi), which
    // never codegens regardless of the expression — not the right probe
    val e = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val df = e.select(SimilarityOps.cosine(col("v"), col("v")).as("c"))
      .filter(col("c") > 0.5)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"cosine projection fell out of codegen:\n$p")
    assert(!p.toLowerCase.contains("codegenfallback"))
  }

  test("top-k plans as TakeOrderedAndProject — no single-partition window") {
    import org.apache.spark.sql.functions._
    val sums = Tables.t(spark, dir, "orders").groupBy(col("o_custkey"))
      .agg(Tables.dsum(col("o_totalprice")).as("total_spend"))
    val p = Tables.topK(sums, 10, col("total_spend").desc, col("o_custkey").asc)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-k lost the heap path:\n$p")
    assert(!p.contains("Window"), s"top-k regressed to a global window:\n$p")
  }

  test("aggregations use hash aggregation with partial (map-side) phase") {
    val p = plan("q02_agg_pricing_summary")
    assert(p.contains("HashAggregate"), s"group-by lost hash agg:\n$p")
  }
}
