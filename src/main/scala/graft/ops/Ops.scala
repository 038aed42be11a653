package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered operator: a Spark query over the driver's testdata tables
  * plus (when SQL-expressible) a DuckDB oracle over the same parquet.
  *
  * Oracle-parity rules that keep value-hash comparison exact across engines:
  *  - money/quantity sums go through DECIMAL(18,2) (exact) then CAST to
  *    DOUBLE — never sum raw doubles (summation order differs per engine);
  *  - every computed column is aliased identically in both dialects;
  *  - outputs prefer BIGINT / VARCHAR / exact-decimal-derived DOUBLE;
  *  - date-ish outputs are formatted strings or yyyymmdd ints, not raw
  *    timestamps.
  */
final case class OpQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal sum of a 2-dp double column, surfaced as DOUBLE. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Guarantee at least the cluster's parallelism ahead of a compute-heavy
    * stage (signature computation, all-pairs verify). Small reference
    * corpora often arrive as ONE file = one scan split, which would pin the
    * downstream kernel to a single core no matter how wide the cluster —
    * measured 6× on the exact-Jaccard verify. A no-op (no shuffle) when the
    * source already plans enough splits, which is what a many-file
    * warehouse-scale table does.
    *
    * The gate reads the ANALYZED plan only (file sizes/counts from the
    * relation's file index, Range slices, local-rows counts) — it never
    * converts to an RDD or triggers physical planning, which the previous
    * `df.rdd.getNumPartitions` probe paid on every call even when it
    * no-op'd (asserted in PlanSpec via the query-planning tracker). */
  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism max 8
    if (plannedSplitsAtLeast(df, par)) df else df.repartition(par)
  }

  /** Conservative (lower-bound) estimate of whether the source plans at
    * least `par` scan splits, from analyzed-plan metadata alone.
    *
    * An explicit repartition/coalesce anywhere above the leaves decides
    * the output partitioning regardless of the scan, so the TOPMOST such
    * node answers directly (and a limit answers false — its final stage is
    * single-partition). File relations then use Spark's own split math,
    * conservatively: Spark's bytesPerCore includes the per-file openCost
    * padding, and a packed partition's padded weight can exceed
    * maxSplitBytes by up to one openCost (the close check tests the raw
    * length only), so dividing total padded weight by
    * (maxSplitBytes + openCost) never over-counts the planned splits.
    * Under-counting only costs a redundant round-robin shuffle of a small
    * input; over-counting would silently pin the downstream kernel to one
    * core — the failure mode this helper exists to prevent — so unknown
    * leaf shapes answer `false` (repartition). */
  private def plannedSplitsAtLeast(df: DataFrame, par: Int): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalRelation, RepartitionOperation, Range => LRange}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val sc = df.sparkSession.sparkContext
    val conf = df.sparkSession.sessionState.conf
    val analyzed = df.queryExecution.analyzed
    // collectFirst traverses pre-order, so the first hit is the TOPMOST
    val gate = analyzed.collectFirst {
      // Try: RepartitionByExpression without an explicit count resolves
      // numPartitions from session state; any resolution hiccup answers
      // conservatively (repartition). coalesce (shuffle=false) only CAPS
      // partitions — a single-split source stays single-split no matter how
      // large its numPartitions argument — so it never evidences enough
      // splits and answers false (ADVICE r5).
      case r: RepartitionOperation =>
        r.shuffle && scala.util.Try(r.numPartitions).toOption.exists(_ >= par)
      case _: GlobalLimit => false
    }
    if (gate.isDefined) return gate.get
    val leaves = analyzed.collectLeaves()
    if (leaves.isEmpty) return true
    var est = 0L
    leaves.foreach {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        val fs = lr.relation.asInstanceOf[HadoopFsRelation]
        val open = conf.filesOpenCostInBytes
        val files = fs.location.inputFiles.length.toLong
        val padded = fs.location.sizeInBytes + files * open
        val maxSplit = math.max(1L,
          math.min(conf.filesMaxPartitionBytes,
            math.max(open, padded / math.max(1, sc.defaultParallelism))))
        est += padded / (maxSplit + open)
      case r: LRange =>
        est += r.numSlices.getOrElse(sc.defaultParallelism).toLong
      case l: LocalRelation =>
        // LocalTableScanExec parallelizes to min(rows, default parallelism)
        est += math.min(math.max(l.data.length, 1), sc.defaultParallelism).toLong
      case _ => return false
    }
    est >= par
  }

  /** Distributed top-k: `orderBy().limit(k)` plans TakeOrderedAndProject —
    * per-partition bounded heaps merged on the driver — instead of the
    * global-window formulation that funnels EVERY surviving row through one
    * task (the round-1 scale-killer in q16/q22/q35). `order` must be a total
    * order (include a unique tiebreak column) for replay determinism. */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** All-pairs reference implementations refuse corpus-scale inputs: beyond
    * oracle scale they plan a cartesian join — the caller wants the bucketed
    * scale path (LSH/simhash/IVF) instead. The count is one cheap pass at
    * the scales these are legitimate for. */
  def assertReferenceScale(df: DataFrame, name: String, scalePath: String,
      maxRows: Long = 1000000L): Unit = {
    val n = df.count()
    require(n <= maxRows,
      s"$name is an exact small-scale reference ($n rows > $maxRows); use $scalePath at scale")
  }

  /** topK + a 1-based rank column. The rank is derived from the ≤k collected
    * rows (already in total order after TakeOrderedAndProject), not from a
    * window: collecting k rows is aggregate-result-sized, a window over the
    * full input is a single-partition shuffle. */
  def rankedTopK(df: DataFrame, k: Int, order: Column*): DataFrame = {
    import scala.jdk.CollectionConverters._
    val limited = topK(df, k, order: _*)
    val ranked = limited.collect().zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1))
    }
    df.sparkSession.createDataFrame(ranked.toSeq.asJava,
      limited.schema.add("rk", org.apache.spark.sql.types.IntegerType, nullable = false))
  }
}
