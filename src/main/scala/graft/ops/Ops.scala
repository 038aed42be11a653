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
    * warehouse-scale table does. */
  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism max 8
    if (df.rdd.getNumPartitions >= par) df else df.repartition(par)
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
