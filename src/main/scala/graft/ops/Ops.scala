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
}
