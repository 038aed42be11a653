package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf-scale synthesizer: writes `copies`× the source scale
  * factor by unioning key-shifted copies of each driver table (the driver
  * only ships sf ≤ 0.1; the round-4 verdict asks for a 10× suite pass).
  *
  * Shifts preserve what matters for a PERFORMANCE pass:
  *  - referential integrity: orders.o_custkey shifts with customer,
  *    lineitem's FKs shift with orders/part/supplier;
  *  - the planted doc-id modular structure: the doc shift is a multiple of
  *    3·5·7·97 = 10185, so every `doc_id % k` cohort scales exactly 10×;
  *  - non-degenerate text/vectors: copy i's text is Caesar-rotated by i
  *    (token counts, lengths, shingle shapes identical; vocabularies
  *    disjoint, so copies are not 10-way exact duplicates of each other)
  *    and copy i's embedding is circularly shifted by i (norm preserved,
  *    cross-copy cosine decorrelated).
  * Dims (region, nation) are shared, as at any scale. Big tables land as
  * 32 files — the many-file layout a warehouse table actually has.
  *
  * args: srcDir outDir copies   (e.g. /root/testdata/sf0.1 /tmp/graft-sf1 10)
  */
object SfScale {
  private val Alpha = "abcdefghijklmnopqrstuvwxyz"
  private val AlphaU = Alpha.toUpperCase

  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesS) = args.take(3)
    val copies = copiesS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors().toString)}]")
      .appName("graft-sfscale")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def t(n: String) = spark.read.parquet(s"$src/$n.parquet")
      def write(df: DataFrame, n: String, files: Int): Unit = {
        df.repartition(files).write.mode("overwrite").parquet(s"$out/$n.parquet")
        println(s"[sfscale] $n x$copies -> $out/$n.parquet ($files files)")
      }
      def scaled(name: String, files: Int)(f: (DataFrame, Int) => DataFrame): Unit =
        write((0 until copies).map(i => f(t(name), i)).reduce(_ unionByName _),
          name, files)

      write(t("region"), "region", 1)
      write(t("nation"), "nation", 1)

      val D = 1018500L // 10185 * 100: doc_id % {3,5,7,97} cohorts preserved
      val C = 101850L; val O = 10185000L; val P = 101850L; val S = 10185L
      val E = 10185000L; val U = 101850L; val V = 101850L

      scaled("documents", 32) { (d, i) =>
        val rot = Alpha.drop(i % 26) + Alpha.take(i % 26)
        val rotU = AlphaU.drop(i % 26) + AlphaU.take(i % 26)
        d.select((col("doc_id") + i * D).as("doc_id"),
          translate(col("text"), Alpha + AlphaU, rot + rotU).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      scaled("embeddings", 8) { (d, i) =>
        val dim = size(col("embedding"))
        val shifted =
          if (i == 0) col("embedding")
          else concat(slice(col("embedding"), lit(i + 1), dim - i),
            slice(col("embedding"), lit(1), lit(i)))
        d.select((col("vec_id") + i * V).as("vec_id"),
          shifted.as("embedding"), col("label"))
      }
      scaled("events", 32) { (d, i) =>
        d.select((col("event_id") + i * E).as("event_id"), col("ts"),
          (col("user_id") + i * U).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }
      scaled("customer", 8) { (d, i) =>
        d.select((col("c_custkey") + i * C).as("c_custkey"), col("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      }
      scaled("supplier", 2) { (d, i) =>
        d.select((col("s_suppkey") + i * S).as("s_suppkey"), col("s_name"),
          col("s_nationkey"), col("s_acctbal"))
      }
      scaled("part", 8) { (d, i) =>
        d.select((col("p_partkey") + i * P).as("p_partkey"), col("p_name"),
          col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
      }
      scaled("orders", 32) { (d, i) =>
        d.select((col("o_orderkey") + i * O).as("o_orderkey"),
          (col("o_custkey") + i * C).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
      }
      scaled("lineitem", 32) { (d, i) =>
        d.select((col("l_orderkey") + i * O).as("l_orderkey"),
          (col("l_partkey") + i * P).as("l_partkey"),
          (col("l_suppkey") + i * S).as("l_suppkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate"))
      }
    } finally spark.stop()
  }
}
