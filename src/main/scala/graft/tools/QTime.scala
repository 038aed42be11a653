package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: time individual registered queries (args = query names). */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.files.maxPartitionBytes", "1g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(spark, dir).count() // warm
      val t0 = System.nanoTime(); val n = fn(spark, dir).count()
      println(f"[qtime] $q%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    spark.stop()
  }
}
