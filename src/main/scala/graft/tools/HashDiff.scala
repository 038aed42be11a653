package graft.tools

/** One-off differential sweep (r6): byte-walk arithHash vs the legacy
  * String-roundtrip fold over EVERY token and every 8-word shingle of the
  * given corpus. Not part of the committed surface. */
object HashDiff {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.functions.{TokenExprs, TextSimHelpers}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(explode(TokenExprs.tokenize(col("text"))).as("s"))
    val shingles = docs.select(explode(TokenExprs.wordShingles(col("text"), 8)).as("s"))
    val all = toks.unionByName(shingles).distinct()
    val bad = all.filter { r =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))
      TextSimHelpers.arithHash(u) != TextSimHelpers.arithHashViaString(u)
    }.count()
    val tot = all.count()
    println(s"[hashdiff] distinct strings=$tot mismatches=$bad")
    spark.stop()
    if (bad != 0) sys.exit(1)
  }
}
