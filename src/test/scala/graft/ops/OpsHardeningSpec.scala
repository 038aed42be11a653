package graft.ops

import graft.SparkTestBase
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Regression specs for the ops/functions-layer review fixes: oracle-exact
  * behavior on degenerate inputs and loud guards on silently-poisonous API
  * misuse. */
class OpsHardeningSpec extends SparkTestBase {
  import spark.implicits._

  test("jaccard of two empty sets is 0.0, matching the oracles' dropped 0/0") {
    val df = Seq((Seq.empty[String], Seq.empty[String]),
      (Seq("a"), Seq.empty[String]), (Seq("a", "b"), Seq("b", "c")))
      .toDF("a", "b")
      .select(DedupOps.jaccard(col("a"), col("b")).as("j"))
    val js = df.collect().map(_.getDouble(0))
    assert(js(0) == 0.0, "J(∅,∅) must be 0.0 — blank docs are not near-dups")
    assert(js(1) == 0.0)
    assert(math.abs(js(2) - 1.0 / 3.0) < 1e-9)
  }

  test("q47 emits 0.0 (not NULL) repetition fractions for zero-token documents") {
    val dir = tmpDir("q47-zero")
    Seq((1L, "", "en", "web", 0L), (2L, "   ", "en", "web", 3L),
      (3L, "a a b", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q47_repetition_quality")(spark, dir)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    // doc 1 and 2 tokenize to zero tokens: fraction pinned to 0.0 both sides
    assert(out(0).getAs[Double]("dup_token_frac") == 0.0)
    assert(out(1).getAs[Double]("dup_token_frac") == 0.0)
    assert(math.abs(out(2).getAs[Double]("dup_token_frac") - (1.0 - 2.0 / 3.0)) < 1e-5)
  }

  test("as-of join refuses reserved scratch names and colliding payload columns") {
    val left = Seq((1L, 10L, "e")).toDF("k", "t", "ev")
    val right = Seq((1L, 5L, "n", 1.0)).toDF("k", "t", "name", "score")
    // payload name equal to a left column → duplicate output columns
    val ex1 = intercept[IllegalArgumentException](
      AsOfJoin.asOf(left, "k", "t", right, "k", "t", Seq("name", "t")))
    assert(ex1.getMessage.contains("collide"), ex1.getMessage)
    // reserved internal prefix on the left input → ambiguous references
    val poisoned = left.withColumn("__graft_asof_k", lit(1))
    val ex2 = intercept[IllegalArgumentException](
      AsOfJoin.asOf(poisoned, "k", "t", right, "k", "t", Seq("name")))
    assert(ex2.getMessage.contains("reserved"), ex2.getMessage)
  }
}
