package graft.ops

import graft.SparkTestBase
import graft.functions.ThetaSketch._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Theta-sketch set algebra: exact below the nominal-entries bound (the
  * oracle contract q69 leans on), invariant to partitioning (merge path),
  * and hash-aggregate plan shape. */
class ThetaSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def vals(n: Int, prefix: String): DataFrame =
    (0 until n).map(i => (i % 5, s"$prefix$i")).toDF("g", "v")

  test("exact regime: estimates equal exact distinct counts per group") {
    graft.functions.LwwMaxBy.tuneSession(spark)
    val df = vals(2000, "x").union(vals(2000, "x")) // duplicates collapse
    val got = df.groupBy(col("g"))
      .agg(thetaEstimate(thetaSketchAgg(col("v"))).cast("long").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = df.groupBy(col("g")).agg(countDistinct(col("v")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("intersection and union of exact sketches are exact (incl. disjoint and empty)") {
    graft.functions.LwwMaxBy.tuneSession(spark)
    // A = 0..1499 (shared 500..1499), B = 500..1999, C disjoint, E empty
    val df = (0 until 1500).map(i => ("ab", s"s$i", true)) ++
      (500 until 2000).map(i => ("ab", s"s$i", false)) ++
      (0 until 300).map(i => ("cd", s"a$i", true)) ++
      (0 until 400).map(i => ("cd", s"b$i", false)) ++
      (0 until 100).map(i => ("e", s"x$i", true)) // side B empty for group e
    val got = df.toDF("g", "v", "isA").groupBy(col("g"))
      .agg(thetaSketchAgg(when(col("isA"), col("v"))).as("ska"),
        thetaSketchAgg(when(!col("isA"), col("v"))).as("skb"))
      .select(col("g"),
        thetaIntersectEstimate(col("ska"), col("skb")).cast("long").as("inter"),
        thetaUnionEstimate(col("ska"), col("skb")).cast("long").as("uni"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("ab") == (1000L, 2000L), s"got ${got("ab")}")
    assert(got("cd") == (0L, 700L))
    assert(got("e") == (0L, 100L))
  }

  test("A-not-B of exact sketches is exact (incl. disjoint and empty edges)") {
    graft.functions.LwwMaxBy.tuneSession(spark)
    val df = (0 until 1500).map(i => ("ab", s"s$i", true)) ++
      (500 until 2000).map(i => ("ab", s"s$i", false)) ++
      (0 until 300).map(i => ("cd", s"a$i", true)) ++
      (0 until 400).map(i => ("cd", s"b$i", false)) ++
      (0 until 100).map(i => ("e", s"x$i", true))
    val got = df.toDF("g", "v", "isA").groupBy(col("g"))
      .agg(thetaSketchAgg(when(col("isA"), col("v"))).as("ska"),
        thetaSketchAgg(when(!col("isA"), col("v"))).as("skb"))
      .select(col("g"),
        thetaAnotBEstimate(col("ska"), col("skb")).cast("long").as("aNotB"),
        thetaAnotBEstimate(col("skb"), col("ska")).cast("long").as("bNotA"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("ab") == (500L, 500L), s"got ${got("ab")}") // A\B = 0..499, B\A = 1500..1999
    assert(got("cd") == (300L, 400L))                      // disjoint: each side whole
    assert(got("e") == (100L, 0L))                         // empty B: A\B = A, B\A = 0
  }

  test("result is invariant to input partitioning (sketch merge path)") {
    graft.functions.LwwMaxBy.tuneSession(spark)
    def run(parts: Int) = vals(3000, "p").repartition(parts).groupBy(col("g"))
      .agg(thetaEstimate(thetaSketchAgg(col("v"))).cast("long").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13))
  }

  test("q69 plans as partial+final ObjectHashAggregate; sketches shuffle, not shingles") {
    val p = graft.SparkEntry.queries("q69_corpus_overlap")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"sketch agg lost the hash path:\n$p")
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2,
      s"expected partial+final aggregate pair:\n$p")
    assert(!p.contains("SortAggregate"), s"sketch agg degraded to sort agg:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }
}
