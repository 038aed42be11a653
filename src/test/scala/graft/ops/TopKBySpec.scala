package graft.ops

import graft.SparkTestBase
import graft.functions.TopKBy
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native bounded-buffer grouped top-k aggregate: must agree with the
  * row_number-window spec on any input and under any partitioning (the
  * whole point is replacing that window), and must keep the hash-aggregate
  * partial/final plan shape. */
class TopKBySpec extends SparkTestBase {

  /** Deterministic pseudo-random rows: (grp, ord, tie) with repeated ord
    * values inside groups so tiebreaks are exercised. */
  private def data(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val grp = i % 13
      val ord = (i * 2654435761L) % 17 // many ord collisions per group
      (grp, ord, i.toLong)
    }.toDF("grp", "ord", "tie")
  }

  private def native(df: DataFrame, k: Int): DataFrame =
    df.groupBy(col("grp"))
      .agg(TopKBy.topKBy(struct(col("ord"), col("tie")), col("ord"), col("tie"), k).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), (col("pos") + 1).as("rank"),
        col("col.ord").as("ord"), col("col.tie").as("tie"))

  private def windowSpec(df: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp")).orderBy(col("ord").desc, col("tie"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("grp"), col("rank"), col("ord"), col("tie"))
  }

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("top-k ≡ the row_number window spec") {
    graft.functions.LwwMaxBy.tuneSession(spark)
    val df = data(997)
    assert(sorted(native(df, 3)) == sorted(windowSpec(df, 3)))
    assert(sorted(native(df, 1)) == sorted(windowSpec(df, 1)))
  }

  test("result is invariant to input partitioning (merge path exercised)") {
    graft.functions.LwwMaxBy.tuneSession(spark)
    val df = data(500)
    val one = sorted(native(df.repartition(1), 4))
    val many = sorted(native(df.repartition(11), 4))
    assert(one == many)
    assert(one == sorted(windowSpec(df, 4)))
  }

  test("groups smaller than k return whole groups, ranked") {
    graft.functions.LwwMaxBy.tuneSession(spark)
    import spark.implicits._
    val df = Seq((1, 5L, 1L), (1, 9L, 2L), (2, 3L, 3L)).toDF("grp", "ord", "tie")
    val got = native(df, 10).collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq((1, 1, 9L, 2L), (1, 2, 5L, 1L), (2, 1, 3L, 3L)))
  }

  test("equal ord ties break by tie ASC (total order)") {
    graft.functions.LwwMaxBy.tuneSession(spark)
    import spark.implicits._
    val df = Seq((1, 7L, 30L), (1, 7L, 10L), (1, 7L, 20L)).toDF("grp", "ord", "tie")
    val got = native(df.repartition(3), 2).collect()
      .map(r => (r.getInt(1), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == Seq((1, 10L), (2, 20L)))
  }

  test("non-integral ranking types fail at analysis; integrals widen; NULL ranks skip") {
    import spark.implicits._
    // DOUBLE ord used to cast("long") silently — every score in [0,1)
    // ranked 0 and the 'top k' was the k lowest tie ids. Must now REFUSE.
    val scored = Seq((1, 0.9, 1L), (1, 0.1, 2L)).toDF("grp", "score", "tie")
    val ex = intercept[Exception] {
      scored.groupBy(col("grp"))
        .agg(TopKBy.topKBy(struct(col("score")), col("score"), col("tie"), 1))
        .collect()
    }
    assert(ex.getMessage.contains("integral"), ex.getMessage)
    // INT ord widens losslessly (no caller-side cast needed)
    val ints = Seq((1, 5, 1L), (1, 9, 2L)).toDF("grp", "ord", "tie")
    val top = ints.groupBy(col("grp"))
      .agg(TopKBy.topKBy(struct(col("ord")), col("ord"), col("tie"), 1).as("t"))
      .select(explode(col("t"))).select(col("col.ord")).as[Int].collect()
    assert(top.toSeq == Seq(9))
    // NULL-ranked rows are skipped (max_by semantics) — a null used to
    // unbox to rank 0 and beat every negative rank
    val withNulls = Seq((1, Some(-5L), 1L), (1, None, 2L), (1, Some(-9L), 3L))
      .toDF("grp", "ord", "tie")
    val winner = withNulls.groupBy(col("grp"))
      .agg(TopKBy.topKBy(struct(col("ord"), col("tie")), col("ord"), col("tie"), 1).as("t"))
      .select(explode(col("t"))).select(col("col.tie")).as[Long].collect()
    assert(winner.toSeq == Seq(1L), s"null rank must not win: ${winner.toSeq}")
  }

  test("q68 plans as partial+final ObjectHashAggregate with no Window") {
    val p = graft.SparkEntry.queries("q68_domain_topk")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"top-k lost the hash path:\n$p")
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2,
      s"expected partial+final aggregate pair:\n$p")
    assert(!p.contains("Window"), s"top-k regressed to a window:\n$p")
    assert(!p.contains("SortAggregate"), s"top-k degraded to sort agg:\n$p")
  }
}
