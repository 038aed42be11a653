package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(leftKey: String): org.apache.spark.sql.DataFrame = {
    // spec implementation: inequality join + per-left-row top-1 window
    val left = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_id", $"user_id", $"ts")
    val right = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter($"o_custkey" % 3 === 0)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("asof_orderkey"))
    val w = Window.partitionBy($"event_id")
      .orderBy($"o_orderdate".desc_nulls_last, $"asof_orderkey".desc_nulls_last)
    left.join(right, $"user_id" === $"o_custkey" && $"ts" >= $"o_orderdate", "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_id", $"user_id", $"asof_orderkey")
  }

  test("asOf ≡ inequality-join + top-1 window on real data, nulls included") {
    val fast = graft.SparkEntry.queries("q52_asof_join")(spark, "/root/testdata/sf0.001")
    val slow = naive("user_id")
    assert(fast.count() === slow.count())
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    // the % 3 subset must leave genuine LEFT-join misses
    assert(fast.filter($"asof_orderkey".isNull).count() > 0, "no null rows — left semantics untested")
  }

  test("inclusive boundary, multi-column struct payload, and no-history nulls") {
    val left = Seq((1L, 10L, "e1"), (2L, 20L, "e2"), (3L, 5L, "e3"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 10L, "a", 1.0), (1L, 9L, "b", 2.0), (2L, 21L, "c", 3.0))
      .toDF("k", "t", "name", "score")
    val out = AsOfJoin.asOf(left, "k", "t", right, "k", "t", Seq("name", "score"))
      .orderBy("k").collect()
    // k=1: right row AT t=10 matches (inclusive), and name/score come from
    // the SAME row (not last-non-null per column independently)
    assert(out(0).getString(3) == "a" && out(0).getDouble(4) == 1.0)
    // k=2: only right row is later → null payload
    assert(out(1).isNullAt(3) && out(1).isNullAt(4))
    // k=3: key absent from right → null payload
    assert(out(2).isNullAt(3) && out(2).isNullAt(4))
  }

  test("null-key / null-time right rows never match (ANSI ASOF semantics)") {
    val left = Seq((1L, 10L, "e1"), (2L, 20L, "e2")).toDF("k", "t", "ev")
    // a null-time right row sorts FIRST in the union (asc nulls-first), so
    // unfiltered it would carry its payload into every later left row on
    // the key; a null-key right row would pair with nothing legitimately
    // but lands in some partition all the same
    val right = Seq(
      (Option(1L), Option.empty[Long], "poison-null-time", 9.0),
      (Option.empty[Long], Option(5L), "poison-null-key", 8.0),
      (Option(2L), Option(15L), "good", 3.0))
      .toDF("k", "t", "name", "score")
    val out = AsOfJoin.asOf(left, "k", "t", right, "k", "t", Seq("name", "score"))
      .orderBy("k").collect()
    // k=1: only right rows are poison → LEFT semantics, null payload
    assert(out(0).isNullAt(3) && out(0).isNullAt(4))
    // k=2: the real row at t=15 <= 20 matches
    assert(out(1).getString(3) == "good" && out(1).getDouble(4) == 3.0)

    // null-key LEFT rows stay (LEFT join) with null payload
    val nullLeft = Seq((Option.empty[Long], Option(10L), "e0")).toDF("k", "t", "ev")
    val out2 = AsOfJoin.asOf(nullLeft, "k", "t", right, "k", "t", Seq("name", "score"))
      .collect()
    assert(out2.length == 1 && out2(0).isNullAt(3))
  }

  test("q52 plan: one exchange over the union, no cartesian/theta join") {
    val p = graft.SparkEntry.queries("q52_asof_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"as-of degraded to a product join:\n$p")
    assert(p.contains("Union"), s"union carry-forward plan lost its Union:\n$p")
    // exchanges: one for the right-side pre-agg tie-break, one for the
    // union window — neither proportional to pair count
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"as-of join should need ≤2 exchanges, saw $exchanges:\n$p")
  }
}
