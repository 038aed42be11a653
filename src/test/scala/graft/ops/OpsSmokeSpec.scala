package graft.ops

import graft.SparkTestBase
import graft.SparkEntry

/** Every registered operator must run clean on the smoke-scale testdata, and
  * every oracle entry must have a matching query (the driver contract). */
class OpsSmokeSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("oracle map keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query names are unique") {
    val names = SparkEntry.allOps.map(_.name)
    assert(names.distinct.size == names.size)
  }

  SparkEntry.allOps.foreach { op =>
    test(s"${op.name} executes at sf0.001") {
      val df = op.fn(spark, dir)
      df.count() // force full execution
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("batched decode plumbing: per-partition codec, typed output, deterministic") {
    import org.apache.spark.sql.functions._
    val assets = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"), col("text").cast("binary").as("payload"))
    val out = MultimodalOps.decodeBatched(assets)
    assert(out.columns.toSeq ==
      Seq("assetId", "width", "height", "channels", "nBytes", "digest"))
    val r1 = out.collect().map(_.toString).sorted
    val r2 = MultimodalOps.decodeBatched(assets.repartition(7)).collect()
      .map(_.toString).sorted
    assert(r1.toSeq == r2.toSeq) // partitioning-invariant
    assert(out.filter(col("nBytes") <= 0).count() == 0)
  }

  test("multimodal pipeline: schema, determinism, frame shape") {
    val q = SparkEntry.queries("q32_multimodal_pipeline")
    val a = q(spark, dir)
    assert(a.columns.toSeq == Seq("asset_id", "source", "width", "height",
      "channels", "n_frames", "first_frame_digest"))
    val r1 = a.collect().map(_.toSeq).toSet
    val r2 = q(spark, dir).collect().map(_.toSeq).toSet
    assert(r1 == r2)
    import org.apache.spark.sql.functions._
    assert(a.filter(col("n_frames") < 1 || col("width") < 16 ||
      col("height") < 16 || !col("channels").between(1, 3)).count() == 0)
  }
}
