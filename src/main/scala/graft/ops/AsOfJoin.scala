package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) LEFT join: for every left row, the single most
  * recent right row with `rightTime <= leftTime` on the same key — the
  * lookup a training pipeline needs to label events with the state that was
  * true when they happened (reference analogue: the watermark extract's
  * "newest row wins" pick, queries/fact_studies.py:4,34, applied across two
  * tables instead of within one).
  *
  * Spark has no as-of operator, and both naive formulations die at scale:
  * an inequality join plans a per-key cartesian (every left row pairs with
  * ALL earlier right rows before the top-1 filter), and join-then-window
  * shuffles that multiplied pair set. This is the union + ordered
  * carry-forward formulation: tag both inputs, union, ONE hash exchange on
  * the key, a partition-local sort by (time, side), and a running
  * last(ignoreNulls) of the right payload — shuffle volume stays
  * |left| + |right| regardless of history depth, and the payload rides as
  * one struct so all carried columns come from the SAME right row.
  *
  * Semantics: inclusive (a right row at exactly leftTime matches). The
  * right side must be unique per (key, time) — pre-aggregate ties away
  * (e.g. max-by) or the carried row is sort-order-arbitrary. Left rows with
  * no prior right row keep null payload (LEFT join).
  */
object AsOfJoin {

  def asOf(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map(right.schema(_))))

    val taggedLeft = left.select(
      col(leftKey).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        nullPayload.as("_p") +: leftCols.map(col): _*)
    // A right row with a null key or null time can never legitimately match:
    // key equality fails on NULL and `null <= t` holds for no t. Left as-is
    // it WOULD match here — null `_t` sorts first (asc nulls-first) so its
    // payload would be carried into every later left row, and null keys on
    // both sides would land in the same partition and pair up. Filter them
    // out; null-key/null-time LEFT rows stay and keep a null payload (LEFT
    // join), matching ANSI/DuckDB ASOF semantics.
    val taggedRight = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
      col(rightKey).as("_k") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        payloadStruct.as("_p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // At equal time the right row sorts first (_side 0 < 1) so it is
    // already carried when the left row is scanned: inclusive as-of.
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"_asof.$c").as(c)): _*)
  }
}
