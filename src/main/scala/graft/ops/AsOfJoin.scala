package graft.ops

import org.apache.spark.sql.DataFrame
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

  private val K = "__graft_asof_k"; private val T = "__graft_asof_t"
  private val SIDE = "__graft_asof_side"; private val P = "__graft_asof_p"
  private val CARRY = "__graft_asof_carry"

  def asOf(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // internal scratch names must not collide with caller columns (the
    // select below would produce ambiguous references), and a payload name
    // equal to a left column would emit two same-named output columns —
    // both silently poisonous downstream; refuse loudly instead
    // case-INSENSITIVE checks: Spark resolves columns case-insensitively by
    // default, so "Name" vs "name" is exactly the ambiguous-output poison
    // these guards exist to refuse
    val leftLower = leftCols.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    require(!leftLower.exists(_.startsWith("__graft_asof")),
      "left input uses the reserved __graft_asof* column-name prefix")
    val clash = payload.filter(p => leftLower.contains(p.toLowerCase(java.util.Locale.ROOT)))
    require(clash.isEmpty,
      s"payload column(s) ${clash.mkString(", ")} collide with left " +
        "columns: alias one side before the as-of join")
    val payloadStruct = struct(payload.map(col): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map(right.schema(_))))

    val taggedLeft = left.select(
      col(leftKey).as(K) +: col(leftTime).as(T) +: lit(1).as(SIDE) +:
        nullPayload.as(P) +: leftCols.map(col): _*)
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
      col(rightKey).as(K) +: col(rightTime).as(T) +: lit(0).as(SIDE) +:
        payloadStruct.as(P) +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // At equal time the right row sorts first (side 0 < 1) so it is
    // already carried when the left row is scanned: inclusive as-of.
    val w = Window.partitionBy(col(K)).orderBy(col(T), col(SIDE))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn(CARRY, last(col(P), ignoreNulls = true).over(w))
      .filter(col(SIDE) === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"$CARRY.$c").as(c)): _*)
  }
}
