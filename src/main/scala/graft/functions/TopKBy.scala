package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Grouped top-k as a native bounded-buffer Catalyst aggregate.
  *
  * The standard formulation — `row_number() OVER (PARTITION BY g ORDER BY
  * ord DESC) <= k` — shuffles EVERY row to its group's reducer and sorts
  * the whole group there: at a billion docs per domain that window is the
  * job. This aggregate plans as ObjectHashAggregateExec with partial
  * aggregation, so each map task retains at most k winner rows per group
  * and the exchange carries ≤ k rows per (group, map task) — the same
  * partial-agg shape that makes [[LwwMaxBy]] (k = 1) scale. Global sort is
  * avoided entirely; per-group order comes out of the k-sized buffer.
  *
  * Ordering: winners ranked by `ord` DESC, ties broken by `tie` ASC. The
  * caller must make (ord, tie) a total order (tie = a unique id) or the
  * result is nondeterministic under partitioning — same contract as the
  * LWW (lsn, opPriority) tiebreak (SURVEY.md ST8).
  *
  * Buffer: k-bounded arrays kept sorted best-first (insertion shift — k is
  * small by definition; a heap only wins past k ≈ 10³). Rows are retained
  * as UnsafeRow copies, serialized length-prefixed (shuffle-stable).
  */
case class TopKBy(
    valueStruct: Expression,
    ord: Expression,
    tie: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with TernaryLike[Expression] {

  require(k > 0, "topKBy requires k > 0")

  // the buffer stores BIGINT ranking keys; any INTEGRAL ord/tie widens
  // losslessly in update(). Non-integral types are REJECTED at analysis —
  // a blanket cast("long") would accept DOUBLE/DECIMAL/STRING and silently
  // truncate (every score in [0,1) ranks 0), the worst failure mode
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (!TopKBy.integral(ord.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by: ord must be an integral type (TINYINT..BIGINT), got ${ord.dataType}")
    else if (!TopKBy.integral(tie.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by: tie must be an integral type (TINYINT..BIGINT), got ${tie.dataType}")
    else if (!valueStruct.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(s"top_k_by: row must be a STRUCT, got ${valueStruct.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def first: Expression = valueStruct
  override def second: Expression = ord
  override def third: Expression = tie

  override def dataType: DataType = ArrayType(valueStruct.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"

  private lazy val valueSchema = valueStruct.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe = UnsafeProjection.create(valueSchema)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    // rows with a NULL ranking value are skipped, like SQL max_by — the
    // previous unboxing coerced null to 0L, letting null-ranked rows WIN
    // over negative ranks
    val ov = ord.eval(input)
    val tv = tie.eval(input)
    if (ov == null || tv == null) return buf
    val o = TopKBy.toLong(ov)
    val t = TopKBy.toLong(tv)
    // evaluate + copy the (wide) value row ONLY when it actually enters the
    // buffer — for the bulk of a large group every row loses to the current
    // k-th entry and costs two long reads and one compare
    if (buf.admits(o, t)) {
      buf.insert(o, t, toUnsafe(valueStruct.eval(input).asInstanceOf[InternalRow]).copy())
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    // b is sorted best-first: once one entry is rejected, the rest lose too
    var i = 0
    while (i < b.size && a.admits(b.ords(i), b.ties(i))) {
      a.insert(b.ords(i), b.ties(i), b.rows(i))
      i += 1
    }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) { out(i) = buf.rows(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    var total = 4
    var i = 0
    while (i < buf.size) { total += 20 + buf.rows(i).getBytes.length; i += 1 }
    val out = java.nio.ByteBuffer.allocate(total)
    out.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      val bytes = buf.rows(i).getBytes
      out.putLong(buf.ords(i)); out.putLong(buf.ties(i))
      out.putInt(bytes.length); out.put(bytes)
      i += 1
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = createAggregationBuffer()
    if (bytes.isEmpty) return buf
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val o = in.getLong; val t = in.getLong
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val row = new UnsafeRow(valueSchema.length)
      row.pointTo(rowBytes, len)
      // entries arrive sorted best-first; insert preserves order
      buf.insert(o, t, row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): TopKBy =
    copy(valueStruct = newFirst, ord = newSecond, tie = newThird)
}

/** k-bounded winner set, sorted best-first by (ord DESC, tie ASC). */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val ords = new Array[Long](k)
  val ties = new Array[Long](k)
  val rows = new Array[UnsafeRow](k)

  /** Would (o, t) enter the buffer? */
  def admits(o: Long, t: Long): Boolean =
    size < k || beats(o, t, size - 1)

  private def beats(o: Long, t: Long, i: Int): Boolean =
    o > ords(i) || (o == ords(i) && t < ties(i))

  /** Insert an already-admitted entry, keeping best-first order. The row
    * must be safe to retain (copied or freshly deserialized). */
  def insert(o: Long, t: Long, row: UnsafeRow): Unit = {
    var pos = size
    while (pos > 0 && beats(o, t, pos - 1)) pos -= 1
    var i = math.min(size, k - 1)
    while (i > pos) { ords(i) = ords(i - 1); ties(i) = ties(i - 1); rows(i) = rows(i - 1); i -= 1 }
    if (pos < k) { ords(pos) = o; ties(pos) = t; rows(pos) = row }
    if (size < k) size += 1
  }
}

object TopKBy {
  private[functions] def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private[functions] def toLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case s: java.lang.Short => s.longValue()
    case b: java.lang.Byte => b.longValue()
    case other => throw new IllegalStateException(
      s"top_k_by: non-integral ranking value $other") // unreachable post-check
  }

  /** Column API: array of the group's top-k value structs, ranked by
    * (ord DESC, tie ASC); `posexplode` the result for 1-based ranks.
    * NULL-ranked rows are skipped (max_by semantics); integral ranking
    * types widen to BIGINT internally, non-integral types fail analysis
    * (rank by a DOUBLE score via a scaled BIGINT, e.g. `(score * 1e6)
    * .cast("long")`, so the truncation is explicit and chosen). */
  def topKBy(value: Column, ord: Column, tie: Column, k: Int): Column =
    ColumnShim.column(
      TopKBy(ColumnShim.expression(value),
        ColumnShim.expression(ord),
        ColumnShim.expression(tie), k).toAggregateExpression())
}
