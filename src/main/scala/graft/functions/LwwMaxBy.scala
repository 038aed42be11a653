package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Last-writer-wins argmax as a native Catalyst aggregate.
  *
  * Why not `max_by(struct(row), struct(lsn, pri))`: MaxBy is a
  * DeclarativeAggregate whose buffer holds a struct — HashAggregateExec only
  * supports mutable primitive buffers, so Catalyst plans it as
  * SortAggregateExec, which sorts every (wide, content-carrying) row by the
  * string key on both the map and reduce side. At 10^10 events that sort IS
  * the job. A TypedImperativeAggregate plans as ObjectHashAggregateExec:
  * hash-based, one retained winner row per key per partition, no sort
  * (raise `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` so the
  * hash path is not abandoned at 128 keys).
  *
  * Semantics: winner = max by (lsn, opPriority) with total order, the same
  * commutative monoid as [[graft.cdc.LwwAggregator]] (reference:
  * `SELECT DISTINCT ON (id) ... ORDER BY id, pr.created_at DESC`,
  * queries/fact_studies.py:4,34).
  *
  * Buffer/serialization: winner's (lsn, pri) + the projected value row as
  * UnsafeRow bytes (shuffle-stable, offset-based — no Java object graph).
  */
case class LwwMaxBy(
    valueStruct: Expression,
    lsn: Expression,
    pri: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LwwBuffer] with TernaryLike[Expression] {

  // the buffer stores (Long lsn, Int pri); any INTEGRAL lsn/pri widens
  // losslessly in update(). Non-integral types fail at ANALYSIS — a
  // blanket cast would accept DOUBLE/STRING and silently truncate
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (!TopKBy.integral(lsn.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"lww_max_by: lsn must be an integral type (TINYINT..BIGINT), got ${lsn.dataType}")
    else if (!Seq(ByteType, ShortType, IntegerType).contains(pri.dataType))
      TypeCheckResult.TypeCheckFailure( // buffer stores pri as Int: BIGINT would truncate
        s"lww_max_by: pri must be TINYINT, SMALLINT or INT, got ${pri.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def first: Expression = valueStruct
  override def second: Expression = lsn
  override def third: Expression = pri

  override def dataType: DataType = valueStruct.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "lww_max_by"

  private lazy val valueSchema = valueStruct.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe = UnsafeProjection.create(valueSchema)

  // primitive fast path for the per-row lsn read: after binding, lsn is a
  // BoundReference to a non-null bigint column in the hot path — read it
  // with getLong instead of a boxing eval (48M boxed Longs per bench split
  // set showed up as young-gen churn in the 4N stage profile)
  @transient private lazy val lsnOrdinal: Int = lsn match {
    case b: BoundReference if b.dataType == LongType && !b.nullable => b.ordinal
    case _ => -1
  }

  override def createAggregationBuffer(): LwwBuffer = new LwwBuffer(Long.MinValue, Int.MinValue, null)

  override def update(buf: LwwBuffer, input: InternalRow): LwwBuffer = {
    // rows with a NULL lsn are skipped like SQL max_by (the previous unbox
    // coerced null to 0L, letting a null-lsn row beat negative lsns); a
    // NULL pri on an lsn tie loses the tie (never crashes the task)
    val l = if (lsnOrdinal >= 0) input.getLong(lsnOrdinal)
      else {
        val v = lsn.eval(input)
        if (v == null) return buf
        TopKBy.toLong(v)
      }
    def priOf(): Int = {
      val v = pri.eval(input)
      if (v == null) Int.MinValue else TopKBy.toLong(v).toInt
    }
    // evaluate pri (a CASE WHEN over the op string) ONLY when it can decide:
    // on a strict lsn win it is irrelevant, and most rows lose on lsn alone —
    // that skips a per-row string compare + box for the bulk of the input
    if (buf.row == null || l > buf.lsn) {
      buf.lsn = l; buf.pri = priOf()
      buf.row = toUnsafe(valueStruct.eval(input).asInstanceOf[InternalRow]).copy()
    } else if (l == buf.lsn) {
      val p = priOf()
      if (p > buf.pri) {
        buf.pri = p
        buf.row = toUnsafe(valueStruct.eval(input).asInstanceOf[InternalRow]).copy()
      }
    }
    buf
  }

  override def merge(a: LwwBuffer, b: LwwBuffer): LwwBuffer = {
    if (a.row == null) b
    else if (b.row == null) a
    else if (b.lsn > a.lsn || (b.lsn == a.lsn && b.pri > a.pri)) b
    else a
  }

  override def eval(buf: LwwBuffer): Any = buf.row

  override def serialize(buf: LwwBuffer): Array[Byte] = {
    if (buf.row == null) return Array.emptyByteArray
    val rowBytes = buf.row.getBytes
    val out = java.nio.ByteBuffer.allocate(12 + rowBytes.length)
    out.putLong(buf.lsn); out.putInt(buf.pri); out.put(rowBytes)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): LwwBuffer = {
    if (bytes.isEmpty) return createAggregationBuffer()
    val in = java.nio.ByteBuffer.wrap(bytes)
    val l = in.getLong; val p = in.getInt
    val row = new UnsafeRow(valueSchema.length)
    row.pointTo(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + 12L, bytes.length - 12)
    new LwwBuffer(l, p, row)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LwwMaxBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LwwMaxBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LwwMaxBy =
    copy(valueStruct = newFirst, lsn = newSecond, pri = newThird)
}

final class LwwBuffer(var lsn: Long, var pri: Int, var row: UnsafeRow)

object LwwMaxBy {
  /** Column API: winner-struct per group. */
  def lwwMaxBy(value: Column, lsn: Column, pri: Column): Column =
    ColumnShim.column(
      LwwMaxBy(ColumnShim.expression(value),
        ColumnShim.expression(lsn),
        ColumnShim.expression(pri)).toAggregateExpression())

  /** ObjectHashAggregateExec abandons its hash map for sort-based
    * aggregation after only 128 distinct keys by default — which would
    * reintroduce exactly the per-row sort this aggregate exists to avoid.
    * Raise the threshold (runtime-settable SQLConf); memory stays bounded
    * because each entry holds one winner row and partitions are sized to
    * fit (spill falls back gracefully past the threshold). */
  def tuneSession(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 21).toString)
}
