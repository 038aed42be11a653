package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches for cross-corpus SET ALGEBRA — the capability HLL (q42)
  * cannot provide: HLL unions but never intersects, while corpus planning
  * needs "how much of crawl B is already in corpus A" (intersection),
  * "what is new in B" (A-not-B), and overlap Jaccard — WITHOUT joining two
  * 100 TB corpora. Each side aggregates to one compact sketch (map-side
  * partial: the exchange carries one ≤ k-entry sketch per group per task,
  * never the distinct values), and the set estimates are then pure scalar
  * expressions over the two sketch binaries.
  *
  * Exactness contract (same trick as q42's HLL coupon regime): below
  * 2^lgK retained entries a theta sketch is EXACT (estimate = retained
  * count, intersections/unions of exact sketches are exact), so the
  * testdata-scale oracle is a plain COUNT(DISTINCT); at corpus scale the
  * same plan degrades gracefully to ±ε estimation. Set-operation helpers
  * build at lgK 26 — the aggregate's own upper bound — so they can never
  * downsample a sketch the aggregate produced exact (the union/intersection
  * gadget allocates lazily, so small inputs cost small memory regardless).
  */
object ThetaHelpers {
  /** Exact up to 2^16 distinct per group-side at test scale; a corpus
    * deployment tunes this against the ε/bandwidth tradeoff. */
  val DefaultLgK = 16

  /** The aggregate's lgK upper bound — set operations build at this size so
    * a sketch the aggregate produced EXACT (any lgK up to 26) is never
    * downsampled into an estimate by the set-op gadget itself. */
  val MaxLgK = 26

  private def wrap(b: Array[Byte]) =
    Sketches.wrapCompactSketch(Memory.wrap(b))

  def estimate(a: Array[Byte]): Double = wrap(a).getEstimate

  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val u = SetOperation.builder().setLogNominalEntries(MaxLgK).buildUnion()
    u.union(wrap(a)); u.union(wrap(b))
    u.getResult.getEstimate
  }

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().setLogNominalEntries(MaxLgK).buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.getEstimate
  }

  /** |A ∖ B| — "what is new in A relative to B" (exact for exact inputs). */
  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB().aNotB(wrap(a), wrap(b)).getEstimate
}

/** Distinct-set sketch of a string column as a native aggregate
  * (ObjectHashAggregate: hash-based, partial-agg'd). Buffer = a theta
  * Union (accepts both raw updates and sketch merges); output = compact
  * sketch bytes, consumer-mergeable and storable. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = ThetaHelpers.DefaultLgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"theta_sketch_agg: lgK in [4,26], got $lgK")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg: input must be STRING, got ${child.dataType}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    // hash the UTF-8 bytes (stable across JVMs; String.update would hash
    // a re-decoded char[] — same result, one extra copy)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: input must be a theta sketch BINARY, got ${child.dataType}")
  }
  override def nullSafeEval(a: Any): Any =
    ThetaHelpers.estimate(a.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ThetaHelpers.estimate($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class ThetaUnionEstimate(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: inputs must be theta sketch BINARY, got ${left.dataType}, ${right.dataType}")
  }
  override def prettyName: String = "theta_union_estimate"
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaHelpers.unionEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaHelpers.unionEstimate($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class ThetaAnotBEstimate(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: inputs must be theta sketch BINARY, got ${left.dataType}, ${right.dataType}")
  }
  override def prettyName: String = "theta_anotb_estimate"
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaHelpers.aNotBEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaHelpers.aNotBEstimate($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: inputs must be theta sketch BINARY, got ${left.dataType}, ${right.dataType}")
  }
  override def prettyName: String = "theta_intersect_estimate"
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaHelpers.intersectEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaHelpers.intersectEstimate($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object ThetaSketch {
  def thetaSketchAgg(value: Column, lgK: Int = ThetaHelpers.DefaultLgK): Column =
    ColumnShim.column(
      ThetaSketchAgg(ColumnShim.expression(value), lgK).toAggregateExpression())
  def thetaEstimate(sketch: Column): Column =
    ColumnShim.column(ThetaEstimate(ColumnShim.expression(sketch)))
  def thetaUnionEstimate(a: Column, b: Column): Column =
    ColumnShim.column(ThetaUnionEstimate(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def thetaIntersectEstimate(a: Column, b: Column): Column =
    ColumnShim.column(ThetaIntersectEstimate(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def thetaAnotBEstimate(a: Column, b: Column): Column =
    ColumnShim.column(ThetaAnotBEstimate(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}
