package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) clustering kernel for multi-column compaction
  * (reference analogue: the layout role Postgres CLUSTER plays for its
  * warehouse, `queries/fact_studies.py`'s btree access patterns — but for
  * immutable parquet the engine must cluster at rewrite time, like
  * Iceberg/Delta Z-ordering).
  *
  * Lexicographic `sortBy(a, b)` makes row-group min/max stats prunable on
  * `a` only — every row group spans the full domain of `b`. Z-order maps
  * each row to a point on a space-filling curve: per column, a SAMPLED
  * range-bucket rank (equi-depth, so skew cannot collapse the curve), then
  * the per-column bucket bits INTERLEAVED into one sort key. Consecutive
  * rows share bucket prefixes in every dimension, so row-group stats are
  * narrow on ALL z columns at once and range predicates on any of them
  * prune.
  *
  * The bucket lookup is a native codegen'd binary search (8 comparisons
  * for 256 buckets); the interleave is pure Column bit arithmetic — the
  * whole sort key stays inside whole-stage codegen, no UDF. */
object ZOrderHelpers {
  /** Buckets per dimension (8 bits). 256 equi-depth cells per column is
    * far finer than row-group granularity at any sane file size. */
  val BucketBits = 8

  def bucketD(v: Double, bounds: Array[Double]): Long = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v >= bounds(mid)) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  def bucketS(v: UTF8String, bounds: Array[UTF8String]): Long = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v.compareTo(bounds(mid)) >= 0) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** Up to 255 equi-depth boundaries from a driver-side sample: value v
    * maps to the count of boundaries ≤ v, i.e. its quantile cell. */
  def boundariesOf[T](sorted: IndexedSeq[T]): IndexedSeq[T] = {
    val cells = 1 << BucketBits
    if (sorted.isEmpty) IndexedSeq.empty
    // long arithmetic: i * size overflows Int for samples past ~8.4M rows
    else (1 until cells).map(i => sorted(((i.toLong * sorted.size) / cells).toInt))
      .distinct.toIndexedSeq
  }

  /** Morton-interleave the per-column bucket Columns (each 0..255) into one
    * BIGINT sort key: bit j of column i lands at position j*n + i. Null
    * buckets (null column values) zero out — nulls cluster at the curve
    * origin instead of poisoning the whole key. */
  def interleave(buckets: Seq[Column]): Column = {
    val n = buckets.size
    require(n > 0 && n * BucketBits <= 63, s"1..7 z-order columns, got $n")
    var acc: Column = lit(0L)
    for (j <- 0 until BucketBits; i <- 0 until n) {
      val bit = shiftright(coalesce(buckets(i), lit(0L)), j).bitwiseAND(lit(1L))
      acc = acc.bitwiseOR(shiftleft(bit, j * n + i))
    }
    acc
  }

  def rangeBucketD(c: Column, bounds: Array[Double]): Column =
    ColumnShim.column(RangeBucketDouble(ColumnShim.expression(c), bounds))
  def rangeBucketS(c: Column, bounds: Array[UTF8String]): Column =
    ColumnShim.column(RangeBucketString(ColumnShim.expression(c), bounds))
}

case class RangeBucketDouble(child: Expression, bounds: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    ZOrderHelpers.bucketD(v.asInstanceOf[Double], bounds)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("bounds", bounds, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ZOrderHelpers.bucketD($c, $arr)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class RangeBucketString(child: Expression, bounds: Array[UTF8String])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    ZOrderHelpers.bucketS(v.asInstanceOf[UTF8String], bounds)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("bounds", bounds,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ZOrderHelpers.bucketS($c, $arr)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
