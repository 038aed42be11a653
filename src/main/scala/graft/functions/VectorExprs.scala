package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Single-pass cosine similarity over two double arrays, with whole-stage
  * codegen. The `functions.aggregate`/`zip_with` composition is a
  * HigherOrderFunction — CodegenFallback, interpreted per element with a
  * lambda-variable box per multiplication — which made the all-pairs
  * similarity queries the benchmark's hot spot. This expression compiles to
  * a tight fused loop (one pass accumulates dot, |a|² and |b|²).
  *
  * Evaluation order matches the composed form exactly
  * (sequential index-order adds; cos = dot / (sqrt(na) * sqrt(nb))), so
  * results stay bit-identical to the DuckDB oracle comparisons.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {
  // inputs must already be array<double> (call sites cast); typed misuse
  // fails at analysis via checkInputDataTypes (AbstractDataType is
  // private[sql] in Spark 4, so no ExpectsInputTypes)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  // length-mismatched vectors (mixed embedding models in one table) yield
  // NULL, matching the composed zip_with/aggregate form (which null-pads) —
  // a truncated similarity over the common prefix would be silently wrong
  override def nullable: Boolean = true
  override def checkInputDataTypes() =
    VectorChecks.doubleArrays(prettyName, left.dataType, right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Shared analysis-time check: both inputs ARRAY<DOUBLE>. */
private[functions] object VectorChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  def doubleArrays(name: String, dts: DataType*): TypeCheckResult =
    dts.find {
      case ArrayType(DoubleType, _) => false
      case _ => true
    } match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$name: inputs must be ARRAY<DOUBLE>, got $bad")
      case None => TypeCheckResult.TypeCheckSuccess
    }
}

/** Codegen'd dot product (used by the LSH hyperplane projections). */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true // length mismatch -> NULL
  override def checkInputDataTypes() =
    VectorChecks.doubleArrays(prettyName, left.dataType, right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Codegen'd Euclidean distance (k-means assignment kernel). Sequential
  * index-order accumulation of squared differences, then one sqrt — the
  * same evaluation order as DuckDB's `list_distance`, so rounded distances
  * agree across engines (the k-means oracle compares cluster assignments,
  * which are argmins over these values). */
case class L2Distance(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_distance"
  override def nullable: Boolean = true // length mismatch -> NULL
  override def checkInputDataTypes() =
    VectorChecks.doubleArrays(prettyName, left.dataType, right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0; var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($s);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorExprs {
  def cosineSim(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimilarity(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def l2Distance(a: Column, b: Column): Column =
    ColumnShim.column(L2Distance(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}
