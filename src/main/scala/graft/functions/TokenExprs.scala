package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize/shingle kernels. The Column forms — `filter(split(
  * lower(c), " "), x => x <> "")` and the `transform(sequence, i =>
  * array_join(slice(tokens, i+1, w), " "))` w-gram build — are higher-order
  * functions, which Spark evaluates as interpreted CodegenFallback: the
  * shingle explode over `documents` measured ~7 µs/shingle and was the
  * single hottest stage of q27/q40/q46/q66/q69 (guide §4.1: prefer
  * codegen'd built-ins; here the built-in composition IS the interpreted
  * path, so the kernel moves to a static helper + `defineCodeGen`, keeping
  * the surrounding pipeline whole-stage fused).
  *
  * Byte-exactness with the Column forms (which every DuckDB oracle string
  * mirrors): `lower` delegates to the same UTF8String.toLowerCase; the
  * regex " " splits on the literal 0x20 byte, which can never occur inside
  * a multi-byte UTF-8 sequence (continuation bytes are >= 0x80), so a
  * byte scan is equivalent; empties are dropped exactly like the filter;
  * shingle join = single-space concat, the same UTF8String.concatWs
  * array_join uses; a document with fewer than w tokens yields ONE
  * whole-doc shingle (the empty doc: [""]).
  */
object TokenHelpers {
  private val Space = 0x20.toByte
  private val SpaceStr = UTF8String.fromString(" ")

  /** Lowercase + split-on-space + drop-empties into `out`; returns the
    * token count. */
  private def tokenizeTo(text: UTF8String,
      out: java.util.ArrayList[UTF8String]): Int = {
    val lower = text.toLowerCase
    val bytes = lower.getBytes
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == Space) {
        if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
        start = i + 1
      }
      i += 1
    }
    out.size
  }

  def tokenize(text: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    tokenizeTo(text, out)
    new GenericArrayData(out.toArray)
  }

  private val EmptyArray = new GenericArrayData(Array.empty[Any])

  /** Every k-token window of an ALREADY-tokenized array as (pos, w) struct
    * rows — pos 1-based, w the single-space join of tokens [pos, pos+k-1].
    * Byte-exact with the Column form it replaces
    * (`transform(sequence(1, n-k+1), i => struct(i, array_join(slice(tk,
    * i, k), " ")))` under a `size(tk) >= k` filter): same concatWs join
    * (null elements skipped, exactly like array_join), and n < k yields
    * the EMPTY array, so `explode` drops the row just as the filter did —
    * the filter (which Spark pushed below the project, re-tokenizing every
    * row a second time in the scan-side Filter) is subsumed by the kernel. */
  def tokenWindows(tk: ArrayData, k: Int): ArrayData = {
    val n = tk.numElements()
    if (n < k) return EmptyArray
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = tk.getUTF8String(i); i += 1 }
    val out = new Array[Any](n - k + 1)
    val gram = new Array[UTF8String](k)
    var p = 0
    while (p + k <= n) {
      System.arraycopy(toks, p, gram, 0, k)
      out(p) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any]((p + 1).toLong, UTF8String.concatWs(SpaceStr, gram: _*)))
      p += 1
    }
    new GenericArrayData(out)
  }

  def wordShingles(text: UTF8String, w: Int): ArrayData = {
    val buf = new java.util.ArrayList[UTF8String]()
    val n = tokenizeTo(text, buf)
    val toks = buf.toArray(new Array[UTF8String](n))
    if (n < w)
      new GenericArrayData(Array[Any](UTF8String.concatWs(SpaceStr, toks: _*)))
    else {
      val out = new Array[Any](n - w + 1)
      val gram = new Array[UTF8String](w)
      var i = 0
      while (i + w <= n) {
        System.arraycopy(toks, i, gram, 0, w)
        out(i) = UTF8String.concatWs(SpaceStr, gram: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

case class TokenWindows(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"token_windows: k must be positive, got $k")
  override def dataType: DataType = TokenWindows.outType
  override def prettyName: String = "token_windows"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case bad => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: input must be ARRAY<STRING>, got $bad")
  }
  override def nullSafeEval(a: Any): Any =
    TokenHelpers.tokenWindows(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TokenHelpers.tokenWindows($a, $k)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TokenWindows {
  /** (pos, w) struct rows; both fields non-nullable, so a downstream
    * equijoin on `w` infers no isnotnull filter to duplicate (§4.4). */
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("w", StringType, nullable = false))), containsNull = false)
}

case class Tokenize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize_words"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case bad => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: input must be STRING, got $bad")
  }
  override def nullSafeEval(a: Any): Any =
    TokenHelpers.tokenize(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TokenHelpers.tokenize($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class WordShingles(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, s"word_shingles: w must be positive, got $w")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case bad => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: input must be STRING, got $bad")
  }
  override def nullSafeEval(a: Any): Any =
    TokenHelpers.wordShingles(a.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TokenHelpers.wordShingles($a, $w)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TokenExprs {
  def tokenize(c: Column): Column =
    ColumnShim.column(Tokenize(ColumnShim.expression(c)))
  def wordShingles(c: Column, w: Int): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(c), w))
  def tokenWindows(c: Column, k: Int): Column =
    ColumnShim.column(TokenWindows(ColumnShim.expression(c), k))
}
