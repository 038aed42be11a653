package graft.ops

import graft.SparkTestBase
import graft.functions.TokenExprs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Pins the native tokenize/word-shingle kernels byte-exact against the
  * Column compositions they replaced (r6 optimization) — the compositions
  * are what every DuckDB oracle string mirrors, so kernel drift here would
  * silently change oracle-checked results. */
class TokenExprsSpec extends SparkTestBase {
  import spark.implicits._

  // the pre-r6 Column forms, verbatim
  private def tokensRef(c: Column): Column =
    filter(split(lower(c), " "), x => x =!= "")
  private def shinglesRef(c: Column, w: Int): Column = {
    val toks = tokensRef(c)
    when(size(toks) < w, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - w),
        i => array_join(slice(toks, i + 1, lit(w)), " ")))
  }

  private val corpus = Seq(
    "",                       // empty → tokens [], shingle [""]
    " ",                      // single space → tokens []
    "   ",                    // only spaces
    "one",                    // fewer tokens than any w > 1
    "One Two THREE",          // case folding
    "a  b   c",               // multi-space runs collapse
    " leading and trailing ", // boundary empties dropped
    "tab\tand\nnewline stay", // only 0x20 splits — \t/\n are token chars
    "Ärger ÜBER GRÖSSE",      // non-ASCII lowercase
    "ΣΊΣΥΦΟΣ ΚΑΙ Ο ΒΡΆΧΟΣ",   // Greek sigma casing
    "İstanbul I ı İ",         // dotted/dotless I
    "naïve café déjà-vu mixed UP tokens here now", // 8 tokens = w for w=8
    ("the quick brown fox jumps over the lazy dog " * 8).trim, // long doc
    null.asInstanceOf[String] // null text → null out
  )

  test("native tokenize ≡ filter(split(lower(c), ' '), _ <> '')") {
    val df = corpus.toDF("text")
    val rows = df.select(
      TokenExprs.tokenize(col("text")).as("nat"),
      tokensRef(col("text")).as("ref")).collect()
    rows.zip(corpus).foreach { case (r, src) =>
      assert(r.get(0) == r.get(1) ||
        (r.get(0) != null && r.get(0) == r.get(1)),
        s"tokenize mismatch for '$src': ${r.get(0)} vs ${r.get(1)}")
      assert(r.isNullAt(0) == r.isNullAt(1), s"null-ness mismatch for '$src'")
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"tokenize mismatch for '$src'")
    }
  }

  test("native word shingles ≡ sequence+transform composition, w = 1/2/3/8") {
    val df = corpus.toDF("text")
    for (w <- Seq(1, 2, 3, 8)) {
      val rows = df.select(
        TokenExprs.wordShingles(col("text"), w).as("nat"),
        shinglesRef(col("text"), w).as("ref")).collect()
      rows.zip(corpus).foreach { case (r, src) =>
        assert(r.isNullAt(0) == r.isNullAt(1),
          s"w=$w null-ness mismatch for '$src'")
        if (!r.isNullAt(0))
          assert(r.getSeq[String](0) == r.getSeq[String](1),
            s"w=$w shingle mismatch for '$src': " +
              s"${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  // the pre-r6 q76/q78 window composition, verbatim: a size filter plus
  // transform(sequence, i => struct(i, array_join(slice(tk, i, k), " ")))
  private def windowsRef(tk: Column, k: Int): Column =
    when(size(tk) < k, array().cast(graft.functions.TokenWindows.outType))
      .otherwise(transform(sequence(lit(1), (size(tk) - (k - 1)).cast("int")),
        i => struct(i.cast("long").as("pos"),
          array_join(slice(tk, i, lit(k)), " ").as("w"))))

  test("native token windows ≡ filter+transform+slice composition, k = 1/2/8") {
    val df = corpus.toDF("text")
    for (k <- Seq(1, 2, 8)) {
      val rows = df.select(
        TokenExprs.tokenWindows(tokensRef(col("text")), k).as("nat"),
        windowsRef(tokensRef(col("text")), k).as("ref")).collect()
      rows.zip(corpus).foreach { case (r, src) =>
        assert(r.isNullAt(0) == r.isNullAt(1),
          s"k=$k null-ness mismatch for '$src'")
        if (!r.isNullAt(0))
          assert(r.getSeq[org.apache.spark.sql.Row](0) ==
            r.getSeq[org.apache.spark.sql.Row](1),
            s"k=$k window mismatch for '$src': " +
              s"${r.getSeq[Any](0)} vs ${r.getSeq[Any](1)}")
      }
    }
  }

  test("kernels survive whole-stage codegen and interpreted eval alike") {
    // force both paths: the codegen'd projection and a filter referencing
    // the kernel (predicate subexpression), over a real shuffle
    val df = corpus.filter(_ != null).toDF("text").repartition(3)
    val n = df.select(explode(TokenExprs.wordShingles(col("text"), 3)).as("sh"))
      .filter(length(col("sh")) >= 0).count()
    val ref = df.select(explode(shinglesRef(col("text"), 3)).as("sh")).count()
    assert(n == ref)
  }
}
