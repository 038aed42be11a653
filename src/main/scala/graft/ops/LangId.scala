package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-n-gram language identification (Cavnar–Trenkle-style profiles,
  * argmax over per-language trigram-occurrence scores) — the hot path is a
  * native codegen'd kernel expression ([[LangIdPredict]], see `predict`);
  * the equivalent pure-Column ladder (`scores`+`argmax`) is kept as the
  * readable spec but overflows janino's method limit at this profile size
  * (falls back to interpreted eval — don't put it on a hot path). Both are
  * exactly reproducible in ANSI SQL for the DuckDB oracle.
  *
  * Profiles are derived AT CLASS-INIT TIME from a small embedded training
  * corpus: top trigrams per language by frequency, minus trigrams shared by
  * 3+ languages (keep the discriminative tail, drop pan-European glue).
  * Deterministic by construction — same corpus, same profiles, same SQL.
  * Real systems load fastText-scale models; the operator shape (normalize →
  * per-language score → argmax with lexicographic tiebreak) and the scoring
  * kernel (occurrence counting via length-delta, embarrassingly parallel,
  * no shuffle) are what carry to 100 TB.
  */
object LangId {

  /** Embedded training corpus: ordinary function-word-dense prose, a few
    * sentences per language (ASCII-normalized — accents are folded to word
    * breaks by the [^a-z] normalizer on both engines). */
  val training: Map[String, Seq[String]] = Map(
    "en" -> Seq(
      "The quick brown fox jumps over the lazy dog and then it runs into the forest.",
      "She said that the results of the study were not what they had expected to find.",
      "This is the first time that we have seen such a thing in all of these years.",
      "He went to the market because he wanted to buy some bread and a little cheese.",
      "There are many people who think that the weather is going to change this week.",
      "What do you want to do when you finish with all of the work that you have."),
    "de" -> Seq(
      "Der schnelle braune Fuchs springt ueber den faulen Hund und laeuft in den Wald.",
      "Sie sagte, dass die Ergebnisse der Studie nicht das waren, was sie erwartet hatten.",
      "Das ist das erste Mal, dass wir so etwas in all diesen Jahren gesehen haben.",
      "Er ging auf den Markt, weil er etwas Brot und ein wenig Kaese kaufen wollte.",
      "Es gibt viele Menschen, die denken, dass sich das Wetter diese Woche aendern wird.",
      "Was willst du machen, wenn du mit der ganzen Arbeit fertig bist, die du hast."),
    "es" -> Seq(
      "El rapido zorro marron salta sobre el perro perezoso y luego corre hacia el bosque.",
      "Ella dijo que los resultados del estudio no eran lo que esperaban encontrar.",
      "Esta es la primera vez que vemos algo asi en todos estos anos de trabajo.",
      "El fue al mercado porque queria comprar un poco de pan y un poco de queso.",
      "Hay muchas personas que piensan que el tiempo va a cambiar esta semana.",
      "Que quieres hacer cuando termines con todo el trabajo que tienes que hacer."),
    "fr" -> Seq(
      "Le rapide renard brun saute par dessus le chien paresseux et court vers la foret.",
      "Elle a dit que les resultats de cette etude ne sont pas ce que nous attendions.",
      "C'est la premiere fois que nous voyons une telle chose dans toutes ces annees.",
      "Il est alle au marche parce qu'il voulait acheter du pain et un peu de fromage.",
      "Il y a beaucoup de gens qui pensent que le temps va changer cette semaine.",
      "Que veux tu faire quand tu auras fini avec tout le travail que tu as a faire."),
    "it" -> Seq(
      "La rapida volpe marrone salta sopra il cane pigro e poi corre verso il bosco.",
      "Lei ha detto che i risultati dello studio non erano quello che si aspettavano.",
      "Questa e la prima volta che vediamo una cosa del genere in tutti questi anni.",
      "Lui e andato al mercato perche voleva comprare del pane e un po di formaggio.",
      "Ci sono molte persone che pensano che il tempo stia per cambiare questa settimana.",
      "Che cosa vuoi fare quando avrai finito con tutto il lavoro che hai da fare."),
    "pt" -> Seq(
      "A rapida raposa marrom pula sobre o cachorro preguicoso e corre para a floresta.",
      "Ela disse que os resultados do estudo nao eram o que eles esperavam encontrar.",
      "Esta e a primeira vez que vemos uma coisa dessas em todos esses anos de trabalho.",
      "Ele foi ao mercado porque queria comprar um pouco de pao e um pouco de queijo.",
      "Ha muitas pessoas que pensam que o tempo vai mudar durante esta semana.",
      "O que voce quer fazer quando terminar com todo o trabalho que voce tem."))

  /** Languages, sorted — the argmax tiebreak order (and the oracle's). */
  val langs: Seq[String] = training.keys.toSeq.sorted

  private def normalizeStr(s: String): String =
    // Locale.ROOT: the default-locale toLowerCase folds capital I to dotless
    // U+0131 under tr/az locales, silently shifting the derived profiles
    // (and the generated oracle SQL) per machine — breaking the
    // deterministic-by-construction guarantee
    " " + s.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z]+", " ").trim + " "

  private def trigramsOf(s: String): Seq[String] = {
    val n = normalizeStr(s)
    if (n.length < 3) Seq.empty else n.sliding(3).toSeq
  }

  /** Deterministic profiles: per language, the top `poolK` trigrams by
    * training frequency (ties broken lexicographically), minus trigrams in
    * 3+ languages' pools, truncated to `keepK`. */
  def buildProfiles(poolK: Int = 48, keepK: Int = 28): Map[String, Seq[String]] = {
    val pools: Map[String, Seq[String]] = training.map { case (lg, texts) =>
      val freq = texts.flatMap(trigramsOf).groupBy(identity).map { case (g, xs) => g -> xs.size }
      lg -> freq.toSeq.sortBy { case (g, c) => (-c, g) }.take(poolK).map(_._1)
    }
    val inLangs: Map[String, Int] = pools.values.flatten
      .groupBy(identity).map { case (g, xs) => g -> xs.size }
    pools.map { case (lg, grams) =>
      lg -> grams.filter(g => inLangs(g) < 3).take(keepK)
    }
  }

  val profiles: Map[String, Seq[String]] = buildProfiles()

  // ------------------------------------------------------------ Spark side

  /** ` ` + lowercase + non-letters→single space + ` ` (identical in SQL). */
  def normalize(text: Column): Column =
    concat(lit(" "), trim(regexp_replace(lower(text), "[^a-z]+", " ")), lit(" "))

  /** Occurrence count of `gram` in `norm` × 3 (length delta; all grams are
    * trigrams so the constant factor cancels in the argmax). */
  private def hits(norm: Column, gram: String): Column =
    length(norm) - length(replace(norm, lit(gram), lit("")))

  /** Per-language score columns, aliased `score_<lang>`. */
  def scores(text: Column): Seq[Column] = {
    val n = normalize(text)
    langs.map(lg => profiles(lg).map(g => hits(n, g)).reduce(_ + _).as(s"score_$lg"))
  }

  /** Predicted language from pre-computed `score_<lang>` columns: argmax
    * with lexicographic tiebreak, `unknown` when no profile trigram hit. */
  def argmax: Column = {
    val maxScore = greatest(langs.map(lg => col(s"score_$lg")): _*)
    val ladder = langs.reverse.foldLeft(lit("unknown")) { (acc, lg) =>
      when(col(s"score_$lg") === maxScore, lit(lg)).otherwise(acc)
    }
    when(maxScore === 0, lit("unknown")).otherwise(ladder)
  }

  /** One-column convenience: classify `text` directly.
    *
    * Native kernel, not the Column ladder: 6 langs × 28 trigrams as a
    * length-delta Column tree is ~170 replace+length pairs whose generated
    * code overflows janino's 64 KB method limit — Spark silently falls back
    * to interpreted eval for the whole projection. The expression form is
    * one static call (counts + argmax fused, one profile loop over the
    * normalized text), stays inside whole-stage codegen, and reproduces the
    * `replace` length-delta semantics exactly (non-overlapping left-to-right
    * occurrence counts; ×3 cancels in the argmax). Same result as
    * `scores`+`argmax` and the generated DuckDB oracle SQL. */
  def predict(text: Column): Column =
    // NULL text classifies as 'unknown', matching predictSql (its CASE
    // falls through every NULL-valued WHEN into the ELSE); without the
    // coalesce the null-in-null-out expression returns NULL here only
    coalesce(
      ColumnShim.column(LangIdPredict(ColumnShim.expression(normalize(text)))),
      lit("unknown"))

  // ----------------------------------------------------------- oracle side

  /** The SAME classifier in DuckDB SQL, generated from the same profiles. */
  def normalizeSql(textExpr: String): String =
    s"' ' || trim(regexp_replace(lower($textExpr), '[^a-z]+', ' ', 'g')) || ' '"

  def scoreSql(normExpr: String, lg: String): String =
    profiles(lg).map(g =>
      s"(length($normExpr) - length(replace($normExpr, '$g', '')))").mkString(" + ")

  def predictSql(textExpr: String): String = {
    val n = normalizeSql(textExpr)
    val maxExpr = s"greatest(${langs.map(lg => scoreSql(n, lg)).mkString(", ")})"
    val ladder = langs.map(lg => s"WHEN ${scoreSql(n, lg)} = $maxExpr THEN '$lg'").mkString(" ")
    s"CASE WHEN $maxExpr = 0 THEN 'unknown' $ladder ELSE 'unknown' END"
  }
}

/** Static classifier kernel referenced from generated code: profiles are
  * deterministic class-init constants, so the whole per-row cost is one loop
  * over 6 × 28 trigram `indexOf` scans of the normalized text. */
object LangIdKernel {
  private val langU8: Array[UTF8String] =
    LangId.langs.map(UTF8String.fromString).toArray
  private val grams: Array[Array[UTF8String]] =
    LangId.langs.map(lg => LangId.profiles(lg).map(UTF8String.fromString).toArray).toArray
  private val unknown = UTF8String.fromString("unknown")

  /** Non-overlapping left-to-right occurrence count — exactly what
    * `length(s) - length(replace(s, g, ''))` measures (÷ gram length). */
  private def count(n: UTF8String, g: UTF8String): Int = {
    var c = 0
    var idx = n.indexOf(g, 0)
    val step = g.numChars()
    while (idx >= 0) { c += 1; idx = n.indexOf(g, idx + step) }
    c
  }

  /** Argmax over per-language profile-hit counts, lexicographic tiebreak
    * (langs are sorted; strict `>` keeps the first max), `unknown` on zero. */
  def predict(norm: UTF8String): UTF8String = {
    var best = 0
    var bestScore = 0
    var li = 0
    while (li < grams.length) {
      val gs = grams(li)
      var s = 0
      var gi = 0
      while (gi < gs.length) { s += count(norm, gs(gi)); gi += 1 }
      if (s > bestScore) { bestScore = s; best = li }
      li += 1
    }
    if (bestScore == 0) unknown else langU8(best)
  }
}

case class LangIdPredict(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "langid_predict"
  override def nullSafeEval(a: Any): Any =
    LangIdKernel.predict(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.ops.LangIdKernel.predict($a)")
  override protected def withNewChildInternal(c: Expression): LangIdPredict =
    copy(child = c)
}
