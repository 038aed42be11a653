package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Accuracy + determinism of the char-trigram language classifier on a
  * HELD-OUT labeled fixture (none of these sentences are in the training
  * corpus). The floor is 90% — a toy profile classifier over six related
  * European languages should clear it comfortably on plain prose. */
class LangIdSpec extends SparkTestBase {

  // held-out test sentences (label -> text), disjoint from LangId.training
  private val fixture: Seq[(String, String)] = Seq(
    "en" -> "I think that we should talk about what happened before anyone else hears it from the news.",
    "en" -> "The children were playing in the garden while their mother was reading a book under the tree.",
    "en" -> "Nobody knows exactly when the old bridge was built, but it has been there for a very long time.",
    "en" -> "After the meeting she wrote down everything that they had agreed to do next month.",
    "en" -> "It is not always easy to say what you mean when everyone is listening to you.",
    "de" -> "Ich denke, dass wir darueber sprechen sollten, was gestern in der Schule passiert ist.",
    "de" -> "Die Kinder spielten im Garten, waehrend ihre Mutter unter dem Baum ein Buch las.",
    "de" -> "Niemand weiss genau, wann die alte Bruecke gebaut wurde, aber sie steht schon sehr lange.",
    "de" -> "Nach der Sitzung schrieb sie alles auf, was sie fuer den naechsten Monat vereinbart hatten.",
    "de" -> "Es ist nicht immer einfach zu sagen, was man meint, wenn alle zuhoeren.",
    "es" -> "Creo que deberiamos hablar sobre lo que paso ayer antes de que alguien mas lo escuche.",
    "es" -> "Los ninos jugaban en el jardin mientras su madre leia un libro debajo del arbol.",
    "es" -> "Nadie sabe exactamente cuando se construyo el puente viejo, pero lleva alli mucho tiempo.",
    "es" -> "Despues de la reunion ella escribio todo lo que habian acordado hacer el proximo mes.",
    "es" -> "No siempre es facil decir lo que uno piensa cuando todos estan escuchando.",
    "fr" -> "Je pense que nous devrions parler de ce qui est arrive hier avant que quelqu'un d'autre ne l'apprenne.",
    "fr" -> "Les enfants jouaient dans le jardin pendant que leur mere lisait un livre sous l'arbre.",
    "fr" -> "Personne ne sait exactement quand le vieux pont a ete construit, mais il est la depuis longtemps.",
    "fr" -> "Apres la reunion elle a ecrit tout ce qu'ils avaient convenu de faire le mois prochain.",
    "fr" -> "Il n'est pas toujours facile de dire ce que l'on pense quand tout le monde ecoute.",
    "it" -> "Penso che dovremmo parlare di quello che e successo ieri prima che qualcun altro lo senta.",
    "it" -> "I bambini giocavano in giardino mentre la loro madre leggeva un libro sotto l'albero.",
    "it" -> "Nessuno sa esattamente quando fu costruito il vecchio ponte, ma e li da molto tempo.",
    "it" -> "Dopo la riunione lei ha scritto tutto quello che avevano deciso di fare il mese prossimo.",
    "it" -> "Non e sempre facile dire quello che pensi quando tutti ti stanno ascoltando.",
    "pt" -> "Acho que devemos falar sobre o que aconteceu ontem antes que outra pessoa ouca isso.",
    "pt" -> "As criancas brincavam no jardim enquanto a mae delas lia um livro debaixo da arvore.",
    "pt" -> "Ninguem sabe exatamente quando a ponte velha foi construida, mas ela esta la ha muito tempo.",
    "pt" -> "Depois da reuniao ela escreveu tudo o que eles tinham combinado fazer no proximo mes.",
    "pt" -> "Nem sempre e facil dizer o que voce pensa quando todos estao escutando.")

  test("held-out accuracy >= 0.9 across six languages; profiles are deterministic") {
    import spark.implicits._
    val df = fixture.toDF("label", "text")
      .withColumn("pred", LangId.predict(col("text")))
    val rows = df.collect()
    val correct = rows.count(r => r.getString(0) == r.getString(2))
    val acc = correct.toDouble / rows.length
    val misses = rows.filter(r => r.getString(0) != r.getString(2))
      .map(r => s"${r.getString(0)}->${r.getString(2)}: ${r.getString(1).take(40)}").mkString("\n")
    assert(acc >= 0.9, f"lang-id accuracy $acc%.2f < 0.90; misses:\n$misses")
    // profile derivation is deterministic (same corpus -> same profiles)
    assert(LangId.buildProfiles() == LangId.profiles)
    assert(LangId.langs == Seq("de", "en", "es", "fr", "it", "pt"))
    // every language keeps a usable profile after the shared-trigram filter
    LangId.profiles.foreach { case (lg, ps) =>
      assert(ps.size >= 10, s"$lg profile too small: ${ps.size}")
    }
  }

  test("degenerate inputs classify as unknown, never throw") {
    import spark.implicits._
    // NULL text included: the oracle's CASE ladder lands NULL in the ELSE
    // 'unknown' branch, so the engine must too (not null-propagate)
    val df = Seq(Some(""), Some("12345 67890 !!!"), Some("a"), None)
      .toDF("text")
      .select(LangId.predict(col("text")).as("pred"))
    assert(df.collect().map(_.getString(0)).forall(_ == "unknown"))
  }

  test("kernel predict ≡ the scores+argmax Column ladder (the readable spec)") {
    // the ladder is the documentation-grade formulation (it overflows
    // janino at this profile size and runs interpreted — never hot-path it);
    // this pins that the codegen'd kernel computes exactly the same thing
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val viaKernel = docs.select(col("doc_id"), LangId.predict(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaLadder = docs.select(col("doc_id") +: LangId.scores(col("text")): _*)
      .select(col("doc_id"), LangId.argmax.as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaKernel == viaLadder)
  }
}
