package graft.ops

import graft.SparkTestBase
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Ground-truth checks for the code-payload curation operators (q72–q74):
  * every planted artifact (autogen header, minified blob, secret, SPDX
  * header) must be detected, nothing else may be touched, and each filter
  * must discriminate on the corpus rather than pass/fail everything. */
class CodeOpsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("q72 code quality: planted artifacts drive the flags; filter discriminates") {
    val rows = SparkEntry.queries("q72_code_quality")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (nLines, maxLen) = (r.getLong(1), r.getLong(2))
      val (avgLen, alnum) = (r.getDouble(3), r.getDouble(4))
      val (autogen, keep) = (r.getBoolean(5), r.getBoolean(6))
      assert(nLines >= 1 && maxLen >= 1 && avgLen > 0 && alnum >= 0 && alnum <= 1)
      assert(autogen == (id % 17 == 0), s"doc $id: autogen flag wrong")
      if (id % 17 != 0 && id % 11 == 0)
        assert(maxLen >= 1200, s"doc $id: minified blob line missing")
      assert(keep == (maxLen <= 1000 && avgLen <= 100.0 &&
        alnum >= 0.25 && !autogen), s"doc $id: keep rule inconsistent")
    }
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)),
      "filter must discriminate on this corpus")
    // every planted blob (not shadowed by the autogen branch) is dropped
    rows.filter(r => r.getLong(0) % 17 != 0 && r.getLong(0) % 11 == 0)
      .foreach(r => assert(!r.getBoolean(6), s"blob doc ${r.getLong(0)} kept"))
  }

  test("q73 secret scan: every planted secret found and redacted, clean docs untouched") {
    val out = SparkEntry.queries("q73_secret_scan")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getBoolean(5)))
      .toMap
    val orig = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(orig.keys.exists(_ % 19 == 0) && orig.keys.exists(id =>
      id % 19 != 0 && id % 23 != 0 && id % 29 != 0))
    orig.foreach { case (id, text) =>
      val (aws, api, pem, red, flag) = out(id)
      assert(aws == (if (id % 19 == 0) 1 else 0), s"doc $id aws count $aws")
      assert(api == (if (id % 23 == 0) 1 else 0), s"doc $id api count $api")
      assert(pem == (if (id % 29 == 0) 1 else 0), s"doc $id pem count $pem")
      assert(flag == (aws + api + pem > 0))
      if (flag) {
        assert(!red.contains("AKIA") && !red.contains("api_key=") &&
          !red.contains("BEGIN RSA") && !red.contains("MIIEow") &&
          !red.contains("END RSA"), s"doc $id: secret survived redaction")
        assert(red.startsWith(text), s"doc $id: non-secret prefix altered")
      } else assert(red == text, s"clean doc $id was altered")
    }
  }

  test("q74 license rollup: partition of the corpus, category mapping exact") {
    val rows = SparkEntry.queries("q74_license_classify")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables.t(spark, dir, "documents").count()
    assert(rows.map(_._3).sum == nDocs, "every doc classified exactly once")
    val cats = rows.map(r => r._1 -> r._2).toMap
    assert(cats("MIT") == "permissive" && cats("Apache-2.0") == "permissive")
    assert(cats("GPL-3.0-only") == "copyleft")
    assert(cats("NOASSERTION") == "unknown")
    assert(rows.forall(_._4 > 0))
    // synthesis shape: MIT and Apache-2.0 each cover ~1/3 of the corpus
    val mit = rows.find(_._1 == "MIT").get._3
    assert(math.abs(mit - nDocs / 3.0) <= nDocs / 10.0 + 2)
  }
}
