package graft.ops

import graft.SparkTestBase
import graft.SparkEntry

/** Every registered operator must run clean on the smoke-scale testdata, and
  * every oracle entry must have a matching query (the driver contract). */
class OpsSmokeSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("oracle map keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query names are unique") {
    val names = SparkEntry.allOps.map(_.name)
    assert(names.distinct.size == names.size)
  }

  SparkEntry.allOps.foreach { op =>
    test(s"${op.name} executes at sf0.001") {
      val df = op.fn(spark, dir)
      df.count() // force full execution
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("decontamination flags every planted benchmark quote") {
    import org.apache.spark.sql.functions._
    val hits = SparkEntry.queries("q46_decontamination")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val benchIds = Tables.t(spark, dir, "documents")
      .filter(col("doc_id") % 97 === 0).select("doc_id")
      .collect().map(_.getLong(0))
    assert(benchIds.nonEmpty)
    benchIds.foreach { b =>
      val quote = b + 2000000L
      assert(hits.contains(quote), s"planted quote doc $quote not flagged")
      val (grams, docs) = hits(quote)
      assert(grams >= 1 && grams <= 5, s"quote $quote: expected 1..5 shared 8-grams, got $grams")
      assert(docs >= 1, s"quote $quote matched no benchmark doc")
    }
  }

  test("repetition metrics: fractions bounded, flag consistent with threshold") {
    val rows = SparkEntry.queries("q47_repetition_quality")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nDTok) = (r.getLong(1), r.getLong(2))
      val dupTok = r.getDouble(3); val dupTri = r.getDouble(6)
      assert(nDTok <= nTok && nDTok > 0)
      assert(dupTok >= 0.0 && dupTok <= 1.0 && dupTri >= 0.0 && dupTri <= 1.0)
      assert(r.getBoolean(7) == (dupTri < 0.05), s"flag/threshold mismatch at ${r.getLong(0)}")
    }
    // the metric must discriminate: the synthetic corpus is low-vocab, so
    // duplicate tokens must exist somewhere without saturating everywhere
    assert(rows.exists(_.getDouble(3) > 0.0) && rows.exists(_.getDouble(6) < 1.0))
  }

  test("pii redaction scrubs every planted email/phone/ip and nothing else") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q58_pii_redaction")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    val orig = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(orig.keys.exists(_ % 13 == 0) && orig.keys.exists(_ % 13 != 0))
    orig.foreach { case (id, text) =>
      val (ne, np, ni, red) = out(id)
      if (id % 13 == 0) {
        assert(ne == 1 && np == 1 && ni == 1, s"doc $id: counts ($ne,$np,$ni)")
        assert(red.contains("[EMAIL]") && red.contains("[PHONE]") &&
          red.contains("[IP]"), s"doc $id: placeholder missing")
        assert(!red.contains("@") && !red.contains("555-"),
          s"doc $id: PII survived redaction")
        assert(red.startsWith(text), s"doc $id: non-PII prefix was altered")
      } else {
        assert(ne == 0 && np == 0 && ni == 0, s"clean doc $id flagged")
        assert(red == text, s"clean doc $id was altered by redaction")
      }
    }
  }

  test("line filter keeps only terminal-punctuation lines of >=5 words") {
    val rows = SparkEntry.queries("q59_line_filter")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nLines, nKept) = (r.getInt(1), r.getInt(2))
      val cleaned = r.getString(3)
      assert(nKept <= nLines)
      assert(r.getBoolean(4) == (nKept >= 3), s"flag mismatch at ${r.getLong(0)}")
      val keptLines = if (cleaned.isEmpty) Array.empty[String] else cleaned.split("\n")
      assert(keptLines.length == nKept)
      keptLines.foreach { l =>
        assert(l.trim.endsWith(".") &&
          l.trim.split(" ").count(_.nonEmpty) >= 5, s"bad kept line: '$l'")
      }
    }
    // the heuristics must discriminate on this corpus, not pass/fail everything
    assert(rows.exists(_.getInt(2) > 0) &&
      rows.exists(r => r.getInt(2) < r.getInt(1)))
  }

  test("shard layout: complete, contiguous positions per shard, stable across partitionings") {
    import org.apache.spark.sql.functions._
    val q = SparkEntry.queries("q60_shard_layout")
    val out = q(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val nDocs = Tables.t(spark, dir, "documents").count()
    assert(out.length == nDocs, "every document must land in exactly one shard slot")
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 16, s"shard $shard out of range")
      val pos = rows.map(_._3).sorted
      assert(pos.toSeq == (1 to rows.length), s"shard $shard positions not contiguous: ${pos.toSeq}")
    }
    // determinism: the layout is a pure function of doc_id — independent of
    // input partitioning (the audit property a rand() shuffle cannot give)
    val again = q(spark, dir).repartition(7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == out.toSet, "layout changed across partitionings")
  }

  test("q64 importance resample: target slice excluded, ranks total-ordered, deterministic") {
    val q = SparkEntry.queries("q64_importance_resample")
    val out = q(spark, dir).collect()
    assert(out.length == 50)
    assert(out.forall(_.getLong(0) % 97 != 0),
      "benchmark/target docs must not be scored into the training selection")
    val byRank = out.sortBy(_.getInt(3))
    byRank.sliding(2).foreach { case Array(a, b) =>
      val (sa, sb) = (a.getDouble(2), b.getDouble(2))
      assert(sa > sb || (sa == sb && a.getLong(0) < b.getLong(0)),
        s"rank order violated: $a before $b")
    }
    val again = q(spark, dir).collect().map(_.toSeq)
    assert(again.toSeq == out.map(_.toSeq).toSeq, "selection not reproducible")
  }

  test("q65 rebalance: under-represented strata kept whole, over-represented downsampled") {
    val out = SparkEntry.queries("q65_rebalance_mix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val total = out.map(_._2).sum
    val nLangs = out.length
    out.foreach { case (lang, nDocs, nKept) =>
      assert(nKept <= nDocs, s"$lang kept more than it has")
      if (nDocs.toDouble * nLangs <= total)
        assert(nKept == nDocs, s"under-represented $lang was downsampled ($nKept/$nDocs)")
      else
        assert(nKept < nDocs, s"over-represented $lang not downsampled ($nKept/$nDocs)")
    }
    // downsampled strata land near the uniform target share
    out.filter { case (_, nDocs, _) => nDocs.toDouble * nLangs > total }
      .foreach { case (lang, _, nKept) =>
        val target = total.toDouble / nLangs
        assert(math.abs(nKept - target) / target < 0.25,
          s"$lang kept $nKept vs uniform target $target")
      }
  }

  test("q66 funnel: every stage removes exactly its planted ground truth") {
    import org.apache.spark.sql.functions._
    val docs = Tables.t(spark, dir, "documents")
    val nBench = docs.filter(col("doc_id") % 97 === 0).count()
    val nBase = docs.filter(col("doc_id") % 97 =!= 0).count()
    val nDupes = docs.filter(col("doc_id") % 97 =!= 0 && col("doc_id") % 7 === 0).count()
    val stages = SparkEntry.queries("q66_curation_funnel")(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(stages.keySet == Set(0, 1, 2, 3))
    val (raw, s1, s2, s3) = (stages(0), stages(1), stages(2), stages(3))
    assert(raw._1 == nBase + nDupes + nBench, "raw = base + injected dupes + planted quotes")
    assert(s1._1 == raw._1 - nDupes, "exact dedup removes exactly the injected duplicates")
    assert(s2._1 <= s1._1 - nBench, "decontamination removes at least the planted quotes")
    assert(s3._1 < s2._1, "rebalancing must downsample the over-represented language")
    // chars shrink monotonically with docs
    assert(raw._2 > s1._2 && s1._2 > s2._2 && s2._2 > s3._2)
  }

  test("q75 tokenize-ids: sequence length exact, UNK bounded, ids in vocab range") {
    val rows = SparkEntry.queries("q75_tokenize_ids")(spark, dir).collect()
    assert(rows.length == Tables.t(spark, dir, "documents").count())
    rows.foreach { r =>
      val (nTok, nUnk, csv) = (r.getLong(1), r.getLong(2), r.getString(3))
      val ids = if (csv.isEmpty) Array.empty[Int] else csv.split(",").map(_.toInt)
      assert(ids.length == nTok, s"doc ${r.getLong(0)}: ids vs n_tokens")
      assert(ids.count(_ == 0) == nUnk)
      assert(ids.forall(i => i >= 0 && i <= 20), "id outside vocab+UNK range")
    }
    // a 20-term vocab over a 31-term corpus must produce UNKs without
    // saturating: both mapped and unmapped tokens exist
    assert(rows.exists(_.getLong(2) > 0) &&
      rows.exists(r => r.getLong(2) < r.getLong(1)))
  }

  test("batched decode plumbing: per-partition codec, typed output, deterministic") {
    import org.apache.spark.sql.functions._
    val assets = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"), col("text").cast("binary").as("payload"))
    val out = MultimodalOps.decodeBatched(assets)
    assert(out.columns.toSeq ==
      Seq("assetId", "width", "height", "channels", "nBytes", "digest"))
    val r1 = out.collect().map(_.toString).sorted
    val r2 = MultimodalOps.decodeBatched(assets.repartition(7)).collect()
      .map(_.toString).sorted
    assert(r1.toSeq == r2.toSeq) // partitioning-invariant
    assert(out.filter(col("nBytes") <= 0).count() == 0)
  }

  test("multimodal pipeline: schema, determinism, frame shape") {
    val q = SparkEntry.queries("q32_multimodal_pipeline")
    val a = q(spark, dir)
    assert(a.columns.toSeq == Seq("asset_id", "source", "width", "height",
      "channels", "n_frames", "first_frame_digest"))
    val r1 = a.collect().map(_.toSeq).toSet
    val r2 = q(spark, dir).collect().map(_.toSeq).toSet
    assert(r1 == r2)
    import org.apache.spark.sql.functions._
    assert(a.filter(col("n_frames") < 1 || col("width") < 16 ||
      col("height") < 16 || !col("channels").between(1, 3)).count() == 0)
  }
}
