package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import Tables._

/** Text-analysis operators for a training-data pipeline over `documents`
  * (doc_id, text, lang, source, n_chars): quality scoring, token counting,
  * fingerprinting, canonicalization, language-ID. All pure Column
  * compositions (codegen'd, no UDFs) except where noted. */
object TextOps {

  /** Canonical token-set digest: lower → split → drop empties → distinct →
    * sort → join → md5 (reference analogue: the composite-modality
    * canonicalizer, sync/modalities.py:56-101 / utils.py:20-31). */
  def canonicalDigest(text: Column): Column =
    md5(array_join(array_sort(array_distinct(DedupOps.tokens(text))), ","))

  /** Whitespace-collapsed lowercase fingerprint (document identity under
    * formatting noise). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is",
    "it", "on", "for", "with", "as", "at", "by", "from")

  /** PII patterns shared by the Spark query and its DuckDB oracle (q58).
    * Kept inside the ASCII regex subset where Java regex and RE2 agree. */
  val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiPhoneRe = "\\b555-[0-9]{4}\\b"
  val piiIpRe = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  val all: Seq[OpQuery] = Seq(

    // Quality scoring: length/word/punctuation/stopword features + a
    // composite keep/drop flag — the standard pre-training filter shape.
    OpQuery("q23_text_quality",
      (s, d) => {
        val words = split(col("text"), " ")
        val nWords = size(words)
        val punct = length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))
        val stopHits = size(filter(words, w => w.isin(stopwords: _*)))
        t(s, d, "documents").select(
          col("doc_id"),
          length(col("text")).as("n_chars_actual"),
          nWords.as("n_words"),
          punct.as("n_punct"),
          stopHits.as("n_stopwords"),
          (length(col("text")) >= 100 && nWords >= 20).as("passes_quality"))
      },
      Some(s"""SELECT doc_id, length(text) AS n_chars_actual,
              |  len(string_split(text, ' ')) AS n_words,
              |  length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
              |  len(list_filter(string_split(text, ' '), w -> w IN (${stopwords.map(w => s"'$w'").mkString(",")}))) AS n_stopwords,
              |  length(text) >= 100 AND len(string_split(text, ' ')) >= 20 AS passes_quality
              |FROM documents""".stripMargin)),

    // Token counting: whitespace tokens + a BPE-ish regex token count
    // (alpha runs / digit runs / single punctuation marks).
    OpQuery("q24_token_count",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)")).as("bpe_ish_tokens")),
      Some("""SELECT doc_id,
             |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
             |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_ish_tokens
             |FROM documents""".stripMargin)),

    // Document fingerprinting (F11-style deterministic identity — no uuid()).
    OpQuery("q25_fingerprint",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"),
        canonicalDigest(col("text")).as("token_set_digest")),
      Some("""SELECT doc_id,
             |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
             |  md5(array_to_string(list_sort(list_distinct(
             |    list_filter(string_split(lower(text), ' '), x -> x <> ''))), ',')) AS token_set_digest
             |FROM documents""".stripMargin)),

    // Deterministic stratified sampling — the training-data curation
    // primitive: a stable arithmetic-hash threshold on the document id keeps
    // an exact, REPRODUCIBLE ~10% of every stratum (re-running the pipeline,
    // or running it on a different cluster, selects the same documents — a
    // rand() sample can't be audited or diffed). Pure int arithmetic so the
    // predicate is engine-neutral — with BOTH divergence traps closed: the
    // inner modulus bounds the product (100003 × 2654435761 ≪ 2^63, so
    // Spark's wrapping and DuckDB's checked multiplication agree), and the
    // oracle spells pmod as ((x % m) + m) % m because SQL's % keeps the
    // dividend's sign while Spark's pmod is always non-negative — a bare %
    // would sample EVERY negative doc_id on the DuckDB side.
    OpQuery("q44_stratified_sample",
      (s, d) => t(s, d, "documents")
        .filter(pmod(pmod(col("doc_id"), lit(100003L)) * lit(2654435761L),
          lit(1000000L)) < lit(100000L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars")).as("chars_sampled")),
      Some("""SELECT lang, count(*) AS n_sampled,
             |  CAST(sum(n_chars) AS BIGINT) AS chars_sampled
             |FROM documents
             |WHERE (((doc_id % 100003) + 100003) % 100003 * 2654435761) % 1000000 < 100000
             |GROUP BY 1""".stripMargin)),

    // A3 — ordered distinct string_agg per group (reference:
    // string_agg(DISTINCT ... ORDER BY ...), queries/dim_technicians.py:4-11).
    OpQuery("q12_string_agg_sorted",
      (s, d) => t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(array_join(array_sort(collect_set(col("source"))), ",").as("sources"),
          count(lit(1)).as("n_docs")),
      Some("""SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
             |  count(*) AS n_docs
             |FROM documents GROUP BY lang""".stripMargin)),

    // F4/F5 — trim/nullif/coalesce fallback chains with empty-string-as-null
    // (reference: name_es or name or identifier, sync/modalities.py:122-125).
    OpQuery("q14_coalesce_fallbacks",
      (s, d) => {
        def nullWhenEmpty(c: Column): Column = when(trim(c) === "", lit(null)).otherwise(trim(c))
        t(s, d, "documents").select(
          col("doc_id"),
          coalesce(nullWhenEmpty(col("source")), nullWhenEmpty(col("lang")), lit("unknown")).as("label"))
          .groupBy(col("label")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT coalesce(nullif(trim(source), ''), nullif(trim(lang), ''), 'unknown') AS label,
             |  count(*) AS n
             |FROM documents GROUP BY 1""".stripMargin)),

    // F6 — first-true fallback + merge of two comma-packed string-sets into
    // one sorted canonical pack (reference: `first_true` + combine-and-sort
    // of two dicts' values, utils.py:15-31, feeding the composite-modality
    // upsert).
    OpQuery("q34_pack_merge",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          array_join(array_sort(array_distinct(filter(
            concat(split(col("source"), ","), split(col("lang"), ",")),
            x => x =!= ""))), ",").as("merged_pack"))
        .groupBy(col("merged_pack")).agg(count(lit(1)).as("n")),
      Some("""SELECT array_to_string(list_sort(list_distinct(list_filter(
             |    list_concat(string_split(source, ','), string_split(lang, ',')),
             |    x -> x <> ''))), ',') AS merged_pack,
             |  count(*) AS n
             |FROM documents GROUP BY 1""".stripMargin)),

    // Language-ID: character-trigram profile classifier (LangId — profiles
    // trained at init from an embedded corpus), argmax with deterministic
    // tiebreak. Pure Column kernel (occurrence counts via length-delta, no
    // shuffle); the oracle runs the IDENTICAL classifier generated into
    // DuckDB SQL from the same profiles. Accuracy is asserted on a labeled
    // multilingual fixture in LangIdSpec (the synthetic `documents` corpus
    // draws every lang label from one English-ish vocabulary, so accuracy
    // there is meaningless by construction).
    OpQuery("q29_lang_id",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
        col("lang").as("labeled_lang"),
        LangId.predict(col("text")).as("predicted_lang")),
      Some(s"""SELECT doc_id, lang AS labeled_lang,
              |  ${LangId.predictSql("text")} AS predicted_lang
              |FROM documents""".stripMargin)),

    // Benchmark DECONTAMINATION — the eval-leak scan every training-data
    // pipeline runs before a corpus ships: flag training documents sharing
    // any word 8-gram with a held-out benchmark set. The benchmark here is
    // a deterministic slice (doc_id % 97 = 0) and contamination is INJECTED
    // (one synthetic doc per benchmark doc quoting its first 12 tokens
    // under id+2,000,000), so the detector has planted positives in both
    // engines. Scale shape: the benchmark n-gram table is tiny by
    // definition → broadcast hash join against the corpus n-gram explode,
    // counts partial-agg'd per doc — corpus-sized scan, no corpus shuffle
    // beyond the per-doc count.
    OpQuery("q46_decontamination",
      (s, d) => {
        val docs = t(s, d, "documents")
        val bench = docs.filter(col("doc_id") % 97 === 0)
        val quotes = bench.select(
          (col("doc_id") + 2000000L).as("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 12), " ").as("text"))
        val corpus = docs.filter(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"), col("text")).unionByName(quotes)
        def grams(df: org.apache.spark.sql.DataFrame, idAs: String) = df.select(
          col("doc_id").as(idAs),
          explode(array_distinct(DedupOps.shingles(col("text"), 8))).as("gram"))
        // spread: the corpus-side 8-gram explode is the hot kernel and the
        // single-file source planned 2 tasks (r6 profile)
        grams(Tables.spread(corpus), "doc_id")
          .join(broadcast(grams(bench, "bench_id")), Seq("gram"))
          .groupBy(col("doc_id"))
          .agg(count_distinct(col("gram")).as("n_hit_ngrams"),
            count_distinct(col("bench_id")).as("n_bench_docs"))
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
             |  UNION ALL
             |  SELECT doc_id + 2000000, array_to_string(string_split(text, ' ')[1:12], ' ')
             |  FROM documents WHERE doc_id % 97 = 0),
             |cg AS (
             |  SELECT doc_id, unnest(list_distinct(
             |    CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
             |         ELSE list_transform(generate_series(1, len(tk) - 7),
             |                i -> array_to_string(tk[i:i+7], ' ')) END)) AS gram
             |  FROM (SELECT doc_id,
             |          list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
             |        FROM corpus)),
             |bg AS (
             |  SELECT doc_id AS bench_id, unnest(list_distinct(
             |    CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
             |         ELSE list_transform(generate_series(1, len(tk) - 7),
             |                i -> array_to_string(tk[i:i+7], ' ')) END)) AS gram
             |  FROM (SELECT doc_id,
             |          list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
             |        FROM documents WHERE doc_id % 97 = 0))
             |SELECT cg.doc_id, count(DISTINCT cg.gram) AS n_hit_ngrams,
             |  count(DISTINCT bg.bench_id) AS n_bench_docs
             |FROM cg JOIN bg USING (gram) GROUP BY 1""".stripMargin)),

    // Training-chunk preparation: split every document into fixed-size
    // token windows with overlap (32-token chunks, stride 24 = 8-token
    // overlap) — the step that turns a curated corpus into model-ready
    // sequences. Pure per-row generate-and-explode: no shuffle, output ∝
    // corpus tokens, embarrassingly parallel at 100 TB.
    OpQuery("q48_chunking",
      (s, d) => {
        val chunkSize = 32; val stride = 24
        val toks = DedupOps.tokens(col("text"))
        val chunks = transform(
          sequence(lit(0), floor((size(toks) - 1) / stride).cast("int")),
          k => slice(toks, k * stride + 1, lit(chunkSize)))
        t(s, d, "documents")
          // zero-token docs emit NO chunks (matching generate_series(0,-1)
          // = empty in the oracle); unguarded, Spark's sequence(0, -1)
          // auto-infers step -1 and would emit two phantom empty chunks
          .filter(size(toks) > 0)
          .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "c")))
          .select(col("doc_id"), col("chunk_idx"),
            array_join(col("c"), " ").as("chunk_text"),
            size(col("c")).cast("long").as("n_chunk_tokens"))
      },
      Some("""SELECT doc_id,
             |  unnest(list_transform(generate_series(0, (len(tk) - 1) // 24),
             |    k -> {'chunk_idx': CAST(k AS INT),
             |          'chunk_text': array_to_string(tk[k*24+1 : k*24+32], ' '),
             |          'n_chunk_tokens': len(tk[k*24+1 : k*24+32])}),
             |    recursive := true)
             |FROM (SELECT doc_id,
             |        list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
             |      FROM documents)""".stripMargin)),

    // Exact interpolated percentiles per group (the reference-shaped
    // "distribution health" rollup): Spark's percentile aggregate and
    // DuckDB's quantile_cont share the linear-interpolation definition, so
    // the oracle is exact. At scale percentile is a sort-free
    // partial-aggregable sketch in Spark's ObjectHashAggregate.
    OpQuery("q49_percentile_rollup",
      (s, d) => t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(expr("percentile(n_chars, 0.5)"), 6).as("p50_chars"),
          round(expr("percentile(n_chars, 0.95)"), 6).as("p95_chars")),
      Some("""SELECT lang, count(*) AS n_docs,
             |  round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
             |  round(quantile_cont(n_chars, 0.95), 6) AS p95_chars
             |FROM documents GROUP BY 1""".stripMargin)),

    // Multi-level aggregation (ROLLUP): per-(lang, source) counts plus the
    // lang subtotals and the grand total in ONE pass — Spark expands the
    // grouping sets map-side, so the exchange still carries partial
    // aggregates (not input rows) for every level at once. grouping_id
    // disambiguates "null because rolled up" from a null group value.
    OpQuery("q50_rollup",
      (s, d) => t(s, d, "documents")
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
          grouping_id().as("gid")),
      Some("""SELECT lang, source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS chars,
             |  GROUPING(lang, source) AS gid
             |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin)),

    // PIVOT: language-by-quintile-source matrix (docs counted into one
    // column per source bucket). Explicit pivot values keep the plan fully
    // aggregated before every exchange: partial count per (lang, bucket),
    // then partial pivotfirst per lang — both shuffles carry one partial
    // row per group, never input rows. The oracle spells the same matrix
    // as FILTERed counts.
    OpQuery("q51_pivot",
      (s, d) => {
        val bucket = regexp_replace(col("source"), "[^0-9]", "").cast("int") % 5
        t(s, d, "documents")
          .groupBy(col("lang"))
          .pivot(bucket.cast("string").as("srcb"), Seq("0", "1", "2", "3", "4"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .select(col("lang"), col("0").as("b0"), col("1").as("b1"),
            col("2").as("b2"), col("3").as("b3"), col("4").as("b4"))
      },
      Some("""SELECT lang,
             |  count(*) FILTER (CAST(regexp_replace(source, '[^0-9]', '', 'g') AS INT) % 5 = 0) AS b0,
             |  count(*) FILTER (CAST(regexp_replace(source, '[^0-9]', '', 'g') AS INT) % 5 = 1) AS b1,
             |  count(*) FILTER (CAST(regexp_replace(source, '[^0-9]', '', 'g') AS INT) % 5 = 2) AS b2,
             |  count(*) FILTER (CAST(regexp_replace(source, '[^0-9]', '', 'g') AS INT) % 5 = 3) AS b3,
             |  count(*) FILTER (CAST(regexp_replace(source, '[^0-9]', '', 'g') AS INT) % 5 = 4) AS b4
             |FROM documents GROUP BY 1""".stripMargin)),

    // UNPIVOT (melt): per-document metric columns reshaped to long-form
    // (doc_id, metric, value) rows — the shape metric stores and quality
    // dashboards ingest. Spark's unpivot plans an Expand (row generation
    // inside the scan stage): zero shuffle, 3× rows out of one pass. The
    // oracle spells the same reshape as UNION ALL.
    OpQuery("q53_unpivot",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), col("n_chars").as("chars"),
          (length(col("text")) - length(regexp_replace(col("text"), "\n", "")) +
            lit(1L)).cast("long").as("lines"),
          length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("digits"))
        .unpivot(Array(col("doc_id")),
          Array(col("chars"), col("lines"), col("digits")), "metric", "value"),
      Some("""WITH m AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS chars,
             |  CAST(length(text) - length(replace(text, chr(10), '')) + 1 AS BIGINT) AS lines,
             |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digits
             |  FROM documents)
             |SELECT doc_id, 'chars' AS metric, chars AS value FROM m
             |UNION ALL SELECT doc_id, 'lines', lines FROM m
             |UNION ALL SELECT doc_id, 'digits', digits FROM m""".stripMargin)),

    // Tokenizer vocabulary induction: per-language top-20 terms by total
    // occurrence — the first pass of BPE/unigram vocab training. Shape at
    // 100 TB: the (lang, term) count partial-aggregates map-side, so the
    // exchange carries vocab-sized partials (≪ corpus tokens); the ranking
    // window then runs over the AGGREGATED vocab table, never the corpus.
    // (count desc, term asc) is a total order per lang → deterministic ranks.
    OpQuery("q55_vocab_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val counts = t(s, d, "documents")
          .select(col("lang"),
            explode(DedupOps.tokens(col("text"))).as("term"))
          .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("term").asc)
        counts.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 20)
      },
      Some("""WITH tc AS (
             |  SELECT lang, unnest(list_filter(string_split(lower(text), ' '),
             |    x -> x <> '')) AS term FROM documents),
             |c AS (SELECT lang, term, count(*) AS n FROM tc GROUP BY 1, 2)
             |SELECT lang, term, n, rnk FROM (
             |  SELECT lang, term, n, CAST(row_number() OVER (
             |    PARTITION BY lang ORDER BY n DESC, term) AS INT) AS rnk FROM c)
             |WHERE rnk <= 20""".stripMargin)),

    // Rare-term (OOV-ish) density scoring: per-term document frequency over
    // the corpus, folded back per document as the count of distinct terms
    // whose DF is below 10% of corpus size — the "this doc is full of
    // tokens the model will barely see" quality signal. Integer arithmetic
    // throughout (exact cross-engine). Scale shape: doc→distinct-term pairs
    // are per-row array_distinct (no dedup shuffle); the DF table is
    // vocab-sized and the broadcast() hint PINS it broadcast (the hint
    // overrides the size threshold — for corpora whose vocab outgrows
    // executor memory, e.g. code-identifier vocabularies, remove the hint
    // and the join shuffles on term instead; either way never corpus²);
    // the final per-doc count partial-aggregates.
    OpQuery("q56_rare_term_score",
      (s, d) => {
        val docs = t(s, d, "documents")
        val docTerms = docs.select(col("doc_id"),
          explode(array_distinct(DedupOps.tokens(col("text")))).as("term"))
        val dfT = docTerms.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val total = docs.agg(count(lit(1)).as("n_corpus"))
        docTerms
          .join(broadcast(dfT.crossJoin(total)), Seq("term"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_terms"),
            sum(when(col("df") * 10 < col("n_corpus"), 1L).otherwise(0L))
              .as("n_rare_terms"),
            min(col("df")).as("min_df"))
      },
      Some("""WITH dt AS (
             |  SELECT doc_id, unnest(list_distinct(list_filter(
             |    string_split(lower(text), ' '), x -> x <> ''))) AS term
             |  FROM documents),
             |df AS (SELECT term, count(*) AS df FROM dt GROUP BY 1),
             |n AS (SELECT count(*) AS n_corpus FROM documents)
             |SELECT doc_id, count(*) AS n_terms,
             |  CAST(sum(CASE WHEN df * 10 < n_corpus THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_rare_terms,
             |  min(df) AS min_df
             |FROM dt JOIN df USING (term) CROSS JOIN n
             |GROUP BY 1""".stripMargin)),

    // Sequence packing: lay each language's documents end-to-end into
    // fixed-budget (512-token) training sequences — every doc gets the
    // sequence id and token offset where it starts in the packed stream.
    // The deterministic contiguous-fill spec (order by doc_id) makes the
    // layout reproducible and auditable across engines and re-runs. One
    // hash exchange on the window partition + a partition-local sort; at
    // corpus scale the partition key is (lang, shard) so no single
    // language funnels through one task — the cumulative offsets then
    // continue across shards by adding per-shard token totals (one tiny
    // second pass over shard sums).
    OpQuery("q57_sequence_packing",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = size(DedupOps.tokens(col("text")))
          .cast("long")
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        t(s, d, "documents")
          .select(col("doc_id"), col("lang"), toks.as("n_tokens"))
          .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            expr("start_tok DIV 512").as("seq_id"),
            pmod(col("start_tok"), lit(512L)).as("tok_offset"))
      },
      Some("""WITH m AS (SELECT doc_id, lang,
             |  CAST(len(list_filter(string_split(lower(text), ' '),
             |    x -> x <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (SELECT doc_id, lang, n_tokens,
             |  CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
             |    - n_tokens AS BIGINT) AS start_tok FROM m)
             |SELECT doc_id, lang, n_tokens, start_tok // 512 AS seq_id,
             |  start_tok % 512 AS tok_offset FROM c""".stripMargin)),

    // Deterministic shard layout — the data-loader handoff after curation:
    // every kept document gets its (shard_id, shard_pos) in a pseudo-random
    // but fully REPRODUCIBLE global order (training-order shuffles must be
    // auditable and identical across re-runs and engines — a rand() shuffle
    // is neither). The shuffle key is the same engine-neutral arithmetic
    // hash as q44 (bounded product, pmod spelled sign-safely in SQL); ties
    // are impossible to matter because doc_id totalizes the order. Plan
    // shape: ONE hash exchange on shard_id + a partition-local sort. Shard
    // count scales with the corpus (16 here; thousands at 100 TB), and a
    // shard too large for one task uses the same (shard, subshard) two-pass
    // offset fix-up documented on q57.
    OpQuery("q60_shard_layout",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val h = pmod(pmod(col("doc_id"), lit(100003L)) * lit(2654435761L),
          lit(1000000007L))
        val w = Window.partitionBy(col("shard_id"))
          .orderBy(col("h"), col("doc_id"))
        t(s, d, "documents")
          .select(col("doc_id"), h.as("h"))
          .withColumn("shard_id", pmod(col("h"), lit(16L)))
          .withColumn("shard_pos", row_number().over(w))
          .select(col("doc_id"), col("shard_id"), col("shard_pos"))
      },
      Some("""WITH h AS (SELECT doc_id,
             |  (((doc_id % 100003) + 100003) % 100003 * 2654435761)
             |    % 1000000007 AS h
             |  FROM documents)
             |SELECT doc_id, h % 16 AS shard_id,
             |  CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id)
             |    AS INT) AS shard_pos
             |FROM h""".stripMargin)),

    // Per-domain diversity capping — keep at most K documents per domain
    // (source = the domain stand-in), the longest first: the web-pipeline
    // pass that stops one boilerplate-heavy domain from dominating the
    // corpus mix. The oracle spells it as the standard
    // row_number-over-window ≤ K — but that window shuffles EVERY corpus
    // row to its domain's reducer and sorts whole domains there, which at a
    // billion docs per hot domain is the job. The Spark plan instead uses
    // the native bounded-buffer aggregate [[graft.functions.TopKBy]]
    // (ObjectHashAggregate, map-side partial): each map task retains ≤ K
    // winner rows per domain, the exchange carries ≤ K rows per (domain,
    // map task), and no Window/global sort appears (PlanSpec-guarded).
    // Ranking is totalized — (n_chars DESC, doc_id ASC) — for replay
    // determinism.
    OpQuery("q68_domain_topk",
      (s, d) => {
        graft.functions.LwwMaxBy.tuneSession(s) // keep ObjectHashAgg hashing past 128 groups
        t(s, d, "documents")
          .groupBy(col("source"))
          .agg(graft.functions.TopKBy.topKBy(
            struct(col("doc_id"), col("n_chars")),
            col("n_chars").cast("long"), col("doc_id").cast("long"), 3).as("top"))
          .select(col("source"), posexplode(col("top")))
          .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
            col("col.doc_id").as("doc_id"), col("col.n_chars").as("n_chars"))
      },
      Some("""SELECT source, rank, doc_id, n_chars FROM (
             |  SELECT source, doc_id, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id) AS rank
             |  FROM documents)
             |WHERE rank <= 3""".stripMargin)),

    // DSIR-style importance resampling — score every corpus document by how
    // much its hashed-unigram distribution looks like a target slice (here
    // q46's held-out benchmark slice, doc_id % 97 = 0), the data-selection
    // pass behind "train on web data that resembles the target domain".
    // Features are md5-bucketed words (md5 is the engine-neutral string
    // hash, as in q25; bucket = last two hex chars % 64), the weight is the
    // standard log-likelihood ratio under Laplace smoothing, and the final
    // per-doc score is rounded to 6 decimals so double accumulation order
    // never flips a rank (ties totalized by doc_id). Scale shape: the
    // 64-row bucket dictionary broadcasts; the corpus pays one tokenize +
    // one partial-agg'd per-doc sum; top-k is TakeOrderedAndProject.
    OpQuery("q64_importance_resample",
      (s, d) => {
        val docs = t(s, d, "documents")
        val b = docs.select(col("doc_id"), col("lang"),
            explode(DedupOps.tokens(col("text"))).as("w"))
          .select(col("doc_id"), col("lang"),
            pmod(conv(substring(md5(col("w")), 31, 2), 16, 10).cast("long"),
              lit(64L)).as("bucket"))
        // ONE bucket-keyed aggregation with conditional counts instead of
        // two (tgt/raw) + a full_outer re-join: the md5-bucket explode is
        // the query's hot kernel and this halves its evaluations on the
        // dictionary side (r6; guide §2.4 — share the exchange). sum(when)
        // is NULL for a side with no words in the bucket, exactly like the
        // missing side of the old full_outer.
        val grid = b.groupBy(col("bucket")).agg(
          sum(when(col("doc_id") % 97 === 0, 1L)).as("ct"),
          sum(when(col("doc_id") % 97 =!= 0, 1L)).as("cr"))
        // the 64-row bucket grid is aggregate-result-sized BY CONSTRUCTION
        // (the DSIR dictionary) — collect it ONCE and fold the LLR into a
        // map literal: the old totals-subquery + ratio-broadcast re-derived
        // the md5-bucket explode twice more and cost two extra jobs (r6).
        // Same doubles: exact integer counts in, the same (c+1.0)/(T+64)
        // division and Math.log on the driver as the Column form ran per row.
        val gridRows = grid.collect()
        def cnt(r: org.apache.spark.sql.Row, i: Int): Long =
          if (r.isNullAt(i)) 0L else r.getLong(i)
        val t64 = gridRows.map(cnt(_, 1)).sum + 64L
        val r64 = gridRows.map(cnt(_, 2)).sum + 64L
        val lrMap = gridRows.map { r =>
          r.getLong(0) -> math.log(((cnt(r, 1) + 1.0) / t64) /
            ((cnt(r, 2) + 1.0) / r64))
        }.toMap
        val scored = b.filter(col("doc_id") % 97 =!= 0)
          .withColumn("lr", element_at(typedlit(lrMap), col("bucket")))
          .groupBy(col("doc_id"), col("lang"))
          .agg(round(sum(col("lr")), 6).as("score"))
        rankedTopK(scored, 50, col("score").desc, col("doc_id").asc)
      },
      Some("""WITH words AS (
             |  SELECT doc_id, lang,
             |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
             |  FROM documents),
             |b AS (
             |  SELECT doc_id, lang,
             |    ((strpos('0123456789abcdef', substr(md5(w), 31, 1)) - 1) * 16 +
             |     (strpos('0123456789abcdef', substr(md5(w), 32, 1)) - 1)) % 64 AS bucket
             |  FROM words),
             |tgt AS (SELECT bucket, count(*) AS c FROM b WHERE doc_id % 97 = 0 GROUP BY 1),
             |raw AS (SELECT bucket, count(*) AS c FROM b WHERE doc_id % 97 <> 0 GROUP BY 1),
             |tot AS (SELECT (SELECT sum(c) FROM tgt) AS t, (SELECT sum(c) FROM raw) AS r),
             |ratio AS (
             |  SELECT g.bucket,
             |    ln(((coalesce(tg.c, 0) + 1.0) / (tot.t + 64)) /
             |       ((coalesce(rw.c, 0) + 1.0) / (tot.r + 64))) AS lr
             |  FROM (SELECT DISTINCT bucket FROM b) g
             |  LEFT JOIN tgt tg USING (bucket) LEFT JOIN raw rw USING (bucket), tot),
             |scored AS (
             |  SELECT b.doc_id, b.lang, round(sum(r.lr), 6) AS score
             |  FROM b JOIN ratio r USING (bucket)
             |  WHERE b.doc_id % 97 <> 0
             |  GROUP BY 1, 2)
             |SELECT doc_id, lang, score, rk FROM (
             |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
             |  FROM scored)
             |WHERE rk <= 50""".stripMargin)),

    // Corpus mixing / language rebalancing — downsample over-represented
    // strata to a uniform target mix (the Pile/ROOTS-style source-balancing
    // pass before training). Acceptance is decided per document by the q44
    // engine-neutral arithmetic hash against an INTEGER cross-multiplied
    // threshold (u · n_docs · n_langs < total · 10⁶) — exact, reproducible,
    // and engine-neutral where a float acceptance rate would be none of
    // those. The products stay far under 2^63 at test scale; at 10⁹+ docs
    // the same predicate runs with the u-threshold precomputed per stratum
    // as a double (documented trade: one rounding boundary per stratum).
    // Scale shape: the stratum-count dictionary broadcasts; one corpus scan.
    OpQuery("q65_rebalance_mix",
      (s, d) => {
        val docs = t(s, d, "documents")
        val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        val tot = counts.agg(sum(col("n_docs")).as("total"),
          count(lit(1)).as("n_langs"))
        val u = pmod(pmod(col("doc_id"), lit(100003L)) * lit(2654435761L),
          lit(1000000L))
        val kept = docs.join(broadcast(counts), Seq("lang"))
          .crossJoin(broadcast(tot))
          .filter(u * col("n_docs") * col("n_langs") <
            col("total") * lit(1000000L))
          .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
        counts.join(kept, Seq("lang"), "left")
          .select(col("lang"), col("n_docs"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      },
      Some("""WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
             |tot AS (SELECT sum(n_docs) AS total, count(*) AS n_langs FROM counts),
             |kept AS (
             |  SELECT d.lang FROM documents d JOIN counts c USING (lang), tot
             |  WHERE (((d.doc_id % 100003) + 100003) % 100003 * 2654435761) % 1000000
             |        * c.n_docs * tot.n_langs < tot.total * 1000000)
             |SELECT c.lang, c.n_docs, coalesce(k.n_kept, 0) AS n_kept
             |FROM counts c
             |LEFT JOIN (SELECT lang, count(*) AS n_kept FROM kept GROUP BY 1) k
             |  USING (lang)""".stripMargin)),

    // End-to-end curation funnel — the whole training-data pipeline as ONE
    // declarative DAG, with per-stage audit counts (the report every corpus
    // release ships): raw ∪ injected exact dupes ∪ planted benchmark quotes
    // → exact dedup (q20's digest, min-id survivor) → decontamination
    // (q46's 8-gram screen vs the held-out bench slice) → rebalance to a
    // uniform language mix (q65's integer acceptance). Every stage has
    // planted ground truth so both engines must agree on exactly what each
    // stage removes. Scale shape: one digest shuffle, one broadcast gram
    // screen, one broadcast stratum dictionary — stage counts are
    // aggregate-sized; Catalyst reuses the shared lineage across stages.
    OpQuery("q66_curation_funnel",
      (s, d) => {
        val docs = t(s, d, "documents")
        val bench = docs.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id"), col("text"))
        val base = docs.filter(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
        val dupes = base.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
        val quotes = bench.select(
            (col("doc_id") + 2000000L).as("doc_id"), lit("en").as("lang"),
            array_join(slice(split(col("text"), " "), 1, 12), " ").as("text"))
          .withColumn("n_chars", length(col("text")).cast("long"))
        val raw = base.unionByName(dupes).unionByName(quotes)
        val winners = raw.groupBy(fingerprint(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("keep_id"))
        // ONE flagged lineage instead of four per-stage DataFrames: each doc
        // carries s1/s2/s3 survival flags and the stage report is a single
        // aggregation over it. The old per-stage form re-derived the
        // digest-join lineage for every stage's count (~2× the suite cost of
        // this query, round-4 verdict nit); the flag form is also the better
        // 100-TB shape — one corpus pass, stage counts as conditional sums.
        // LEFT join: a NULL-text row has a NULL fingerprint, misses the
        // winner table, and must still count in the raw stage (the oracle
        // aggregates raw before its join) — it just never survives s1
        // eager localCheckpoint: the flagged table has FOUR downstream
        // consumers (gram screen, s2 join, stratum counts, final report) and
        // each re-derived the 3-way union + md5 fingerprint + winner join
        // lineage (~0.3 s CPU each at bench scale, r6 profile). One
        // materialization of the corpus-sized flag table replaces three
        // recomputes — the same iterative-DataFrame discipline the CC loop
        // uses (swap for checkpoint() on a cluster).
        val s1flag = raw.withColumn("fp", fingerprint(col("text")))
          .join(winners, Seq("fp"), "left")
          .withColumn("s1", coalesce(col("doc_id") === col("keep_id"), lit(false)))
          .drop("fp", "keep_id")
          .localCheckpoint(true)
        val bgrams = bench.select(explode(array_distinct(
          DedupOps.shingles(col("text"), 8))).as("gram")).distinct()
        val contaminated = s1flag.filter(col("s1"))
          .select(col("doc_id"), explode(array_distinct(
            DedupOps.shingles(col("text"), 8))).as("gram"))
          .join(broadcast(bgrams), Seq("gram"))
          .select(col("doc_id")).distinct()
          .withColumn("cont", lit(true))
        val s2flag = s1flag.join(contaminated, Seq("doc_id"), "left")
          .withColumn("s2", col("s1") && !coalesce(col("cont"), lit(false)))
        // the stratum dictionary is |langs|-sized — collect it ONCE and fold
        // the acceptance constants into literals (same device as q64's LLR
        // map, r6): the old counts-broadcast + tot-subquery + crossJoin cost
        // three more jobs over the same checkpointed lineage. Integer
        // arithmetic throughout, so the fold is exact; a lang outside the
        // dictionary looks up NULL and fails the predicate, exactly like
        // the old left join's NULL n_docs_l.
        val countRows = s2flag.filter(col("s2")).groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs_l")).collect()
        val total = countRows.map(_.getLong(1)).sum
        val nLangs = countRows.length.toLong
        val nDocsMap = countRows.map(r => r.getString(0) -> r.getLong(1)).toMap
        val u = pmod(pmod(col("doc_id"), lit(100003L)) * lit(2654435761L),
          lit(1000000L))
        val flagged = s2flag
          .withColumn("n_docs_l",
            element_at(typedlit(nDocsMap), col("lang")))
          .withColumn("s3", col("s2") &&
            coalesce(u * col("n_docs_l") * lit(nLangs) <
              lit(total * 1000000L), lit(false)))
        // per-stage sums as conditional aggregates; sum(when(flag, x)) is
        // null over an empty stage, exactly like the old per-stage sum()
        val a = flagged.agg(
          count(lit(1)).as("n0"), sum(col("n_chars")).as("c0"),
          coalesce(sum(when(col("s1"), 1L)), lit(0L)).as("n1"),
          sum(when(col("s1"), col("n_chars"))).as("c1"),
          coalesce(sum(when(col("s2"), 1L)), lit(0L)).as("n2"),
          sum(when(col("s2"), col("n_chars"))).as("c2"),
          coalesce(sum(when(col("s3"), 1L)), lit(0L)).as("n3"),
          sum(when(col("s3"), col("n_chars"))).as("c3"))
        def stageRow(id: Int, name: String, n: String, c: String) =
          struct(lit(id).as("stage_id"), lit(name).as("stage"),
            col(n).as("n_docs"), col(c).as("n_chars"))
        a.select(explode(array(
            stageRow(0, "raw", "n0", "c0"),
            stageRow(1, "exact_dedup", "n1", "c1"),
            stageRow(2, "decontaminated", "n2", "c2"),
            stageRow(3, "rebalanced", "n3", "c3"))).as("x"))
          .select(col("x.*"))
      },
      Some("""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
             |base AS (SELECT doc_id, lang, text, n_chars FROM documents WHERE doc_id % 97 <> 0),
             |raw AS (
             |  SELECT * FROM base
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, text, n_chars FROM base WHERE doc_id % 7 = 0
             |  UNION ALL
             |  SELECT b.doc_id + 2000000, 'en',
             |    array_to_string(string_split(b.text, ' ')[1:12], ' '),
             |    len(array_to_string(string_split(b.text, ' ')[1:12], ' '))
             |  FROM bench b),
             |s1 AS (
             |  SELECT r.* FROM raw r
             |  JOIN (SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
             |               min(doc_id) AS keep_id
             |        FROM raw GROUP BY 1) w
             |    ON md5(regexp_replace(lower(r.text), '\s+', ' ', 'g')) = w.fp
             |       AND r.doc_id = w.keep_id),
             |grams AS (
             |  SELECT doc_id, unnest(list_distinct(
             |    CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
             |         ELSE list_transform(generate_series(1, len(tk) - 7),
             |                i -> array_to_string(tk[i:i+7], ' ')) END)) AS gram
             |  FROM (SELECT doc_id,
             |          list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
             |        FROM s1)),
             |bgrams AS (
             |  SELECT DISTINCT unnest(list_distinct(
             |    CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
             |         ELSE list_transform(generate_series(1, len(tk) - 7),
             |                i -> array_to_string(tk[i:i+7], ' ')) END)) AS gram
             |  FROM (SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
             |        FROM bench)),
             |contaminated AS (SELECT DISTINCT doc_id FROM grams JOIN bgrams USING (gram)),
             |s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
             |counts AS (SELECT lang, count(*) AS n_docs FROM s2 GROUP BY 1),
             |tot AS (SELECT sum(n_docs) AS total, count(*) AS n_langs FROM counts),
             |s3 AS (
             |  SELECT d.* FROM s2 d JOIN counts c USING (lang), tot
             |  WHERE (((d.doc_id % 100003) + 100003) % 100003 * 2654435761) % 1000000
             |        * c.n_docs * tot.n_langs < tot.total * 1000000)
             |SELECT 0 AS stage_id, 'raw' AS stage, count(*) AS n_docs,
             |       CAST(sum(n_chars) AS BIGINT) AS n_chars FROM raw
             |UNION ALL SELECT 1, 'exact_dedup', count(*), CAST(sum(n_chars) AS BIGINT) FROM s1
             |UNION ALL SELECT 2, 'decontaminated', count(*), CAST(sum(n_chars) AS BIGINT) FROM s2
             |UNION ALL SELECT 3, 'rebalanced', count(*), CAST(sum(n_chars) AS BIGINT) FROM s3""".stripMargin)),

    // PII detection + redaction — the scrubbing pass every shipped training
    // corpus runs: find emails / phone numbers / IPv4 addresses, count them,
    // and replace each with a typed placeholder. The synthetic corpus is
    // PII-free by construction, so PII is INJECTED deterministically (every
    // 13th doc gets an email + phone + IP derived from its id) — planted
    // positives exist in both engines and clean docs must come back
    // byte-identical. Pure per-row regex Columns: zero shuffle, corpus-scan
    // cost, embarrassingly parallel at 100 TB. The regexes stay in the
    // ASCII subset where Java regex and RE2 agree (\b, classes, bounded
    // repeats); redaction order (email → phone → IP) is fixed so sequential
    // replace is deterministic cross-engine.
    OpQuery("q58_pii_redaction",
      (s, d) => {
        val aug = when(col("doc_id") % 13 === 0, concat(
          col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call 555-"),
          (lit(1000L) + col("doc_id") % 9000L).cast("string"),
          lit(" from 10."), (col("doc_id") % 256L).cast("string"),
          lit("."), (col("doc_id") % 100L).cast("string"),
          lit("."), (col("doc_id") % 50L).cast("string")))
          .otherwise(col("text"))
        t(s, d, "documents").select(col("doc_id"), aug.as("raw"))
          .select(col("doc_id"),
            size(regexp_extract_all(col("raw"), lit(piiEmailRe), lit(0)))
              .as("n_emails"),
            size(regexp_extract_all(col("raw"), lit(piiPhoneRe), lit(0)))
              .as("n_phones"),
            size(regexp_extract_all(col("raw"), lit(piiIpRe), lit(0)))
              .as("n_ips"),
            regexp_replace(regexp_replace(regexp_replace(col("raw"),
              piiEmailRe, "[EMAIL]"), piiPhoneRe, "[PHONE]"), piiIpRe, "[IP]")
              .as("redacted"))
      },
      Some(s"""WITH aug AS (
              |  SELECT doc_id,
              |    CASE WHEN doc_id % 13 = 0 THEN text
              |      || ' contact user' || CAST(doc_id AS VARCHAR)
              |      || '@example.com or call 555-'
              |      || CAST(1000 + doc_id % 9000 AS VARCHAR)
              |      || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
              |      || '.' || CAST(doc_id % 100 AS VARCHAR)
              |      || '.' || CAST(doc_id % 50 AS VARCHAR)
              |    ELSE text END AS raw
              |  FROM documents)
              |SELECT doc_id,
              |  len(regexp_extract_all(raw, '$piiEmailRe')) AS n_emails,
              |  len(regexp_extract_all(raw, '$piiPhoneRe')) AS n_phones,
              |  len(regexp_extract_all(raw, '$piiIpRe')) AS n_ips,
              |  regexp_replace(regexp_replace(regexp_replace(raw,
              |    '$piiEmailRe', '[EMAIL]', 'g'),
              |    '$piiPhoneRe', '[PHONE]', 'g'),
              |    '$piiIpRe', '[IP]', 'g') AS redacted
              |FROM aug""".stripMargin)),

    // C4-style line-level boilerplate filtering: split each document into
    // lines, keep only lines that end in terminal punctuation AND carry at
    // least 5 words (the two core C4 heuristics), rebuild the cleaned
    // document, and flag docs with fewer than 3 surviving lines for drop.
    // The flat synthetic corpus has no newlines, so line structure is
    // SYNTHESIZED deterministically in both engines first (every ' a '
    // becomes a sentence boundary '.\n' via plain non-overlapping replace —
    // identical left-to-right semantics in Java regex and SQL replace).
    // Pure per-row array Columns: zero shuffle, corpus-scan cost.
    OpQuery("q59_line_filter",
      (s, d) => {
        val lines = split(regexp_replace(col("text"), " a ", ".\n"), "\n")
        val kept = filter(lines, l =>
          trim(l).endsWith(".") &&
            size(filter(split(trim(l), " "), w => w =!= "")) >= 5)
        t(s, d, "documents").select(
          col("doc_id"),
          size(lines).as("n_lines"),
          size(kept).as("n_kept_lines"),
          array_join(kept, "\n").as("cleaned_text"),
          (size(kept) >= 3).as("keep_doc"))
      },
      Some("""WITH l AS (
             |  SELECT doc_id,
             |    string_split(replace(text, ' a ', '.' || chr(10)), chr(10)) AS lines
             |  FROM documents),
             |k AS (
             |  SELECT doc_id, lines,
             |    list_filter(lines, x -> ends_with(trim(x), '.') AND
             |      len(list_filter(string_split(trim(x), ' '), w -> w <> '')) >= 5)
             |      AS kept
             |  FROM l)
             |SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept_lines,
             |  -- DuckDB's array_to_string([]) is NULL; Spark's array_join is ''
             |  coalesce(array_to_string(kept, chr(10)), '') AS cleaned_text,
             |  len(kept) >= 3 AS keep_doc
             |FROM k""".stripMargin)),

    // Repetition-quality metrics (the Gopher-style repetition filters):
    // duplicate-token fraction and duplicate-trigram fraction per document,
    // plus the keep/drop flag. Pure Column over per-row arrays — zero
    // shuffle, corpus-scan cost, embarrassingly parallel at 100 TB.
    OpQuery("q47_repetition_quality",
      (s, d) => {
        val toks = DedupOps.tokens(col("text"))
        val tris = DedupOps.shingles(col("text"), 3)
        val nTok = size(toks).cast("long")
        val nDTok = size(array_distinct(toks)).cast("long")
        val nTri = size(tris).cast("long")
        val nDTri = size(array_distinct(tris)).cast("long")
        // zero-token docs: 0/0 is NULL in Spark but NaN in DuckDB — pin
        // both sides to 0.0 (no tokens = no repetition); trigrams never
        // divide by zero (shingles of an empty doc yield [""], n=1)
        val dupTokFrac =
          when(nTok > 0, round(lit(1.0) - nDTok / nTok, 6)).otherwise(lit(0.0))
        val dupTriFrac = round(lit(1.0) - nDTri / nTri, 6)
        t(s, d, "documents").select(
          col("doc_id"),
          nTok.as("n_tokens"), nDTok.as("n_distinct_tokens"),
          dupTokFrac.as("dup_token_frac"),
          nTri.as("n_trigrams"), nDTri.as("n_distinct_trigrams"),
          dupTriFrac.as("dup_trigram_frac"),
          (dupTriFrac < 0.05).as("passes_repetition"))
      },
      Some("""WITH g AS (
             |  SELECT doc_id,
             |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
             |  FROM documents),
             |m AS (
             |  SELECT doc_id, len(tk) AS n_tokens,
             |    len(list_distinct(tk)) AS n_distinct_tokens,
             |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
             |         ELSE list_transform(generate_series(1, len(tk) - 2),
             |                i -> array_to_string(tk[i:i+2], ' ')) END AS tris
             |  FROM g)
             |SELECT doc_id, n_tokens, n_distinct_tokens,
             |  CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
             |       ELSE round(1.0 - n_distinct_tokens / n_tokens, 6)
             |  END AS dup_token_frac,
             |  len(tris) AS n_trigrams, len(list_distinct(tris)) AS n_distinct_trigrams,
             |  round(1.0 - len(list_distinct(tris)) / len(tris), 6) AS dup_trigram_frac,
             |  round(1.0 - len(list_distinct(tris)) / len(tris), 6) < 0.05 AS passes_repetition
             |FROM m""".stripMargin)),

    // MODEL-BASED quality filtering — the classifier pass every modern
    // corpus pipeline runs after the q23/q47 heuristics (CCNet / GPT-3 /
    // FineWeb-style: a linear model over interpretable features decides
    // keep/drop). The model here is a fixed linear classifier scored as a
    // LOGIT (sigmoid is monotone, so `logit > 0` IS the sigmoid > 0.5
    // decision) — deliberately transcendental-free: every feature is a
    // ratio of exactly-representable ints and the score is one fixed-order
    // chain of IEEE double ops, so Spark and DuckDB agree bit-for-bit
    // (same trick as q64's rounded LLR, minus the ln()). Scale shape:
    // the weight vector is a plan literal — zero shuffle, the corpus pays
    // one codegen'd scan; a real fastText-style model (hashed n-gram
    // features) keeps the same shape with a broadcast weight table.
    OpQuery("q71_quality_classifier",
      (s, d) => {
        val toks = DedupOps.tokens(col("text"))
        val nCharsD = length(col("text")).cast("double")
        val nw = size(toks)
        val nStop = size(filter(toks, w => w.isin(stopwords: _*)))
        def classCount(re: String): Column =
          (length(col("text")) - length(regexp_replace(col("text"), re, "")))
            .cast("double")
        val stopRatio = when(nw > 0,
          nStop.cast("double") / nw.cast("double")).otherwise(lit(0.0))
        val punctPerChar = when(nCharsD > 0,
          classCount("[.,;:!?]") / nCharsD).otherwise(lit(0.0))
        val digitRatio = when(nCharsD > 0,
          classCount("[0-9]") / nCharsD).otherwise(lit(0.0))
        val upperRatio = when(nCharsD > 0,
          classCount("[A-Z]") / nCharsD).otherwise(lit(0.0))
        val wc = least(nw, lit(400)).cast("double")
        // fixed left-assoc chain — written identically in the oracle SQL
        val logit = lit(-1.3) + lit(6.0) * stopRatio +
          lit(8.0) * punctPerChar + lit(0.015) * wc -
          lit(5.0) * digitRatio - lit(4.0) * upperRatio
        // + 0.0 normalizes IEEE negative zero: a ±1-ulp-of-zero logit rounds
        // to -0.0 in DuckDB but +0.0 through Spark's BigDecimal round
        val rounded = round(logit, 6) + lit(0.0)
        t(s, d, "documents").select(
          col("doc_id"),
          nw.cast("long").as("n_words"),
          nStop.cast("long").as("n_stopwords"),
          round(stopRatio, 6).as("stop_ratio"),
          round(punctPerChar, 6).as("punct_per_char"),
          round(digitRatio, 6).as("digit_ratio"),
          round(upperRatio, 6).as("upper_ratio"),
          rounded.as("quality_logit"),
          (rounded > 0).as("keep"))
      },
      Some(s"""WITH f AS (
              |  SELECT doc_id,
              |    CAST(length(text) AS DOUBLE) AS n_chars,
              |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk,
              |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
              |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS n_digit,
              |    CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) AS n_upper
              |  FROM documents),
              |g AS (
              |  SELECT doc_id, n_chars, n_punct, n_digit, n_upper,
              |    len(tk) AS n_words,
              |    len(list_filter(tk, w -> w IN (${stopwords.map(w => s"'$w'").mkString(",")}))) AS n_stop
              |  FROM f),
              |r AS (
              |  SELECT doc_id, n_words, n_stop,
              |    CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) ELSE 0.0 END AS stop_ratio,
              |    CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_per_char,
              |    CASE WHEN n_chars > 0 THEN n_digit / n_chars ELSE 0.0 END AS digit_ratio,
              |    CASE WHEN n_chars > 0 THEN n_upper / n_chars ELSE 0.0 END AS upper_ratio,
              |    CAST(least(n_words, 400) AS DOUBLE) AS wc
              |  FROM g)
              |SELECT doc_id, n_words, n_stop AS n_stopwords,
              |  round(stop_ratio, 6) AS stop_ratio,
              |  round(punct_per_char, 6) AS punct_per_char,
              |  round(digit_ratio, 6) AS digit_ratio,
              |  round(upper_ratio, 6) AS upper_ratio,
              |  round(-1.3 + 6.0 * stop_ratio + 8.0 * punct_per_char + 0.015 * wc - 5.0 * digit_ratio - 4.0 * upper_ratio, 6) + 0.0 AS quality_logit,
              |  round(-1.3 + 6.0 * stop_ratio + 8.0 * punct_per_char + 0.015 * wc - 5.0 * digit_ratio - 4.0 * upper_ratio, 6) > 0.0 AS keep
              |FROM r""".stripMargin)),

    // TOKENIZE-TO-IDS: map every document to its token-ID sequence under an
    // induced vocabulary — the step between q55 (vocab induction) and q57
    // (sequence packing) that actually materializes model inputs. Vocab =
    // top-20 tokens by corpus frequency (count desc, token asc — total
    // order), id = rank; everything else maps to UNK id 0. Scale shape: the
    // token-count agg partial-aggregates to a vocab-sized table; the id
    // lookup is a BROADCAST join against that table (never a shuffle of the
    // corpus by token); the sequence rebuild is ONE doc-keyed exchange with
    // order restored from the exploded position (no window over the
    // corpus). ids emitted as a CSV string: engine-exact to compare and the
    // layout a shard-writer would stream. rankedTopK collects only the
    // vocab (aggregate-sized), not corpus rows.
    OpQuery("q75_tokenize_ids",
      (s, d) => {
        val docs = t(s, d, "documents")
        val base = docs.select(col("doc_id"), DedupOps.tokens(col("text")).as("tk"))
        val counts = base.select(explode(col("tk")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val vocab = rankedTopK(counts, 20, col("cnt").desc, col("tok").asc)
          .select(col("tok"), col("rk").as("tid"))
        val positioned = base.select(col("doc_id"),
          posexplode(col("tk")).as(Seq("pos", "tok")))
        val mapped = positioned
          .join(broadcast(vocab), Seq("tok"), "left")
          .select(col("doc_id"), col("pos"),
            coalesce(col("tid"), lit(0)).as("tid"))
        val seqs = mapped.groupBy(col("doc_id")).agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("tid") === 0, 1L).otherwise(0L)).as("n_unk"),
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tid")))),
            x => x.getField("tid").cast("string")), ",").as("ids_csv"))
        docs.select(col("doc_id")).join(seqs, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("n_unk"), lit(0L)).as("n_unk"),
            coalesce(col("ids_csv"), lit("")).as("ids_csv"))
      },
      Some("""WITH g AS (
             |  SELECT doc_id, list_filter(string_split(lower(text), ' '),
             |    x -> x <> '') AS tk
             |  FROM documents),
             |cnt AS (
             |  SELECT tok, count(*) AS cnt
             |  FROM (SELECT unnest(tk) AS tok FROM g) GROUP BY 1),
             |vocab AS (
             |  SELECT tok, CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS INT) AS tid
             |  FROM cnt ORDER BY cnt DESC, tok LIMIT 20),
             |px AS (
             |  SELECT doc_id, i AS pos, tk[i] AS tok
             |  FROM g, unnest(generate_series(1, len(tk))) AS u(i)),
             |mp AS (
             |  SELECT doc_id, pos, coalesce(v.tid, 0) AS tid
             |  FROM px LEFT JOIN vocab v USING (tok))
             |SELECT d.doc_id,
             |  coalesce(m.n_tokens, 0) AS n_tokens,
             |  coalesce(m.n_unk, 0) AS n_unk,
             |  coalesce(m.ids_csv, '') AS ids_csv
             |FROM documents d LEFT JOIN (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |    CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
             |    array_to_string(list(CAST(tid AS VARCHAR) ORDER BY pos), ',') AS ids_csv
             |  FROM mp GROUP BY 1) m USING (doc_id)""".stripMargin)))
}
