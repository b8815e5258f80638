package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.functions.Geo
import graft.Queries._

/** Registry chunk of [[Queries.all]] — text-analysis family part 1: quality, language, tokenization/BPE, fingerprinting, contamination, PII, curation pipelines, mixing, web curation.
  * Split from the Queries.scala monolith (round 13; re-split round 14 at
  * the 1,600-line chunk ceiling) purely for review and merge cost; shared
  * helpers stay in [[Queries]] and every entry is byte-identical to its
  * pre-split form. 31 keys.
  */
private[graft] object QueriesText {
  val defs: Seq[QueryDef] = Seq(
    // ---- text analysis (north star) ----
    QueryDef("txt_word_counts",
      (s, d) => t(s, d, "documents")
        .select(explode(Dedup.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
        .limit(20),
      Some("""SELECT tok, count(*) AS cnt FROM (
        SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS tok
        FROM documents) GROUP BY 1 ORDER BY cnt DESC, tok LIMIT 20""")),

    QueryDef("txt_language_guess",
      (s, d) => TextAnalysis.languageGuessed(t(s, d, "documents"), "text")
        .groupBy(col("guess"), col("lang")).agg(count(lit(1)).as("cnt"))
        .orderBySmall(col("guess"), col("lang")),
      Some(s"""SELECT guess, lang, count(*) AS cnt FROM (
          SELECT $languageGuessCaseSql AS guess, lang
          FROM (SELECT list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks, lang
            FROM documents))
          GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("txt_quality",
      // one definition: the library's qualityScored IS the query (the oracle
      // mirrors its zero-token/zero-char guards)
      (s, d) => TextAnalysis.qualityScored(t(s, d, "documents"), col("text"))
        .select("doc_id", "n_tokens", "punct_ratio", "avg_token_len", "stopword_ratio")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
        CASE WHEN len(text) > 0 THEN
          CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / CAST(len(text) AS DOUBLE)
          ELSE 0.0 END AS punct_ratio,
        CASE WHEN len(toks) > 0 THEN CAST(len(text) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
          ELSE 0.0 END AS avg_token_len,
        CASE WHEN len(toks) > 0 THEN
          CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
          ELSE 0.0 END AS stopword_ratio
        FROM (SELECT doc_id, text, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents) ORDER BY doc_id""")),

    QueryDef("txt_bpe_token_count",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
        CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS INTEGER) AS n_ws_tokens,
        CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+')) AS INTEGER) AS n_bpe_tokens
        FROM documents ORDER BY doc_id""")),

    QueryDef("txt_bpe_trained",
      // REAL trained BPE (Sennrich merges: corpus word-count aggregation,
      // driver-side greedy merges, distributed encode), hash-checked on a
      // corpus whose merge SEQUENCE is analytically forced. Doc i holds
      // words 0..doc_id%150, where word_j is the unique 2-char string
      // lower(j/26)+upper(j%26): each word carries exactly ONE symbol pair,
      // pairs never overlap across words, and a merged word (2 chars → 1
      // token) creates no new pairs — so pair frequency f_j = #{docs with
      // doc_id%150 >= j} is the whole statistic. f_j is non-increasing in
      // j, and on ties the trainer's (count desc, pair lex asc) rule picks
      // the lower j (pair lex order == j order by construction) — the 100
      // learned merges are words 0..99 in order, at ANY doc_id
      // distribution. Encoding is then exact: word j costs 1 token if
      // j <= 99, else 2. The TRAINER ran for real; only its forced
      // outcome is mirrored in SQL. Natural-corpus trainer/encoder
      // contracts stay property-tested in TextPipelineSpec.
      (s, d) => {
        val words: Seq[String] = (0 until 150).map(j =>
          s"${('a' + j / 26).toChar}${('A' + j % 26).toChar}")
        val docs2 = t(s, d, "documents").select(col("doc_id"),
          array_join(slice(typedlit(words), lit(1),
            pmod(col("doc_id"), lit(150L)).cast("int") + 1), " ").as("text"))
        val merges = Bpe.train(docs2, "text", numMerges = 100)
        docs2.select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
            Bpe.tokenCount(merges)(col("text")).as("n_bpe_tokens"),
            length(col("text")).as("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
          CAST(doc_id % 150 + 1 AS INTEGER) AS n_ws_tokens,
          CAST(doc_id % 150 + 1 +
            CASE WHEN doc_id % 150 > 99 THEN doc_id % 150 - 99 ELSE 0 END
            AS INTEGER) AS n_bpe_tokens,
          CAST(3 * (doc_id % 150 + 1) - 1 AS INTEGER) AS n_chars
        FROM documents ORDER BY doc_id""")),

    QueryDef("txt_fingerprint_dedup",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))
        .orderBy(col("fp")),
      Some("""SELECT fp, min(doc_id) AS keeper, count(*) AS n_docs FROM (
        SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp
        FROM documents) GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_winnow_fingerprints",
      // winnowing selects ~2/(w+1) of gram hashes as local fingerprints;
      // output is summarized per doc (count + extrema) to keep the compare
      // payload small while still pinning every selected hash
      (s, d) => TextAnalysis.winnowFingerprints(t(s, d, "documents"), "doc_id", "text")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_fps"), min(col("fp")).as("min_fp"), max(col("fp")).as("max_fp"),
          md5(concat_ws(",", sort_array(collect_list(col("fp"))))).as("fp_digest"))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (SELECT doc_id,
          [substring(md5(substring(text, i, 8)), 1, 8) FOR i IN generate_series(1, len(text) - 7)] AS hashes
        FROM documents WHERE len(text) >= 11),
      f AS (SELECT doc_id,
          list_distinct([list_aggregate(hashes[j:j+3], 'min') FOR j IN generate_series(1, len(hashes) - 3)]) AS fps
        FROM g),
      e AS (SELECT doc_id, unnest(fps) AS fp FROM f)
      SELECT doc_id, count(*) AS n_fps, min(fp) AS min_fp, max(fp) AS max_fp,
        md5(string_agg(fp, ',' ORDER BY fp)) AS fp_digest
      FROM e GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_winnow_fast",
      // the xxhash64 production form of winnowing (same kernel the
      // fingerprint-dedup pipelines use). Hash-checked via a planted
      // construct: doc i's text is a run of one repeated character
      // (class = doc_id%26, length 11+doc_id%13 >= k+w-1), so every 8-char
      // gram inside a doc is IDENTICAL — whatever its xxhash64 value, each
      // window's min is that single hash and the distinct fingerprint set
      // has exactly ONE element. Docs of the same class share that gram
      // (hence that fingerprint) regardless of length; the 26 gram strings
      // are FIXED (independent of the corpus), and their 26 hashes are
      // verified pairwise-distinct once, so the fp-join partner count per
      // doc is exactly its class size − 1 — analytic without evaluating
      // xxhash64. This checks the hash equality STRUCTURE across docs (the
      // property winnow dedup consumes), not just per-doc counts; md5-form
      // equivalence on natural text stays a DedupSpec property.
      (s, d) => {
        val docs2 = t(s, d, "documents").select(col("doc_id"),
          expr("repeat(char(97 + doc_id % 26), CAST(11 + doc_id % 13 AS INT))").as("text"))
        val fps = TextAnalysis.winnowFingerprintsFast(docs2, "doc_id", "text")
        val perDoc = fps.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_fps"), max(col("fp")).as("_fp"))
        val classSize = fps.groupBy(col("fp").as("_fp"))
          .agg(count(lit(1)).as("_cls"))
        perDoc.join(classSize, Seq("_fp"))
          .select(col("doc_id"), col("n_fps"), (col("_cls") - 1).as("n_partners"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH cls AS (SELECT doc_id % 26 AS c, count(*) AS n
          FROM documents GROUP BY 1)
        SELECT d.doc_id, CAST(1 AS BIGINT) AS n_fps,
          CAST(cls.n - 1 AS BIGINT) AS n_partners
        FROM documents d JOIN cls ON d.doc_id % 26 = cls.c
        ORDER BY d.doc_id""")),

    QueryDef("txt_chunk",
      // token-window chunking with overlap (training-example splitter):
      // 32-token chunks, stride 24; chunk text pinned by md5 digest
      (s, d) => TextAnalysis.chunkByTokens(t(s, d, "documents"), "doc_id", "text",
          chunkTokens = 32, stride = 24)
        .select(col("doc_id"), col("chunk_no"), col("n_chunk_tokens"),
          md5(col("chunk_text")).as("chunk_digest"))
        .orderBy(col("doc_id"), col("chunk_no")),
      Some("""WITH tk AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        st AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks), 24)) AS start_i
          FROM tk WHERE len(toks) >= 1)
        SELECT doc_id, CAST((start_i - 1) // 24 AS INTEGER) AS chunk_no,
          CAST(len(toks[start_i : start_i + 31]) AS INTEGER) AS n_chunk_tokens,
          md5(array_to_string(toks[start_i : start_i + 31], ' ')) AS chunk_digest
        FROM st ORDER BY doc_id, chunk_no""")),

    QueryDef("txt_pii_scrub",
      // PII redaction (emails/URLs/phones, RE2-class patterns): the corpus
      // has no natural PII, so deterministic PII is injected per doc
      // (op05-style construct-and-check), then counted and scrubbed
      (s, d) => {
        val withPii = t(s, d, "documents").select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or +1-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(" see https://ex.com/"), col("doc_id")).as("text"))
        val (emails, urls, phones) = TextAnalysis.piiCounts(col("text"))
        // regex battery ABOVE the sort (the op09 hoist): under the global
        // orderBy the 4 regex passes + md5 run twice (range sample +
        // shuffle map side) at the scan's row-group parallelism; hoisted,
        // they run once at the post-exchange task count (7.9 → 1.4 s sf1).
        // The exchange carries the raw text instead of the digests — at
        // 500k docs/SF the shuffle bytes are far cheaper than the regexes
        withPii.orderBy(col("doc_id"))
          .select(col("doc_id"), emails.as("n_emails"), urls.as("n_urls"),
            phones.as("n_phones"),
            md5(TextAnalysis.scrubPii(col("text"))).as("scrubbed_digest"))
      },
      Some("""WITH t2 AS (SELECT doc_id,
          text || ' contact user' || doc_id || '@example.com or +1-555-' ||
          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' see https://ex.com/' || doc_id AS text
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
          CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS INTEGER) AS n_urls,
          CAST(len(regexp_extract_all(text, '\+?[0-9][0-9()\-\s]{6,}[0-9]')) AS INTEGER) AS n_phones,
          md5(regexp_replace(regexp_replace(regexp_replace(text,
            'https?://[^\s]+', '<URL>', 'g'),
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\+?[0-9][0-9()\-\s]{6,}[0-9]', '<PHONE>', 'g')) AS scrubbed_digest
        FROM t2 ORDER BY doc_id""")),

    QueryDef("txt_repetition",
      // Gopher-style repetition quality signals over 2-gram occurrences
      // (duplicates kept, unlike dedup shingles)
      (s, d) => TextAnalysis.repetitionSignals(t(s, d, "documents"), "doc_id", "text", n = 2)
        .orderBy(col("doc_id")),
      Some("""WITH tk AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        g AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] FOR i IN generate_series(1, len(toks) - 1)]) AS gram
          FROM tk WHERE len(toks) >= 2),
        c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams, count(*) AS n_distinct,
          CAST(sum(cnt) - count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS dup_frac,
          CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_frac
        FROM c GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_contamination",
      // eval-benchmark decontamination: per-doc fraction of distinct
      // 3-gram shingles appearing anywhere in the benchmark subset
      // (every 37th doc stands in for the eval set)
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.contaminationScores(docs, docs.where(col("doc_id") % 37 === 0),
            "doc_id", "text", shingleN = 3)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tk AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        shl AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN generate_series(1, len(toks) - 2)] AS shingles
          FROM tk WHERE len(toks) >= 3),
        sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shl),
        bn AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 37 = 0)
        SELECT sh.doc_id, count(*) AS n_shingles,
          CAST(sum(CASE WHEN bn.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
          CAST(sum(CASE WHEN bn.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination
        FROM sh LEFT JOIN bn ON sh.shingle = bn.shingle
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_contamination_bloom",
      // the beyond-broadcast decontamination path, HASH-CHECKED: the
      // driver-built Bloom filter is a map-side PREFILTER whose false
      // positives are killed by an exact verify join over the flagged
      // sliver only, so the output EQUALS the exact contamination scores —
      // the sketch accelerates the plan but no longer appears in the
      // answer, and the oracle is the same SQL as txt_contamination. The
      // raw one-sided upper-bound form (contaminationFlagsBloom) remains
      // ScalaTest-proven (no-false-negative containment in TextPipelineSpec).
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.contaminationScoresBloomVerified(docs, docs.where(col("doc_id") % 37 === 0),
            "doc_id", "text", shingleN = 3)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tk AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        shl AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN generate_series(1, len(toks) - 2)] AS shingles
          FROM tk WHERE len(toks) >= 3),
        sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shl),
        bn AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 37 = 0)
        SELECT sh.doc_id, count(*) AS n_shingles,
          CAST(sum(CASE WHEN bn.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
          CAST(sum(CASE WHEN bn.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination
        FROM sh LEFT JOIN bn ON sh.shingle = bn.shingle
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("pipeline_curation_v2",
      // the COMPLETE curation pipeline as one declarative chain:
      // repetition filter → benchmark decontamination → MinHash-LSH cluster
      // dedup (keep one representative per component) → chunking. Output is
      // the per-stage retention funnel; every stage's definition is the
      // same one its standalone query uses, so the whole chain is
      // oracle-checkable end to end (recursive-CTE CC included).
      (s, d) => {
        val docs = t(s, d, "documents")
        // tokenize ONCE: every stage (repetition grams, contamination
        // shingles, MinHash shingles, chunking) reads the same cached token
        // arrays instead of re-scanning parquet + re-splitting text — at
        // 100 TB this materialized column is the difference between one
        // tokenizer pass and five
        val toksDF = docs
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rep = TextAnalysis.repetitionSignalsFromTokens(toksDF, "doc_id", "_toks", n = 2)
          .where(col("dup_frac") < 0.4).select("doc_id")
        val corpusSh = Dedup.shingleTableFromTokens(toksDF, "doc_id", "_toks", 3)
        val benchSh = Dedup.shingleTableFromTokens(
          toksDF.where(col("doc_id") % 37 === 0), "doc_id", "_toks", 3)
        val cont = Dedup.contaminationScoresFromShingles(corpusSh, benchSh, "doc_id")
          .where(col("contamination") < 0.5).select("doc_id")
        // rep/cont stay UNHINTED deliberately: the joined side is a narrow
        // doc-id filter and the probe side carries the fat token arrays —
        // a merge hint here forces two full shuffles+sorts of the token
        // table (measured 2x the query's wall time) to save one broadcast
        // build job. At real scale AQE (ON per SCALE.md) right-sizes this
        // per run; the id filters only outgrow a broadcast when the corpus
        // does, and then the exchange is the linear, unavoidable one.
        val surviving = toksDF.join(rep, "doc_id").join(cont, "doc_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val survSh = Dedup.shingleTableFromTokens(surviving, "doc_id", "_toks", 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pairs = Dedup.minhashNearDupPairsFromShingles(survSh, "doc_id",
          numHashes = 8, rowsPerBand = 2, threshold = 0.1)
        val dropped = Dedup.dedupClusters(pairs, "doc_a", "doc_b")
          .where(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id"), lit(1).as("_drop"))
        // the funnel is ONE aggregation over flag columns: quality/kept are
        // left-join flags and the per-doc chunk count is a pure expression
        // (size of the stride-start sequence — identical to counting the
        // exploded chunk rows, without materializing them). The round-4
        // form crossJoined four independent single-row aggregates, which
        // cost a broadcast job each; this is 3 left joins + 1 agg.
        surviving.select(col("doc_id"), lit(1).as("_q"), col("_toks"))
          .join(dropped, Seq("doc_id"), "left")
          .select(col("_q"), (col("_q") === 1 && col("_drop").isNull).as("_kept"),
            when(col("_drop").isNull && size(col("_toks")) >= 1,
              size(sequence(lit(1), size(col("_toks")), lit(24)))).otherwise(lit(0)).as("_nch"))
          // coalesce: sum over ZERO rows is NULL where the oracle's
          // count(*) over an empty funnel stage is 0
          .agg(coalesce(sum(col("_q")).cast("long"), lit(0L)).as("_nq"),
            coalesce(sum(when(col("_kept"), 1L).otherwise(0L)), lit(0L)).as("n_dedup"),
            coalesce(sum(col("_nch")).cast("long"), lit(0L)).as("n_chunks"))
          .crossJoin(docs.agg(count(lit(1)).as("n_total")))
          .select(col("n_total"), col("_nq").as("n_quality"), col("n_dedup"), col("n_chunks"))
      },
      Some(s"""WITH RECURSIVE
        tk AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        g AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] FOR i IN generate_series(1, len(toks) - 1)]) AS gram
          FROM tk WHERE len(toks) >= 2),
        gc AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
        rep AS (SELECT doc_id FROM gc GROUP BY doc_id
          HAVING CAST(sum(cnt) - count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) < 0.4),
        shl0 AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN generate_series(1, len(toks) - 2)] AS shingles
          FROM tk WHERE len(toks) >= 3),
        sh0 AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shl0),
        bn AS (SELECT DISTINCT shingle FROM sh0 WHERE doc_id % 37 = 0),
        cont AS (SELECT sh0.doc_id FROM sh0 LEFT JOIN bn ON sh0.shingle = bn.shingle
          GROUP BY 1
          HAVING CAST(sum(CASE WHEN bn.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) < 0.5),
        surv AS (SELECT d.doc_id, d.text FROM documents d
          JOIN rep ON d.doc_id = rep.doc_id JOIN cont ON d.doc_id = cont.doc_id),
        mp AS (${minhashOracleSql(shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.1, from = "surv")}),
        e AS (SELECT doc_a AS src, doc_b AS dst FROM mp UNION SELECT doc_b, doc_a FROM mp),
        vs AS (SELECT DISTINCT src AS v FROM e),
        reach AS (
          SELECT v, v AS r FROM vs
          UNION
          SELECT e.src AS v, reach.r FROM e JOIN reach ON reach.v = e.dst),
        lab AS (SELECT v AS doc_id, min(r) AS rep FROM reach GROUP BY v),
        dropped AS (SELECT doc_id FROM lab WHERE doc_id <> rep),
        keep AS (SELECT surv.doc_id FROM surv LEFT JOIN dropped ON surv.doc_id = dropped.doc_id
          WHERE dropped.doc_id IS NULL),
        ch AS (SELECT k.doc_id, unnest(generate_series(1, len(tk.toks), 24)) AS start_i
          FROM keep k JOIN tk ON tk.doc_id = k.doc_id WHERE len(tk.toks) >= 1)
        SELECT (SELECT count(*) FROM documents) AS n_total,
          (SELECT count(*) FROM surv) AS n_quality,
          (SELECT count(*) FROM keep) AS n_dedup,
          (SELECT count(*) FROM ch) AS n_chunks""")),

    QueryDef("txt_tfidf_topk",
      // per-doc top-3 terms by the exact ratio-idf rank tf/(df+1) desc —
      // ONE IEEE division of exact integers, identical in both engines
      // (a log-idf float score would hash-flake on libm last-ulp
      // differences; the previous (tf desc, df asc) lexicographic rank
      // ignored df except on tf ties, crowning boilerplate terms)
      (s, d) => TextAnalysis.topTermsByTfidf(t(s, d, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank")),
      Some("""WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS token
          FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        idf AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        r AS (SELECT tf.doc_id, tf.token, tf.tf, idf.df,
            row_number() OVER (PARTITION BY tf.doc_id
              ORDER BY CAST(tf.tf AS DOUBLE) / (idf.df + 1) DESC, tf.token ASC) AS rank
          FROM tf JOIN idf USING (token))
        SELECT doc_id, CAST(rank AS INTEGER) AS rank, token, tf, df
        FROM r WHERE rank <= 3 ORDER BY doc_id, rank""")),

    QueryDef("dedup_minhash_fast",
      // xxhash64 MinHash-LSH (production form; the md5 form above oracles
      // the natural corpus). Hash-checked via plantedTokenDocs: cross-doc
      // Jaccard is exactly 0 (disjoint shingle sets), planted copies are
      // exactly 1, so at any threshold in (0,1] the output is precisely
      // the planted pair per doc with >= shingleN tokens — no probabilistic
      // element at all (false candidates from 64-bit bucket collisions are
      // killed by the exact verify at jac=0). md5-pipeline equivalence on
      // natural near-dups remains a DedupSpec property.
      (s, d) => Dedup.minhashNearDupPairsFast(plantedTokenDocs(s, d), "doc_id", "text",
          shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""SELECT CAST(-doc_id - 1 AS BIGINT) AS doc_a, doc_id AS doc_b,
          CAST(1.0 AS DOUBLE) AS jac
        FROM documents
        WHERE len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) >= 3
        ORDER BY 1, 2""")),

    QueryDef("dedup_simhash_fast",
      // 64-bit xxhash64 simhash with 4x16-bit pigeonhole chunks — the
      // production form without the md5/60-bit oracle ceiling. Hash-checked
      // via plantedTokenDocs: planted copies hash identically (hamming 0);
      // distinct docs share no tokens, so their 64-bit simhashes are
      // independent and the nearest non-planted pair sits ~32 bits apart —
      // P(any pair <= 3) ~ 1e-7 at sf0.1, and on the driver's FIXED corpus
      // recall/precision is a determinism frozen by this very hash compare
      // (the emb_near_dup argument). banded==brute remains a DedupSpec
      // property on natural text.
      (s, d) => Dedup.simhashNearDupPairsFast(plantedTokenDocs(s, d), "doc_id", "text",
          maxHamming = 3)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""SELECT CAST(-doc_id - 1 AS BIGINT) AS doc_a, doc_id AS doc_b,
          CAST(0 AS INTEGER) AS hamming
        FROM documents
        WHERE len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) >= 1
        ORDER BY 1, 2""")),

    QueryDef("dedup_clusters",
      // near-dup pairs → connected components → cluster representative per
      // doc (the actual keep/drop decision). Spark: min-label propagation
      // with pointer jumping; oracle: recursive CTE reachability — both
      // compute "min id reachable", which is iteration-order independent
      (s, d) => Dedup.dedupClusters(
          Dedup.minhashNearDupPairs(t(s, d, "documents"), "doc_id", "text",
            shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.1),
          "doc_a", "doc_b")
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE mp AS (${minhashOracleSql(shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.1)}),
        e AS (SELECT doc_a AS src, doc_b AS dst FROM mp UNION SELECT doc_b, doc_a FROM mp),
        vs AS (SELECT DISTINCT src AS v FROM e),
        reach AS (
          SELECT v, v AS r FROM vs
          UNION
          SELECT e.src AS v, reach.r FROM e JOIN reach ON reach.v = e.dst)
        SELECT v AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY v ORDER BY doc_id""")),

    QueryDef("op_collect_ordered",
      // deterministic ordered collect (the string_agg/array_agg reporting
      // surface): collect_list alone is partition-order-dependent;
      // array_sort makes it exact. The group domain is pre-filtered small
      // BY DESIGN: an ordered collect buffers its whole group, which is the
      // string_agg semantic — bounded "first k per group" extraction
      // belongs to the TopK aggregator (see ann_cosine_topk), not to a
      // collect that is then sliced
      (s, d) => eventsUs(s, d)
        .where(col("event_id") % 199 === 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_list(col("event_id"))), ",").as("ids_csv"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
          array_to_string(list_sort(list(event_id)), ',') AS ids_csv
        FROM events WHERE event_id % 199 = 0 GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_sample_stratified",
      // deterministic hash-stratified sampling (reproducible corpus mixes):
      // keep-decision is md5(key) mod 100 < rate(stratum) — a pure filter,
      // identical in any engine, stable under repartitioning
      (s, d) => Sampling.stratifiedSampleByHash(t(s, d, "lineitem"),
          col("l_returnflag"), concat_ws("-", col("l_orderkey"), col("l_linenumber")),
          Map("A" -> 10, "N" -> 2, "R" -> 50))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_kept"), dsum(col("l_quantity"), 2).as("sum_qty"))
        .orderBySmall(col("l_returnflag")),
      Some(s"""SELECT l_returnflag, count(*) AS n_kept, ${dsumSql("l_quantity", 20, 2)} AS sum_qty
        FROM lineitem
        WHERE ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT % 100
          < CASE l_returnflag WHEN 'A' THEN 10 WHEN 'N' THEN 2 WHEN 'R' THEN 50 ELSE 0 END
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("mix_sources",
      // token-budget corpus mixture: per-source keep rates derived from
      // mixture weights and the measured per-source token mass, then a
      // deterministic hash-unit filter — the whole mix decision is
      // engine-portable (exact md5 bits / 2^52, IEEE-identical rate math:
      // Sampling.hashUnit deliberately stops at 52 bits — the double
      // mantissa — because a 60-bit int-to-double cast would round and
      // diverge between engines; the oracle divides by 4503599627370496)
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
        Sampling.mixByTokenBudget(docs, col("doc_id"), col("source"), col("n_tok"),
            Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
            tokenBudget = 3000L)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tk AS (SELECT doc_id, source,
            CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tok
          FROM documents),
        tot AS (SELECT source AS msrc, sum(n_tok) AS st FROM tk GROUP BY 1),
        r AS (SELECT msrc, least(CAST(1.0 AS DOUBLE),
            CAST(3000 AS DOUBLE) * (CASE msrc WHEN 'src0' THEN CAST(0.4 AS DOUBLE)
              WHEN 'src1' THEN CAST(0.3 AS DOUBLE) WHEN 'src2' THEN CAST(0.2 AS DOUBLE)
              WHEN 'src3' THEN CAST(0.1 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
            / CAST(st AS DOUBLE)) AS rate FROM tot)
        SELECT tk.doc_id, tk.source, tk.n_tok FROM tk JOIN r ON tk.source = r.msrc
        WHERE CAST(('0x' || substring(md5(CAST(tk.doc_id AS VARCHAR)), 1, 13))::BIGINT AS DOUBLE)
          / 4503599627370496.0 < r.rate
        ORDER BY tk.doc_id""")),

    QueryDef("mix_temperature",
      // temperature-flattened mixture at the engine-portable α = 1/2 point
      // (sqrt is exactly rounded; general pow is libm): share ∝ sqrt(mass),
      // capped keep rates, deterministic hash-unit filter. Output is the
      // per-source funnel (bounded: one row per source at any SF). The
      // normalization sum's ADDITION ORDER is pinned on both sides (sorted
      // driver fold / ORDER BY'd list_sum) — double + is order-dependent
      // in the last ulp and a rate boundary must not wobble between
      // engines. The oracle's HAVING st > 0 mirrors the operator's
      // zero-mass-source drop (sqrt(0)/0 would otherwise be IEEE NaN,
      // which DuckDB's least() treats as greatest → rate 1.0, keeping
      // docs Spark drops).
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
        Sampling.mixByTemperature(docs, col("doc_id"), col("source"), col("n_tok"),
            alpha = 0.5, tokenBudget = 3000L)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
          .orderBySmall(col("source"))
      },
      Some("""WITH tk AS (SELECT doc_id, source,
            CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tok
          FROM documents),
        tot AS (SELECT source AS msrc, sum(n_tok) AS st FROM tk GROUP BY 1
          HAVING sum(n_tok) > 0),
        z AS (SELECT list_sum(list(sqrt(CAST(st AS DOUBLE)) ORDER BY msrc)) AS zz FROM tot),
        r AS (SELECT msrc, least(CAST(1.0 AS DOUBLE),
            CAST(3000 AS DOUBLE) * (sqrt(CAST(st AS DOUBLE)) / z.zz) / CAST(st AS DOUBLE)) AS rate
          FROM tot CROSS JOIN z)
        SELECT tk.source, count(*) AS n_docs, CAST(sum(tk.n_tok) AS BIGINT) AS n_tokens
        FROM tk JOIN r ON tk.source = r.msrc
        WHERE CAST(('0x' || substring(md5(CAST(tk.doc_id AS VARCHAR)), 1, 13))::BIGINT AS DOUBLE)
          / 4503599627370496.0 < r.rate
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("ml_perceptron_quality",
      // trainable quality-classifier stage: integer-feature batch
      // perceptron fit (3 rounds, one exact long-sum agg each) + literal-
      // expression predict, reported as the confusion matrix (bounded: at
      // most 4 cells at any SF). Labels are a planted separable rule, so
      // the hash check pins the ENTIRE iterative fit — every weight update
      // is integer arithmetic both engines agree on exactly.
      (s, d) => {
        val f = t(s, d, "documents").select(col("doc_id"),
          (col("doc_id") % 7).cast("long").as("f1"),
          (col("doc_id") % 11).cast("long").as("f2"),
          when(lit(2) * (col("doc_id") % 7) - (col("doc_id") % 11) + 1 > 0, 1)
            .otherwise(-1).as("y"))
        val w = Analytics.perceptronFit(f, Seq(col("f1"), col("f2")), col("y"), iters = 3)
        f.select(col("y").as("label"),
            Analytics.perceptronPredict(Seq(col("f1"), col("f2")), w).as("pred"))
          .groupBy(col("label"), col("pred")).agg(count(lit(1)).as("n"))
          .orderBySmall(col("label"), col("pred"))
      },
      Some(perceptronOracleSql(iters = 3))),

    QueryDef("txt_pack_sequences",
      // GPT-style concat-then-split sequence packing, sharded by source:
      // per-doc starting offset, pack id, and in-pack offset — exact
      // integer window math, hash-checkable end to end
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
        TextAnalysis.packSequences(docs, col("source"), Seq(col("doc_id")), col("n_tok"), seqLen = 256)
          .orderBy(col("source"), col("doc_id"))
      },
      Some("""WITH tk AS (SELECT doc_id, source,
            CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tok
          FROM documents),
        w AS (SELECT doc_id, source, n_tok,
            CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
          FROM tk)
        SELECT doc_id, source, n_tok, start_off,
          CAST(floor(start_off / 256) AS BIGINT) AS pack_id,
          start_off % 256 AS pack_off
        FROM w ORDER BY source, doc_id""")),

    QueryDef("txt_length_bucketing",
      // padding accountant for batch assembly: sequences bucket to the
      // smallest holding cap (32/64/128/256; longer = truncation at the
      // max cap), per-bucket pad-token counts cap·n − Σlen, plus the
      // one-bucket baseline row (bucket_cap = -1: everything padded to
      // 256) — the saving that justifies length bucketing, all exact
      // integers from one linear pass + two bounded aggs
      (s, d) => {
        val caps = Seq(32, 64, 128, 256)
        val toks = t(s, d, "documents")
          .select(TextAnalysis.tokenCount(col("text")).as("n_tok"))
        val buckets = TextAnalysis.lengthBucketPadding(toks, col("n_tok"), caps)
        val single = toks.agg(count(lit(1)).as("n_seqs"),
            sum(least(col("n_tok"), lit(256)).cast("long")).as("sum_len"))
          .select(lit(-1).as("bucket_cap"), col("n_seqs"), col("sum_len"),
            (lit(256L) * col("n_seqs") - col("sum_len")).as("padded"))
        buckets.unionByName(single).orderBySmall(col("bucket_cap"))
      },
      Some("""WITH tk AS (SELECT CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS INTEGER) AS n_tok
          FROM documents),
        e AS (SELECT CASE WHEN n_tok <= 32 THEN 32 WHEN n_tok <= 64 THEN 64
            WHEN n_tok <= 128 THEN 128 ELSE 256 END AS bucket_cap,
          least(n_tok, 256) AS eff FROM tk)
        SELECT bucket_cap, count(*) AS n_seqs, CAST(sum(eff) AS BIGINT) AS sum_len,
          CAST(bucket_cap * count(*) - sum(eff) AS BIGINT) AS padded
        FROM e GROUP BY 1
        UNION ALL
        SELECT -1, count(*), CAST(sum(eff) AS BIGINT), CAST(256 * count(*) - sum(eff) AS BIGINT)
        FROM e
        ORDER BY bucket_cap""")),

    QueryDef("txt_inverted_index",
      // inverted-index head (the IR-serving shape behind retrieval and
      // TF-IDF): top-20 tokens by document frequency with df, collection
      // frequency, and the first-10 posting prefix. Head-token posting
      // lists are corpus-sized, so the prefix comes from a windowed
      // rank ≤ 10 over (token, doc) pairs — bounded per-group state —
      // never a full-list collect
      (s, d) => TextAnalysis.invertedIndexHead(
          t(s, d, "documents"), "doc_id", "text", k = 20, postingN = 10)
        .orderBySmall(col("df").desc, col("token")),
      Some("""WITH tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS token
          FROM documents),
        td AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
        top AS (SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
          FROM td GROUP BY 1 ORDER BY df DESC, token LIMIT 20),
        po AS (SELECT td.token, td.doc_id,
            row_number() OVER (PARTITION BY td.token ORDER BY td.doc_id) AS rn
          FROM td JOIN top ON td.token = top.token),
        pl AS (SELECT token, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
          FROM po WHERE rn <= 10 GROUP BY 1)
        SELECT t.token, t.df, t.cf, pl.postings
        FROM top t JOIN pl ON t.token = pl.token ORDER BY t.df DESC, t.token""")),

    QueryDef("web_domain_counts",
      // registered-domain reach (C4/RefinedWeb-style head-domain ranking).
      // The corpus text has no URLs, so the op05 construct-and-parse trick
      // applies: every doc cites a subdomain of its source's .org plus a
      // mixed-case mirror on .net — exercising extraction, lowercasing,
      // and the eTLD+1 rollup against the same regex in both engines
      (s, d) => Web.domainDocCounts(urlDocs(s, d), "doc_id", "text2")
        .orderBy(col("domain")),
      Some(s"""WITH $urlDocsSql
        SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM rd GROUP BY domain ORDER BY domain""")),

    QueryDef("web_blocklist_filter",
      // domain-blocklist curation: a doc with ANY blocked-domain mention
      // drops (subdomain mentions roll up to the registered domain).
      // Output is the per-source survivor count — src3/src15 vanish via
      // their .org domains, src7 via its .net mirror
      (s, d) => {
        import s.implicits._
        val blocklist = Seq("src3.org", "src7.net", "src15.org").toDF("domain")
        Web.domainBlocklistFilter(urlDocs(s, d), "doc_id", "text2", blocklist)
          .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
          .orderBy(col("source"))
      },
      Some(s"""WITH $urlDocsSql,
        hit AS (SELECT DISTINCT doc_id FROM rd
          WHERE domain IN ('src3.org', 'src7.net', 'src15.org'))
        SELECT d.source, count(*) AS n_kept
        FROM documents d LEFT JOIN hit ON d.doc_id = hit.doc_id
        WHERE hit.doc_id IS NULL GROUP BY d.source ORDER BY d.source""")),

    QueryDef("web_url_dedup",
      // canonical-URL dedup (the crawl-frontier key): four planted
      // spellings per doc — mixed-case host + default port + utm params +
      // trailing slash + fragment vs the clean form, and a root URL whose
      // `:80` / all-utm-query variants must also collapse — exercise every
      // canonicalization rule; the oracle replays the identical regexp
      // chain (see Web.canonicalizeUrl for the mirroring constraints)
      (s, d) => {
        val sevens = pmod(col("doc_id"), lit(7L)).cast("string")
        val threes = pmod(col("doc_id"), lit(3L)).cast("string")
        val urls = t(s, d, "documents").select(col("doc_id"), explode(array(
          concat(lit("https://Sub"), sevens, lit("."), col("source"),
            lit(".ORG:443/Path/"), col("doc_id").cast("string"),
            lit("/?utm_source=feed&ref="), threes, lit("#frag")),
          concat(lit("https://sub"), sevens, lit("."), col("source"),
            lit(".org/Path/"), col("doc_id").cast("string"), lit("?ref="), threes),
          concat(lit("http://"), col("source"), lit(".net:80/")),
          concat(lit("HTTP://"), col("source"), lit(".NET/?utm_campaign=x")))).as("url"))
        Web.urlDedup(urls, "doc_id", "url").orderBy(col("canonical_url"))
      },
      Some(s"""WITH u AS (SELECT doc_id, unnest([
          'https://Sub' || CAST(doc_id % 7 AS VARCHAR) || '.' || source || '.ORG:443/Path/' ||
            CAST(doc_id AS VARCHAR) || '/?utm_source=feed&ref=' || CAST(doc_id % 3 AS VARCHAR) || '#frag',
          'https://sub' || CAST(doc_id % 7 AS VARCHAR) || '.' || source || '.org/Path/' ||
            CAST(doc_id AS VARCHAR) || '?ref=' || CAST(doc_id % 3 AS VARCHAR),
          'http://' || source || '.net:80/',
          'HTTP://' || source || '.NET/?utm_campaign=x']) AS url
        FROM documents),
        ${canonicalCteSql("u")}
        SELECT canonical_url, count(*) AS n_mentions,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, min(doc_id) AS min_doc
        FROM canon GROUP BY 1 ORDER BY 1""")),

    QueryDef("web_html_extract",
      // HTML → visible text (the crawl-to-corpus step): constructed markup
      // wraps every document (htmlDocs — head/style/script/comment
      // boilerplate, an entity-bearing paragraph, one anchor), and
      // Web.stripHtml must recover exactly "A & B: <text> more <id>" —
      // boilerplate CONTENT gone, anchor text kept, &amp; single-decoded.
      // Per-source recovery audit: n_recovered == n_docs is the pinned
      // invariant, sum_chars pins the exact extracted bytes. Linear
      // regex chain in codegen; the only shuffle is the final bounded agg
      (s, d) => {
        val expected = concat(lit("A & B: "), col("text"),
          lit(" more "), col("doc_id").cast("string"))
        htmlDocs(s, d)
          .withColumn("extracted", Web.stripHtml(col("html")))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("extracted") === expected, 1L).otherwise(0L)).as("n_recovered"),
            sum(length(col("extracted")).cast("long")).as("sum_chars"))
          .orderBySmall(col("source"))
      },
      Some(s"""WITH $htmlDocsSql,
        ${stripHtmlCteSql("hd", "html")}
        SELECT source, count(*) AS n_docs,
          CAST(sum(CASE WHEN extracted = 'A & B: ' || text || ' more ' || CAST(doc_id AS VARCHAR)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_recovered,
          CAST(sum(len(extracted)) AS BIGINT) AS sum_chars
        FROM ext GROUP BY 1 ORDER BY 1""")),

    QueryDef("web_link_graph",
      // hyperlink graph + anchor-text corpus from markup: every page
      // carries a self link (its source's .org domain) and a messy
      // cross link (mixed case, www, default port, utm params) to a hub
      // domain in the same namespace — so each srcK.org aggregates BOTH
      // clean self links and canonicalization-normalized hub links.
      // htmlLinks explodes anchors once; the canonical chain and eTLD+1
      // rollup are linear projections; the per-domain agg is bounded by
      // the domain vocabulary. Anchor chars pin the anchor-text side
      (s, d) => {
        val pages = t(s, d, "documents").withColumn("html", concat(
          lit("<p>intro</p><a href=\"https://"), col("source"),
          lit(".org/d/"), col("doc_id").cast("string"),
          lit("\">self link "), col("doc_id").cast("string"),
          lit("</a><div><A HREF=\"HTTP://www.src"), pmod(col("doc_id"), lit(5L)).cast("string"),
          lit(".ORG:80/hub/?utm_source=crawl\">Hub  page</A></div>")))
        val links = Web.htmlLinks(pages, "doc_id", "html")
        val canon = links
          .withColumn("curl", Web.canonicalizeUrl(col("href")))
          .withColumn("domain", Web.registeredDomain(
            regexp_extract(col("curl"), "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)))
        canon.groupBy(col("domain"))
          .agg(count(lit(1)).as("n_links"),
            countDistinct(col("doc_id")).as("n_docs"),
            min(col("doc_id")).as("min_doc"),
            sum(length(col("anchor")).cast("long")).as("anchor_chars"))
          .orderBySmall(col("domain"))
      },
      Some(s"""WITH pg AS (SELECT doc_id, source,
          '<p>intro</p><a href="https://' || source || '.org/d/' || CAST(doc_id AS VARCHAR) ||
          '">self link ' || CAST(doc_id AS VARCHAR) ||
          '</a><div><A HREF="HTTP://www.src' || CAST(doc_id % 5 AS VARCHAR) ||
          '.ORG:80/hub/?utm_source=crawl">Hub  page</A></div>' AS html
        FROM documents),
        el AS (SELECT doc_id,
          unnest(regexp_extract_all(html, '(?is)<a\\s[^>]*>.*?</a>', 0)) AS elem,
          generate_subscripts(regexp_extract_all(html, '(?is)<a\\s[^>]*>.*?</a>', 0), 1) - 1 AS pos
        FROM pg),
        lk AS (SELECT doc_id, doc_id * 1000 + pos AS link_id,
          CASE WHEN regexp_matches(elem, '(?i)href\\s*=\\s*"')
                 THEN regexp_extract(elem, '(?i)href\\s*=\\s*"([^"]*)"', 1)
               WHEN regexp_matches(elem, '(?i)href\\s*=\\s*''')
                 THEN regexp_extract(elem, '(?i)href\\s*=\\s*''([^'']*)''', 1)
               ELSE regexp_extract(elem, '(?i)href\\s*=\\s*([^\\s>"'']+)', 1) END AS url,
          trim(regexp_replace(regexp_extract(elem, '(?is)^<a\\s[^>]*>(.*)</a>$$', 1), '\\s+', ' ', 'g')) AS anchor
        FROM el WHERE pos < 1000),
        cu AS (SELECT link_id AS doc_id, url FROM lk),
        ${canonicalCteSql("cu")},
        dm0 AS (SELECT l.doc_id, l.anchor,
          regexp_extract(c.canonical_url, '^[a-z][a-z0-9+.-]*://([^/?#:]*)', 1) AS host
        FROM lk l JOIN canon c ON c.doc_id = l.link_id),
        dm AS (SELECT doc_id, anchor,
          CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) = '' THEN host
            ELSE regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) END AS domain
        FROM dm0)
        SELECT domain, count(*) AS n_links,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, min(doc_id) AS min_doc,
          CAST(sum(len(anchor)) AS BIGINT) AS anchor_chars
        FROM dm GROUP BY 1 ORDER BY 1""")),
  )
}
