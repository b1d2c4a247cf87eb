package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.streaming._
import graft.registry.OracleDefs._

/** Text family: catalog entries + DuckDB oracle SQL
  * (mechanical split of SparkEntry; content verbatim). */
object TextRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_text_stats"       -> (TextStats.q31TextStats _),
    "q32_lang_id"          -> (TextStats.q32LangId _),
    "q33_quality_score"    -> (TextStats.q33QualityScore _),
    "q34_token_count"      -> (TextStats.q34TokenCount _),
    "q35_doc_fingerprint"  -> (TextStats.q35DocFingerprint _),
    "q65_top_bigrams"      -> (TextStats.q65TopBigrams _),
    "q70_tfidf"            -> (TextStats.q70Tfidf _),
    "q114_intradoc_repetition" -> (TextStats.q114IntradocRepetition _),
    "q115_gopher_rules"    -> (TextStats.q115GopherRules _),
    "q121_chunking"        -> (TextStats.q121Chunking _),
    "q123_vocab_overlap"   -> (TextStats.q123VocabOverlap _),
    "q142_data_mixture"    -> (TextStats.q142DataMixture _),
    "q145_unigram_lm"      -> (TextStats.q145UnigramLm _),
    "q151_bm25"            -> (TextStats.q151Bm25 _),
    "q156_sentence_stats"  -> (TextStats.q156SentenceStats _),
    "q157_feature_hashing" -> (TextStats.q157FeatureHashing _),
    "q161_oov_rate"        -> (TextStats.q161OovRate _),
    "q162_truncation_loss" -> (TextStats.q162TruncationLoss _),
    "q169_binary_encode"   -> (TextStats.q169BinaryEncode _),
    "q173_regexp_toolkit"  -> (TextStats.q173RegexpToolkit _),
    "q176_url_parse"       -> (TextStats.q176UrlParse _),
    "q178_char_entropy"    -> (TextStats.q178CharEntropy _),
    "q179_bpe_pairs"       -> (TextStats.q179BpePairs _),
    "q191_zipf_fit"        -> (TextStats.q191ZipfFit _),
    "q193_filter_waterfall" -> (TextStats.q193FilterWaterfall _),
    "q194_domain_policy"   -> (TextStats.q194DomainPolicy _),
    "q200_length_buckets"  -> (TextStats.q200LengthBuckets _),
    "q201_sparse_cosine"   -> (TextStats.q201SparseCosine _),
    "q203_bigram_ppl"      -> (TextStats.q203BigramPpl _),
    "q207_url_canonicalize" -> (TextStats.q207UrlCanonicalize _),
    "q220_corpus_drift"    -> (TextStats.q220CorpusDrift _),
    "q222_kappa_agreement" -> (TextStats.q222KappaAgreement _),
    "q232_hashed_classifier" -> (TextStats.q232HashedClassifier _),
    "q235_trigram_backoff" -> (TextStats.q235TrigramBackoff _),
    "q236_source_concentration" -> (TextStats.q236SourceConcentration _),
    "q243_bpe_merges"      -> (TextStats.q243BpeMerges _),
    "q250_calibration"     -> (TextStats.q250CalibrationReport _),
    "q261_heaps_law"       -> (TextStats.q261HeapsLaw _),
    "q264_cms_cert"        -> (TextStats.q264CmsCert _),
    "q267_bpe_encode"      -> (TextStats.q267BpeEncode _),
    "q291_pmi_collocations" -> (TextStats.q291PmiCollocations _),
  )

  val oracleSql: Map[String, String] = Map(
    "q31_text_stats" -> """
      SELECT lang, source, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars,
        CAST(SUM(len(string_split(trim(regexp_replace(lower(text), '\s+',
          ' ', 'g')), ' '))) AS BIGINT) AS total_tokens,
        CAST(SUM(len(string_split(trim(regexp_replace(lower(text), '\s+',
          ' ', 'g')), ' '))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS avg_tokens
      FROM documents
      GROUP BY lang, source
      ORDER BY lang, source""",
    "q32_lang_id" -> """
      WITH scored AS (
        SELECT lang,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '), t -> list_contains(['the','a'], t)))
            AS s_en,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '),
            t -> list_contains(['le','la','les'], t))) AS s_fr,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '),
            t -> list_contains(['der','die','das'], t))) AS s_de,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '),
            t -> list_contains(['el','los','una'], t))) AS s_es
        FROM documents)
      SELECT lang,
        CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
             WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
             WHEN s_de >= s_es THEN 'de'
             ELSE 'es' END AS predicted,
        COUNT(*) AS n_docs
      FROM scored
      GROUP BY 1, 2
      ORDER BY lang, predicted""",
    "q33_quality_score" -> """
      WITH n AS (
        SELECT doc_id, lang,
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
            ' ') AS w
        FROM documents)
      SELECT doc_id, lang,
        CAST(len(w) AS INTEGER) AS n_tokens,
        CAST(length(replace(norm, ' ', '')) AS DOUBLE)
          / CAST(len(w) AS DOUBLE) AS avg_token_len,
        CAST(len(list_filter(w, t -> list_contains(['the','a'], t)))
          AS DOUBLE) / CAST(len(w) AS DOUBLE) AS stopword_ratio,
        CAST(length(regexp_replace(norm, '[^0-9]', '', 'g')) AS DOUBLE)
          / CAST(length(norm) AS DOUBLE) AS digit_ratio,
        CASE WHEN len(w) >= 50
                  AND CAST(len(list_filter(w, t ->
                    list_contains(['the','a'], t))) AS DOUBLE)
                    / CAST(len(w) AS DOUBLE) <= 0.2 THEN 'high'
             WHEN len(w) >= 20 THEN 'medium'
             ELSE 'low' END AS quality
      FROM n
      ORDER BY doc_id""",
    "q34_token_count" -> """
      WITH perdoc AS (
        SELECT lang,
          len(regexp_extract_all(trim(regexp_replace(lower(text), '\s+',
            ' ', 'g')), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
            ' ') AS w
        FROM documents)
      , sums AS (
        SELECT lang, CAST(SUM(n_bpe) AS BIGINT) AS total_bpe,
               CAST(SUM(len(w)) AS BIGINT) AS total_ws
        FROM perdoc GROUP BY lang),
      vocab AS (
        SELECT lang, COUNT(DISTINCT word) AS vocab
        FROM (SELECT lang, unnest(w) AS word FROM perdoc)
        GROUP BY lang)
      SELECT s.lang, total_bpe, total_ws, vocab
      FROM sums s JOIN vocab v ON s.lang = v.lang
      ORDER BY s.lang""",
    "q35_doc_fingerprint" -> """
      SELECT doc_id,
        CAST(length(norm) - 7 AS INTEGER) AS n_shingles,
        list_min(list_transform(range(1, length(norm) - 6),
          i -> md5(substring(norm, CAST(i AS INTEGER), 8)))) AS fp
      FROM (SELECT doc_id,
              trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
            FROM documents) t
      WHERE length(norm) >= 8
      ORDER BY doc_id""",
    "q65_top_bigrams" -> """
      WITH words AS (
        SELECT lang,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      bg AS (
        SELECT lang,
          unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS bigram
        FROM words WHERE len(w) >= 2),
      counts AS (
        SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY lang, bigram)
      SELECT lang, rn, bigram, n FROM (
        SELECT lang, bigram, n,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY n DESC, bigram ASC) AS INTEGER) AS rn
        FROM counts) t
      WHERE rn <= 5
      ORDER BY lang, rn""",
    "q70_tfidf" -> """
      WITH w2 AS (
        SELECT doc_id, word FROM (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+',
              ' ', 'g')), ' ')) AS word
          FROM documents) u
        WHERE word <> ''),
      df AS (
        SELECT word, COUNT(*) AS df
        FROM (SELECT DISTINCT doc_id, word FROM w2) d
        GROUP BY word),
      n AS (SELECT COUNT(*) AS n_total FROM documents),
      tf AS (
        SELECT doc_id, word, COUNT(*) AS tf
        FROM w2 WHERE doc_id < 20
        GROUP BY doc_id, word),
      scored AS (
        SELECT doc_id, word, tf, df.df,
          ROUND(CAST(tf AS DOUBLE)
            * ln(CAST(n_total AS DOUBLE) / CAST(df.df AS DOUBLE)), 9)
            AS score
        FROM tf JOIN df USING (word) CROSS JOIN n)
      SELECT doc_id, rn, word, tf, df, score FROM (
        SELECT doc_id, word, tf, df, score,
          CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY score DESC, word ASC) AS INTEGER) AS rn
        FROM scored) t
      WHERE rn <= 3
      ORDER BY doc_id, rn""",
    "q114_intradoc_repetition" -> """
      SELECT doc_id,
        CAST(len(segs) AS INTEGER) AS n_segments,
        CAST(len(list_distinct(segs)) AS INTEGER) AS n_unique,
        ROUND(1.0 - CAST(len(list_distinct(segs)) AS DOUBLE)
          / CAST(len(segs) AS DOUBLE), 9) AS repetition_ratio
      FROM (
        SELECT doc_id,
          list_filter(list_transform(string_split(lower(text), '. '),
            s -> trim(s)), s -> s <> '') AS segs
        FROM documents) t
      WHERE len(segs) >= 1
      ORDER BY doc_id""",
    "q115_gopher_rules" -> """
      WITH t AS (
        SELECT doc_id, lang,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w,
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        FROM documents)
      SELECT doc_id, lang,
        CAST(len(w) AS INTEGER) AS n_tokens,
        len(w) BETWEEN 20 AND 100000 AS ok_length,
        (CAST(length(replace(norm, ' ', '')) AS DOUBLE)
          / CAST(len(w) AS DOUBLE)) BETWEEN 2.0 AND 12.0
          AS ok_mean_word_len,
        len(list_filter(w, x -> list_contains(
          ['the', 'a', 'of', 'to', 'and'], x))) >= 1 AS ok_stopwords,
        ROUND(CAST(len(list_filter(w, x ->
          regexp_matches(x, '^[a-z]+$'))) AS DOUBLE)
          / CAST(len(w) AS DOUBLE), 9) AS alpha_frac,
        CAST(len(list_filter(w, x -> regexp_matches(x, '^[a-z]+$')))
          AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 0.5 AS ok_alpha,
        (len(w) BETWEEN 20 AND 100000)
          AND ((CAST(length(replace(norm, ' ', '')) AS DOUBLE)
            / CAST(len(w) AS DOUBLE)) BETWEEN 2.0 AND 12.0)
          AND (len(list_filter(w, x -> list_contains(
            ['the', 'a', 'of', 'to', 'and'], x))) >= 1)
          AND (CAST(len(list_filter(w, x ->
            regexp_matches(x, '^[a-z]+$'))) AS DOUBLE)
            / CAST(len(w) AS DOUBLE) >= 0.5) AS pass
      FROM t
      ORDER BY doc_id""",

    // cross-batch state merge must equal the batch aggregation
    "q121_chunking" -> """
      WITH n AS (
        SELECT doc_id,
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        FROM documents),
      k AS (
        SELECT doc_id, norm,
          unnest(range(0, (length(norm) - 1) // 100 + 1)) AS kk
        FROM n WHERE length(norm) > 0)
      SELECT doc_id, CAST(kk AS INTEGER) AS chunk_ix,
        CAST(length(substring(norm, CAST(kk * 100 + 1 AS INTEGER), 200))
          AS INTEGER) AS chunk_len,
        md5(substring(norm, CAST(kk * 100 + 1 AS INTEGER), 200))
          AS chunk_hash
      FROM k
      ORDER BY doc_id, chunk_ix""",

    // union of the two near-dup signals with provenance; the embedding
    // side mirrors the sign-LSH candidate generation (4 tables × 4
    // sign bits over dims 1..16 — a pure sign test, no float
    // arithmetic, so bucket membership is engine-portable)
    "q123_vocab_overlap" -> """
      WITH wcount AS (
        SELECT lang, word, COUNT(*) AS n FROM (
          SELECT lang,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+',
              ' ', 'g')), ' ')) AS word
          FROM documents) u
        WHERE word <> ''
        GROUP BY lang, word),
      top AS (
        SELECT lang, word FROM (
          SELECT lang, word,
            ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY n DESC, word ASC) AS rk
          FROM wcount) t
        WHERE rk <= 50),
      voc AS (SELECT lang, list_sort(list(word)) AS vocab FROM top
              GROUP BY lang)
      SELECT a.lang AS lang_a, b.lang AS lang_b,
        CAST(len(list_intersect(a.vocab, b.vocab)) AS INTEGER)
          AS n_common,
        ROUND(CAST(len(list_intersect(a.vocab, b.vocab)) AS DOUBLE)
          / CAST(len(list_distinct(a.vocab || b.vocab)) AS DOUBLE), 9)
          AS vocab_jaccard
      FROM voc a JOIN voc b ON a.lang < b.lang
      ORDER BY lang_a, lang_b""",
    "q142_data_mixture" -> """
      WITH perlang AS (
        SELECT lang,
          CAST(SUM(len(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '))) AS BIGINT) AS total_tokens
        FROM documents GROUP BY lang),
      g AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS grand,
              COUNT(*) AS n_langs FROM perlang)
      SELECT lang, total_tokens,
        ROUND(CAST(grand AS DOUBLE) / n_langs, 3) AS target_tokens,
        ROUND(LEAST(1.0, (CAST(grand AS DOUBLE) / n_langs)
          / CAST(total_tokens AS DOUBLE)), 9) AS sample_rate
      FROM perlang, g
      ORDER BY lang""",

    // the V2 write path must be value-transparent: aggregate on the
    // read-back table == aggregate on the source rows
    "q145_unigram_lm" -> """
      WITH w2 AS (
        SELECT doc_id, word FROM (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+',
              ' ', 'g')), ' ')) AS word
          FROM documents) u
        WHERE word <> ''),
      n AS (SELECT COUNT(*) AS n_total FROM w2),
      probs AS (
        SELECT word,
          CAST(ROUND(ln(CAST(COUNT(*) AS DOUBLE)
            / CAST(n_total AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lp
        FROM w2 CROSS JOIN n
        GROUP BY word, n_total)
      SELECT doc_id, COUNT(*) AS n_tokens,
        ROUND(CAST(SUM(lp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
          AS mean_logprob
      FROM w2 JOIN probs USING (word)
      WHERE doc_id < 30
      GROUP BY doc_id
      ORDER BY doc_id""",

    // arg_max/arg_min over the same unique composite key
    "q151_bm25" -> (bm25Ctes + """
      SELECT doc_id, bm25, n_terms_hit FROM lexs
      ORDER BY bm25 DESC, doc_id
      LIMIT 20"""),

    // the WHILE loop's fixpoint derived set-based: smallest 50k step
    // leaving <= 1000 orders above it
    "q156_sentence_stats" -> """
      WITH sents AS (
        SELECT doc_id, lang, trim(s) AS sent
        FROM (
          SELECT doc_id, lang,
            unnest(string_split_regex(trim(regexp_replace(lower(text),
              '\s+', ' ', 'g')), '[.!?]+')) AS s
          FROM documents) u
        WHERE trim(s) <> ''),
      w AS (
        SELECT doc_id, lang, len(string_split(sent, ' ')) AS sent_words
        FROM sents)
      SELECT lang, COUNT(DISTINCT doc_id) AS n_docs,
        COUNT(*) AS total_sents,
        CAST(SUM(sent_words) AS BIGINT) AS total_sent_words,
        CAST(MIN(sent_words) AS INTEGER) AS min_sent_words,
        CAST(MAX(sent_words) AS INTEGER) AS max_sent_words
      FROM w
      GROUP BY lang
      ORDER BY lang""",

    // same md5-prefix bucket arithmetic ('0x' cast parses hex)
    "q157_feature_hashing" -> """
      WITH f AS (
        SELECT doc_id, lang || '|' || source AS feat FROM documents)
      SELECT CAST(CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT) % 64
          AS INTEGER) AS bucket,
        COUNT(*) AS n_docs,
        COUNT(DISTINCT feat) AS n_distinct_feats,
        MIN(feat) AS first_feat
      FROM f
      GROUP BY 1
      ORDER BY 1""",

    // same banded pairs + the q55 md5 split, leakage = cross-split
    "q161_oov_rate" -> """
      WITH w2 AS (
        SELECT lang, word FROM (
          SELECT lang,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+',
              ' ', 'g')), ' ')) AS word
          FROM documents) u
        WHERE word <> ''),
      wc AS (SELECT lang, word, COUNT(*) AS n FROM w2 GROUP BY 1, 2),
      v AS (
        SELECT word FROM (
          SELECT word,
            ROW_NUMBER() OVER (ORDER BY SUM(n) DESC, word ASC) AS rk
          FROM wc GROUP BY word) t
        WHERE rk <= 16),
      oov AS (
        SELECT lang, CAST(SUM(n) AS BIGINT) AS oov_tokens
        FROM wc WHERE word NOT IN (SELECT word FROM v)
        GROUP BY lang),
      tot AS (
        SELECT lang, CAST(SUM(n) AS BIGINT) AS total_tokens
        FROM wc GROUP BY lang)
      SELECT lang, total_tokens,
        COALESCE(oov_tokens, 0) AS oov_tokens,
        ROUND(CAST(COALESCE(oov_tokens, 0) AS DOUBLE)
          / CAST(total_tokens AS DOUBLE), 9) AS oov_rate
      FROM tot LEFT JOIN oov USING (lang)
      ORDER BY lang""",

    // same tokenization, same 2048 budget arithmetic
    "q162_truncation_loss" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        CAST(SUM(CASE WHEN n_tok > 2048 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_truncated_docs,
        CAST(SUM(GREATEST(n_tok - 2048, 0)) AS BIGINT) AS tokens_lost,
        ROUND(CAST(SUM(GREATEST(n_tok - 2048, 0)) AS DOUBLE)
          / CAST(SUM(n_tok) AS DOUBLE), 9) AS loss_rate
      FROM (
        SELECT lang,
          len(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS n_tok
        FROM documents) t
      GROUP BY lang
      ORDER BY lang""",

    // same md5-uniform draw against the same per-row keep curve
    "q169_binary_encode" -> """
      WITH g AS (
        SELECT lang, COUNT(*) AS n_docs, MIN(md5(text)) AS min_hex
        FROM documents GROUP BY lang)
      SELECT lang, n_docs, min_hex,
        CAST(length(min_hex) AS INT) AS hex_len,
        CAST(octet_length(unhex(min_hex)) AS INT) AS raw_len,
        base64(unhex(min_hex)) AS digest_b64
      FROM g
      ORDER BY lang""",

    // printf mirrors format_string; overlay spelled as substr splice
    "q173_regexp_toolkit" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(len(regexp_extract_all(text, '\btable\b')))
          AS BIGINT) AS table_mentions,
        CAST(SUM(CASE WHEN regexp_matches(text, '\bspark\b')
          THEN 1 ELSE 0 END) AS BIGINT) AS spark_docs,
        CAST(SUM(strpos(text, 'spark')) AS BIGINT) AS spark_pos_sum,
        CAST(SUM(len(regexp_extract_all(text, '[a-z]+')))
          AS BIGINT) AS n_words,
        MIN(NULLIF(regexp_extract(text, '\bs[a-z]+'), ''))
          AS first_s_word
      FROM documents
      GROUP BY lang
      ORDER BY lang""",

    // quantile_disc/cont share Spark's cume_dist / (n-1)·p definitions
    "q176_url_parse" -> """
      WITH u AS (
        SELECT source || '.example.com' AS host,
          '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR) AS path,
          split_part(text, ' ', 1) AS first_word
        FROM documents)
      SELECT host, COUNT(*) AS n_docs,
        COUNT(DISTINCT path) AS n_paths,
        MIN(path) AS min_path,
        COUNT(DISTINCT first_word) AS n_first_words
      FROM u
      GROUP BY host
      ORDER BY host""",

    // ANSI GROUPING(a, b) bitmask = Spark's grouping_id()
    "q178_char_entropy" -> """
      WITH freq AS (
        SELECT doc_id, lang, ch, COUNT(*) AS cnt
        FROM (SELECT doc_id, lang,
                unnest(regexp_extract_all(text, '.')) AS ch
              FROM documents)
        GROUP BY doc_id, lang, ch),
      agg AS (
        SELECT doc_id, lang, CAST(SUM(cnt) AS BIGINT) AS n_chars,
          COUNT(*) AS distinct_chars, list_sort(list(cnt)) AS cnts
        FROM freq GROUP BY doc_id, lang)
      SELECT doc_id, lang, n_chars, distinct_chars,
        ROUND(log2(CAST(n_chars AS DOUBLE)) -
          list_reduce(list_transform(cnts, c ->
            CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))),
            (a, b) -> a + b) / CAST(n_chars AS DOUBLE), 9) AS entropy
      FROM agg
      ORDER BY doc_id""",

    // generate_series(1, 0) is empty here; the length guard matches
    // Spark's, where argless sequence(1, 0) would step downward
    "q179_bpe_pairs" -> """
      WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      pairs AS (
        SELECT unnest(list_transform(range(1, length(w)),
          i -> substr(w, CAST(i AS INT), 2))) AS pair
        FROM words WHERE length(w) >= 2)
      SELECT pair, COUNT(*) AS n
      FROM pairs GROUP BY pair
      ORDER BY n DESC, pair
      LIMIT 20""",

    // same doc_id-derived injection, then the same regex battery;
    // NULLIF aligns DuckDB's '' no-match with Spark's NULL
    "q191_zipf_fit" -> """
      WITH tok AS (
        SELECT unnest(string_split(trim(regexp_replace(lower(text),
          '\s+', ' ', 'g')), ' ')) AS tok
        FROM documents),
      f AS (SELECT tok, COUNT(*) AS freq FROM tok GROUP BY tok
        ORDER BY freq DESC, tok LIMIT 1000),
      r AS (SELECT freq,
        row_number() OVER (ORDER BY freq DESC, tok) AS rank FROM f),
      d AS (SELECT
        CAST(ROUND(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lx,
        CAST(ROUND(ln(CAST(freq AS DOUBLE)), 9) AS DECIMAL(18,9)) AS ly
        FROM r),
      s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(lx) AS DOUBLE) AS sx, CAST(SUM(ly) AS DOUBLE) AS sy,
        CAST(SUM(lx * lx) AS DOUBLE) AS sxx,
        CAST(SUM(lx * ly) AS DOUBLE) AS sxy,
        CAST(SUM(ly * ly) AS DOUBLE) AS syy FROM d)
      SELECT CAST(n AS BIGINT) AS n_tokens,
        ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 9) AS zipf_slope,
        ROUND((sy - sx * ((n*sxy - sx*sy) / (n*sxx - sx*sx))) / n, 9)
          AS intercept,
        ROUND(((n*sxy - sx*sy) * (n*sxy - sx*sy)) /
          ((n*sxx - sx*sx) * (n*syy - sy*sy)), 9) AS r2
      FROM s""",

    // quantile_disc shares Spark's percentile_disc definition, so the
    // cut points are identical actual data values
    "q193_filter_waterfall" -> """
      WITH t AS (
        SELECT string_split(trim(regexp_replace(lower(text), '\s+',
            ' ', 'g')), ' ') AS w,
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        FROM documents),
      g AS (
        SELECT CASE
          WHEN NOT (len(w) BETWEEN 20 AND 100000) THEN 1
          WHEN NOT ((CAST(length(replace(norm, ' ', '')) AS DOUBLE)
            / CAST(len(w) AS DOUBLE)) BETWEEN 2.0 AND 12.0) THEN 2
          WHEN len(list_filter(w, x -> list_contains(
            ['the', 'a', 'of', 'to', 'and'], x))) < 1 THEN 3
          WHEN CAST(len(list_filter(w, x ->
            regexp_matches(x, '^[a-z]+$'))) AS DOUBLE)
            / CAST(len(w) AS DOUBLE) < 0.5 THEN 4
          ELSE 0 END AS ff
        FROM t),
      a AS (SELECT COUNT(*) AS total,
        CAST(SUM(CASE WHEN ff = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        CAST(SUM(CASE WHEN ff = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        CAST(SUM(CASE WHEN ff = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
        CAST(SUM(CASE WHEN ff = 4 THEN 1 ELSE 0 END) AS BIGINT) AS d4
        FROM g)
      SELECT 1 AS stage, 'length' AS gate, total AS n_entering,
        d1 AS n_dropped, total - d1 AS n_surviving FROM a
      UNION ALL SELECT 2, 'mean_word_len', total - d1, d2,
        total - d1 - d2 FROM a
      UNION ALL SELECT 3, 'stopwords', total - d1 - d2, d3,
        total - d1 - d2 - d3 FROM a
      UNION ALL SELECT 4, 'alpha_frac', total - d1 - d2 - d3, d4,
        total - d1 - d2 - d3 - d4 FROM a
      ORDER BY stage""",

    // same deny list, same (n_chars desc, doc_id) cap rank
    "q194_domain_policy" -> """
      WITH d AS (
        SELECT source || '.example.com' AS host, doc_id, n_chars
        FROM documents WHERE source NOT IN ('src3', 'src7')),
      r AS (SELECT host, n_chars, row_number() OVER
          (PARTITION BY host ORDER BY n_chars DESC, doc_id) AS rnk
        FROM d)
      SELECT host, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN rnk <= 15 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        CAST(SUM(CASE WHEN rnk > 15 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_capped,
        CAST(SUM(CASE WHEN rnk <= 15 THEN n_chars ELSE 0 END)
          AS BIGINT) AS kept_chars
      FROM r GROUP BY host
      ORDER BY host""",

    // closed form over the same residue classes the source computes
    "q200_length_buckets" -> """
      WITH t AS (
        SELECT CAST(len(string_split(trim(regexp_replace(lower(text),
          '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
        FROM documents)
      SELECT LEAST(n_tokens // 64, 7) AS bucket,
        COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        MAX(n_tokens) AS max_tokens,
        ROUND(CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS DOUBLE)
          / CAST(MAX(n_tokens) * COUNT(*) AS DOUBLE), 9)
          AS pad_waste_ratio
      FROM t
      GROUP BY 1
      ORDER BY 1""",

    // sparse tf-idf cosine over bigram-shingle features: candidates
    // from the rare-term index, per-term contributions rounded then
    // decimal-summed
    "q201_sparse_cosine" -> """
      WITH wrd AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      trm AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS term
        FROM wrd WHERE len(w) >= 2),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf
             FROM trm GROUP BY doc_id, term),
      dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      n AS (SELECT COUNT(*) AS n_total FROM documents),
      wtf AS (
        SELECT doc_id, term,
          ROUND(CAST(tf AS DOUBLE)
            * ln(CAST(n_total AS DOUBLE) / CAST(df AS DOUBLE)), 9) AS wt
        FROM tf JOIN dfr USING (term) CROSS JOIN n),
      norms AS (
        SELECT doc_id,
          sqrt(CAST(SUM(CAST(ROUND(wt * wt, 9) AS DECIMAL(28,9)))
            AS DOUBLE)) AS norm
        FROM wtf GROUP BY doc_id),
      ix AS (
        SELECT term, doc_id FROM tf
        JOIN (SELECT term FROM dfr WHERE df <= 20) r USING (term)),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ix a JOIN ix b
          ON a.term = b.term AND a.doc_id < b.doc_id),
      dots AS (
        SELECT doc_a, doc_b,
          CAST(SUM(CAST(ROUND(wa.wt * wb.wt, 9) AS DECIMAL(28,9)))
            AS DOUBLE) AS dotp
        FROM cand
        JOIN wtf wa ON wa.doc_id = doc_a
        JOIN wtf wb ON wb.doc_id = doc_b AND wb.term = wa.term
        GROUP BY doc_a, doc_b)
      SELECT doc_a, doc_b,
        ROUND(dotp / (na.norm * nb.norm), 9) AS cosine
      FROM dots
      JOIN norms na ON na.doc_id = doc_a
      JOIN norms nb ON nb.doc_id = doc_b
      WHERE ROUND(dotp / (na.norm * nb.norm), 9) >= 0.5
      ORDER BY doc_a, doc_b""",

    // the declared CSV -> Spark -> DWH path must be lossless end to
    // end; oracle on the original parquet
    "q203_bigram_ppl" -> """
      WITH wrd AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      d2 AS (SELECT doc_id, w FROM wrd WHERE len(w) >= 2),
      bg AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
          unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
        FROM d2),
      train AS (SELECT * FROM bg WHERE doc_id % 10 <> 0),
      c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM train GROUP BY w1, w2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM train GROUP BY w1),
      v AS (SELECT COUNT(DISTINCT w2) AS v FROM train),
      held AS (SELECT * FROM bg WHERE doc_id % 10 = 0),
      scored AS (
        SELECT h.doc_id,
          CAST(ROUND(-ln(CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)
            / CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)), 9)
            AS DECIMAL(28,9)) AS nll
        FROM held h
        LEFT JOIN c2 ON c2.w1 = h.w1 AND c2.w2 = h.w2
        LEFT JOIN c1 ON c1.w1 = h.w1
        CROSS JOIN v)
      SELECT doc_id, COUNT(*) AS n_bigrams,
        ROUND(CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
          AS mean_nll
      FROM scored
      GROUP BY doc_id
      ORDER BY doc_id""",

    // triangles over the MinHash-verified near-dup pairs: the same
    // pair CTEs as q125, then the a<b<c two-join enumeration
    "q207_url_canonicalize" -> """
      WITH t AS (
        SELECT
          'https://WWW.' || upper(source) || '.Example.COM:443/'
            || lang || '/doc-' || CAST(doc_id % 50 AS VARCHAR)
            || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
            || CASE WHEN doc_id % 3 = 0
                 THEN '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
                 WHEN doc_id % 3 = 1
                 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR)
                   || '&utm_campaign=x'
                 ELSE '?id=' || CAST(doc_id % 7 AS VARCHAR) END
            || '#s' || CAST(doc_id % 4 AS VARCHAR) AS url,
          'https://www.' || lower(source) || '.example.com/'
            || lang || '/doc-' || CAST(doc_id % 50 AS VARCHAR)
            || '?id=' || CAST(doc_id % 7 AS VARCHAR) AS canon
        FROM documents)
      SELECT canon, COUNT(*) AS n_urls,
        COUNT(DISTINCT url) AS n_distinct_raw
      FROM t
      GROUP BY canon
      ORDER BY canon""",

    // two independent JSON parsers must agree on the quarantine split;
    // NULL raw is quarantined explicitly (json_valid(NULL) is NULL, so
    // a bare NOT would count it valid) and a missing/null $.k in valid
    // JSON contributes 0, matching the Spark side's coalesce
    "q220_corpus_drift" -> """
      WITH tok AS (
        SELECT doc_id % 2 AS half, t.tok FROM (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+',
              ' ', 'g')), ' ')) AS tok
          FROM documents) t
        WHERE t.tok <> ''),
      counts AS (
        SELECT tok,
          CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_a,
          CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_b
        FROM tok GROUP BY tok),
      totals AS (
        SELECT CAST(SUM(n_a) AS BIGINT) AS tot_a,
          CAST(SUM(n_b) AS BIGINT) AS tot_b,
          COUNT(*) AS v
        FROM counts),
      terms AS (
        SELECT
          CAST(ROUND(p * ln(p / q), 9) AS DECIMAL(18,9)) AS t_ab,
          CAST(ROUND(q * ln(q / p), 9) AS DECIMAL(18,9)) AS t_ba
        FROM (
          SELECT
            CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + v AS DOUBLE) AS p,
            CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + v AS DOUBLE) AS q
          FROM counts CROSS JOIN totals) x)
      SELECT v AS n_vocab, tot_a AS n_tokens_a, tot_b AS n_tokens_b,
        ROUND(CAST(SUM(t_ab) AS DOUBLE), 9) AS kl_ab,
        ROUND(CAST(SUM(t_ba) AS DOUBLE), 9) AS kl_ba
      FROM terms CROSS JOIN totals
      GROUP BY v, tot_a, tot_b""",

    // all arithmetic on exact BIGINT counts until the final double
    // division, mirroring the Spark expression shapes exactly
    "q222_kappa_agreement" -> """
      WITH scored AS (
        SELECT lang,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '), t -> list_contains(['the','a'], t)))
            AS s_en,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '),
            t -> list_contains(['le','la','les'], t))) AS s_fr,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '),
            t -> list_contains(['der','die','das'], t))) AS s_de,
          len(list_filter(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' '),
            t -> list_contains(['el','los','una'], t))) AS s_es
        FROM documents),
      pred AS (
        SELECT lang,
          CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es
                 THEN 'en'
               WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
               WHEN s_de >= s_es THEN 'de'
               ELSE 'es' END AS predicted
        FROM scored),
      conf AS (
        SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred GROUP BY 1, 2),
      tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN lang = predicted THEN n ELSE 0 END)
            AS BIGINT) AS n_agree
        FROM conf),
      rm AS (SELECT lang AS label, CAST(SUM(n) AS BIGINT) AS r
             FROM conf GROUP BY 1),
      cm AS (SELECT predicted AS label, CAST(SUM(n) AS BIGINT) AS c
             FROM conf GROUP BY 1),
      x AS (SELECT CAST(SUM(r * c) AS BIGINT) AS rc
            FROM rm JOIN cm USING (label)),
      k AS (
        SELECT n_docs, n_agree,
          CAST(n_agree AS DOUBLE) / CAST(n_docs AS DOUBLE) AS po,
          CAST(rc AS DOUBLE)
            / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS pe
        FROM tot CROSS JOIN x)
      SELECT n_docs, n_agree, po, pe, (po - pe) / (1 - pe) AS kappa
      FROM k""",

    // q25's banded-candidate CTEs without the 0.8 keep filter, swept
    // over the same threshold grid the Spark side explodes
    "q243_bpe_merges" -> bpeMergesOracle,

    // mixture application: the filter uses the UNROUNDED rate on both
    // sides; only the reported rate column is rounded
    "q232_hashed_classifier" -> """
      WITH wrd AS (
        SELECT doc_id,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      b AS (
        SELECT doc_id,
          (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) % 4096)
            AS bucket
        FROM wrd),
      wt AS (
        SELECT doc_id,
          (CAST(concat('0x', substr(md5(concat('w',
             CAST(bucket AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000
            AS wt
        FROM b),
      agg AS (
        SELECT doc_id, COUNT(*) AS n_tokens,
          CAST(SUM(wt) AS BIGINT) AS weight_sum
        FROM wt GROUP BY doc_id)
      SELECT doc_id, n_tokens, weight_sum,
        ROUND(CAST(weight_sum AS DOUBLE)
          / CAST(n_tokens * 1000 AS DOUBLE), 9) AS score,
        CASE WHEN ROUND(CAST(weight_sum AS DOUBLE)
               / CAST(n_tokens * 1000 AS DOUBLE), 9) >= 0.02 THEN 'keep'
             WHEN ROUND(CAST(weight_sum AS DOUBLE)
               / CAST(n_tokens * 1000 AS DOUBLE), 9) >= -0.02
               THEN 'borderline'
             ELSE 'drop' END AS label
      FROM agg
      ORDER BY doc_id""",

    // dynamic partition pruning: the dim's era filter reaches the
    // fact scan only through the join at runtime; the oracle states
    // the equivalent direct semantics (era = 'modern' <=> year >= 1999)
    "q235_trigram_backoff" -> """
      WITH wrd AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      d3 AS (SELECT doc_id, w FROM wrd WHERE len(w) >= 3),
      tg AS (
        SELECT doc_id,
          unnest(list_transform(range(1, len(w) - 1), i -> w[i])) AS w1,
          unnest(list_transform(range(1, len(w) - 1), i -> w[i+1])) AS w2,
          unnest(list_transform(range(1, len(w) - 1), i -> w[i+2])) AS w3
        FROM d3),
      train AS (SELECT * FROM tg WHERE doc_id % 10 <> 0),
      c3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM train
             GROUP BY w1, w2, w3),
      cctx AS (SELECT w1, w2, COUNT(*) AS c_ctx FROM train GROUP BY w1, w2),
      cbg AS (SELECT w2, w3, COUNT(*) AS c_bg FROM train GROUP BY w2, w3),
      cbgctx AS (SELECT w2, COUNT(*) AS c_bg_ctx FROM train GROUP BY w2),
      cuni AS (SELECT w3, COUNT(*) AS c_uni FROM train GROUP BY w3),
      scal AS (SELECT COUNT(*) AS n_tok, COUNT(DISTINCT w3) AS v
               FROM train),
      held AS (SELECT * FROM tg WHERE doc_id % 10 = 0),
      scored AS (
        SELECT h.doc_id,
          CAST(ROUND(-ln(
            CASE WHEN c3.c3 IS NOT NULL
                 THEN CAST(c3.c3 AS DOUBLE) / CAST(cctx.c_ctx AS DOUBLE)
                 WHEN cbg.c_bg IS NOT NULL AND cbgctx.c_bg_ctx IS NOT NULL
                 THEN 0.4 * CAST(cbg.c_bg AS DOUBLE)
                      / CAST(cbgctx.c_bg_ctx AS DOUBLE)
                 ELSE 0.16 * CAST(COALESCE(cuni.c_uni, 0) + 1 AS DOUBLE)
                      / CAST(s.n_tok + s.v AS DOUBLE) END), 9)
            AS DECIMAL(28,9)) AS nll
        FROM held h
        LEFT JOIN c3 ON c3.w1 = h.w1 AND c3.w2 = h.w2 AND c3.w3 = h.w3
        LEFT JOIN cctx ON cctx.w1 = h.w1 AND cctx.w2 = h.w2
        LEFT JOIN cbg ON cbg.w2 = h.w2 AND cbg.w3 = h.w3
        LEFT JOIN cbgctx ON cbgctx.w2 = h.w2
        LEFT JOIN cuni ON cuni.w3 = h.w3
        CROSS JOIN scal s)
      SELECT doc_id, COUNT(*) AS n_trigrams,
        ROUND(CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
          AS mean_nll
      FROM scored
      GROUP BY doc_id
      ORDER BY doc_id""",

    // source-concentration mixture report; zero-token sources are
    // filtered on BOTH sides so ln(share) stays finite
    "q236_source_concentration" -> """
      WITH tok AS (
        SELECT lang, source,
          CAST(len(string_split(trim(regexp_replace(lower(text), '\s+',
            ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      bysrc AS (
        SELECT lang, source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
        FROM tok GROUP BY lang, source
        HAVING CAST(SUM(n_tokens) AS BIGINT) > 0),
      sh AS (
        SELECT lang, src_tokens,
          CAST(src_tokens AS DOUBLE)
            / CAST(SUM(src_tokens) OVER (PARTITION BY lang) AS DOUBLE)
            AS share
        FROM bysrc)
      SELECT lang, CAST(SUM(src_tokens) AS BIGINT) AS lang_tokens,
        COUNT(*) AS n_sources,
        CAST(SUM(CAST(ROUND(share * share, 9) AS DECIMAL(28,9)))
          AS DOUBLE) AS hhi,
        CAST(SUM(CAST(ROUND(-share * ln(share), 9) AS DECIMAL(28,9)))
          AS DOUBLE) AS entropy,
        ROUND(MAX(share), 9) AS top_share
      FROM sh
      GROUP BY lang
      ORDER BY lang""",

    // q248/q249 share the two-round Lloyd chain: seed = 8 lowest
    // vec_ids, distances rounded to 9 before the argmin (tie-break =
    // lowest cid, DuckDB's row_number ORDER BY dist, cid mirroring
    // Spark's array_position-first-min), centers re-averaged to 9
    // decimals between rounds so both engines iterate from identical
    // doubles. SSE sums 9-rounded dists as exact DECIMAL(28,9).
    "q250_calibration" -> """
      WITH wrd AS (
        SELECT doc_id, lang,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      wt AS (
        SELECT doc_id, lang,
          (CAST(concat('0x', substr(md5(concat('w', CAST(
             (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) % 4096)
           AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
        FROM wrd),
      s AS (
        SELECT doc_id, lang,
          ROUND(CAST(CAST(SUM(wt) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) * 1000 AS DOUBLE), 9) AS score
        FROM wt GROUP BY doc_id, lang),
      mm AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM s),
      p AS (SELECT lang, ROUND((score - lo) / (hi - lo), 9) AS p
            FROM s CROSS JOIN mm),
      bn AS (SELECT CAST(LEAST(FLOOR(p * 10), 9) AS INT) AS bin, p, lang
             FROM p),
      bins AS (
        SELECT bin, COUNT(*) AS n,
          ROUND(CAST(SUM(CAST(p AS DECIMAL(28,9))) AS DOUBLE)
            / COUNT(*), 9) AS avg_p,
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_pos,
          ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              AS DOUBLE) / COUNT(*), 9) AS pos_rate
        FROM bn GROUP BY bin),
      g AS (SELECT *, ROUND(ABS(avg_p - pos_rate), 9) AS gap FROM bins),
      tot AS (SELECT ROUND(CAST(SUM(CAST(gap AS DECIMAL(28,9)) * n)
                AS DOUBLE) / SUM(n), 9) AS ece FROM g)
      SELECT bin, n, avg_p, n_pos, pos_rate, gap, ece
      FROM g CROSS JOIN tot ORDER BY bin""",

    // sqrt-temperature mixture, 1.2-epoch cap; Z rounds to 6 decimals
    // before any division, sqrt is IEEE-exact on both engines
    "q261_heaps_law" -> """
      WITH tok AS (
        SELECT doc_id % 10 AS b,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      g AS (
        SELECT b, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1]
          || ' ' || w[CAST(i AS INT)+2] AS gram
        FROM tok, unnest(range(1, len(w) - 1)) AS t(i)
        WHERE len(w) >= 3),
      tb AS (SELECT b, CAST(count(*) AS BIGINT) AS t FROM g GROUP BY b),
      wmin AS (SELECT gram, MIN(b) AS minb FROM g GROUP BY gram),
      vb AS (SELECT minb AS b, CAST(count(*) AS BIGINT) AS v
             FROM wmin GROUP BY minb),
      pre AS (
        SELECT tb.b AS prefix,
          CAST(SUM(tb.t) OVER (ORDER BY tb.b) AS BIGINT)
            AS n_grams_cum,
          CAST(SUM(COALESCE(vb.v, 0)) OVER (ORDER BY tb.b) AS BIGINT)
            AS types_cum
        FROM tb LEFT JOIN vb ON tb.b = vb.b),
      pts AS (
        SELECT prefix, n_grams_cum, types_cum,
          ROUND(ln(n_grams_cum), 9) AS x,
          ROUND(ln(types_cum), 9) AS y
        FROM pre),
      fit AS (
        SELECT count(*) AS n,
          CAST(SUM(CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(y AS DECIMAL(28,9))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(ROUND(x*y, 9) AS DECIMAL(28,9))) AS DOUBLE)
            AS sxy,
          CAST(SUM(CAST(ROUND(x*x, 9) AS DECIMAL(28,9))) AS DOUBLE)
            AS sxx
        FROM pts)
      SELECT p.prefix, p.n_grams_cum, p.types_cum,
        ROUND((f.n * f.sxy - f.sx * f.sy)
          / (f.n * f.sxx - f.sx * f.sx), 6) AS beta
      FROM pts p CROSS JOIN fit f ORDER BY p.prefix""",

    // discrete KS on the pooled ventile grid; bin assignment via
    // list_filter against the rounded quantile list
    "q264_cms_cert" -> """
      WITH wrd AS (
        SELECT unnest(string_split(trim(regexp_replace(lower(text),
          '\s+', ' ', 'g')), ' ')) AS word
        FROM documents),
      wc AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM wrd WHERE length(word) >= 1 GROUP BY word),
      n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM wc),
      hk AS (
        SELECT word, cnt, i,
          CAST(concat('0x', substr(md5(concat('cms', CAST(i AS VARCHAR),
            '|', word)), 1, 8)) AS BIGINT) % 512 AS bucket
        FROM wc CROSS JOIN (SELECT unnest(range(0, 4)) AS i) r),
      sk AS (
        SELECT i, bucket, CAST(SUM(cnt) AS BIGINT) AS bcnt
        FROM hk GROUP BY i, bucket),
      probes AS (
        SELECT word, cnt AS exact_cnt FROM wc
        ORDER BY cnt DESC, word LIMIT 20),
      est AS (
        SELECT p.word, CAST(MIN(s.bcnt) AS BIGINT) AS est_cnt
        FROM probes p
        JOIN hk ON hk.word = p.word
        JOIN sk s ON s.i = hk.i AND s.bucket = hk.bucket
        GROUP BY p.word)
      SELECT p.word, p.exact_cnt, e.est_cnt,
        e.est_cnt - p.exact_cnt AS err,
        (e.est_cnt - p.exact_cnt) * 512 <= 3 * n.n_total AS within_bound
      FROM probes p JOIN est e ON e.word = p.word CROSS JOIN n
      ORDER BY p.exact_cnt DESC, p.word""",

    // fixed-width balance bands keep the audit shard-composable;
    // SUM(int) would be HUGEINT, so counts stay count(*) BIGINTs
    "q267_bpe_encode" -> bpeEncodeOracle,

    // same score CTEs as q262; quantile_cont matches Spark's exact
    // interpolating percentile; every per-row term rounds to 9 before
    // the comparison so the outlier flag is engine-portable
    "q291_pmi_collocations" -> """
      WITH wrd AS (
        SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ',
          'g')), ' ') AS w
        FROM documents),
      d2 AS (SELECT w FROM wrd WHERE len(w) >= 2),
      bg AS (
        SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
          unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
        FROM d2),
      c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
      c2 AS (SELECT w2, COUNT(*) AS c2 FROM bg GROUP BY w2),
      n AS (SELECT COUNT(*) AS n_bg FROM bg)
      SELECT p.w1, p.w2, CAST(p.c12 AS BIGINT) AS c12,
        ROUND(ln(CAST(p.c12 AS DOUBLE) * CAST(n.n_bg AS DOUBLE) /
          (CAST(c1.c1 AS DOUBLE) * CAST(c2.c2 AS DOUBLE))), 9) AS pmi
      FROM c12 p
      JOIN c1 ON c1.w1 = p.w1
      JOIN c2 ON c2.w2 = p.w2
      CROSS JOIN n
      WHERE p.c12 >= 5
      ORDER BY pmi DESC, p.w1, p.w2 LIMIT 20""",

    // basket = distinct parts of one order; min-support 3 co-orders
  )
}
