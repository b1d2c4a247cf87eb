package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.streaming._
import graft.registry.OracleDefs._

/** Curation family: catalog entries + DuckDB oracle SQL
  * (mechanical split of SparkEntry; content verbatim). */
object CurationRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_multimodal_meta"  -> (Multimodal.q43MultimodalMeta _),
    "q44_media_features"   -> (Multimodal.q44MediaFeatures _),
    "q55_hash_split"       -> (Sampling.q55HashSplit _),
    "q56_stratified_sample" -> (Sampling.q56StratifiedSample _),
    "q57_sequence_packing" -> (Sampling.q57SequencePacking _),
    "q133_binary_ingest"   -> (Multimodal.q133BinaryIngest _),
    "q140_media_transform" -> (Multimodal.q140MediaTransform _),
    "q158_split_leakage"   -> (Sampling.q158SplitLeakage _),
    "q163_weighted_sample" -> (Sampling.q163WeightedSample _),
    "q199_shuffle_order"   -> (Sampling.q199ShuffleOrder _),
    "q214_media_phash"     -> (Multimodal.q214MediaPhash _),
    "q225_budget_selection" -> (Sampling.q225BudgetSelection _),
    "q228_shard_manifest"  -> (Sampling.q228ShardManifest _),
    "q244_mixture_apply"   -> (Sampling.q244MixtureApply _),
    "q251_temperature_mix" -> (Sampling.q251TemperatureMixture _),
    "q252_dsir_select"     -> (Sampling.q252DsirSelect _),
    "q263_doc_chunks"      -> (Sampling.q263DocChunks _),
  )

  val oracleSql: Map[String, String] = Map(
    "q43_multimodal_meta" -> """
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio'
             ELSE 'video' END AS media_type,
        CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        CAST(320 + ascii(substring(md5(text), 1, 1)) * 8 AS INTEGER)
          AS width,
        CAST(240 + ascii(substring(md5(text), 2, 1)) * 4 AS INTEGER)
          AS height,
        CASE WHEN doc_id % 3 = 0 THEN 0
             ELSE CAST(octet_length(encode(text)) AS BIGINT) * 10
             END AS duration_ms
      FROM documents
      ORDER BY doc_id""",
    "q55_hash_split" -> """
      SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
                  WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
                  ELSE 'test' END AS split,
             lang, COUNT(*) AS n_docs
      FROM documents
      GROUP BY 1, 2
      ORDER BY split, lang""",
    "q56_stratified_sample" -> """
      SELECT lang, rn, doc_id, n_chars FROM (
        SELECT lang, doc_id, n_chars,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
            AS INTEGER) AS rn
        FROM documents) t
      WHERE rn <= 20
      ORDER BY lang, rn""",
    "q57_sequence_packing" -> """
      WITH d AS (
        SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
          CAST(len(string_split(trim(regexp_replace(lower(text), '\s+',
            ' ', 'g')), ' ')) AS BIGINT) AS tokens
        FROM documents),
      c AS (
        SELECT shard, doc_id, tokens,
          CAST(SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tokens
        FROM d)
      SELECT shard, (cum_tokens - tokens) // 2048 AS bin,
        COUNT(*) AS n_docs,
        CAST(SUM(tokens) AS BIGINT) AS total_tokens
      FROM c
      GROUP BY shard, bin
      ORDER BY shard, bin""",
    "q133_binary_ingest" -> """
      SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        md5(text) AS content_md5
      FROM documents
      WHERE doc_id % 20 = 0
      ORDER BY doc_id""",

    // the connector's deterministic table recomputed in SQL
    "q140_media_transform" -> """
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio'
             ELSE 'video' END AS media_type,
        CAST(strlen(text) AS INTEGER) AS n_bytes,
        CAST((strlen(text) + 1) // 2 AS INTEGER) AS resized_bytes,
        CAST(LEAST(64, CASE WHEN strlen(text) = 0 THEN 0
          ELSE (strlen(text) - 1) // 4096 + 1 END) AS INTEGER)
          AS n_frames_sampled
      FROM documents
      ORDER BY doc_id""",

    // q69's component labels, applied: drop non-canonical members,
    // roll the surviving corpus up per language
    "q158_split_leakage" -> """
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words WHERE len(w) >= 2),
      shingles AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      minh AS (
        SELECT doc_id, seed,
               min(md5(CAST(seed AS VARCHAR) || '|' || s)) AS mh
        FROM shingles CROSS JOIN (SELECT unnest(range(16)) AS seed) t
        GROUP BY doc_id, seed),
      bands AS (
        SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
               md5(string_agg(mh, ',' ORDER BY seed)) AS band_key
        FROM minh GROUP BY doc_id, seed // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      pairs AS (
        SELECT doc_a, doc_b
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      sp AS (
        SELECT doc_a, doc_b,
          CASE WHEN md5(CAST(doc_a AS VARCHAR)) < 'cc' THEN 'train'
               WHEN md5(CAST(doc_a AS VARCHAR)) < 'e6' THEN 'val'
               ELSE 'test' END AS split_a,
          CASE WHEN md5(CAST(doc_b AS VARCHAR)) < 'cc' THEN 'train'
               WHEN md5(CAST(doc_b AS VARCHAR)) < 'e6' THEN 'val'
               ELSE 'test' END AS split_b
        FROM pairs)
      SELECT split_a, split_b, COUNT(*) AS n_pairs,
        CAST(SUM(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END)
          AS BIGINT) AS n_leaks,
        MIN(doc_a) AS example_doc_a
      FROM sp
      GROUP BY split_a, split_b
      ORDER BY split_a, split_b""",

    // identical sequential-fold norms, rounded then decimal-summed
    "q163_weighted_sample" -> """
      WITH d AS (
        SELECT lang,
          CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
            AS BIGINT) AS DOUBLE) / 4294967296.0 AS u,
          LEAST(1.0, CAST(n_chars AS DOUBLE) / 2000.0) AS p
        FROM documents)
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN u < p THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        ROUND(CAST(SUM(CASE WHEN u < p THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE), 9) AS keep_rate,
        ROUND(CAST(SUM(CAST(ROUND(p, 9) AS DECIMAL(18,9))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE), 9) AS expected_rate
      FROM d
      GROUP BY lang
      ORDER BY lang""",

    // same simulated v2 (drop %7, amend %10, append shifted ids)
    "q199_shuffle_order" -> """
      SELECT CAST(ROW_NUMBER() OVER (
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
          AS rank,
        doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents
      ORDER BY rank""",

    // integer token math until the final ratio
    "q214_media_phash" -> """
      WITH bins AS (
        SELECT doc_id, unnest(list_transform(range(1, length(text) - 2),
          j -> (((ascii(substr(text, j, 1)) * 31
                  + ascii(substr(text, j + 1, 1))) * 31
                 + ascii(substr(text, j + 2, 1))) * 31
                + ascii(substr(text, j + 3, 1))) % 128)) AS bin
        FROM documents WHERE length(text) >= 4),
      hist AS (
        SELECT doc_id, list_transform(range(0, 128), b ->
          coalesce(len(list_filter(bl, x -> x = b)), 0)) AS hist
        FROM (SELECT doc_id, list(bin) AS bl FROM bins GROUP BY doc_id)),
      h AS (
        SELECT doc_id,
          list_sum(list_transform(range(0, 63), b ->
            CASE WHEN hist[b + 2] > hist[b + 1]
                 THEN 1::BIGINT << b ELSE 0::BIGINT END)) AS h_lo,
          list_sum(list_transform(range(0, 63), b ->
            CASE WHEN hist[b + 66] > hist[b + 65]
                 THEN 1::BIGINT << b ELSE 0::BIGINT END)) AS h_hi
        FROM hist)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(bit_count(xor(a.h_lo, b.h_lo))
             + bit_count(xor(a.h_hi, b.h_hi)) AS INTEGER) AS hamming
      FROM h a JOIN h b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.h_lo, b.h_lo))
            + bit_count(xor(a.h_hi, b.h_hi)) <= 7
      ORDER BY doc_a, doc_b""",

    // q69's component CTEs + token counts + argmax-by-quality: the
    // keep-best (not keep-first) representative policy, pinned exactly
    "q225_budget_selection" -> """
      WITH n AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
            ' ') AS w
        FROM documents),
      q AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS tokens,
          CASE WHEN len(w) >= 50
                    AND CAST(len(list_filter(w, t ->
                      list_contains(['the','a'], t))) AS DOUBLE)
                      / CAST(len(w) AS DOUBLE) <= 0.2 THEN 'high'
               WHEN len(w) >= 20 THEN 'medium'
               ELSE 'low' END AS quality
        FROM n),
      t AS (
        SELECT doc_id, tokens, quality,
          CASE quality WHEN 'high' THEN 0 WHEN 'medium' THEN 1
               ELSE 2 END AS tier
        FROM q),
      c AS (
        SELECT tier, quality, tokens,
          SUM(tokens) OVER (ORDER BY tier, doc_id
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM t),
      b AS (SELECT SUM(tokens) // 2 AS budget FROM t)
      SELECT tier, quality,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(tokens) AS BIGINT) AS tokens_total,
        CAST(SUM(CASE WHEN cum <= budget THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept,
        CAST(SUM(CASE WHEN cum <= budget THEN tokens ELSE 0 END)
          AS BIGINT) AS tokens_kept
      FROM c CROSS JOIN b
      GROUP BY tier, quality
      ORDER BY tier""",

    // per-pair signature agreement from the minh CTE joined per seed;
    // exact-Jaccard means via integer micro-units (no float-sum order)
    "q228_shard_manifest" -> shardManifestOracle,

    // q69's recursive-CTE components; representative = the component's
    // min doc_id = the CC label on both sides
    "q244_mixture_apply" -> """
      WITH d AS (
        SELECT doc_id, lang,
          CAST(len(string_split(trim(regexp_replace(lower(text), '\s+',
            ' ', 'g')), ' ')) AS BIGINT) AS tokens
        FROM documents),
      bylang AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs_in,
          CAST(SUM(tokens) AS BIGINT) AS tokens_in
        FROM d GROUP BY lang),
      m AS (SELECT MIN(tokens_in) AS budget FROM bylang),
      rates AS (
        SELECT lang, n_docs_in, tokens_in,
          LEAST(1.0, CAST(budget AS DOUBLE) / CAST(tokens_in AS DOUBLE))
            AS rate
        FROM bylang CROSS JOIN m),
      kept AS (
        SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
          CAST(SUM(d.tokens) AS BIGINT) AS tokens_kept
        FROM d JOIN rates USING (lang)
        WHERE CAST(CAST(concat('0x',
            substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
            AS DOUBLE) / 16777216.0 < rates.rate
        GROUP BY d.lang)
      SELECT r.lang, r.n_docs_in, r.tokens_in, ROUND(r.rate, 9) AS rate,
        COALESCE(k.n_docs_kept, 0) AS n_docs_kept,
        COALESCE(k.tokens_kept, 0) AS tokens_kept
      FROM rates r LEFT JOIN kept k ON k.lang = r.lang
      ORDER BY r.lang""",

    // certificates for the remaining sketch families (the q234
    // pattern): the oracle owns the exact side and asserts the bound
    // flag as literal TRUE — sketch drift fails the round's hash
    "q251_temperature_mix" -> """
      WITH tok AS (
        SELECT lang,
          CAST(len(string_split(trim(regexp_replace(lower(text), '\s+',
            ' ', 'g')), ' ')) AS BIGINT) AS n
        FROM documents),
      byl AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS tokens
              FROM tok GROUP BY lang),
      z AS (SELECT ROUND(SUM(sqrt(tokens)), 6) AS z,
              CAST(SUM(tokens) AS BIGINT) AS budget FROM byl),
      m AS (
        SELECT lang, tokens,
          ROUND(sqrt(tokens) / z, 9) AS weight,
          ROUND(ROUND(sqrt(tokens) / z, 9) * budget, 3) AS target_tokens,
          ROUND(LEAST(ROUND(ROUND(sqrt(tokens) / z, 9) * budget, 3),
            tokens * CAST(1.2 AS DOUBLE)), 3) AS capped_tokens
        FROM byl CROSS JOIN z)
      SELECT lang, tokens, weight, target_tokens, capped_tokens,
        ROUND(capped_tokens / tokens, 9) AS epochs
      FROM m ORDER BY lang""",

    // DSIR: add-one-smoothed unigram log-likelihood ratio vs the src0
    // target; per-token ratios round to 9 then decimal-sum
    "q252_dsir_select" -> """
      WITH tok AS (
        SELECT doc_id, source,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      tgt AS (SELECT word, CAST(count(*) AS BIGINT) AS ct
              FROM tok WHERE source = 'src0' GROUP BY word),
      raw AS (SELECT word, CAST(count(*) AS BIGINT) AS cr
              FROM tok GROUP BY word),
      sc AS (SELECT CAST(count(*) AS BIGINT) AS nt
             FROM tok WHERE source = 'src0'),
      sr AS (SELECT CAST(count(*) AS BIGINT) AS nr,
               CAST(count(DISTINCT word) AS BIGINT) AS v FROM tok),
      scored AS (
        SELECT t.doc_id,
          ROUND(ln((CAST(COALESCE(g.ct, 0) + 1 AS DOUBLE)
                     * CAST(sr.nr + sr.v AS DOUBLE))
                 / (CAST(r.cr + 1 AS DOUBLE)
                     * CAST(sc.nt + sr.v AS DOUBLE))), 9) AS lr
        FROM tok t
        LEFT JOIN tgt g USING (word)
        JOIN raw r USING (word)
        CROSS JOIN sc CROSS JOIN sr),
      agg AS (
        SELECT doc_id, count(*) AS n_tokens,
          ROUND(CAST(SUM(CAST(lr AS DECIMAL(28,9))) AS DOUBLE)
            / count(*), 9) AS dsir_score
        FROM scored GROUP BY doc_id)
      SELECT d.doc_id, d.lang, d.source, a.n_tokens, a.dsir_score
      FROM agg a JOIN documents d USING (doc_id)
      ORDER BY a.dsir_score DESC, d.doc_id LIMIT 25""",

    // winnowing: 4-gram hashes, window w=5, min per full window;
    // 1-based positions here vs 0-based in Spark — same full-window set
    "q263_doc_chunks" -> """
      WITH w AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      n AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n FROM w),
      k AS (
        SELECT doc_id, w, n,
          unnest(range(0, 1 + (greatest(n - 64, 0) + 47) // 48)) AS k
        FROM n)
      SELECT doc_id, CAST(k AS INT) AS chunk_idx,
        CAST(k * 48 AS BIGINT) AS chunk_start,
        least(64, n - k * 48) AS chunk_len,
        array_to_string(w[CAST(k * 48 + 1 AS BIGINT)
          : CAST(least(k * 48 + 64, n) AS BIGINT)], ' ') AS chunk_text
      FROM k ORDER BY doc_id, chunk_idx""",

    // the sketch is rebuilt cell-for-cell from the same md5 row
    // hashes; the 3N/W bound check is pure integer arithmetic
  )
}
