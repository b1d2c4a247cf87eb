package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.streaming._
import graft.registry.OracleDefs._

/** Quality family: catalog entries + DuckDB oracle SQL
  * (mechanical split of SparkEntry; content verbatim). */
object QualityRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_observe"         -> (Quality.q102Observe _),
    "q103_na_fill"         -> (Quality.q103NaFill _),
    "q104_crosstab"        -> (Quality.q104Crosstab _),
    "q105_schema_evolution" -> (Quality.q105SchemaEvolution _),
    "q106_try_cast"        -> (Quality.q106TryCast _),
    "q107_levenshtein"     -> (Quality.q107Levenshtein _),
    "q109_data_masking"    -> (Quality.q109DataMasking _),
    "q180_pii_scan"        -> (Quality.q180PiiScan _),
    "q221_chi2_independence" -> (Quality.q221Chi2Independence _),
    "q227_pii_redaction"   -> (Quality.q227PiiRedaction _),
    "q230_fuzzy_join"      -> (Quality.q230FuzzyJoin _),
    "q239_fuzzy_join_d2"   -> (Quality.q239FuzzyJoinD2 _),
    "q258_source_gates"    -> (Quality.q258SourceGates _),
    "q262_score_drift"     -> (Quality.q262ScoreDrift _),
    "q265_k_anonymity"     -> (Quality.q265KAnonymity _),
    "q266_l_diversity"     -> (Quality.q266LDiversity _),
    "q268_mad_outliers"    -> (Quality.q268MadOutliers _),
    "q269_robust_clip"     -> (Quality.q269RobustClip _),
    "q271_skyline"         -> (Quality.q271Skyline _),
    "q276_linkage_weights" -> (Quality.q276LinkageWeights _),
    "q282_jackknife_se"    -> (Quality.q282JackknifeSe _),
    "q299_block_health"    -> (Quality.q299BlockHealth _),
  )

  val oracleSql: Map[String, String] = Map(
    "q102_observe" -> """
      SELECT COUNT(*) AS n_rows,
        COUNT(CASE WHEN o_totalprice > 300000 THEN 1 END) AS n_big,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders""",
    "q103_na_fill" -> """
      SELECT CASE WHEN doc_id % 7 = 0 THEN 'unknown' ELSE lang END
               AS lang,
        COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE n_chars END)
          AS BIGINT) AS total_chars
      FROM documents
      GROUP BY 1
      ORDER BY lang""",
    "q104_crosstab" -> """
      SELECT o_orderstatus AS o_orderstatus_o_orderpriority,
        COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
          AS "1-URGENT",
        COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END)
          AS "2-HIGH",
        COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END)
          AS "3-MEDIUM",
        COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
          AS "4-NOT SPECIFIED",
        COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END)
          AS "5-LOW"
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    // availability of `source` follows the batch split exactly
    "q105_schema_evolution" -> """
      SELECT lang, COUNT(*) AS n_docs,
        COUNT(CASE WHEN doc_id % 2 = 1 THEN source END)
          AS n_with_source,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents
      GROUP BY lang
      ORDER BY lang""",
    "q106_try_cast" -> """
      SELECT o_orderstatus, COUNT(*) AS n,
        COUNT(ratio) AS n_divisible,
        MIN(ratio) AS min_ratio, MAX(ratio) AS max_ratio,
        COUNT(bad_cast) AS n_cast_ok
      FROM (
        SELECT o_orderstatus,
          o_totalprice / NULLIF(o_custkey % 3, 0) AS ratio,
          TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast
        FROM orders) t
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",
    "q107_levenshtein" -> """
      SELECT a.n_name AS name_a, b.n_name AS name_b,
        CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS dist
      FROM nation a JOIN nation b ON a.n_name < b.n_name
      WHERE levenshtein(a.n_name, b.n_name) <= 6
      ORDER BY name_a, name_b""",

    // native session_window: new session at gap >= 30 min (an event at
    // exactly last+gap falls outside the [start, last+gap) window)
    "q109_data_masking" -> """
      SELECT c_custkey,
        regexp_replace(regexp_replace(regexp_replace(c_name,
          '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
          AS masked_name,
        sha256(c_name) AS pseudonym,
        c_name AS roundtrip_name
      FROM customer
      WHERE c_custkey <= 200
      ORDER BY c_custkey""",
    "q180_pii_scan" -> """
      WITH t AS (
        SELECT source,
          CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
            CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE text END AS t
        FROM documents)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN regexp_matches(t,
          '[a-z0-9]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END)
          AS BIGINT) AS docs_with_email,
        CAST(SUM(len(regexp_extract_all(t,
          '[a-z0-9]+@[a-z0-9.-]+\.[a-z]{2,}'))) AS BIGINT) AS n_emails,
        CAST(SUM(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')))
          AS BIGINT) AS n_phones,
        MIN(NULLIF(regexp_extract(t,
          '[a-z0-9]+@[a-z0-9.-]+\.[a-z]{2,}'), '')) AS sample_email
      FROM t GROUP BY source ORDER BY source""",

    // centroid means rounded to 9 before scoring on both sides, then
    // identical sequential folds — the rank boundary is exact
    "q221_chi2_independence" -> """
      WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS observed
        FROM documents GROUP BY lang, source),
      r AS (SELECT lang, CAST(SUM(observed) AS BIGINT) AS row_total
            FROM cells GROUP BY lang),
      c AS (SELECT source, CAST(SUM(observed) AS BIGINT) AS col_total
            FROM cells GROUP BY source),
      g AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM cells),
      j AS (
        SELECT cells.lang, cells.source, observed, row_total, col_total,
          CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)
            / CAST(n AS DOUBLE) AS expected
        FROM cells JOIN r USING (lang) JOIN c USING (source)
        CROSS JOIN g)
      SELECT lang, source, observed, row_total, col_total, expected,
        (CAST(observed AS DOUBLE) - expected)
          * (CAST(observed AS DOUBLE) - expected) / expected AS chi2_term
      FROM j
      ORDER BY lang, source""",
    "q227_pii_redaction" -> """
      WITH inj AS (
        SELECT source,
          CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
            CAST(doc_id AS VARCHAR) || '@example.com or +1-555-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE text END AS t
        FROM documents),
      red AS (
        SELECT source, t,
          regexp_replace(regexp_replace(t,
            '[a-z0-9]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
            '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS r
        FROM inj)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(COUNT(CASE WHEN t <> r THEN 1 END) AS BIGINT)
          AS docs_redacted,
        CAST(SUM(len(regexp_extract_all(t,
          '[a-z0-9]+@[a-z0-9.-]+\.[a-z]{2,}'))) AS BIGINT)
          AS emails_redacted,
        CAST(SUM(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')))
          AS BIGINT) AS phones_redacted,
        CAST(SUM(('0x' || substr(md5(r), 1, 12))::BIGINT) AS BIGINT)
          AS corpus_checksum,
        CAST(COUNT(CASE WHEN regexp_matches(r,
            '[a-z0-9]+@[a-z0-9.-]+\.[a-z]{2,}')
          OR regexp_matches(r, '\+1-555-[0-9]{4}') THEN 1 END)
          AS BIGINT) AS residual_pii
      FROM red GROUP BY source ORDER BY source""",
    "q230_fuzzy_join" -> """
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
      ORDER BY id_a, id_b""",

    // delete-2 blocking is recall-complete for dist<=2 (SymSpell), so
    // the oracle is again the naive all-pairs definition — over the
    // same %7 qualification slice (the dist<=2 relation on the full
    // table is Theta(n^2)-dense; see the q239 scaladoc)
    "q239_fuzzy_join_d2" -> """
      WITH s AS (SELECT c_custkey, c_name FROM customer
                 WHERE c_custkey % 7 = 3)
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
      FROM s a JOIN s b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 2
      ORDER BY id_a, id_b""",
    "q258_source_gates" -> """
      WITH base AS (
        SELECT doc_id, source,
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
          length(text) AS n_chars_raw,
          length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
        FROM documents),
      feat AS (
        SELECT doc_id, source,
          len(string_split(norm, ' ')) AS n_tok,
          CAST(n_digits AS DOUBLE) / n_chars_raw AS digit_ratio,
          CAST(length(norm) - (len(string_split(norm, ' ')) - 1)
            AS DOUBLE) / len(string_split(norm, ' ')) AS mean_wl,
          (doc_id % 7 = 0) AS pii
        FROM base),
      g AS (
        SELECT source,
          (n_tok BETWEEN 20 AND 2000) AS len_ok,
          (digit_ratio <= 0.2) AS digit_ok,
          (mean_wl BETWEEN 2 AND 12) AS wl_ok, pii
        FROM feat)
      SELECT source, count(*) AS n_docs,
        CAST(SUM(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT)
          AS n_len_ok,
        CAST(SUM(CASE WHEN digit_ok THEN 1 ELSE 0 END) AS BIGINT)
          AS n_digit_ok,
        CAST(SUM(CASE WHEN wl_ok THEN 1 ELSE 0 END) AS BIGINT)
          AS n_wl_ok,
        CAST(SUM(CASE WHEN pii THEN 1 ELSE 0 END) AS BIGINT) AS n_pii,
        CAST(SUM(CASE WHEN len_ok AND digit_ok AND wl_ok AND NOT pii
          THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      FROM g GROUP BY source ORDER BY source""",

    // composed embedding-tier report: the q248/q249/q255 section
    // oracles unioned over ONE shared Lloyd chain
    "q262_score_drift" -> """
      WITH wrd AS (
        SELECT doc_id, source,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      wt AS (
        SELECT doc_id, source,
          (CAST(concat('0x', substr(md5(concat('w', CAST(
             (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT)
               % 4096)
           AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
        FROM wrd),
      s AS (
        SELECT doc_id, source,
          ROUND(CAST(CAST(SUM(wt) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) * 1000 AS DOUBLE), 9) AS score
        FROM wt GROUP BY doc_id, source),
      thr AS (
        SELECT list_transform(quantile_cont(score,
          [0.05, 0.10, 0.15, 0.20, 0.25, 0.30, 0.35, 0.40, 0.45, 0.50,
           0.55, 0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 0.90, 0.95]),
          q -> ROUND(q, 9)) AS g
        FROM s),
      b AS (
        SELECT source, len(list_filter(g, t -> score > t)) AS bin
        FROM s CROSS JOIN thr),
      sb AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS n
             FROM b GROUP BY source, bin),
      grid AS (SELECT CAST(j AS INT) AS j FROM unnest(range(1, 20))
               AS t(j)),
      src_n AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_src
                FROM sb GROUP BY source),
      f AS (
        SELECT sb.source, g.j,
          CAST(SUM(CASE WHEN sb.bin < g.j THEN sb.n ELSE 0 END)
            AS BIGINT) AS c
        FROM sb CROSS JOIN grid g GROUP BY sb.source, g.j),
      fc AS (
        SELECT g.j,
          CAST(SUM(CASE WHEN sb.bin < g.j THEN sb.n ELSE 0 END)
            AS BIGINT) AS cc
        FROM sb CROSS JOIN grid g GROUP BY g.j),
      nc AS (SELECT CAST(SUM(n) AS BIGINT) AS nc FROM sb),
      d AS (
        SELECT f.source, f.j,
          ROUND(ABS(CAST(f.c AS DOUBLE) / sn.n_src
            - CAST(fc.cc AS DOUBLE) / nc.nc), 9) AS diff
        FROM f JOIN fc ON f.j = fc.j
        JOIN src_n sn ON f.source = sn.source
        CROSS JOIN nc)
      SELECT source, MAX(diff) AS ks,
        CAST(MIN(CASE WHEN diff = mx THEN j END) AS INT) AS worst_j
      FROM (SELECT *, MAX(diff) OVER (PARTITION BY source) AS mx FROM d)
      GROUP BY source ORDER BY source""",

    // chunk grid is pure integer arithmetic: 1 + ceil(max(0,n-64)/48)
    // chunks per doc, slice end clamped by the list length on both
    // engines
    "q265_k_anonymity" -> """
      WITH cls AS (
        SELECT c_mktsegment, c_nationkey,
          CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
          CAST(count(*) AS BIGINT) AS class_size
        FROM customer
        GROUP BY c_mktsegment, c_nationkey, bal_band)
      SELECT class_size,
        CAST(count(*) AS BIGINT) AS n_classes,
        CAST(count(*) * class_size AS BIGINT) AS n_rows,
        class_size < 5 AS at_risk
      FROM cls GROUP BY class_size ORDER BY class_size""",

    // two stacked group-bys mirror the Spark no-Expand distinct;
    // SUM casts keep DuckDB's HUGEINT out of the schema
    "q266_l_diversity" -> """
      WITH cls AS (
        SELECT c_nationkey,
          CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
          CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div,
          CAST(COUNT(*) AS BIGINT) AS class_size
        FROM customer GROUP BY c_nationkey, bal_band)
      SELECT l_div, CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(SUM(class_size) AS BIGINT) AS n_rows,
        l_div < 3 AS at_risk
      FROM cls GROUP BY l_div ORDER BY l_div""",
    "q268_mad_outliers" -> """
      WITH wrd AS (
        SELECT doc_id, source,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      wt AS (
        SELECT doc_id, source,
          (CAST(concat('0x', substr(md5(concat('w', CAST(
             (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT)
               % 4096)
           AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
        FROM wrd),
      s AS (
        SELECT doc_id, source,
          ROUND(CAST(CAST(SUM(wt) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) * 1000 AS DOUBLE), 9) AS score
        FROM wt GROUP BY doc_id, source),
      med AS (
        SELECT source, ROUND(quantile_cont(score, 0.5), 9) AS med
        FROM s GROUP BY source),
      dev AS (
        SELECT s.source, m.med, ROUND(ABS(s.score - m.med), 9) AS dev
        FROM s JOIN med m ON s.source = m.source),
      mad AS (
        SELECT source, ROUND(quantile_cont(dev, 0.5), 9) AS mad
        FROM dev GROUP BY source)
      SELECT d.source,
        CAST(count(*) AS BIGINT) AS n_docs, d.med, a.mad,
        CAST(SUM(CASE WHEN d.dev > ROUND(a.mad * 4.4478, 9)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        ROUND(CAST(SUM(CASE WHEN d.dev > ROUND(a.mad * 4.4478, 9)
            THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 9) AS outlier_rate
      FROM dev d JOIN mad a ON d.source = a.source
      GROUP BY d.source, d.med, a.mad ORDER BY d.source""",

    // q268's CTEs with the score carried through; the clip, the
    // displaced mass, and the zero-residual certificate all mirror
    // the Spark rounding discipline term for term
    "q269_robust_clip" -> """
      WITH wrd AS (
        SELECT doc_id, source,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      wt AS (
        SELECT doc_id, source,
          (CAST(concat('0x', substr(md5(concat('w', CAST(
             (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT)
               % 4096)
           AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
        FROM wrd),
      s AS (
        SELECT doc_id, source,
          ROUND(CAST(CAST(SUM(wt) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) * 1000 AS DOUBLE), 9) AS score
        FROM wt GROUP BY doc_id, source),
      med AS (
        SELECT source, ROUND(quantile_cont(score, 0.5), 9) AS med
        FROM s GROUP BY source),
      dev AS (
        SELECT s.source, m.med, s.score,
          ROUND(ABS(s.score - m.med), 9) AS dev
        FROM s JOIN med m ON s.source = m.source),
      mad AS (
        SELECT source, ROUND(quantile_cont(dev, 0.5), 9) AS mad
        FROM dev GROUP BY source),
      c AS (
        SELECT d.source, d.med, a.mad, d.score,
          ROUND(a.mad * 4.4478, 9) AS hw,
          ROUND(d.med - ROUND(a.mad * 4.4478, 9), 9) AS lo,
          ROUND(d.med + ROUND(a.mad * 4.4478, 9), 9) AS hi
        FROM dev d JOIN mad a ON d.source = a.source),
      cc AS (
        SELECT source, med, mad, score, hw, lo, hi,
          LEAST(GREATEST(score, lo), hi) AS clipped
        FROM c)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, med, mad,
        CAST(SUM(CASE WHEN score < lo THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clipped_lo,
        CAST(SUM(CASE WHEN score > hi THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clipped_hi,
        ROUND(CAST(SUM(CAST(ROUND(ABS(score - clipped), 9)
          AS DECIMAL(28,9))) AS DOUBLE), 9) AS mass_moved,
        CAST(SUM(CASE WHEN ROUND(ABS(clipped - med), 9) > hw
          THEN 1 ELSE 0 END) AS BIGINT) AS n_residual
      FROM cc GROUP BY source, med, mad ORDER BY source""",
    "q271_skyline" -> """
      WITH wrd AS (
        SELECT doc_id, lang,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      wt AS (
        SELECT doc_id, lang,
          (CAST(concat('0x', substr(md5(concat('w', CAST(
             (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT)
               % 4096)
           AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
        FROM wrd),
      s AS (
        SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
          ROUND(CAST(CAST(SUM(wt) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) * 1000 AS DOUBLE), 9) AS score
        FROM wt GROUP BY doc_id, lang),
      sky AS (
        SELECT doc_id, lang, n_tokens, score,
          MAX(score) OVER (PARTITION BY lang ORDER BY n_tokens
            RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS my_gt,
          MAX(score) OVER (PARTITION BY lang, n_tokens) AS my_eq
        FROM s)
      SELECT doc_id, lang, n_tokens, score FROM sky
      WHERE (my_gt IS NULL OR my_gt < score) AND my_eq = score
      ORDER BY lang, n_tokens DESC, doc_id""",

    // integer-scaled centering (n*x - S) keeps numerator/denominator
    // exact; the only float op is the final division
    "q282_jackknife_se" -> """
      WITH wrd AS (
        SELECT doc_id, source,
          unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS word
        FROM documents),
      wt AS (
        SELECT doc_id, source,
          (CAST(concat('0x', substr(md5(concat('w', CAST(
             (CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT)
               % 4096)
           AS VARCHAR))), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
        FROM wrd),
      s AS (
        SELECT doc_id, source,
          ROUND(CAST(CAST(SUM(wt) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) * 1000 AS DOUBLE), 9) AS score
        FROM wt GROUP BY doc_id, source),
      sh2 AS (
        SELECT source,
          CAST(concat('0x', substr(md5(concat('jk',
            CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 16 AS j,
          CAST(COUNT(*) AS BIGINT) AS nj,
          SUM(CAST(score AS DECIMAL(28,9))) AS sj
        FROM s GROUP BY source, j),
      tot AS (
        SELECT source, CAST(SUM(nj) AS BIGINT) AS n, SUM(sj) AS stot,
          CAST(COUNT(*) AS BIGINT) AS g
        FROM sh2 GROUP BY source HAVING COUNT(*) >= 2),
      mj AS (
        SELECT s2.source, t.g, t.n, t.stot,
          ROUND(CAST(t.stot - s2.sj AS DOUBLE)
            / CAST(t.n - s2.nj AS DOUBLE), 9) AS mj
        FROM sh2 s2 JOIN tot t ON t.source = s2.source),
      mb AS (
        SELECT source, ROUND(CAST(SUM(CAST(mj AS DECIMAL(28,9)))
          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS mbar
        FROM mj GROUP BY source),
      d2 AS (
        SELECT m.source, m.g, m.n, m.stot,
          CAST(ROUND((m.mj - b.mbar) * (m.mj - b.mbar), 9)
            AS DECIMAL(28,9)) AS d2
        FROM mj m JOIN mb b ON b.source = m.source),
      fin AS (
        SELECT source, g, n, stot, SUM(d2) AS ssd
        FROM d2 GROUP BY source, g, n, stot)
      SELECT source, n AS n_docs, g AS n_shards,
        ROUND(CAST(stot AS DOUBLE) / CAST(n AS DOUBLE), 9) AS mean_score,
        ROUND(sqrt(CAST(g - 1 AS DOUBLE) / CAST(g AS DOUBLE)
          * CAST(ssd AS DOUBLE)), 9) AS se_jack
      FROM fin ORDER BY source""",

    // floor(epoch()) mirrors Spark's second-truncating unix_timestamp
    // on the microsecond event times; greedy-from-earliest chaining
    "q276_linkage_weights" -> """
      WITH m AS (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1),
      attrs AS (
        SELECT c_custkey AS id, c_nationkey AS nat, c_mktsegment AS seg,
          CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band
        FROM customer),
      np AS (
        SELECT a.id AS id_a, b.id AS id_b
        FROM attrs a JOIN attrs b ON b.id = a.id + 1
        WHERE NOT EXISTS (SELECT 1 FROM m
          WHERE m.id_a = a.id AND m.id_b = b.id)),
      ma AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_m,
          CAST(SUM(CASE WHEN x.nat = y.nat THEN 1 ELSE 0 END) AS BIGINT)
            AS nat_m,
          CAST(SUM(CASE WHEN x.seg = y.seg THEN 1 ELSE 0 END) AS BIGINT)
            AS seg_m,
          CAST(SUM(CASE WHEN x.band = y.band THEN 1 ELSE 0 END) AS BIGINT)
            AS band_m
        FROM m JOIN attrs x ON x.id = m.id_a
        JOIN attrs y ON y.id = m.id_b),
      ua AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_u,
          CAST(SUM(CASE WHEN x.nat = y.nat THEN 1 ELSE 0 END) AS BIGINT)
            AS nat_u,
          CAST(SUM(CASE WHEN x.seg = y.seg THEN 1 ELSE 0 END) AS BIGINT)
            AS seg_u,
          CAST(SUM(CASE WHEN x.band = y.band THEN 1 ELSE 0 END) AS BIGINT)
            AS band_u
        FROM np JOIN attrs x ON x.id = np.id_a
        JOIN attrs y ON y.id = np.id_b),
      f AS (
        SELECT 'bal_band' AS field, band_m AS agree_m, band_u AS agree_u,
          n_m, n_u FROM ma CROSS JOIN ua
        UNION ALL SELECT 'nation', nat_m, nat_u, n_m, n_u
          FROM ma CROSS JOIN ua
        UNION ALL SELECT 'segment', seg_m, seg_u, n_m, n_u
          FROM ma CROSS JOIN ua)
      SELECT field, n_m AS n_match_pairs, agree_m AS agree_match,
        n_u AS n_nonmatch_pairs, agree_u AS agree_nonmatch,
        ROUND(CAST(agree_m + 1 AS DOUBLE) / CAST(n_m + 2 AS DOUBLE), 9)
          AS m_prob,
        ROUND(CAST(agree_u + 1 AS DOUBLE) / CAST(n_u + 2 AS DOUBLE), 9)
          AS u_prob,
        ROUND(log2(
          ROUND(CAST(agree_m + 1 AS DOUBLE) / CAST(n_m + 2 AS DOUBLE), 9)
          / ROUND(CAST(agree_u + 1 AS DOUBLE) / CAST(n_u + 2 AS DOUBLE),
              9)), 9) AS weight
      FROM f ORDER BY field""",

    // persisted vector-index lifecycle: probes must equal re-deriving
    // the deterministic model in SQL — q294 trains on the full corpus,
    // q295 trains on the base slice and assigns everyone (append under
    // a frozen model == rebuild under the same model)
    "q299_block_health" -> blockHealthOracle,
  )
}
