package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.streaming._
import graft.registry.OracleDefs._

/** Dedup family: catalog entries + DuckDB oracle SQL
  * (mechanical split of SparkEntry; content verbatim). */
object DedupRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_dedup_exact"      -> (Dedup.q24DedupExact _),
    "q25_dedup_minhash"    -> (Dedup.q25DedupMinhash _),
    "q26_dedup_simhash"    -> (Dedup.q26DedupSimhash _),
    "q68_ngram_jaccard"    -> (Dedup.q68NgramJaccard _),
    "q69_dedup_clusters"   -> (Dedup.q69DedupClusters _),
    "q113_decontamination" -> (Dedup.q113Decontamination _),
    "q122_dedup_signals"   -> (Dedup.q122DedupSignals _),
    "q125_shortest_paths"  -> (Dedup.q125ShortestPaths _),
    "q141_kept_corpus"     -> (Dedup.q141KeptCorpus _),
    "q150_pagerank"        -> (Dedup.q150PageRank _),
    "q198_dup_gram_profile" -> (Dedup.q198DupGramProfile _),
    "q204_triangles"       -> (Dedup.q204Triangles _),
    "q206_incremental_dedup" -> (Dedup.q206IncrementalDedup _),
    "q209_curation_pipeline" -> (Dedup.q209CurationPipeline _),
    "q210_chain_components" -> (Dedup.q210ChainComponents _),
    "q211_persisted_index_dedup" -> (Dedup.q211PersistedIndexDedup _),
    "q212_triangles_degree" -> (Dedup.q212TrianglesDegree _),
    "q215_cluster_reps"    -> (Dedup.q215ClusterRepresentatives _),
    "q216_contamination_spans" -> (Dedup.q216ContaminationSpans _),
    "q218_boilerplate_spans" -> (Dedup.q218BoilerplateSpans _),
    "q219_span_excision"   -> (Dedup.q219SpanExcision _),
    "q223_threshold_sweep" -> (Dedup.q223ThresholdSweep _),
    "q224_quality_dup_rate" -> (Dedup.q224QualityDupRate _),
    "q226_minhash_calibration" -> (Dedup.q226MinhashCalibration _),
    "q229_cluster_downweight" -> (Dedup.q229ClusterDownweight _),
    "q231_overlap_profile" -> (Dedup.q231OverlapProfile _),
    "q238_index_append"    -> (Dedup.q238IndexAppendMaintenance _),
    "q240_round_report"    -> (Dedup.q240RoundReport _),
    "q241_index_compaction" -> (Dedup.q241IndexCompaction _),
    "q320_changelog_dedup" -> (Dedup.q320ChangelogDedup _),
    "q242_incremental_cc"  -> (Dedup.q242IncrementalCC _),
    "q253_winnowing"       -> (Dedup.q253Winnowing _),
    "q256_prefix_dup"      -> (Dedup.q256PrefixDup _),
    "q270_split_repair"    -> (SplitRepair.q270SplitRepair _),
    "q275_effective_mixture" -> (Dedup.q275EffectiveMixture _),
    "q279_deletion_propagation" -> (Dedup.q279DeletionPropagation _),
    "q289_prefix_jaccard"  -> (Dedup.q289PrefixJaccardJoin _),
    "q290_band_recall"     -> (Dedup.q290BandRecallMeasured _),
    "q297_simhash_recall"  -> (Dedup.q297SimhashRecall _),
    "q311_label_prop"      -> (GraphOps.q311LabelProp _),
  )

  val oracleSql: Map[String, String] = Map(
    "q24_dedup_exact" -> """
      SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
             MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY fp""",
    "q25_dedup_minhash" -> """
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
        WHERE a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
        CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) AS jaccard
      FROM cand
      JOIN sh x ON x.doc_id = doc_a
      JOIN sh y ON y.doc_id = doc_b
      WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8
      ORDER BY doc_a, doc_b""",
    "q68_ngram_jaccard" -> """
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
      ix AS (SELECT doc_id, unnest(shl) AS s FROM sh),
      rare AS (SELECT s FROM ix GROUP BY s HAVING COUNT(*) <= 20),
      pruned AS (SELECT ix.doc_id, ix.s FROM ix JOIN rare USING (s)),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pruned a
        JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
        CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) AS jaccard
      FROM cand
      JOIN sh x ON x.doc_id = doc_a
      JOIN sh y ON y.doc_id = doc_b
      WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.6
      ORDER BY doc_a, doc_b""",

    // same MinHash edge set as q25, then connected components as a
    // recursive transitive closure with min-reachable-id labels
    "q69_dedup_clusters" -> dedupClustersOracle,
    "q113_decontamination" -> """
      WITH docs AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      d8 AS (SELECT doc_id, w FROM docs WHERE len(w) >= 8),
      grams AS (
        SELECT doc_id,
          unnest(list_distinct(list_transform(range(1, len(w) - 6),
            i -> array_to_string(w[i:i+7], ' ')))) AS gram
        FROM d8),
      ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0),
      train AS (SELECT * FROM grams WHERE doc_id % 10 <> 0)
      SELECT doc_id, COUNT(DISTINCT gram) AS n_shared_grams
      FROM train JOIN ev USING (gram)
      GROUP BY doc_id
      ORDER BY doc_id""",
    "q122_dedup_signals" -> """
      SELECT vec_a AS id_a, vec_b AS id_b, 'embedding' AS signal,
        ROUND(cosine, 9) AS score
      FROM (
        WITH bk AS (
          SELECT vec_id, CAST(t.tbl AS INTEGER) AS tbl,
            (CASE WHEN embedding[CAST(t.tbl * 4 + 1 AS INTEGER)] >= 0
                  THEN 1 ELSE 0 END
           + CASE WHEN embedding[CAST(t.tbl * 4 + 2 AS INTEGER)] >= 0
                  THEN 2 ELSE 0 END
           + CASE WHEN embedding[CAST(t.tbl * 4 + 3 AS INTEGER)] >= 0
                  THEN 4 ELSE 0 END
           + CASE WHEN embedding[CAST(t.tbl * 4 + 4 AS INTEGER)] >= 0
                  THEN 8 ELSE 0 END) AS bucket
          FROM embeddings CROSS JOIN
            (SELECT unnest(range(4)) AS tbl) t),
        cand AS (
          SELECT DISTINCT ba.vec_id AS vec_a, bb.vec_id AS vec_b
          FROM bk ba JOIN bk bb
            ON ba.tbl = bb.tbl AND ba.bucket = bb.bucket
            AND ba.vec_id < bb.vec_id)
        SELECT vec_a, vec_b,
          list_reduce(list_transform(range(1, 65),
            i -> CAST(a.embedding[i] AS DOUBLE)
                 * CAST(b.embedding[i] AS DOUBLE)),
            (x, y) -> x + y)
          / sqrt(
            list_reduce(list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(a.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)
            * list_reduce(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE)
                   * CAST(b.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)) AS cosine
        FROM cand
        JOIN embeddings a ON a.vec_id = vec_a
        JOIN embeddings b ON b.vec_id = vec_b) p
      WHERE cosine >= 0.45
      UNION ALL
      SELECT doc_a, doc_b, 'text_ngram', ROUND(jaccard, 9) FROM (
        WITH words AS (
          SELECT doc_id,
            string_split(trim(regexp_replace(lower(text), '\s+', ' ',
              'g')), ' ') AS w
          FROM documents),
        sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(w)),
              i -> w[i] || ' ' || w[i+1])) AS shl
          FROM words WHERE len(w) >= 2),
        ix AS (SELECT doc_id, unnest(shl) AS s FROM sh),
        rare AS (SELECT s FROM ix GROUP BY s HAVING COUNT(*) <= 20),
        pruned AS (SELECT ix.doc_id, ix.s FROM ix JOIN rare USING (s)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM pruned a
          JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
          CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE)
            AS jaccard
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.6) t
      ORDER BY signal, id_a, id_b""",
    "q125_shortest_paths" -> """
      WITH RECURSIVE words AS (
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
        SELECT doc_a, doc_b FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      edges AS (
        SELECT doc_a, doc_b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      src AS (SELECT MIN(doc_a) AS s FROM edges),
      bfs (doc_id, dist) AS (
        SELECT s, 0 FROM src
        UNION
        SELECT e.doc_b, b.dist + 1
        FROM bfs b JOIN edges e ON b.doc_id = e.doc_a
        WHERE b.dist < 20),
      final AS (
        SELECT doc_id, MIN(dist) AS dist FROM bfs GROUP BY doc_id)
      SELECT doc_id, CAST(dist AS INTEGER) AS dist
      FROM final
      ORDER BY doc_id""",
    "q141_kept_corpus" -> """
      WITH RECURSIVE words AS (
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
      edges AS (
        SELECT doc_a, doc_b
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
              UNION SELECT doc_b, doc_a FROM edges),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      labels AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src),
      dropped AS (SELECT id AS doc_id FROM labels WHERE id <> label)
      SELECT d.lang, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 0 ELSE 1 END)
          AS BIGINT) AS n_dropped,
        CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN d.n_chars ELSE 0 END)
          AS BIGINT) AS kept_chars
      FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
      GROUP BY d.lang
      ORDER BY d.lang""",

    // same tokenization as q34's whitespace side; uniform target share
    "q150_pagerank" -> q150PageRankOracle,

    // identical operator grouping and per-term 9-decimal rounding,
    // summed as exact decimals (order-independent)
    "q198_dup_gram_profile" -> """
      WITH docs AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      d8 AS (SELECT doc_id, w FROM docs WHERE len(w) >= 8),
      grams AS (
        SELECT doc_id,
          unnest(list_distinct(list_transform(range(1, len(w) - 6),
            i -> array_to_string(w[i:i+7], ' ')))) AS gram
        FROM d8),
      gdf AS (SELECT gram, COUNT(*) AS n_df FROM grams GROUP BY gram)
      SELECT g.doc_id,
        COUNT(*) AS n_grams,
        CAST(SUM(CASE WHEN gdf.n_df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dup_grams,
        ROUND(CAST(SUM(CASE WHEN gdf.n_df >= 2 THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS dup_ratio
      FROM grams g JOIN gdf USING (gram)
      GROUP BY g.doc_id
      ORDER BY g.doc_id""",

    // the md5 permutation is engine-portable, so the oracle re-derives
    // the full training order and the ranks must agree exactly
    "q204_triangles" -> trianglesOracle,

    // q212 = q204 with the degree-ordered orientation — bit-identical
    // counts by construction, so the same oracle pins both
    "q212_triangles_degree" -> trianglesOracle,

    // the banded path's recall certificate: exact anchor pairs (q30's
    // all-pairs cosine) left-joined with the float-free sign-bucket
    // pairs — the recall column is hash-checked, not just floored
    "q206_incremental_dedup" -> incrementalDedupOracle,

    // q211 computes the SAME pair set as q206 — the only change is
    // where the old side's bands come from (the persisted bucketed
    // index table instead of a recompute), which must be invisible in
    // the result; one oracle pins both
    "q211_persisted_index_dedup" -> incrementalDedupOracle,

    // q320 computes the SAME pair set again, but its input planning
    // is the manifest diff of the versioned corpus (fresh segments
    // only) and its old side reads yesterday's persisted artifacts —
    // composition with the table-format tier must be invisible in
    // the result; the full-recompute oracle pins it
    "q320_changelog_dedup" -> incrementalDedupOracle,

    // q238 probes the base-plus-appended index with the %10==8 batch;
    // the oracle is the FROM-SCRATCH rebuild semantics (banded
    // candidates of that batch against everything else) — append
    // maintenance must be invisible in the result
    "q238_index_append" -> incrementalDedupOracleFor(8),

    // ground truth re-derived from the raw columns — the oracle never
    // parses the dirty URL, so it checks the canonicalizer itself
    "q209_curation_pipeline" -> curationPipelineOracle,

    // same chain edges (lead over doc_id per lang), then components as
    // the q69 recursive transitive closure — verifies the star
    // contraction against per-hop reachability on a high-diameter graph
    "q210_chain_components" -> """
      WITH RECURSIVE chain AS (
        SELECT doc_id, lang,
          lead(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS nxt
        FROM documents),
      edges AS (
        SELECT doc_id AS a, nxt AS b FROM chain WHERE nxt IS NOT NULL),
      sym AS (SELECT a AS src, b AS dst FROM edges
              UNION SELECT b, a FROM edges),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      labels AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src)
      SELECT label AS cluster, COUNT(*) AS n_docs, MAX(id) AS max_doc
      FROM labels
      GROUP BY label
      ORDER BY cluster""",

    // hint-free semantics: hints must never change results
    "q215_cluster_reps" -> """
      WITH RECURSIVE words AS (
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
      edges AS (
        SELECT doc_a, doc_b
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
              UNION SELECT doc_b, doc_a FROM edges),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      labels AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src),
      toks AS (
        SELECT doc_id, CAST(len(w) AS INTEGER) AS n_tokens FROM words),
      m AS (
        SELECT l.id, l.label, t.n_tokens,
          ROW_NUMBER() OVER (PARTITION BY l.label
            ORDER BY t.n_tokens DESC, l.id ASC) AS rk
        FROM labels l JOIN toks t ON t.doc_id = l.id)
      SELECT label AS cluster, COUNT(*) AS n_members,
        MAX(CASE WHEN rk = 1 THEN id END) AS rep_doc,
        MAX(CASE WHEN rk = 1 THEN n_tokens END) AS rep_tokens,
        CAST(SUM(CASE WHEN rk > 1 THEN n_tokens ELSE 0 END) AS BIGINT)
          AS dropped_tokens
      FROM m GROUP BY label ORDER BY cluster""",

    // q113's gram CTEs kept positional, then gaps-and-islands to merge
    // contiguous contaminated offsets into redaction spans
    "q216_contamination_spans" -> """
      WITH docs AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      d8 AS (SELECT doc_id, w FROM docs WHERE len(w) >= 8),
      pos0 AS (
        SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM d8),
      grams AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
          array_to_string(w[i:i+7], ' ') AS gram
        FROM pos0),
      ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0),
      hits AS (
        SELECT doc_id, pos FROM grams JOIN ev USING (gram)
        WHERE doc_id % 10 <> 0),
      isl AS (
        SELECT doc_id, pos,
          pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
            AS island
        FROM hits)
      SELECT doc_id, MIN(pos) AS span_start,
        CAST(MAX(pos) + 7 AS INTEGER) AS span_end,
        COUNT(*) AS n_grams
      FROM isl GROUP BY doc_id, island
      ORDER BY doc_id, span_start""",

    // the streaming admission gate is q206's new×old half with the
    // stream side always on the left: arriving (%10=7) docs probed
    // against the standing-corpus band index, exact-Jaccard verified
    "q218_boilerplate_spans" -> """
      WITH docs AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      d8 AS (SELECT doc_id, w FROM docs WHERE len(w) >= 8),
      pos0 AS (
        SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM d8),
      grams AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
          array_to_string(w[i:i+7], ' ') AS gram
        FROM pos0),
      df AS (
        SELECT gram, COUNT(DISTINCT doc_id) AS df
        FROM grams GROUP BY gram),
      hits AS (
        SELECT g.doc_id, g.pos FROM grams g
        JOIN df USING (gram) WHERE df.df > 1),
      isl AS (
        SELECT doc_id, pos,
          pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
            AS island
        FROM hits)
      SELECT doc_id, MIN(pos) AS span_start,
        CAST(MAX(pos) + 7 AS INTEGER) AS span_end,
        COUNT(*) AS n_grams
      FROM isl GROUP BY doc_id, island
      ORDER BY doc_id, span_start""",

    // q218's span CTEs + token-level NOT EXISTS + ordered reassembly:
    // the md5 pins the redacted TEXT, not just the drop counts
    "q219_span_excision" -> """
      WITH docs AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents),
      toks AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, w[i] AS tok
        FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i
              FROM docs) t),
      d8 AS (SELECT doc_id, w FROM docs WHERE len(w) >= 8),
      pos0 AS (
        SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM d8),
      grams AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
          array_to_string(w[i:i+7], ' ') AS gram
        FROM pos0),
      df AS (
        SELECT gram, COUNT(DISTINCT doc_id) AS df
        FROM grams GROUP BY gram),
      hits AS (
        SELECT g.doc_id, g.pos FROM grams g
        JOIN df USING (gram) WHERE df.df > 1),
      isl AS (
        SELECT doc_id, pos,
          pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
            AS island
        FROM hits),
      spans AS (
        SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end
        FROM isl GROUP BY doc_id, island),
      kept AS (
        SELECT t.doc_id, t.pos, t.tok FROM toks t
        WHERE NOT EXISTS (
          SELECT 1 FROM spans s WHERE s.doc_id = t.doc_id
            AND t.pos BETWEEN s.span_start AND s.span_end)),
      ka AS (
        SELECT doc_id, COUNT(*) AS n_kept,
          md5(string_agg(tok, ' ' ORDER BY pos)) AS redacted_md5
        FROM kept GROUP BY doc_id)
      SELECT d.doc_id, CAST(len(d.w) AS INTEGER) AS n_tokens,
        CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS n_kept,
        coalesce(ka.redacted_md5, md5('')) AS redacted_md5
      FROM docs d LEFT JOIN ka USING (doc_id)
      ORDER BY d.doc_id""",

    // symmetric smoothed KL between the two halves; per-token terms
    // round to 9 decimals and sum as exact decimals (q191's recipe)
    "q223_threshold_sweep" -> """
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
      scored AS (
        SELECT doc_a, doc_b,
          CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE)
            AS jaccard
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b)
      SELECT CAST(thr AS DOUBLE) AS threshold,
        CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS n_docs_flagged
      FROM scored
      CROSS JOIN (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS thr) t
      WHERE jaccard >= thr
      GROUP BY thr
      ORDER BY threshold""",

    // q25's verified pair set feeding the q33 quality buckets: docs in
    // any kept pair vs the full corpus, per bucket
    "q224_quality_dup_rate" -> """
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
        SELECT doc_a, doc_b FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8),
      dup AS (
        SELECT DISTINCT doc_id FROM (
          SELECT doc_a AS doc_id FROM pairs
          UNION ALL SELECT doc_b FROM pairs) u),
      q AS (
        SELECT doc_id,
          CASE WHEN len(w) >= 50
                    AND CAST(len(list_filter(w, t ->
                      list_contains(['the','a'], t))) AS DOUBLE)
                      / CAST(len(w) AS DOUBLE) <= 0.2 THEN 'high'
               WHEN len(w) >= 20 THEN 'medium'
               ELSE 'low' END AS quality
        FROM words)
      SELECT quality, n_docs, n_dup_docs,
        CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
      FROM (
        SELECT quality, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_docs
        FROM q LEFT JOIN dup USING (doc_id)
        GROUP BY quality) agg
      ORDER BY quality""",

    // the oracle's global-order window IS the single-task formulation
    // the Spark side decomposes into blocks — identical prefix sums
    "q226_minhash_calibration" -> """
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
      m AS (
        SELECT doc_a, doc_b,
          CAST(COUNT(CASE WHEN a.mh = b.mh THEN 1 END) AS INTEGER)
            AS n_sig_matches
        FROM cand
        JOIN minh a ON a.doc_id = doc_a
        JOIN minh b ON b.doc_id = doc_b AND b.seed = a.seed
        GROUP BY doc_a, doc_b),
      s AS (
        SELECT m.n_sig_matches,
          CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE)
            AS jaccard
        FROM m
        JOIN sh x ON x.doc_id = m.doc_a
        JOIN sh y ON y.doc_id = m.doc_b)
      SELECT n_sig_matches,
        CAST(n_sig_matches AS DOUBLE) / 16.0 AS est_jaccard,
        CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(SUM(CAST(ROUND(jaccard * 1000000.0) AS BIGINT)) AS DOUBLE)
          / (1000000.0 * CAST(COUNT(*) AS DOUBLE)) AS avg_exact_jaccard
      FROM s
      GROUP BY n_sig_matches
      ORDER BY n_sig_matches""",

    // q180's injected corpus verbatim; the checksum pins every
    // redacted byte (48-bit md5 prefix summed order-free)
    "q229_cluster_downweight" -> clusterDownweightOracle,

    // the composed round report re-states the three section oracles
    // verbatim as subqueries — the composition must change nothing
    "q240_round_report" -> roundReportOracle,

    // q241 probes the COMPACTED index; compaction must be invisible in
    // the result, so the from-scratch rebuild oracle pins it (= q238)
    "q241_index_compaction" -> incrementalDedupOracleFor(8),

    // q242's incremental label update must equal the full-corpus
    // recompute — q69's cluster-summary oracle, same SQL text
    "q242_incremental_cc" -> dedupClustersOracle,

    // three generated BPE rounds (template below, like q150's) — the
    // oracle replays count → argmax (same tie-break) → replace
    "q231_overlap_profile" -> """
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
      rare AS (SELECT s FROM shingles GROUP BY s HAVING count(*) <= 20),
      pruned AS (SELECT doc_id, s FROM shingles JOIN rare USING (s)),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pruned a JOIN pruned b
          ON a.s = b.s AND a.doc_id < b.doc_id),
      scored AS (
        SELECT doc_a, doc_b,
          CAST(len(list_intersect(x.shl, y.shl)) AS BIGINT) AS inter,
          CAST(len(x.shl) AS BIGINT) AS n_a,
          CAST(len(y.shl) AS BIGINT) AS n_b
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b),
      prof AS (
        SELECT doc_a, doc_b,
          CAST(inter AS DOUBLE) / CAST(n_a AS DOUBLE) AS cont_a,
          CAST(inter AS DOUBLE) / CAST(n_b AS DOUBLE) AS cont_b,
          CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE)
            AS jaccard
        FROM scored)
      SELECT doc_a, doc_b, cont_a, cont_b, jaccard,
        CASE WHEN jaccard >= 0.8 THEN 'mutual_dup'
             WHEN cont_a >= 0.9 THEN 'a_in_b'
             WHEN cont_b >= 0.9 THEN 'b_in_a'
             ELSE 'partial_overlap' END AS relation
      FROM prof
      WHERE jaccard >= 0.1 OR greatest(cont_a, cont_b) >= 0.9
      ORDER BY doc_a, doc_b""",

    // hashed linear classifier: md5-derived bucket + weight are both
    // engine-portable (hex prefix -> int), so the score is exact
    "q253_winnowing" -> """
      WITH tok AS (
        SELECT doc_id, string_split(trim(regexp_replace(lower(text),
          '\s+', ' ', 'g')), ' ') AS w
        FROM documents),
      grams AS (
        SELECT doc_id, CAST(i AS INT) AS pos,
          CAST(concat('0x', substr(md5(concat(w[CAST(i AS INT)], ' ',
            w[CAST(i AS INT)+1], ' ', w[CAST(i AS INT)+2], ' ',
            w[CAST(i AS INT)+3])), 1, 8)) AS BIGINT) AS h
        FROM tok, unnest(range(1, len(w) - 2)) AS t(i)
        WHERE len(w) >= 4),
      wins AS (
        SELECT doc_id, pos,
          MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp,
          COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
        FROM grams),
      full_w AS (SELECT * FROM wins WHERE pos <= n_grams - 4)
      SELECT doc_id, MAX(n_grams) AS n_grams, count(*) AS n_windows,
        CAST(count(DISTINCT fp) AS BIGINT) AS n_fp,
        ROUND(CAST(count(DISTINCT fp) AS DOUBLE) / MAX(n_grams), 9)
          AS density
      FROM full_w GROUP BY doc_id ORDER BY doc_id""",

    // leave-one-out 1-NN over unit-normalized vectors; cosine rounds
    // to 9 before the argmax, tie-break lowest candidate id
    "q256_prefix_dup" -> """
      WITH tok AS (
        SELECT doc_id, string_split(trim(regexp_replace(lower(text),
          '\s+', ' ', 'g')), ' ') AS w
        FROM documents),
      pfx AS (
        SELECT doc_id, array_to_string(w[1:8], ' ') AS prefix
        FROM tok WHERE len(w) >= 8),
      agg AS (
        SELECT prefix, count(*) AS n_docs,
          MIN(doc_id) AS first_doc
        FROM pfx GROUP BY prefix HAVING count(*) >= 2)
      SELECT prefix, n_docs, first_doc FROM agg
      ORDER BY n_docs DESC, prefix LIMIT 20""",

    // same probe-candidate stream as q254; μ sums 9-rounded cosines
    // as exact decimals before the single threshold compare
    "q270_split_repair" -> splitRepairOracle,

    // one-pass window skyline: identical dominance predicate to the
    // two-level Spark plan (they are provably the same set)
    "q279_deletion_propagation" -> deletionPropagationOracle,
    "q289_prefix_jaccard" -> """
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
      j AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          ROUND(CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE)
            / CAST(len(list_distinct(a.shl || b.shl)) AS DOUBLE), 9)
            AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, jaccard FROM j
      WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""",
    "q290_band_recall" -> bandRecallOracle,

    // PMI marginals counted over the bigram event space on BOTH sides
    // (left-position / right-position counts), min-support 5
    "q275_effective_mixture" -> effectiveMixtureOracle,

    // all-pairs match relation (= q230's blocked join), adjacent-key
    // non-match sample, add-one smoothing, log2 on the rounded probs
    "q297_simhash_recall" -> simhashRecallOracle,

    // three unrolled propagation rounds over q68's exact-Jaccard
    // edges, integer evidence weights, argmax with label-asc tie-break
    "q311_label_prop" -> labelPropOracle,
  )
}
