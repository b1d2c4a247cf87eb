package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.streaming._
import graft.registry.OracleDefs._

/** Similarity family: catalog entries + DuckDB oracle SQL
  * (mechanical split of SparkEntry; content verbatim). */
object SimilarityRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_cosine_topk"      -> (Similarity.q27CosineTopK _),
    "q28_topk_udaf"        -> (Similarity.q28TopKUdaf _),
    "q29_ann_lsh"          -> (Similarity.q29AnnLsh _),
    "q30_embed_neardup"    -> (Similarity.q30EmbedNearDup _),
    "q53_ann_ivf"          -> (Similarity.q53AnnIvf _),
    "q87_vector_norm"      -> (Similarity.q87VectorNorm _),
    "q98_ann_pq"           -> (Similarity.q98AnnPq _),
    "q120_stream_scoring"  -> (Similarity.q120StreamScoring _),
    "q144_embed_quantize"  -> (Similarity.q144EmbedQuantize _),
    "q159_label_stats"     -> (Similarity.q159LabelStats _),
    "q181_embed_centroid"  -> (Similarity.q181EmbedCentroid _),
    "q205_embed_clusters"  -> (Similarity.q205EmbedClusters _),
    "q213_banded_recall"   -> (Similarity.q213BandedRecall _),
    "q248_kmeans_assign"   -> (Similarity.q248KmeansAssign _),
    "q249_semdedup"        -> (Similarity.q249SemDedup _),
    "q254_label_knn"       -> (Similarity.q254LabelKnn _),
    "q255_ood_report"      -> (Similarity.q255OodReport _),
    "q257_hard_negatives"  -> (Similarity.q257HardNegatives _),
    "q259_embed_report"    -> (Similarity.q259EmbedReport _),
    "q260_stream_router"   -> (Similarity.q260StreamClusterRouter _),
    "q274_dim_ablation"    -> (Similarity.q274DimAblation _),
    "q280_rank_fusion"     -> (Similarity.q280RankFusion _),
    "q281_ndcg_ablation"   -> (Similarity.q281NdcgAblation _),
    "q294_ivf_persisted"   -> (VectorIndex.q294IvfPersistedProbe _),
    "q295_ivf_append"      -> (VectorIndex.q295IvfAppendProbe _),
    "q296_pq_persisted"    -> (VectorIndex.q296PqPersistedProbe _),
    "q298_ivf_drift"       -> (VectorIndex.q298IvfDriftMonitor _),
    "q300_pq_reconstruction" -> (VectorIndex.q300PqReconstruction _),
    "q301_ivf_compaction"  -> (VectorIndex.q301IvfCompaction _),
    "q302_ivf_drift_rebuild" -> (VectorIndex.q302IvfDriftRebuild _),
    "q303_ivf_nprobe_curve" -> (VectorIndex.q303IvfNprobeCurve _),
    "q305_ivf_deletion"    -> (VectorIndex.q305IvfDeletion _),
    "q306_gate_recall"     -> (VectorIndex.q306GateRecall _),
    "q327_changelog_ivf"   -> (VectorIndex.q327ChangelogIvfMaintenance _),
  )

  val oracleSql: Map[String, String] = Map(
    "q27_cosine_topk" -> """
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q_id, e.vec_id,
          list_reduce(list_transform(range(1, 65),
            i -> CAST(q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
            (x, y) -> x + y)
          / sqrt(
            list_reduce(list_transform(range(1, 65),
              i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE)),
              (x, y) -> x + y)
            * list_reduce(list_transform(range(1, 65),
              i -> CAST(e.embedding[i] AS DOUBLE)
                   * CAST(e.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.q_id)
      SELECT q_id, rank, vec_id, cosine FROM (
        SELECT q_id, vec_id, cosine,
          CAST(ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
        FROM scored) t
      WHERE rank <= 10
      ORDER BY q_id, rank""",

    // identical semantics to q27 via the typed-Aggregator path
    "q28_topk_udaf" -> """
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q_id, e.vec_id,
          list_reduce(list_transform(range(1, 65),
            i -> CAST(q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
            (x, y) -> x + y)
          / sqrt(
            list_reduce(list_transform(range(1, 65),
              i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE)),
              (x, y) -> x + y)
            * list_reduce(list_transform(range(1, 65),
              i -> CAST(e.embedding[i] AS DOUBLE)
                   * CAST(e.embedding[i] AS DOUBLE)),
              (x, y) -> x + y)) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.q_id)
      SELECT q_id, rank, vec_id, cosine FROM (
        SELECT q_id, vec_id, cosine,
          CAST(ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
        FROM scored) t
      WHERE rank <= 10
      ORDER BY q_id, rank""",
    "q30_embed_neardup" -> """
      SELECT vec_a, vec_b, cosine FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
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
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) p
      WHERE cosine >= 0.45
      ORDER BY vec_a, vec_b""",
    "q87_vector_norm" -> """
      SELECT vec_id,
        CAST(len(embedding) AS INTEGER) AS dim,
        sqrt(list_reduce(list_transform(range(1, 65),
          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
          (x, y) -> x + y)) AS l2_norm,
        list_max(list_transform(embedding,
          x -> abs(CAST(x AS DOUBLE)))) AS max_abs,
        CAST(embedding[1] AS DOUBLE)
          / sqrt(list_reduce(list_transform(range(1, 65),
            i -> CAST(embedding[i] AS DOUBLE)
                 * CAST(embedding[i] AS DOUBLE)),
            (x, y) -> x + y)) AS unit_first
      FROM embeddings
      ORDER BY vec_id""",
    "q120_stream_scoring" -> """
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 5)
      SELECT q_id, e.vec_id,
        list_reduce(list_transform(range(1, 65),
          i -> CAST(q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
          (x, y) -> x + y)
        / sqrt(
          list_reduce(list_transform(range(1, 65),
            i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE)),
            (x, y) -> x + y)
          * list_reduce(list_transform(range(1, 65),
            i -> CAST(e.embedding[i] AS DOUBLE)
                 * CAST(e.embedding[i] AS DOUBLE)),
            (x, y) -> x + y)) AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.q_id
        AND list_reduce(list_transform(range(1, 65),
          i -> CAST(q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
          (x, y) -> x + y)
        / sqrt(
          list_reduce(list_transform(range(1, 65),
            i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE)),
            (x, y) -> x + y)
          * list_reduce(list_transform(range(1, 65),
            i -> CAST(e.embedding[i] AS DOUBLE)
                 * CAST(e.embedding[i] AS DOUBLE)),
            (x, y) -> x + y)) >= 0.3
      ORDER BY q_id, vec_id""",
    "q144_embed_quantize" -> """
      WITH xs AS (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
        FROM embeddings),
      s AS (
        SELECT vec_id, xs,
          list_aggregate(list_transform(xs, x -> abs(x)), 'max') / 127.0
            AS scale
        FROM xs)
      SELECT vec_id,
        CAST(len(xs) AS INTEGER) AS dim,
        ROUND(scale, 9) AS scale,
        CAST(list_aggregate(list_transform(xs,
          x -> CAST(floor(x / scale + 0.5) AS BIGINT)), 'sum')
          AS BIGINT) AS q_sum,
        ROUND(list_aggregate(list_transform(xs,
          x -> abs(x - CAST(CAST(floor(x / scale + 0.5) AS BIGINT)
            AS DOUBLE) * scale)), 'max'), 9) AS max_abs_err
      FROM s
      ORDER BY vec_id""",

    // per-term log-probs rounded to 9 decimals then summed as exact
    // decimals — order-independent despite floating-point ln
    "q159_label_stats" -> """
      WITH n AS (
        SELECT label,
          CAST(ROUND(sqrt(list_reduce(list_transform(range(1, 65),
            i -> CAST(embedding[i] AS DOUBLE)
                 * CAST(embedding[i] AS DOUBLE)),
            (x, y) -> x + y)), 9) AS DECIMAL(18,9)) AS nrm
        FROM embeddings)
      SELECT label, COUNT(*) AS n_vecs,
        ROUND(CAST(SUM(nrm) AS DOUBLE) / COUNT(*), 9) AS avg_norm,
        CAST(MIN(nrm) AS DOUBLE) AS min_norm,
        CAST(MAX(nrm) AS DOUBLE) AS max_norm
      FROM n
      GROUP BY label
      ORDER BY label""",

    // same exact power sums, same double conversion order
    "q181_embed_centroid" -> """
      WITH pos AS (
        SELECT label, CAST(s.pos AS INT) AS pos, s.x AS x FROM (
          SELECT label, unnest(list_transform(range(1, 65), i ->
            {'pos': i,
             'x': CAST(embedding[CAST(i AS INT)] AS DOUBLE)})) AS s
          FROM embeddings)),
      cent AS (
        SELECT label, list(m ORDER BY pos) AS c
        FROM (SELECT label, pos, ROUND(AVG(x), 9) AS m
              FROM pos GROUP BY label, pos)
        GROUP BY label),
      scored AS (
        SELECT e.vec_id, e.label,
          list_reduce(list_transform(list_zip(e.embedding, c.c), s ->
            CAST(s[1] AS DOUBLE) * s[2]), (a, b) -> a + b) AS dotp,
          sqrt(list_reduce(list_transform(e.embedding, x ->
            CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
            AS nv,
          sqrt(list_reduce(list_transform(c.c, y -> y * y),
            (a, b) -> a + b)) AS nc
        FROM embeddings e JOIN cent c USING (label)),
      ranked AS (
        SELECT label, vec_id, ROUND(dotp / (nv * nc), 9) AS cos_centroid,
          row_number() OVER (PARTITION BY label
            ORDER BY dotp / (nv * nc), vec_id) AS rn
        FROM scored)
      SELECT label, vec_id, cos_centroid, CAST(rn AS INT) AS rn
      FROM ranked WHERE rn <= 3
      ORDER BY label, rn""",

    // the CTE expanded twice — reuse must not change the numbers
    "q213_banded_recall" -> """
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
          AND ba.vec_id < bb.vec_id),
      banded AS (
        SELECT vec_a, vec_b FROM (
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
        WHERE cosine >= 0.45),
      anchor AS (
        SELECT vec_a, vec_b, cosine FROM (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
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
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) p
        WHERE cosine >= 0.45)
      SELECT floor(an.cosine * 20) / 20 AS cos_bucket,
        COUNT(*) AS n_anchor_pairs,
        CAST(SUM(CASE WHEN h.vec_a IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_banded_pairs,
        ROUND(CAST(SUM(CASE WHEN h.vec_a IS NOT NULL THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(*), 9) AS recall
      FROM anchor an LEFT JOIN banded h
        ON an.vec_a = h.vec_a AND an.vec_b = h.vec_b
      GROUP BY floor(an.cosine * 20) / 20
      ORDER BY cos_bucket""",

    // min-label components over the sign-LSH embedding pairs (the
    // q122 bucket CTEs + q69's recursive reach)
    "q205_embed_clusters" -> """
      WITH RECURSIVE bk AS (
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
          AND ba.vec_id < bb.vec_id),
      pairs AS (
        SELECT vec_a, vec_b FROM (
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
        WHERE cosine >= 0.45),
      sym AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
              UNION SELECT vec_b, vec_a FROM pairs),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      labels AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src)
      SELECT label AS cluster, COUNT(*) AS n_vecs, MAX(id) AS max_vec
      FROM labels
      GROUP BY label
      ORDER BY cluster""",

    // new-batch bands joined against the full band index; only pairs
    // touching the new batch (doc_id % 10 = 7) are emitted
    "q248_kmeans_assign" -> s"""
      $kmeansCtes
      SELECT CAST(cid AS INT) AS cid, count(*) AS n,
        CAST(SUM(CAST(dist AS DECIMAL(28,9))) AS DOUBLE) AS sse
      FROM a2 GROUP BY cid ORDER BY cid""",
    "q249_semdedup" -> s"""
      $kmeansCtes,
      nrm AS (
        SELECT cid, vec_id,
          list_transform(v, x -> x / sqrt(list_reduce(
            list_transform(v, y -> y*y), (p,q) -> p + q))) AS vn
        FROM a2),
      pairs AS (
        SELECT a.cid, a.vec_id AS a_id, b.vec_id AS b_id,
          ROUND(list_reduce(list_transform(list_zip(a.vn, b.vn),
              p -> p[1]*p[2]), (x,y) -> x + y), 9) AS cos
        FROM nrm a JOIN nrm b ON a.cid = b.cid AND a.vec_id < b.vec_id),
      dropped AS (
        SELECT cid, count(*) AS n_dropped FROM
          (SELECT DISTINCT cid, b_id FROM pairs WHERE cos >= 0.35)
        GROUP BY cid)
      SELECT CAST(a.cid AS INT) AS cid, count(*) AS n,
        COALESCE(d.n_dropped, 0) AS n_dropped,
        count(*) - COALESCE(d.n_dropped, 0) AS n_kept
      FROM a2 a LEFT JOIN dropped d ON a.cid = d.cid
      GROUP BY a.cid, d.n_dropped ORDER BY cid""",

    // reliability diagram + ECE over the q232 score; fixed-width bins
    // on the min-max-normalized score (no corpus-wide ntile), bin
    // means as exact DECIMAL sums of 9-rounded p
    "q254_label_knn" -> """
      WITH e AS (
        SELECT vec_id, label,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      n AS (
        SELECT vec_id, label,
          list_transform(v, x -> x / sqrt(list_reduce(
            list_transform(v, y -> y*y), (p,q) -> p + q))) AS vn
        FROM e),
      pr AS (SELECT vec_id AS p_id, label AS p_label, vn AS pv
             FROM n WHERE vec_id < 128),
      cand AS (
        SELECT p.p_id, p.p_label, c.label AS n_label, c.vec_id,
          ROUND(list_reduce(list_transform(list_zip(c.vn, p.pv),
            s -> s[1]*s[2]), (x,y) -> x + y), 9) AS cos
        FROM pr p JOIN n c ON c.vec_id <> p.p_id),
      best AS (
        SELECT p_id, p_label, n_label, cos FROM
          (SELECT *, row_number() OVER (PARTITION BY p_id
             ORDER BY cos DESC, vec_id ASC) AS rn FROM cand)
        WHERE rn = 1)
      SELECT p_label AS label, count(*) AS n_probes,
        CAST(SUM(CASE WHEN n_label = p_label THEN 1 ELSE 0 END)
          AS BIGINT) AS n_correct,
        ROUND(CAST(SUM(CASE WHEN n_label = p_label THEN 1 ELSE 0 END)
            AS DOUBLE) / count(*), 9) AS accuracy,
        ROUND(CAST(SUM(CAST(cos AS DECIMAL(28,9))) AS DOUBLE)
          / count(*), 9) AS mean_nn_cos
      FROM best GROUP BY p_label ORDER BY label""",

    // per-cluster distance percentiles + robust outlier count over the
    // shared Lloyd chain; exact interpolated percentiles (q174 parity)
    "q255_ood_report" -> s"""
      $kmeansCtes,
      pct AS (
        SELECT cid, count(*) AS n,
          ROUND(quantile_cont(dist, 0.5), 9) AS p50,
          ROUND(quantile_cont(dist, 0.9), 9) AS p90,
          ROUND(quantile_cont(dist, 0.99), 9) AS p99
        FROM a2 GROUP BY cid)
      SELECT CAST(a.cid AS INT) AS cid, MAX(p.n) AS n, MAX(p.p50) AS p50,
        MAX(p.p90) AS p90, MAX(p.p99) AS p99,
        CAST(SUM(CASE WHEN a.dist > p.p50 * 2.0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_outliers
      FROM a2 a JOIN pct p ON a.cid = p.cid
      GROUP BY a.cid ORDER BY cid""",
    "q257_hard_negatives" -> """
      WITH e AS (
        SELECT vec_id, label,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      n AS (
        SELECT vec_id, label,
          list_transform(v, x -> x / sqrt(list_reduce(
            list_transform(v, y -> y*y), (p,q) -> p + q))) AS vn
        FROM e),
      pr AS (SELECT vec_id AS p_id, label AS p_label, vn AS pv
             FROM n WHERE vec_id < 128),
      cand AS (
        SELECT p.p_id, p.p_label, c.label AS c_label,
          ROUND(list_reduce(list_transform(list_zip(c.vn, p.pv),
            s -> s[1]*s[2]), (x,y) -> x + y), 9) AS cos
        FROM pr p JOIN n c ON c.vec_id <> p.p_id),
      mu AS (
        SELECT p_id, p_label,
          ROUND(CAST(SUM(CASE WHEN c_label = p_label
                THEN CAST(cos AS DECIMAL(28,9)) ELSE 0 END) AS DOUBLE)
            / SUM(CASE WHEN c_label = p_label THEN 1 ELSE 0 END), 9)
            AS mu
        FROM cand GROUP BY p_id, p_label),
      hard AS (
        SELECT c.p_id, c.p_label,
          CAST(SUM(CASE WHEN c.c_label <> c.p_label AND c.cos > m.mu
            THEN 1 ELSE 0 END) AS BIGINT) AS n_hard
        FROM cand c JOIN mu m ON c.p_id = m.p_id
        GROUP BY c.p_id, c.p_label)
      SELECT p_label AS label, count(*) AS n_probes,
        CAST(SUM(n_hard) AS BIGINT) AS n_hard_total,
        ROUND(CAST(SUM(n_hard) AS DOUBLE) / count(*), 9)
          AS mean_hard_per_probe
      FROM hard GROUP BY p_label ORDER BY label""",
    "q259_embed_report" -> s"""
      $kmeansCtes,
      nrm AS (
        SELECT cid, vec_id,
          list_transform(v, x -> x / sqrt(list_reduce(
            list_transform(v, y -> y*y), (p,q) -> p + q))) AS vn
        FROM a2),
      pairs AS (
        SELECT a.cid, a.vec_id AS a_id, b.vec_id AS b_id,
          ROUND(list_reduce(list_transform(list_zip(a.vn, b.vn),
              p -> p[1]*p[2]), (x,y) -> x + y), 9) AS cos
        FROM nrm a JOIN nrm b ON a.cid = b.cid AND a.vec_id < b.vec_id),
      dropped AS (
        SELECT cid, count(*) AS n_dropped FROM
          (SELECT DISTINCT cid, b_id FROM pairs WHERE cos >= 0.35)
        GROUP BY cid),
      sem AS (
        SELECT a.cid, count(*) AS n, COALESCE(d.n_dropped, 0) AS nd
        FROM a2 a LEFT JOIN dropped d ON a.cid = d.cid
        GROUP BY a.cid, d.n_dropped),
      pct AS (
        SELECT cid, count(*) AS n,
          ROUND(quantile_cont(dist, 0.5), 9) AS p50,
          ROUND(quantile_cont(dist, 0.99), 9) AS p99
        FROM a2 GROUP BY cid),
      ood AS (
        SELECT a.cid, MAX(p.n) AS n, MAX(p.p99) AS p99,
          CAST(SUM(CASE WHEN a.dist > p.p50 * 2.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_out
        FROM a2 a JOIN pct p ON a.cid = p.cid
        GROUP BY a.cid)
      SELECT 'kmeans' AS section, CAST(cid AS BIGINT) AS seq,
        count(*) AS n_a, CAST(NULL AS BIGINT) AS n_b,
        CAST(NULL AS BIGINT) AS n_c,
        ROUND(CAST(SUM(CAST(dist AS DECIMAL(28,9))) AS DOUBLE), 9)
          AS metric
      FROM a2 GROUP BY cid
      UNION ALL
      SELECT 'semdedup', CAST(cid AS BIGINT), n, nd, n - nd,
        ROUND(CAST(nd AS DOUBLE) / n, 9)
      FROM sem
      UNION ALL
      SELECT 'ood', CAST(cid AS BIGINT), n, n_out,
        CAST(NULL AS BIGINT), p99
      FROM ood
      ORDER BY section, seq""",

    // stream-batch equivalence: the online router's drained counts
    // must equal the batch Lloyd chain + q255 outlier rule
    "q260_stream_router" -> s"""
      $kmeansCtes,
      pct AS (
        SELECT cid, ROUND(quantile_cont(dist, 0.5), 9) AS p50
        FROM a2 GROUP BY cid)
      SELECT CAST(a.cid AS INT) AS cid, count(*) AS n_assigned,
        CAST(SUM(CASE WHEN a.dist > p.p50 * 2.0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_flagged
      FROM a2 a JOIN pct p ON a.cid = p.cid
      GROUP BY a.cid ORDER BY cid""",

    // Heaps growth over trigram types: min-chunk per type gives the
    // whole cumulative curve in one shuffle; β from exact decimal
    // sums of 9-rounded log points
    "q280_rank_fusion" -> rankFusionOracle,
    "q281_ndcg_ablation" -> ndcgAblationOracle,

    // q268's score CTEs + the grouped-jackknife arithmetic, every
    // intermediate rounded to 9 before its decimal sum
    "q274_dim_ablation" -> dimAblationOracle,
    "q294_ivf_persisted" -> ivfProbeOracle(""),
    "q295_ivf_append" -> ivfProbeOracle("WHERE vec_id % 10 <> 7"),
    "q296_pq_persisted" -> pqPersistedOracle,
    "q298_ivf_drift" -> ivfDriftOracle,
    "q300_pq_reconstruction" -> pqReconstructionOracle,
    // compaction must be invisible to the probe: same
    // rebuild-under-the-frozen-model oracle as q295
    "q301_ivf_compaction" -> ivfProbeOracle("WHERE vec_id % 10 <> 7"),
    "q302_ivf_drift_rebuild" -> ivfRebuildOracle,
    "q303_ivf_nprobe_curve" -> ivfNprobeCurveOracle,
    "q305_ivf_deletion" -> ivfDeletionOracle,
    "q306_gate_recall" -> gateRecallOracle,
    // the composition must be invisible in the answer: q327 plans its
    // input from the corpus manifest diff but computes exactly q302's
    // maintenance cycle, so it shares q302's from-scratch oracle
    "q327_changelog_ivf" -> ivfRebuildOracle,
  )
}
