package graft.registry

/** Shared DuckDB-oracle CTE chains and whole-oracle builders used by
  * more than one registry entry (or too large to inline). Moved
  * verbatim from the pre-split SparkEntry.scala — the string content
  * is the driver contract and MUST NOT change in a mechanical split. */
object OracleDefs {

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Shared oracle for q206 AND q211: both emit the incremental
    * near-dup pair set (new batch × full corpus). q211 only changes
    * where the old side's bands come FROM — the persisted bucketed
    * index — which must be invisible in the result, so one oracle
    * text pins both. */
  private[registry] def incrementalDedupOracleFor(newMod: Int): String = s"""
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
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
        SELECT DISTINCT LEAST(n.doc_id, o.doc_id) AS doc_a,
               GREATEST(n.doc_id, o.doc_id) AS doc_b
        FROM bands n
        JOIN bands o ON n.band = o.band AND n.band_key = o.band_key
          AND n.doc_id <> o.doc_id
        WHERE n.doc_id % 10 = $newMod)
      SELECT doc_a, doc_b,
        ROUND(CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE), 9)
          AS jaccard,
        CASE WHEN doc_a % 10 = $newMod AND doc_b % 10 = $newMod
             THEN 'new_new'
             ELSE 'new_old' END AS pair_type
      FROM cand
      JOIN sh x ON x.doc_id = doc_a
      JOIN sh y ON y.doc_id = doc_b
      WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8
      ORDER BY doc_a, doc_b"""

  private[registry] val incrementalDedupOracle: String = incrementalDedupOracleFor(7)

  /** Shared oracle for q204 AND q212: per-node triangle counts are
    * orientation-invariant, so the degree-ordered variant must be
    * bit-identical to the id-ordered one. */
  private[registry] val trianglesOracle: String = """
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
      tri AS (
        SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
        FROM pairs e1
        JOIN pairs e2 ON e1.doc_b = e2.doc_a
        JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
      deg AS (
        SELECT doc_id, COUNT(*) AS degree FROM (
          SELECT doc_a AS doc_id FROM pairs
          UNION ALL SELECT doc_b FROM pairs) u
        GROUP BY doc_id),
      tn AS (
        SELECT doc_id, COUNT(*) AS n_triangles FROM (
          SELECT a AS doc_id FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri) u
        GROUP BY doc_id)
      SELECT d.doc_id, d.degree,
        COALESCE(tn.n_triangles, 0) AS n_triangles
      FROM deg d LEFT JOIN tn USING (doc_id)
      ORDER BY doc_id"""


  /** The shared two-round Lloyd CTE chain of q248/q249 (`a2` = final
    * assignment). Kept as one string so both oracles iterate from the
    * same seed and rounding discipline as `Similarity.kmeansAssigned`
    * — including the ADAPTIVE cluster count (max(8, ceil(n/250)),
    * mirroring `Similarity.adaptiveK`; 8 at every committed test
    * scale). */
  private[registry] val kmeansCtes: String = """
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      seed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM e ORDER BY vec_id
        LIMIT (SELECT GREATEST(8,
          CAST(CEIL(COUNT(*) / 250.0) AS BIGINT)) FROM e)),
      d1 AS (
        SELECT e.vec_id, e.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(e.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM e CROSS JOIN seed s),
      a1 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d1)
        WHERE rn = 1),
      c1 AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 65),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS s
                 FROM a1)
           GROUP BY cid, pos)
        GROUP BY cid),
      d2 AS (
        SELECT e.vec_id, e.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(e.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM e CROSS JOIN c1 s),
      a2 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d2)
        WHERE rn = 1)"""

  /** q294/q295's oracle: retrain the deterministic Lloyd model the
    * persisted IVF index was built from (seed = 8 lowest vec_ids of
    * the TRAIN slice, one refinement, 9-rounded distances/means —
    * Similarity.centersOf), assign the FULL corpus against those
    * centers (append must be invisible under the frozen model), pick
    * each probe's 2 nearest cells by 9-rounded centroid distance
    * (tie-break lowest cid, mirroring lloydAssign's first-min), and
    * rank exact 9-rounded cosine inside the probed cells. */
  private[registry] def ivfProbeOracle(trainWhere: String): String = s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      et AS (SELECT vec_id, v FROM e $trainWhere),
      seed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM et ORDER BY vec_id LIMIT 8),
      d1 AS (
        SELECT et.vec_id, et.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(et.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM et CROSS JOIN seed s),
      a1 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d1)
        WHERE rn = 1),
      c1 AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 65),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS s
                 FROM a1)
           GROUP BY cid, pos)
        GROUP BY cid),
      d2 AS (
        SELECT e.vec_id, e.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(e.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM e CROSS JOIN c1 s),
      a2 AS (
        SELECT vec_id, v, cid FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d2)
        WHERE rn = 1),
      pr AS (SELECT vec_id AS q_id, v AS pv FROM e WHERE vec_id < 5),
      pc AS (
        SELECT q_id, pv, cid FROM (
          SELECT p.q_id, p.pv, c.cid,
            row_number() OVER (PARTITION BY p.q_id ORDER BY
              ROUND(list_reduce(list_transform(list_zip(p.pv, c.c),
                t -> (t[1]-t[2])*(t[1]-t[2])), (a,b) -> a + b), 9),
              c.cid) AS rn
          FROM pr p CROSS JOIN c1 c)
        WHERE rn <= 2),
      cand AS (
        SELECT pc.q_id, a.vec_id,
          ROUND(
            list_reduce(list_transform(list_zip(pc.pv, a.v),
              t -> t[1]*t[2]), (x,y) -> x + y)
            / (sqrt(list_reduce(list_transform(pc.pv, x -> x*x),
                (x,y) -> x + y))
             * sqrt(list_reduce(list_transform(a.v, x -> x*x),
                (x,y) -> x + y))), 9) AS cosine
        FROM a2 a JOIN pc ON a.cid = pc.cid AND a.vec_id <> pc.q_id)
      SELECT q_id, CAST(rank AS INT) AS rank, vec_id, cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
          ORDER BY cosine DESC, vec_id) AS rank FROM cand)
      WHERE rank <= 3 ORDER BY q_id, rank"""

  /** One PQ subspace's deterministic codebook + encoding chain: the
    * Lloyd template (seed = 8 lowest vec_id SLICES, one refinement,
    * 9-rounded), run on list_slice(v, o+1, o+16). */
  /** The per-cell drift aggregation + flag shared by q298's and
    * q302's oracles — ONE definition mirroring
    * `VectorIndex.driftAgg`, so a rule change cannot desync the
    * monitor's SQL from the rebuild trigger's. Emits CTE bodies `g`
    * (per-cell populations, appended share, mean distances named
    * `$mb`/`$mn`) and `gf` (g + drift_flag), reading from an upstream
    * `a2 (vec_id, cid, dist)`. */
  private[registry] def driftCellsSql(mb: String, mn: String): String = s"""
      g AS (
        SELECT CAST(cid AS INT) AS cid,
          CAST(SUM(CASE WHEN vec_id % 10 <> 7 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_base,
          CAST(SUM(CASE WHEN vec_id % 10 = 7 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new,
          ROUND(CAST(SUM(CASE WHEN vec_id % 10 = 7 THEN 1 ELSE 0 END)
              AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS share_new,
          CASE WHEN SUM(CASE WHEN vec_id % 10 <> 7 THEN 1 ELSE 0 END) > 0
            THEN ROUND(CAST(SUM(CASE WHEN vec_id % 10 <> 7
                THEN CAST(dist AS DECIMAL(28,9))
                ELSE CAST(0 AS DECIMAL(28,9)) END) AS DOUBLE)
              / CAST(SUM(CASE WHEN vec_id % 10 <> 7 THEN 1 ELSE 0 END)
                AS DOUBLE), 9) END AS $mb,
          CASE WHEN SUM(CASE WHEN vec_id % 10 = 7 THEN 1 ELSE 0 END) > 0
            THEN ROUND(CAST(SUM(CASE WHEN vec_id % 10 = 7
                THEN CAST(dist AS DECIMAL(28,9))
                ELSE CAST(0 AS DECIMAL(28,9)) END) AS DOUBLE)
              / CAST(SUM(CASE WHEN vec_id % 10 = 7 THEN 1 ELSE 0 END)
                AS DOUBLE), 9) END AS $mn
        FROM a2 GROUP BY cid),
      gf AS (
        SELECT *, (n_new > 0 AND (n_base = 0 OR $mn > $mb * 1.5))
          AS drift_flag
        FROM g)"""

  /** q298's oracle: retrain the base-slice Lloyd model, assign the
    * FULL corpus (with distances), and aggregate per cell into the
    * drift report — base/appended populations, decimal-exact mean
    * distances, and the 1.5× drift flag (NULL-safe like Spark's
    * coalesce) via the shared [[driftCellsSql]] fragment. */
  private[registry] def ivfDriftOracle: String = s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      et AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 7),
      seed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM et ORDER BY vec_id LIMIT 8),
      d1 AS (
        SELECT et.vec_id, et.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(et.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM et CROSS JOIN seed s),
      a1 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d1)
        WHERE rn = 1),
      c1 AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 65),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS s
                 FROM a1)
           GROUP BY cid, pos)
        GROUP BY cid),
      d2 AS (
        SELECT e.vec_id, s.cid,
          ROUND(list_reduce(list_transform(list_zip(e.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM e CROSS JOIN c1 s),
      a2 AS (
        SELECT vec_id, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d2)
        WHERE rn = 1),
      ${driftCellsSql("mean_dist_base", "mean_dist_new")}
      SELECT cid, n_base, n_new, share_new, mean_dist_base,
        mean_dist_new, drift_flag
      FROM gf ORDER BY cid"""

  /** q302's oracle: re-derive the whole incremental-maintenance chain
    * from the base tables — drift-inject the day-1 batch (+1.5 on the
    * first 8 dims; DuckDB index lambdas are 1-based where Spark's are
    * 0-based, so `i <= 8` here IS Spark's `i < 8`), train the frozen
    * model on the base slice, assign the full drifted corpus, fire
    * the q298 flag rule per cell, recenter the FLAGGED cells from
    * their members (9-rounded per-dim means), reassign only those
    * cells' vectors against the updated center set, and report
    * before/after populations plus the 9-rounded squared centroid
    * shift. Incremental maintenance must equal this from-scratch
    * derivation exactly. */
  /** q303's oracle: retrain the full-corpus k=8 Lloyd model (the
    * fixed-cell-count index tier, NOT the adaptive analysis tier),
    * rank every probe's cells, score each (probe, candidate) cosine
    * once with its cell rank attached, and read recall@3 per nprobe
    * level as rank_l ≤ 3 AND rank_exact ≤ 3 on the same row —
    * mirroring the Spark plan's no-self-join shape. */
  private[registry] def ivfNprobeCurveOracle: String = s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      seed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM e ORDER BY vec_id LIMIT 8),
      d1 AS (
        SELECT e.vec_id, e.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(e.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM e CROSS JOIN seed s),
      a1 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d1)
        WHERE rn = 1),
      c1 AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 65),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS s
                 FROM a1)
           GROUP BY cid, pos)
        GROUP BY cid),
      d2 AS (
        SELECT e.vec_id, e.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(e.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM e CROSS JOIN c1 s),
      a2 AS (
        SELECT vec_id, v, cid FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d2)
        WHERE rn = 1),
      pr AS (SELECT vec_id AS q_id, v AS pv FROM e WHERE vec_id < 16),
      cr AS (
        SELECT q_id, pv, cid, crank FROM (
          SELECT p.q_id, p.pv, c.cid,
            row_number() OVER (PARTITION BY p.q_id ORDER BY
              ROUND(list_reduce(list_transform(list_zip(p.pv, c.c),
                t -> (t[1]-t[2])*(t[1]-t[2])), (a,b) -> a + b), 9),
              c.cid) AS crank
          FROM pr p CROSS JOIN c1 c)),
      cand AS (
        SELECT cr.q_id, a.vec_id, cr.crank,
          ROUND(
            list_reduce(list_transform(list_zip(cr.pv, a.v),
              t -> t[1]*t[2]), (x,y) -> x + y)
            / (sqrt(list_reduce(list_transform(cr.pv, x -> x*x),
                (x,y) -> x + y))
             * sqrt(list_reduce(list_transform(a.v, x -> x*x),
                (x,y) -> x + y))), 9) AS cosine
        FROM a2 a JOIN cr ON a.cid = cr.cid AND a.vec_id <> cr.q_id),
      ce AS (
        SELECT *, row_number() OVER (PARTITION BY q_id
          ORDER BY cosine DESC, vec_id) AS rank_exact
        FROM cand),
      lv AS (
        SELECT ce.*, l.nprobe FROM ce
        CROSS JOIN (VALUES (1), (2), (4), (8)) l(nprobe)
        WHERE ce.crank <= l.nprobe),
      rl AS (
        SELECT *, row_number() OVER (PARTITION BY nprobe, q_id
          ORDER BY cosine DESC, vec_id) AS rank_l
        FROM lv)
      SELECT CAST(nprobe AS INT) AS nprobe,
        COUNT(DISTINCT q_id) AS n_probes,
        CAST(SUM(CASE WHEN rank_l <= 3 AND rank_exact <= 3
          THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        COUNT(DISTINCT q_id) * 3 AS possible,
        ROUND(CAST(SUM(CASE WHEN rank_l <= 3 AND rank_exact <= 3
            THEN 1 ELSE 0 END) AS DOUBLE)
          / (COUNT(DISTINCT q_id) * 3), 9) AS recall
      FROM rl GROUP BY nprobe ORDER BY nprobe"""

  /** q305's oracle: erasure accounting from the frozen full-corpus
    * model — per cell, the deterministic assignment's population,
    * the deletion-request members in it, and the arithmetic
    * survivor count. Spark's n_after is COUNTED from the really
    * rewritten table, so a rewrite that misses a victim or drops a
    * bystander hash-fails here. */
  private[registry] def ivfDeletionOracle: String = s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      seed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM e ORDER BY vec_id LIMIT 8),
      d1 AS (
        SELECT e.vec_id, e.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(e.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM e CROSS JOIN seed s),
      a1 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d1)
        WHERE rn = 1),
      c1 AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 65),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS s
                 FROM a1)
           GROUP BY cid, pos)
        GROUP BY cid),
      d2 AS (
        SELECT e.vec_id, e.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(e.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM e CROSS JOIN c1 s),
      a2 AS (
        SELECT vec_id, cid FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d2)
        WHERE rn = 1)
      SELECT cid, n_before, n_deleted,
        n_before - n_deleted AS n_after,
        n_deleted > 0 AS touched
      FROM (
        SELECT cid, COUNT(*) AS n_before,
          CAST(SUM(CASE WHEN vec_id % 10 = 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_deleted
        FROM a2 GROUP BY cid)
      ORDER BY cid"""

  /** q306's oracle: the gate-recall certificate re-derived — exact
    * new-vs-base pairs at the 0.45 threshold, each matched against
    * the arrival's 2-cell frozen-model probe set, aggregated into
    * caught/missed counts by probe rank. */
  private[registry] def gateRecallOracle: String = s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      et AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 7),
      seed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM et ORDER BY vec_id LIMIT 8),
      d1 AS (
        SELECT et.vec_id, et.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(et.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM et CROSS JOIN seed s),
      a1 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d1)
        WHERE rn = 1),
      c1 AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 65),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS s
                 FROM a1)
           GROUP BY cid, pos)
        GROUP BY cid),
      base AS (
        SELECT vec_id, v, cid FROM
          (SELECT t.vec_id, t.v, s.cid,
            row_number() OVER (PARTITION BY t.vec_id ORDER BY
              ROUND(list_reduce(list_transform(list_zip(t.v, s.c),
                p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9),
              s.cid) AS rn
           FROM et t CROSS JOIN c1 s)
        WHERE rn = 1),
      nv AS (SELECT vec_id, v FROM e WHERE vec_id % 10 = 7),
      pc AS (
        SELECT vec_id, cid, rn AS crank FROM (
          SELECT n.vec_id, s.cid,
            row_number() OVER (PARTITION BY n.vec_id ORDER BY
              ROUND(list_reduce(list_transform(list_zip(n.v, s.c),
                p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9),
              s.cid) AS rn
          FROM nv n CROSS JOIN c1 s)
        WHERE rn <= 2),
      ex AS (
        SELECT n.vec_id AS vn, b.vec_id AS vd, b.cid AS bcid
        FROM nv n JOIN base b ON
          ROUND(
            list_reduce(list_transform(list_zip(n.v, b.v),
              t -> t[1]*t[2]), (x,y) -> x + y)
            / (sqrt(list_reduce(list_transform(n.v, x -> x*x),
                (x,y) -> x + y))
             * sqrt(list_reduce(list_transform(b.v, x -> x*x),
                (x,y) -> x + y))), 9) >= 0.45),
      j AS (
        SELECT ex.vn, ex.vd, p.crank
        FROM ex LEFT JOIN pc p ON ex.vn = p.vec_id AND ex.bcid = p.cid)
      SELECT COUNT(*) AS n_exact,
        CAST(SUM(CASE WHEN crank IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_caught,
        CAST(SUM(CASE WHEN crank = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_rank1,
        CAST(SUM(CASE WHEN crank = 2 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_rank2,
        ROUND(CAST(SUM(CASE WHEN crank IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*), 9) AS recall
      FROM j"""

  /** q304's oracle: the streaming gate's decisions re-derived in
    * batch — train the frozen base model, assign the BASE corpus (the
    * index contents), rank each arriving vector's 2 nearest cells,
    * and emit every same-probed-cell (new, base) pair at 9-rounded
    * cosine ≥ 0.45. A base vector lives in exactly one cell, so the
    * join cannot duplicate a pair — the statelessness the Spark
    * plan's scaladoc claims is also what makes this oracle a plain
    * join. */
  private[registry] def streamIvfGateOracle: String = s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      et AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 7),
      seed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM et ORDER BY vec_id LIMIT 8),
      d1 AS (
        SELECT et.vec_id, et.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(et.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM et CROSS JOIN seed s),
      a1 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d1)
        WHERE rn = 1),
      c1 AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 65),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS s
                 FROM a1)
           GROUP BY cid, pos)
        GROUP BY cid),
      base AS (
        SELECT vec_id, v, cid FROM
          (SELECT t.vec_id, t.v, s.cid,
            row_number() OVER (PARTITION BY t.vec_id ORDER BY
              ROUND(list_reduce(list_transform(list_zip(t.v, s.c),
                p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9),
              s.cid) AS rn
           FROM et t CROSS JOIN c1 s)
        WHERE rn = 1),
      nv AS (SELECT vec_id, v FROM e WHERE vec_id % 10 = 7),
      pc AS (
        SELECT vec_id, v, cid FROM (
          SELECT n.vec_id, n.v, s.cid,
            row_number() OVER (PARTITION BY n.vec_id ORDER BY
              ROUND(list_reduce(list_transform(list_zip(n.v, s.c),
                p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9),
              s.cid) AS rn
          FROM nv n CROSS JOIN c1 s)
        WHERE rn <= 2)
      SELECT vec_new, vec_dup, cosine FROM (
        SELECT p.vec_id AS vec_new, b.vec_id AS vec_dup,
          ROUND(
            list_reduce(list_transform(list_zip(p.v, b.v),
              t -> t[1]*t[2]), (x,y) -> x + y)
            / (sqrt(list_reduce(list_transform(p.v, x -> x*x),
                (x,y) -> x + y))
             * sqrt(list_reduce(list_transform(b.v, x -> x*x),
                (x,y) -> x + y))), 9) AS cosine
        FROM pc p JOIN base b ON p.cid = b.cid)
      WHERE cosine >= 0.45
      ORDER BY vec_new, vec_dup"""

  private[registry] def ivfRebuildOracle: String = s"""
      WITH e0 AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      e AS (
        SELECT vec_id,
          CASE WHEN vec_id % 10 = 7
            THEN list_transform(v, (x, i) ->
              CASE WHEN i <= 8 THEN x + 1.5 ELSE x END)
            ELSE v END AS v
        FROM e0),
      et AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 7),
      seed AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM et ORDER BY vec_id LIMIT 8),
      d1 AS (
        SELECT et.vec_id, et.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(et.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM et CROSS JOIN seed s),
      a1 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d1)
        WHERE rn = 1),
      c1 AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 65),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS s
                 FROM a1)
           GROUP BY cid, pos)
        GROUP BY cid),
      d2 AS (
        SELECT e.vec_id, e.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(e.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM e CROSS JOIN c1 s),
      a2 AS (
        SELECT vec_id, v, cid, dist FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM d2)
        WHERE rn = 1),
      ${driftCellsSql("mb", "mn")},
      fl AS (SELECT cid FROM gf WHERE drift_flag),
      nc AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 65),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS s
                 FROM a2 WHERE cid IN (SELECT cid FROM fl))
           GROUP BY cid, pos)
        GROUP BY cid),
      c2 AS (
        SELECT c1.cid,
          CASE WHEN nc.cid IS NOT NULL THEN nc.c ELSE c1.c END AS c
        FROM c1 LEFT JOIN nc ON c1.cid = nc.cid),
      rd AS (
        SELECT a.vec_id, s.cid,
          ROUND(list_reduce(list_transform(list_zip(a.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a2_,b2_) -> a2_ + b2_), 9)
            AS dist
        FROM (SELECT * FROM a2 WHERE cid IN (SELECT cid FROM fl)) a
        CROSS JOIN c2 s),
      ra AS (
        SELECT vec_id, cid FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM rd)
        WHERE rn = 1),
      fin AS (
        SELECT vec_id, cid FROM a2
        WHERE cid NOT IN (SELECT cid FROM fl)
        UNION ALL SELECT vec_id, cid FROM ra),
      aft AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_after
              FROM fin GROUP BY cid),
      sh AS (
        SELECT c1.cid,
          ROUND(list_reduce(list_transform(list_zip(c1.c, c2.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (x,y) -> x + y), 9) AS s
        FROM c1 JOIN c2 ON c1.cid = c2.cid)
      SELECT gf.cid, gf.drift_flag AS flagged,
        (gf.n_base + gf.n_new) AS n_before,
        COALESCE(aft.n_after, 0) AS n_after,
        CASE WHEN gf.drift_flag THEN sh.s ELSE 0.0 END AS center_shift
      FROM gf LEFT JOIN aft ON gf.cid = aft.cid
      JOIN sh ON gf.cid = sh.cid
      ORDER BY gf.cid"""

  /** One PQ subspace's codebook chain with the assignment DISTANCE
    * kept — the q300 reconstruction-error variant of pqSubspaceCtes. */
  private[registry] def pqErrSubspaceCtes(s: Int): String = {
    val lo = s * 16 + 1
    val hi = s * 16 + 16
    s"""
      es$s AS (SELECT vec_id, list_slice(v, $lo, $hi) AS v FROM e),
      sd$s AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM es$s ORDER BY vec_id LIMIT 8),
      pd$s AS (
        SELECT t.vec_id, t.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(t.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM es$s t CROSS JOIN sd$s s),
      pa$s AS (
        SELECT vec_id, v, cid FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM pd$s)
        WHERE rn = 1),
      cb$s AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(u.pos AS INT) AS pos, ROUND(AVG(u.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 17),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS u
                 FROM pa$s)
           GROUP BY cid, pos)
        GROUP BY cid),
      er$s AS (
        SELECT vec_id, dist FROM (
          SELECT t.vec_id,
            ROUND(list_reduce(list_transform(list_zip(t.v, s.c),
              p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist,
            row_number() OVER (PARTITION BY t.vec_id ORDER BY
              ROUND(list_reduce(list_transform(list_zip(t.v, s.c),
                p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9),
              s.cid) AS rn
          FROM es$s t CROSS JOIN cb$s s)
        WHERE rn = 1)"""
  }

  /** q300's oracle: the four distance-keeping subspace chains,
    * aggregated to one reconstruction-error row per subspace. */
  private[registry] def pqReconstructionOracle: String = s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      ${(0 until 4).map(pqErrSubspaceCtes).mkString(",")}
      SELECT CAST(s AS INT) AS s, n_vecs, mean_sq_err, max_sq_err FROM (
        ${(0 until 4).map(s =>
          s"""SELECT $s AS s, CAST(COUNT(*) AS BIGINT) AS n_vecs,
            ROUND(CAST(SUM(CAST(dist AS DECIMAL(28,9))) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE), 9) AS mean_sq_err,
            MAX(dist) AS max_sq_err FROM er$s""")
          .mkString("\n        UNION ALL ")})
      ORDER BY s"""

  /** q299's oracle: the POSITION-QUALIFIED delete-1 key space's
    * block-population histogram (r8 — the family q230 joins on) —
    * mirrors Spark's "pos:variant" key generation (substring
    * semantics are identical in both engines) and the power-of-two
    * bucket rule. */
  private[registry] def blockHealthOracle: String = """
      WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
      ks AS (
        SELECT id, unnest(
          list_transform(range(1, length(name) + 1),
            i -> CAST(i AS VARCHAR) || ':' ||
                 substring(name, 1, CAST(i - 1 AS INT)) ||
                 substring(name, CAST(i + 1 AS INT), length(name))))
          AS k
        FROM c),
      blocks AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS p
                 FROM ks GROUP BY k),
      b AS (
        SELECT p,
          CASE WHEN p <= 1 THEN 1 WHEN p <= 2 THEN 2 WHEN p <= 4 THEN 3
               WHEN p <= 8 THEN 4 WHEN p <= 16 THEN 5 ELSE 6 END
            AS bucket_rank,
          CASE WHEN p <= 1 THEN '1' WHEN p <= 2 THEN '2'
               WHEN p <= 4 THEN '3-4' WHEN p <= 8 THEN '5-8'
               WHEN p <= 16 THEN '9-16' ELSE '17+' END AS bucket
        FROM blocks)
      SELECT CAST(bucket_rank AS INT) AS bucket_rank, bucket,
        CAST(COUNT(*) AS BIGINT) AS n_blocks,
        CAST(SUM(p) AS BIGINT) AS n_key_rows,
        CAST(SUM(p * (p - 1) // 2) AS BIGINT) AS n_cand_pairs
      FROM b GROUP BY bucket_rank, bucket ORDER BY bucket_rank"""

  private[registry] def pqSubspaceCtes(s: Int): String = {
    val lo = s * 16 + 1
    val hi = s * 16 + 16
    s"""
      es$s AS (SELECT vec_id, list_slice(v, $lo, $hi) AS v FROM e),
      sd$s AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
          AS cid, v AS c
        FROM es$s ORDER BY vec_id LIMIT 8),
      pd$s AS (
        SELECT t.vec_id, t.v, s.cid,
          ROUND(list_reduce(list_transform(list_zip(t.v, s.c),
            p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9) AS dist
        FROM es$s t CROSS JOIN sd$s s),
      pa$s AS (
        SELECT vec_id, v, cid FROM
          (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY dist, cid) AS rn FROM pd$s)
        WHERE rn = 1),
      cb$s AS (
        SELECT cid, list(m ORDER BY pos) AS c FROM
          (SELECT cid, CAST(u.pos AS INT) AS pos, ROUND(AVG(u.x), 9) AS m
           FROM (SELECT cid, unnest(list_transform(range(1, 17),
                   i -> {'pos': i, 'x': v[CAST(i AS INT)]})) AS u
                 FROM pa$s)
           GROUP BY cid, pos)
        GROUP BY cid),
      en$s AS (
        SELECT vec_id, cid AS code FROM (
          SELECT t.vec_id, s.cid,
            row_number() OVER (PARTITION BY t.vec_id ORDER BY
              ROUND(list_reduce(list_transform(list_zip(t.v, s.c),
                p -> (p[1]-p[2])*(p[1]-p[2])), (a,b) -> a + b), 9),
              s.cid) AS rn
          FROM es$s t CROSS JOIN cb$s s)
        WHERE rn = 1)"""
  }

  /** q296's oracle: the four subspace codebook/encode chains, the ADC
    * grid (probe × subspace × code, 9-rounded sub-distances summed as
    * exact decimals), top-20 shortlist by approximate distance, exact
    * cosine re-rank of the shortlist. */
  private[registry] def pqPersistedOracle: String = s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
          AS v
        FROM embeddings),
      ${(0 until 4).map(pqSubspaceCtes).mkString(",")},
      cbs AS (
        ${(0 until 4).map(s =>
          s"SELECT $s AS s, cid AS code, c FROM cb$s")
          .mkString("\n        UNION ALL ")}),
      cds AS (
        ${(0 until 4).map(s =>
          s"SELECT vec_id, $s AS s, code FROM en$s")
          .mkString("\n        UNION ALL ")}),
      pr AS (SELECT vec_id AS q_id, v AS pv FROM e WHERE vec_id < 5),
      grid AS (
        SELECT p.q_id, b.s, b.code,
          ROUND(list_reduce(list_transform(list_zip(
            list_slice(p.pv, b.s * 16 + 1, b.s * 16 + 16), b.c),
            t -> (t[1]-t[2])*(t[1]-t[2])), (x,y) -> x + y), 9) AS d
        FROM pr p CROSS JOIN cbs b),
      ap AS (
        SELECT g.q_id, c.vec_id,
          CAST(SUM(CAST(g.d AS DECIMAL(28,9))) AS DOUBLE) AS approx_d
        FROM cds c JOIN grid g ON g.s = c.s AND g.code = c.code
        WHERE c.vec_id <> g.q_id
        GROUP BY g.q_id, c.vec_id),
      sl AS (
        SELECT q_id, vec_id FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY approx_d, vec_id) AS crank FROM ap)
        WHERE crank <= 20),
      cand AS (
        SELECT sl.q_id, sl.vec_id,
          ROUND(
            list_reduce(list_transform(list_zip(p.pv, e.v),
              t -> t[1]*t[2]), (x,y) -> x + y)
            / (sqrt(list_reduce(list_transform(p.pv, x -> x*x),
                (x,y) -> x + y))
             * sqrt(list_reduce(list_transform(e.v, x -> x*x),
                (x,y) -> x + y))), 9) AS cosine
        FROM sl
        JOIN e ON e.vec_id = sl.vec_id
        JOIN pr p ON p.q_id = sl.q_id)
      SELECT q_id, CAST(rank AS INT) AS rank, vec_id, cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
          ORDER BY cosine DESC, vec_id) AS rank FROM cand)
      WHERE rank <= 3 ORDER BY q_id, rank"""

  /** q297's oracle: the exact J ≥ 0.8 relation (q289's definition)
    * against the md5-portable SimHash pair set — per-token 64-bit
    * hash from md5's first 8 bytes (bit j = in-nibble bit j%4 of hex
    * char 16 − j/4), sign-of-sum sketch, 4×16-bit chunk pigeonhole
    * candidates, hamming ≤ 3 verify — aggregated to per-Jaccard-band
    * recall. */
  private[registry] def simhashRecallOracle: String = """
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
      ex AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          ROUND(CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE)
            / CAST(len(list_distinct(a.shl || b.shl)) AS DOUBLE), 9)
            AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      exf AS (
        SELECT doc_a, doc_b,
          LEAST(CAST(floor(jaccard * 20.0) AS BIGINT), 19) AS band
        FROM ex WHERE jaccard >= 0.8),
      tok AS (SELECT doc_id, unnest(w) AS t FROM words
              WHERE len(w) >= 1),
      bitsum AS (
        SELECT doc_id, j,
          SUM(CASE WHEN (((strpos('0123456789abcdef',
              substring(md5(t), CAST(16 - (j // 4) AS INT), 1)) - 1)
              >> CAST(j % 4 AS INT)) & 1) = 1
            THEN 1 ELSE -1 END) AS csum
        FROM tok CROSS JOIN (SELECT unnest(range(64)) AS j)
        GROUP BY doc_id, j),
      sk AS (
        SELECT doc_id,
          list(CASE WHEN csum > 0 THEN 1 ELSE 0 END ORDER BY j) AS b
        FROM bitsum GROUP BY doc_id),
      ck AS (
        SELECT doc_id, b, ch,
          list_reduce(list_transform(range(16),
            i -> b[CAST(ch * 16 + i + 1 AS INT)]
              * (1 << CAST(i AS INT))),
            (x, y) -> x + y) AS chunk_val
        FROM sk CROSS JOIN (SELECT unnest(range(4)) AS ch)),
      sp AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM ck x JOIN ck y ON x.ch = y.ch
          AND x.chunk_val = y.chunk_val AND x.doc_id < y.doc_id),
      sf AS (
        SELECT p.doc_a, p.doc_b FROM sp p
        JOIN sk xa ON xa.doc_id = p.doc_a
        JOIN sk yb ON yb.doc_id = p.doc_b
        WHERE list_reduce(list_transform(list_zip(xa.b, yb.b),
          u -> abs(u[1] - u[2])), (x, y) -> x + y) <= 3)
      SELECT CAST(band AS DOUBLE) / 20.0 AS band_lo,
        CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(SUM(CASE WHEN sf.doc_a IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_simhash,
        ROUND(CAST(SUM(CASE WHEN sf.doc_a IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS recall
      FROM exf LEFT JOIN sf ON sf.doc_a = exf.doc_a
        AND sf.doc_b = exf.doc_b
      GROUP BY band ORDER BY band_lo"""

  /** Shared oracle of the streaming admission gate (q217 unbounded /
    * q237 watermark-bounded): new-vs-corpus banded candidates with the
    * exact-Jaccard verify — state bounding must not change the
    * admitted set. */
  private[registry] def streamGateOracle: String = """
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
        SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
        FROM bands n
        JOIN bands o ON n.band = o.band AND n.band_key = o.band_key
        WHERE n.doc_id % 10 = 7 AND o.doc_id % 10 <> 7)
      SELECT doc_new, doc_old,
        ROUND(CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE), 9)
          AS jaccard
      FROM cand
      JOIN sh x ON x.doc_id = doc_new
      JOIN sh y ON y.doc_id = doc_old
      WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
          / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.8
      ORDER BY doc_new, doc_old"""

  private[registry] val curationPipelineOracle: String = """
      WITH RECURSIVE train AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
      tok AS (
        SELECT doc_id, text,
          len(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS n
        FROM train),
      s1 AS (SELECT doc_id, text FROM tok WHERE n BETWEEN 20 AND 100000),
      fp AS (
        SELECT doc_id, text,
          MIN(doc_id) OVER (PARTITION BY
            md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))
            AS min_id
        FROM s1),
      s2 AS (SELECT doc_id, text FROM fp WHERE doc_id = min_id),
      words2 AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM s2),
      sh AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS shl
        FROM words2 WHERE len(w) >= 2),
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
      sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
      reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
      labels AS (
        SELECT src AS id, LEAST(src, MIN(dst)) AS label
        FROM reach GROUP BY src),
      drop3 AS (SELECT id AS doc_id FROM labels WHERE label < id),
      s3 AS (SELECT doc_id, text FROM s2
             WHERE doc_id NOT IN (SELECT doc_id FROM drop3)),
      gw AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM s3),
      g3 AS (
        SELECT doc_id,
          unnest(list_distinct(list_transform(range(1, len(w) - 6),
            i -> array_to_string(w[i:i+7], ' ')))) AS gram
        FROM gw WHERE len(w) >= 8),
      ew AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ') AS w
        FROM documents WHERE doc_id % 10 = 0),
      eg AS (
        SELECT DISTINCT
          unnest(list_distinct(list_transform(range(1, len(w) - 6),
            i -> array_to_string(w[i:i+7], ' ')))) AS gram
        FROM ew WHERE len(w) >= 8),
      contaminated AS (
        SELECT DISTINCT g3.doc_id FROM g3 JOIN eg USING (gram)),
      s4 AS (SELECT doc_id FROM s3
             WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
      n AS (
        SELECT (SELECT COUNT(*) FROM train) AS n0,
               (SELECT COUNT(*) FROM s1) AS n1,
               (SELECT COUNT(*) FROM s2) AS n2,
               (SELECT COUNT(*) FROM s3) AS n3,
               (SELECT COUNT(*) FROM s4) AS n4)
      SELECT CAST(stage AS INT) AS stage, gate,
        CAST(n_entering AS BIGINT) AS n_entering,
        CAST(n_dropped AS BIGINT) AS n_dropped,
        CAST(n_surviving AS BIGINT) AS n_surviving
      FROM (
        SELECT 1 AS stage, 'quality_length' AS gate, n0 AS n_entering,
               n0 - n1 AS n_dropped, n1 AS n_surviving FROM n
        UNION ALL SELECT 2, 'exact_dedup', n1, n1 - n2, n2 FROM n
        UNION ALL SELECT 3, 'near_dedup', n2, n2 - n3, n3 FROM n
        UNION ALL SELECT 4, 'decontamination', n3, n3 - n4, n4 FROM n) r
      ORDER BY stage"""

  private[registry] val shardManifestOracle: String = """
      WITH s AS (
        SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
            ::INTEGER % 16 AS shard,
          CAST(len(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' ')) AS BIGINT) AS tokens
        FROM documents),
      m AS (
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(tokens) AS BIGINT) AS n_tokens
        FROM s GROUP BY shard),
      t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM m)
      SELECT shard, n_docs, n_tokens,
        CAST(n_tokens AS DOUBLE) * 16.0 / CAST(tot AS DOUBLE) AS balance
      FROM m CROSS JOIN t
      ORDER BY shard"""

  private[registry] val clusterDownweightOracle: String = """
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
      tok AS (
        SELECT doc_id,
          CAST(len(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' ')) AS BIGINT) AS tokens
        FROM documents),
      lab AS (
        SELECT t.doc_id, t.tokens, l.label
        FROM tok t LEFT JOIN labels l ON l.id = t.doc_id),
      clusters AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS k,
          CAST(SUM(tokens) AS BIGINT) AS cluster_tokens,
          CAST(MAX(CASE WHEN doc_id = label THEN tokens END) AS BIGINT)
            AS rep_tokens
        FROM lab WHERE label IS NOT NULL GROUP BY label),
      paired AS (
        SELECT k AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
          CAST(SUM(cluster_tokens) AS BIGINT) AS tokens_total,
          CAST(SUM(rep_tokens) AS BIGINT) AS tokens_keep_one
        FROM clusters GROUP BY k),
      single AS (
        SELECT CAST(1 AS BIGINT) AS cluster_size,
          CAST(COUNT(*) AS BIGINT) AS n_clusters,
          CAST(SUM(tokens) AS BIGINT) AS tokens_total,
          CAST(SUM(tokens) AS BIGINT) AS tokens_keep_one
        FROM lab WHERE label IS NULL),
      u AS (SELECT * FROM single UNION ALL SELECT * FROM paired)
      SELECT cluster_size, n_clusters,
        cluster_size * n_clusters AS n_docs,
        tokens_total, tokens_keep_one,
        CAST(tokens_total AS DOUBLE) / CAST(cluster_size AS DOUBLE)
          AS tokens_effective
      FROM u
      ORDER BY cluster_size"""

  /** q69's oracle (cluster summary over the full near-dup graph);
    * q242's incremental update must reproduce it bit-for-bit. */
  private[registry] val dedupClustersOracle: String =
    ccLabelCtes + """
      SELECT label AS cluster, COUNT(*) AS n_docs, MAX(id) AS max_doc
      FROM labels
      GROUP BY label
      ORDER BY cluster"""

  /** The shared CTE chain ending in `labels(id, label)` (min-label
    * transitive closure over the verified near-dup edges) and `edges`
    * — q69/q242's component labels, reused by q270's split repair. */
  private[registry] def ccLabelCtes: String = """
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
        FROM reach GROUP BY src)"""

  /** q151's BM25 scoring chain ending in `lexs(doc_id, bm25,
    * n_terms_hit)` — shared with the hybrid rank fusion (q280). */
  private[registry] val bm25Ctes: String = """
      WITH w2 AS (
        SELECT doc_id, word FROM (
          SELECT doc_id,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+',
              ' ', 'g')), ' ')) AS word
          FROM documents) u
        WHERE word <> ''),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM w2 GROUP BY doc_id),
      st AS (SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS total_len FROM dl),
      tf AS (
        SELECT doc_id, word, COUNT(*) AS tf FROM w2
        WHERE word IN ('the', 'data', 'model')
        GROUP BY doc_id, word),
      df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
      sc AS (
        SELECT tf.doc_id,
          CAST(ROUND(
            ln((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
               / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
            * (CAST(tf AS DOUBLE) * 2.2)
            / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
               * CAST(dl AS DOUBLE)
               / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))),
            9) AS DECIMAL(18,9)) AS s
        FROM tf JOIN df USING (word) JOIN dl USING (doc_id)
        CROSS JOIN st),
      lexs AS (
        SELECT doc_id, CAST(SUM(s) AS DOUBLE) AS bm25,
          COUNT(*) AS n_terms_hit
        FROM sc GROUP BY doc_id)"""

  /** Shared by q273 (batch) and q277 (streamed aggregate, identical
    * finishing math): integer-scaled CUSUM with the deterministic
    * argmax tie-break. */
  private[registry] val cusumOracle: String = """
      WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, day),
      tot AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS s
        FROM daily GROUP BY event_type),
      w AS (
        SELECT d.event_type, d.day, t.n, t.s,
          CAST(ROW_NUMBER() OVER pw AS BIGINT) AS t_idx,
          CAST(SUM(d.x) OVER pw AS BIGINT) AS cum
        FROM daily d JOIN tot t ON t.event_type = d.event_type
        WINDOW pw AS (PARTITION BY d.event_type ORDER BY d.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      sc AS (
        SELECT event_type, day, n, s, t_idx, cum,
          n * cum - t_idx * s AS ss
        FROM w),
      best AS (
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY ABS(ss) DESC, t_idx ASC) AS rn
          FROM sc) q WHERE rn = 1)
      SELECT event_type, n AS n_days, CAST(day AS VARCHAR) AS cp_day,
        ROUND(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE), 9) AS cusum,
        ROUND(CAST(cum AS DOUBLE) / CAST(t_idx AS DOUBLE), 9) AS pre_mean,
        CASE WHEN n > t_idx THEN
          ROUND(CAST(s - cum AS DOUBLE) / CAST(n - t_idx AS DOUBLE), 9)
        END AS post_mean
      FROM best ORDER BY event_type"""

  /** q279's oracle: the CC chain supplies bands and labels; chunk
    * counts reuse q263's per-doc chunk-grid formula; every artifact's
    * deleted/after/residual counts recompute from the kept rows. */
  private[registry] def deletionPropagationOracle: String =
    ccLabelCtes + """,
      dl AS (SELECT doc_id FROM documents WHERE doc_id % 101 = 0),
      chk AS (
        SELECT doc_id,
          CAST(1 + (greatest(CAST(len(string_split(trim(regexp_replace(
            lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) - 64, 0)
            + 47) // 48 AS BIGINT) AS n_chunks
        FROM documents),
      kb AS (SELECT doc_id FROM bands
             WHERE doc_id NOT IN (SELECT doc_id FROM dl)),
      kc AS (SELECT doc_id, n_chunks FROM chk
             WHERE doc_id NOT IN (SELECT doc_id FROM dl)),
      kd AS (SELECT doc_id FROM documents
             WHERE doc_id NOT IN (SELECT doc_id FROM dl)),
      kl AS (SELECT id, label FROM labels
             WHERE id NOT IN (SELECT doc_id FROM dl))
      SELECT * FROM (
        SELECT 'bands' AS artifact,
          CAST((SELECT COUNT(*) FROM bands) AS BIGINT) AS rows_before,
          CAST((SELECT COUNT(*) FROM bands)
            - (SELECT COUNT(*) FROM kb) AS BIGINT) AS rows_deleted,
          CAST((SELECT COUNT(*) FROM kb) AS BIGINT) AS rows_after,
          CAST((SELECT COUNT(*) FROM kb JOIN dl
            ON kb.doc_id = dl.doc_id) AS BIGINT) AS residual_refs,
          CAST(0 AS BIGINT) AS n_stale
        UNION ALL
        SELECT 'chunks',
          CAST((SELECT SUM(n_chunks) FROM chk) AS BIGINT),
          CAST((SELECT SUM(n_chunks) FROM chk)
            - (SELECT SUM(n_chunks) FROM kc) AS BIGINT),
          CAST((SELECT SUM(n_chunks) FROM kc) AS BIGINT),
          CAST((SELECT COUNT(*) FROM kc JOIN dl
            ON kc.doc_id = dl.doc_id) AS BIGINT),
          CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'corpus',
          CAST((SELECT COUNT(*) FROM documents) AS BIGINT),
          CAST((SELECT COUNT(*) FROM documents)
            - (SELECT COUNT(*) FROM kd) AS BIGINT),
          CAST((SELECT COUNT(*) FROM kd) AS BIGINT),
          CAST((SELECT COUNT(*) FROM kd JOIN dl
            ON kd.doc_id = dl.doc_id) AS BIGINT),
          CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'labels',
          CAST((SELECT COUNT(*) FROM labels) AS BIGINT),
          CAST((SELECT COUNT(*) FROM labels)
            - (SELECT COUNT(*) FROM kl) AS BIGINT),
          CAST((SELECT COUNT(*) FROM kl) AS BIGINT),
          CAST((SELECT COUNT(*) FROM kl JOIN dl
            ON kl.id = dl.doc_id) AS BIGINT),
          CAST((SELECT COUNT(*) FROM kl JOIN dl
            ON kl.label = dl.doc_id) AS BIGINT)) u
      ORDER BY artifact"""

  /** q280's oracle: BM25 arm (shared CTEs), exact-cosine arm against
    * probe vector 0, reciprocal-rank fusion with the same rounding. */
  private[registry] def rankFusionOracle: String = {
    def dotSql(a: String, b: String): String =
      s"""list_reduce(list_transform(range(1, 65),
            i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
            (x, y) -> x + y)"""
    bm25Ctes + s""",
      lex AS (
        SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC,
          doc_id) AS INT) AS rank_lex
        FROM (SELECT doc_id, bm25 FROM lexs
              ORDER BY bm25 DESC, doc_id LIMIT 20) t),
      pr AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
      semsc AS (
        SELECT e.vec_id AS doc_id,
          ${dotSql("q_emb", "e.embedding")}
          / sqrt(${dotSql("q_emb", "q_emb")}
            * ${dotSql("e.embedding", "e.embedding")}) AS cos
        FROM embeddings e CROSS JOIN pr
        WHERE e.vec_id <> 0),
      sem AS (
        SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC,
          doc_id) AS INT) AS rank_sem
        FROM (SELECT doc_id, cos FROM semsc
              ORDER BY cos DESC, doc_id LIMIT 20) t),
      fused AS (
        SELECT COALESCE(l.doc_id, s2.doc_id) AS doc_id,
          l.rank_lex, s2.rank_sem,
          ROUND(COALESCE(ROUND(1.0 / (60.0 + l.rank_lex), 9), 0.0)
            + COALESCE(ROUND(1.0 / (60.0 + s2.rank_sem), 9), 0.0), 9)
            AS rrf
        FROM lex l FULL OUTER JOIN sem s2 ON s2.doc_id = l.doc_id)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INT)
          AS fused_rank,
        doc_id, rank_lex, rank_sem, rrf
      FROM (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 10) t
      ORDER BY fused_rank"""
  }

  /** q281's oracle: the q274 CTE template with ranks kept, DCG@10
    * against the full-dim anchor, the ideal DCG derived by the same
    * formula from a 10-row range. */
  private[registry] def ndcgAblationOracle: String = {
    def dotSql(a: String, b: String, d: Int): String =
      s"""list_reduce(list_transform(range(1, ${d + 1}),
            i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
            (x, y) -> x + y)"""
    val variants = Seq(16, 32, 64).map { d =>
      s"""      s$d AS (
        SELECT q_id, e.vec_id,
          ${dotSql("q_emb", "e.embedding", d)}
          / sqrt(${dotSql("q_emb", "q_emb", d)}
            * ${dotSql("e.embedding", "e.embedding", d)}) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.q_id),
      t$d AS (
        SELECT q_id, vec_id, CAST(rn AS INT) AS rank FROM (
          SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS rn
          FROM s$d) z WHERE rn <= 10)"""
    }.mkString(",\n")
    val per = Seq(16, 32).map { d =>
      s"""      dcg$d AS (
        SELECT t$d.q_id,
          CAST(SUM(CAST(ROUND(1.0 / log2(CAST(t$d.rank AS DOUBLE) + 1.0),
            9) AS DECIMAL(28,9))) AS DOUBLE) AS dcg
        FROM t$d JOIN t64 ON t64.q_id = t$d.q_id
          AND t64.vec_id = t$d.vec_id
        GROUP BY t$d.q_id),
      nd$d AS (
        SELECT qq.q_id, ROUND(COALESCE(dd.dcg, 0.0) / i.idcg, 9) AS ndcg
        FROM (SELECT DISTINCT q_id FROM t64) qq
        LEFT JOIN dcg$d dd ON dd.q_id = qq.q_id
        CROSS JOIN idcg i),
      a$d AS (
        SELECT $d AS dim, CAST(COUNT(*) AS BIGINT) AS n_queries,
          ROUND(CAST(SUM(CAST(ndcg AS DECIMAL(28,9))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 9) AS mean_ndcg,
          MIN(ndcg) AS min_ndcg
        FROM nd$d)"""
    }.mkString(",\n")
    s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 20),
$variants,
      idcg AS (
        SELECT CAST(SUM(CAST(ROUND(1.0 / log2(CAST(i AS DOUBLE) + 1.0),
          9) AS DECIMAL(28,9))) AS DOUBLE) AS idcg
        FROM (SELECT unnest(range(1, 11)) AS i) r),
$per
      SELECT CAST(dim AS INT) AS dim, n_queries, mean_ndcg, min_ndcg
      FROM (SELECT * FROM a16 UNION ALL SELECT * FROM a32) u
      ORDER BY dim"""
  }

  /** q274's oracle: the q27 cosine CTE template instantiated per dim
    * variant (the dot/norm folds range only over the first d dims =
    * the slice), recall joined against the 64-dim anchor. */
  private[registry] def dimAblationOracle: String = {
    def dotSql(a: String, b: String, d: Int): String =
      s"""list_reduce(list_transform(range(1, ${d + 1}),
            i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
            (x, y) -> x + y)"""
    val variants = Seq(16, 32, 64).map { d =>
      s"""      s$d AS (
        SELECT q_id, e.vec_id,
          ${dotSql("q_emb", "e.embedding", d)}
          / sqrt(${dotSql("q_emb", "q_emb", d)}
            * ${dotSql("e.embedding", "e.embedding", d)}) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.q_id),
      t$d AS (
        SELECT q_id, vec_id FROM (
          SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS rn
          FROM s$d) z WHERE rn <= 10)"""
    }.mkString(",\n")
    val recalls = Seq(16, 32).map { d =>
      s"""      r$d AS (
        SELECT qq.q_id, COALESCE(i.cnt, 0) AS hits
        FROM (SELECT DISTINCT q_id FROM t64) qq
        LEFT JOIN (
          SELECT t$d.q_id, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM t$d JOIN t64 ON t64.q_id = t$d.q_id
            AND t64.vec_id = t$d.vec_id
          GROUP BY t$d.q_id) i ON i.q_id = qq.q_id),
      a$d AS (
        SELECT $d AS dim, CAST(COUNT(*) AS BIGINT) AS n_queries,
          CAST(SUM(hits) AS BIGINT) AS total_hits,
          CAST(MIN(hits) AS BIGINT) AS min_hits
        FROM r$d)"""
    }.mkString(",\n")
    s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id < 20),
$variants,
$recalls
      SELECT CAST(dim AS INT) AS dim, n_queries, total_hits,
        ROUND(CAST(total_hits AS DOUBLE)
          / CAST(n_queries * 10 AS DOUBLE), 9) AS mean_recall,
        ROUND(CAST(min_hits AS DOUBLE) / 10.0, 9) AS min_recall
      FROM (SELECT * FROM a16 UNION ALL SELECT * FROM a32) u
      ORDER BY dim"""
  }

  /** q275's oracle: the shared CC label chain plus the per-(lang, k)
    * effective-mass roll-up mirroring the Spark rounding discipline. */
  private[registry] def effectiveMixtureOracle: String =
    ccLabelCtes + """,
      tokl AS (
        SELECT doc_id, lang,
          CAST(len(string_split(trim(regexp_replace(lower(text),
            '\s+', ' ', 'g')), ' ')) AS BIGINT) AS tokens
        FROM documents),
      sizes AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS k
        FROM labels GROUP BY label),
      lab AS (
        SELECT t.lang, t.tokens, COALESCE(s.k, 1) AS k
        FROM tokl t
        LEFT JOIN labels l ON l.id = t.doc_id
        LEFT JOIN sizes s ON s.label = l.label),
      bylk AS (
        SELECT lang, k, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(tokens) AS BIGINT) AS tok
        FROM lab GROUP BY lang, k),
      pl AS (
        SELECT lang, CAST(SUM(n) AS BIGINT) AS n_docs,
          CAST(SUM(tok) AS BIGINT) AS raw_tokens,
          SUM(CAST(ROUND(CAST(tok AS DOUBLE) / CAST(k AS DOUBLE), 9)
            AS DECIMAL(28,9))) AS eff_dec
        FROM bylk GROUP BY lang),
      tt AS (SELECT CAST(SUM(raw_tokens) AS BIGINT) AS raw_total,
                    SUM(eff_dec) AS eff_total FROM pl)
      SELECT lang, n_docs, raw_tokens,
        ROUND(CAST(eff_dec AS DOUBLE), 9) AS eff_tokens,
        ROUND(CAST(raw_tokens AS DOUBLE) / CAST(raw_total AS DOUBLE), 9)
          AS raw_share,
        ROUND(CAST(eff_dec AS DOUBLE) / CAST(eff_total AS DOUBLE), 9)
          AS eff_share,
        ROUND(ROUND(CAST(eff_dec AS DOUBLE) / CAST(eff_total AS DOUBLE), 9)
          - ROUND(CAST(raw_tokens AS DOUBLE) / CAST(raw_total AS DOUBLE),
              9), 9) AS share_shift
      FROM pl CROSS JOIN tt ORDER BY lang"""

  /** q290's oracle: the exact all-pairs J ≥ 0.8 relation banded into
    * 0.05-wide cells, left-joined against the CC chain's verified
    * banded `edges` (= q25's pair set). */
  private[registry] def bandRecallOracle: String =
    ccLabelCtes + """,
      ex AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          ROUND(CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE)
            / CAST(len(list_distinct(a.shl || b.shl)) AS DOUBLE), 9)
            AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      exf AS (
        SELECT doc_a, doc_b,
          LEAST(CAST(floor(jaccard * 20.0) AS BIGINT), 19) AS band
        FROM ex WHERE jaccard >= 0.8),
      bd AS (SELECT doc_a, doc_b FROM edges)
      SELECT CAST(band AS DOUBLE) / 20.0 AS band_lo,
        CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(SUM(CASE WHEN bd.doc_a IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_found,
        ROUND(CAST(SUM(CASE WHEN bd.doc_a IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS recall
      FROM exf LEFT JOIN bd ON bd.doc_a = exf.doc_a
        AND bd.doc_b = exf.doc_b
      GROUP BY band ORDER BY band_lo"""

  /** q270's oracle: majority-split repair over the q69 labels. The
    * row_number tie-break (cnt desc, then train < val < test) mirrors
    * the Spark side's max(struct(cnt, prio, split)) argmax; the
    * post-repair cross-pair count recomputes from `edges`, the same
    * verified edge list the labels came from. */
  private[registry] val splitRepairOracle: String =
    ccLabelCtes + """,
      spl AS (
        SELECT doc_id,
          CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
               WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
               ELSE 'test' END AS split
        FROM documents),
      cs AS (
        SELECT l.label, s.split, CAST(count(*) AS BIGINT) AS cnt
        FROM labels l JOIN spl s ON l.id = s.doc_id
        GROUP BY l.label, s.split),
      maj AS (
        SELECT label, split AS split_after FROM (
          SELECT label, split,
            row_number() OVER (PARTITION BY label ORDER BY cnt DESC,
              CASE split WHEN 'train' THEN 0 WHEN 'val' THEN 1
                ELSE 2 END) AS rn
          FROM cs) t
        WHERE rn = 1),
      fin AS (
        SELECT s.doc_id, s.split AS split_before,
          COALESCE(m.split_after, s.split) AS split_after,
          l.label IS NOT NULL AS clustered
        FROM spl s
        LEFT JOIN labels l ON l.id = s.doc_id
        LEFT JOIN maj m ON l.label = m.label),
      xp AS (
        SELECT CAST(COALESCE(SUM(CASE WHEN a.split_after <>
            b.split_after THEN 1 ELSE 0 END), 0) AS BIGINT)
          AS cross_pairs_after
        FROM edges e
        JOIN fin a ON e.doc_a = a.doc_id
        JOIN fin b ON e.doc_b = b.doc_id)
      SELECT clustered, split_before, split_after,
        CAST(count(*) AS BIGINT) AS n_docs, xp.cross_pairs_after
      FROM fin CROSS JOIN xp
      GROUP BY clustered, split_before, split_after,
        xp.cross_pairs_after
      ORDER BY clustered, split_before, split_after"""

  /** q243's oracle: three GENERATED BPE rounds (the q150 template
    * discipline — a typo can't hide in hand-copied round blocks).
    * Each round: weighted adjacent-pair count over the current
    * vocabulary, argmax with the count-desc/left-asc/right-asc
    * tie-break, then the space-delimited replace whose left-to-right
    * non-overlapping scan both engines share. */
  /** Shared CTE chain for the BPE pair (q243 train / q267 encode):
    * word stream, symbolized vocabulary, and the three training
    * rounds (p_k pair counts, b_k argmax with the deterministic
    * tie-break, v_k merged vocabulary). */
  private[registry] def bpeCtes: String = {
    val rounds = (1 to 3).map { k =>
      s"""      p$k AS (
        SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
          SELECT freq,
            unnest(list_transform(range(1, len(a)), i -> a[i])) AS l,
            unnest(list_transform(range(1, len(a)), i -> a[i+1])) AS r
          FROM (SELECT string_split(trim(s), ' ') AS a, freq
                FROM v${k - 1}) t
          WHERE len(a) >= 2) q
        GROUP BY l, r),
      b$k AS (SELECT * FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
      v$k AS (SELECT replace(v${k - 1}.s,
                ' ' || b$k.l || ' ' || b$k.r || ' ',
                ' ' || b$k.l || b$k.r || ' ') AS s, freq
              FROM v${k - 1} CROSS JOIN b$k)"""
    }.mkString(",\n")
    s"""
      WITH wrd AS (
        SELECT unnest(string_split(trim(regexp_replace(lower(text),
          '\\s+', ' ', 'g')), ' ')) AS w
        FROM documents),
      v0 AS (
        SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' '
            AS s,
          CAST(COUNT(*) AS BIGINT) AS freq
        FROM wrd WHERE length(w) >= 1 GROUP BY w),
$rounds"""
  }

  private[registry] def bpeMergesOracle: String = s"""$bpeCtes
      SELECT CAST(mr AS INT) AS merge_round, l AS lsym, r AS rsym,
        cnt AS pair_count
      FROM (
        SELECT 1 AS mr, l, r, cnt FROM b1
        UNION ALL SELECT 2, l, r, cnt FROM b2
        UNION ALL SELECT 3, l, r, cnt FROM b3) u
      ORDER BY merge_round"""

  /** q267's oracle: replay the three learned merges over every word
    * occurrence (lang carried through), identical replace semantics
    * to the Spark encoder. */
  private[registry] def bpeEncodeOracle: String = s"""$bpeCtes,
      wl AS (
        SELECT lang, unnest(string_split(trim(regexp_replace(lower(text),
          '\\s+', ' ', 'g')), ' ')) AS w
        FROM documents),
      base AS (
        SELECT lang, w,
          ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
        FROM wl WHERE length(w) >= 1),
      e1 AS (SELECT lang, w, replace(base.s,
               ' ' || b1.l || ' ' || b1.r || ' ',
               ' ' || b1.l || b1.r || ' ') AS s
             FROM base CROSS JOIN b1),
      e2 AS (SELECT lang, w, replace(e1.s,
               ' ' || b2.l || ' ' || b2.r || ' ',
               ' ' || b2.l || b2.r || ' ') AS s
             FROM e1 CROSS JOIN b2),
      e3 AS (SELECT lang, w, replace(e2.s,
               ' ' || b3.l || ' ' || b3.r || ' ',
               ' ' || b3.l || b3.r || ' ') AS s
             FROM e2 CROSS JOIN b3)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(length(w)) AS BIGINT) AS symbols_before,
        CAST(SUM(len(string_split(trim(s), ' '))) AS BIGINT)
          AS symbols_after,
        CAST(SUM(length(w)) - SUM(len(string_split(trim(s), ' ')))
          AS BIGINT) AS merge_applications,
        ROUND(CAST(SUM(len(string_split(trim(s), ' '))) AS DOUBLE)
          / CAST(SUM(length(w)) AS DOUBLE), 9) AS compression
      FROM e3 GROUP BY lang ORDER BY lang"""

  /** q240's oracle: the three section oracles as verbatim subqueries,
    * tagged and column-aligned exactly like the Spark union. */
  private[registry] def roundReportOracle: String = s"""
      SELECT * FROM (
        SELECT 'attrition' AS section, CAST(stage AS BIGINT) AS seq,
          gate AS key, n_entering AS n_a, n_dropped AS n_b,
          n_surviving AS n_c,
          ROUND(CAST(n_surviving AS DOUBLE) / CAST(n_entering AS DOUBLE),
            9) AS metric
        FROM ($curationPipelineOracle)
        UNION ALL
        SELECT 'shard', CAST(shard AS BIGINT), CAST(shard AS VARCHAR),
          n_docs, n_tokens, CAST(NULL AS BIGINT), ROUND(balance, 9)
        FROM ($shardManifestOracle)
        UNION ALL
        SELECT 'downweight', cluster_size, CAST(cluster_size AS VARCHAR),
          n_docs, tokens_total, tokens_keep_one,
          ROUND(tokens_effective, 9)
        FROM ($clusterDownweightOracle))
      ORDER BY section, seq"""

  /** q150's oracle: the shared MinHash edge CTEs plus 10 GENERATED
    * fixed-point iterations — one template, so a typo can't hide in
    * hand-copied CTE blocks (integer div keeps every step exact). */
  private[registry] def q150PageRankOracle: String = {
    val iters = (1 to 10).map { k =>
      s"""      it$k AS (
        SELECT n.id, CAST(150000000000
          + (85 * COALESCE(SUM(p.units // d.outdeg), 0)) // 100
          AS BIGINT) AS units
        FROM nodes n
        LEFT JOIN sym e ON e.dst = n.id
        LEFT JOIN it${k - 1} p ON p.id = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY n.id)"""
    }.mkString(",\n")
    s"""
      WITH RECURSIVE words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
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
      deg AS (SELECT src, COUNT(*) AS outdeg FROM sym GROUP BY src),
      nodes AS (SELECT DISTINCT src AS id FROM sym),
      it0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS units
              FROM nodes),
$iters
      SELECT id AS doc_id, units AS rank_units
      FROM it10
      ORDER BY rank_units DESC, doc_id
      LIMIT 50"""
  }

  /** Shared zone-map manifest derivation (q308 / q313): the same
    * morton curve spelled the same div/mod way as the Spark side, the
    * same 64-row file assignment (ROW_NUMBER over the identical total
    * order == globalIndex's rank), per-file min/max for both filter
    * dimensions, under BOTH layouts (z-order and leading-column
    * linear). */
  private[registry] def zmapManifestCtes: String = s"""
      rpf AS (
        SELECT GREATEST(64, (COUNT(*) + 63) // 64) AS r FROM part),
      base AS (
        SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
          GREATEST(LEAST(CAST(FLOOR((p_retailprice - 900) / 2)
            AS BIGINT), 63), 0) AS y,
          p_retailprice
        FROM part),
      zv AS (
        SELECT p_partkey, x, y,
          ${(0 until 6).map { i =>
            val p = 1L << i
            s"((x // $p) % 2) * ${1L << (2 * i)} + " +
              s"((y // $p) % 2) * ${1L << (2 * i + 1)}"
          }.mkString(" + ")} AS zm
        FROM base),
      rz AS (
        SELECT p_partkey, x, y,
          (ROW_NUMBER() OVER (ORDER BY zm, p_partkey) - 1)
            // (SELECT r FROM rpf) AS f
        FROM zv),
      mz AS (
        SELECT f, MIN(x) AS min_x, MAX(x) AS max_x,
          MIN(y) AS min_y, MAX(y) AS max_y
        FROM rz GROUP BY f),
      rl AS (
        SELECT x, y,
          (ROW_NUMBER() OVER (ORDER BY x, p_partkey) - 1)
            // (SELECT r FROM rpf) AS f
        FROM base),
      ml AS (
        SELECT f, MIN(x) AS min_x, MAX(x) AS max_x,
          MIN(y) AS min_y, MAX(y) AS max_y
        FROM rl GROUP BY f)"""

  private[registry] def zmapSkipRatioOracle: String = s"""
      WITH $zmapManifestCtes,
      m AS (
        SELECT 'zorder' AS layout, * FROM mz
        UNION ALL
        SELECT 'linear' AS layout, * FROM ml),
      boxes(box_id, box_name, x_lo, x_hi, y_lo, y_hi) AS (VALUES
        (1, 'slice_x', 15, 25, 0, 63),
        (2, 'slice_y', 0, 63, 3, 8),
        (3, 'box_2d', 15, 25, 3, 8),
        (4, 'quadrant_lo', 0, 24, 0, 24),
        (5, 'quadrant_hi', 25, 63, 25, 63),
        (6, 'point', 20, 20, 5, 5))
      SELECT box_id, box_name, layout,
        CAST(COUNT(*) AS BIGINT) AS files_total,
        CAST(SUM(CASE WHEN max_x >= x_lo AND min_x <= x_hi
          AND max_y >= y_lo AND min_y <= y_hi THEN 1 ELSE 0 END)
          AS BIGINT) AS files_scanned,
        (CAST(100 AS DOUBLE) *
          (CAST(COUNT(*) AS BIGINT) -
           CAST(SUM(CASE WHEN max_x >= x_lo AND min_x <= x_hi
             AND max_y >= y_lo AND min_y <= y_hi THEN 1 ELSE 0 END)
             AS BIGINT)))
          / CAST(COUNT(*) AS BIGINT) AS skip_pct
      FROM m CROSS JOIN boxes
      GROUP BY box_id, box_name, layout
      ORDER BY box_id, layout"""

  /** q336: the MERGED layout (standing z-order + batch files offset
    * past it) re-derived from first principles — same morton spelling,
    * same rows-per-file (a table property fixed at creation, from the
    * STANDING count), batch ROW_NUMBER offset by the standing file
    * count; box and point probes over the merged metadata; the two
    * rebuild-equality certificates pinned TRUE (an incremental row
    * that drifts from the rebuild flips them and hash-fails). */
  private[registry] def incrementalLayoutOracle: String = {
    val probes = Seq(2654435761L, 2246822519L, 3266489917L)
    val morton = (0 until 6).map { i =>
      val p = 1L << i
      s"((x // $p) % 2) * ${1L << (2 * i)} + " +
        s"((y // $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    def posList(key: String) = probes.map(a =>
      s"($key * $a) % (SELECT m FROM mw)").mkString("[", ",\n          ", "]")
    s"""
      WITH rpfi AS (
        SELECT GREATEST(64, (COUNT(*) + 63) // 64) AS r FROM part
        WHERE p_partkey % 10 <> 7),
      basei AS (
        SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
          GREATEST(LEAST(CAST(FLOOR((p_retailprice - 900) / 2)
            AS BIGINT), 63), 0) AS y,
          p_retailprice
        FROM part),
      rzs AS (
        SELECT p_partkey, x, y, p_retailprice,
          (ROW_NUMBER() OVER (ORDER BY zm, p_partkey) - 1)
            // (SELECT r FROM rpfi) AS f
        FROM (SELECT *, $morton AS zm FROM basei
              WHERE p_partkey % 10 <> 7)),
      nstd AS (SELECT COUNT(DISTINCT f) AS n FROM rzs),
      rzb AS (
        SELECT p_partkey, x, y, p_retailprice,
          (ROW_NUMBER() OVER (ORDER BY zm, p_partkey) - 1)
            // (SELECT r FROM rpfi) + (SELECT n FROM nstd) AS f
        FROM (SELECT *, $morton AS zm FROM basei
              WHERE p_partkey % 10 = 7)),
      rza AS (SELECT * FROM rzs UNION ALL SELECT * FROM rzb),
      mza AS (
        SELECT f, MIN(x) AS min_x, MAX(x) AS max_x,
          MIN(y) AS min_y, MAX(y) AS max_y
        FROM rza GROUP BY f),
      boxf AS (
        SELECT f FROM mza
        WHERE max_x >= 15 AND min_x <= 25 AND max_y >= 3
          AND min_y <= 8),
      boxr AS (
        SELECT COUNT(*) AS n,
          SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS s
        FROM rza
        WHERE x BETWEEN 15 AND 25 AND y BETWEEN 3 AND 8),
      mw AS (
        SELECT GREATEST(1, ((SELECT r FROM rpfi) * 10 + 31) // 32) * 32
          AS m),
      pos AS (
        SELECT f, unnest(${posList("p_partkey")}) AS p
        FROM rza),
      bl AS (
        SELECT f, p // 32 AS word,
          bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
        FROM pos GROUP BY f, word),
      pbp AS (
        SELECT DISTINCT p // 32 AS word,
          CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER) AS mask
        FROM (SELECT unnest(${posList("97")}) AS p)),
      sel AS (
        SELECT bl.f FROM bl JOIN pbp ON bl.word = pbp.word
          AND (bl.bits & pbp.mask) <> 0
        GROUP BY bl.f
        HAVING COUNT(*) = (SELECT COUNT(*) FROM pbp)),
      keyr AS (
        SELECT COUNT(*) AS n,
          SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS s
        FROM basei WHERE p_partkey = 97)
      SELECT
        (SELECT CAST(n AS BIGINT) FROM nstd) AS files_standing,
        (SELECT CAST(COUNT(DISTINCT f) AS BIGINT) FROM rzb)
          AS files_batch,
        TRUE AS manifest_matches_rebuild,
        TRUE AS bloom_matches_rebuild,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM boxf)
          AS box_files_scanned,
        (SELECT n FROM boxr) AS box_n_rows,
        CAST((SELECT s FROM boxr) AS DOUBLE) AS box_sum_retail,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM sel)
          AS key_files_selected,
        (SELECT n FROM keyr) AS key_n_rows,
        CAST((SELECT s FROM keyr) AS DOUBLE) AS key_sum_retail"""
  }

  /** q341: the post-rewrite layout re-derived from first principles —
    * the before-files from the arrival-hash cut at half size, the
    * rewritten pack (files < 32) re-sorted along the shared Morton
    * spelling and recut at the full target size under offset ids, the
    * merged manifest and bloom over (kept ∪ new) files; the two
    * rebuild-equality certificates pinned TRUE (a retire that misses
    * a row or an increment that re-reads standing files drifts the
    * maintained metadata and flips them). */
  private[registry] def rewriteLayoutOracle: String = {
    val probes = Seq(2654435761L, 2246822519L, 3266489917L)
    val morton = (0 until 6).map { i =>
      val p = 1L << i
      s"((x // $p) % 2) * ${1L << (2 * i)} + " +
        s"((y // $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    def posList(key: String) = probes.map(a =>
      s"($key * $a) % (SELECT m FROM mw)").mkString("[", ",\n          ", "]")
    s"""
      WITH rpf AS (
        SELECT GREATEST(64, (COUNT(*) + 63) // 64) AS r FROM part),
      rps AS (SELECT GREATEST(1, (SELECT r FROM rpf) // 2) AS r),
      base AS (
        SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
          GREATEST(LEAST(CAST(FLOOR((p_retailprice - 900) / 2)
            AS BIGINT), 63), 0) AS y,
          p_retailprice
        FROM part),
      sb AS (
        SELECT p_partkey, x, y, p_retailprice,
          (ROW_NUMBER() OVER (
             ORDER BY (p_partkey * 2654435761) % 1000003, p_partkey) - 1)
            // (SELECT r FROM rps) AS f
        FROM base),
      rew AS (SELECT * FROM sb WHERE f < 32),
      zr AS (
        SELECT p_partkey, x, y, p_retailprice,
          100000 + (ROW_NUMBER() OVER (ORDER BY zm, p_partkey) - 1)
            // (SELECT r FROM rpf) AS f
        FROM (SELECT *, $morton AS zm FROM rew)),
      merged AS (
        SELECT p_partkey, x, y, p_retailprice, f FROM sb WHERE f >= 32
        UNION ALL
        SELECT p_partkey, x, y, p_retailprice, f FROM zr),
      mm AS (
        SELECT f, MIN(x) AS min_x, MAX(x) AS max_x,
          MIN(y) AS min_y, MAX(y) AS max_y
        FROM merged GROUP BY f),
      boxr AS (
        SELECT COUNT(*) AS n,
          SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS s
        FROM base
        WHERE x BETWEEN 15 AND 25 AND y BETWEEN 3 AND 8),
      mw AS (
        SELECT GREATEST(1, ((SELECT r FROM rpf) * 10 + 31) // 32) * 32
          AS m),
      pos AS (
        SELECT f, unnest(${posList("p_partkey")}) AS p
        FROM merged),
      bl AS (
        SELECT f, p // 32 AS word,
          bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
        FROM pos GROUP BY f, word),
      pbp AS (
        SELECT DISTINCT p // 32 AS word,
          CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER) AS mask
        FROM (SELECT unnest(${posList("97")}) AS p)),
      sel AS (
        SELECT bl.f FROM bl JOIN pbp ON bl.word = pbp.word
          AND (bl.bits & pbp.mask) <> 0
        GROUP BY bl.f
        HAVING COUNT(*) = (SELECT COUNT(*) FROM pbp)),
      keyr AS (
        SELECT COUNT(*) AS n,
          SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS s
        FROM base WHERE p_partkey = 97)
      SELECT
        (SELECT CAST(COUNT(DISTINCT f) AS BIGINT) FROM sb)
          AS files_before,
        (SELECT CAST(COUNT(DISTINCT f) AS BIGINT) FROM rew)
          AS files_rewritten,
        (SELECT CAST(COUNT(DISTINCT f) AS BIGINT) FROM zr)
          AS files_new,
        TRUE AS manifest_matches_rebuild,
        TRUE AS bloom_matches_rebuild,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM mm
         WHERE max_x >= 15 AND min_x <= 25
           AND max_y >= 3 AND min_y <= 8) AS box_files_scanned,
        (SELECT n FROM boxr) AS box_n_rows,
        CAST((SELECT s FROM boxr) AS DOUBLE) AS box_sum_retail,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM sel)
          AS key_files_selected,
        (SELECT n FROM keyr) AS key_n_rows,
        CAST((SELECT s FROM keyr) AS DOUBLE) AS key_sum_retail"""
  }

  /** q331: the whole bloom filter re-derived from integer
    * arithmetic — file assignment from the shared z-curve CTEs, bit
    * positions from the same three multipliers mod the same width,
    * per-file words by bit_or, the candidate set by the same
    * all-bits-set rule — so a wrong bit position, a wrong width, or
    * a missed candidate moves `files_selected` and hash-fails; the
    * found row itself comes from the base predicate. */
  private[registry] def bloomPointLookupOracle: String = {
    val probes = Seq(2654435761L, 2246822519L, 3266489917L)
    def posList(key: String) = probes.map(a =>
      s"($key * $a) % (SELECT m FROM mw)").mkString("[", ",\n          ", "]")
    s"""
      WITH $zmapManifestCtes,
      mw AS (
        SELECT GREATEST(1, ((SELECT r FROM rpf) * 10 + 31) // 32) * 32
          AS m),
      pos AS (
        SELECT f, unnest(${posList("p_partkey")}) AS p
        FROM rz),
      bl AS (
        SELECT f, p // 32 AS word,
          bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
        FROM pos GROUP BY f, word),
      pbp AS (
        SELECT DISTINCT p // 32 AS word,
          CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER) AS mask
        FROM (SELECT unnest(${posList("97")}) AS p)),
      sel AS (
        SELECT bl.f FROM bl JOIN pbp ON bl.word = pbp.word
          AND (bl.bits & pbp.mask) <> 0
        GROUP BY bl.f
        HAVING COUNT(*) = (SELECT COUNT(*) FROM pbp)),
      act AS (SELECT COUNT(DISTINCT f) AS nf FROM rz WHERE p_partkey = 97),
      res AS (
        SELECT COUNT(*) AS n_rows,
          CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_retail
        FROM base WHERE p_partkey = 97)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM mz) AS files_total,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM sel) AS files_selected,
        (SELECT nf FROM act) AS files_with_key,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM sel) - (SELECT nf FROM act)
          AS fp_files,
        CAST((SELECT COUNT(*) FROM sel) - (SELECT nf FROM act) AS DOUBLE)
          / CAST((SELECT COUNT(*) FROM mz) AS DOUBLE) AS fp_rate,
        n_rows, sum_retail
      FROM res"""
  }

  /** q332: both layouts re-derived — the before manifest from the
    * arrival-order (p_partkey) cut at half file size, the after
    * manifest from the pack-then-z-sort-then-recut arithmetic
    * (pack = small-file id // 32 BY VALUE, within-pack rank over the
    * shared Morton key); the probe slice is layout-independent and
    * counted from the real pruned reads on the Spark side. */
  private[registry] def compactClusterOracle: String = s"""
      WITH $zmapManifestCtes,
      rps AS (SELECT GREATEST(1, (SELECT r FROM rpf) // 2) AS r),
      sb AS (
        SELECT p_partkey, x, y,
          (ROW_NUMBER() OVER (
             ORDER BY (p_partkey * 2654435761) % 1000003, p_partkey) - 1)
            // (SELECT r FROM rps) AS sf
        FROM base),
      mb AS (
        SELECT sf, MIN(x) AS min_x, MAX(x) AS max_x,
          MIN(y) AS min_y, MAX(y) AS max_y
        FROM sb GROUP BY sf),
      pr AS (
        SELECT s.x, s.y,
          (s.sf // 32) * 100000 +
          (ROW_NUMBER() OVER (PARTITION BY s.sf // 32
             ORDER BY z.zm, s.p_partkey) - 1)
            // (SELECT r FROM rpf) AS f
        FROM sb s JOIN zv z ON s.p_partkey = z.p_partkey),
      ma AS (
        SELECT f, MIN(x) AS min_x, MAX(x) AS max_x,
          MIN(y) AS min_y, MAX(y) AS max_y
        FROM pr GROUP BY f),
      agg AS (
        SELECT COUNT(*) AS n_parts,
          CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_retail
        FROM base
        WHERE x BETWEEN 15 AND 25 AND y BETWEEN 3 AND 8)
      SELECT 'after' AS phase,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM ma) AS files_total,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM ma
         WHERE max_x >= 15 AND min_x <= 25
           AND max_y >= 3 AND min_y <= 8) AS files_scanned,
        n_parts, sum_retail
      FROM agg
      UNION ALL
      SELECT 'before',
        (SELECT CAST(COUNT(*) AS BIGINT) FROM mb),
        (SELECT CAST(COUNT(*) AS BIGINT) FROM mb
         WHERE max_x >= 15 AND min_x <= 25
           AND max_y >= 3 AND min_y <= 8),
        n_parts, sum_retail
      FROM agg
      ORDER BY phase"""

  /** q313: the slice aggregate is layout-independent (content
    * preservation — equal across phases in the hash); only the file
    * counts move, re-derived per layout from the shared CTEs. */
  private[registry] def zmapReclusterOracle: String = s"""
      WITH $zmapManifestCtes,
      agg AS (
        SELECT COUNT(*) AS n_parts,
          CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_retail
        FROM base
        WHERE x BETWEEN 15 AND 25 AND y BETWEEN 3 AND 8)
      SELECT 'after' AS phase,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM mz) AS files_total,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM mz
         WHERE max_x >= 15 AND min_x <= 25
           AND max_y >= 3 AND min_y <= 8) AS files_scanned,
        n_parts, sum_retail
      FROM agg
      UNION ALL
      SELECT 'before',
        (SELECT CAST(COUNT(*) AS BIGINT) FROM ml),
        (SELECT CAST(COUNT(*) AS BIGINT) FROM ml
         WHERE max_x >= 15 AND min_x <= 25
           AND max_y >= 3 AND min_y <= 8),
        n_parts, sum_retail
      FROM agg
      ORDER BY phase"""

  /** q311: three synchronous label-propagation rounds unrolled — the
    * edge relation is q68's exact n-gram-Jaccard join (same df-capped
    * candidate CTE, same ≥ 0.6 verification) carrying the INTEGER
    * shared-shingle count as evidence weight; per round each non-seed
    * doc takes the argmax-evidence neighbor label (tie-break label
    * asc) or keeps its previous one; seeds are pinned. */
  private[registry] def labelPropOracle: String = {
    val rounds = (1 to 3).map { k =>
      s"""      sc$k AS (
        SELECT e.a, l.label AS nl, SUM(e.w) AS s
        FROM e JOIN lab${k - 1} l ON e.b = l.doc_id
        WHERE l.label IS NOT NULL
        GROUP BY e.a, l.label),
      b$k AS (
        SELECT a, nl FROM (
          SELECT a, nl,
            ROW_NUMBER() OVER (PARTITION BY a ORDER BY s DESC, nl) AS rn
          FROM sc$k) WHERE rn = 1),
      lab$k AS (
        SELECT d.doc_id,
          CASE WHEN d.doc_id % 5 = 0 THEN d.lang
               ELSE COALESCE(b.nl, p.label) END AS label
        FROM documents d
        LEFT JOIN b$k b ON b.a = d.doc_id
        JOIN lab${k - 1} p ON p.doc_id = d.doc_id)"""
    }.mkString(",\n")
    s"""
      WITH words AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
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
        JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id),
      pe AS (
        SELECT doc_a, doc_b,
          CAST(len(list_intersect(x.shl, y.shl)) AS BIGINT) AS w
        FROM cand
        JOIN sh x ON x.doc_id = doc_a
        JOIN sh y ON y.doc_id = doc_b
        WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE)
            / CAST(len(list_distinct(x.shl || y.shl)) AS DOUBLE) >= 0.6),
      e AS (SELECT doc_a AS a, doc_b AS b, w FROM pe
            UNION ALL SELECT doc_b, doc_a, w FROM pe),
      lab0 AS (
        SELECT doc_id,
          CASE WHEN doc_id % 5 = 0 THEN lang END AS label
        FROM documents),
$rounds
      SELECT d.doc_id, l.label,
        CASE WHEN d.doc_id % 5 = 0 THEN 'seed'
             WHEN l.label IS NOT NULL THEN 'prop'
             ELSE 'none' END AS origin
      FROM documents d
      JOIN lab3 l ON l.doc_id = d.doc_id
      ORDER BY d.doc_id"""
  }
}
