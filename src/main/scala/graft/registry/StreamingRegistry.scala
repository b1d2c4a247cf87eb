package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.streaming._
import graft.registry.OracleDefs._

/** Streaming family: catalog entries + DuckDB oracle SQL
  * (mechanical split of SparkEntry; content verbatim). */
object StreamingRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_stream_windows"   -> (StreamingWindows.q39StreamWindows _),
    "q54_stream_stream_join" -> (StreamJoin.q54StreamStreamJoin _),
    "q81_stream_dedup"     -> (StreamDedup.q81StreamDedup _),
    "q82_stream_sessions"  -> (StreamSessions.q82StreamSessions _),
    "q83_stream_sink"      -> (StreamSink.q83StreamSinkRoundtrip _),
    "q116_stream_multibatch" -> (StreamingWindows.q116StreamMultibatch _),
    "q135_transform_with_state" ->
      (graft.streaming.StreamTransformState.q135TransformWithState _),
    "q136_stream_append_windows" ->
      (StreamingWindows.q136StreamAppendWindows _),
    "q139_stream_static_enrich" ->
      (graft.streaming.StreamJoin.q139StreamStaticEnrich _),
    "q149_tws_timers" ->
      (graft.streaming.StreamTransformState.q149TwsTimers _),
    "q165_stream_update_windows" ->
      (StreamingWindows.q165StreamUpdateWindows _),
    "q184_stream_outer_join" ->
      (graft.streaming.StreamJoin.q184StreamOuterJoin _),
    "q197_stream_recovery" ->
      (graft.streaming.StreamRecovery.q197StreamRecovery _),
    "q217_stream_index_dedup" ->
      (graft.streaming.StreamDedup.q217StreamIndexDedup _),
    "q237_stream_gate_bounded" ->
      (graft.streaming.StreamDedup.q237StreamGateBounded _),
    "q304_stream_ivf_gate" ->
      (graft.streaming.StreamVectorGate.q304StreamIvfGate _),
    "q314_stream_commits" ->
      (graft.streaming.StreamSnapshotIngest.q314StreamCommitIngest _),
    "q358_stream_rlo_sink" ->
      (graft.streaming.StreamRloSink.q358StreamRloSink _),
    "q328_stream_mv_tail" ->
      (graft.streaming.StreamChangelogTail.q328StreamMvMaintenance _),
    "q337_stream_cdc_upsert" ->
      (graft.streaming.StreamCdcUpsert.q337StreamCdcUpsert _),
    "q345_stream_cdf_consumer" ->
      (graft.streaming.StreamCdfConsumer.q345StreamCdfConsumer _),
  )

  val oracleSql: Map[String, String] = Map(
    // every MV version from the tick predicates: row counts and
    // price sums are q337's version arithmetic; n_keys drops only
    // where a DELETED mod class removes a customer's last order
    // (updates and inserts preserve/duplicate custkeys of surviving
    // base rows) — a consumer that drops a change row, folds a
    // pre-image with the wrong sign, or reads the wrong segments
    // moves one of these and hash-fails
    "q345_stream_cdf_consumer" -> """
      WITH agg AS (
        SELECT COUNT(*) AS n,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
          COUNT(DISTINCT o_custkey) AS k_all,
          COUNT(DISTINCT o_custkey)
            FILTER (WHERE o_orderkey % 100 <> 13) AS k_v3,
          COUNT(DISTINCT o_custkey)
            FILTER (WHERE o_orderkey % 100 NOT IN (13, 19)) AS k_v4,
          COUNT(*) FILTER (WHERE o_orderkey % 100 = 11) AS c11,
          SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 11) AS s11,
          SUM(CAST(o_totalprice + 1000.0 AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 11) AS s11u,
          COUNT(*) FILTER (WHERE o_orderkey % 100 = 13) AS c13,
          SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 13) AS s13,
          SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 17) AS s17,
          SUM(CAST(o_totalprice + 2000.0 AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 17) AS s17u,
          COUNT(*) FILTER (WHERE o_orderkey % 100 = 19) AS c19,
          SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 19) AS s19,
          COUNT(*) FILTER (WHERE o_orderkey % 100 = 51) AS c51,
          SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 51) AS s51,
          COUNT(*) FILTER (WHERE o_orderkey % 100 = 53) AS c53,
          SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 53) AS s53
        FROM orders)
      SELECT CAST(2 AS INTEGER) AS version, k_all AS n_keys,
        n + c51 AS n_orders,
        CAST(s - s11 + s11u + s51 AS DOUBLE) AS sum_price
      FROM agg
      UNION ALL
      SELECT 3, k_v3, n + c51 + c53 - c13,
        CAST(s - s11 + s11u + s51 + s53 - s13 AS DOUBLE)
      FROM agg
      UNION ALL
      SELECT 4, k_v4, n + c51 + c53 - c13 - c19,
        CAST(s - s11 + s11u - s17 + s17u + s51 + s53 - s13 - s19
          AS DOUBLE)
      FROM agg
      ORDER BY version""",
    // every version boundary from the tick predicates (the shared
    // CdcUpsert.Ticks definition): t0 inserts %100=51 (+100M) and
    // updates %100=11 (+1000.0), t1 inserts %100=53 (+200M) and
    // deletes %100=13, t2 updates %100=17 (+2000.0) and deletes
    // %100=19; every update/delete adds its pre-image key to the
    // scoped artifact count. A dropped upsert, an unapplied delete,
    // a double-applied replay, or a mis-routed artifact moves a
    // count or a sum and hash-fails
    "q337_stream_cdc_upsert" -> """
      WITH agg AS (
        SELECT COUNT(*) AS n,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
          COUNT(*) FILTER (WHERE o_orderkey % 100 = 11) AS c11,
          SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 11) AS s11,
          SUM(CAST(o_totalprice + 1000.0 AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 11) AS s11u,
          COUNT(*) FILTER (WHERE o_orderkey % 100 = 13) AS c13,
          SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 13) AS s13,
          COUNT(*) FILTER (WHERE o_orderkey % 100 = 17) AS c17,
          SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 17) AS s17,
          SUM(CAST(o_totalprice + 2000.0 AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 17) AS s17u,
          COUNT(*) FILTER (WHERE o_orderkey % 100 = 19) AS c19,
          SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 19) AS s19,
          COUNT(*) FILTER (WHERE o_orderkey % 100 = 51) AS c51,
          SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 51) AS s51,
          COUNT(*) FILTER (WHERE o_orderkey % 100 = 53) AS c53,
          SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderkey % 100 = 53) AS s53
        FROM orders)
      SELECT CAST(1 AS INTEGER) AS version, n AS n_rows,
        CAST(s AS DOUBLE) AS sum_price,
        CAST(0 AS BIGINT) AS n_live_deletes
      FROM agg
      UNION ALL
      SELECT 2, n + c51, CAST(s - s11 + s11u + s51 AS DOUBLE), c11
      FROM agg
      UNION ALL
      SELECT 3, n + c51 + c53 - c13,
        CAST(s - s11 + s11u + s51 + s53 - s13 AS DOUBLE), c11 + c13
      FROM agg
      UNION ALL
      SELECT 4, n + c51 + c53 - c13 - c19,
        CAST(s - s11 + s11u - s17 + s17u + s51 + s53 - s13 - s19
          AS DOUBLE),
        c11 + c13 + c17 + c19
      FROM agg
      ORDER BY version""",
    // every MV version from the version predicates: v1 = the
    // pre-append prefix, v2 = everything, v3 = post-retention — a
    // dropped delta, a double-applied replay, or a refresh that read
    // the wrong segments moves a total and hash-fails
    "q328_stream_mv_tail" -> """
      SELECT v AS version, COUNT(DISTINCT o_custkey) AS n_keys,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM orders CROSS JOIN (SELECT unnest([1, 2, 3]) AS v) t
      WHERE (v = 1 AND o_orderdate < TIMESTAMP '1999-01-01')
         OR v = 2
         OR (v = 3 AND o_orderdate >= TIMESTAMP '1996-01-01')
      GROUP BY v
      ORDER BY version""",
    // version v = arrival ticks 0..v-1 by the staged-commit contract
    // (batch k ingests the o_orderkey%4==k slice as commit b<k>)
    "q314_stream_commits" -> """
      SELECT v AS version, COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price,
        MIN(o_orderkey) AS min_okey, MAX(o_orderkey) AS max_okey
      FROM orders CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS v) t
      WHERE o_orderkey % 4 < v
      GROUP BY v
      ORDER BY version""",
    "q39_stream_windows" -> """
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",
    "q54_stream_stream_join" -> """
      WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts,
                        event_id AS click_id
                 FROM events WHERE event_type = 'click'),
      p AS (SELECT user_id AS p_user_id, CAST(ts AS TIMESTAMP) AS buy_ts,
                   event_id AS buy_id
            FROM events WHERE event_type = 'purchase')
      SELECT click_id, buy_id, user_id, click_ts, buy_ts
      FROM c JOIN p ON user_id = p_user_id
        AND buy_ts >= click_ts
        AND buy_ts <= click_ts + INTERVAL 10 MINUTE
      ORDER BY click_id, buy_id""",
    "q81_stream_dedup" -> """
      SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ',
        'g'))) AS fp
      FROM documents
      ORDER BY fp""",

    // sessions CLOSED during the AvailableNow drain: every non-final
    // session per user (closed inline by gap exceedance) plus final
    // sessions old enough that the post-drain watermark (max_ts - 30m
    // delay) passed last_event + 30m gap and fired the event-time
    // timeout. Validated as an exact set match against the stream.
    // identical closed-session set as q82 — the state-v2 timer
    // path must reproduce the flatMapGroupsWithState semantics
    "q149_tws_timers" -> """
      WITH ordered AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
          lag(CAST(ts AS TIMESTAMP)) OVER (
            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
            AS prev_ts
        FROM events),
      flagged AS (
        SELECT user_id, event_id, tsx,
          CASE WHEN prev_ts IS NULL
                    OR epoch_us(tsx) - epoch_us(prev_ts) > 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM ordered),
      sess AS (
        SELECT user_id, tsx,
          SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY tsx, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged),
      agg AS (
        SELECT user_id, sid, COUNT(*) AS n_events,
          epoch_us(MIN(tsx)) AS session_start_us,
          epoch_us(MAX(tsx)) AS last_us,
          CAST(epoch_us(MAX(tsx)) - epoch_us(MIN(tsx)) AS DOUBLE)
            / 1000000.0 AS duration_sec,
          sid = MAX(sid) OVER (PARTITION BY user_id) AS is_last
        FROM sess GROUP BY user_id, sid),
      mx AS (SELECT epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS m FROM events)
      SELECT user_id, session_start_us, n_events, duration_sec
      FROM agg, mx
      WHERE (NOT is_last)
         OR ((last_us + 1800000000) // 1000 < (m // 1000) - 1800000)
      ORDER BY user_id, session_start_us""",
    "q82_stream_sessions" -> """
      WITH ordered AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
          lag(CAST(ts AS TIMESTAMP)) OVER (
            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
            AS prev_ts
        FROM events),
      flagged AS (
        SELECT user_id, event_id, tsx,
          CASE WHEN prev_ts IS NULL
                    OR epoch_us(tsx) - epoch_us(prev_ts) > 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM ordered),
      sess AS (
        SELECT user_id, tsx,
          SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY tsx, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged),
      agg AS (
        SELECT user_id, sid, COUNT(*) AS n_events,
          epoch_us(MIN(tsx)) AS session_start_us,
          epoch_us(MAX(tsx)) AS last_us,
          CAST(epoch_us(MAX(tsx)) - epoch_us(MIN(tsx)) AS DOUBLE)
            / 1000000.0 AS duration_sec,
          sid = MAX(sid) OVER (PARTITION BY user_id) AS is_last
        FROM sess GROUP BY user_id, sid),
      mx AS (SELECT epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS m FROM events)
      SELECT user_id, session_start_us, n_events, duration_sec
      FROM agg, mx
      WHERE (NOT is_last)
         OR ((last_us + 1800000000) // 1000 < (m // 1000) - 1800000)
      ORDER BY user_id, session_start_us""",

    // foreachBatch parquet landing must equal the batch window counts
    "q83_stream_sink" -> """
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    // oracle on the ORIGINAL parquet: the staged extract→transform→
    // load cycle (latest-file pick included) must reproduce it
    "q116_stream_multibatch" -> """
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",
    "q135_transform_with_state" -> """
      SELECT user_id, COUNT(*) AS n_events,
        MAX(event_id) AS max_event_id
      FROM events
      GROUP BY user_id
      ORDER BY user_id""",

    // append mode emits exactly the windows the final watermark
    // (global max event time - 10 min) has passed: end <= watermark
    "q136_stream_append_windows" -> """
      WITH wm AS (
        SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 10 MINUTE AS w
        FROM events)
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events
      FROM events, wm
      WHERE time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
              + INTERVAL 5 MINUTE <= w
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    // defaults recomputed explicitly: partial INSERT fills both,
    // VALUES(..., DEFAULT, 5) fills only status
    "q139_stream_static_enrich" -> """
      SELECT n_name, event_type, COUNT(*) AS n_events
      FROM events JOIN nation ON user_id % 25 = n_nationkey
      GROUP BY 1, 2
      ORDER BY 1, 2""",

    // the stubs have closed forms on byte counts: resize = ceil(n/2),
    // frames = min(64, ceil(n / 4096)); payload bytes = strlen(text)
    "q165_stream_update_windows" -> """
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    // boolean folds are associative: FILTER-style aggregates mirror
    "q184_stream_outer_join" -> """
      WITH c AS (
        SELECT event_id AS click_id, user_id,
          CAST(ts AS TIMESTAMP) AS click_ts
        FROM events WHERE event_type = 'click'),
      p AS (
        SELECT event_id AS buy_id, user_id AS p_user,
          CAST(ts AS TIMESTAMP) AS buy_ts
        FROM events WHERE event_type = 'purchase'),
      wm AS (
        SELECT least(
          (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events
            WHERE event_type = 'click'),
          (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events
            WHERE event_type = 'purchase')) - INTERVAL 30 MINUTE AS w),
      matched AS (
        SELECT c.click_id, c.user_id, c.click_ts, p.buy_id, p.buy_ts
        FROM c JOIN p ON c.user_id = p.p_user
          AND p.buy_ts >= c.click_ts
          AND p.buy_ts <= c.click_ts + INTERVAL 10 MINUTE),
      unmatched AS (
        SELECT c.click_id, c.user_id, c.click_ts,
          CAST(NULL AS BIGINT) AS buy_id,
          CAST(NULL AS TIMESTAMP) AS buy_ts
        FROM c
        WHERE NOT EXISTS (SELECT 1 FROM p
            WHERE p.p_user = c.user_id AND p.buy_ts >= c.click_ts
              AND p.buy_ts <= c.click_ts + INTERVAL 10 MINUTE)
          AND c.click_ts + INTERVAL 10 MINUTE < (SELECT w FROM wm))
      SELECT * FROM matched
      UNION ALL SELECT * FROM unmatched
      ORDER BY click_id, buy_id""",

    // the theta join the banded equi-join must reproduce exactly
    "q197_stream_recovery" -> """
      WITH wm AS (
        SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 10 MINUTE AS w
        FROM events)
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events
      FROM events, wm
      WHERE time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
              + INTERVAL 5 MINUTE <= w
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    // corpus-vs-itself 8-gram duplication ratio per document
    "q217_stream_index_dedup" -> streamGateOracle,

    // q237 = q217 with watermark-bounded pair-dedup state; identical
    // admitted pairs on the fixture by construction, so one oracle
    // pins both (see StreamDedup.q237StreamGateBounded)
    "q237_stream_gate_bounded" -> streamGateOracle,

    // the vector tier's admission gate: frozen base model, 2-cell
    // probe, q30's cosine threshold — re-derived in batch
    "q304_stream_ivf_gate" -> streamIvfGateOracle,

    // q216's positional-gram + islands CTEs with the candidate source
    // swapped: grams occurring in more than one DISTINCT document
    // q358: version v of the streamed catalog table holds ticks
    // 0..v-2 (key mod-4 classes) - re-derived from the content
    // contract; the double-drain (fresh checkpoint) must not move
    // these numbers.
    "q358_stream_rlo_sink" -> """
      SELECT CONCAT('version_', CAST(v AS STRING)) AS read,
        COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM (SELECT UNNEST([2, 3, 4, 5]) AS v) vs
      JOIN orders ON o_orderkey % 4 < v - 1
      GROUP BY v ORDER BY read""",
  )
}
