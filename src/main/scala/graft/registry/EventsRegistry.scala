package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.streaming._
import graft.registry.OracleDefs._

/** Events family: catalog entries + DuckDB oracle SQL
  * (mechanical split of SparkEntry; content verbatim). */
object EventsRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_event_windows"    -> (Events.q36EventWindows _),
    "q37_event_hopping"    -> (Events.q37EventHopping _),
    "q38_sessionize"       -> (Events.q38Sessionize _),
    "q40_json_props"       -> (Events.q40JsonProps _),
    "q71_scd2_history"     -> (Events.q71Scd2History _),
    "q86_map_props"        -> (Events.q86MapProps _),
    "q108_session_window"  -> (Events.q108SessionWindow _),
    "q112_ema"             -> (Events.q112Ema _),
    "q117_funnel"          -> (Events.q117Funnel _),
    "q118_retention"       -> (Events.q118Retention _),
    "q119_histogram"       -> (Events.q119Histogram _),
    "q124_map_hofs"        -> (Events.q124MapHofs _),
    "q148_json_infer"      -> (Events.q148JsonInfer _),
    "q154_point_in_time"   -> (Events.q154PointInTime _),
    "q155_time_features"   -> (Events.q155TimeFeatures _),
    "q170_string_toolkit"  -> (Events.q170StringToolkit _),
    "q208_json_quarantine" -> (Events.q208JsonQuarantine _),
    "q272_acf"             -> (Events.q272Acf _),
    "q273_cusum"           -> (Events.q273Cusum _),
    "q277_stream_cusum"    -> (Events.q277StreamCusum _),
    "q278_theil_sen"       -> (Events.q278TheilSen _),
    "q283_window_funnel"   -> (Events.q283WindowFunnel _),
    "q284_attribution"     -> (Events.q284Attribution _),
    "q285_seasonality"     -> (Events.q285SeasonalityProfile _),
    "q286_transition_matrix" -> (Events.q286TransitionMatrix _),
    "q287_kaplan_meier"    -> (Events.q287KaplanMeier _),
    "q288_top_paths"       -> (Events.q288TopPaths _),
    "q293_bot_profile"     -> (Events.q293BotProfile _),
  )

  val oracleSql: Map[String, String] = Map(
    "q36_event_windows" -> """
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               AS win_start,
             event_type, COUNT(*) AS n_events,
             MIN(value) AS min_value, MAX(value) AS max_value
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",
    "q37_event_hopping" -> """
      SELECT win_start, event_type, COUNT(*) AS n_events FROM (
        SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
                 - o * INTERVAL 5 MINUTE AS win_start,
               event_type
        FROM events CROSS JOIN (SELECT unnest([0, 1]) AS o) t) h
      GROUP BY win_start, event_type
      ORDER BY win_start, event_type""",
    "q38_sessionize" -> """
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
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        COUNT(*) AS n_events,
        MIN(tsx) AS session_start,
        CAST(epoch_us(MAX(tsx)) - epoch_us(MIN(tsx)) AS DOUBLE) / 1000000.0
          AS duration_sec
      FROM sess
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id""",

    // streaming twin of q36 (counts only): AvailableNow drain ==
    // batch result, so the same bucketing SQL oracles the stream
    "q40_json_props" -> """
      SELECT event_type, COUNT(*) AS n_events,
        MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
        COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER))
          AS distinct_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",

    // oracle runs on the ORIGINAL parquet — the round-trip through
    // CSV zones must reproduce it exactly
    "q71_scd2_history" -> """
      SELECT user_id, event_id, tsx AS valid_from, valid_to, event_type,
             value, CAST(valid_to IS NULL AS INTEGER) AS is_current
      FROM (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
          lead(CAST(ts AS TIMESTAMP)) OVER (
            PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS valid_to,
          event_type, value
        FROM events WHERE user_id < 30) t
      ORDER BY user_id, valid_from, event_id""",
    "q86_map_props" -> """
      WITH kv AS (
        SELECT event_type, unnest(json_keys(props)) AS key, props
        FROM events)
      SELECT event_type, key, COUNT(*) AS n,
        MIN(CAST(json_extract_string(props, '$.' || key) AS INTEGER))
          AS min_v,
        MAX(CAST(json_extract_string(props, '$.' || key) AS INTEGER))
          AS max_v,
        COUNT(DISTINCT CAST(json_extract_string(props, '$.' || key)
          AS INTEGER)) AS distinct_v
      FROM kv
      GROUP BY event_type, key
      ORDER BY event_type, key""",
    "q108_session_window" -> """
      WITH ordered AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
          lag(CAST(ts AS TIMESTAMP)) OVER (
            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
            AS prev_ts
        FROM events),
      flagged AS (
        SELECT user_id, tsx,
          CASE WHEN prev_ts IS NULL
                    OR epoch_us(tsx) - epoch_us(prev_ts) >= 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM ordered),
      sess AS (
        SELECT user_id, tsx,
          SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY tsx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
      SELECT user_id, MIN(tsx) AS session_start, COUNT(*) AS n_events
      FROM sess
      GROUP BY user_id, sid
      ORDER BY user_id, session_start""",

    // masking/pseudonymization verified against the original values
    "q112_ema" -> """
      SELECT user_id, COUNT(*) AS n_events,
        ROUND(list_reduce(
          list(value ORDER BY CAST(ts AS TIMESTAMP), event_id),
          (acc, x) -> 0.1 * x + 0.9 * acc), 9) AS ema_value
      FROM events
      GROUP BY user_id
      ORDER BY user_id""",
    "q117_funnel" -> """
      WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                 FROM events),
      s AS (SELECT user_id, MIN(ts) AS s_ts FROM e
            WHERE event_type = 'signup' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
            FROM e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'click' AND e.ts >= s.s_ts
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
            FROM e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
            GROUP BY e.user_id)
      SELECT '1_signup' AS step, COUNT(*) AS n_users FROM s
      UNION ALL
      SELECT '2_click_after', COUNT(*) FROM c
      UNION ALL
      SELECT '3_purchase_after', COUNT(*) FROM p
      ORDER BY step""",
    "q118_retention" -> """
      WITH weekly AS (
        SELECT DISTINCT user_id,
          date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
        FROM events),
      firstwk AS (
        SELECT user_id, MIN(wk) AS cohort_week FROM weekly
        GROUP BY user_id)
      SELECT cohort_week,
        CAST(date_diff('day', cohort_week, wk) // 7 AS INTEGER)
          AS week_offset,
        COUNT(*) AS n_users
      FROM weekly JOIN firstwk USING (user_id)
      GROUP BY 1, 2
      ORDER BY cohort_week, week_offset""",

    // width_bucket(v, 0, 500, 20): under→0, over→21, else floor/25+1
    "q119_histogram" -> """
      SELECT CASE WHEN value < 0 THEN 0
                  WHEN value >= 500 THEN 21
                  ELSE CAST(FLOOR(value / 25) AS BIGINT) + 1
             END AS bucket,
        COUNT(*) AS n
      FROM events
      GROUP BY 1
      ORDER BY bucket""",

    // stateless stream scoring drain == the batch threshold filter
    "q124_map_hofs" -> """
      SELECT event_type, COUNT(*) AS n_events,
        MIN(CAST(json_extract_string(props, '$.k') AS INTEGER) * 2)
          AS min_k2,
        MAX(CAST(json_extract_string(props, '$.k') AS INTEGER) * 2)
          AS max_k2,
        CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k')
          AS INTEGER) >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",

    // BFS distances from the smallest doc in the MinHash edge set;
    // the recursive CTE mirrors the hop loop (MIN over path lengths)
    "q148_json_infer" -> """
      SELECT event_type, COUNT(*) AS n_events,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
          AS BIGINT) AS sum_k,
        'STRUCT<k: BIGINT>' AS inferred_schema
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",
    "q154_point_in_time" -> """
      WITH dim AS (
        SELECT user_id AS d_user, CAST(ts AS TIMESTAMP) AS valid_from,
          lead(CAST(ts AS TIMESTAMP)) OVER (
            PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS valid_to,
          event_type AS status
        FROM events
        WHERE user_id < 30 AND event_type <> 'purchase'),
      f AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events
        WHERE user_id < 30 AND event_type = 'purchase')
      SELECT status, COUNT(*) AS n_purchases,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM f JOIN dim ON f.user_id = dim.d_user
        AND dim.valid_from <= f.ts
        AND (dim.valid_to IS NULL OR f.ts < dim.valid_to)
      GROUP BY status
      ORDER BY status""",

    // portable modular weekday from a fixed Monday epoch
    "q155_time_features" -> """
      WITH f AS (
        SELECT event_type,
          CAST((((CAST(ts AS DATE) - DATE '2024-01-01') % 7) + 7) % 7
            AS INTEGER) AS dow,
          CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hr,
          CAST(quarter(CAST(ts AS TIMESTAMP)) AS INTEGER) AS qtr
        FROM events)
      SELECT event_type, dow, COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN dow >= 5 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_weekend,
        CAST(SUM(CASE WHEN hr >= 9 AND hr < 17 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_bizhours,
        MIN(hr) AS min_hr, MAX(hr) AS max_hr, MIN(qtr) AS min_qtr
      FROM f
      GROUP BY 1, 2
      ORDER BY 1, 2""",

    // same regex segmentation over the same normalized text
    "q170_string_toolkit" -> """
      WITH g AS (
        SELECT event_type, COUNT(*) AS n_events
        FROM events GROUP BY event_type)
      SELECT event_type, n_events,
        printf('%s:%06d', event_type, n_events) AS tag,
        substr(event_type, 1, 1) || 'XX' || substr(event_type, 4)
          AS spliced,
        lpad(upper(event_type), 10, '*') AS padded,
        translate(event_type, 'aeiou', 'AEIOU') AS devoweled,
        reverse(event_type) AS reversed
      FROM g
      ORDER BY event_type""",

    // composite (balance, key) order: ties cannot reorder the frame
    "q208_json_quarantine" -> """
      WITH t AS (
        SELECT event_type,
          CASE WHEN event_id % 10 = 3 THEN '{' || props
               ELSE props END AS raw
        FROM events)
      SELECT event_type, COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN raw IS NULL OR NOT json_valid(raw)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
        CAST(SUM(CASE WHEN raw IS NOT NULL AND json_valid(raw)
          THEN COALESCE(CAST(json_extract_string(raw, '$.k') AS BIGINT), 0)
          ELSE 0 END) AS BIGINT) AS k_sum
      FROM t
      GROUP BY event_type
      ORDER BY event_type""",

    // the four-stage curation pipeline, each stage over the previous
    // stage's survivors; counts via scalar subqueries
    "q272_acf" -> """
      WITH h AS (
        SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))
          AS BIGINT) // 3600 AS hr,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1),
      b AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM h),
      g AS (SELECT unnest(range(b.lo, b.hi + 1)) AS hr FROM b),
      s AS (SELECT g.hr, COALESCE(h.x, 0) AS x
            FROM g LEFT JOIN h ON h.hr = g.hr),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sm FROM s),
      c AS (SELECT hr, t.n * x - t.sm AS c FROM s CROSS JOIN t),
      d AS (SELECT CAST(SUM(c * c) AS BIGINT) AS den FROM c),
      lags AS (SELECT unnest(range(1, 25)) AS lag),
      p AS (
        SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(SUM(a.c * b2.c) AS BIGINT) AS num
        FROM c a CROSS JOIN lags l JOIN c b2 ON b2.hr = a.hr + l.lag
        GROUP BY l.lag)
      SELECT CAST(p.lag AS INT) AS lag, p.n_pairs,
        ROUND(CAST(p.num AS DOUBLE) / CAST(d.den AS DOUBLE), 9) AS acf
      FROM p CROSS JOIN d ORDER BY lag""",

    // same integer scaling; argmax tie-break (|S| desc, earliest day)
    // mirrors the Spark struct-max exactly
    "q273_cusum" -> cusumOracle,

    // stream-batch equivalence: the streamed daily aggregate feeds the
    // identical finishing math, so q273's oracle pins the stream too
    "q277_stream_cusum" -> cusumOracle,

    // all day-pair slopes of the daily aggregate; quantile_cont is
    // Spark's exact interpolating percentile
    "q278_theil_sen" -> """
      WITH daily AS (
        SELECT event_type,
          CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE)
            - DATE '1970-01-01' AS BIGINT) AS d,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, d),
      sl AS (
        SELECT a.event_type,
          ROUND(CAST(b.x - a.x AS DOUBLE) / CAST(b.d - a.d AS DOUBLE), 9)
            AS slope
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.d > a.d),
      med AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          ROUND(quantile_cont(slope, 0.5), 9) AS slope_med
        FROM sl GROUP BY event_type),
      b0 AS (
        SELECT d.event_type, m.n_pairs, m.slope_med,
          ROUND(CAST(d.x AS DOUBLE) - m.slope_med * CAST(d.d AS DOUBLE),
            9) AS b0
        FROM daily d JOIN med m ON m.event_type = d.event_type)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days, n_pairs,
        slope_med AS slope, ROUND(quantile_cont(b0, 0.5), 9) AS intercept
      FROM b0 GROUP BY event_type, n_pairs, slope_med
      ORDER BY event_type""",
    "q283_window_funnel" -> """
      WITH e AS (SELECT user_id, event_type,
                   CAST(ts AS TIMESTAMP) AS ts FROM events),
      s AS (SELECT user_id, MIN(ts) AS s_ts FROM e
            WHERE event_type = 'signup' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ts) AS c_ts, MIN(s.s_ts) AS s_ts
            FROM e JOIN s ON s.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts >= s.s_ts
              AND CAST(floor(epoch(e.ts)) AS BIGINT)
                <= CAST(floor(epoch(s.s_ts)) AS BIGINT) + 86400
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.ts) AS p_ts, MIN(c.s_ts) AS s_ts
            FROM e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
              AND CAST(floor(epoch(e.ts)) AS BIGINT)
                <= CAST(floor(epoch(c.c_ts)) AS BIGINT) + 86400
            GROUP BY e.user_id)
      SELECT * FROM (
        SELECT '1_signup' AS step, CAST(COUNT(*) AS BIGINT) AS n_users,
          ROUND(quantile_cont(CAST(floor(epoch(s_ts))
            - floor(epoch(s_ts)) AS DOUBLE) / 3600.0, 0.5), 9)
            AS median_hours_from_signup
        FROM s
        UNION ALL
        SELECT '2_click_24h', CAST(COUNT(*) AS BIGINT),
          ROUND(quantile_cont(CAST(floor(epoch(c_ts))
            - floor(epoch(s_ts)) AS DOUBLE) / 3600.0, 0.5), 9)
        FROM c
        UNION ALL
        SELECT '3_purchase_24h', CAST(COUNT(*) AS BIGINT),
          ROUND(quantile_cont(CAST(floor(epoch(p_ts))
            - floor(epoch(s_ts)) AS DOUBLE) / 3600.0, 0.5), 9)
        FROM p) u
      ORDER BY step""",

    // argmin/argmax by (ts, event_id) mirrors the Spark struct min/max
    "q284_attribution" -> """
      WITH e AS (SELECT user_id, event_type,
                   CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
      conv AS (SELECT user_id, MIN(ts) AS conv_ts FROM e
               WHERE event_type = 'purchase' GROUP BY user_id),
      t AS (SELECT e.user_id, e.event_type, e.ts, e.event_id
            FROM e JOIN conv ON conv.user_id = e.user_id
            WHERE e.event_type <> 'purchase' AND e.ts < conv.conv_ts),
      ft AS (SELECT user_id, event_type FROM (
               SELECT user_id, event_type, ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM t) z WHERE rn = 1),
      lt AS (SELECT user_id, event_type FROM (
               SELECT user_id, event_type, ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
                 AS rn
               FROM t) z WHERE rn = 1),
      f AS (SELECT event_type AS channel,
              CAST(COUNT(*) AS BIGINT) AS n_first_touch
            FROM ft GROUP BY 1),
      l AS (SELECT event_type AS channel,
              CAST(COUNT(*) AS BIGINT) AS n_last_touch
            FROM lt GROUP BY 1)
      SELECT COALESCE(f.channel, l.channel) AS channel,
        COALESCE(f.n_first_touch, 0) AS n_first_touch,
        COALESCE(l.n_last_touch, 0) AS n_last_touch
      FROM f FULL OUTER JOIN l ON l.channel = f.channel
      ORDER BY channel""",

    // epoch-day dow arithmetic ((d+4) mod 7), independence-model
    // expected counts, residuals on the rounded expected value
    "q285_seasonality" -> """
      WITH c AS (
        SELECT CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE)
            - DATE '1970-01-01' + 4) % 7 AS INT) AS dow,
          CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY dow, hr),
      r AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS row_n
            FROM c GROUP BY dow),
      co AS (SELECT hr, CAST(SUM(n) AS BIGINT) AS col_n
             FROM c GROUP BY hr),
      g AS (SELECT CAST(SUM(n) AS BIGINT) AS grand FROM c),
      x AS (
        SELECT c.dow, c.hr, c.n,
          ROUND(CAST(r.row_n * co.col_n AS DOUBLE)
            / CAST(g.grand AS DOUBLE), 9) AS expected
        FROM c JOIN r USING (dow) JOIN co USING (hr) CROSS JOIN g)
      SELECT dow, hr, n, expected,
        ROUND((CAST(n AS DOUBLE) - expected) / sqrt(expected), 9)
          AS pearson_resid
      FROM x ORDER BY dow, hr""",

    // LEAD over (ts, event_id) mirrors the Spark window; entropy terms
    // round at 9 then decimal-sum
    "q286_transition_matrix" -> """
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   event_type AS cur FROM events),
      pr AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n FROM (
               SELECT cur, LEAD(cur) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS nxt
               FROM e) z
             WHERE nxt IS NOT NULL GROUP BY cur, nxt),
      r AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS row_n
            FROM pr GROUP BY cur),
      wp AS (SELECT pr.cur, pr.nxt, pr.n,
               ROUND(CAST(pr.n AS DOUBLE) / CAST(r.row_n AS DOUBLE), 9)
                 AS p
             FROM pr JOIN r USING (cur)),
      en AS (SELECT cur,
               ROUND(CAST(SUM(CAST(ROUND(-p * ln(p), 9)
                 AS DECIMAL(28,9))) AS DOUBLE), 9) AS row_entropy
             FROM wp GROUP BY cur)
      SELECT wp.cur, wp.nxt, wp.n, wp.p, en.row_entropy
      FROM wp JOIN en USING (cur) ORDER BY wp.cur, wp.nxt""",

    // survival as exp of the running decimal sum of 9-rounded log
    // factors — an order-independent cumulative product
    "q287_kaplan_meier" -> """
      WITH u AS (SELECT user_id,
          CAST(CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE)
            - DATE '1970-01-01' AS BIGINT) AS d0,
          CAST(CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE)
            - DATE '1970-01-01' AS BIGINT) AS d1
        FROM events GROUP BY user_id),
      h AS (SELECT MAX(d1) AS dmax FROM u),
      lv AS (SELECT d1 - d0 AS t,
               CASE WHEN d1 < h.dmax - 3 THEN 1 ELSE 0 END AS death
             FROM u CROSS JOIN h),
      bt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_leaving,
               CAST(SUM(death) AS BIGINT) AS d
             FROM lv GROUP BY t),
      w AS (SELECT t, n_leaving, d,
              CAST(SUM(n_leaving) OVER (ORDER BY t ROWS BETWEEN
                CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
                AS n_at_risk
            FROM bt),
      l AS (SELECT *, CASE WHEN d > 0 THEN
              ROUND(ln(1.0 - CAST(d AS DOUBLE)
                / CAST(n_at_risk AS DOUBLE)), 9)
              ELSE 0.0 END AS lnf FROM w)
      SELECT t AS t_days, n_at_risk, d AS n_deaths,
        n_leaving - d AS n_censored,
        ROUND(exp(CAST(SUM(CAST(lnf AS DECIMAL(28,9))) OVER (
          ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS DOUBLE)), 9) AS survival
      FROM l ORDER BY t_days""",

    // q38's 30-minute gap rule inline; ordered string_agg mirrors the
    // Spark rank-filtered sorted-struct join
    "q288_top_paths" -> """
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   event_type FROM events),
      s AS (SELECT *, CASE WHEN prev_ts IS NULL
              OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
              THEN 1 ELSE 0 END AS new_session
            FROM (SELECT *, LAG(ts) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_ts FROM e) z),
      sid AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS session_id
              FROM s),
      rn AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id,
               session_id ORDER BY ts, event_id) AS rn
             FROM sid),
      p AS (SELECT user_id, session_id,
              string_agg(event_type, '>' ORDER BY rn) AS path
            FROM rn WHERE rn <= 3 GROUP BY user_id, session_id)
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM p GROUP BY path
      ORDER BY n_sessions DESC, path LIMIT 10""",

    // prefix filtering is recall-complete, so the oracle is the naive
    // all-pairs Jaccard definition the engine never runs
    "q293_bot_profile" -> """
      WITH g AS (
        SELECT user_id,
          CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
            / 1000000.0 AS gap
        FROM events),
      s AS (
        SELECT user_id, COUNT(gap) AS n_gaps,
          quantile_cont(gap, 0.5) AS med,
          quantile_cont(gap, 0.9) - quantile_cont(gap, 0.1) AS spread
        FROM g WHERE gap IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(gap) >= 4),
      c AS (
        SELECT n_gaps + 1 AS n_events, med,
          CASE WHEN med <= 0 THEN 'burst'
               WHEN ROUND(spread / med, 9) < 0.5 THEN 'regular'
               ELSE 'organic' END AS behavior
        FROM s)
      SELECT behavior, COUNT(*) AS n_users,
        CAST(SUM(n_events) AS BIGINT) AS n_events,
        ROUND(quantile_cont(med, 0.5), 9) AS median_of_median_gap_s
      FROM c GROUP BY behavior ORDER BY behavior""",
  )
}
