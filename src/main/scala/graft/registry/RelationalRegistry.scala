package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.streaming._
import graft.registry.OracleDefs._

/** Relational family: catalog entries + DuckDB oracle SQL
  * (mechanical split of SparkEntry; content verbatim). */
object RelationalRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> (Relational.q1Agg _),
    "q2_filter_project" -> (Relational.q2FilterProject _),
    "q3_join_agg"       -> (Relational.q3JoinAgg _),
    "q4_broadcast_join" -> (Relational.q4BroadcastJoin _),
    "q5_semi_join"      -> (Relational.q5SemiJoin _),
    "q6_anti_join"      -> (Relational.q6AntiJoin _),
    "q7_window_topn"    -> (Relational.q7WindowTopN _),
    "q8_window_running" -> (Relational.q8WindowRunning _),
    "q9_distinct"       -> (Relational.q9Distinct _),
    "q10_count_distinct" -> (Relational.q10CountDistinct _),
    "q11_setops"        -> (Relational.q11SetOps _),
    "q12_sort_limit"    -> (Relational.q12SortLimit _),
    "q13_rollup"        -> (Relational.q13Rollup _),
    "q14_having"        -> (Relational.q14Having _),
    "q15_case_decode"   -> (Relational.q15CaseDecode _),
    "q16_date_agg"      -> (Relational.q16DateAgg _),
    "q17_string_funcs"  -> (Relational.q17StringFuncs _),
    "q18_sql_surface"   -> (Relational.qSqlSurface _),
    "q21_cube"             -> (Relational.q21Cube _),
    "q22_approx_distinct"  -> (Relational.q22ApproxDistinct _),
    "q23_top_brand_per_nation" -> (Relational.q23TopBrandPerNation _),
    "q48_percentiles"      -> (Relational.q48Percentiles _),
    "q49_pivot"            -> (Relational.q49Pivot _),
    "q50_grouping_sets"    -> (Relational.q50GroupingSets _),
    "q51_asof_join"        -> (AsOf.q51AsofJoin _),
    "q52_range_join"       -> (AsOf.q52RangeJoin _),
    "q61_correlated_subquery" -> (Relational.q61CorrelatedSubquery _),
    "q62_range_frame"      -> (Relational.q62RangeFrame _),
    "q63_multiset_setops"  -> (Relational.q63MultisetSetops _),
    "q64_nullsafe_join"    -> (Relational.q64NullSafeJoin _),
    "q66_exact_variance"   -> (Relational.q66ExactVariance _),
    "q67_corr_powersums"   -> (Relational.q67CorrPowerSums _),
    "q72_window_nav"       -> (Relational.q72WindowNav _),
    "q73_profile_columns"  -> (Relational.q73ProfileColumns _),
    "q76_asof_native"      -> (graft.plans.NativeAsOf.q76AsofNative _),
    "q77_unpivot"          -> (Relational.q77Unpivot _),
    "q78_nested_arrays"    -> (Relational.q78NestedArrays _),
    "q79_date_parsing"     -> (Relational.q79DateParsing _),
    "q88_approx_percentiles" -> (Relational.q88ApproxPercentiles _),
    "q89_recursive_calendar" -> (ModernSql.q89RecursiveCalendar _),
    "q90_variant_props"    -> (ModernSql.q90VariantProps _),
    "q91_hll_rollup"       -> (ModernSql.q91HllRollup _),
    "q92_listagg"          -> (ModernSql.q92ListAgg _),
    "q93_regr_stats"       -> (ModernSql.q93RegrStats _),
    "q94_collation"        -> (ModernSql.q94Collation _),
    "q95_xml_parse"        -> (ModernSql.q95XmlParse _),
    "q97_lateral_topn"     -> (ModernSql.q97LateralTopN _),
    "q99_outer_joins"      -> (Relational.q99OuterJoins _),
    "q100_gap_fill"        -> (Relational.q100GapFill _),
    "q101_moving_avg"      -> (Relational.q101MovingAvg _),
    "q110_cogroup"         -> (Relational.q110Cogroup _),
    "q126_sql_sugar"       -> (ModernSql.q126SqlSugar _),
    "q127_sql_scalar_udf"  -> (ModernSql.q127SqlScalarUdf _),
    "q128_sql_table_udf"   -> (ModernSql.q128SqlTableUdf _),
    "q129_approx_topk"     -> (ModernSql.q129ApproxTopK _),
    "q130_param_sql"       -> (ModernSql.q130ParamSql _),
    "q138_union_by_name"   -> (Relational.q138UnionByName _),
    "q146_argmax"          -> (Relational.q146ArgMax _),
    "q147_bitmap_distinct" -> (Relational.q147BitmapDistinct _),
    "q152_sql_scripting"   -> (ModernSql.q152SqlScripting _),
    "q153_exec_immediate"  -> (ModernSql.q153ExecImmediate _),
    "q160_outliers"        -> (Relational.q160Outliers _),
    "q166_bool_aggs"       -> (Relational.q166BoolAggs _),
    "q167_skew_kurtosis"   -> (Relational.q167SkewKurtosis _),
    "q168_date_arith"      -> (Relational.q168DateArith _),
    "q171_window_dist"     -> (Relational.q171WindowDist _),
    "q172_sql_pipe"        -> (ModernSql.q172SqlPipe _),
    "q174_quantile_family" -> (Relational.q174QuantileFamily _),
    "q175_exists_subquery" -> (Relational.q175ExistsSubquery _),
    "q177_grouping_id"     -> (Relational.q177GroupingId _),
    "q185_interval_overlap" -> (AsOf.q185IntervalOverlap _),
    "q188_equidepth_hist"  -> (Relational.q188EquiDepthHist _),
    "q189_intersect_all"   -> (Relational.q189IntersectAll _),
    "q190_filter_clause"   -> (Relational.q190FilterClause _),
    "q192_winsorize"       -> (Relational.q192Winsorize _),
    "q234_hll_error_cert"  -> (Relational.q234HllErrorCert _),
    "q245_percentile_cert" -> (Relational.q245PercentileCert _),
    "q246_topk_cert"       -> (ModernSql.q246TopkCert _),
    "q247_hll_rollup_cert" -> (ModernSql.q247HllRollupCert _),
    "q292_market_basket"   -> (Relational.q292MarketBasket _),
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q2_filter_project" -> """
      SELECT l_orderkey, l_linenumber, l_quantity,
        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc_price
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_quantity > 45""",
    "q3_join_agg" -> """
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name""",
    "q4_broadcast_join" -> """
      SELECT p_brand, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size >= 40
      GROUP BY p_brand
      ORDER BY p_brand""",
    "q5_semi_join" -> """
      SELECT c_mktsegment, COUNT(*) AS n_customers
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 200000)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    "q6_anti_join" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey""",
    "q7_window_topn" -> """
      SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_custkey, rn""",
    "q8_window_running" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
          PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_qty
      FROM lineitem
      WHERE l_suppkey <= 10
      ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "q9_distinct" -> """
      SELECT DISTINCT l_returnflag, l_linestatus
      FROM lineitem
      ORDER BY l_returnflag, l_linestatus""",
    "q10_count_distinct" -> """
      SELECT o_orderstatus,
        COUNT(DISTINCT o_custkey) AS n_customers,
        COUNT(*) AS n_orders
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",
    "q11_setops" -> """
      SELECT nationkey, 'both' AS which FROM
        (SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
         INTERSECT
         SELECT CAST(c_nationkey AS INTEGER) FROM customer) t1
      UNION ALL
      SELECT nationkey, 'cust_only' AS which FROM
        (SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
         EXCEPT
         SELECT CAST(s_nationkey AS INTEGER) FROM supplier) t2
      ORDER BY which, nationkey""",
    "q12_sort_limit" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 10""",
    "q13_rollup" -> """
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q14_having" -> """
      SELECT o_custkey, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      FROM orders
      GROUP BY o_custkey
      HAVING COUNT(*) >= 15
      ORDER BY o_custkey""",
    "q15_case_decode" -> """
      SELECT priority_clean, priority_meaning, COUNT(*) AS n FROM (
        SELECT
          CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')
               THEN o_orderpriority ELSE 'OTHER' END AS priority_clean,
          CASE o_orderpriority
               WHEN '1-URGENT' THEN 'Urgente'
               WHEN '2-HIGH' THEN 'Alta'
               WHEN '3-MEDIUM' THEN 'Media'
               ELSE 'Desconocido' END AS priority_meaning
        FROM orders) t
      GROUP BY priority_clean, priority_meaning
      ORDER BY priority_clean""",
    "q16_date_agg" -> """
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
             CAST(MONTH(o_orderdate) AS INTEGER) AS mon,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY 1, 2
      ORDER BY yr, mon""",
    "q17_string_funcs" -> """
      SELECT p_partkey,
        string_split(p_name, ' ')[1] AS name_first,
        TRIM(regexp_replace(p_name, '[aeiou]', '', 'g')) AS name_novowel,
        p_brand || '#' || CAST(p_size AS VARCHAR) AS brand_size
      FROM part
      WHERE p_name LIKE '%an%'
      ORDER BY p_partkey""",
    "q18_sql_surface" -> """
      SELECT o.o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_line_items,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority""",
    "q21_cube" -> """
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST,
               o_orderpriority ASC NULLS FIRST""",
    "q23_top_brand_per_nation" -> """
      SELECT n_name, rk, p_brand, revenue FROM (
        SELECT n_name, p_brand, revenue,
          CAST(ROW_NUMBER() OVER (PARTITION BY n_name
               ORDER BY revenue DESC, p_brand ASC) AS INTEGER) AS rk
        FROM (
          SELECT n_name, p_brand,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
              AS revenue
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN part     ON l_partkey = p_partkey
          GROUP BY n_name, p_brand) agg) ranked
      WHERE rk <= 2
      ORDER BY n_name, rk""",
    "q48_percentiles" -> """
      SELECT o_orderpriority,
        quantile_cont(o_totalprice, 0.5) AS p50,
        quantile_cont(o_totalprice, 0.9) AS p90,
        quantile_cont(o_totalprice, 0.99) AS p99,
        COUNT(*) AS n
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
    "q49_pivot" -> """
      SELECT o_orderstatus,
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
    "q50_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority,
             CAST(grouping(o_orderstatus) AS INT) AS g_status,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus ASC NULLS FIRST,
               o_orderpriority ASC NULLS FIRST""",
    "q51_asof_join" -> """
      WITH s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS sts
                 FROM events WHERE event_type = 'signup'),
      e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   event_type
            FROM events)
      SELECT event_type, COUNT(*) AS n_events,
        COUNT(sts) AS n_with_signup,
        MAX(epoch_us(ts) - epoch_us(sts)) AS max_lag_us
      FROM e ASOF LEFT JOIN s
        ON e.user_id = s.user_id AND e.ts >= s.sts
      GROUP BY event_type
      ORDER BY event_type""",
    "q52_range_join" -> """
      WITH bands AS (
        SELECT 'band_' || CAST(i AS VARCHAR) AS band,
               i * 100.0 AS lo, (i + 1) * 100.0 AS hi
        FROM (SELECT unnest(range(5)) AS i))
      SELECT band, COUNT(*) AS n_events,
        MIN(value) AS min_value, MAX(value) AS max_value
      FROM events JOIN bands ON value >= lo AND value < hi
      GROUP BY band
      ORDER BY band""",

    // AvailableNow drains the bounded input, so the stream-stream
    // interval join equals the batch interval join
    "q61_correlated_subquery" -> """
      SELECT c_custkey, c_mktsegment
      FROM customer c
      WHERE (SELECT COUNT(*) FROM orders o
             WHERE o.o_custkey = c.c_custkey
               AND o.o_totalprice > 300000) >= 2
      ORDER BY c_custkey""",
    "q62_range_frame" -> """
      SELECT o_orderkey, o_custkey, o_orderdate,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
          AS DOUBLE) AS trailing_total
      FROM orders
      ORDER BY o_custkey, o_orderdate, o_orderkey""",
    "q63_multiset_setops" -> """
      SELECT l_returnflag, l_linestatus, COUNT(*) AS surplus FROM (
        SELECT l_returnflag, l_linestatus FROM lineitem
        WHERE l_quantity > 25
        EXCEPT ALL
        SELECT l_returnflag, l_linestatus FROM lineitem
        WHERE l_quantity <= 25) t
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q64_nullsafe_join" -> """
      WITH a AS (
        SELECT nullif(o_orderpriority, '5-LOW') AS pr, COUNT(*) AS n_f
        FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
      b AS (
        SELECT nullif(o_orderpriority, '5-LOW') AS pr_b, COUNT(*) AS n_o
        FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
      SELECT pr, n_f, n_o
      FROM a JOIN b ON pr IS NOT DISTINCT FROM pr_b
      ORDER BY pr NULLS FIRST""",
    "q66_exact_variance" -> """
      WITH s AS (
        SELECT l_returnflag, COUNT(*) AS n,
          SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
          SUM(CAST(l_quantity AS DECIMAL(18,2))
              * CAST(l_quantity AS DECIMAL(18,2))) AS sxx
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, n,
        CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS var_pop_qty
      FROM s
      ORDER BY l_returnflag""",
    "q67_corr_powersums" -> """
      WITH s AS (
        SELECT l_returnflag,
          CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS syy,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sxy
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag,
        ROUND((n * sxy - sx * sy)
          / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9)
          AS corr_qty_price
      FROM s
      ORDER BY l_returnflag""",
    "q72_window_nav" -> """
      SELECT o_custkey, o_orderkey, o_totalprice,
        lag(o_totalprice) OVER w AS prev_price,
        lead(o_totalprice) OVER w AS next_price,
        first_value(o_totalprice) OVER wf AS first_price,
        last_value(o_totalprice) OVER wf AS last_price,
        CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        ROUND(percent_rank() OVER w, 9) AS pct_rank
      FROM orders
      WHERE o_custkey <= 100
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey),
             wf AS (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""",
    "q73_profile_columns" -> """
      WITH s AS (
        SELECT COUNT(*) AS n_rows,
          COUNT(o_orderstatus) AS nn_st,
          COUNT(DISTINCT o_orderstatus) AS nd_st,
          MIN(o_orderstatus) AS min_st, MAX(o_orderstatus) AS max_st,
          COUNT(o_orderpriority) AS nn_pr,
          COUNT(DISTINCT o_orderpriority) AS nd_pr,
          MIN(o_orderpriority) AS min_pr, MAX(o_orderpriority) AS max_pr,
          COUNT(o_custkey) AS nn_ck, COUNT(DISTINCT o_custkey) AS nd_ck,
          CAST(MIN(o_custkey) AS DOUBLE) AS min_ck,
          CAST(MAX(o_custkey) AS DOUBLE) AS max_ck,
          COUNT(o_totalprice) AS nn_tp,
          COUNT(DISTINCT o_totalprice) AS nd_tp,
          CAST(MIN(o_totalprice) AS DOUBLE) AS min_tp,
          CAST(MAX(o_totalprice) AS DOUBLE) AS max_tp
        FROM orders)
      SELECT * FROM (
        SELECT 'o_orderstatus' AS col_name, n_rows,
          n_rows - nn_st AS n_nulls, nd_st AS n_distinct,
          CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
          min_st AS min_str, max_st AS max_str FROM s
        UNION ALL
        SELECT 'o_orderpriority', n_rows, n_rows - nn_pr, nd_pr,
          NULL, NULL, min_pr, max_pr FROM s
        UNION ALL
        SELECT 'o_custkey', n_rows, n_rows - nn_ck, nd_ck,
          min_ck, max_ck, NULL, NULL FROM s
        UNION ALL
        SELECT 'o_totalprice', n_rows, n_rows - nn_tp, nd_tp,
          min_tp, max_tp, NULL, NULL FROM s) u
      ORDER BY col_name""",
    "q76_asof_native" -> """
      WITH s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS sts
                 FROM events WHERE event_type = 'signup'),
      e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                   event_type
            FROM events)
      SELECT event_type, COUNT(*) AS n_events,
        COUNT(sts) AS n_with_signup,
        MAX(epoch_us(ts) - epoch_us(sts)) AS max_lag_us
      FROM e ASOF LEFT JOIN s
        ON e.user_id = s.user_id AND e.ts >= s.sts
      GROUP BY event_type
      ORDER BY event_type""",

    // pivot → unpivot round trip equals the plain long-form group-by
    "q77_unpivot" -> """
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
      ORDER BY o_orderstatus, o_orderpriority""",
    "q78_nested_arrays" -> """
      SELECT o_custkey,
        CAST(len(l) AS INTEGER) AS n_orders,
        l[1] AS top1,
        list_reduce(l[1:3], (acc, x) -> acc + x) AS top3_sum
      FROM (
        SELECT o_custkey,
          list_sort(list(o_totalprice), 'DESC') AS l
        FROM orders GROUP BY o_custkey) t
      ORDER BY o_custkey""",
    "q79_date_parsing" -> """
      SELECT o_orderkey,
        strftime(o_orderdate, '%Y-%m-%d') AS dstr,
        strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS parsed,
        strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY,
          '%Y-%m-%d') AS plus30,
        strftime(date_trunc('month', CAST(o_orderdate AS DATE)),
          '%Y-%m-%d') AS month_start,
        strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
          AS month_end,
        CAST(date_diff('day', CAST(o_orderdate AS DATE),
          DATE '1998-12-31') AS BIGINT) AS days_to_end
      FROM orders
      WHERE o_orderkey < 2000
      ORDER BY o_orderkey""",

    // the surviving fingerprint SET equals exact batch dedup; which
    // copy survives is arrival-dependent, so only the set is compared
    "q89_recursive_calendar" -> """
      WITH RECURSIVE bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS mn,
               CAST(MAX(o_orderdate) AS DATE) AS mx
        FROM orders),
      months (m, mn0, mx) AS (
        SELECT CAST(date_trunc('month', mn) AS DATE), mn, mx FROM bounds
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE), mn0, mx FROM months
        WHERE m + INTERVAL 1 MONTH <= mx),
      cal AS (
        SELECT unnest(generate_series(greatest(m, mn0),
          least(CAST(last_day(m) AS DATE), mx), INTERVAL 1 DAY)) AS d
        FROM months),
      order_days AS (
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS od FROM orders)
      SELECT CAST(year(d) AS INTEGER) AS yr,
        CAST(month(d) AS INTEGER) AS mon,
        COUNT(*) AS n_days,
        CAST(SUM(CASE WHEN od IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_gap_days
      FROM cal LEFT JOIN order_days ON d = od
      GROUP BY year(d), month(d)
      ORDER BY yr, mon""",
    "q90_variant_props" -> """
      SELECT event_type, COUNT(*) AS n_events,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
          AS BIGINT) AS sum_k,
        MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",
    "q92_listagg" -> """
      SELECT r_name, COUNT(*) AS n_nations,
        string_agg(n_name, ',' ORDER BY n_name) AS members
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name""",
    "q93_regr_stats" -> """
      SELECT l_returnflag,
        CAST(regr_count(y, x) AS BIGINT) AS n,
        ROUND(regr_slope(y, x), 6) AS slope,
        ROUND(regr_intercept(y, x), 6) AS intercept,
        ROUND(regr_r2(y, x), 6) AS r2
      FROM (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x,
                   CAST(l_extendedprice AS DOUBLE) AS y
            FROM lineitem) t
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",
    "q94_collation" -> """
      SELECT MIN(l) AS lang_repr, COUNT(*) AS n
      FROM (SELECT lang AS l FROM documents
            UNION ALL SELECT upper(lang) FROM documents) t
      GROUP BY lower(l)
      ORDER BY lang_repr""",

    // oracle on the original columns: the XML serialize→parse cycle
    // must be lossless
    "q95_xml_parse" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        COUNT(DISTINCT doc_id) AS n_distinct_docs
      FROM documents
      GROUP BY lang
      ORDER BY lang""",
    "q99_outer_joins" -> """
      WITH cust AS (SELECT c_custkey FROM customer
                    WHERE c_custkey % 3 = 0),
      big AS (SELECT o_custkey, o_orderkey FROM orders
              WHERE o_totalprice > 300000),
      l AS (
        SELECT COUNT(CASE WHEN c_custkey IS NOT NULL
                           AND o_custkey IS NOT NULL THEN 1 END) AS m,
               COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS lo,
               COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS ro
        FROM cust LEFT JOIN big ON c_custkey = o_custkey),
      r AS (
        SELECT COUNT(CASE WHEN c_custkey IS NOT NULL
                           AND o_custkey IS NOT NULL THEN 1 END) AS m,
               COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS lo,
               COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS ro
        FROM cust RIGHT JOIN big ON c_custkey = o_custkey),
      f AS (
        SELECT COUNT(CASE WHEN c_custkey IS NOT NULL
                           AND o_custkey IS NOT NULL THEN 1 END) AS m,
               COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS lo,
               COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS ro
        FROM cust FULL OUTER JOIN big ON c_custkey = o_custkey)
      SELECT 'left' AS join_type, m AS n_matched, lo AS n_left_only,
             ro AS n_right_only FROM l
      UNION ALL
      SELECT 'right', m, lo, ro FROM r
      UNION ALL
      SELECT 'full_outer', m, lo, ro FROM f
      ORDER BY join_type""",
    "q100_gap_fill" -> """
      SELECT user_id, event_id, tsx AS ts, reading,
        last_value(reading IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY tsx, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      FROM (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
          CASE WHEN event_type = 'error' THEN NULL ELSE value END
            AS reading
        FROM events) t
      WHERE user_id < 50
      ORDER BY user_id, tsx, event_id""",
    "q101_moving_avg" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE)
          / CAST(COUNT(*) OVER w AS DOUBLE) AS ma_qty
      FROM lineitem
      WHERE l_suppkey <= 10
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
      ORDER BY l_suppkey, l_orderkey, l_linenumber""",

    // the observed metrics must equal a direct aggregation
    "q110_cogroup" -> """
      SELECT o_orderkey, o_totalprice,
        COUNT(l_orderkey) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_qty
      FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_totalprice > 400000
      GROUP BY o_orderkey, o_totalprice
      ORDER BY o_orderkey""",

    // partial re-delivery: only 1997 is replaced (price doubled), all
    // other partitions must be byte-identical to the first write
    "q97_lateral_topn" -> """
      SELECT n_name, c_name, c_acctbal
      FROM nation,
      LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey ASC
        LIMIT 2) top_cust
      ORDER BY n_name, c_acctbal DESC, c_name""",

    // full recompute: merged partials must equal it exactly
    "q126_sql_sugar" -> """
      WITH per AS (
        SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
          COUNT(*) AS n_orders,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, yr)
      SELECT n_name, yr, n_orders,
        CAST(revenue AS DOUBLE) AS revenue_usd,
        CAST(revenue AS DOUBLE) * 2 AS revenue_x2,
        CAST(revenue AS DOUBLE) * 2 - CAST(revenue AS DOUBLE)
          AS revenue_back
      FROM per
      ORDER BY 1, 2, 3, 4, 5, 6""",

    // the SQL UDF body inlined by hand
    "q127_sql_scalar_udf" -> """
      SELECT l_returnflag,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
          AS DOUBLE) AS net_revenue,
        COUNT(*) AS n_items
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // the table-UDF bin generator expanded as a CTE
    "q128_sql_table_udf" -> """
      WITH b AS (
        SELECT CAST(i AS INTEGER) AS bin, i * 50000.0 AS lo,
          (i + 1) * 50000.0 AS hi
        FROM generate_series(0, 11) t(i))
      SELECT b.bin, CAST(b.lo AS BIGINT) AS lo_usd,
        COUNT(o_orderkey) AS n_orders
      FROM b LEFT JOIN orders
        ON o_totalprice >= b.lo AND o_totalprice < b.hi
      GROUP BY b.bin, b.lo
      ORDER BY b.bin""",

    // named parameters bound to the same literals
    "q130_param_sql" -> """
      SELECT o_orderpriority, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total_usd
      FROM orders
      WHERE o_orderstatus = 'F'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    // same Morton arithmetic spelled out per bit; ROW_NUMBER is safe
    // because the (z, p_partkey) order key is unique
    "q138_union_by_name" -> """
      SELECT COALESCE(CASE WHEN year(o_orderdate) >= 1995
               THEN o_orderpriority END, 'LEGACY') AS priority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total_usd
      FROM orders
      GROUP BY 1
      ORDER BY 1""",

    // batch twin of the per-micro-batch broadcast enrichment
    "q146_argmax" -> """
      SELECT n_name,
        arg_max(c_name, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
          * 10000000 + c_custkey) AS richest,
        MAX(c_acctbal) AS max_bal,
        arg_min(c_name, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
          * 10000000 + c_custkey) AS poorest,
        MIN(c_acctbal) AS min_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name""",

    // the bitmap pipeline must be lossless: plain exact distinct
    "q147_bitmap_distinct" -> """
      SELECT l_returnflag,
        CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct_orders,
        COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // the inferred DDL is pinned as a literal; sums via json extract
    "q152_sql_scripting" -> """
      WITH steps AS (
        SELECT (i + 1) * 50000.0 AS thr FROM generate_series(0, 19) t(i)),
      counted AS (
        SELECT thr,
          (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr) AS cnt
        FROM steps),
      pick AS (
        SELECT thr, cnt FROM counted WHERE cnt <= 1000
        ORDER BY thr LIMIT 1)
      SELECT CAST(thr AS BIGINT) AS threshold, cnt AS n_above,
        (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         FROM orders, pick WHERE o_totalprice > pick.thr)
          AS revenue_above
      FROM pick""",

    // the dynamic statement with its bind applied literally
    "q153_exec_immediate" -> """
      SELECT p_brand, COUNT(*) AS n_parts,
        CAST(MIN(p_retailprice) AS DOUBLE) AS min_price
      FROM part WHERE p_size >= 25
      GROUP BY p_brand
      ORDER BY p_brand""",

    // same half-open version intervals over the same ordering
    "q160_outliers" -> """
      WITH o AS (
        SELECT o_orderpriority AS pri,
          CAST(o_totalprice AS DOUBLE) AS x,
          CAST(o_totalprice AS DECIMAL(18,2)) AS xd
        FROM orders),
      st AS (
        SELECT pri, COUNT(*) AS n,
          CAST(SUM(xd) AS DOUBLE) AS s1d,
          CAST(SUM(xd * xd) AS DOUBLE) AS s2d
        FROM o GROUP BY pri),
      m AS (
        SELECT pri, n, s1d / n AS mean,
          sqrt(GREATEST((s2d - s1d * s1d / n) / n, 0.0)) AS sd
        FROM st)
      SELECT o.pri, MAX(m.n) AS n_orders,
        ROUND(MAX(m.mean), 6) AS mean_price,
        ROUND(MAX(m.sd), 6) AS sd_price,
        CAST(SUM(CASE WHEN o.x > m.mean + 3.0 * m.sd
                       OR o.x < m.mean - 3.0 * m.sd
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM o JOIN m ON o.pri = m.pri
      GROUP BY o.pri
      ORDER BY o.pri""",

    // same top-16 vocab (freq desc, word asc tie-break), NOT IN probe
    "q166_bool_aggs" -> """
      SELECT o_orderpriority, COUNT(*) AS n_orders,
        CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_big,
        bool_and(o_totalprice > 0) AS all_positive,
        bool_or(o_orderstatus = 'F') AS any_finished,
        CAST(SUM(CAST(CASE WHEN o_totalprice > 150000
          THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE)
          AS big_revenue
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    // same exact decimal power sums, same double formula on top
    "q167_skew_kurtosis" -> """
      WITH s AS (
        SELECT l_returnflag,
          CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(x) AS DOUBLE) AS s1,
          CAST(SUM(x*x) AS DOUBLE) AS s2,
          CAST(SUM(x*x*x) AS DOUBLE) AS s3,
          CAST(SUM(x*x*x*x) AS DOUBLE) AS s4
        FROM (SELECT l_returnflag,
                CAST(l_quantity AS DECIMAL(7,2)) AS x FROM lineitem)
        GROUP BY l_returnflag)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        ROUND((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
          / POW(s2/n - (s1/n)*(s1/n), 1.5), 9) AS skew_qty,
        ROUND((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
            - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
          / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3, 9)
          AS kurt_qty
      FROM s
      ORDER BY l_returnflag""",

    // + INTERVAL 1 MONTH clamps end-of-month exactly like add_months
    "q168_date_arith" -> """
      WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                 AS month_start,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1)
      SELECT strftime(month_start, '%Y-%m-%d') AS month_start,
        n_orders,
        strftime(last_day(month_start), '%Y-%m-%d') AS month_end,
        strftime(CAST(month_start + INTERVAL 1 MONTH AS DATE),
          '%Y-%m-%d') AS next_month_start,
        CAST(isodow(month_start) AS INT) AS isodow_start,
        CAST(date_diff('day', month_start,
          CAST(month_start + INTERVAL 1 MONTH AS DATE)) AS INT)
          AS days_in_month
      FROM m
      ORDER BY month_start""",

    // md5 → unhex → base64 is byte-identical across engines
    "q171_window_dist" -> """
      SELECT c_mktsegment, c_custkey, c_acctbal,
        ROUND(cume_dist() OVER
          (PARTITION BY c_mktsegment
           ORDER BY c_acctbal, c_custkey), 9) AS cd,
        nth_value(c_name, 3) OVER
          (PARTITION BY c_mktsegment
           ORDER BY c_acctbal, c_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          AS third_poorest
      FROM customer
      ORDER BY c_mktsegment, c_custkey""",

    // plain join: the salted formulation must be salt-invariant
    "q172_sql_pipe" -> """
      SELECT o_orderpriority, o_orderstatus, n_orders, revenue,
        CAST(round(revenue / n_orders, 2) AS DOUBLE) AS avg_order
      FROM (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS revenue
        FROM orders
        WHERE o_orderstatus <> 'P'
        GROUP BY o_orderpriority, o_orderstatus)
      WHERE n_orders >= 5
      ORDER BY o_orderpriority, o_orderstatus""",

    // literal patterns: strpos ≡ regexp_instr, NULLIF aligns DuckDB's
    // empty-string no-match with Spark's NULL
    "q174_quantile_family" -> """
      SELECT l_returnflag, COUNT(*) AS n_rows,
        ROUND(median(CAST(l_quantity AS DOUBLE)), 9) AS median_qty,
        ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 9)
          AS q25_cont,
        quantile_disc(CAST(l_quantity AS DOUBLE), 0.25) AS q25_disc,
        quantile_disc(CAST(l_quantity AS DOUBLE), 0.75) AS q75_disc
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // same EXISTS / NOT EXISTS / NULL-poisoned NOT IN semantics
    "q175_exists_subquery" -> """
      WITH with_orders AS (
        SELECT c_mktsegment, COUNT(*) AS n FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment),
      without_orders AS (
        SELECT c_mktsegment, COUNT(*) AS n FROM customer
        WHERE NOT EXISTS
          (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment),
      notin_nullset AS (
        SELECT COUNT(*) AS n FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders
           UNION ALL SELECT CAST(NULL AS BIGINT)))
      SELECT w.c_mktsegment, w.n AS n_with_orders,
        COALESCE(wo.n, 0) AS n_without_orders,
        (SELECT n FROM notin_nullset) AS n_notin_nullset
      FROM with_orders w
      LEFT JOIN without_orders wo ON w.c_mktsegment = wo.c_mktsegment
      ORDER BY w.c_mktsegment""",

    // re-derive host/path/query from the raw columns: the hash proves
    // parse_url against ground truth, not against another parser
    "q177_grouping_id" -> """
      SELECT o_orderstatus, o_orderpriority,
        CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
        CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total_usd
      FROM orders
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus, o_orderpriority""",

    // identical sorted-list sequential fold: list_reduce seeds with
    // the first element, Spark's aggregate with 0.0 — equal bitwise
    "q185_interval_overlap" -> """
      WITH c AS (
        SELECT user_id, event_id AS click_id,
          CAST(ts AS TIMESTAMP) AS c_start,
          CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS c_end
        FROM events WHERE event_type = 'click'),
      v AS (
        SELECT user_id AS v_user, event_id AS view_id,
          CAST(ts AS TIMESTAMP) AS v_start,
          CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS v_end
        FROM events WHERE event_type = 'view'),
      pairs AS (
        SELECT c.user_id, c.click_id, v.view_id
        FROM c JOIN v ON c.user_id = v.v_user
          AND c.c_start <= v.v_end AND v.v_start <= c.c_end)
      SELECT user_id, COUNT(*) AS n_overlaps,
        MIN(click_id) AS min_click, MAX(view_id) AS max_view
      FROM pairs GROUP BY user_id
      ORDER BY user_id""",

    // the contract diff is a fixed metadata fact — literal oracle
    "q188_equidepth_hist" -> """
      WITH d AS (
        SELECT o_totalprice,
          ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders)
      SELECT decile, COUNT(*) AS n_orders,
        MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total
      FROM d GROUP BY decile
      ORDER BY decile""",

    // bag intersection with multiplicity min(n_high, n_low)
    "q189_intersect_all" -> """
      WITH h AS (SELECT l_returnflag, l_linestatus FROM lineitem
        WHERE l_quantity > 25),
      l AS (SELECT l_returnflag, l_linestatus FROM lineitem
        WHERE l_quantity <= 25),
      i AS (SELECT * FROM h INTERSECT ALL SELECT * FROM l)
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n_common
      FROM i GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    // identical ANSI FILTER clause on both engines
    "q190_filter_clause" -> """
      SELECT o_orderstatus, COUNT(*) AS n_total,
        COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
          AS urgent_total,
        MIN(o_orderdate) FILTER (WHERE o_orderpriority = '1-URGENT')
          AS first_urgent
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    // logs rounded to 9 decimals then EXACT decimal power sums —
    // order-free on both engines, no float fold anywhere
    "q192_winsorize" -> """
      WITH cuts AS (SELECT
        quantile_disc(o_totalprice, 0.05) AS lo,
        quantile_disc(o_totalprice, 0.95) AS hi FROM orders)
      SELECT o_orderstatus, COUNT(*) AS n_orders,
        CAST(SUM(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END)
          AS BIGINT) AS n_floor,
        CAST(SUM(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END)
          AS BIGINT) AS n_ceil,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS raw_total,
        CAST(SUM(CAST(least(greatest(o_totalprice, lo), hi)
          AS DECIMAL(18,2))) AS DOUBLE) AS winsorized_total
      FROM orders, cuts
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    // same first-failed-gate attribution, same gate order
    "q245_percentile_cert" -> """
      SELECT o_orderpriority,
        quantile_cont(o_totalprice, 0.5) AS p50,
        quantile_cont(o_totalprice, 0.9) AS p90,
        quantile_cont(o_totalprice, 0.99) AS p99,
        COUNT(*) AS n,
        TRUE AS within_bound
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
    "q246_topk_cert" -> """
      WITH exact AS (
        SELECT p_brand, COUNT(*) AS n_parts FROM part GROUP BY p_brand)
      SELECT p_brand, n_parts, TRUE AS certified
      FROM exact
      ORDER BY n_parts DESC, p_brand
      LIMIT 8""",
    "q247_hll_rollup_cert" -> """
      SELECT lang,
        COUNT(DISTINCT doc_id) AS exact_distinct,
        COUNT(DISTINCT source) AS n_sources,
        TRUE AS within_bound
      FROM documents
      GROUP BY lang
      ORDER BY lang""",

    // The engine finds dist<=1 pairs via delete-1 SymSpell blocking
    // (recall-complete for dist<=1, see Quality.q230FuzzyJoin); the
    // oracle is deliberately the naive all-pairs definition the
    // blocking must reproduce exactly.
    "q234_hll_error_cert" -> """
      SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS exact_parts,
        COUNT(*) AS n_rows,
        TRUE AS within_bound
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // trigram stupid backoff: the oracle rebuilds all four count
    // tables over the same trigram event space, incl. the dedicated
    // c(w2) backoff denominator (NOT the trigram-final unigram table)
    "q292_market_basket" -> """
      WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
      it AS (SELECT l_partkey, COUNT(*) AS c_item FROM b
             GROUP BY l_partkey),
      p AS (
        SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b,
          COUNT(*) AS c_ab
        FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
          AND a.l_partkey < b2.l_partkey
        GROUP BY 1, 2)
      SELECT part_a, part_b, CAST(c_ab AS BIGINT) AS c_ab,
        ROUND(CAST(c_ab AS DOUBLE) / CAST(n.n_orders AS DOUBLE), 9)
          AS support,
        ROUND(CAST(c_ab AS DOUBLE) / CAST(ia.c_item AS DOUBLE), 9)
          AS confidence,
        ROUND(CAST(c_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE) /
          (CAST(ia.c_item AS DOUBLE) * CAST(ib.c_item AS DOUBLE)), 9)
          AS lift
      FROM p
      JOIN it ia ON ia.l_partkey = p.part_a
      JOIN it ib ON ib.l_partkey = p.part_b
      CROSS JOIN n
      WHERE c_ab >= 3
      ORDER BY lift DESC, part_a, part_b LIMIT 20""",

    // spread/median rounds at 9 BEFORE the 0.5 compare on both sides
    // so boundary classification is engine-portable
  )
}
