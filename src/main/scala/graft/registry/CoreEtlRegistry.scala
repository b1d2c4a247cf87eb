package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.streaming._
import graft.registry.OracleDefs._

/** CoreEtl family: catalog entries + DuckDB oracle SQL
  * (mechanical split of SparkEntry; content verbatim). */
object CoreEtlRegistry {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_cleanse_country"  -> (Cleanse.qCleanseCountry _),
    "q20_cleanse_pipeline" -> (Cleanse.qCleansePipeline _),
    "q41_csv_roundtrip"    -> (Egress.q41CsvRoundtrip _),
    "q42_catalog_table"    -> (Egress.q42CatalogTable _),
    "q45_bucketed_join"    -> (Scale.q45BucketedJoin _),
    "q46_partition_pruning" -> (Scale.q46PartitionPruning _),
    "q47_salted_agg"       -> (Scale.q47SaltedAgg _),
    "q58_latest_wins"      -> (Egress.q58LatestWins _),
    "q59_json_roundtrip"   -> (Egress.q59JsonRoundtrip _),
    "q60_orc_roundtrip"    -> (Egress.q60OrcRoundtrip _),
    "q74_merge_apply"      -> (Egress.q74MergeApply _),
    "q75_compaction"       -> (Egress.q75Compaction _),
    "q80_salted_join"      -> (Scale.q80SaltedJoin _),
    "q84_pipeline_staged"  -> (graft.Pipeline.q84PipelineStaged _),
    "q85_global_index"     -> (Scale.q85GlobalIndex _),
    "q96_incremental_rollup" -> (Egress.q96IncrementalRollup _),
    "q111_dynamic_overwrite" -> (Egress.q111DynamicOverwrite _),
    "q131_zorder_layout"   -> (Scale.q131ZorderLayout _),
    "q132_bloom_prefilter" -> (Scale.q132BloomPrefilter _),
    "q134_custom_source"   -> (Egress.q134CustomSource _),
    "q137_default_columns" -> (Egress.q137DefaultColumns _),
    "q143_writer_v2"       -> (Egress.q143WriterV2 _),
    "q164_corpus_diff"     -> (Egress.q164CorpusDiff _),
    "q182_reused_exchange" -> (Scale.q182ReusedExchange _),
    "q183_join_hints"      -> (Scale.q183JoinHints _),
    "q186_schema_contract" -> (Egress.q186SchemaContract _),
    "q187_partition_audit" -> (Egress.q187PartitionAudit _),
    "q195_source_agg_pushdown" -> (Egress.q195SourceAggPushdown _),
    "q196_jdbc_roundtrip"  -> (Egress.q196JdbcRoundtrip _),
    "q202_dwh_load"        -> (graft.Pipeline.q202DwhLoad _),
    "q233_dpp_join"        -> (Scale.q233DppJoin _),
    "q307_zonemap_prune"   -> (TableFormat.q307ZonemapPrune _),
    "q308_zonemap_skipratio" -> (TableFormat.q308ZonemapSkipRatio _),
    "q309_time_travel"     -> (TableFormat.q309TimeTravel _),
    "q310_snapshot_vacuum" -> (TableFormat.q310SnapshotVacuum _),
    "q312_incremental_diff" -> (TableFormat.q312IncrementalDiff _),
    "q313_recluster"       -> (TableFormat.q313Recluster _),
    "q315_snapshot_merge"  -> (TableFormat.q315SnapshotMerge _),
    "q316_partition_evolution" -> (TableFormat.q316PartitionEvolution _),
    "q317_mor_deletes"     -> (TableFormat.q317MergeOnReadDeletes _),
    "q318_commit_compaction" -> (TableFormat.q318CommitCompaction _),
    "q319_schema_evolution" -> (TableFormat.q319SchemaEvolution _),
    "q321_commit_conflict" -> (TableFormat.q321CommitConflict _),
    "q322_manifest_list"   -> (TableFormat.q322ManifestList _),
    "q323_write_audit_publish" -> (TableFormat.q323WriteAuditPublish _),
    "q324_incremental_mv"  -> (TableFormat.q324IncrementalMvRefresh _),
    "q325_asof_timestamp"  -> (TableFormat.q325AsOfTimestamp _),
    "q326_shallow_clone"   -> (TableFormat.q326ShallowClone _),
    "q329_delete_compaction" -> (TableFormat.q329DeleteArtifactCompaction _),
    "q330_branch_vacuum"   -> (TableFormat.q330BranchAwareVacuum _),
    "q331_bloom_lookup"    -> (TableFormat.q331BloomPointLookup _),
    "q332_compact_cluster" -> (TableFormat.q332CompactCluster _),
    "q333_artifact_binding" -> (TableFormat.q333ArtifactVersionBinding _),
    "q334_consumer_pinned_retention" ->
      (TableFormat.q334ConsumerPinnedRetention _),
    "q335_cross_table_txn" -> (TableFormat.q335CrossTableTransaction _),
    "q336_incremental_layout" ->
      (TableFormat.q336IncrementalLayoutMaintenance _),
    "q338_row_change_feed" -> (CdcUpsert.q338RowChangeFeed _),
    "q339_position_deletes" -> (PositionDeletes.q339PositionDeletes _),
    "q340_crosstable_mv" -> (CrossTableMv.q340CrossTableMv _),
    "q341_rewrite_layout" ->
      (TableFormat.q341RewriteLayoutMaintenance _),
    "q342_maintenance_planner" ->
      (MaintenancePlanner.q342MaintenancePlanner _),
    "q343_sql_time_travel" -> (TableFormat.q343SqlTimeTravel _),
    "q344_maintenance_execute" ->
      (MaintenancePlanner.q344ExecutePlan _),
    "q346_sql_merge"       -> (SqlDml.q346SqlMerge _),
    "q347_sql_delete"      -> (SqlDml.q347SqlDelete _),
    "q348_sql_update"      -> (SqlDml.q348SqlUpdate _),
    "q349_sql_version_asof" -> (SqlDml.q349SqlTimeTravel _),
    "q350_string_zonemap"  -> (StringZonemap.q350StringZonemap _),
    "q351_table_changes"   -> (CdcUpsert.q351TableChangesSql _),
    "q352_sql_mor_merge"   -> (SqlDml.q352SqlMorMerge _),
    "q353_sql_mor_delete"  -> (SqlDml.q353SqlMorDelete _),
    "q354_sql_add_column"  -> (SqlDml.q354SqlAddColumn _),
    "q355_sql_insert_overwrite" -> (SqlDml.q355SqlInsertOverwrite _),
    "q356_rlo_vacuum"      -> (SqlDml.q356RloVacuum _),
    "q357_sql_merge_sync"  -> (SqlDml.q357SqlMergeSync _),
    "q359_sql_stats_agg"   -> (SqlDml.q359SqlStatsAgg _),
    "q360_rlo_optimize"    -> (SqlDml.q360RloOptimize _),
    "q361_compact_deletes" -> (SqlDml.q361CompactDeletes _),
    "q362_sql_ctas"        -> (SqlDml.q362SqlCtas _),
    "q363_string_routed_delete" ->
      (SqlDml.q363StringRoutedDelete _),
    "q364_metadata_delete"      -> (SqlDml.q364MetadataDelete _),
    "q365_numeric_routed_delete" ->
      (SqlDml.q365NumericRoutedDelete _),
    "q366_numeric_metadata_delete" ->
      (SqlDml.q366NumericMetadataDelete _),
    "q367_connector_table_changes" ->
      (SqlDml.q367ConnectorTableChanges _),
    "q368_plan_maintenance" -> (SqlDml.q368PlanMaintenance _),
    "q369_sql_rtas"         -> (SqlDml.q369SqlRtas _),
    "q370_nested_wide_dml"  -> (SqlDml.q370NestedWideDml _),
    "q371_connector_stream_source" ->
      (SqlDml.q371ConnectorStreamSource _),
  )

  val oracleSql: Map[String, String] = Map(
    "q19_cleanse_country" -> """
      SELECT c_custkey,
        CASE hit WHEN 'England' THEN 'United Kingdom'
                 WHEN 'Scotland' THEN 'United Kingdom'
                 WHEN 'Wales' THEN 'United Kingdom'
                 WHEN 'West Germany' THEN 'Germany'
                 ELSE hit END AS country_eu
      FROM (
        SELECT c_custkey,
          (list_filter(
             list_filter(
               list_transform(
                 string_split(
                   replace((['France, United Kingdom', '"England"', 'Peru',
                             '', ' West Germany , Spain '])
                           [CAST(c_custkey % 5 AS INTEGER) + 1], '"', ''),
                   ','),
                 x -> trim(x)),
               x -> x <> ''),
             x -> list_contains(
               ['United Kingdom','England','Scotland','Wales','Ireland',
                'Spain','France','Germany','West Germany','Italy','Portugal',
                'Netherlands','Belgium','Sweden','Norway','Denmark','Finland',
                'Poland','Czech Republic','Austria','Switzerland','Luxembourg',
                'Russia','Ukraine','Belarus','Turkey','Greece','Cyprus',
                'Iceland'], x)))[1] AS hit
        FROM customer) t
      WHERE hit IS NOT NULL
      ORDER BY c_custkey""",
    "q20_cleanse_pipeline" -> """
      SELECT doc_id,
        TRIM(replace(replace(substring(text, 1, 40), '"', ''), ',', ' -'))
          AS title,
        CASE WHEN lang IN ('en','fr','de','es') THEN lang
             ELSE 'UNKNOWN' END AS lang,
        CAST(regexp_replace(source, '[^0-9]', '', 'g') AS INTEGER) AS src_num,
        CASE lang WHEN 'en' THEN 'English' WHEN 'fr' THEN 'French'
                  WHEN 'de' THEN 'German' WHEN 'es' THEN 'Spanish'
                  ELSE 'Desconocido' END AS lang_meaning,
        string_split(text, ' ')[1] AS first_word,
        CASE WHEN string_split(text, ' ')[1] LIKE '%join%' THEN 'Join'
             WHEN string_split(text, ' ')[1] LIKE '%merge%' THEN 'Join'
             WHEN string_split(text, ' ')[1] LIKE '%scan%' THEN 'Scan'
             WHEN string_split(text, ' ')[1] LIKE '%filter%' THEN 'Scan'
             WHEN string_split(text, ' ')[1] LIKE '%sort%' THEN 'Sort'
             WHEN string_split(text, ' ')[1] LIKE '%order%' THEN 'Sort'
             WHEN string_split(text, ' ')[1] LIKE '%group%' THEN 'Agg'
             WHEN string_split(text, ' ')[1] LIKE '%window%' THEN 'Agg'
             ELSE 'Other' END AS topic_group
      FROM documents
      WHERE n_chars >= 100
        AND regexp_replace(source, '[^0-9]', '', 'g') <> ''
        AND lang IN ('en','fr','de','es')
      ORDER BY doc_id""",
    "q41_csv_roundtrip" -> """
      SELECT c_mktsegment, COUNT(*) AS n_customers,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          AS total_acctbal
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    "q42_catalog_table" -> """
      SELECT n_regionkey, COUNT(*) AS n_nations,
        MIN(n_name) AS first_nation
      FROM nation
      GROUP BY n_regionkey
      ORDER BY n_regionkey""",
    "q45_bucketed_join" -> """
      SELECT o_orderpriority, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
    "q46_partition_pruning" -> """
      SELECT CAST(MONTH(o_orderdate) AS INTEGER) AS mon,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      WHERE YEAR(o_orderdate) = 1997
      GROUP BY 1
      ORDER BY mon""",
    "q47_salted_agg" -> """
      SELECT o_orderpriority, COUNT(*) AS n
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
    "q58_latest_wins" -> """
      SELECT user_id, event_id, tsx AS ts, event_type, value FROM (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
               event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1
      ORDER BY user_id""",

    // oracle on the original parquet: the jsonl cycle must reproduce it
    "q59_json_roundtrip" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents
      GROUP BY lang
      ORDER BY lang""",
    "q60_orc_roundtrip" -> """
      SELECT o_orderstatus, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",
    "q74_merge_apply" -> """
      WITH ev AS (
        SELECT event_id, user_id, event_type, value
        FROM events WHERE event_id < 1500),
      base AS (SELECT * FROM ev WHERE event_id % 2 = 0),
      chg AS (
        SELECT event_id, user_id, event_type, value + 1000 AS value,
          CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        FROM ev WHERE event_id % 3 = 0)
      SELECT COALESCE(c.event_id, b.event_id) AS event_id,
        COALESCE(c.user_id, b.user_id) AS user_id,
        COALESCE(c.event_type, b.event_type) AS event_type,
        COALESCE(c.value, b.value) AS value,
        CASE WHEN c.event_id IS NOT NULL THEN 'chg' ELSE 'base' END AS src
      FROM base b FULL OUTER JOIN chg c ON b.event_id = c.event_id
      WHERE COALESCE(c.op, '') <> 'D'
      ORDER BY event_id""",

    // oracle on the original parquet: the small-file + compaction
    // cycle must preserve every row exactly
    "q75_compaction" -> """
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        COUNT(DISTINCT doc_id) AS n_distinct_docs
      FROM documents
      GROUP BY lang
      ORDER BY lang""",

    // identical semantics to q51, executed by the custom
    // AsOfJoinExec physical operator instead of the union+window plan
    "q84_pipeline_staged" -> """
      SELECT c_mktsegment, COUNT(*) AS n_customers,
        COUNT(DISTINCT c_nationkey) AS n_nations,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          AS total_acctbal
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    // distributed two-phase ranking must equal the single-sequence
    // ROW_NUMBER over the same total order
    "q85_global_index" -> """
      SELECT o_orderkey, o_custkey, o_totalprice,
        ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
          AS rank
      FROM orders
      ORDER BY rank""",
    "q111_dynamic_overwrite" -> """
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        COUNT(*) AS n_orders,
        CAST(SUM(CASE WHEN YEAR(o_orderdate) = 1997
                      THEN CAST(o_totalprice AS DECIMAL(18,2)) * 2
                      ELSE CAST(o_totalprice AS DECIMAL(18,2)) END)
          AS DOUBLE) AS total
      FROM orders
      GROUP BY 1
      ORDER BY o_year""",

    // same sequential fold: list_reduce over the ts-ordered values
    // seeds with the first element exactly like the mapGroups loop
    "q96_incremental_rollup" -> """
      SELECT o_orderpriority, CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY 1, 2
      ORDER BY o_orderpriority, yr""",

    // fully spelled-out equivalent of the GROUP BY ALL / ORDER BY ALL
    // / lateral-alias sugar: sugar must not change semantics
    "q131_zorder_layout" -> """
      WITH base AS (
        SELECT p_partkey, CAST(p_size AS INTEGER) AS x,
          GREATEST(LEAST(CAST(FLOOR((p_retailprice - 900) / 2)
            AS INTEGER), 63), 0) AS y
        FROM part),
      zv AS (
        SELECT p_partkey, x, y,
          (((x >> 0) & 1) << 0) + (((y >> 0) & 1) << 1) +
          (((x >> 1) & 1) << 2) + (((y >> 1) & 1) << 3) +
          (((x >> 2) & 1) << 4) + (((y >> 2) & 1) << 5) +
          (((x >> 3) & 1) << 6) + (((y >> 3) & 1) << 7) +
          (((x >> 4) & 1) << 8) + (((y >> 4) & 1) << 9) +
          (((x >> 5) & 1) << 10) + (((y >> 5) & 1) << 11) AS z
        FROM base),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY z, p_partkey) AS rk
        FROM zv)
      SELECT CAST((rk - 1) // 64 AS INTEGER) AS file_id,
        COUNT(*) AS n_parts,
        MIN(x) AS min_size, MAX(x) AS max_size,
        MIN(y) AS min_priceb, MAX(y) AS max_priceb,
        MIN(z) AS min_z, MAX(z) AS max_z
      FROM ranked
      GROUP BY 1
      ORDER BY 1""",

    // plain join: bloom false positives must all be removed by the
    // real join, so the prefiltered plan is value-identical to this
    "q132_bloom_prefilter" -> """
      SELECT s_nationkey, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey < 5
      GROUP BY s_nationkey
      ORDER BY s_nationkey""",

    // the originating rows: byte counts + digests must survive the
    // file write → binaryFile read cycle (strlen = UTF-8 bytes, the
    // same bytes Spark writes; DuckDB md5 hashes those bytes)
    "q134_custom_source" -> """
      WITH src AS (
        SELECT i AS id, CAST(i % 16 AS INTEGER) AS bucket,
          md5(CAST(i AS VARCHAR)) AS fp
        FROM range(0, 5000) t(i)
        WHERE i >= 1000 AND i < 4000)
      SELECT bucket, COUNT(*) AS n_rows,
        MIN(fp) AS min_fp, MAX(fp) AS max_fp
      FROM src
      GROUP BY bucket
      ORDER BY bucket""",

    // the batch GROUP BY the cross-batch named state must converge to
    "q137_default_columns" -> """
      SELECT n_nationkey AS id, 'new' AS status, 10 AS score
      FROM nation
      UNION ALL SELECT 1000, 'new', 5
      ORDER BY id""",

    // by-name union with a nulled missing column, repaired downstream
    "q143_writer_v2" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderpriority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total_usd
      FROM orders
      GROUP BY 1, 2
      ORDER BY 1, 2""",

    // same float→double widening, same floor(x/scale + 0.5) rule;
    // the error term recomputes the code inline (identical value)
    "q164_corpus_diff" -> """
      WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
      v2 AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0
               THEN md5(text || ' [amended v2]')
               ELSE md5(text) END AS h2
        FROM documents WHERE doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id + 1000000, md5('new:' || text)
        FROM documents WHERE doc_id < 100)
      SELECT CASE WHEN h1 IS NULL THEN 'added'
                  WHEN h2 IS NULL THEN 'removed'
                  WHEN h1 = h2 THEN 'unchanged'
                  ELSE 'changed' END AS change,
        COUNT(*) AS n_docs
      FROM v1 FULL OUTER JOIN v2 USING (doc_id)
      GROUP BY 1
      ORDER BY 1""",

    // single data batch: update mode emits each window exactly once
    "q80_salted_join" -> """
      SELECT c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    // the nested-SELECT form the pipe syntax de-sugars to
    "q182_reused_exchange" -> """
      WITH t AS (
        SELECT o_orderpriority AS priority, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS total
        FROM orders GROUP BY o_orderpriority)
      SELECT t.priority, t.n_orders, t.total,
        CAST(round(t.total / m.max_total, 9) AS DOUBLE) AS share_of_max,
        m.max_orders
      FROM t CROSS JOIN (SELECT MAX(total) AS max_total,
        MAX(n_orders) AS max_orders FROM t) m
      ORDER BY t.priority""",

    // all interval matches + non-matching clicks whose join window
    // closed strictly before the drain's final watermark (min of the
    // two sides' max event time, minus the 30-minute delay)
    "q186_schema_contract" -> """
      SELECT * FROM (VALUES
        ('doc_id',  'bigint', 'bigint', 'ok'),
        ('lang',    'string', 'string', 'ok'),
        ('n_chars', 'bigint', 'int',    'type_mismatch'),
        ('quality', 'double', NULL,     'missing'),
        ('source',  'string', NULL,     'missing'),
        ('src',     NULL,     'string', 'unexpected'),
        ('text',    'string', 'string', 'ok'))
        AS t(field, expected, actual, status)
      ORDER BY field""",

    // same spine, same deliberate June-1995 hole
    "q187_partition_audit" -> """
      WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
          COUNT(*) AS n
        FROM orders GROUP BY 1),
      spine AS (
        SELECT unnest(generate_series((SELECT MIN(mo) FROM m),
          (SELECT MAX(mo) FROM m), INTERVAL 1 MONTH)) AS mo)
      SELECT strftime(CAST(s.mo AS DATE), '%Y-%m-%d') AS o_month,
        CASE WHEN m.mo IS NULL OR s.mo = DATE '1995-06-01'
          THEN 'missing' ELSE 'present' END AS status,
        CAST(CASE WHEN m.mo IS NULL OR s.mo = DATE '1995-06-01'
          THEN 0 ELSE m.n END AS BIGINT) AS n_rows
      FROM spine s LEFT JOIN m ON CAST(s.mo AS DATE) = m.mo
      ORDER BY o_month""",

    // ANSI ntile: the first (n mod 10) deciles take the extra row
    "q195_source_agg_pushdown" -> """
      SELECT CAST(i % 16 AS INT) AS bucket, COUNT(*) AS n_rows,
        CAST(SUM(i) AS BIGINT) AS id_sum,
        MIN(i) AS id_min, MAX(i) AS id_max
      FROM range(100000, 1000000) t(i)
      GROUP BY 1
      ORDER BY 1""",

    // the JDBC cycle must be lossless: oracle on the original parquet
    "q196_jdbc_roundtrip" -> """
      SELECT s_nationkey, COUNT(*) AS n_suppliers,
        CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          AS total_acctbal,
        MIN(s_name) AS first_name
      FROM supplier
      GROUP BY s_nationkey
      ORDER BY s_nationkey""",

    // recovery must be invisible: two checkpointed incarnations emit
    // exactly the single-run append-mode window set (q136's oracle)
    "q202_dwh_load" -> """
      SELECT p_brand, COUNT(*) AS n_parts,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total_retail,
        MIN(p_type) AS min_type
      FROM part
      WHERE p_size IS NOT NULL
      GROUP BY p_brand
      ORDER BY p_brand""",

    // add-one bigram LM trained on the train split, held-out docs
    // scored by mean nll; parallel unnests zip into aligned bigrams
    "q183_join_hints" -> """
      SELECT r_name, COUNT(*) AS n_customers,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          AS total_bal
      FROM customer c
      JOIN nation n ON c_nationkey = n_nationkey
      JOIN region r ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name""",

    // the media perceptual-hash tier, recomputed all-pairs: the 8-chunk
    // pigeonhole makes the Spark banded result EXACTLY the hamming<=7
    // pair set, so a brute-force oracle pins it bit-for-bit. Char
    // arithmetic here == the Spark side's payload-byte arithmetic
    // because the fixture is ASCII (documents are synthesized from an
    // ASCII vocabulary; q133's md5 round-trip would catch drift).
    "q233_dpp_join" -> """
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      WHERE YEAR(o_orderdate) >= 1999
      GROUP BY 1
      ORDER BY o_year""",

    // HLL certificate: the oracle owns the exact side and asserts the
    // within-bound flag as literal TRUE — a sketch drifting past 3×rsd
    // hash-mismatches the round (the estimate itself is engine-specific
    // and deliberately not in the output)

    // the zone-map pruned read is layout-INDEPENDENT by contract: the
    // oracle is the plain predicate scan; the pruning itself is the
    // files-read guarantee TableFormatSpec asserts from the plan
    "q307_zonemap_prune" -> """
      SELECT CAST(p_size AS BIGINT) AS x, COUNT(*) AS n_parts,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_retail
      FROM part
      WHERE CAST(p_size AS BIGINT) BETWEEN 15 AND 25
        AND GREATEST(LEAST(CAST(FLOOR((p_retailprice - 900) / 2)
              AS BIGINT), 63), 0) BETWEEN 3 AND 8
      GROUP BY 1
      ORDER BY x""",

    // full manifest re-derivation: shared CTEs in OracleDefs
    // (zmapManifestCtes) — same curve, same file assignment, same
    // overlap arithmetic, so every file count is hash-pinned
    "q308_zonemap_skipratio" -> zmapSkipRatioOracle,

    // re-cluster certificate: slice aggregate layout-independent,
    // file counts re-derived per layout from the shared CTEs
    "q313_recluster" -> zmapReclusterOracle,

    // each version re-derived from the segment-cut / retention-cutoff
    // predicates: v1 = commits c0+c1 (orderdate < 1999), v2 = +c2
    // (everything), v3 = v2 minus the retention victims (< 1996)
    "q309_time_travel" -> """
      WITH v1 AS (SELECT * FROM orders
                  WHERE o_orderdate < TIMESTAMP '1999-01-01'),
      v3 AS (SELECT * FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01')
      SELECT 1 AS version, COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price,
        MIN(o_orderkey) AS min_okey, MAX(o_orderkey) AS max_okey
      FROM v1
      UNION ALL
      SELECT 2, COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        MIN(o_orderkey), MAX(o_orderkey)
      FROM orders
      UNION ALL
      SELECT 3, COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        MIN(o_orderkey), MAX(o_orderkey)
      FROM v3
      ORDER BY version""",

    // reachability re-derived from the cut/cutoff predicates: c0
    // (orderdate < 1997) is the one segment the retention rewrite
    // retired, so it is the one the vacuum must reclaim; n_rows_after
    // is recounted from the post-vacuum table on the Spark side, so a
    // vacuum that deletes a live segment (or misses c0) hash-fails
    "q310_snapshot_vacuum" -> """
      WITH segs(commit_id, status) AS (VALUES
        ('c0', 'reclaimed'), ('c0_rw', 'retained'),
        ('c1', 'retained'), ('c2', 'retained')),
      counts AS (
        SELECT 'c0' AS cid, COUNT(*) AS n FROM orders
        WHERE o_orderdate < TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT 'c0_rw', COUNT(*) FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT 'c1', COUNT(*) FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
        UNION ALL
        SELECT 'c2', COUNT(*) FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01')
      SELECT s.commit_id, c.n AS n_rows, s.status,
        CASE WHEN s.status = 'retained' THEN c.n ELSE 0 END
          AS n_rows_after
      FROM segs s JOIN counts c ON c.cid = s.commit_id
      ORDER BY s.commit_id""",

    // the merged version from first principles: c1_mg applies the
    // 1997-H1 corrections (+1000.00 per updated row, deletes removed)
    // to the [1997,1999) segment; c0_rw/c2 carry; c3 is the insert
    // batch — n_rows/sum_price are counted from the REAL post-merge
    // table on the Spark side, so any mis-applied change hash-fails
    "q315_snapshot_merge" -> """
      SELECT 'c0_rw' AS commit_id, COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price,
        'carried' AS status
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      UNION ALL
      SELECT 'c1_mg', COUNT(*),
        CAST(SUM(CAST(CASE WHEN o_orderkey % 100 = 7
            AND o_orderdate < TIMESTAMP '1997-07-01'
          THEN o_totalprice + CAST(1000 AS DOUBLE)
          ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE),
        'rewritten'
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
        AND NOT (o_orderkey % 100 = 29
          AND o_orderdate < TIMESTAMP '1997-07-01')
      UNION ALL
      SELECT 'c2', COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        'carried'
      FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      UNION ALL
      SELECT 'c3', COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        'appended'
      FROM orders WHERE o_orderkey % 100 = 13
      ORDER BY commit_id""",

    // the probe range [1998-06-01, 2000-06-01) re-cut by the two
    // partition-grain generations: one coarse year segment (c1) and
    // three fine half-year segments (h0..h2) overlap it; counts come
    // from the pruned read on the Spark side so routing is in the hash
    "q316_partition_evolution" -> """
      WITH probe AS (
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-06-01'
          AND o_orderdate < TIMESTAMP '2000-06-01')
      SELECT commit_id,
        CASE WHEN commit_id LIKE 'c%' THEN 'year'
             ELSE 'half_year' END AS grain,
        COUNT(*) AS n_in_range,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_in_range
      FROM (
        SELECT o_orderkey, o_totalprice,
          CASE WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 'c1'
               WHEN o_orderdate < TIMESTAMP '1999-07-01' THEN 'h0'
               WHEN o_orderdate < TIMESTAMP '2000-01-01' THEN 'h1'
               ELSE 'h2' END AS commit_id
        FROM probe) t
      GROUP BY commit_id
      ORDER BY commit_id""",

    // every version from predicate arithmetic over base + delete
    // sets: v3 = the live table (>= 1996), v4 = minus takedown keys
    // (%1000=41), v5 = minus the c1-span correction keys (%10=3 in
    // [1997,1999)), v6 = identical content to v5 (the fold moves
    // bytes, never rows). n_live_deletes counts scoped artifact rows:
    // d1's routed keys at v4, +d2's at v5, and at v6 only d1 rows
    // whose target segment survived the fold (c1's went inert).
    // n_rows/sum_price are counted from the REAL MoR/folded reads on
    // the Spark side, so a mis-applied delete hash-fails here.
    "q317_mor_deletes" -> """
      WITH live AS (SELECT * FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
      d1 AS (SELECT * FROM live WHERE o_orderkey % 1000 = 41),
      d2 AS (SELECT * FROM live WHERE o_orderkey % 10 = 3
             AND o_orderdate >= TIMESTAMP '1997-01-01'
             AND o_orderdate < TIMESTAMP '1999-01-01'),
      v4 AS (SELECT * FROM live WHERE NOT o_orderkey % 1000 = 41),
      v5 AS (SELECT * FROM v4 WHERE NOT (o_orderkey % 10 = 3
             AND o_orderdate >= TIMESTAMP '1997-01-01'
             AND o_orderdate < TIMESTAMP '1999-01-01'))
      SELECT 3 AS version, 'base' AS status, COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price,
        CAST(0 AS BIGINT) AS n_live_deletes
      FROM live
      UNION ALL
      SELECT 4, 'mor', COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        (SELECT COUNT(*) FROM d1)
      FROM v4
      UNION ALL
      SELECT 5, 'mor', COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        (SELECT COUNT(*) FROM d1) + (SELECT COUNT(*) FROM d2)
      FROM v5
      UNION ALL
      SELECT 6, 'folded', COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        (SELECT COUNT(*) FROM d1
         WHERE o_orderdate < TIMESTAMP '1997-01-01'
            OR o_orderdate >= TIMESTAMP '1999-01-01')
      FROM v5
      ORDER BY version""",

    // both layouts re-derived from the half-year cut: per-bucket
    // min/max stats decide files_scanned under the before layout,
    // folded pack stats (bucket // 4) under the after layout; the
    // probe slice itself is layout-independent and counted from the
    // real pruned reads on the Spark side
    "q318_commit_compaction" -> """
      WITH b AS (
        SELECT o_totalprice, o_orderdate,
          (CAST(YEAR(o_orderdate) AS INTEGER) - 1995) * 2 +
          CASE WHEN MONTH(o_orderdate) > 6 THEN 1 ELSE 0 END AS bk
        FROM orders),
      stats AS (
        SELECT bk, bk // 4 AS pk, MIN(o_orderdate) AS mn,
          MAX(o_orderdate) AS mx
        FROM b GROUP BY bk),
      pstats AS (
        SELECT pk, MIN(mn) AS mn, MAX(mx) AS mx FROM stats GROUP BY pk),
      probe AS (
        SELECT COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM b
        WHERE o_orderdate >= TIMESTAMP '1997-03-01'
          AND o_orderdate < TIMESTAMP '1999-03-01')
      SELECT 'after' AS phase,
        (SELECT COUNT(*) FROM pstats) AS files_total,
        (SELECT COUNT(*) FROM pstats
         WHERE mn < TIMESTAMP '1999-03-01'
           AND mx >= TIMESTAMP '1997-03-01') AS files_scanned,
        n_rows, sum_price
      FROM probe
      UNION ALL
      SELECT 'before',
        (SELECT COUNT(*) FROM stats),
        (SELECT COUNT(*) FROM stats
         WHERE mn < TIMESTAMP '1999-03-01'
           AND mx >= TIMESTAMP '1997-03-01'),
        n_rows, sum_price
      FROM probe
      ORDER BY phase""",

    // the three resolution rules from first principles: c0 predates
    // field 3 (cust NULL-filled), c1 reaches it through the rename
    // mapping (values from the OLD physical column), c2 writes it
    // natively — a wrong field-id mapping moves sum_cust or
    // n_cust_null and hash-fails
    "q319_schema_evolution" -> """
      SELECT 'c0' AS commit_id, COUNT(*) AS n_rows,
        COUNT(*) AS n_cust_null, CAST(0 AS BIGINT) AS sum_cust,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      UNION ALL
      SELECT 'c1', COUNT(*), CAST(0 AS BIGINT),
        CAST(SUM(o_custkey) AS BIGINT),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
      UNION ALL
      SELECT 'c2', COUNT(*), CAST(0 AS BIGINT),
        CAST(SUM(o_custkey) AS BIGINT),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      ORDER BY commit_id""",

    // both metadata levels re-derived from the half-year/bimonthly
    // cut: commit envelopes decide manifests_read, file stats within
    // the surviving commits decide files_selected; the probe slice is
    // counted from the real doubly-pruned read on the Spark side
    "q322_manifest_list" -> """
      WITH b AS (
        SELECT o_totalprice, o_orderdate,
          (CAST(YEAR(o_orderdate) AS INTEGER) - 1995) * 2 +
          CASE WHEN MONTH(o_orderdate) > 6 THEN 1 ELSE 0 END AS ck,
          ((CAST(MONTH(o_orderdate) AS INTEGER) - 1) // 2) % 3 AS fk
        FROM orders),
      fstats AS (
        SELECT ck, fk, MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx
        FROM b GROUP BY ck, fk),
      cstats AS (
        SELECT ck, MIN(mn) AS mn, MAX(mx) AS mx FROM fstats GROUP BY ck),
      hitc AS (
        SELECT ck FROM cstats
        WHERE mn < TIMESTAMP '1997-08-01' AND mx >= TIMESTAMP '1997-03-01'),
      hitf AS (
        SELECT ck, fk FROM fstats
        WHERE ck IN (SELECT ck FROM hitc)
          AND mn < TIMESTAMP '1997-08-01'
          AND mx >= TIMESTAMP '1997-03-01')
      SELECT
        (SELECT COUNT(*) FROM cstats) AS manifests_total,
        (SELECT COUNT(*) FROM hitc) AS manifests_read,
        (SELECT COUNT(*) FROM fstats) AS files_total,
        (SELECT COUNT(*) FROM hitf) AS files_selected,
        COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM b
      WHERE o_orderdate >= TIMESTAMP '1997-03-01'
        AND o_orderdate < TIMESTAMP '1997-08-01'""",

    // the resolution rule from first principles: each probe instant
    // falls inside one version's validity window, and the aggregates
    // are q309's per-version maths — an off-by-one in max(version
    // WHERE committed_at <= t) moves whole versions between rows
    "q325_asof_timestamp" -> """
      WITH v1 AS (SELECT * FROM orders
                  WHERE o_orderdate < TIMESTAMP '1999-01-01'),
      v3 AS (SELECT * FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01')
      SELECT '2000-01-15' AS as_of, 1 AS resolved_version,
        COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM v1
      UNION ALL
      SELECT '2000-02-15', 2, COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM orders
      UNION ALL
      SELECT '2000-03-15', 3, COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM v3
      ORDER BY as_of""",

    // all four (table, version) states from predicate arithmetic:
    // the clone starts as the source's live set, each side sees its
    // own append and never the other's — a leak across the boundary
    // moves a row count and hash-fails
    "q326_shallow_clone" -> """
      WITH live AS (SELECT * FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
      x0 AS (SELECT * FROM orders WHERE o_orderkey % 100 = 43),
      y0 AS (SELECT * FROM orders WHERE o_orderkey % 100 = 47)
      SELECT 'clone' AS tbl, 1 AS version,
        (SELECT COUNT(*) FROM live) AS n_rows,
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM live)
          AS DOUBLE) AS sum_price
      UNION ALL
      SELECT 'clone', 2,
        (SELECT COUNT(*) FROM live) + (SELECT COUNT(*) FROM x0),
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM live)
          + (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM x0)
          AS DOUBLE)
      UNION ALL
      SELECT 'source', 3,
        (SELECT COUNT(*) FROM live),
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM live)
          AS DOUBLE)
      UNION ALL
      SELECT 'source', 4,
        (SELECT COUNT(*) FROM live) + (SELECT COUNT(*) FROM y0),
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM live)
          + (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM y0)
          AS DOUBLE)
      ORDER BY tbl, version""",

    // the refreshed MV must be BIT-EQUAL to the full v3 recompute —
    // the whole claim of delta maintenance; exact decimal +/-
    // arithmetic on both sides makes the comparison exact, and a
    // dropped delta / double-applied segment / key leak hash-fails
    "q324_incremental_mv" -> """
      SELECT o_custkey, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      GROUP BY o_custkey
      ORDER BY o_custkey""",

    // both audits from first principles: w1 is clean (zero
    // violations, published), w2's upstream sign flip corrupts every
    // third row (counted, rejected), and main ends at base + w1 only
    // — a published corrupt batch or a lost clean one hash-fails
    "q323_write_audit_publish" -> """
      WITH live AS (SELECT * FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
      w1 AS (SELECT * FROM orders WHERE o_orderkey % 100 = 31),
      w2 AS (SELECT * FROM orders WHERE o_orderkey % 100 = 37)
      SELECT 'final_main' AS entity,
        (SELECT COUNT(*) FROM live) + (SELECT COUNT(*) FROM w1)
          AS n_rows,
        CAST(0 AS BIGINT) AS n_violations, 'v4' AS action
      UNION ALL
      SELECT 'w1', COUNT(*), CAST(0 AS BIGINT), 'published' FROM w1
      UNION ALL
      SELECT 'w2', COUNT(*),
        (SELECT COUNT(*) FROM w2 WHERE o_orderkey % 3 = 0),
        'rejected'
      FROM w2
      ORDER BY entity""",

    // the race's outcome from first principles: appends always land
    // (a/b), the first rewrite of c1 lands by rebase (c), the second
    // aborts with zero residue (d — a leak makes its n_rows nonzero
    // and hash-fails), and the final version carries base + both
    // appends with c1 swapped for its content-identical rewrite
    "q321_commit_conflict" -> """
      WITH live AS (SELECT * FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
      wa AS (SELECT * FROM orders WHERE o_orderkey % 100 = 17),
      wb AS (SELECT * FROM orders WHERE o_orderkey % 100 = 23)
      SELECT 'a' AS entity, 'append' AS intent, 'committed' AS outcome,
        COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM wa
      UNION ALL
      SELECT 'b', 'append', 'rebased', COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM wb
      UNION ALL
      SELECT 'c', 'rewrite', 'rebased', COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
      UNION ALL
      SELECT 'd', 'rewrite', 'aborted', CAST(0 AS BIGINT),
        CAST(0 AS DOUBLE)
      UNION ALL
      SELECT 'final', 'read', 'v6',
        (SELECT COUNT(*) FROM live) + (SELECT COUNT(*) FROM wa)
          + (SELECT COUNT(*) FROM wb),
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM live)
          + (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM wa)
          + (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM wb)
          AS DOUBLE)
      ORDER BY entity""",

    // the compactor's whole effect from predicate arithmetic: the
    // read is byte-stable (n_rows/sum_price equal across phases —
    // counted from the REAL reads on the Spark side), the artifact
    // rows drop by exactly the inert set (d2 entirely + d1's
    // c1-targeted rows, whose segment folded away), and the
    // version/batch/manifest counters collapse to one each
    "q329_delete_compaction" -> """
      WITH live AS (SELECT * FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
      d1 AS (SELECT * FROM live WHERE o_orderkey % 1000 = 41),
      d2 AS (SELECT * FROM live WHERE o_orderkey % 10 = 3
             AND o_orderdate >= TIMESTAMP '1997-01-01'
             AND o_orderdate < TIMESTAMP '1999-01-01'),
      v5 AS (SELECT * FROM live
             WHERE NOT o_orderkey % 1000 = 41
               AND NOT (o_orderkey % 10 = 3
                 AND o_orderdate >= TIMESTAMP '1997-01-01'
                 AND o_orderdate < TIMESTAMP '1999-01-01')),
      keep AS (SELECT * FROM d1
               WHERE o_orderdate < TIMESTAMP '1997-01-01'
                  OR o_orderdate >= TIMESTAMP '1999-01-01')
      SELECT 'after' AS phase, CAST(1 AS BIGINT) AS n_versions,
        CAST(1 AS BIGINT) AS n_dbatches,
        (SELECT COUNT(*) FROM keep) AS n_artifact_rows,
        CAST(1 AS BIGINT) AS n_dmanifest_rows,
        COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM v5
      UNION ALL
      SELECT 'before', CAST(6 AS BIGINT), CAST(2 AS BIGINT),
        (SELECT COUNT(*) FROM d1) + (SELECT COUNT(*) FROM d2),
        CAST(5 AS BIGINT),
        COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM v5
      ORDER BY phase""",

    // both phases from reachability arithmetic: while the branch
    // lives, c0 is pinned (retained_by_branch, still counted on
    // disk); once it drops, the SAME maintenance pass reclaims
    // exactly c0 — a ref-blind vacuum zeroes phase 1's c0 row and
    // hash-fails
    "q330_branch_vacuum" -> """
      WITH c0 AS (SELECT COUNT(*) AS n FROM orders
                  WHERE o_orderdate < TIMESTAMP '1997-01-01'),
      c0rw AS (SELECT COUNT(*) AS n FROM orders
               WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                 AND o_orderdate < TIMESTAMP '1997-01-01'),
      c1 AS (SELECT COUNT(*) AS n FROM orders
             WHERE o_orderdate >= TIMESTAMP '1997-01-01'
               AND o_orderdate < TIMESTAMP '1999-01-01'),
      c2 AS (SELECT COUNT(*) AS n FROM orders
             WHERE o_orderdate >= TIMESTAMP '1999-01-01')
      SELECT 'p1_branch_live' AS phase, 'c0' AS commit_id,
        (SELECT n FROM c0) AS n_rows,
        'retained_by_branch' AS status,
        (SELECT n FROM c0) AS n_rows_after
      UNION ALL SELECT 'p1_branch_live', 'c0_rw',
        (SELECT n FROM c0rw), 'retained', (SELECT n FROM c0rw)
      UNION ALL SELECT 'p1_branch_live', 'c1',
        (SELECT n FROM c1), 'retained', (SELECT n FROM c1)
      UNION ALL SELECT 'p1_branch_live', 'c2',
        (SELECT n FROM c2), 'retained', (SELECT n FROM c2)
      UNION ALL SELECT 'p2_branch_dropped', 'c0',
        (SELECT n FROM c0), 'reclaimed', CAST(0 AS BIGINT)
      UNION ALL SELECT 'p2_branch_dropped', 'c0_rw',
        (SELECT n FROM c0rw), 'retained', (SELECT n FROM c0rw)
      UNION ALL SELECT 'p2_branch_dropped', 'c1',
        (SELECT n FROM c1), 'retained', (SELECT n FROM c1)
      UNION ALL SELECT 'p2_branch_dropped', 'c2',
        (SELECT n FROM c2), 'retained', (SELECT n FROM c2)
      ORDER BY phase, commit_id""",

    // the whole ranked plan from the cut arithmetic: per-segment
    // file counts from the same rank-div cuts, fill/density/scan
    // fraction/selectivity from the same integer-over-integer
    // divisions, verbs from the same published thresholds, ranks by
    // benefit — a planner that mis-prices a segment, misses a
    // pathology, or invents work on the healthy segment hash-fails
    "q342_maintenance_planner" -> """
      WITH o AS (SELECT o_orderkey,
          CAST(o_orderkey % 4 AS INTEGER) AS seg FROM orders),
      n AS (SELECT COUNT(*) AS nn FROM orders),
      rpf AS (SELECT GREATEST(64, ((SELECT nn FROM n) + 63) // 64)
        AS r),
      sml AS (SELECT GREATEST(1, (SELECT r FROM rpf) // 8) AS r),
      hi AS (SELECT MAX(o_orderkey) // 10 AS h FROM orders),
      r0 AS (SELECT o_orderkey, (ROW_NUMBER() OVER
          (ORDER BY o_orderkey) - 1) // (SELECT r FROM sml) AS f
        FROM o WHERE seg = 0),
      r1 AS (SELECT o_orderkey, (ROW_NUMBER() OVER
          (ORDER BY o_orderkey) - 1) // (SELECT r FROM rpf) AS f
        FROM o WHERE seg = 1),
      r2 AS (SELECT o_orderkey, (ROW_NUMBER() OVER
          (ORDER BY (o_orderkey * 2654435761) % 1000003,
            o_orderkey) - 1) // (SELECT r FROM rpf) AS f
        FROM o WHERE seg = 2),
      r3 AS (SELECT o_orderkey, (ROW_NUMBER() OVER
          (ORDER BY o_orderkey) - 1) // (SELECT r FROM rpf) AS f
        FROM o WHERE seg = 3),
      m AS (
        SELECT 's0' AS segment, f, COUNT(*) AS n_rows,
          MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
        FROM r0 GROUP BY f
        UNION ALL SELECT 's1', f, COUNT(*), MIN(o_orderkey),
          MAX(o_orderkey) FROM r1 GROUP BY f
        UNION ALL SELECT 's2', f, COUNT(*), MIN(o_orderkey),
          MAX(o_orderkey) FROM r2 GROUP BY f
        UNION ALL SELECT 's3', f, COUNT(*), MIN(o_orderkey),
          MAX(o_orderkey) FROM r3 GROUP BY f),
      s AS (
        SELECT segment, COUNT(*) AS files,
          CAST(SUM(n_rows) AS BIGINT) AS n_rows,
          MIN(mn) AS mn, MAX(mx) AS mx,
          CAST(SUM(CASE WHEN mn <= (SELECT h FROM hi) THEN 1
            ELSE 0 END) AS BIGINT) AS overl
        FROM m GROUP BY segment),
      d AS (SELECT COUNT(*) AS nd FROM o
            WHERE seg = 1 AND o_orderkey % 1000 < 80),
      met AS (
        SELECT segment, files, n_rows,
          CAST(n_rows AS DOUBLE) /
            CAST(files * (SELECT r FROM rpf) AS DOUBLE) AS fill,
          CASE WHEN segment = 's1' THEN
            CAST((SELECT nd FROM d) AS DOUBLE) /
              CAST(n_rows AS DOUBLE) ELSE 0.0 END AS density,
          CAST(overl AS DOUBLE) / CAST(files AS DOUBLE) AS scanfrac,
          CAST((SELECT h FROM hi) - mn + 1 AS DOUBLE) /
            CAST(mx - mn + 1 AS DOUBLE) AS estsel,
          (n_rows + (SELECT r FROM rpf) - 1) // (SELECT r FROM rpf)
            AS ideal
        FROM s),
      verbs AS (
        SELECT segment, 'compact' AS verb, files, n_rows,
          fill AS metric,
          1.0 - CAST(ideal AS DOUBLE) / CAST(files AS DOUBLE)
            AS expected_benefit
        FROM met WHERE fill < 0.5
        UNION ALL
        SELECT segment, 'fold', files, n_rows, density, density
        FROM met WHERE density >= 0.05
        UNION ALL
        SELECT segment, 'recluster', files, n_rows, scanfrac,
          scanfrac - estsel
        FROM met WHERE scanfrac >= 0.5
        UNION ALL
        SELECT segment, 'none', files, n_rows, 0.0, 0.0
        FROM met
        WHERE fill >= 0.5 AND density < 0.05 AND scanfrac < 0.5)
      SELECT CAST(ROW_NUMBER() OVER
          (ORDER BY expected_benefit DESC, segment) AS INTEGER)
          AS rank,
        segment, verb, files, n_rows, metric, expected_benefit
      FROM verbs
      ORDER BY rank""",

    // each snapshot from the q309 version predicates (v1 = the
    // pre-append prefix, v2 = everything, v3 = post-retention); the
    // timestamp read resolves to v2 by the fixed commit log — a view
    // that joins the wrong manifest rows, a DPP miss that changes
    // results, or a mis-resolved timestamp hash-fails
    "q343_sql_time_travel" -> """
      WITH v AS (SELECT unnest([1, 2, 3]) AS version)
      SELECT CONCAT('version_as_of_', CAST(v.version AS VARCHAR))
          AS read,
        v.version AS version, COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price,
        MIN(o_orderkey) AS min_okey, MAX(o_orderkey) AS max_okey
      FROM orders CROSS JOIN v
      WHERE (v.version = 1 AND o_orderdate < TIMESTAMP '1999-01-01')
         OR v.version = 2
         OR (v.version = 3 AND o_orderdate >= TIMESTAMP '1996-01-01')
      GROUP BY v.version
      UNION ALL
      SELECT 'timestamp_as_of_2000-02-15', 2, COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        MIN(o_orderkey), MAX(o_orderkey)
      FROM orders
      ORDER BY read""",

    // the executed plan's delivery certificate from the same cut
    // arithmetic as q342 plus the after-states: compact lands exactly
    // ceil(rows/target) files (delivered == predicted), fold zeroes
    // the ledger (delivered == the density), recluster's after-scan
    // comes from the sorted-cut overlap ((k-1)//r + 1 files of the
    // probe-key prefix; the scalar join is valid because exactly one
    // segment reclusters in this fixture). An executor that loses
    // rows, leaves artifacts, or under-delivers hash-fails
    "q344_maintenance_execute" -> """
      WITH o AS (SELECT o_orderkey,
          CAST(o_orderkey % 4 AS INTEGER) AS seg FROM orders),
      n AS (SELECT COUNT(*) AS nn FROM orders),
      rpf AS (SELECT GREATEST(64, ((SELECT nn FROM n) + 63) // 64)
        AS r),
      sml AS (SELECT GREATEST(1, (SELECT r FROM rpf) // 8) AS r),
      hi AS (SELECT MAX(o_orderkey) // 10 AS h FROM orders),
      r0 AS (SELECT o_orderkey, (ROW_NUMBER() OVER
          (ORDER BY o_orderkey) - 1) // (SELECT r FROM sml) AS f
        FROM o WHERE seg = 0),
      r1 AS (SELECT o_orderkey, (ROW_NUMBER() OVER
          (ORDER BY o_orderkey) - 1) // (SELECT r FROM rpf) AS f
        FROM o WHERE seg = 1),
      r2 AS (SELECT o_orderkey, (ROW_NUMBER() OVER
          (ORDER BY (o_orderkey * 2654435761) % 1000003,
            o_orderkey) - 1) // (SELECT r FROM rpf) AS f
        FROM o WHERE seg = 2),
      r3 AS (SELECT o_orderkey, (ROW_NUMBER() OVER
          (ORDER BY o_orderkey) - 1) // (SELECT r FROM rpf) AS f
        FROM o WHERE seg = 3),
      m AS (
        SELECT 's0' AS segment, f, COUNT(*) AS n_rows,
          MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
        FROM r0 GROUP BY f
        UNION ALL SELECT 's1', f, COUNT(*), MIN(o_orderkey),
          MAX(o_orderkey) FROM r1 GROUP BY f
        UNION ALL SELECT 's2', f, COUNT(*), MIN(o_orderkey),
          MAX(o_orderkey) FROM r2 GROUP BY f
        UNION ALL SELECT 's3', f, COUNT(*), MIN(o_orderkey),
          MAX(o_orderkey) FROM r3 GROUP BY f),
      s AS (
        SELECT segment, COUNT(*) AS files,
          CAST(SUM(n_rows) AS BIGINT) AS n_rows,
          MIN(mn) AS mn, MAX(mx) AS mx,
          CAST(SUM(CASE WHEN mn <= (SELECT h FROM hi) THEN 1
            ELSE 0 END) AS BIGINT) AS overl
        FROM m GROUP BY segment),
      d AS (SELECT COUNT(*) AS nd FROM o
            WHERE seg = 1 AND o_orderkey % 1000 < 80),
      met AS (
        SELECT segment, files, n_rows,
          CAST(n_rows AS DOUBLE) /
            CAST(files * (SELECT r FROM rpf) AS DOUBLE) AS fill,
          CASE WHEN segment = 's1' THEN
            CAST((SELECT nd FROM d) AS DOUBLE) /
              CAST(n_rows AS DOUBLE) ELSE 0.0 END AS density,
          CAST(overl AS DOUBLE) / CAST(files AS DOUBLE) AS scanfrac,
          CAST((SELECT h FROM hi) - mn + 1 AS DOUBLE) /
            CAST(mx - mn + 1 AS DOUBLE) AS estsel,
          (n_rows + (SELECT r FROM rpf) - 1) // (SELECT r FROM rpf)
            AS ideal
        FROM s),
      k2 AS (SELECT COUNT(*) AS k FROM o
             WHERE seg = 2 AND o_orderkey <= (SELECT h FROM hi)),
      s2a AS (
        SELECT CAST(CASE WHEN (SELECT k FROM k2) = 0 THEN 0
            ELSE ((SELECT k FROM k2) - 1) // (SELECT r FROM rpf) + 1
            END AS DOUBLE) /
          CAST((SELECT ideal FROM met WHERE segment = 's2')
            AS DOUBLE) AS scan_a),
      verbs AS (
        SELECT segment, 'compact' AS verb, fill AS metric_before,
          CAST(n_rows AS DOUBLE) /
            CAST(ideal * (SELECT r FROM rpf) AS DOUBLE)
            AS metric_after,
          1.0 - CAST(ideal AS DOUBLE) / CAST(files AS DOUBLE)
            AS expected_benefit,
          1.0 - CAST(ideal AS DOUBLE) / CAST(files AS DOUBLE)
            AS delivered
        FROM met WHERE fill < 0.5
        UNION ALL
        SELECT segment, 'fold', density, 0.0, density, density
        FROM met WHERE density >= 0.05
        UNION ALL
        SELECT segment, 'recluster', scanfrac,
          (SELECT scan_a FROM s2a),
          scanfrac - estsel,
          scanfrac - (SELECT scan_a FROM s2a)
        FROM met WHERE scanfrac >= 0.5
        UNION ALL
        SELECT segment, 'none', 0.0, 0.0, 0.0, 0.0
        FROM met
        WHERE fill >= 0.5 AND density < 0.05 AND scanfrac < 0.5)
      SELECT CAST(ROW_NUMBER() OVER
          (ORDER BY expected_benefit DESC, segment) AS INTEGER)
          AS rank,
        segment, verb, metric_before, metric_after,
        expected_benefit, delivered
      FROM verbs
      ORDER BY rank""",

    "q331_bloom_lookup" -> bloomPointLookupOracle,
    "q332_compact_cluster" -> compactClusterOracle,
    "q336_incremental_layout" -> incrementalLayoutOracle,
    "q341_rewrite_layout" -> rewriteLayoutOracle,

    // the whole binding lifecycle from predicate arithmetic: the MV
    // bound at v2 still sums the FULL table in p1 (the wrong answer
    // the gate blocks) with lag +1/-1 (the c0->c0_rw rewrite), and
    // equals the v3 recompute in p2; the stats index is fresh in
    // both phases. A certificate that misses the staleness, a
    // refresh that drops/double-applies a delta, or a rebind at the
    // wrong version all hash-fail
    "q333_artifact_binding" -> """
      WITH v3 AS (SELECT * FROM orders
                  WHERE o_orderdate >= TIMESTAMP '1996-01-01')
      SELECT 'p1_stale' AS phase, 'customer_mv' AS artifact,
        CAST(2 AS INTEGER) AS bound_version,
        CAST(3 AS INTEGER) AS head_version,
        CAST(1 AS BIGINT) AS n_fresh_commits,
        CAST(1 AS BIGINT) AS n_retired_commits,
        FALSE AS is_fresh,
        (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_keys,
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              FROM orders) AS DOUBLE) AS checksum
      UNION ALL
      SELECT 'p1_stale', 'segstats', 3, 3, 0, 0, TRUE,
        CAST(3 AS BIGINT),
        CAST((SELECT COUNT(*) FROM v3) AS DOUBLE)
      UNION ALL
      SELECT 'p2_refreshed', 'customer_mv', 3, 3, 0, 0, TRUE,
        (SELECT COUNT(DISTINCT o_custkey) FROM v3),
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              FROM v3) AS DOUBLE)
      UNION ALL
      SELECT 'p2_refreshed', 'segstats', 3, 3, 0, 0, TRUE,
        CAST(3 AS BIGINT),
        CAST((SELECT COUNT(*) FROM v3) AS DOUBLE)
      ORDER BY phase, artifact""",

    // both retention passes from predicate arithmetic: while the
    // consumer lags, v2 is pinned whole (= ALL orders) and c0 stays
    // on disk; after the catch-up fold, v2/c0 go and the MV equals
    // the v3 recompute. A vacuum that ignored the pin zeroes p1's
    // c0 row (and silently breaks the fold — the spec's clone shows
    // that) and hash-fails here
    "q334_consumer_pinned_retention" -> """
      WITH v3 AS (SELECT * FROM orders
                  WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
      c0 AS (SELECT * FROM orders
             WHERE o_orderdate < TIMESTAMP '1997-01-01')
      SELECT 'p1_lagging' AS phase, 'c0' AS entity,
        'on_disk' AS status,
        (SELECT COUNT(*) FROM c0) AS n_rows,
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              FROM c0) AS DOUBLE) AS checksum
      UNION ALL
      SELECT 'p1_lagging', 'mv', 'bound_v2',
        (SELECT COUNT(DISTINCT o_custkey) FROM orders),
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              FROM orders) AS DOUBLE)
      UNION ALL
      SELECT 'p1_lagging', 'v1', 'expired', CAST(0 AS BIGINT),
        CAST(0 AS DOUBLE)
      UNION ALL
      SELECT 'p1_lagging', 'v2', 'pinned_by_consumer',
        (SELECT COUNT(*) FROM orders),
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              FROM orders) AS DOUBLE)
      UNION ALL
      SELECT 'p1_lagging', 'v3', 'retained',
        (SELECT COUNT(*) FROM v3),
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              FROM v3) AS DOUBLE)
      UNION ALL
      SELECT 'p2_caught_up', 'c0', 'reclaimed', CAST(0 AS BIGINT),
        CAST(0 AS DOUBLE)
      UNION ALL
      SELECT 'p2_caught_up', 'mv', 'bound_v3',
        (SELECT COUNT(DISTINCT o_custkey) FROM v3),
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              FROM v3) AS DOUBLE)
      UNION ALL
      SELECT 'p2_caught_up', 'v1', 'expired', CAST(0 AS BIGINT),
        CAST(0 AS DOUBLE)
      UNION ALL
      SELECT 'p2_caught_up', 'v2', 'expired', CAST(0 AS BIGINT),
        CAST(0 AS DOUBLE)
      UNION ALL
      SELECT 'p2_caught_up', 'v3', 'retained',
        (SELECT COUNT(*) FROM v3),
        CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              FROM v3) AS DOUBLE)
      ORDER BY phase, entity""",

    // every consistent pair from first principles: cat_v2 = base +
    // the mod-31 shifted pair on both tables; the aborted txn2 must
    // leave cat_v2's numbers byte-identical (the post_abort row);
    // n_dangling is the cross-table invariant, re-derived by the
    // same anti-join rule — a torn pair, a leaked abort row, or a
    // half-published catalog version all hash-fail
    "q335_cross_table_txn" -> """
      WITH a2 AS (SELECT o_orderkey + 40000000 AS o_orderkey
                  FROM orders WHERE o_orderkey % 100 = 31),
      b2 AS (SELECT l_orderkey + 40000000 AS l_orderkey,
               l_extendedprice
             FROM lineitem WHERE l_orderkey % 100 = 31),
      av1 AS (SELECT o_orderkey FROM orders),
      av2 AS (SELECT o_orderkey FROM av1
              UNION ALL SELECT o_orderkey FROM a2),
      bv1 AS (SELECT l_orderkey, l_extendedprice FROM lineitem),
      bv2 AS (SELECT * FROM bv1 UNION ALL SELECT * FROM b2)
      SELECT 'cat_v1' AS entity, 'base' AS status,
        (SELECT COUNT(*) FROM av1) AS n_orders,
        (SELECT COUNT(*) FROM bv1) AS n_lineitems,
        CAST((SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              FROM bv1) AS DOUBLE) AS revenue,
        (SELECT COUNT(*) FROM bv1 l WHERE NOT EXISTS
           (SELECT 1 FROM av1 o WHERE o.o_orderkey = l.l_orderkey))
          AS n_dangling
      UNION ALL
      SELECT 'cat_v2', 'txn1_committed',
        (SELECT COUNT(*) FROM av2),
        (SELECT COUNT(*) FROM bv2),
        CAST((SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              FROM bv2) AS DOUBLE),
        (SELECT COUNT(*) FROM bv2 l WHERE NOT EXISTS
           (SELECT 1 FROM av2 o WHERE o.o_orderkey = l.l_orderkey))
      UNION ALL
      SELECT 'cat_v2_post_abort', 'txn2_aborted',
        (SELECT COUNT(*) FROM av2),
        (SELECT COUNT(*) FROM bv2),
        CAST((SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              FROM bv2) AS DOUBLE),
        (SELECT COUNT(*) FROM bv2 l WHERE NOT EXISTS
           (SELECT 1 FROM av2 o WHERE o.o_orderkey = l.l_orderkey))
      ORDER BY entity""",

    // every row-level change from the tick predicates (the one
    // shared CdcUpsert.Ticks definition the Spark side stages): an
    // update emits its pre-image (original row) AND its post-image
    // (CDC-day date, shifted price), inserts land shifted out of the
    // keyspace, deletes emit the original row. A feed that drops a
    // row, mis-classifies an update as delete+insert, or resolves a
    // pre-image from the wrong segment hash-fails
    "q338_row_change_feed" -> """
      SELECT CAST(2 AS INTEGER) AS version, 'insert' AS _change_type,
        o_orderkey + 100000000 AS o_orderkey, o_custkey,
        o_totalprice, TIMESTAMP '2002-04-01' AS o_orderdate
      FROM orders WHERE o_orderkey % 100 = 51
      UNION ALL
      SELECT 2, 'update_preimage', o_orderkey, o_custkey,
        o_totalprice, o_orderdate
      FROM orders WHERE o_orderkey % 100 = 11
      UNION ALL
      SELECT 2, 'update_postimage', o_orderkey, o_custkey,
        o_totalprice + 1000.0, TIMESTAMP '2002-04-01'
      FROM orders WHERE o_orderkey % 100 = 11
      UNION ALL
      SELECT 3, 'insert', o_orderkey + 200000000, o_custkey,
        o_totalprice, TIMESTAMP '2002-05-01'
      FROM orders WHERE o_orderkey % 100 = 53
      UNION ALL
      SELECT 3, 'delete', o_orderkey, o_custkey, o_totalprice,
        o_orderdate
      FROM orders WHERE o_orderkey % 100 = 13
      UNION ALL
      SELECT 4, 'update_preimage', o_orderkey, o_custkey,
        o_totalprice, o_orderdate
      FROM orders WHERE o_orderkey % 100 = 17
      UNION ALL
      SELECT 4, 'update_postimage', o_orderkey, o_custkey,
        o_totalprice + 2000.0, TIMESTAMP '2002-06-01'
      FROM orders WHERE o_orderkey % 100 = 17
      UNION ALL
      SELECT 4, 'delete', o_orderkey, o_custkey, o_totalprice,
        o_orderdate
      FROM orders WHERE o_orderkey % 100 = 19
      ORDER BY version, _change_type, o_orderkey""",

    // every catalog version's join-MV summary from the commit
    // predicates: cat_v2 adds the correlated mod-31 pair (shifted
    // keys join only each other), cat_v3 adds late mod-43 lineitems
    // that attach to BASE orders (the asymmetric ΔB term); the
    // matches_recompute flags are pinned TRUE — a refresh that folds
    // one table's delta only, double-counts the cross term, or joins
    // the wrong counterpart version flips them (or moves a sum) and
    // hash-fails
    "q340_crosstable_mv" -> """
      WITH j1 AS (
        SELECT o.o_custkey, l.l_extendedprice
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      j2 AS (
        SELECT o.o_custkey, l.l_extendedprice
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey % 100 = 31),
      j3 AS (
        SELECT o.o_custkey, l.l_extendedprice
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_orderkey % 100 = 43),
      v2 AS (SELECT * FROM j1 UNION ALL SELECT * FROM j2),
      v3 AS (SELECT * FROM v2 UNION ALL SELECT * FROM j3)
      SELECT CAST(1 AS INTEGER) AS cat_version,
        COUNT(DISTINCT o_custkey) AS n_keys, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          AS revenue,
        TRUE AS matches_recompute
      FROM j1
      UNION ALL
      SELECT 2, COUNT(DISTINCT o_custkey), COUNT(*),
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
        TRUE
      FROM v2
      UNION ALL
      SELECT 3, COUNT(DISTINCT o_custkey), COUNT(*),
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
        TRUE
      FROM v3
      ORDER BY cat_version""",

    // the whole mixed-artifact lifecycle from predicate + ordinal
    // arithmetic: segments from the date cuts, ordinals from the same
    // rank-within-segment rule, equality victims by key, position
    // victims by ordinal; v3 and v4 must agree on content (the fold
    // applied exactly the artifacts — a fold that drops a bystander
    // or misses a victim splits them and hash-fails) while the live
    // counts collapse to the non-folded segments' equality rows
    "q339_position_deletes" -> """
      WITH base AS (
        SELECT o_orderkey, o_totalprice,
          CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN 'c0'
               WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 'c1'
               ELSE 'c2' END AS cmt
        FROM orders),
      posd AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY cmt
          ORDER BY o_orderkey) - 1 AS pos
        FROM base),
      v2r AS (SELECT * FROM posd WHERE o_orderkey % 1000 <> 41),
      v3r AS (SELECT * FROM v2r
              WHERE NOT (cmt = 'c1' AND pos % 20 = 7)),
      cnt AS (
        SELECT
          COUNT(*) FILTER (WHERE o_orderkey % 1000 = 41) AS ceq,
          COUNT(*) FILTER (WHERE o_orderkey % 1000 = 41
            AND cmt <> 'c1') AS ceq_nc1,
          COUNT(*) FILTER (WHERE cmt = 'c1' AND pos % 20 = 7) AS cpos
        FROM posd)
      SELECT CAST(1 AS INTEGER) AS version, 'base' AS status,
        COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price,
        CAST(0 AS BIGINT) AS n_live_eq, CAST(0 AS BIGINT) AS n_live_pos
      FROM posd
      UNION ALL
      SELECT 2, 'eq', COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        (SELECT ceq FROM cnt), 0
      FROM v2r
      UNION ALL
      SELECT 3, 'eq+pos', COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        (SELECT ceq FROM cnt), (SELECT cpos FROM cnt)
      FROM v3r
      UNION ALL
      SELECT 4, 'folded', COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
        (SELECT ceq_nc1 FROM cnt), 0
      FROM v3r
      ORDER BY version""",

    // the v1→v3 changelog from first principles: '+' rows are the v2
    // append (commit c2, orderdate >= 1999), '-' rows the retention
    // victims (< 1996); rewrite survivors appear in neither
    "q312_incremental_diff" -> """
      SELECT '+' AS op, o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      UNION ALL
      SELECT '-' AS op, o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
      ORDER BY op, o_orderkey""",
    // q346: per-segment state after the SQL MERGE — carried segments
    // are the untouched date-cut classes, w2 is c1 rewritten (deletes
    // applied, updates +1000) plus the inserted mod-13 batch. A MERGE
    // that rewrote a segment it should have carried (group-routing
    // failure) or lost an update/delete hash-fails here.
    "q346_sql_merge" -> """
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
          CAST(o_orderdate AS DATE) AS d FROM orders),
      seg AS (
        SELECT *, CASE WHEN d < DATE '1997-01-01' THEN 'c0'
                       WHEN d < DATE '1999-01-01' THEN 'c1'
                       ELSE 'c2' END AS c FROM base)
      SELECT commit_id, n_rows, sum_price, status FROM (
        SELECT c AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price,
          'carried' AS status
        FROM seg WHERE c IN ('c0', 'c2') GROUP BY c
        UNION ALL
        SELECT 'w2' AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
          'rewritten' AS status
        FROM (
          SELECT CASE WHEN o_orderkey % 100 = 7
                       AND d >= DATE '1997-01-01'
                       AND d < DATE '1997-07-01'
                 THEN o_totalprice + 1000.0
                 ELSE o_totalprice END AS p
          FROM seg
          WHERE c = 'c1'
            AND NOT (o_orderkey % 100 = 29
                     AND d >= DATE '1997-01-01'
                     AND d < DATE '1997-07-01')
          UNION ALL
          SELECT o_totalprice AS p FROM base WHERE o_orderkey % 100 = 13
        ) t
      ) r ORDER BY commit_id""",
    // q347: retention DELETE — c1/c2 carried (stats-pruned out of
    // the operation scan), w2 = c0's surviving rows.
    "q347_sql_delete" -> """
      WITH base AS (
        SELECT o_totalprice, CAST(o_orderdate AS DATE) AS d
        FROM orders),
      seg AS (
        SELECT *, CASE WHEN d < DATE '1997-01-01' THEN 'c0'
                       WHEN d < DATE '1999-01-01' THEN 'c1'
                       ELSE 'c2' END AS c FROM base)
      SELECT commit_id, n_rows, sum_price, status FROM (
        SELECT c AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price,
          'carried' AS status
        FROM seg WHERE c IN ('c1', 'c2') GROUP BY c
        UNION ALL
        SELECT 'w2' AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price,
          'rewritten' AS status
        FROM seg WHERE c = 'c0' AND d >= DATE '1996-01-01'
      ) r ORDER BY commit_id""",
    // q348: date-routed UPDATE — c0/c1 carried, w2 = c2 with +500.
    "q348_sql_update" -> """
      WITH base AS (
        SELECT o_totalprice, CAST(o_orderdate AS DATE) AS d
        FROM orders),
      seg AS (
        SELECT *, CASE WHEN d < DATE '1997-01-01' THEN 'c0'
                       WHEN d < DATE '1999-01-01' THEN 'c1'
                       ELSE 'c2' END AS c FROM base)
      SELECT commit_id, n_rows, sum_price, status FROM (
        SELECT c AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price,
          'carried' AS status
        FROM seg WHERE c IN ('c0', 'c1') GROUP BY c
        UNION ALL
        SELECT 'w2' AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice + 500.0 AS DECIMAL(18,2)))
            AS DOUBLE) AS sum_price,
          'rewritten' AS status
        FROM seg WHERE c = 'c2'
      ) r ORDER BY commit_id""",
    // q349: the four-version SQL lifecycle (UPDATE, INSERT, DELETE)
    // re-derived from the predicates; ts_asof resolves to v3.
    "q349_sql_version_asof" -> """
      WITH base AS (
        SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS d
        FROM orders),
      v2 AS (
        SELECT o_orderkey,
          CASE WHEN d >= DATE '1999-01-01' THEN o_totalprice + 500.0
               ELSE o_totalprice END AS p, d
        FROM base),
      v3 AS (
        SELECT * FROM v2
        UNION ALL
        SELECT o_orderkey + 10000000, o_totalprice AS p,
          DATE '2002-01-15' AS d
        FROM base WHERE o_orderkey % 100 = 13),
      v4 AS (SELECT * FROM v3 WHERE d >= DATE '1996-01-01')
      SELECT 'version_1' AS read, COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price FROM base
      UNION ALL
      SELECT 'version_2', COUNT(*),
        CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) FROM v2
      UNION ALL
      SELECT 'version_3', COUNT(*),
        CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) FROM v3
      UNION ALL
      SELECT 'version_4', COUNT(*),
        CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) FROM v4
      UNION ALL
      SELECT 'ts_asof_00:00:02', COUNT(*),
        CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) FROM v3
      ORDER BY read""",
    // q350: the pruned string-zone-map reads are layout-independent
    // by construction (stats route files, the residual predicate
    // restores exactness), so the oracle is the bare predicates over
    // the same corpus (base documents + the synthesized fresh feed).
    "q350_string_zonemap" -> """
      WITH corpus AS (
        SELECT doc_id, lang, source, n_chars FROM documents
        UNION ALL
        SELECT doc_id + 10000000, lang, 'zz' || source, n_chars
        FROM documents WHERE doc_id % 7 = 3)
      SELECT probe, n_docs, sum_chars, n_sources FROM (
        SELECT 'eq_source_src7' AS probe, COUNT(*) AS n_docs,
          CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
          COUNT(DISTINCT source) AS n_sources
        FROM corpus WHERE source = 'src7'
        UNION ALL
        SELECT 'eq_source_src12', COUNT(*),
          CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
          COUNT(DISTINCT source)
        FROM corpus WHERE source = 'src12'
        UNION ALL
        SELECT 'range_source_src2_src4', COUNT(*),
          CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
          COUNT(DISTINCT source)
        FROM corpus WHERE source >= 'src2' AND source <= 'src4'
        UNION ALL
        SELECT 'eq_source_lang', COUNT(*),
          CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
          COUNT(DISTINCT source)
        FROM corpus WHERE source = 'src3' AND lang = 'zh'
        UNION ALL
        SELECT 'fresh_prefix_zz', COUNT(*),
          CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
          COUNT(DISTINCT source)
        FROM corpus WHERE source LIKE 'zz%'
      ) r ORDER BY probe""",
    // q351: the SQL table_changes TVF must agree ROW-IDENTICALLY
    // with the Scala q338 derivation - same oracle text.
    "q351_table_changes" -> """
      SELECT CAST(2 AS INTEGER) AS version, 'insert' AS _change_type,
        o_orderkey + 100000000 AS o_orderkey, o_custkey,
        o_totalprice, TIMESTAMP '2002-04-01' AS o_orderdate
      FROM orders WHERE o_orderkey % 100 = 51
      UNION ALL
      SELECT 2, 'update_preimage', o_orderkey, o_custkey,
        o_totalprice, o_orderdate
      FROM orders WHERE o_orderkey % 100 = 11
      UNION ALL
      SELECT 2, 'update_postimage', o_orderkey, o_custkey,
        o_totalprice + 1000.0, TIMESTAMP '2002-04-01'
      FROM orders WHERE o_orderkey % 100 = 11
      UNION ALL
      SELECT 3, 'insert', o_orderkey + 200000000, o_custkey,
        o_totalprice, TIMESTAMP '2002-05-01'
      FROM orders WHERE o_orderkey % 100 = 53
      UNION ALL
      SELECT 3, 'delete', o_orderkey, o_custkey, o_totalprice,
        o_orderdate
      FROM orders WHERE o_orderkey % 100 = 13
      UNION ALL
      SELECT 4, 'update_preimage', o_orderkey, o_custkey,
        o_totalprice, o_orderdate
      FROM orders WHERE o_orderkey % 100 = 17
      UNION ALL
      SELECT 4, 'update_postimage', o_orderkey, o_custkey,
        o_totalprice + 2000.0, TIMESTAMP '2002-06-01'
      FROM orders WHERE o_orderkey % 100 = 17
      UNION ALL
      SELECT 4, 'delete', o_orderkey, o_custkey, o_totalprice,
        o_orderdate
      FROM orders WHERE o_orderkey % 100 = 19
      ORDER BY version, _change_type, o_orderkey""",
    // q352: the same MERGE content as q346 but MERGE-ON-READ - every
    // base segment stays live (c1 shrinks IN PLACE via the applied
    // artifact), the one appended commit w2 carries update
    // post-images + inserts. A MoR write that rewrote a base segment
    // shows up as a changed per-segment row and hash-fails.
    "q352_sql_mor_merge" -> """
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
          CAST(o_orderdate AS DATE) AS d FROM orders),
      seg AS (
        SELECT *, CASE WHEN d < DATE '1997-01-01' THEN 'c0'
                       WHEN d < DATE '1999-01-01' THEN 'c1'
                       ELSE 'c2' END AS c FROM base),
      touched AS (
        SELECT o_orderkey FROM base
        WHERE (o_orderkey % 100 = 7 OR o_orderkey % 100 = 29)
          AND d >= DATE '1997-01-01' AND d < DATE '1997-07-01')
      SELECT commit_id, n_rows, sum_price, status FROM (
        SELECT c AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price,
          'base' AS status
        FROM seg WHERE o_orderkey NOT IN (SELECT * FROM touched)
        GROUP BY c
        UNION ALL
        SELECT 'w2' AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
          'appended' AS status
        FROM (
          SELECT o_totalprice + 1000.0 AS p FROM base
          WHERE o_orderkey % 100 = 7
            AND d >= DATE '1997-01-01' AND d < DATE '1997-07-01'
          UNION ALL
          SELECT o_totalprice AS p FROM base WHERE o_orderkey % 100 = 13
        ) t
      ) r ORDER BY commit_id""",
    // q353: MoR retention delete - artifact only; c0 serves its
    // surviving rows in place, c1/c2 untouched, no new commit.
    "q353_sql_mor_delete" -> """
      WITH base AS (
        SELECT o_totalprice, CAST(o_orderdate AS DATE) AS d
        FROM orders),
      seg AS (
        SELECT *, CASE WHEN d < DATE '1997-01-01' THEN 'c0'
                       WHEN d < DATE '1999-01-01' THEN 'c1'
                       ELSE 'c2' END AS c FROM base)
      SELECT c AS commit_id, COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price,
        'base' AS status
      FROM seg WHERE d >= DATE '1996-01-01'
      GROUP BY c ORDER BY commit_id""",
    // q354: the evolution boundary in the hash - rows from segments
    // that predate the ADD COLUMN read back with a NULL channel, the
    // inserted batch splits web/store on key parity.
    "q354_sql_add_column" -> """
      SELECT channel, n_rows, sum_price FROM (
        SELECT 'pre_evolution' AS channel, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM orders
        UNION ALL
        SELECT CASE WHEN o_custkey % 2 = 0 THEN 'web'
                    ELSE 'store' END AS channel,
          COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM orders WHERE o_orderkey % 100 = 13
        GROUP BY 1
      ) r ORDER BY channel""",
    // q355: INSERT OVERWRITE is a manifest edit - v1 still serves
    // the full table, the head serves the overwrite query's result.
    "q355_sql_insert_overwrite" -> """
      SELECT 'v1_before' AS read, COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM orders
      UNION ALL
      SELECT 'v2_after' AS read, COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice + 10.0 AS DECIMAL(18,2)))
          AS DOUBLE) AS sum_price
      FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      ORDER BY read""",
    // q356: after the UPDATE (c2 -> w2) and expire-to-head, the
    // vacuum must reclaim exactly c2; every count is taken from the
    // post-vacuum table.
    "q356_rlo_vacuum" -> """
      WITH base AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders)
      SELECT commit_id, status, n_rows_after FROM (
        SELECT 'c0' AS commit_id, 'retained' AS status,
          COUNT(*) AS n_rows_after
        FROM base WHERE d < DATE '1997-01-01'
        UNION ALL
        SELECT 'c1', 'retained', COUNT(*)
        FROM base WHERE d >= DATE '1997-01-01' AND d < DATE '1999-01-01'
        UNION ALL
        SELECT 'c2', 'reclaimed', CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'w2', 'retained', COUNT(*)
        FROM base WHERE d >= DATE '1999-01-01'
      ) r ORDER BY commit_id""",
    // q357: sync-MERGE - the final table must EQUAL the source
    // snapshot (one rewritten segment w2 holds everything); a group
    // filter that wrongly pruned under NOT MATCHED BY SOURCE would
    // keep deleted rows and move these totals.
    "q357_sql_merge_sync" -> """
      WITH src AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 100 = 11 THEN o_totalprice + 50.0
               ELSE o_totalprice END AS p
        FROM orders WHERE o_orderkey % 100 <> 19
        UNION ALL
        SELECT o_orderkey + 10000000, o_totalprice AS p
        FROM orders WHERE o_orderkey % 100 = 23)
      SELECT 'w2' AS commit_id, COUNT(*) AS n_rows,
        CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        COUNT(DISTINCT o_orderkey) AS n_keys
      FROM src""",
    // q359: the manifest-answered aggregate must equal the data
    // (the UPDATE moved prices, never dates or counts).
    "q359_sql_stats_agg" -> """
      SELECT COUNT(*) AS n_rows,
        CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS min_date,
        CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS max_date
      FROM orders""",
    // q360: OPTIMIZE swaps 4 one-per-batch segments for 1 packed
    // segment with bit-identical content - both phases' totals are
    // the full streamed table; segment/file counts pin the swap.
    "q360_rlo_optimize" -> """
      SELECT phase, n_rows, sum_price, n_segments FROM (
        SELECT 'before' AS phase, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price,
          4 AS n_segments
        FROM orders
        UNION ALL
        SELECT 'after', COUNT(*),
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
          1
        FROM orders
      ) r ORDER BY phase""",
    // q361: re-derive the compaction report from the two DELETE
    // predicates - c0's delete density (pre-1994 retention + the
    // key class) crosses the 0.2 threshold so it FOLDS (artifacts
    // inert, 0 after); c1/c2 keep their sparse keys merged; the
    // _total row pins the live content (count + key-sum) through a
    // real read, so a lost or resurrected row hash-fails.
    "q361_compact_deletes" -> """
      WITH base AS (
        SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS d
        FROM orders),
      del AS (
        SELECT k,
          CASE WHEN d < DATE '1997-01-01' THEN 'c0'
               WHEN d < DATE '1999-01-01' THEN 'c1'
               ELSE 'c2' END AS c,
          (d < DATE '1996-01-01' OR k % 100 = 7) AS gone
        FROM base)
      SELECT commit_id, action, deletes_before, deletes_after FROM (
        SELECT c AS commit_id,
          CASE WHEN c = 'c0' THEN 'folded' ELSE 'merged' END AS action,
          CAST(COUNT(*) FILTER (WHERE gone) AS BIGINT)
            AS deletes_before,
          CAST(CASE WHEN c = 'c0' THEN 0
               ELSE COUNT(*) FILTER (WHERE gone) END AS BIGINT)
            AS deletes_after
        FROM del GROUP BY c
        UNION ALL
        SELECT '_total', 'live_rows',
          CAST(COUNT(*) FILTER (WHERE NOT gone) AS BIGINT),
          CAST(SUM(k) FILTER (WHERE NOT gone) AS BIGINT)
        FROM del
      ) r ORDER BY commit_id""",
    // q362: atomic CTAS - v2 is the CTAS SELECT verbatim, the head
    // adds the routed UPDATE on top.
    "q362_sql_ctas" -> """
      SELECT read, n_rows, sum_price FROM (
        SELECT 'v2_as_created' AS read, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        UNION ALL
        SELECT 'head_after_update', COUNT(*),
          CAST(SUM(CAST(
            CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1999-01-01'
                 THEN o_totalprice + 500.0
                 ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      ) r ORDER BY read""",
    // q363: the string-routed DELETE - s0/s2 carried (their
    // truncated source bounds can't contain 'jsrc'), w2 = s1 minus
    // the deleted source.
    "q363_string_routed_delete" -> """
      WITH base AS (
        SELECT o_totalprice,
          substring('abcdefghijklmnopqrst',
            CAST(o_custkey % 20 AS INTEGER) + 1, 1) || 'src' AS src
        FROM orders),
      seg AS (
        SELECT *, CASE WHEN src < 'hsrc' THEN 's0'
                       WHEN src < 'osrc' THEN 's1'
                       ELSE 's2' END AS c FROM base)
      SELECT commit_id, n_rows, sum_price, status FROM (
        SELECT c AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price,
          'carried' AS status
        FROM seg WHERE c IN ('s0', 's2') GROUP BY c
        UNION ALL
        SELECT 'w2' AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price,
          'rewritten' AS status
        FROM seg WHERE c = 's1' AND src <> 'jsrc'
      ) r ORDER BY commit_id""",
    // q364: the metadata delete - the head serves exactly c1/c2 as
    // CARRIED segments (a copy-on-write fallback would surface a
    // rewritten w2 row instead and hash-fail); v1 serves everything.
    "q364_metadata_delete" -> """
      WITH base AS (
        SELECT o_totalprice, CAST(o_orderdate AS DATE) AS d
        FROM orders),
      seg AS (
        SELECT *, CASE WHEN d < DATE '1997-01-01' THEN 'c0'
                       WHEN d < DATE '1999-01-01' THEN 'c1'
                       ELSE 'c2' END AS c FROM base)
      SELECT commit_id, n_rows, sum_price, status FROM (
        SELECT c AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price,
          'carried' AS status
        FROM seg WHERE c IN ('c1', 'c2') GROUP BY c
        UNION ALL
        SELECT 'v1_total', COUNT(*),
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
          'history'
        FROM base
      ) r ORDER BY commit_id""",
    // q365: the numeric-routed DELETE - k0/k2 carried (their
    // o_orderkey bounds can't intersect [a, mid)), k1 rewritten
    // minus the deleted key range; cuts re-derived from
    // MAX(o_orderkey) exactly as the fixture derives them.
    "q365_numeric_routed_delete" -> """
      WITH cuts AS (
        SELECT CAST(MAX(o_orderkey) // 4 AS BIGINT) AS a,
               CAST(MAX(o_orderkey) // 2 AS BIGINT) AS b,
               CAST((MAX(o_orderkey) // 4 + MAX(o_orderkey) // 2) // 2
                 AS BIGINT) AS mid
        FROM orders),
      seg AS (
        SELECT o.o_orderkey AS k, o.o_totalprice, c2.a, c2.mid,
          CASE WHEN o.o_orderkey < c2.a THEN 'k0'
               WHEN o.o_orderkey < c2.b THEN 'k1'
               ELSE 'k2' END AS c
        FROM orders o, cuts c2)
      SELECT commit_id, n_rows, sum_price, status FROM (
        SELECT c AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price,
          'carried' AS status
        FROM seg WHERE c IN ('k0', 'k2') GROUP BY c
        UNION ALL
        SELECT 'w2' AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price,
          'rewritten' AS status
        FROM seg WHERE c = 'k1' AND NOT (k >= a AND k < mid)
      ) r ORDER BY commit_id""",
    // q366: the numeric metadata delete - the head serves exactly
    // k1/k2 as CARRIED segments (a copy-on-write fallback would
    // surface a rewritten w2 row and hash-fail); v1 serves everything.
    "q366_numeric_metadata_delete" -> """
      WITH cuts AS (
        SELECT CAST(MAX(o_orderkey) // 4 AS BIGINT) AS a,
               CAST(MAX(o_orderkey) // 2 AS BIGINT) AS b
        FROM orders),
      seg AS (
        SELECT o.o_orderkey AS k, o.o_totalprice,
          CASE WHEN o.o_orderkey < c2.a THEN 'k0'
               WHEN o.o_orderkey < c2.b THEN 'k1'
               ELSE 'k2' END AS c
        FROM orders o, cuts c2)
      SELECT commit_id, n_rows, sum_price, status FROM (
        SELECT c AS commit_id, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price,
          'carried' AS status
        FROM seg WHERE c IN ('k1', 'k2') GROUP BY c
        UNION ALL
        SELECT 'v1_total', COUNT(*),
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
          'history'
        FROM seg
      ) r ORDER BY commit_id""",
    // q367: the connector changelog - the v2 UPDATE reads as
    // delete(old c2) + insert(updated w2), the v3 INSERT as
    // insert(w3); re-derived from the DML predicates.
    "q367_connector_table_changes" -> """
      WITH base AS (
        SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS d
        FROM orders)
      SELECT version, _change_type, n_rows, sum_price FROM (
        SELECT 2 AS version, 'delete' AS _change_type,
          COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM base WHERE d >= DATE '1999-01-01'
        UNION ALL
        SELECT 2, 'insert', COUNT(*),
          CAST(SUM(CAST(o_totalprice + 500.0 AS DECIMAL(18,2)))
            AS DOUBLE)
        FROM base WHERE d >= DATE '1999-01-01'
        UNION ALL
        SELECT 3, 'insert', COUNT(*),
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM base WHERE o_orderkey % 100 = 13
      ) r ORDER BY version, _change_type""",
    // q368: the ranked maintenance plan, number-for-number from the
    // fixture's cut arithmetic - 5 live segments (bin-pack, benefit
    // 1-1/5), c0's delete density (fold, benefit = density), two
    // artifact batches (merge, benefit 1-1/2). The fold density is
    // (date<1996 OR key%100=7) within c0 over c0's rows, exactly
    // what the merged distinct artifact keys count.
    "q368_plan_maintenance" -> """
      WITH c0 AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders
        WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'),
      dens AS (
        SELECT CAST(SUM(CASE WHEN d < DATE '1996-01-01'
                 OR o_orderkey % 100 = 7 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS density
        FROM c0),
      items AS (
        SELECT 'compact_deletes:fold' AS action, 'c0' AS target,
          density AS metric, 0.2 AS threshold, density AS benefit
        FROM dens
        UNION ALL
        SELECT 'compact_deletes:merge', '_artifacts', 2.0, 2.0,
          1.0 - 1.0 / 2.0
        UNION ALL
        SELECT 'optimize', '_table', 5.0, 4.0, 1.0 - 1.0 / 5.0)
      SELECT CAST(ROW_NUMBER() OVER (
          ORDER BY benefit DESC, action, target) AS INT) AS "rank",
        action, target, metric, threshold, benefit
      FROM items""",
    // q369: RTAS - the head is the replacement (<1997, +100), the
    // pre-replace version (v2, the CTAS content) stays readable.
    "q369_sql_rtas" -> """
      WITH base AS (
        SELECT o_totalprice, CAST(o_orderdate AS DATE) AS d
        FROM orders)
      SELECT read, n_rows, sum_price FROM (
        SELECT 'head_replaced' AS read, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice + 100.0 AS DECIMAL(18,2)))
            AS DOUBLE) AS sum_price
        FROM base WHERE d < DATE '1997-01-01'
        UNION ALL
        SELECT 'v2_pre_replace', COUNT(*),
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM base WHERE d >= DATE '1997-01-01'
      ) r ORDER BY read""",
    // q370: nested + wide-decimal round trip - the embedding sums
    // are exact binary fractions (order-independent doubles), the
    // wide amounts are exact decimal arithmetic incl. the UPDATE's
    // +0.5 on the dated rows.
    "q370_nested_wide_dml" -> """
      SELECT COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_orderkey % 7 AS DOUBLE) * 0.5
          + CAST(o_custkey % 11 AS DOUBLE) * 0.25) AS DOUBLE)
          AS sum_emb,
        CAST(SUM(
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100000000
            AS DECIMAL(30,4))
          + CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1999-01-01'
                 THEN CAST(0.5 AS DECIMAL(30,4))
                 ELSE CAST(0.0 AS DECIMAL(30,4)) END) AS DOUBLE)
          AS sum_wide
      FROM orders""",
    // q371: the streamed sink must equal source + the two inserted
    // classes, each row exactly once, grouped by year.
    "q371_connector_stream_source" -> """
      WITH base AS (
        SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS d
        FROM orders),
      streamed AS (
        SELECT o_totalprice, d FROM base
        UNION ALL
        SELECT o_totalprice, DATE '2002-01-15' FROM base
        WHERE o_orderkey % 100 = 13
        UNION ALL
        SELECT o_totalprice, DATE '2003-01-15' FROM base
        WHERE o_orderkey % 100 = 17)
      SELECT CAST(EXTRACT(year FROM d) AS INT) AS y,
        COUNT(*) AS n_rows,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM streamed GROUP BY 1 ORDER BY y""",
  )
}
