package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Relational
import graft.registry._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed here as a
  * (SparkSession, sfDir) => DataFrame, with a DuckDB oracle SQL string
  * over the same parquet tables. Column names and types are aligned
  * between both sides (the driver hash-compares by sorted column name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 — aggregated
    * from the per-family registries in graft.registry (a mechanical
    * split of the former inline maps; the driver contract and every
    * map value are unchanged). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreEtlRegistry.queries ++
    CurationRegistry.queries ++
    DedupRegistry.queries ++
    EventsRegistry.queries ++
    QualityRegistry.queries ++
    RelationalRegistry.queries ++
    SimilarityRegistry.queries ++
    StreamingRegistry.queries ++
    TextRegistry.queries

  /** Queries intentionally without an oracle (non-SQL-expressible in
    * DuckDB, e.g. engine-specific hashes or approximate algorithms);
    * the driver records a weaker rows-only check for these. */
  def rowsOnly: Set[String] = Set(
    // HLL++ sketch differs from DuckDB's approx algorithm; the exact
    // oracle-checked twin is q10_count_distinct.
    "q22_approx_distinct",
    // xxhash64 sketch is engine-specific; oracle-checked dedup twins are
    // q24 (exact fingerprint) and q25 (MinHash, md5-portable).
    "q26_dedup_simhash",
    // approximate by design (LSH recall < 1); exact twins q27/q28.
    "q29_ann_lsh",
    // approximate by design (IVF nprobe < k); k-means centroid floats
    // are additionally engine-specific. Exact twins q27/q28.
    "q53_ann_ivf",
    // runs through the typed mapPartitions decode stub — JVM-side
    // logic DuckDB can't mirror; the metadata twin q43 is oracled.
    "q44_media_features",
    // GK-sketch percentiles are approximate by design; the exact
    // oracle-checked twin is q48_percentiles (error bounded in spec).
    "q88_approx_percentiles",
    // HLL sketch estimates are engine-specific; the exact twin is a
    // plain distinct count (error bounded in spec vs countDistinct).
    "q91_hll_rollup",
    // PQ codebooks (k-means) are engine-specific and recall < 1 by
    // design; exact twins q27/q28, recall floor asserted in spec.
    "q98_ann_pq",
    // frequency-sketch item selection under count ties is engine-
    // internal; counts are spec-checked against exact frequencies,
    // exact top-k twin is q65-style group+rank.
    "q129_approx_topk",
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreEtlRegistry.oracleSql ++
    CurationRegistry.oracleSql ++
    DedupRegistry.oracleSql ++
    EventsRegistry.oracleSql ++
    QualityRegistry.oracleSql ++
    RelationalRegistry.oracleSql ++
    SimilarityRegistry.oracleSql ++
    StreamingRegistry.oracleSql ++
    TextRegistry.oracleSql
}
