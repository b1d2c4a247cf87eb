package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols._

/** Modern SQL surface (Spark 4.x): recursive CTEs, the VARIANT type
  * for semi-structured data, mergeable HLL sketches, ordered string
  * aggregation, built-in linear-regression aggregates, case-insensitive
  * collations, and XML parsing. Each is a verified catalog query —
  * these are the capabilities an Athena-replacement engine is expected
  * to answer in plain SQL.
  */
object ModernSql {

  /** Recursive CTE: build the calendar dimension between the first
    * and last order date, left-join daily order activity, report
    * per-month coverage vs gap days. Shape matters: the RECURSION
    * walks months (bounded, ~1 level per month — each level is a tiny
    * driver-side step), and day expansion is SET-BASED
    * (sequence+explode) — recursing per day would mean thousands of
    * sequential iterations, the anti-scale shape. The recursion
    * carries its own stop bound as a column, so anchor and step are
    * both pure. */
  def q89RecursiveCalendar(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      WITH RECURSIVE bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS mn,
               CAST(MAX(o_orderdate) AS DATE) AS mx
        FROM orders),
      months (m, mn0, mx) MAX RECURSION LEVEL 500 AS (
        SELECT CAST(trunc(mn, 'MM') AS DATE), mn, mx FROM bounds
        UNION ALL
        SELECT add_months(m, 1), mn0, mx FROM months
        WHERE add_months(m, 1) <= mx),
      cal AS (
        SELECT explode(sequence(greatest(m, mn0),
          least(CAST(last_day(m) AS DATE), mx), interval 1 day)) AS d
        FROM months),
      order_days AS (
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS od FROM orders)
      SELECT CAST(year(d) AS INT) AS yr, CAST(month(d) AS INT) AS mon,
        COUNT(*) AS n_days,
        CAST(SUM(CASE WHEN od IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_gap_days
      FROM cal LEFT JOIN order_days ON d = od
      GROUP BY year(d), month(d)
      ORDER BY yr, mon""")
  }

  /** VARIANT ingestion: `parse_json` shreds the JSON props into the
    * binary variant encoding once; `variant_get` then extracts typed
    * paths without re-parsing text per access — the semi-structured
    * scale path (one parse, many typed reads). */
  def q90VariantProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'int')").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Mergeable HLL rollup — the 100 TB distinct-count pattern: build
    * one sketch per (lang, source) partition, then UNION the sketches
    * per lang and estimate. The union is associative, so partition
    * sketches can be stored and re-aggregated along any rollup path
    * without touching raw data again (exactly how a daily→monthly
    * distinct-users rollup avoids rescanning history). Sketch bytes
    * are engine-specific → rows-only; the estimate is error-bounded
    * against exact distinct counts in spec. */
  def q91HllRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(expr("hll_sketch_agg(doc_id, 14)").as("sk"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sources"),
        expr("hll_sketch_estimate(hll_union_agg(sk))")
          .as("est_distinct_docs"))
      .orderBy(col("lang"))

  /** Ordered string aggregation (LISTAGG ... WITHIN GROUP): the
    * region→members roster. Deterministic because the order-by key is
    * unique within each group. */
  def q92ListAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .join(Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
          .as("members"))
      .orderBy(col("r_name"))

  /** Built-in regression aggregates: slope/intercept/R² of price vs
    * quantity per return flag. Incremental-moment internals differ in
    * final ulps across engines, so outputs are rounded — same
    * discipline as q67's correlation. */
  def q93RegrStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(expr("CAST(regr_count(y, x) AS BIGINT)").as("n"),
        round(expr("regr_slope(y, x)"), 6).as("slope"),
        round(expr("regr_intercept(y, x)"), 6).as("intercept"),
        round(expr("regr_r2(y, x)"), 6).as("r2"))
      .orderBy(col("l_returnflag"))

  /** Case-insensitive collation: group mixed-case values under
    * UTF8_LCASE without rewriting them through lower(). The
    * representative output value is min() over the ORIGINAL strings
    * (binary collation), keeping the result deterministic while the
    * GROUPING itself is collation-driven. */
  def q94Collation(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val mixed = d.select(col("lang"))
      .unionAll(d.select(upper(col("lang")).as("lang")))
    mixed
      .groupBy(collate(col("lang"), "UTF8_LCASE").as("k"))
      .agg(min(collate(col("lang"), "UTF8_BINARY")).as("lang_repr"),
        count(lit(1)).as("n"))
      .select(col("lang_repr"), col("n"))
      .orderBy(col("lang_repr"))
  }

  /** LATERAL correlated subquery: per-nation top-2 customers by
    * balance. The planner decorrelates the LATERAL LIMIT into a
    * ranked window over one shuffle — same physical shape as q7's
    * explicit window, reached from the SQL-standard formulation. */
  def q97LateralTopN(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      SELECT n_name, c_name, c_acctbal
      FROM nation,
      LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey ASC
        LIMIT 2) top_cust
      ORDER BY n_name, c_acctbal DESC, c_name""")
  }

  /** Modern SQL sugar in one verified query: GROUP BY ALL infers the
    * grouping keys, ORDER BY ALL orders by every output column, and
    * lateral column aliases (`revenue_x2` referencing `revenue_usd`
    * defined in the same SELECT) avoid repeating expressions. Sugar
    * only changes authoring, not the plan: the oracle is the fully
    * spelled-out equivalent and must hash-match. `revenue_back`
    * round-trips the lateral chain (x*2 - x == x exactly in IEEE). */
  def q126SqlSugar(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      WITH per AS (
        SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
          COUNT(*) AS n_orders,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ALL)
      SELECT n_name, yr, n_orders,
        CAST(revenue AS DOUBLE) AS revenue_usd,
        revenue_usd * 2 AS revenue_x2,
        revenue_x2 - revenue_usd AS revenue_back
      FROM per
      ORDER BY ALL""")
  }

  /** SQL scalar UDF (CREATE FUNCTION ... RETURN expr): the engine's
    * user-extension surface without leaving SQL. The body is inlined
    * by the analyzer into the calling plan — unlike an opaque JVM
    * UDF it stays visible to Catalyst (pushdown/codegen), so this is
    * the preferred extension tier below a native Expression. Returns
    * DECIMAL so the aggregation stays order-independent-exact. */
  def q127SqlScalarUdf(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION net_usd(price DOUBLE, disc DOUBLE)
      RETURNS DECIMAL(18,4)
      RETURN CAST(CAST(price AS DECIMAL(18,2))
        * (1 - CAST(disc AS DECIMAL(18,2))) AS DECIMAL(18,4))""")
    spark.sql("""
      SELECT l_returnflag,
        CAST(SUM(net_usd(l_extendedprice, l_discount)) AS DOUBLE)
          AS net_revenue,
        COUNT(*) AS n_items
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  }

  /** SQL table UDF (RETURNS TABLE): a set-generating function usable
    * in FROM — here a parameterized histogram-bin generator, range-
    * joined (broadcast: 12 rows) against orders. LEFT JOIN from the
    * bins keeps empty buckets, the shape a reporting layer needs. */
  def q128SqlTableUdf(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION price_bins(width DOUBLE, n INT)
      RETURNS TABLE(bin INT, lo DOUBLE, hi DOUBLE)
      RETURN SELECT CAST(i AS INT) AS bin, i * width AS lo,
        (i + 1) * width AS hi
      FROM (SELECT explode(sequence(0, n - 1)) AS i)""")
    spark.sql("""
      SELECT b.bin, CAST(b.lo AS BIGINT) AS lo_usd,
        COUNT(o_orderkey) AS n_orders
      FROM price_bins(CAST(50000 AS DOUBLE), 12) b
      LEFT JOIN orders ON o_totalprice >= b.lo AND o_totalprice < b.hi
      GROUP BY b.bin, b.lo
      ORDER BY b.bin""")
  }

  /** approx_top_k heavy hitters: one-pass mergeable frequency sketch
    * (map-side partials, no exact per-key shuffle) — the 100 TB
    * "top trending items" pattern. Item SELECTION under count ties is
    * sketch-internal → rows-only; the spec checks every reported
    * count against exact counts and that nothing above the k-th
    * exact frequency was missed. Exact twin: q65-style group+rank. */
  def q129ApproxTopK(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      SELECT e.item AS p_brand, CAST(e.count AS BIGINT) AS est_count
      FROM (SELECT explode(approx_top_k(p_brand, 8)) AS e FROM part)
      ORDER BY est_count DESC, p_brand""")
  }

  /** Heavy-hitter certificate for q129's approx_top_k: the exact
    * top-8 brands (deterministic count-desc/brand-asc tie-break) each
    * carry a `certified` flag — true unless the brand's exact count
    * STRICTLY exceeds the 8th-ranked count and the sketch still
    * missed it. Boundary ties are certified trivially (which item of
    * a tie the sketch reports is sketch-internal, q129's documented
    * rows-only reason); a genuine heavy hitter dropped by the sketch
    * fails the hash because the oracle asserts TRUE everywhere. At 25
    * distinct brands the sketch tracks every item, so the certificate
    * is also exercising the merge path, not saturation. */
  def q246TopkCert(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      WITH approx AS (
        SELECT e.item AS p_brand, CAST(e.count AS BIGINT) AS est
        FROM (SELECT explode(approx_top_k(p_brand, 8)) AS e FROM part)),
      exact AS (
        SELECT p_brand, COUNT(*) AS n_parts FROM part GROUP BY p_brand),
      topx AS (
        SELECT p_brand, n_parts FROM exact
        ORDER BY n_parts DESC, p_brand LIMIT 8),
      k AS (SELECT MIN(n_parts) AS kth FROM topx)
      SELECT t.p_brand, t.n_parts,
        (t.n_parts <= k.kth OR a.p_brand IS NOT NULL) AS certified
      FROM topx t CROSS JOIN k
      LEFT JOIN approx a ON a.p_brand = t.p_brand
      ORDER BY t.n_parts DESC, t.p_brand""")
  }

  /** Merged-sketch certificate for q91's HLL rollup: the per-source
    * sketches are unioned per lang and the estimate is checked against
    * the exact distinct count in the same output row — the bound that
    * matters is on the MERGED sketch (union error compounds), which is
    * exactly what a stored-sketch rollup pipeline needs certified.
    * lgK=14 keeps these cardinalities in sparse mode, so the 2.5%
    * bound is generous; the flag is hash-checked (oracle emits TRUE). */
  def q247HllRollupCert(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merged = docs
      .groupBy(col("lang"), col("source"))
      .agg(expr("hll_sketch_agg(doc_id, 14)").as("sk"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sources"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    docs.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("exact_distinct"))
      .join(merged, "lang")
      .select(col("lang"), col("exact_distinct"), col("n_sources"),
        (abs(col("est") - col("exact_distinct")).cast("double") /
          col("exact_distinct").cast("double") <= 0.025)
          .as("within_bound"))
      .orderBy(col("lang"))
  }

  /** Parameterized SQL (named markers, Spark 4): the injection-safe
    * templated-query surface a serving layer uses — parameters bind
    * as literals into the analyzed plan, so constant folding and
    * partition/filter pushdown see real values, unlike string
    * concatenation which risks both injection and plan-cache misses. */
  def q130ParamSql(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """
      SELECT o_orderpriority, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total_usd
      FROM orders
      WHERE o_orderstatus = :status
        AND o_orderdate >= :from_date
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",
      Map("status" -> "F", "from_date" -> "1995-01-01"))
  }

  /** SQL scripting (Spark 4 BEGIN…END): procedural control flow —
    * DECLARE'd variables, a WHILE loop, scalar-subquery assignment —
    * executed entirely engine-side. The script walks the price
    * threshold up in 50k steps until fewer than 1000 orders remain
    * above it (the parameter-search shape of an analyst's admin
    * script); the oracle derives the same fixpoint set-based. Each
    * loop iteration is a full query, so the procedural surface
    * composes with everything else in the engine. */
  def q152SqlScripting(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    val key = "spark.sql.scripting.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try spark.sql("""
      BEGIN
        DECLARE thr DOUBLE DEFAULT 0;
        DECLARE cnt BIGINT DEFAULT 9223372036854775807;
        WHILE cnt > 1000 DO
          SET thr = thr + 50000;
          SET cnt = (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr);
        END WHILE;
        SELECT CAST(thr AS BIGINT) AS threshold, cnt AS n_above,
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             AS DOUBLE)
           FROM orders WHERE o_totalprice > thr) AS revenue_above;
      END""")
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** EXECUTE IMMEDIATE with session variables: SQL text built and run
    * inside the engine with `?` placeholders bound via USING — the
    * dynamic-SQL surface (templated admin queries, multi-tenant
    * fan-out) with injection-safe parameter binding, complementing
    * q130's static named markers. */
  def q153ExecImmediate(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""DECLARE OR REPLACE VARIABLE graft_stmt STRING
      DEFAULT 'SELECT p_brand, COUNT(*) AS n_parts,
        CAST(MIN(p_retailprice) AS DOUBLE) AS min_price
      FROM part WHERE p_size >= ? GROUP BY p_brand ORDER BY p_brand'""")
    spark.sql("DECLARE OR REPLACE VARIABLE graft_min_size INT DEFAULT 0")
    spark.sql("SET VAR graft_min_size = 25")
    spark.sql("EXECUTE IMMEDIATE graft_stmt USING graft_min_size")
  }

  /** SQL pipe syntax (`|>`): the linear query form where each stage
    * reads top-to-bottom — scan, filter, aggregate, post-aggregate
    * filter, derived column, order. Pipe operators compile to exactly
    * the same Catalyst plan as the nested-SELECT equivalent (the
    * oracle), so readability costs nothing at any scale; `AGGREGATE
    * ... GROUP BY` emits the grouping keys implicitly and `EXTEND`
    * appends a computed column without re-listing the projection. */
  def q172SqlPipe(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      FROM orders
      |> WHERE o_orderstatus <> 'P'
      |> AGGREGATE COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
           GROUP BY o_orderpriority, o_orderstatus
      |> WHERE n_orders >= 5
      |> EXTEND CAST(round(revenue / n_orders, 2) AS DOUBLE)
           AS avg_order
      |> ORDER BY o_orderpriority, o_orderstatus""")
  }

  /** XML parsing: documents serialized as XML records (the third
    * semi-structured format next to JSON/variant), parsed back with
    * `from_xml` against an explicit schema and aggregated. The oracle
    * runs on the original columns, so any escaping/typing drift in
    * the serialize→parse cycle fails the hash. */
  def q95XmlParse(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(concat(lit("<doc><id>"), col("doc_id"),
        lit("</id><lang>"), col("lang"),
        lit("</lang><nc>"), col("n_chars"),
        lit("</nc></doc>")).as("xml"))
      .select(expr(
        "from_xml(xml, 'id BIGINT, lang STRING, nc BIGINT')").as("p"))
      .groupBy(col("p.lang").as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("p.nc")).as("total_chars"),
        countDistinct(col("p.id")).as("n_distinct_docs"))
      .orderBy(col("lang"))
}
