package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols._

/** The general relational surface (SURVEY.md §2B): scans, filter/project,
  * aggregation, joins (broadcast/semi/anti), windows, set ops, sort/limit,
  * distinct, rollup, SQL-string entry point.
  *
  * The reference delegates this layer to AWS Athena (SURVEY.md §3 EP3);
  * here it is native Spark SQL. Scale notes are on each operator.
  */
object Relational {

  /** TPC-H Q1-style pricing summary. One shuffle on the (low-cardinality)
    * group keys; partial aggregation makes the shuffle tiny regardless of
    * input size, so this is scan-bound at 100 TB. Decimal arithmetic keeps
    * partial aggregation exact (associative). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Filter + projection. Both the predicate and the 4-column read schema
    * push into the parquet scan (verified via explain: PushedFilters /
    * ReadSchema) — at 100 TB this reads only matching row groups. */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_quantity") > 45)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("disc_price"))

  /** Revenue per nation: lineitem ⋈ orders ⋈ customer ⋈ nation.
    * The two big joins shuffle on their keys; `nation` (25 rows) is
    * broadcast so the final join adds no shuffle. AQE handles skew. */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("rev"))
    val ord  = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val nat  = Tables.nation(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** Dimension join with explicit broadcast: part is small relative to
    * lineitem (1:4 vs 1:30 row ratio, and shrinks further after the p_size
    * filter) — broadcasting eliminates shuffling the fact table. */
  def q4BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_size") >= 40).select("p_partkey", "p_brand")
    Tables.lineitem(spark, dir).select("l_partkey", "l_quantity")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("p_brand"))
  }

  /** Left-semi join (EXISTS): customers that have at least one high-value
    * order, counted by segment. Semi join never duplicates rows, and
    * Spark pushes only the join key through the shuffle. */
  def q5SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 200000).select(col("o_custkey"))
    Tables.customer(spark, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left-anti join (NOT EXISTS): customers with no order above 400k. */
  def q6AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
              .filter(col("o_totalprice") > 400000)
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Top-3 orders per customer by price: window + row_number. One shuffle
    * on o_custkey; the rank filter evaluates streaming per-group (Spark
    * plans WindowExec with running row_number, no full materialization
    * beyond the partition). Tie-break on o_orderkey for determinism. */
  def q7WindowTopN(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
              col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running total per supplier over ship time (ROWS frame, fully ordered
    * by a unique key triple so the cumulative sum is deterministic). */
  def q8WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 10)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
              sum(dec(col("l_quantity"))).over(w)
                .cast("double").as("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** DISTINCT via hash aggregate (partial distinct map-side first). */
  def q9Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Exact distinct counts (the dashboard-style cardinality query). */
  def q10CountDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  /** Set operations: nations that have suppliers vs customers.
    * INTERSECT/EXCEPT are distinct-semantics in both Spark and ANSI. */
  def q11SetOps(spark: SparkSession, dir: String): DataFrame = {
    val supNations  = Tables.supplier(spark, dir)
      .select(col("s_nationkey").cast("int").as("nationkey"))
    val custNations = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("int").as("nationkey"))
    val both    = supNations.intersect(custNations)
      .withColumn("which", lit("both"))
    val custOnly = custNations.except(supNations)
      .withColumn("which", lit("cust_only"))
    both.unionByName(custOnly).orderBy(col("which"), col("nationkey"))
  }

  /** Global top-10 by price: Catalyst plans TakeOrderedAndProject —
    * each partition keeps a 10-row heap, no full sort, no big shuffle.
    * Exactly the plan you want for top-k over 100 TB. */
  def q12SortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** ROLLUP for the reporting layer (dashboard subtotal rows). */
  def q13Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)

  /** GROUP BY + HAVING (post-aggregation filter). */
  def q14Having(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("total_spent"))
      .filter(col("n_orders") >= 15)
      .orderBy(col("o_custkey"))

  /** when-chain decode (the reference's O12/O13 shape, SURVEY.md §2A) on
    * o_orderpriority: whitelist + decode + default. Pure Catalyst CASE
    * WHEN — constant-folded, codegen'd, no UDF. */
  def q15CaseDecode(spark: SparkSession, dir: String): DataFrame = {
    val valid = Seq("1-URGENT", "2-HIGH", "3-MEDIUM")
    val pr = col("o_orderpriority")
    Tables.orders(spark, dir)
      .withColumn("priority_clean",
        when(pr.isin(valid: _*), pr).otherwise(lit("OTHER")))
      .withColumn("priority_meaning",
        when(pr === "1-URGENT", "Urgente")
          .when(pr === "2-HIGH", "Alta")
          .when(pr === "3-MEDIUM", "Media")
          .otherwise("Desconocido"))
      .groupBy(col("priority_clean"), col("priority_meaning"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("priority_clean"))
  }

  /** Date-dimension aggregation: orders per year/month. */
  def q16DateAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("yr"),
               month(col("o_orderdate")).as("mon"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("total"))
      .orderBy(col("yr"), col("mon"))

  /** String-function surface over part: like, split, regexp, trim, concat. */
  def q17StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").like("%an%"))
      .select(
        col("p_partkey"),
        split(col("p_name"), " ").getItem(0).as("name_first"),
        trim(regexp_replace(col("p_name"), "[aeiou]", "")).as("name_novowel"),
        concat(col("p_brand"), lit("#"), col("p_size").cast("string"))
          .as("brand_size"))
      .orderBy(col("p_partkey"))

  /** CUBE over two dimensions (all subtotal combinations) — the other
    * multi-dimensional reporting shape next to ROLLUP. */
  def q21Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
               col("o_orderpriority").asc_nulls_first)

  /** Approximate distinct (HLL++): the scale path for cardinality over
    * 100 TB where exact countDistinct would shuffle every key. Algorithm
    * differs from DuckDB's approx_count_distinct, so this is rows-only;
    * the companion exact query q10 is the oracle-checked twin. */
  def q22ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** HLL error CERTIFICATE — q22's approximation turned into a checked
    * invariant (the q213/q226 pattern applied to the oldest no-oracle
    * row): the HLL++ estimate and the exact distinct count are computed
    * in ONE aggregate pass, and the output carries the exact side plus
    * a within-bound flag. The estimate itself is engine-specific and
    * stays out of the hashed output, but the flag is hash-checked — the
    * DuckDB oracle emits literal TRUE, so if Spark's sketch ever drifts
    * past the bound the round's correctness gate fails. Spark's HLL++
    * is deterministic for fixed data (no seed), so the flag is stable.
    *
    * Bound: rsd is configured at 0.05; the certificate allows 3×rsd
    * (0.15) relative error — conservative enough to be stable, tight
    * enough to catch a broken sketch. RelationalSpec additionally pins
    * the OBSERVED error at test scale well inside one rsd. At 100 TB
    * the exact side is the expensive one (a full distinct shuffle);
    * the certificate is what you run on a sampled slice to qualify the
    * cheap sketch for the other 99.9% of partitions. */
  def q234HllErrorCert(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.05).as("est"),
        count(lit(1)).as("n_rows"))
      .withColumn("rel_err",
        abs(col("est") - col("exact_parts")).cast("double") /
          col("exact_parts").cast("double"))
      .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
        (col("rel_err") <= 0.15).as("within_bound"))
      .orderBy(col("l_returnflag"))

  /** GK-percentile error certificate — q234's pattern applied to q88:
    * exact and sketch percentiles in ONE aggregate pass, exact side +
    * within-5% flag hash-checked (oracle emits TRUE). The 5% bound is
    * the q88-spec tolerance: at this size the sketch is rank-exact and
    * the residual is interpolated-value vs nearest-data-value. */
  def q245PercentileCert(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        expr("percentile(o_totalprice, 0.99)").as("p99"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("a50"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("a90"),
        expr("approx_percentile(o_totalprice, 0.99, 10000)").as("a99"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        col("p50"), col("p90"), col("p99"), col("n"),
        (abs(col("a50") - col("p50")) / col("p50") <= 0.05 &&
          abs(col("a90") - col("p90")) / col("p90") <= 0.05 &&
          abs(col("a99") - col("p99")) / col("p99") <= 0.05)
          .as("within_bound"))
      .orderBy(col("o_orderpriority"))

  /** Reporting query the README's dashboard implies (SURVEY.md §2B):
    * top part-brand per nation by revenue — join + agg + window topN. */
  def q23TopBrandPerNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("rev"))
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(spark, dir)
    val prt = Tables.part(spark, dir).select("p_partkey", "p_brand")
    val perBrand = li
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("revenue").desc, col("p_brand").asc)
    perBrand.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("n_name"), col("rk"), col("p_brand"), col("revenue"))
      .orderBy(col("n_name"), col("rk"))
  }

  /** Exact percentiles per group (the dashboard latency/price quantile
    * query). Spark's `percentile` is exact (full sort per group) —
    * the oracle-checkable anchor; `approx_percentile` (KLL/GK sketch,
    * engine-specific) is the 100 TB twin exercised in RelationalSpec. */
  def q48Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        expr("percentile(o_totalprice, 0.99)").as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Approximate percentiles via the GK sketch — the 100 TB path: the
    * exact `percentile` buffers every value per group, the sketch is
    * O(1/accuracy) memory and merges associatively (map-side partial),
    * so the shuffle carries sketches, not data. Sketch internals are
    * engine-specific → rows-only; q48 is the oracle-checked exact twin
    * and RelationalSpec bounds the error against it. */
  def q88ApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("p90"),
        expr("approx_percentile(o_totalprice, 0.99, 10000)").as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Pivot (reporting cross-tab): order counts by status × priority.
    * Explicit pivot values keep the plan a single pass (no distinct
    * pre-query) and the output schema stable; missing combinations are
    * coalesced to 0 to match SQL conditional aggregation. */
  def q49Pivot(spark: SparkSession, dir: String): DataFrame = {
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")
    val pivoted = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
    pivoted.select(col("o_orderstatus") +: priorities.map(p =>
      coalesce(col(s"`$p`"), lit(0L)).as(p)): _*)
      .orderBy(col("o_orderstatus"))
  }

  /** GROUPING SETS through the SQL surface — the third multi-
    * dimensional aggregation shape next to ROLLUP (q13) and CUBE
    * (q21), with grouping() to tag subtotal rows. */
  def q50GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(grouping(o_orderstatus) AS INT) AS g_status,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus ASC NULLS FIRST,
               o_orderpriority ASC NULLS FIRST
    """)
  }

  /** Exact population variance from decimal power sums: Var = Sxx/n −
    * (Sx/n)² with Sx, Sxx exact decimals. Power sums are associative,
    * so partial (map-side) aggregation stays exact at any scale —
    * unlike the built-in `var_pop`, whose float merge order varies
    * with partitioning and across engines. The double math on top of
    * the exact sums is engine-reproducible. */
  def q66ExactVariance(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).as("sx"),
        sum(dec(col("l_quantity")) * dec(col("l_quantity"))).as("sxx"))
      .select(col("l_returnflag"), col("n"),
        (col("sxx").cast("double") / col("n").cast("double") -
          (col("sx").cast("double") / col("n").cast("double")) *
          (col("sx").cast("double") / col("n").cast("double")))
          .as("var_pop_qty"))
      .orderBy(col("l_returnflag"))

  /** Pearson correlation from the same power-sum construction:
    * corr = (n·Sxy − Sx·Sy) / sqrt((n·Sxx − Sx²)(n·Syy − Sy²)),
    * every S an exact decimal sum, the final arithmetic double. */
  def q67CorrPowerSums(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sx"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sy"),
        sum(dec(col("l_quantity")) * dec(col("l_quantity")))
          .cast("double").as("sxx"),
        sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice")))
          .cast("double").as("syy"),
        sum(dec(col("l_quantity")) * dec(col("l_extendedprice")))
          .cast("double").as("sxy"))
      .select(col("l_returnflag"),
        // rounded to 9 decimals: the long double-expression chain can
        // differ from the oracle by one ulp (FMA contraction in its
        // vectorized evaluator); the power sums themselves are exact
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 9)
          .as("corr_qty_price"))
      .orderBy(col("l_returnflag"))

  /** Multiset (bag) set operations: EXCEPT ALL keeps multiplicity —
    * the per-occurrence surplus of high-quantity over low-quantity
    * line items per (flag, status), aggregated to keep the result
    * compact. */
  def q63MultisetSetops(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val high = li.filter(col("l_quantity") > 25)
      .select(col("l_returnflag"), col("l_linestatus"))
    val low = li.filter(col("l_quantity") <= 25)
      .select(col("l_returnflag"), col("l_linestatus"))
    high.exceptAll(low)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("surplus"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * match NULL keys — the semantics dimension tables with unknown
    * members need. Priority classes are NULLed for '5-LOW' to create
    * genuine NULL keys on both sides. */
  def q64NullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.filter(col("o_orderstatus") === "F")
      .select(nullif(col("o_orderpriority"), lit("5-LOW")).as("pr"))
      .groupBy(col("pr")).agg(count(lit(1)).as("n_f"))
    val b = o.filter(col("o_orderstatus") === "O")
      .select(nullif(col("o_orderpriority"), lit("5-LOW")).as("pr_b"))
      .groupBy(col("pr_b")).agg(count(lit(1)).as("n_o"))
    a.join(b, col("pr") <=> col("pr_b"))
      .select(col("pr"), col("n_f"), col("n_o"))
      .orderBy(col("pr").asc_nulls_first)
  }

  /** Outer-join completeness: the same customer↔high-value-orders
    * relationship through LEFT, RIGHT, and FULL OUTER joins, each
    * reduced to (matched, unmatched-left, unmatched-right) counts.
    * One aggregate per join; the build side is the filtered order set
    * so each join shuffles the small side only once. */
  def q99OuterJoins(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"))
    val big = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey"), col("o_orderkey"))
    def summarize(kind: String) =
      cust.join(big, col("c_custkey") === col("o_custkey"), kind)
        .agg(
          count(when(col("c_custkey").isNotNull &&
            col("o_custkey").isNotNull, 1)).as("n_matched"),
          count(when(col("o_custkey").isNull, 1)).as("n_left_only"),
          count(when(col("c_custkey").isNull, 1)).as("n_right_only"))
        .select(lit(kind).as("join_type"), col("n_matched"),
          col("n_left_only"), col("n_right_only"))
    summarize("left").unionByName(summarize("right"))
      .unionByName(summarize("full_outer"))
      .orderBy(col("join_type"))
  }

  /** LOCF gap-fill (last observation carried forward): error readings
    * are NULLed, then repaired with the previous non-null value per
    * user via `last(..., ignoreNulls)` over an unbounded-preceding
    * frame — the standard sensor/metric imputation. One shuffle on
    * user_id; the frame is streaming-evaluable (no buffering). */
  def q100GapFill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("reading",
        when(col("event_type") === "error", lit(null))
          .otherwise(col("value")))
      .withColumn("filled",
        last(col("reading"), ignoreNulls = true).over(w))
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("reading"), col("filled"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Centered moving average (±2 rows) per supplier over ship dates —
    * the smoothing window shape (bounded frame both directions).
    * Bounded frames evaluate with O(frame) state per partition. */
  def q101MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(-2, 2)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 10)
      .withColumn("ma_qty",
        (sum(dec(col("l_quantity"))).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("ma_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Typed cogroup: orders and their lineitems co-processed per key in
    * ONE pass — the KeyValueGroupedDataset surface for logic that a
    * join+agg can't express (here it can, which is exactly what makes
    * it oracle-checkable: per-order item count and quantity total for
    * orders above a price floor). Both sides shuffle once on the key;
    * the groups stream through the function without materializing a
    * joined row per (order × item) pair. */
  def q110Cogroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Double)]
      .groupByKey(_._1)
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        dec(col("l_quantity")).cast("double").as("qty"))
      .as[(Long, Double)]
      .groupByKey(_._1)
    orders.cogroup(items) { (key, os, ls) =>
      os.toSeq.headOption.iterator.map { o =>
        // accumulate in exact cents: float addition would depend on
        // the (unspecified) group iteration order. Itemless orders
        // yield None → NULL, matching SQL's SUM over an empty group.
        var n = 0L; var cents = 0L
        ls.foreach { l => n += 1; cents += math.round(l._2 * 100) }
        (key, o._2, n, if (n == 0) None else Some(cents / 100.0))
      }
    }.toDF("o_orderkey", "o_totalprice", "n_items", "sum_qty")
      .orderBy(col("o_orderkey"))
  }

  /** Correlated scalar subquery — exercises Catalyst's decorrelation:
    * the per-customer COUNT rewrites to an aggregate + left join, so
    * no per-row subquery execution survives into the physical plan. */
  def q61CorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      SELECT c_custkey, c_mktsegment
      FROM customer c
      WHERE (SELECT COUNT(*) FROM orders o
             WHERE o.o_custkey = c.c_custkey
               AND o.o_totalprice > 300000) >= 2
      ORDER BY c_custkey
    """)
  }

  /** RANGE-frame window: trailing 30-day spend per customer — the
    * frame is bounded by ORDER-BY VALUE (event time), not row
    * position, so same-day orders share identical totals. Ordering on
    * epoch micros keeps the offset arithmetic exact. */
  def q62RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val thirtyDaysUs = 30L * 86400 * 1000000
    val w = Window.partitionBy(col("o_custkey"))
      // o_orderdate is TIMESTAMP_NTZ; the UTC-session cast to TIMESTAMP
      // is a constant shift, so frame membership is unchanged
      .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
      .rangeBetween(-thirtyDaysUs, 0)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice"))).over(w)
          .cast("double").as("trailing_total"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Window navigation functions in one pass: lead/lag, first/last
    * value over the full partition frame, quartile bucket (ntile) and
    * percent_rank — all share ONE window spec, so Spark plans a single
    * sort+WindowExec (one shuffle on o_custkey). Explicit unbounded
    * frame for last_value; the default running frame would return the
    * current row. */
  def q72WindowNav(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(full).as("first_price"),
        last(col("o_totalprice")).over(full).as("last_price"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 9).as("pct_rank"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** One-pass column profiling: per-column row/null/distinct counts
    * and min/max, emitted as one row per column (the data-quality
    * summary every ingest pipeline runs first). All statistics come
    * from a single aggregate over one scan — the multi-distinct is
    * planned via expand, still one pass over the data — then pivot to
    * long form with a literal stack (no second scan). Numeric ranges
    * stay DOUBLE and string ranges stay VARCHAR so no engine-specific
    * float formatting enters the output. */
  def q73ProfileColumns(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val strCols = Seq("o_orderstatus", "o_orderpriority")
    val numCols = Seq("o_custkey", "o_totalprice")
    val aggs = (strCols ++ numCols).flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"))
    } ++ strCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    } ++ numCols.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"))
    }
    val wide = o.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // inline(array(named_struct(...))) rather than stack(): stack's
    // type check compares struct FIELD names, which differ per column
    val rows = (strCols.map(c =>
      s"named_struct('col_name', '$c', 'n_nonnull', nn_$c, " +
        s"'n_distinct', nd_$c, 'min_num', CAST(NULL AS DOUBLE), " +
        s"'max_num', CAST(NULL AS DOUBLE), 'min_str', min_$c, " +
        s"'max_str', max_$c)") ++
      numCols.map(c =>
        s"named_struct('col_name', '$c', 'n_nonnull', nn_$c, " +
          s"'n_distinct', nd_$c, 'min_num', min_$c, 'max_num', max_$c, " +
          s"'min_str', CAST(NULL AS STRING), " +
          s"'max_str', CAST(NULL AS STRING))"))
      .mkString(", ")
    wide.selectExpr("n_rows", s"inline(array($rows))")
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"), col("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
      .orderBy(col("col_name"))
  }

  /** Pivot + unpivot round trip: the q49-style cross-tab melted back
    * to long form with `Dataset.unpivot` (ANSI UNPIVOT). Empty cells
    * (null after pivot) are dropped so the long form equals the plain
    * group-by the oracle runs. Reshaping is projection-only on top of
    * one aggregation shuffle. */
  def q77Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
      .unpivot(Array(col("o_orderstatus")), prios.map(col).toArray,
        "o_orderpriority", "n")
      .filter(col("n").isNotNull)
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  /** Nested-array processing: per customer, collect order totals,
    * sort descending, slice the top 3 and fold them to a sum — the
    * collect_list / sort_array / slice / aggregate higher-order
    * pipeline for array columns. collect_list alone is order-
    * nondeterministic; sort_array immediately canonicalizes it, and
    * the fold then runs in a fixed order, so the double sum is
    * bit-reproducible. One shuffle on the group key; arrays stay
    * bounded by orders-per-customer. */
  def q78NestedArrays(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(collect_list(col("o_totalprice")).as("prices"))
      .select(col("o_custkey"),
        size(col("prices")).as("n_orders"),
        expr("sort_array(prices, false)[0]").as("top1"),
        expr("aggregate(slice(sort_array(prices, false), 1, 3), " +
          "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("top3_sum"))
      .orderBy(col("o_custkey"))

  /** Date parsing and arithmetic: format → parse round trip,
    * day offsets, month truncation/end, day difference — the
    * ingest-side timestamp toolkit (reference's date columns are
    * dropped at cleanse; this is the surface a real feed needs).
    * All derived dates render as strings so both engines compare
    * calendar values, not epoch encodings. */
  def q79DateParsing(spark: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("dstr"),
        to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd"),
          "yyyy-MM-dd").as("parsed"),
        date_format(date_add(d, 30), "yyyy-MM-dd").as("plus30"),
        date_format(trunc(d, "month"), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(d), "yyyy-MM-dd").as("month_end"),
        datediff(lit("1998-12-31").cast("date"), d).cast("long")
          .as("days_to_end"))
      .orderBy(col("o_orderkey"))
  }

  /** The SQL-string entry point (EP3 parity): same engine, ANSI SQL text.
    * Proves the temp-view catalog + spark.sql path works end-to-end,
    * with the library's native functions registered by SQL name. */
  def qSqlSurface(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    graft.functions.GraftFunctions.register(spark)
    spark.sql("""
      SELECT o.o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_line_items,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority
    """)
  }

  /** Argmax/argmin without a window: `max_by`/`min_by` fold the
    * associated value alongside the extremum in ONE aggregation pass —
    * no per-group sort, no rank, partial-aggregable, so the shuffle
    * carries one candidate per group per partition (compare q7's
    * window top-N, which shuffles every row). The ordering key embeds
    * a unique tie-break (exact integer cents · 10^7 + custkey) so the
    * chosen row is deterministic even under balance ties. */
  def q146ArgMax(spark: SparkSession, dir: String): DataFrame = {
    val key = (floor(col("c_acctbal") * 100 + 0.5).cast("long") *
      10000000L + col("c_custkey")).as("k")
    Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"), col("c_acctbal"), key)
      .groupBy(col("n_name"))
      .agg(expr("max_by(c_name, k)").as("richest"),
        max(col("c_acctbal")).as("max_bal"),
        expr("min_by(c_name, k)").as("poorest"),
        min(col("c_acctbal")).as("min_bal"))
      .orderBy(col("n_name"))
  }

  /** Exact distinct counting via mergeable roaring-style bitmaps: ids
    * bucket into 32k-bit pages, each page folds to one bitmap
    * (`bitmap_construct_agg`), pages OR-merge (`bitmap_or_agg`) and
    * pop-count. Unlike HLL (q22/q91) the answer is EXACT, and unlike
    * COUNT(DISTINCT) the partials are tiny, associative and storable —
    * the ClickHouse/Iceberg approach to exact distinct users at 100 TB
    * (persist page bitmaps, re-merge along any rollup). The oracle is
    * plain COUNT(DISTINCT): the sketch must be lossless. */
  def q147BitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      SELECT l_returnflag,
        bitmap_count(bitmap_or_agg(b)) AS n_distinct_orders,
        CAST(SUM(page_rows) AS BIGINT) AS n_rows
      FROM (
        -- +1: Spark's bitmap position/bucket functions are 1-based
        -- (id 0 would fall off page 0); the shift is bijective so
        -- distinct counts are unchanged
        SELECT l_returnflag, bitmap_bucket_number(l_orderkey + 1) AS page,
          bitmap_construct_agg(bitmap_bit_position(l_orderkey + 1)) AS b,
          COUNT(*) AS page_rows
        FROM lineitem
        GROUP BY l_returnflag, bitmap_bucket_number(l_orderkey + 1))
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  }

  /** 3-sigma outlier detection per group: mean and stddev derived from
    * EXACT decimal power sums (q66's discipline — the partials are
    * associative, so map-side aggregation stays correct), converted to
    * doubles only at the end; the outlier predicate then compares the
    * raw values against mean ± 3σ. Two passes over the fact table
    * (stats, then flagging) joined on the tiny group key — the
    * standard distributed standardization shape. */
  def q160Outliers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("pri"),
        col("o_totalprice").cast("double").as("x"),
        dec(col("o_totalprice")).as("xd"))
    val stats = o.groupBy(col("pri"))
      .agg(count(lit(1)).as("n"),
        sum(col("xd")).as("s1"),
        sum(col("xd") * col("xd")).as("s2"))
      .select(col("pri"), col("n"),
        (col("s1").cast("double") / col("n")).as("mean"),
        // clamp: double rounding can push a ~0 variance one ulp
        // negative; sqrt(-ε) is NaN here but an ERROR in other
        // engines — the clamp makes the boundary exact on both
        sqrt(greatest((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n")) / col("n"), lit(0.0))).as("sd"))
    o.join(broadcast(stats), "pri")
      .select(col("pri"), col("n"), col("mean"), col("sd"),
        (col("x") > col("mean") + lit(3.0) * col("sd") ||
          col("x") < col("mean") - lit(3.0) * col("sd"))
          .cast("long").as("is_outlier"))
      .groupBy(col("pri"))
      .agg(max(col("n")).as("n_orders"),
        round(max(col("mean")), 6).as("mean_price"),
        round(max(col("sd")), 6).as("sd_price"),
        sum(col("is_outlier")).as("n_outliers"))
      .orderBy(col("pri"))
  }

  /** Schema-drift union: an old batch lacking a column unioned with a
    * new batch that has it, via `unionByName(allowMissingColumns)` —
    * position-based `union` would silently misalign columns here (the
    * classic ingest bug); by-name resolution nulls the missing column
    * instead, and the null is repaired downstream. This is the
    * batch-side half of schema evolution (q105's mergeSchema read is
    * the storage-side half). */
  def q138UnionByName(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val legacy = o.filter(year(col("o_orderdate")) < lit(1995))
      .select(col("o_orderkey"), col("o_totalprice"))
    val modern = o.filter(year(col("o_orderdate")) >= lit(1995))
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority"))
    legacy.unionByName(modern, allowMissingColumns = true)
      .groupBy(coalesce(col("o_orderpriority"), lit("LEGACY"))
        .as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_usd"))
      .orderBy(col("priority"))
  }

  /** Boolean / conditional aggregates: `count_if`, `bool_and`,
    * `bool_or`, and a filtered sum — the predicate-aggregation family
    * dashboards lean on. All four are plain partial aggregates (a
    * boolean fold is associative), so map-side combine keeps the
    * shuffle at group-count size regardless of input rows. */
  def q166BoolAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        count_if(col("o_totalprice") > 150000).as("n_big"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        bool_or(col("o_orderstatus") === "F").as("any_finished"),
        dsum(when(col("o_totalprice") > 150000, col("o_totalprice"))
          .otherwise(lit(0))).as("big_revenue"))
      .orderBy(col("o_orderpriority"))

  /** Population skewness and excess kurtosis from exact decimal power
    * sums (S1..S4), same construction as q66/q67: the sums are
    * associative and map-side combinable, so one pass and one tiny
    * shuffle at any scale, and — unlike the built-in `skewness` /
    * `kurtosis`, whose float merge order varies with partitioning —
    * the result is bitwise reproducible across partition counts and
    * engines. decimal(7,2) keeps x⁴ products inside decimal(38,8). */
  def q167SkewKurtosis(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(7,2)")
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("s1"),
        sum(x * x).cast("double").as("s2"),
        sum(x * x * x).cast("double").as("s3"),
        sum(x * x * x * x).cast("double").as("s4"))
      .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
        {
          val m1 = col("s1") / col("n")
          val m2 = col("s2") / col("n") - m1 * m1
          val m3 = col("s3") / col("n") - lit(3) * m1 * (col("s2") / col("n")) +
            lit(2) * m1 * m1 * m1
          round(m3 / pow(m2, 1.5), 9).as("skew_qty")
        },
        {
          val m1 = col("s1") / col("n")
          val m2 = col("s2") / col("n") - m1 * m1
          val m4 = col("s4") / col("n") - lit(4) * m1 * (col("s3") / col("n")) +
            lit(6) * m1 * m1 * (col("s2") / col("n")) -
            lit(3) * m1 * m1 * m1 * m1
          round(m4 / (m2 * m2) - lit(3), 9).as("kurt_qty")
        })
      .orderBy(col("l_returnflag"))
  }

  /** Calendar arithmetic: month bucketing with `last_day`,
    * `add_months` (end-of-month clamped, like the oracle's
    * `+ INTERVAL 1 MONTH`), ISO day-of-week of the month start
    * (`weekday` is Monday=0; +1 = ISO), and exact days-in-month via
    * date subtraction. All narrow per-row expressions after a single
    * month-grain aggregation. */
  def q168DateArith(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(date_trunc("month", col("o_orderdate")).cast("date")
        .as("month_start"))
      .groupBy(col("month_start"))
      .agg(count(lit(1)).as("n_orders"))
      .select(
        date_format(col("month_start"), "yyyy-MM-dd").as("month_start"),
        col("n_orders"),
        date_format(last_day(col("month_start")), "yyyy-MM-dd")
          .as("month_end"),
        date_format(add_months(col("month_start"), 1), "yyyy-MM-dd")
          .as("next_month_start"),
        (weekday(col("month_start")) + lit(1)).as("isodow_start"),
        datediff(add_months(col("month_start"), 1), col("month_start"))
          .as("days_in_month"))
      .orderBy(col("month_start"))

  /** Distribution-position window functions: `cume_dist` (fraction of
    * the segment at-or-below this balance) and `nth_value` over an
    * explicit full-partition frame (the segment's 3rd-poorest
    * customer, broadcast to every row). The (balance, key) composite
    * order makes both deterministic under ties. One shuffle on the
    * partition key, same as any window. */
  def q171WindowDist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val wFull = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        round(cume_dist().over(w), 9).as("cd"),
        nth_value(col("c_name"), 3).over(wFull).as("third_poorest"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  /** Exact quantile family: `median` / `percentile` (continuous,
    * `(n-1)·p` interpolation) and ANSI `percentile_disc` (smallest
    * value whose cume_dist ≥ p) over the same column, exposing the
    * cont-vs-disc contrast on even-sized groups. Exact percentiles
    * need the full value multiset per group; the mergeable-sketch
    * alternative for 100 TB is the q88 GK twin. Double cast + round
    * pin the interpolation arithmetic cross-engine. */
  def q174QuantileFamily(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("double").as("x"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(median(col("x")), 9).as("median_qty"),
        round(percentile(col("x"), lit(0.25)), 9).as("q25_cont"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY x)")
          .as("q25_disc"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY x)")
          .as("q75_disc"))
      .orderBy(col("l_returnflag"))

  /** Rollup with grouping metadata: `grouping_id()` (bitmask over the
    * grouping columns, listed-order most-significant-first — the same
    * convention as ANSI `GROUPING(a, b)`) and per-column `grouping()`
    * flags, which is how a reporting layer distinguishes a real NULL
    * key from a subtotal row. Same partial-aggregation shape as q13;
    * the ids are computed at the aggregate, costing nothing extra. */
  def q177GroupingId(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("int").as("gid"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_usd"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"),
        col("g_status"), col("g_priority"),
        col("n_orders"), col("total_usd"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  /** Equi-depth (equal-count) deciles via `ntile` — the histogram
    * q119's width_bucket cannot give when the distribution is skewed.
    * NOTE the scale shape honestly: a global ntile needs a total
    * order, which plans a SinglePartition sort — fine for reporting
    * grains, wrong for 100 TB of rows. At scale, derive the same
    * buckets from q85's distributed global index (range partition +
    * offsets) or from q48's percentile cut points; this query is the
    * window-function surface with a deterministic (price, key) total
    * order so ties cannot move rows between deciles. */
  def q188EquiDepthHist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        dsum(col("o_totalprice")).as("total"))
      .orderBy(col("decile"))
  }

  /** Multiset INTERSECT ALL — q63's EXCEPT ALL twin: per (flag,
    * status), occurrences common to both bags with multiplicity
    * min(n_high, n_low). Spark plans both bag operators as a
    * count-and-compare aggregation, not a join — one shuffle on the
    * compared columns, scale-safe. */
  def q189IntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val high = li.filter(col("l_quantity") > 25)
      .select(col("l_returnflag"), col("l_linestatus"))
    val low = li.filter(col("l_quantity") <= 25)
      .select(col("l_returnflag"), col("l_linestatus"))
    high.intersectAll(low)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_common"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** ANSI `FILTER (WHERE ...)` aggregate clause — the standard form of
    * q166's count_if/conditional-sum family. Each filtered aggregate
    * is still one partial-aggregable fold; the clause costs nothing at
    * scale and avoids the CASE-wrapping that breaks some optimizers'
    * null accounting. */
  def q190FilterClause(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
      SELECT o_orderstatus, COUNT(*) AS n_total,
        COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
          AS urgent_total,
        MIN(o_orderdate) FILTER (WHERE o_orderpriority = '1-URGENT')
          AS first_urgent
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")
  }

  /** Winsorization: clamp a value column at its exact 5th/95th
    * percentiles — the outlier treatment feature-prep applies before
    * scaling. The two cut points are one tiny `percentile_disc`
    * aggregate broadcast back over the data (cross join with a 1-row
    * frame); clamping is a narrow `least/greatest`. percentile_disc
    * picks ACTUAL data values, so the cut points are exact doubles and
    * the whole result is hash-stable. */
  def q192Winsorize(spark: SparkSession, dir: String): DataFrame = {
    val cuts = Tables.orders(spark, dir).agg(
      expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY o_totalprice)")
        .as("lo"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)")
        .as("hi"))
    Tables.orders(spark, dir).crossJoin(broadcast(cuts))
      .select(col("o_orderstatus"), col("o_totalprice"),
        least(greatest(col("o_totalprice"), col("lo")), col("hi"))
          .as("clamped"),
        col("lo"), col("hi"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        count_if(col("o_totalprice") < col("lo")).as("n_floor"),
        count_if(col("o_totalprice") > col("hi")).as("n_ceil"),
        dsum(col("o_totalprice")).as("raw_total"),
        dsum(col("clamped")).as("winsorized_total"))
      .orderBy(col("o_orderstatus"))
  }

  /** Correlated-subquery trio over the SQL surface: `EXISTS` (plans
    * as a left-semi join), `NOT EXISTS` (anti join), and the `NOT IN`
    * null trap — the probe set is unioned with a NULL, so three-valued
    * logic makes `NOT IN` unknowable for every row and the count is
    * provably 0. DataFrame-API twins of the join shapes are q5/q6;
    * this query proves the decorrelation path produces the same
    * distributed plan from declarative SQL. */
  def q175ExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql("""
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
      ORDER BY w.c_mktsegment""")
  }

  /** q292: market-basket association rules — the top-20 part pairs
    * co-purchased within an order, by lift, with support and
    * confidence (the A-priori/frequent-itemset report at the pair
    * level; reference-side this is the "what sells together" BI
    * query its DWH serves). Basket = the distinct parts of one
    * order; lift = P(a,b) / (P(a)·P(b)) over the order population,
    * reported above min-support 3 co-orders.
    *
    * Scale shape: pair generation is a self-equi-join on the order
    * key — both sides hash to the SAME orderkey exchange (reused, not
    * recomputed, via the staged basket frame), and fan-out per order
    * is (basket choose 2), bounded by TPC-H's ≤7 items/order. The
    * per-item marginals and the scalar order count broadcast back
    * onto the min-support-pruned pair table; the report ends in
    * TakeOrdered(20). Nothing is quadratic in parts or orders. */
  def q292MarketBasket(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint(eager = false) // feeds pairs (twice) + marginals
    val n = baskets.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    val item = baskets.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("c_item"))
    baskets.as("a")
      .join(baskets.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"),
        col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 3)
      .join(broadcast(item.select(col("l_partkey").as("part_a"),
        col("c_item").as("c_a"))), "part_a")
      .join(broadcast(item.select(col("l_partkey").as("part_b"),
        col("c_item").as("c_b"))), "part_b")
      .crossJoin(broadcast(n))
      .select(col("part_a"), col("part_b"), col("c_ab"),
        round(col("c_ab").cast("double") /
          col("n_orders").cast("double"), 9).as("support"),
        round(col("c_ab").cast("double") /
          col("c_a").cast("double"), 9).as("confidence"),
        round(col("c_ab").cast("double") * col("n_orders").cast("double")
          / (col("c_a").cast("double") * col("c_b").cast("double")), 9)
          .as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(20)
  }
}
