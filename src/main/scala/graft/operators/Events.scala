package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time operators over the `events` table (10k rows / 30 days at
  * sf0.01): tumbling and hopping window aggregation, gap-based
  * sessionization, and JSON property extraction — the batch halves of
  * the streaming surface (the streaming twins live in
  * `graft.streaming`; they share these semantics so DuckDB can oracle
  * both).
  *
  * Scale: every query shuffles once on (window/user, type) keys whose
  * cardinality grows with time span, not event volume — partial
  * aggregation keeps the exchanges small at 100 TB of events.
  * Aggregates over the double `value` column use min/max (order-
  * independent) rather than sums, so results are bitwise reproducible.
  */
object Events {

  /** Tumbling 5-minute windows per event type: count + value extremes.
    * `window()` is epoch-aligned, matching DuckDB's `time_bucket`. */
  def q36EventWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "5 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n_events"), col("min_value"), col("max_value"))
      .orderBy(col("win_start"), col("event_type"))

  /** Hopping windows (10-minute length, 5-minute slide): every event
    * lands in exactly two windows. */
  def q37EventHopping(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n_events"))
      .orderBy(col("win_start"), col("event_type"))

  /** Gap-based sessionization (30-minute inactivity gap) per user via
    * lag + running sum — the batch formulation of what
    * `streaming.StreamSessions` does with flatMapGroupsWithState.
    * One shuffle on user_id; sessions never cross users, so the window
    * work is partition-local. */
  def q38Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .cast("double") / 1000000.0).as("duration_sec"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** SCD-2 history build (CDC): each user's event stream becomes a
    * versioned history — valid_from = the event's ts, valid_to = the
    * next event's ts (null while current), is_current flags the open
    * row. One shuffle on user_id, one ordered pass per partition via
    * lead(); the standard warehouse pattern for turning a change
    * stream into point-in-time-queryable state. Complements q58
    * (latest-wins keeps only the current row; SCD-2 keeps them all). */
  def q71Scd2History(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("user_id") < 30)
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .select(col("user_id"), col("event_id"), col("ts").as("valid_from"),
        col("valid_to"), col("event_type"), col("value"),
        col("valid_to").isNull.cast("int").as("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  /** Point-in-time (effective-dated) join: each purchase looks up the
    * dimension VERSION valid at its event time — `valid_from <= ts <
    * valid_to` against the SCD-2 style status history derived from
    * the user's non-purchase events. This is the temporal-correctness
    * join a warehouse runs against versioned dimensions (q71 builds
    * such history; q51/q76 are the as-of cousins): an equi-join on
    * the user plus a range predicate the planner evaluates inside the
    * per-user join group, so work scales with versions-per-user, not
    * versions². Zero-width versions (same-timestamp updates) match
    * nothing, in both engines, by the half-open interval. */
  def q154PointInTime(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val dim = Tables.events(spark, dir)
      .filter(col("user_id") < 30 && col("event_type") =!= "purchase")
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .select(col("user_id").as("d_user"), col("ts").as("valid_from"),
        col("valid_to"), col("event_type").as("status"))
    val facts = Tables.events(spark, dir)
      .filter(col("user_id") < 30 && col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    facts.join(dim,
        col("user_id") === col("d_user") &&
          col("valid_from") <= col("ts") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_purchases"),
        graft.functions.Cols.dsum(col("value")).as("total_value"))
      .orderBy(col("status"))
  }

  /** Calendar feature extraction — the time features an ML pipeline
    * derives from an event timestamp (cyclical position, weekend flag,
    * business-hours flag), aggregated as a sanity profile. Day-of-week
    * is computed as modular date arithmetic from a fixed Monday epoch
    * rather than `dayofweek()` because weekday NUMBERING conventions
    * differ across engines (Spark: 1=Sunday; others 0=Sunday or
    * 1=Monday) — portable formulas beat locale/convention-dependent
    * builtins in any cross-engine pipeline. */
  def q155TimeFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), col("ts"),
        // days since Monday 2024-01-01, POSITIVE mod 7 → 0=Mon..6=Sun
        // (pmod, not %: signed % would put pre-epoch days in -6..0)
        pmod(datediff(col("ts").cast("date"),
          lit("2024-01-01").cast("date")), lit(7)).as("dow"),
        hour(col("ts")).as("hr"),
        quarter(col("ts")).as("qtr"))
      .withColumn("is_weekend", (col("dow") >= 5).cast("int"))
      .withColumn("is_business_hours",
        (col("hr") >= 9 && col("hr") < 17).cast("int"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("is_weekend").cast("long")).as("n_weekend"),
        sum(col("is_business_hours").cast("long")).as("n_bizhours"),
        min(col("hr")).as("min_hr"), max(col("hr")).as("max_hr"),
        min(col("qtr")).as("min_qtr"))
      .orderBy(col("event_type"), col("dow"))

  /** JSON property extraction from the `props` column: pull `$.k`,
    * aggregate per event type. Narrow JSON path evaluation inside
    * codegen — no UDF, no intermediate parse tree materialization. */
  def q40JsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        countDistinct(col("k")).as("distinct_k"))
      .orderBy(col("event_type"))

  /** Native gap-based sessions via `session_window` — the built-in
    * operator for what q38 derives manually (lag + cumulative flag +
    * two windows): one aggregate, sessions merged in the state/agg
    * layer, no window-function passes. Session identity here is
    * (user, session_start), matching q38's min(ts) per session. The
    * same call works in Structured Streaming with a watermark. */
  def q108SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  /** Exponential moving average per user — an inherently SEQUENTIAL
    * per-key fold (each step depends on the previous), which no
    * built-in aggregate expresses: the typed `mapGroups` escape hatch,
    * used the way the guidelines reserve it for genuine imperative
    * per-group logic. One shuffle on user_id; each group is buffered
    * and sorted in memory, which is exactly the per-user event volume
    * a feature pipeline assumes bounded (else: window chunking).
    * Rounded for cross-engine float-fold comparability. */
  def q112Ema(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // both weights as literals: 1-alpha computed at runtime would
    // differ from the oracle's literal 0.9 in the last bit
    val alpha = 0.1; val beta = 0.9
    Tables.events(spark, dir)
      // unix_micros, NOT cast("long"): timestamp→long casts to epoch
      // SECONDS and would fold same-second events in the wrong order
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (user, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
        var ema = sorted.head._4
        sorted.tail.foreach(r => ema = alpha * r._4 + beta * ema)
        (user, sorted.length.toLong, ema)
      }
      .toDF("user_id", "n_events", "ema_value")
      .withColumn("ema_value", round(col("ema_value"), 9))
      .orderBy(col("user_id"))
  }

  /** Map higher-order functions over the parsed props map:
    * transform_values rescales, map_filter thresholds, map_keys /
    * element_at read back — the MapType algebra staying entirely
    * inside codegen (no explode needed when per-entry rows aren't). */
  def q124MapHofs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)).as("m"))
      .select(col("event_type"),
        element_at(transform_values(col("m"), (_, v) => v * 2), "k")
          .as("k2"),
        size(map_filter(col("m"), (_, v) => v >= 50)).as("n_ge50"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("k2")).as("min_k2"), max(col("k2")).as("max_k2"),
        sum(col("n_ge50")).as("n_heavy"))
      .orderBy(col("event_type"))

  /** Malformed-JSON quarantine — the ingest posture for semi-
    * structured feeds, mirroring the PERMISSIVE CSV path (O3): one
    * bad record among billions must not kill the job OR silently
    * vanish. A deterministic corruption (every event_id % 10 == 3
    * gets a brace prepended) models the feed damage. Validity is
    * SCHEMA-FREE by construction: `try_parse_json` (VARIANT) fails
    * exactly when the input is not JSON — same contract as the
    * oracle's `json_valid` — where the earlier `from_json(MapType)`
    * draft also nulled out well-formed JSON whose values didn't fit
    * the map type, an engine-specific split the oracle only agreed
    * with by luck of the synthetic data. NULL input is quarantined
    * explicitly on BOTH sides (DuckDB's `json_valid(NULL)` is NULL,
    * which a bare NOT would silently count as valid). The k-sum over
    * the parsed rows proves the good data still flows. */
  def q208JsonQuarantine(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("raw",
        when(col("event_id") % 10 === 3, concat(lit("{"), col("props")))
          .otherwise(col("props")))
      .withColumn("v", try_parse_json(col("raw")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("raw").isNull || col("v").isNull, 1L).otherwise(0L))
          .as("n_quarantined"),
        sum(when(col("v").isNotNull,
          coalesce(try_variant_get(col("v"), "$.k", "long"), lit(0L)))
          .otherwise(0L)).as("k_sum"))
      .orderBy(col("event_type"))

  /** Funnel analysis — ordered-step conversion (signup → click →
    * purchase): each later step counts only events AFTER the user's
    * previous-step time. Three small per-user aggregates chained by
    * joins; at scale each join is user-keyed (same partitioning
    * reused) and the funnel table is tiny next to the event stream. */
  def q117Funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val s = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val c = e.filter(col("event_type") === "click")
      .join(s, "user_id").filter(col("ts") >= col("s_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("c_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    def step(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(name).as("step"), col("n_users"))
    step("1_signup", s).unionByName(step("2_click_after", c))
      .unionByName(step("3_purchase_after", p))
      .orderBy(col("step"))
  }

  /** Cohort retention: users grouped by first-activity week, counted
    * in each later activity week (the product-analytics retention
    * triangle). Two user-keyed aggregates; the output is cohort ×
    * offset — tiny regardless of event volume. */
  def q118Retention(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(spark, dir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val firstWk = weekly.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_week"))
    weekly.join(firstWk, "user_id")
      .select(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7)
          .cast("int").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      // weekly is distinct per (user, week): count(*) counts users
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Value histogram via width_bucket: 20 equal bins over [0, 500),
    * under/overflow in buckets 0 and 21 — the one-pass distribution
    * profile (numeric twin of the string crosstab q104). */
  def q119Histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(width_bucket(col("value"), lit(0.0), lit(500.0), lit(20))
        .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** MapType surface: parse `props` into a map<string,int> with
    * `from_json`, explode it to (key, value) pairs, and aggregate per
    * (event_type, key). Exercises map construction, map_keys/size
    * predicates, and map explosion — all codegen-friendly narrow ops;
    * the only shuffle is the final low-cardinality aggregation. */
  def q86MapProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)).as("m"))
      .filter(size(map_keys(col("m"))) > 0)
      .select(col("event_type"), explode(col("m")).as(Seq("key", "value")))
      .groupBy(col("event_type"), col("key"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"),
        countDistinct(col("value")).as("distinct_v"))
      .orderBy(col("event_type"), col("key"))

  /** Schema inference for semi-structured ingest: `schema_of_json` on
    * a sampled record derives the DDL, which then drives the typed
    * `from_json` extraction of the whole column — how an ingest layer
    * bootstraps typing for an unknown JSON feed without a full
    * inference scan. The one-row sample is a deliberate driver-side
    * step (schema decisions ARE driver decisions); the inferred DDL is
    * carried into the output so the oracle pins it exactly. */
  def q148JsonInfer(spark: SparkSession, dir: String): DataFrame = {
    val sample = Tables.events(spark, dir)
      .orderBy(col("event_id")).select(col("props")).limit(1)
      .collect()(0).getString(0)
    val ddl = spark.range(1)
      .select(schema_of_json(lit(sample)).as("s"))
      .collect()(0).getString(0)
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), ddl, Map.empty[String, String]).as("p"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("p.k").cast("long")).as("sum_k"))
      .withColumn("inferred_schema", lit(ddl))
      .orderBy(col("event_type"))
  }

  /** String-formatting toolkit over the event-type dimension:
    * `format_string` (printf), `overlay` (in-place byte splice),
    * `lpad`, `translate`, `reverse`. Grouping FIRST keeps the
    * formatting expressions on the tiny aggregated result, not the
    * raw event stream — the cheap way to build label/tag columns at
    * any scale. */
  def q170StringToolkit(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_events"),
        format_string("%s:%06d", col("event_type"), col("n_events"))
          .as("tag"),
        overlay(col("event_type"), lit("XX"), lit(2)).as("spliced"),
        lpad(upper(col("event_type")), 10, "*").as("padded"),
        translate(col("event_type"), "aeiou", "AEIOU").as("devoweled"),
        reverse(col("event_type")).as("reversed"))
      .orderBy(col("event_type"))

  /** q272: autocorrelation function of the hourly event-count series
    * at lags 1..24 — the seasonality detector a monitoring pipeline
    * runs before choosing alert windows (a daily cycle shows as a
    * spike at lag 24). The series is gap-filled to a dense hourly grid
    * (a silent empty hour is signal, not a missing row).
    *
    * Exactness: the classic ACF needs (x_t − x̄)(x_{t+h} − x̄) sums —
    * float-ordering poison. Scaling by n turns every centered term
    * into the INTEGER n·x_t − Σx, so numerator and denominator are
    * exact integer sums and the only float op is the final division
    * (n·10⁵ hourly counts stay far inside long range at any corpus
    * this side of 10¹⁸ events; beyond that the products move to
    * DECIMAL(38,0), same shape).
    *
    * Scale shape: ONE corpus aggregate to (hour, count) — everything
    * after (grid, centering, 24 lag self-joins) runs on the
    * hours-sized series, metadata at any corpus size. */
  def q272Acf(spark: SparkSession, dir: String): DataFrame = {
    // floor(), not double-divide-and-cast: cast truncates toward zero
    // while the oracle's `//` floors — they diverge on pre-1970
    // (negative-epoch) timestamps, and the bucket rule must not depend
    // on the fixture containing none
    val hourly = Tables.events(spark, dir)
      .select(floor(unix_timestamp(date_trunc("hour", col("ts")))
          / 3600.0d)
        .cast("long").as("hr"))
      .groupBy(col("hr")).agg(count(lit(1)).as("x"))
    val bounds = hourly.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
    val series = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("hr"))
      .join(hourly, Seq("hr"), "left")
      .select(col("hr"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint(eager = false)
    val tot = series.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val cent = series.crossJoin(broadcast(tot))
      .select(col("hr"), (col("n") * col("x") - col("s")).as("c"))
      .localCheckpoint(eager = false)
    val den = cent.agg(sum(col("c") * col("c")).as("den"))
    val lags = spark.range(1L, 25L).select(col("id").cast("int").as("lag"))
    val shifted = cent.select(col("hr").as("hr2"), col("c").as("c2"))
    cent.crossJoin(broadcast(lags))
      .join(shifted, col("hr2") === col("hr") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("c") * col("c2")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        round(col("num").cast("double") / col("den").cast("double"), 9)
          .as("acf"))
      .orderBy(col("lag"))
  }

  /** q273: CUSUM changepoint detection over the daily count series
    * per event type — where did the level shift? S_t = Σ_{i≤t}(x_i −
    * x̄) peaks (in absolute value) at the most likely single
    * changepoint; the report carries the peak day, the CUSUM value
    * there, and the pre/post segment means a reviewer compares.
    *
    * Same integer-scaling discipline as q272: S'_t = n·cum_t − t·Σx
    * is exact, the argmax over |S'_t| (earliest day on ties) is an
    * integer decision, and only the three reported means/CUSUM divide
    * at the end. The cumulative window runs per event type over the
    * DAILY aggregate — days-sized, never corpus rows (the q225
    * discipline: unpartitioned-ish windows only above aggregates). */
  def q273Cusum(spark: SparkSession, dir: String): DataFrame =
    cusumFrom(Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("x")))

  /** q273's statistic over a prepared (event_type, day, x) daily
    * aggregate — split out so the streaming twin (q277) can feed the
    * SAME finishing math from a streamed aggregate. */
  private[graft] def cusumFrom(daily: DataFrame): DataFrame = {
    val tot = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily.join(broadcast(tot), Seq("event_type"))
      .withColumn("t", count(lit(1)).over(wCum))
      .withColumn("cum", sum(col("x")).over(wCum))
      .withColumn("ss", col("n") * col("cum") - col("t") * col("s"))
    scored
      .groupBy(col("event_type"))
      .agg(max(struct(abs(col("ss")).as("a"), (-col("t")).as("nt"),
        col("day").as("day"), col("cum").as("cum"), col("ss").as("ss"),
        col("n").as("n"), col("s").as("s"))).as("b"))
      .select(col("event_type"),
        col("b.n").as("n_days"),
        // string-rendered: a DATE column round-trips through pandas as
        // a midnight timestamp and breaks the canonical compare
        col("b.day").cast("string").as("cp_day"),
        round(col("b.ss").cast("double") / col("b.n").cast("double"), 9)
          .as("cusum"),
        round(col("b.cum").cast("double") /
          (-col("b.nt")).cast("double"), 9).as("pre_mean"),
        when(col("b.n") + col("b.nt") > 0L,
          round((col("b.s") - col("b.cum")).cast("double") /
            (col("b.n") + col("b.nt")).cast("double"), 9))
          .as("post_mean"))
      .orderBy(col("event_type"))
  }

  /** q277: the ONLINE twin of q273 — a streaming level-shift monitor.
    * The stream maintains the per-(event_type, day) count aggregate
    * (complete mode, AvailableNow drain here; an unbounded feed keeps
    * the same aggregate under a watermark); the CUSUM statistic then
    * runs over the streamed aggregate — a days×types-sized frame, so
    * the monitor recomputes an EXACT changepoint on every trigger
    * without touching raw history. That split (stream owns the
    * aggregate, monitor owns the statistic) is the production
    * architecture for drift alarms: state is bounded by the calendar,
    * not the event volume.
    *
    * Correctness is pinned by stream–batch equivalence: the memory-
    * sink aggregate feeds the SAME `cusumFrom` finishing math as
    * q273, and the oracle is q273's SQL verbatim. */
  def q277StreamCusum(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingWindows.withStreamPartitions(spark) {
      val daily = graft.streaming.StreamingWindows.eventsStream(spark, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("x"))
      val name = "graft_stream_cusum_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val query = daily.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      // materialize the days×types aggregate before the statistic:
      // cusumFrom self-joins its input, and a memory-sink view cannot
      // be self-joined (conflicting attribute references); a monitor
      // would hold this state locally per trigger anyway
      val snap = graft.streaming.StreamingWindows.materializeAndDrop(
        spark, name, spark.table(name))
      cusumFrom(snap)
    }

  /** q278: Theil–Sen robust trend per event type — the median of all
    * pairwise day-slopes, the trend estimator that shrugs off the
    * outlier days a least-squares fit (q93/q191) chases. Intercept is
    * the median of per-day residual intercepts under the chosen
    * slope, the standard completion.
    *
    * Scale shape: the corpus reduces to the (type, day) aggregate
    * first; the "all pairs" are day-pairs of that CALENDAR-bounded
    * series (30 days → 435 pairs per type), never event pairs, and
    * the per-type exact percentile sorts a pairs-sized group. Slopes
    * are exact integer differences divided once and rounded to 9, so
    * the medians are engine-portable. */
  def q278TheilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), unix_date(to_date(col("ts"))).as("d"))
      .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("x"))
      .localCheckpoint(eager = false)
    val slopes = daily.select(col("event_type"), col("d").as("d1"),
        col("x").as("x1"))
      .join(daily.select(col("event_type"), col("d").as("d2"),
        col("x").as("x2")), Seq("event_type"))
      .filter(col("d2") > col("d1"))
      .select(col("event_type"),
        round((col("x2") - col("x1")).cast("double") /
          (col("d2") - col("d1")).cast("double"), 9).as("slope"))
    val med = slopes.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5d)"), 9).as("slope_med"))
    daily.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("n_pairs"), col("slope_med"),
        round(col("x").cast("double") -
          col("slope_med") * col("d").cast("double"), 9).as("b0"))
      .groupBy(col("event_type"), col("n_pairs"), col("slope_med"))
      .agg(count(lit(1)).as("n_days"),
        round(expr("percentile(b0, 0.5d)"), 9).as("intercept"))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("slope_med").as("slope"), col("intercept"))
      .orderBy(col("event_type"))
  }

  /** q283: time-window funnel — q117's ordered steps with the bound
    * real funnels have: each step must land within 24 HOURS of the
    * previous one (ClickHouse's windowFunnel semantics, greedy from
    * the user's earliest signup). The unbounded q117 counts a
    * purchase weeks later as a conversion; this one doesn't, and the
    * per-step drop between the two queries measures exactly the
    * time-dispersion of the funnel.
    *
    * Scale shape: identical to q117 — three user-keyed min-aggregates
    * chained by broadcast-sized step frames; the added window bound
    * is a filter on the same join, no new shuffle. The completers'
    * signup→purchase latency is summarized with an exact per-group
    * percentile over the completers frame (user-bounded). */
  def q283WindowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val lim = 24L * 3600L
    val s = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val c = e.filter(col("event_type") === "click")
      .join(s, "user_id")
      .filter(col("ts") >= col("s_ts") &&
        unix_timestamp(col("ts")) <= unix_timestamp(col("s_ts")) + lim)
      .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"),
        min(col("s_ts")).as("s_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") >= col("c_ts") &&
        unix_timestamp(col("ts")) <= unix_timestamp(col("c_ts")) + lim)
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"),
        min(col("s_ts")).as("s_ts"))
    // per step: reached-user count + median hours from signup to the
    // step's own event (0 for the signup step itself)
    def step(name: String, df: DataFrame, stepTs: String) =
      df.agg(count(lit(1)).as("n_users"),
        round(expr(
          s"percentile(CAST(unix_timestamp($stepTs) - " +
            "unix_timestamp(s_ts) AS DOUBLE) / 3600.0D, 0.5D)"), 9)
          .as("median_hours_from_signup"))
        .select(lit(name).as("step"), col("n_users"),
          col("median_hours_from_signup"))
    step("1_signup", s, "s_ts")
      .unionByName(step("2_click_24h", c, "c_ts"))
      .unionByName(step("3_purchase_24h", p, "p_ts"))
      .orderBy(col("step"))
  }

  /** q284: conversion attribution — for every user's FIRST purchase,
    * credit the first-touch and last-touch non-purchase event
    * preceding it (ties broken by event_id, so credit assignment is
    * deterministic). The two models book the same conversions to
    * different channels; the per-channel report is the side-by-side a
    * marketing-analytics stack publishes.
    *
    * Scale shape: one user-keyed min-aggregate (first purchase),
    * joined back on the SAME user key (no broadcast hint — the
    * converter frame is one row per converting user, unbounded at
    * corpus scale; AQE may still broadcast it when it measures
    * small), then ONE pass over pre-purchase events with two
    * argmin/argmax struct-aggregates per user — no window over raw
    * events, no second scan — and a channels-sized double aggregate. */
  def q284Attribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val conv = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("conv_ts"))
    val touches = e.filter(col("event_type") =!= "purchase")
      .join(conv, "user_id")
      .filter(col("ts") < col("conv_ts"))
      .groupBy(col("user_id"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("event_type")))
          .as("first"),
        max(struct(col("ts"), col("event_id"), col("event_type")))
          .as("last"))
    val first = touches.groupBy(col("first.event_type").as("channel"))
      .agg(count(lit(1)).as("n_first_touch"))
    val last = touches.groupBy(col("last.event_type").as("channel"))
      .agg(count(lit(1)).as("n_last_touch"))
    first.join(last, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("n_first_touch"), lit(0L)).as("n_first_touch"),
        coalesce(col("n_last_touch"), lit(0L)).as("n_last_touch"))
      .orderBy(col("channel"))
  }

  /** q285: weekly seasonality profile — the (day-of-week × hour) grid
    * of event counts with the expected count under the independence
    * model (row total × column total / grand total) and the Pearson
    * residual (n − e)/√e that flags which cells actually carry the
    * weekly rhythm. Day-of-week comes from epoch-day arithmetic
    * ((d+4) mod 7, 0 = Sunday) — the q155 discipline: no
    * locale-dependent `dayofweek` so the oracle is engine-portable.
    *
    * Scale shape: ONE corpus aggregate to the 168-cell grid; margins
    * and residuals are grid-side arithmetic. Counts stay integers;
    * expected/residual round at 9. */
  def q285SeasonalityProfile(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .select(
        pmod(unix_date(to_date(col("ts"))) + 4, lit(7)).cast("int")
          .as("dow"),
        hour(col("ts")).cast("int").as("hr"))
      .groupBy(col("dow"), col("hr")).agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val rowTot = cells.groupBy(col("dow")).agg(sum(col("n")).as("row_n"))
    val colTot = cells.groupBy(col("hr")).agg(sum(col("n")).as("col_n"))
    val grand = cells.agg(sum(col("n")).as("grand"))
    cells.join(broadcast(rowTot), "dow")
      .join(broadcast(colTot), "hr")
      .crossJoin(broadcast(grand))
      .withColumn("expected",
        round((col("row_n") * col("col_n")).cast("double") /
          col("grand").cast("double"), 9))
      .select(col("dow"), col("hr"), col("n"), col("expected"),
        round((col("n").cast("double") - col("expected")) /
          sqrt(col("expected")), 9).as("pearson_resid"))
      .orderBy(col("dow"), col("hr"))
  }

  /** q286: first-order Markov transition matrix over each user's
    * event stream — P(next | current) with per-state transition
    * entropy, the sequential-behavior profile behind next-event
    * prediction and anomaly scoring (a transition with near-zero
    * probability IS the anomaly).
    *
    * Scale shape: one user-keyed window pass builds the (cur, next)
    * pairs — per-user ordered scan, the q71 SCD-2 shape — then one
    * aggregate to the |types|² matrix; probabilities and entropy are
    * matrix-side arithmetic on a 25-row frame. Entropy terms round at
    * 9 and decimal-sum so the report is engine-portable. */
  def q286TransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur"))
      .withColumn("nxt", lead(col("cur"), 1).over(byUser))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    val rowTot = pairs.groupBy(col("cur"))
      .agg(sum(col("n")).as("row_n"))
    val withP = pairs.join(broadcast(rowTot), "cur")
      .withColumn("p",
        round(col("n").cast("double") / col("row_n").cast("double"), 9))
    val ent = withP
      .groupBy(col("cur"))
      .agg(round(sum(round(-col("p") * log(col("p")), 9)
        .cast("decimal(28,9)")).cast("double"), 9).as("row_entropy"))
    withP.join(broadcast(ent), "cur")
      .select(col("cur"), col("nxt"), col("n"), col("p"),
        col("row_entropy"))
      .orderBy(col("cur"), col("nxt"))
  }

  /** q287: Kaplan–Meier survival of user lifetimes — the churn curve.
    * Lifetime = days between a user's first and last event; a user
    * whose last event falls within 3 days INCLUSIVE of the last corpus
    * day (d1 ∈ {dmax−3..dmax}, a 4-day window — the predicate is
    * `d1 < dmax − 3`) is
    * CENSORED (still alive when observation stopped) and leaves the
    * risk set without counting as a death — the estimator exists
    * precisely because dropping censored users (naive mean lifetime)
    * biases churn down. S(t) = Π_{u≤t} (1 − d_u/n_u) over death
    * times, computed as exp of the running decimal sum of 9-rounded
    * log factors — a cumulative PRODUCT done order-independently.
    *
    * Scale shape: one user-keyed aggregate (first/last event) — the
    * only corpus pass — then the whole estimator runs on the
    * distinct-lifetime table (≤ observation-window days, calendar-
    * bounded); the risk-set counts come from one descending cumsum
    * window over that tiny frame. */
  def q287KaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(unix_date(to_date(min(col("ts")))).as("d0"),
        unix_date(to_date(max(col("ts")))).as("d1"))
    val horizon = users.agg(max(col("d1")).as("dmax"))
    val lives = users.crossJoin(broadcast(horizon))
      .select((col("d1") - col("d0")).cast("long").as("t"),
        (col("d1") < col("dmax") - 3L).cast("long").as("death"))
    val byT = lives.groupBy(col("t"))
      .agg(count(lit(1)).as("n_leaving"), sum(col("death")).as("d"))
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_at_risk", sum(col("n_leaving")).over(wRisk))
      .withColumn("lnf",
        when(col("d") > 0, round(log(lit(1.0d) -
          col("d").cast("double") / col("n_at_risk").cast("double")), 9))
          .otherwise(lit(0.0d)))
      .withColumn("survival",
        round(exp(sum(col("lnf").cast("decimal(28,9)")).over(wCum)
          .cast("double")), 9))
      .select(col("t").as("t_days"), col("n_at_risk"),
        col("d").as("n_deaths"),
        (col("n_leaving") - col("d")).as("n_censored"),
        col("survival"))
      .orderBy(col("t_days"))
  }

  /** q288: top session paths — the first three event types of every
    * session (30-minute gap rule, q38's definition inline) joined
    * into a path string, counted, top 10. The entry-path inventory a
    * product team reads next to the funnel (q117/q283): funnels ask
    * "did they reach X", paths ask "what do they actually do first".
    *
    * Scale shape: the session id is the q38 gap cumsum (one user-
    * keyed window pass); the path digest aggregates per session with
    * min(struct)-style smallest-3 selection via a ranked filter — no
    * collect_list of whole sessions, only ranks ≤ 3 survive the
    * aggregate; the path table is sessions-sized and the final
    * TakeOrdered(10) is driver-trivial. */
  def q288TopPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    val sessioned = Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bySession = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    val paths = sessioned
      .withColumn("rn", row_number().over(bySession))
      .filter(col("rn") <= 3)
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          s => s.getField("event_type")), ">").as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(10)
  }

  /** q293: bot/automation profile — traffic-quality triage by
    * inter-event-gap REGULARITY. Humans are bursty; schedulers are
    * metronomes. Per user with ≥ 5 events: the exact median gap and
    * the p90−p10 spread; behavior = 'burst' (median gap 0 —
    * replay/batch injection), 'regular' (spread/median < 0.5 —
    * machine-like cadence), else 'organic'. Reported as the
    * 3-bucket inventory a data-quality owner reads before deciding
    * which traffic feeds training. The spread/median ratio rounds at
    * 9 BEFORE the threshold compare so classification is
    * engine-portable at the boundary.
    *
    * Scale shape: one user-keyed window pass (the q38 sessionize
    * exchange) computes gaps, one per-user aggregate (exact
    * percentiles over each user's own gaps — user-bounded, never
    * corpus-wide), and the report is a 3-row aggregate. */
  def q293BotProfile(spark: SparkSession, dir: String): DataFrame =
    botProfileFrom(Tables.events(spark, dir))

  /** q293's core over any (user_id, ts, event_id) frame — split out so
    * the spec can pin all three behavior branches on a constructed
    * fixture (the driver's corpus is uniformly organic, which
    * exercises only one). */
  private[graft] def botProfileFrom(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap",
        (unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(byUser))).cast("double")
          / 1000000.0d)
      .filter(col("gap").isNotNull)
    val stats = gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap, 0.5d)").as("med"),
        (expr("percentile(gap, 0.9d)") - expr("percentile(gap, 0.1d)"))
          .as("spread"))
      .filter(col("n_gaps") >= 4)
    stats
      .select((col("n_gaps") + 1L).as("n_events"), col("med"),
        when(col("med") <= 0.0d, "burst")
          .when(round(col("spread") / col("med"), 9) < 0.5d, "regular")
          .otherwise("organic").as("behavior"))
      .groupBy(col("behavior"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("n_events"),
        round(expr("percentile(med, 0.5d)"), 9)
          .as("median_of_median_gap_s"))
      .orderBy(col("behavior"))
  }
}
