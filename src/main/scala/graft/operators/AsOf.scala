package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators Spark lacks as built-ins, composed from
  * existing operators per the preference order (compose > custom plan):
  *
  *  - **as-of join**: for every left row, the latest right row with
  *    `right.ts <= left.ts` per key. Implemented as union + sorted
  *    carry-forward window — ONE shuffle on the key, each partition
  *    processed in a single ordered pass. The naive alternative (theta
  *    join on `r.ts <= l.ts` + max) is quadratic per key; this is
  *    linear, the formulation that survives billions of events per key
  *    at 100 TB.
  *
  *  - **range join**: joining on an interval predicate alone gives a
  *    nested-loop plan. Banding rewrites it as an equi-join on a
  *    computed bucket key (+ residual filter): each row joins only its
  *    band's rows, restoring hash-join scalability.
  */
object AsOf {

  /** Generic as-of join: left (key, ts, ...) gains `rightTs` = the
    * greatest right timestamp <= left.ts for the same key (null when
    * none). Ties (equal ts) resolve to the right row — standard ASOF
    * `>=` semantics. `tsRight` names the right DataFrame's timestamp
    * column (defaults to the left's `ts` name). The output column
    * `rightTs` and the internal marker must not already exist on the
    * left — guarded here rather than silently overwritten. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightTs: String = "asof_ts",
      tsRight: String = null): DataFrame = {
    val rTs = Option(tsRight).getOrElse(ts)
    require(!left.columns.contains(rightTs),
      s"asofJoin: left already has a column named '$rightTs'; pass a " +
        "different rightTs output name")
    require(!left.columns.contains("__is_right"),
      "asofJoin: left must not contain the reserved column '__is_right'")
    val l = left.withColumn(rightTs, lit(null).cast("timestamp"))
      .withColumn("__is_right", lit(0))
    // align right to the left schema: null out every non-key column
    val rAligned = right.select(col(key), col(rTs).as(ts))
      .withColumn(rightTs, col(ts))
      .withColumn("__is_right", lit(1))
    val combined = l.unionByName(
      rAligned.select(l.columns.map {
        case c if c == key || c == ts || c == rightTs || c == "__is_right" =>
          col(c)
        case c => lit(null).cast(l.schema(c).dataType).as(c)
      }: _*),
      allowMissingColumns = false)
    // right rows sort BEFORE left rows at equal ts so `>=` ties take
    // the right value; carry the latest right ts forward per key
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      .withColumn(rightTs, last(col(rightTs), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .drop("__is_right")
  }

  /** As-of join on testdata: every event gains the ts of the user's
    * most recent signup event at-or-before it, then aggregates per
    * event type: how many events happened with/without a prior signup
    * and the max lag. Oracle: DuckDB's native ASOF JOIN. */
  def q51AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val signups = Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"))
    asofJoin(events, signups, key = "user_id", ts = "ts")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("asof_ts")).as("n_with_signup"),
        max(unix_micros(col("ts")) - unix_micros(col("asof_ts")))
          .as("max_lag_us"))
      .orderBy(col("event_type"))
  }

  /** Range join via banding: classify events into value bands defined
    * by a bands table (lo <= value < hi). The band width (100) matches
    * the table's interval, so every interval maps to exactly one band
    * key and the join is a pure equi-join on the computed key — no
    * nested loop, no cartesian. */
  def q52RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // deterministic bands table: [0,100), [100,200), ... [400,500)
    val bands = (0 until 5)
      .map(i => (s"band_$i", i * 100.0, (i + 1) * 100.0))
      .toDF("band", "lo", "hi")
      .withColumn("bucket", (col("lo") / 100).cast("int"))
    Tables.events(spark, dir)
      .withColumn("bucket", floor(col("value") / 100).cast("int"))
      .join(broadcast(bands), Seq("bucket"))
      .filter(col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("band"))
  }

  /** Interval-OVERLAP join (q52 joins points to intervals; this joins
    * intervals to intervals): per user, every (click-window,
    * view-window) pair of 10-minute activity intervals that overlap.
    * The naive formulation is a per-user theta join — quadratic per
    * key. Banding restores hash-join scalability: each interval
    * explodes to the ≤2 10-minute bands it touches, the join is an
    * equi-join on (user, band), the true overlap predicate runs as a
    * residual filter, and `distinct` removes pairs that met in two
    * bands. Work is bounded by band population, not n² — the
    * formulation that survives dense activity at 100 TB. */
  def q185IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def intervals(t: String, id: String, s: String, e: String) =
      ev.filter(col("event_type") === t)
        .select(col("user_id"), col("event_id").as(id),
          col("ts").as(s),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as(e))
    def banded(df: DataFrame, s: String, e: String) =
      df.withColumn("band", explode(expr(
        s"sequence(unix_timestamp($s) div 600, unix_timestamp($e) div 600)")))
    val clicks = banded(intervals("click", "click_id", "c_start", "c_end"),
      "c_start", "c_end")
    val views = banded(intervals("view", "view_id", "v_start", "v_end"),
      "v_start", "v_end")
      .withColumnRenamed("user_id", "v_user_id")
      .withColumnRenamed("band", "v_band")
    clicks.join(views,
        col("user_id") === col("v_user_id") && col("band") === col("v_band"))
      .filter(col("c_start") <= col("v_end") &&
        col("v_start") <= col("c_end"))
      .select(col("user_id"), col("click_id"), col("view_id"))
      .distinct()
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_overlaps"),
        min(col("click_id")).as("min_click"),
        max(col("view_id")).as("max_view"))
      .orderBy(col("user_id"))
  }
}
