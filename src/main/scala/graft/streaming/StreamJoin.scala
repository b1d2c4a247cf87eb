package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join: purchases matched to the clicks they
  * follow within 10 minutes, per user. Both sides carry watermarks so
  * the join state is bounded — a click is held only until the purchase
  * watermark passes click_ts + 10 min, which is what lets the join run
  * forever on an unbounded stream. `Trigger.AvailableNow` drains the
  * bounded test input, making the result equal to the batch interval
  * join and therefore oracle-checkable.
  */
object StreamJoin {

  def q54StreamStreamJoin(spark: SparkSession, dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
    def src: DataFrame = StreamingWindows.eventsStream(spark, dir)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "30 minutes")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("buy_ts"),
        col("event_id").as("buy_id"))
      .withWatermark("buy_ts", "30 minutes")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
    val name = "graft_stream_join_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val query = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    val result = spark.table(name)
      .select(col("click_id"), col("buy_id"), col("user_id"),
        col("click_ts"), col("buy_ts"))
      .orderBy(col("click_id"), col("buy_id"))
    StreamingWindows.materializeAndDrop(spark, name, result)
    }

  /** Stream-stream LEFT OUTER interval join — q54's inner twin plus
    * the null-extended rows. Matches emit immediately; an unmatched
    * click emits with NULL purchase columns only once the watermark
    * proves no purchase can still arrive (passes click_ts + 10 min),
    * which is exactly how outer results stay correct on an unbounded
    * stream with bounded state. The final no-data micro-batch of the
    * AvailableNow drain advances the watermark to (min of both sides'
    * max ts) − 30 min and flushes the evictable state, so the oracle
    * can reconstruct the emitted set exactly: all interval matches,
    * plus non-matching clicks whose join window closed strictly before
    * that final watermark. */
  def q184StreamOuterJoin(spark: SparkSession, dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
    def src: DataFrame = StreamingWindows.eventsStream(spark, dir)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "30 minutes")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("buy_ts"),
        col("event_id").as("buy_id"))
      .withWatermark("buy_ts", "30 minutes")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
    val name = "graft_stream_outer_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val query = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    val result = spark.table(name)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("buy_id"), col("buy_ts"))
      .orderBy(col("click_id"), col("buy_id"))
    StreamingWindows.materializeAndDrop(spark, name, result)
    }

  /** Stream-static enrichment join: each micro-batch of the event
    * stream hash-joins against a BROADCAST static dimension — no
    * watermark, no join state, because the static side is complete by
    * definition. This is the canonical "decorate events with reference
    * data" shape (the reference's rating→meaning decode, done
    * streaming); the dimension is re-resolvable per batch, so a
    * slowly-refreshed dim table picks up changes without restarting
    * the query. Stateless join + stateful downstream agg drains to the
    * same result as the batch formulation. */
  def q139StreamStaticEnrich(spark: SparkSession, dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
      val dim = broadcast(graft.Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name")))
      val src = StreamingWindows.eventsStream(spark, dir)
      val enriched = src
        .join(dim, col("user_id") % 25 === col("n_nationkey"))
        .groupBy(col("n_name"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val name = "graft_stream_static_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val query = enriched.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
      val result = spark.table(name)
        .orderBy(col("n_name"), col("event_type"))
      StreamingWindows.materializeAndDrop(spark, name, result)
    }
}
