package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Checkpointed restart — the property streaming state exists FOR,
  * pushed through the driver's ORACLE gate rather than only a spec:
  * the windowed aggregation is run as two query incarnations over one
  * checkpoint, and the final sink contents must hash-match the batch
  * SQL answer a single uninterrupted run would produce. Source
  * offsets, the watermark, and open-window state all have to survive
  * the restart for the numbers to come out right.
  */
object StreamRecovery {

  /** Append-mode tumbling counts across a kill/restart boundary.
    *
    * Incarnation 1 streams the EARLY half of the events (split at the
    * midpoint of event time), checkpoints, and terminates — windows
    * whose end passed the watermark are emitted to the parquet sink;
    * the window spanning the split stays OPEN in the state store.
    * Incarnation 2 starts from the same checkpoint, streams the late
    * half, and drains. The spanning window's final count mixes
    * pre-restart and post-restart events, so a lost state store, a
    * re-read file, or a double emission each breaks the oracle hash.
    *
    * Halves replay in event-time order — the discipline append mode
    * imposes on any backfill (late files behind the recovered
    * watermark would be dropped; see q136's scaladoc). The emitted set
    * is exactly the single-run q136 set: recovery must be invisible
    * in the result. */
  def q197StreamRecovery(spark: SparkSession, dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
      val root = graft.Scratch.dir("q197_recovery")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val zone = s"$root/in"; val sink = s"$root/out"; val ck = s"$root/ck"
      val events = graft.Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val mm = events
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .head()
      val splitUs = (mm.getLong(0) + mm.getLong(1)) / 2
      def runIncarnation(): Unit = {
        val q = spark.readStream.schema(events.schema).parquet(zone)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "5 minutes").as("win"),
            col("event_type"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("win.start").as("win_start"), col("event_type"),
            col("n_events"))
          .writeStream.format("parquet").option("path", sink)
          .option("checkpointLocation", ck)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      events.filter(unix_micros(col("ts")) < splitUs)
        .coalesce(1).write.mode("append").parquet(zone)
      runIncarnation()
      events.filter(unix_micros(col("ts")) >= splitUs)
        .coalesce(1).write.mode("append").parquet(zone)
      runIncarnation() // second incarnation: same checkpoint, new files
      spark.read.parquet(sink)
        .orderBy(col("win_start"), col("event_type"))
    }
}
