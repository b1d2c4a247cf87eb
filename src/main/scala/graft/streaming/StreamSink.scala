package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** foreachBatch egress — the production sink pattern: each micro-batch
  * is handed to the full BATCH writer, so streaming output gets
  * everything the batch side has (partitioned parquet, bucketing,
  * catalog tables, JDBC) without a dedicated streaming connector.
  * The checkpoint + batchId give exactly-once: a replayed batch
  * overwrites its own output deterministically.
  */
object StreamSink {

  /** Run the 5-minute tumbling-count stream and land the final state
    * as parquet under `outDir/data` via foreachBatch. Returns after
    * the AvailableNow drain completes. */
  def windowCountsToParquet(spark: SparkSession, dir: String,
      outDir: String): Unit = {
    val agg = StreamingWindows.eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n_events"))
    val writeBatch: (DataFrame, Long) => Unit = (batch, _) =>
      batch.write.mode("overwrite").parquet(s"$outDir/data")
    val query = agg.writeStream
      .outputMode("complete")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch(writeBatch)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** Catalog query: the foreachBatch egress verified by read-back —
    * stream → window counts → batch parquet writer → read the landed
    * files and hash-compare against the batch oracle. The zone is
    * recreated per run (fresh checkpoint) so the drain always
    * reprocesses the current input instead of replaying an old
    * checkpoint against changed data. */
  def q83StreamSinkRoundtrip(spark: SparkSession, dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
      val out = graft.Scratch.dir("q83_stream_sink")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      windowCountsToParquet(spark, dir, out)
      spark.read.parquet(s"$out/data")
        .orderBy("win_start", "event_type")
    }
}
