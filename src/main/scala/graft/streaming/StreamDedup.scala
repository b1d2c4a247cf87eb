package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.functions.Cols

/** Streaming exact deduplication — the online half of
  * `operators.Dedup.q24DedupExact`: fingerprint each document as it
  * arrives and keep only first occurrences.
  *
  * `dropDuplicatesWithinWatermark` bounds the dedup state: a
  * fingerprint is remembered only until the watermark passes its event
  * time + delay, so state size is (arrival rate × watermark window)
  * instead of growing forever — the only formulation that survives an
  * unbounded 100 TB/day stream. Exactly-once first-wins semantics hold
  * for duplicates arriving within the watermark of each other, which
  * is the contract a training-data ingest wants (late replays beyond
  * the watermark are re-admitted by design).
  */
object StreamDedup {

  /** events: any streaming DataFrame with (doc_id, text, ts) columns;
    * returns the deduplicated stream keyed by content fingerprint. */
  def dedupStream(docs: DataFrame, watermarkDelay: String): DataFrame =
    docs
      .withColumn("fp", Cols.fingerprint(F.col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Catalog query: stream `documents`, dedup by content fingerprint.
    * Arrival time is synthesized from doc_id (one µs apart, offset
    * well past epoch 0 — the stream's initial watermark — so no row is
    * dropped as late), putting every duplicate inside the 1-hour
    * watermark: the surviving SET of fingerprints equals exact batch
    * dedup (q24). Which copy survives depends on arrival interleaving
    * — inherent to streaming first-wins — so the query emits only the
    * fingerprint set, which is interleaving-invariant and
    * oracle-checkable. */
  def q81StreamDedup(spark: SparkSession, dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
      val src = spark.readStream
        .schema(docsSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)
        .withColumn("ts",
          F.timestamp_micros(F.col("doc_id") + F.lit(1700000000000000L)))
      val deduped = dedupStream(src, "1 hour").select("fp")
      val name = "graft_stream_dedup_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val query = deduped.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
      val result = spark.table(name).orderBy("fp")
      StreamingWindows.materializeAndDrop(spark, name, result)
    }
}
