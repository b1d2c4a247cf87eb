package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}

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
}
