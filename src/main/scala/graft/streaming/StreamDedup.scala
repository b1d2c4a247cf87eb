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

  /** q217: the streaming NEAR-dup admission gate — arriving documents
    * are checked against the PERSISTED MinHash band index of the
    * standing corpus before they are admitted. q206/q211 are the batch
    * (daily) shape of this; this is the online shape a real ingest
    * front-door runs: the index is a bucketed catalog table built once
    * per compaction cycle, and each micro-batch only computes its own
    * sketches and probes the buckets it lands in.
    *
    * Plan shape per micro-batch: narrow sketching (shingles → 16
    * minhash sigs → 4 band keys, all codegen expressions — no
    * checkpoint, no repartition: streaming batches are already
    * parallel), a STREAM-STATIC inner join against the band index on
    * (band, band_key), stateful pair dedup (the same candidate can
    * arrive via several bands/batches), then a second static join
    * fetches the matched corpus doc's shingles for the exact-Jaccard
    * verify. Only the NEW side flows through streaming state — the
    * corpus side stays a static table, which is what bounds state at
    * 100 TB (state ∝ admitted candidates, not corpus size).
    *
    * Pair dedup here uses dropDuplicates on the pair key — unbounded
    * state by documented contract, kept as the time-free reference
    * form. [[q237StreamGateBounded]] is the production variant: same
    * pipeline, same output, with the pair state bounded by
    * `dropDuplicatesWithinWatermark` (the q81 pattern) and eviction
    * spec-asserted. */
  def q217StreamIndexDedup(spark: SparkSession, dir: String): DataFrame =
    gateIndexDedup(spark, dir, bounded = false)._1

  /** q237: q217 with the pair-dedup state BOUNDED — the production
    * form the q217 scaladoc only narrated. Arrivals carry an event
    * time (synthesized seconds apart, so the drain's time span ≫ the
    * 1-minute delay) and the pair dedup becomes
    * `dropDuplicatesWithinWatermark`: a (doc_new, doc_old) key is
    * remembered only until the watermark passes its event time +
    * delay, so gate state is (admission rate × watermark window)
    * instead of growing with everything ever admitted. Output is
    * IDENTICAL to q217 on the fixture — every duplicate candidate
    * pair originates from the same arriving row (its 4 band probes
    * share one timestamp), so no dedup decision ever spans more than
    * the watermark — which is why the two queries share one oracle.
    * StreamingDedupSpec asserts eviction actually happens
    * (numRowsRemoved > 0 in the state operator's progress). */
  def q237StreamGateBounded(spark: SparkSession, dir: String): DataFrame =
    gateIndexDedup(spark, dir, bounded = true)._1

  /** Shared gate pipeline; `bounded` selects watermark-bounded pair
    * dedup (q237) vs the contract-documented unbounded form (q217).
    * Returns (result, total state rows evicted by watermark). */
  private[graft] def gateIndexDedup(spark: SparkSession, dir: String,
      bounded: Boolean): (DataFrame, Long) =
    StreamingWindows.withStreamPartitions(spark) {
      import graft.operators.{Dedup, Scale}
      val corpus = graft.Tables.documents(spark, dir)
        .filter(F.col("doc_id") % 10 =!= 7)
      val corpusShingles = Dedup.shingled(corpus)
      // the standing artifact: bucketed so batch consumers (q211's
      // shape) join it exchange-free; the stream probe below reads it
      // as a plain static table
      val tbl = if (bounded) "graft_band_index_gate_wm"
                else "graft_band_index_gate"
      Scale.dropManaged(spark, tbl)
      Dedup.bandTable(corpusShingles)
        .write.bucketBy(8, "band", "band_key").sortBy("band", "band_key")
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .saveAsTable(tbl)
      val index = spark.table(tbl)

      // the probe reuses Dedup's EXACT shingle and band-key recipes
      // (shingleSql / bandExplodeSql) — the gate only works if probe
      // keys are bit-identical to the persisted index's
      val raw = spark.readStream
        .schema(docsSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)
        .filter(F.col("doc_id") % 10 === 7)
      // bounded mode: seconds-apart arrival times make the drain span
      // many watermark windows, so eviction is observable; all probes
      // of one arrival share its timestamp, keeping dedup complete
      val timed =
        if (bounded) raw
          .withColumn("ts",
            F.timestamp_seconds(F.col("doc_id") + F.lit(1700000000L)))
          .withWatermark("ts", "1 minute")
        else raw.withColumn("ts", F.lit(null).cast("timestamp"))
      val arriving = timed
        .select(F.col("doc_id"), F.col("ts"),
          F.split(Cols.normText(F.col("text")), " ").as("w"))
        .filter(F.size(F.col("w")) >= 2)
        .select(F.col("doc_id"), F.col("ts"),
          F.expr(Dedup.shingleSql).as("sh"))
      val probes = arriving
        .select(F.col("doc_id"), F.col("ts"), F.col("sh"),
          graft.functions.TextExprs.minhashSigs(F.col("sh"), 16).as("sig"))
        .select(F.col("doc_id"), F.col("ts"), F.col("sh"),
          F.expr(Dedup.bandExplodeSql).as("bk"))
        .select(F.col("doc_id").as("doc_new"), F.col("ts"), F.col("sh"),
          F.col("bk.band"), F.col("bk.band_key"))
      val candidates = probes
        .join(index,
          probes("band") === index("band") &&
            probes("band_key") === index("band_key"))
        .select(F.col("doc_new"), F.col("ts"), F.col("sh"),
          index("doc_id").as("doc_old"))
      val deduped =
        if (bounded)
          candidates.dropDuplicatesWithinWatermark("doc_new", "doc_old")
        else candidates.dropDuplicates("doc_new", "doc_old")
      val verified = deduped
        .drop("ts")
        .join(corpusShingles
          .select(F.col("doc_id").as("doc_old"), F.col("sh").as("sh_old")),
          "doc_old")
        .select(F.col("doc_new"), F.col("doc_old"),
          graft.functions.TextExprs.jaccard(F.col("sh"), F.col("sh_old"))
            .as("jac_raw"))
        .filter(F.col("jac_raw") >= 0.8)
        .select(F.col("doc_new"), F.col("doc_old"),
          F.round(F.col("jac_raw"), 9).as("jaccard"))

      val name = "graft_stream_gate_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val query = verified.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
      val evicted = query.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsRemoved).sum
      val result = spark.table(name).orderBy("doc_new", "doc_old")
      (StreamingWindows.materializeAndDrop(spark, name, result), evicted)
    }
}
