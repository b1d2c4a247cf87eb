package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.CdcUpsert

/** q337 — STREAMING CDC UPSERT INGEST. The drain half of
  * [[graft.operators.CdcUpsert]]: three CDC micro-batches (each
  * carrying inserts AND updates AND deletes) arrive as staged
  * single-file slices and drain through `foreachBatch` +
  * `Trigger.AvailableNow`; every trigger executes the ONE shared
  * [[CdcUpsert.applyTick]] — an append commit + a routed MoR delete
  * artifact + a manifest version, all idempotent dynamic partition
  * overwrites — so every batch boundary is a time-travelable
  * snapshot and a replayed trigger lands byte-identical artifacts
  * (CdcUpsertSpec re-runs one and asserts it).
  *
  * Arrival files are mtime-spaced so the drain SEES them in order,
  * but correctness never depends on it (the q314/q328 rule): the
  * tick rides IN the data, and out-of-order delivery trips the
  * monotone-delivery `require` inside applyTick rather than
  * publishing a version that resolves to an unwritten commit. */
object StreamCdcUpsert {

  /** Stage the three CDC ticks as deterministic single-file
    * arrivals, mtime-spaced (the q314 stager shape). */
  private def stageArrivals(spark: SparkSession, dir: String): String = {
    val zone = graft.Scratch.dir("q337_cdc")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(zone), true)
    val t0 = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"$dir/orders.parquet")).getModificationTime
    // independent slice writes with EXPLICIT mtimes — concurrent
    // staging preserves the intended delivery order (r15 opt)
    graft.operators.Scale.inParallel(CdcUpsert.Ticks.map { tk => () =>
      val tmp = s"$zone/_stage_${tk.t}"
      CdcUpsert.tickRows(spark, dir, tk)
        .coalesce(1).write.parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.startsWith("part-")).get
      val dst = new org.apache.hadoop.fs.Path(
        s"$zone/tick_${tk.t}.parquet")
      fs.rename(part, dst)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      fs.setTimes(dst, t0 + (tk.t + 1) * 2000L, -1)
    }: _*)
    zone
  }

  /** q337: drain the CDC feed into the versioned table, then read
    * every version through the shared merge-on-read path. The oracle
    * re-derives each version's n_rows / sum_price / n_live_deletes
    * from the tick predicates; the spec asserts the physical half
    * (partition pruning, replay byte-stability, order-gap failure). */
  def q337StreamCdcUpsert(spark: SparkSession, dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
      CdcUpsert.initBase(spark, dir)
      val zone = stageArrivals(spark, dir)
      val schema = CdcUpsert.tickRows(spark, dir,
        CdcUpsert.Ticks.head).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(zone)
      val query = src.writeStream
        .option("checkpointLocation", s"$zone/_checkpoint")
        .foreachBatch((batch: DataFrame, _: Long) =>
          CdcUpsert.applyTick(batch))
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      CdcUpsert.versionReport(spark)
    }
}
