package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.functions.Cols._
import graft.operators.{Scale, TableFormat}

/** STREAMING commit ingest into the snapshot-versioned table — the
  * table-format tier's online half, completing the online/offline
  * parity the dedup families already have (text q206/q211/q217,
  * vectors q294/q304 ↔ batch snapshots q309/q310/q312 + THIS).
  *
  * Shape: arrivals drain through `foreachBatch`; every micro-batch
  * lands as ONE immutable commit partition (`b<batchId>` — the
  * checkpointed batchId makes a replayed batch overwrite its own
  * commit, the exactly-once contract [[StreamSink]] documents), and
  * the manifest gains one VERSION row set per batch, so every batch
  * boundary is a time-travelable snapshot the moment it commits.
  * Readers never block on the writer: a version, once written, is an
  * immutable file set (the q309 contract) — this is exactly how
  * Delta/Iceberg streaming sinks turn micro-batches into table
  * versions. At 100 TB the manifest-per-version listing becomes a
  * manifest-LIST plus per-commit manifests; the arithmetic is the
  * same, only the metadata gets its own layer of files.
  */
object StreamSnapshotIngest {

  private val DataT = "graft_snap_data_si"
  private val ManifestT = "graft_snap_manifest_si"

  /** Stage the arrival stream as four deterministic single-file
    * slices (o_orderkey mod 4) with strictly increasing modification
    * times, so `maxFilesPerTrigger=1` yields batch k == slice k — the
    * fixture analog of four ingest ticks arriving in order. */
  private def stageArrivals(spark: SparkSession, dir: String): String = {
    val zone = graft.Scratch.dir("q314_commits")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(zone), true)
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
    val t0 = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"$dir/orders.parquet")).getModificationTime
    (0 until 4).foreach { k =>
      val tmp = s"$zone/_stage_$k"
      orders.filter(col("o_orderkey") % 4 === k)
        .coalesce(1).write.parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.startsWith("part-")).get
      val dst = new org.apache.hadoop.fs.Path(s"$zone/tick_$k.parquet")
      fs.rename(part, dst)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      fs.setTimes(dst, t0 + (k + 1) * 2000L, -1)
    }
    zone
  }

  /** q314: drain four arrival ticks into four commits + four
    * versions, then time-travel-read every version through the
    * manifest. Version v's content is ticks 0..v-1 by construction,
    * which is what the oracle re-derives (`o_orderkey % 4 < v`). The
    * spec asserts the physical half: four commit partitions, each
    * version's read pruned to exactly its commit set. */
  def q314StreamCommitIngest(spark: SparkSession,
      dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
      import spark.implicits._
      Scale.dropManaged(spark, DataT)
      Scale.dropManaged(spark, ManifestT)
      val zone = stageArrivals(spark, dir)
      val orders = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"))
      // empty shells: commits/manifest rows only ever APPEND
      orders.filter(lit(false)).withColumn("commit_id", lit("seed"))
        .write.partitionBy("commit_id")
        .mode(SaveMode.Overwrite).saveAsTable(DataT)
      Seq.empty[(Int, String)].toDF("version", "commit_id")
        .write.mode(SaveMode.Overwrite).saveAsTable(ManifestT)

      val src = spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", "1").parquet(zone)
      val ingestBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
        val s = batch.sparkSession
        import s.implicits._
        batch.withColumn("commit_id", lit(s"b$batchId"))
          .write.insertInto(DataT)
        // the new version lists its full commit set (b0..b<batchId>):
        // snapshot visibility is one manifest filter, no chain walk
        (0 to batchId.toInt).map(i => (batchId.toInt + 1, s"b$i"))
          .toDF("version", "commit_id").write.insertInto(ManifestT)
      }
      val query = src.writeStream
        .option("checkpointLocation", s"$zone/_checkpoint")
        .foreachBatch(ingestBatch)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()

      (1 to 4).map { v =>
        TableFormat.readVersion(spark, DataT, ManifestT, v)
          .agg(count(lit(1)).as("n_rows"),
            dsum(col("o_totalprice")).as("sum_price"),
            min(col("o_orderkey")).as("min_okey"),
            max(col("o_orderkey")).as("max_okey"))
          .select(lit(v).as("version"), col("n_rows"), col("sum_price"),
            col("min_okey"), col("max_okey"))
      }.reduce(_ unionByName _).orderBy(col("version"))
    }
}
