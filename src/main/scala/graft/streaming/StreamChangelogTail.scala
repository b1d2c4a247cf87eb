package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.operators.{Scale, TableFormat}

/** STREAMING CHANGELOG CONSUMPTION — the snapshot table as a stream
  * SOURCE, the read-side twin of q314's write-side ingest and the
  * r10 verdict's #2 residual: q312/q324 consume the changelog in
  * BATCH; every real format also ships the CDC-out pattern
  * (Delta/Iceberg streaming reads), where a standing consumer tails
  * the commit log and maintains derived state per landed commit.
  *
  * Shape: the q325-style commit log (version, committed_at) is the
  * stream — one arrival per publish, staged as single-file slices
  * exactly like q314's arrivals (mtime-spaced so the drain SEES them
  * in order, but correctness never depends on it: the version rides
  * IN the data). A `foreachBatch` + `Trigger.AvailableNow` consumer
  * maintains q324's per-customer MV, one refresh per landed commit:
  *
  *  - each refresh folds the v−1→v signed delta
  *    ([[TableFormat.mvSignedDelta]] — the ONE definition q324's
  *    batch refresh uses) into the previous MV state; the corpus is
  *    touched only at that commit's churn segments, spec-asserted
  *    through the same shared definition. `from = 0` makes the
  *    INITIAL build just the first refresh — no special case.
  *  - MV state is itself a versioned artifact: partition
  *    `mv_version=v` of the MV table, written through dynamic
  *    partition overwrite. That single choice buys the two streaming
  *    disciplines for free (the q314 lessons): REPLAY-SAFETY — a
  *    replayed trigger recomputes its partition from the immutable
  *    v−1 partition and the immutable corpus segments, overwriting
  *    itself with identical bytes — and ORDER-SAFETY — a refresh
  *    requires its predecessor partition to exist and fails loudly
  *    otherwise, never publishing state derived from a gap.
  *  - each refresh is BIT-EQUAL to the full recompute at its version
  *    (the q324 exactness contract, now held at EVERY commit
  *    boundary, which TableFormatSpec asserts per version).
  *
  * The report reads every MV version from the real partitions, so a
  * dropped delta, a double-applied replay, or a refresh that read
  * the wrong segments moves a row count or a sum and hash-fails
  * against the oracle's predicate arithmetic. At 100 TB this is the
  * standing MV service: per-commit cost follows that commit's churn
  * (never the view, never the table), and the consumer restarts from
  * its own versioned state table — online/offline parity for the
  * maintenance tier. */
object StreamChangelogTail {

  private[graft] val DataT = "graft_snap_data_cdc"
  private[graft] val ManifestT = "graft_snap_manifest_cdc"
  private[graft] val MvT = "graft_mv_cdc"
  private[graft] val BindingsT = "graft_artifact_bindings_cdc"

  /** Stage the commit log as three deterministic single-file
    * arrivals (one per published version), mtime-spaced. */
  private def stageCommitLog(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val zone = graft.Scratch.dir("q328_commitlog")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(zone), true)
    val t0 = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"$dir/orders.parquet")).getModificationTime
    Seq((1, "2000-01-01 00:00:00"), (2, "2000-02-01 00:00:00"),
      (3, "2000-03-01 00:00:00")).foreach { case (v, ts) =>
      val tmp = s"$zone/_stage_$v"
      Seq((v, ts)).toDF("version", "committed_at_s")
        .select(col("version"),
          col("committed_at_s").cast("timestamp").as("committed_at"))
        .coalesce(1).write.parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.startsWith("part-")).get
      val dst = new org.apache.hadoop.fs.Path(s"$zone/commit_$v.parquet")
      fs.rename(part, dst)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      fs.setTimes(dst, t0 + (v + 1) * 2000L, -1)
    }
    zone
  }

  def q328StreamMvMaintenance(spark: SparkSession,
      dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
      TableFormat.buildSnapshots(spark, dir, "_cdc")
      Scale.dropManaged(spark, MvT)
      TableFormat.initBindings(spark, BindingsT)
      // empty MV shell, partitioned by its idempotency key — the
      // exact decimal state type the delta arithmetic preserves
      Tables.orders(spark, dir).filter(lit(false))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(28,2)").as("sum_price"))
        .withColumn("mv_version", lit(0))
        .write.partitionBy("mv_version")
        .mode(SaveMode.Overwrite).saveAsTable(MvT)
      val zone = stageCommitLog(spark, dir)

      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("version",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("committed_at",
            org.apache.spark.sql.types.TimestampType))))
        .option("maxFilesPerTrigger", "1").parquet(zone)

      val refreshOne: (DataFrame, Long) => Unit = (batch, _) => {
        val s = batch.sparkSession
        // a trigger may carry several log rows; refreshes apply in
        // version order — each is its own idempotent unit
        val versions = batch.select(col("version")).distinct()
          .collect().map(_.getInt(0)).sorted
        versions.foreach { v =>
          val landed = s.sql(s"SHOW PARTITIONS $MvT").collect()
            .map(_.getString(0).stripPrefix("mv_version=").toInt).toSet
          // ORDER-SAFETY: state v derives from state v−1; a gap must
          // fail loudly, not publish MV state with missing history
          // (the q314 monotone-delivery discipline). A REPLAYED
          // commit (v−1 present, v too) passes and overwrites itself
          // with identical bytes — both inputs are immutable.
          require(v == 1 || landed.contains(v - 1),
            s"commit $v arrived before refresh ${v - 1} landed")
          val prev = s.table(MvT)
            .filter(col("mv_version") === v - 1)
            .select(col("o_custkey"), col("n_orders"), col("sum_price"))
          val refreshed = TableFormat.mvApplyDelta(prev,
            TableFormat.mvSignedDelta(s, DataT, ManifestT, v - 1, v))
            .withColumn("mv_version", lit(v))
            .localCheckpoint() // break lineage: reads the table it writes
          val pom = "spark.sql.sources.partitionOverwriteMode"
          val oldPom = s.conf.get(pom, "static")
          s.conf.set(pom, "dynamic")
          try refreshed.write.mode(SaveMode.Overwrite).insertInto(MvT)
          finally s.conf.set(pom, oldPom)
          // version-binding stamp (q333's contract), one per landed
          // refresh — the log keeps the full cadence history. Guarded
          // for REPLAY: a trigger re-run after a crash between the
          // (idempotent) partition overwrite and the checkpoint
          // commit must not double-stamp the version — the one
          // side effect here that appends rather than overwrites
          val stamped = s.table(BindingsT)
            .filter(col("artifact") === MvT &&
              col("bound_version") === v)
            .limit(1).collect().nonEmpty
          if (!stamped)
            TableFormat.bindArtifact(s, BindingsT, MvT, ManifestT, v)
        }
      }
      val query = src.writeStream
        .option("checkpointLocation", s"$zone/_checkpoint")
        .foreachBatch(refreshOne)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()

      // report: every MV version from the REAL partitions — per
      // version the key count, total orders, and total price the
      // oracle re-derives from the version predicates
      (1 to 3).map { v =>
        spark.table(MvT).filter(col("mv_version") === v)
          .agg(count(lit(1)).as("n_keys"),
            sum(col("n_orders")).as("n_orders"),
            sum(col("sum_price")).cast("double").as("sum_price"))
          .select(lit(v).as("version"), col("n_keys"), col("n_orders"),
            col("sum_price"))
      }.reduce(_ unionByName _).orderBy(col("version"))
    }
}
