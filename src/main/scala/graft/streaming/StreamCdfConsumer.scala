package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{CdcUpsert, Scale, TableFormat}

/** q345 — STREAMING CONSUMPTION OF THE ROW-LEVEL CHANGE FEED, closing
  * the CDC loop the r12 tier opened: q337 ingests upserts (CDC-in),
  * q338 derives row-level `_change_type` rows per commit (CDF-out),
  * and this consumer is the DOWNSTREAM system every real CDF exists
  * for — a standing job that tails the commit log and maintains its
  * own state from the per-record changes, never re-reading the
  * table. q328 proved the pattern for SEGMENT-level signed deltas;
  * this is the same consumer shape fed by ROW-level changes (the
  * Delta-CDF / Iceberg-changelog consumption mode), sharing its
  * disciplines:
  *
  *  - the commit log is the stream (one arrival per published
  *    version, mtime-spaced but order-independent — the version
  *    rides in the data);
  *  - per landed version v the trigger derives the v−1→v feed with
  *    the ONE shared [[CdcUpsert.changeFeedStep]] definition (post =
  *    that commit, pre = artifact-targeted segments only — churn-
  *    sized by the same contract q338's spec asserts) and folds its
  *    signed rows ([[CdcUpsert.feedSignedDelta]]) into the previous
  *    MV state;
  *  - MV state is versioned (partition mv_version=v, dynamic
  *    overwrite): replays overwrite themselves byte-identically,
  *    order gaps fail loudly before any state publishes, and each
  *    refresh stamps the binding log exactly once (replay-guarded);
  *  - every per-version state is BIT-EQUAL to the merge-on-read
  *    recompute at that version (counts long, sums decimal — the
  *    q324/q338 exactness rule), which is what the oracle checks
  *    from the tick predicates.
  *
  * At 100 TB this is the standing subscriber: per-commit cost
  * follows that commit's churn, state restarts from its own
  * versioned table, and the feed's row-level shape means the same
  * consumer can key on individual records (audit trails, per-entity
  * caches) — the capability segment deltas cannot offer. */
object StreamCdfConsumer {

  private[graft] val MvT = "graft_mv_cdf"
  private[graft] val BindingsT = "graft_artifact_bindings_cdf"

  /** Stage the CDC table's commit log (versions 2..4 — the three
    * upsert ticks) as single-file arrivals, mtime-spaced. */
  private def stageCommitLog(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val zone = graft.Scratch.dir("q345_cdflog")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(zone), true)
    val t0 = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"$dir/orders.parquet")).getModificationTime
    // independent one-row writes with EXPLICIT mtimes — concurrent
    // staging preserves the intended delivery order (r15 opt)
    Scale.inParallel(CdcUpsert.Ticks.map { tk => () =>
      val v = tk.t + 2
      val tmp = s"$zone/_stage_$v"
      Seq((v, s"2002-0${tk.t + 4}-02 00:00:00"))
        .toDF("version", "committed_at_s")
        .select(col("version"),
          col("committed_at_s").cast("timestamp").as("committed_at"))
        .coalesce(1).write.parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.startsWith("part-")).get
      val dst = new org.apache.hadoop.fs.Path(s"$zone/commit_$v.parquet")
      fs.rename(part, dst)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      fs.setTimes(dst, t0 + (tk.t + 1) * 2000L, -1)
    }: _*)
    zone
  }

  def q345StreamCdfConsumer(spark: SparkSession,
      dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
      CdcUpsert.buildLifecycle(spark, dir)
      Scale.dropManaged(spark, MvT)
      TableFormat.initBindings(spark, BindingsT)
      // seed state: the MV at version 1 (the consumer's initial
      // build — one recompute, like any subscriber's backfill)
      CdcUpsert.readState(spark, 1)._1
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(28,2)").as("sum_price"))
        .withColumn("mv_version", lit(1))
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

      val consumeOne: (DataFrame, Long) => Unit = (batch, _) => {
        val s = batch.sparkSession
        val versions = batch.select(col("version")).distinct()
          .collect().map(_.getInt(0)).sorted
        versions.foreach { v =>
          val landed = s.sql(s"SHOW PARTITIONS $MvT").collect()
            .map(_.getString(0).stripPrefix("mv_version=").toInt).toSet
          require(landed.contains(v - 1),
            s"commit $v arrived before refresh ${v - 1} landed")
          val prev = s.table(MvT)
            .filter(col("mv_version") === v - 1)
            .select(col("o_custkey"), col("n_orders"), col("sum_price"))
          // the row-level feed for this commit — the ONE shared
          // derivation; its fold is exact by the q338 certificate
          val feed = CdcUpsert.changeFeedStep(s, v - 2)
          val refreshed = TableFormat.mvApplyDelta(prev,
            CdcUpsert.feedSignedDelta(feed))
            .withColumn("mv_version", lit(v))
            .localCheckpoint()
          val pom = "spark.sql.sources.partitionOverwriteMode"
          val oldPom = s.conf.get(pom, "static")
          s.conf.set(pom, "dynamic")
          try refreshed.write.mode(SaveMode.Overwrite).insertInto(MvT)
          finally s.conf.set(pom, oldPom)
          val stamped = s.table(BindingsT)
            .filter(col("artifact") === MvT &&
              col("bound_version") === v)
            .limit(1).collect().nonEmpty
          if (!stamped)
            TableFormat.bindArtifact(s, BindingsT, MvT,
              CdcUpsert.CuManifest, v)
        }
      }
      val query = src.writeStream
        .option("checkpointLocation", s"$zone/_checkpoint")
        .foreachBatch(consumeOne)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()

      (2 to 4).map { v =>
        spark.table(MvT).filter(col("mv_version") === v)
          .agg(count(lit(1)).as("n_keys"),
            sum(col("n_orders")).as("n_orders"),
            sum(col("sum_price")).cast("double").as("sum_price"))
          .select(lit(v).as("version"), col("n_keys"), col("n_orders"),
            col("sum_price"))
      }.reduce(_ unionByName _).orderBy(col("version"))
    }
}
