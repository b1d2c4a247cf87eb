package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Per-user running totals kept in named state variables. */
case class UserRunning(user_id: Long, n_events: Long, max_event_id: Long)

/** Spark 4 arbitrary stateful processing v2 (`transformWithState`):
  * a [[StatefulProcessor]] with NAMED, individually-evolvable state
  * variables — the successor to flatMapGroupsWithState's single state
  * blob (q82). Each micro-batch updates per-user ValueStates and emits
  * the running totals; both tracked quantities are MONOTONE (count,
  * max), so the final value per user is recoverable by a max-aggregate
  * over emissions regardless of how the input was split into batches —
  * which is what makes the query batch-equivalent and oracle-checkable
  * while still genuinely exercising cross-batch state.
  *
  * transformWithState requires the RocksDB state store provider —
  * itself the 100 TB answer to state: per-partition LSM stores with
  * changelog checkpointing instead of JVM-heap hashmaps.
  */
class RunningUserAgg
    extends StatefulProcessor[Long, (Long, Long), UserRunning] {
  @transient private var nState: ValueState[Long] = _
  @transient private var maxIdState: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    nState = getHandle.getValueState[Long]("n_events",
      Encoders.scalaLong, TTLConfig.NONE)
    maxIdState = getHandle.getValueState[Long]("max_event_id",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[UserRunning] = {
    var n = if (nState.exists()) nState.get() else 0L
    var mx = if (maxIdState.exists()) maxIdState.get() else Long.MinValue
    rows.foreach { case (_, eventId) =>
      n += 1
      if (eventId > mx) mx = eventId
    }
    nState.update(n)
    maxIdState.update(mx)
    Iterator.single(UserRunning(key, n, mx))
  }
}

object StreamTransformState {

  /** Drain the events table through transformWithState one file per
    * trigger (4 micro-batches), then reduce the per-batch running
    * emissions to their final (monotone) values. Must equal the batch
    * GROUP BY — proving named-state carry across micro-batches. */
  def q135TransformWithState(spark: SparkSession, dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val oldProvider = spark.conf.getOption(providerKey)
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val zone = graft.Scratch.dir("q135_events_multi")
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(zone), true)
        graft.Tables.events(spark, dir).repartition(4)
          .write.parquet(zone)
        import spark.implicits._
        val src = spark.readStream
          .schema(graft.Tables.events(spark, dir).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(zone)
          .select(col("user_id"), col("event_id"))
          .as[(Long, Long)]
        val running = src
          .groupByKey(_._1)
          .transformWithState(new RunningUserAgg,
            TimeMode.None(), OutputMode.Append())
        val name = "graft_tws_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val query = running.toDF().writeStream
          .format("memory").queryName(name)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        val result = spark.table(name)
          .groupBy(col("user_id"))
          .agg(max(col("n_events")).as("n_events"),
            max(col("max_event_id")).as("max_event_id"))
          .orderBy(col("user_id"))
        StreamingWindows.materializeAndDrop(spark, name, result)
      } finally {
        oldProvider match {
          case Some(v) => spark.conf.set(providerKey, v)
          case None    => spark.conf.unset(providerKey)
        }
      }
    }
}
