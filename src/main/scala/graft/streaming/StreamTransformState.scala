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

/** Gap sessionization on the state-v2 API: same semantics as q82's
  * flatMapGroupsWithState sessionizer, but sessions close through
  * EXPLICIT event-time timers (`registerTimer` + `handleExpiredTimer`)
  * instead of GroupStateTimeout — the processor owns an arbitrary
  * number of timers per key, decoupled from the single state blob.
  * A stale-timer guard (expiry < current session's deadline) makes
  * re-registration unnecessary: outdated timers fire and no-op. */
class TimerSessionizer(gapUs: Long) extends StatefulProcessor[
    Long, (Long, Long, Long, java.sql.Timestamp), ClosedSession] {
  @transient private var st: ValueState[SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SessionState]("session",
      Encoders.product[SessionState], TTLConfig.NONE)

  /** Timer expiry for an open session. State-v2 timers fire when
    * expiry <= watermark (INCLUSIVE — TimerStateImpl), while q82's
    * GroupStateTimeout fires on deadline < watermark (strict). The +1
    * aligns the two: a timer at deadline+1 fires iff deadline <
    * watermark, so both sessionizers emit the identical set at exact
    * millisecond boundaries. */
  private def expiryMs(s: SessionState): Long =
    (s.last_us + gapUs) / 1000 + 1

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[ClosedSession] = {
    val prev = if (st.exists()) Some(st.get()) else None
    val (closed, open) = StreamSessions.foldBatch(key, prev, rows, gapUs)
    open.foreach { cur =>
      st.update(cur)
      getHandle.registerTimer(expiryMs(cur))
    }
    closed.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[ClosedSession] =
    if (st.exists()) {
      val s = st.get()
      if (expiredTimerInfo.getExpiryTimeInMs() >= expiryMs(s)) {
        st.clear()
        Iterator.single(StreamSessions.close(key, s))
      } else Iterator.empty // stale timer from a superseded deadline
    } else Iterator.empty
}

object StreamTransformState {

  /** Run `body` with the RocksDB state store provider (required by
    * transformWithState — per-partition LSM stores with changelog
    * checkpointing instead of JVM-heap hashmaps), restoring the
    * previous provider conf afterwards. `conf.getOption` surfaces the
    * session DEFAULT (HDFSBacked), not None, so restore just sets it
    * back. */
  private def withRocksDBProvider[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }


  /** Drain the events table through transformWithState one file per
    * trigger (4 micro-batches), then reduce the per-batch running
    * emissions to their final (monotone) values. Must equal the batch
    * GROUP BY — proving named-state carry across micro-batches. */
  def q135TransformWithState(spark: SparkSession, dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
      withRocksDBProvider(spark) {
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
      }
    }

  /** q82's sessionization re-run through [[TimerSessionizer]] (state
    * v2 + event-time timers, RocksDB-backed). Drains the events file
    * in one data batch; inline gap-closures emit there, and the
    * AvailableNow no-data batch fires timers the final watermark
    * passed — the same deterministic closed-session set as q82, same
    * oracle. */
  def q149TwsTimers(spark: SparkSession, dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
      withRocksDBProvider(spark) {
        import spark.implicits._
        val src = StreamingWindows.eventsStream(spark, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .withWatermark("ts", "30 minutes")
          .as[(Long, Long, Long, java.sql.Timestamp)]
        val sessions = src.groupByKey(_._1)
          .transformWithState(
            new TimerSessionizer(StreamSessions.DefaultGapUs),
            TimeMode.EventTime(), OutputMode.Append())
        val name = "graft_tws_timers_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val query = sessions.toDF().writeStream
          .format("memory").queryName(name)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        val result = spark.table(name)
          .select(col("user_id"), col("session_start_us"),
            col("n_events"), col("duration_sec"))
          .orderBy(col("user_id"), col("session_start_us"))
        StreamingWindows.materializeAndDrop(spark, name, result)
      }
    }
}
