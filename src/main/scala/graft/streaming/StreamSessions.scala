package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** One event on the wire (ts in epoch micros). */
case class SessionEvent(user_id: Long, ts_us: Long, event_id: Long)

/** Open-session state kept per user between micro-batches. */
case class SessionState(start_us: Long, last_us: Long, n_events: Long)

/** A closed session. */
case class ClosedSession(user_id: Long, session_start_us: Long,
    n_events: Long, duration_sec: Double)

/** Stateful gap-based sessionization with `flatMapGroupsWithState` —
  * the custom-state streaming surface (north star "Structured
  * Streaming ... mapGroupsWithState/flatMapGroupsWithState for custom
  * state"). Semantics match the batch formulation in
  * `operators.Events.q38Sessionize`: a session closes after `gap`
  * of user inactivity (enforced by event-time timeout against the
  * watermark).
  *
  * State is one small record per ACTIVE user — not per event — so
  * state-store size is bounded by concurrent users regardless of
  * event volume; the shuffle partitions by user_id exactly like the
  * batch window. Tests drive it with a MemoryStream and compare
  * against q38 (see StreamingSpec).
  */
object StreamSessions {
  val DefaultGapUs: Long = 30L * 60 * 1000000

  /** Close a session record into its emitted form. */
  def close(userId: Long, s: SessionState): ClosedSession =
    ClosedSession(userId, s.start_us, s.n_events,
      (s.last_us - s.start_us).toDouble / 1000000.0)

  /** The per-batch gap fold shared by the q82 (GroupStateTimeout) and
    * q149 (state-v2 timer) sessionizers — ONE definition so the twins
    * cannot drift: sort the batch's events by (ts, event_id), extend
    * or gap-close the open session, return (closed sessions, open
    * state). `prev` is the open session carried from earlier batches,
    * `rows` the batch's (user_id, ts_us, event_id, _) tuples. */
  def foldBatch(userId: Long, prev: Option[SessionState],
      rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
      gapUs: Long): (Seq[ClosedSession], Option[SessionState]) = {
    val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
    var st = prev.orNull
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { r =>
      val ts = r._2
      st match {
        case null => st = SessionState(ts, ts, 1)
        case s if ts - s.last_us > gapUs =>
          closed += close(userId, s)
          st = SessionState(ts, ts, 1)
        case s => st = SessionState(s.start_us, ts, s.n_events + 1)
      }
    }
    (closed.result(), Option(st))
  }

  def sessionize(events: Dataset[SessionEvent],
      gapUs: Long = DefaultGapUs): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "30 minutes")
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last_event + gap: emit and clear
            val s = state.get
            state.remove()
            Iterator.single(close(userId, s))
          } else {
            val (closed, open) =
              foldBatch(userId, state.getOption, rows, gapUs)
            open.foreach { st =>
              state.update(st)
              // close via timeout once the watermark passes last + gap
              state.setTimeoutTimestamp((st.last_us + gapUs) / 1000)
            }
            closed.iterator
          }
      }
  }

  /** Catalog query: stateful sessionization over the `events` stream.
    * The AvailableNow drain processes the file in one data batch, so
    * the deterministic output is every session CLOSED while draining:
    * sessions followed by a later same-user event (closed inline by
    * gap-exceedance) plus, if the engine runs a no-data batch after
    * the watermark advances, timed-out sessions old enough that
    * last_event + gap < max_ts - watermark_delay. Both sets are pure
    * functions of the data, so the result stays oracle-checkable. */
  def q82StreamSessions(spark: SparkSession, dir: String): DataFrame =
    StreamingWindows.withStreamPartitions(spark) {
      import spark.implicits._
      val src = StreamingWindows.eventsStream(spark, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"))
        .as[SessionEvent]
      val sessions = sessionize(src)
      val name = "graft_stream_sessions_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val query = sessions.toDF().writeStream.format("memory")
        .queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      query.awaitTermination()
      val result = spark.table(name)
        .orderBy("user_id", "session_start_us")
      StreamingWindows.materializeAndDrop(spark, name, result)
    }
}
