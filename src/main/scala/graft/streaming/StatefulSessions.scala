package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}

/** Custom stateful streaming (brief: "`KeyValueGroupedDataset.
  * mapGroupsWithState`/`flatMapGroupsWithState` for custom state"):
  * user sessionization with arbitrary per-session state that
  * `session_window` can't express — per-session event count, distinct
  * event types, and the full dwell span — maintained imperatively per
  * user key and emitted once when the session times out.
  *
  * State machine per user: events accumulate into an open session; when
  * the event-time watermark passes last-event + gap, the timeout fires
  * and the closed session is emitted exactly once (append mode). State
  * size is O(open sessions), bounded by the watermark — at 100 TB the
  * shuffle key is the user id, state lives in the state store (RocksDB
  * in production), and skewed users are still one state row each.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)

  final case class SessionState(start: Timestamp, last: Timestamp,
                                nEvents: Long, types: Set[String])

  final case class ClosedSession(user_id: Long, session_start: Timestamp,
                                 session_end: Timestamp, n_events: Long,
                                 n_types: Int, dwell_secs: Long)

  val gapSeconds: Long = 30 * 60

  private def close(userId: Long, s: SessionState): ClosedSession =
    ClosedSession(userId, s.start, s.last, s.nEvents, s.types.size,
      (s.last.getTime - s.start.getTime) / 1000L)

  /** The per-key transition function. Two ways a session closes:
    * the event-time timeout fires (no new data, watermark passed
    * last + gap), or a new event arrives more than a gap after the open
    * session's last event — the timeout alone is NOT enough, because new
    * data for a key suppresses its timeout in that batch, so the gap must
    * also be enforced against the incoming events themselves. */
  def transition(userId: Long, events: Iterator[Event],
                 state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(close(userId, s))
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      if (sorted.isEmpty) Iterator.empty
      else {
        var closed = List.empty[ClosedSession]
        var cur = state.getOption
        sorted.foreach { e =>
          cur = cur match {
            case Some(s) if e.ts.getTime - s.last.getTime <= gapSeconds * 1000L =>
              Some(s.copy(
                // a late (within-watermark) event can precede the open
                // session: extend BOTH ends, or start/dwell are wrong
                start = if (e.ts.before(s.start)) e.ts else s.start,
                last = if (e.ts.after(s.last)) e.ts else s.last,
                nEvents = s.nEvents + 1,
                types = s.types + e.event_type))
            case Some(s) =>
              closed ::= close(userId, s)
              Some(SessionState(e.ts, e.ts, 1L, Set(e.event_type)))
            case None =>
              Some(SessionState(e.ts, e.ts, 1L, Set(e.event_type)))
          }
        }
        val s = cur.get
        state.update(s)
        state.setTimeoutTimestamp(s.last.getTime + gapSeconds * 1000L)
        closed.reverse.iterator
      }
    }
  }

  /** Wire the transition over an unbounded JSON-lines event source. */
  def sessions(spark: SparkSession, inboxDir: String,
               delay: String = "10 minutes"): Dataset[ClosedSession] = {
    import spark.implicits._
    spark.readStream.schema(EventWindows.eventSchema).json(inboxDir)
      .withWatermark("ts", delay)
      .select($"user_id", $"ts", $"event_type").as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(transition)
  }

  /** Drain pending events; closed sessions append exactly once. */
  def drainOnce(spark: SparkSession, inboxDir: String, tableDir: String,
                checkpointDir: String): StreamingQuery = {
    Streams.drainOnce(sessions(spark, inboxDir).toDF(), tableDir, checkpointDir)
  }
}
