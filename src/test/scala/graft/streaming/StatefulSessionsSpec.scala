package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** flatMapGroupsWithState sessionization: sessions close on the
  * event-time gap timeout, carry custom state (distinct types, dwell),
  * and emit exactly once across incremental drains. */
class StatefulSessionsSpec extends SparkTestBase {
  import spark.implicits._

  private var nextId = 0
  private def line(user: Long, ts: String, typ: String): String = {
    nextId += 1
    s"""{"event_id":$nextId,"ts":"$ts","user_id":$user,"event_type":"$typ","value":1.0}"""
  }

  test("sessions close on gap timeout with custom per-session state") {
    val inbox = tmpDir("ss-inbox")
    val table = tmpDir("ss-table") + "/t"
    val ckpt = tmpDir("ss-ckpt")

    // user 1: three events 10:00-10:10 (one session, 2 distinct types);
    // user 2: one event at 10:05. Nothing can close yet.
    Files.writeString(Paths.get(inbox, "b1.json"), Seq(
      line(1, "2026-01-01T10:00:00Z", "view"),
      line(1, "2026-01-01T10:05:00Z", "click"),
      line(1, "2026-01-01T10:10:00Z", "view"),
      line(2, "2026-01-01T10:05:00Z", "view")).mkString("", "\n", "\n"))
    StatefulSessions.drainOnce(spark, inbox, table, ckpt)

    // far-future event advances the watermark past both gap timeouts
    Files.writeString(Paths.get(inbox, "b2.json"),
      line(3, "2026-01-01T13:00:00Z", "view") + "\n")
    StatefulSessions.drainOnce(spark, inbox, table, ckpt)

    val rows = spark.read.parquet(table)
      .select($"user_id", $"n_events", $"n_types", $"dwell_secs")
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(rows.contains((1L, 3L, 2, 600L)))
    assert(rows.contains((2L, 1L, 1, 0L)))
    // user 3's session is still open
    assert(!rows.exists(_._1 == 3L))

    // re-drain with nothing new: no duplicate emissions
    Files.writeString(Paths.get(inbox, "b3.json"),
      line(3, "2026-01-01T16:00:00Z", "view") + "\n")
    StatefulSessions.drainOnce(spark, inbox, table, ckpt)
    val after = spark.read.parquet(table).where($"user_id" === 1L)
    assert(after.count() == 1)
  }

  test("transition extends session start for a late within-watermark event") {
    import java.sql.Timestamp
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import StatefulSessions._
    def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val state = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.of(
        SessionState(ts("2026-01-01T10:05:00Z"),
          ts("2026-01-01T10:05:00Z"), 1L, Set("view"))),
      timeoutConf = GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(0L),
      hasTimedOut = false)
    // a late event 5 minutes BEFORE the open session's start
    val out = transition(1L,
      Iterator(Event(1L, ts("2026-01-01T10:00:00Z"), "click")), state)
    assert(out.isEmpty)
    val s = state.get
    assert(s.start == ts("2026-01-01T10:00:00Z"))
    assert(s.last == ts("2026-01-01T10:05:00Z"))
    assert(s.nEvents == 2L && s.types == Set("view", "click"))
  }

  test("a new event after a closed session starts a fresh session") {
    val inbox = tmpDir("ss2-inbox")
    val table = tmpDir("ss2-table") + "/t"
    val ckpt = tmpDir("ss2-ckpt")
    Files.writeString(Paths.get(inbox, "b1.json"),
      line(7, "2026-01-01T09:00:00Z", "view") + "\n")
    StatefulSessions.drainOnce(spark, inbox, table, ckpt)
    // 2h later: closes session 1, starts session 2
    Files.writeString(Paths.get(inbox, "b2.json"),
      line(7, "2026-01-01T11:00:00Z", "click") + "\n")
    StatefulSessions.drainOnce(spark, inbox, table, ckpt)
    // and far future closes session 2
    Files.writeString(Paths.get(inbox, "b3.json"),
      line(8, "2026-01-01T15:00:00Z", "view") + "\n")
    StatefulSessions.drainOnce(spark, inbox, table, ckpt)
    val sessions = spark.read.parquet(table).where($"user_id" === 7L)
      .select($"n_events").as[Long].collect().toSeq
    assert(sessions == Seq(1L, 1L))
  }
}
