package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Watermarked streaming windows: closed windows are emitted exactly
  * once; open windows are held back until the watermark passes them;
  * late-beyond-watermark data is dropped. */
class EventWindowsSpec extends SparkTestBase {
  import spark.implicits._

  private var nextId = 0
  private def line(ts: String, typ: String): String = {
    nextId += 1
    s"""{"event_id":$nextId,"ts":"$ts","user_id":1,"event_type":"$typ","value":1.0}"""
  }

  test("closed windows land once; open windows wait for the watermark") {
    val inbox = tmpDir("ev-inbox")
    val table = tmpDir("ev-table") + "/t"
    val ckpt = tmpDir("ev-ckpt")

    // batch 1: two events in the 10:00 window, one at 10:25.
    // max ts 10:25 → watermark 10:15 → the 10:00-10:10 window is closed.
    Files.writeString(Paths.get(inbox, "b1.json"),
      Seq(line("2026-01-01T10:01:00Z", "view"),
        line("2026-01-01T10:04:00Z", "view"),
        line("2026-01-01T10:25:00Z", "click")).mkString("", "\n", "\n"))
    EventWindows.drainOnce(spark, inbox, table, ckpt)
    // batch 2: event at 11:00 advances the watermark to 10:50, closing
    // the 10:20 window; 11:00's own window stays open.
    Files.writeString(Paths.get(inbox, "b2.json"),
      line("2026-01-01T11:00:00Z", "view") + "\n")
    EventWindows.drainOnce(spark, inbox, table, ckpt)

    val rows = spark.read.parquet(table)
      .select($"win_start".cast("string"), $"event_type", $"n_events")
      .as[(String, String, Long)].collect().toSet
    assert(rows.contains(("2026-01-01 10:00:00", "view", 2L)))
    assert(rows.contains(("2026-01-01 10:20:00", "click", 1L)))
    // 11:00 window not yet closed → not emitted
    assert(!rows.exists(_._1 == "2026-01-01 11:00:00"))

    // a third drain with only data far in the future closes 11:00 and
    // must NOT re-emit the earlier windows
    Files.writeString(Paths.get(inbox, "b3.json"),
      line("2026-01-01T12:00:00Z", "view") + "\n")
    EventWindows.drainOnce(spark, inbox, table, ckpt)
    val after = spark.read.parquet(table)
      .select($"win_start".cast("string"), $"event_type", $"n_events")
      .as[(String, String, Long)].collect().toList
    assert(after.count(_._1 == "2026-01-01 10:00:00") == 1)
    assert(after.toSet.contains(("2026-01-01 11:00:00", "view", 1L)))
  }
}
