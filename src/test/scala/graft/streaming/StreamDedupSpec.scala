package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Streaming dedup: re-delivered events inside the watermark horizon are
  * dropped, across payloads and across drains. */
class StreamDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def line(id: Long, ts: String): String =
    s"""{"event_id":$id,"ts":"$ts","user_id":1,"event_type":"view","value":1.0}"""

  test("re-delivered event ids are dropped within the watermark horizon") {
    val inbox = tmpDir("dd-inbox")
    val table = tmpDir("dd-table") + "/t"
    val ckpt = tmpDir("dd-ckpt")

    // first delivery of events 1,2 — and a duplicate of 1 in the SAME payload
    Files.writeString(Paths.get(inbox, "b1.json"), Seq(
      line(1, "2026-01-01T10:00:00Z"),
      line(2, "2026-01-01T10:00:30Z"),
      line(1, "2026-01-01T10:00:00Z")).mkString("", "\n", "\n"))
    StreamDedup.drainOnce(spark, inbox, table, ckpt)
    assert(spark.read.parquet(table).count() == 2)

    // a later payload re-delivers event 2 (still inside the horizon) plus
    // a genuinely new event 3
    Files.writeString(Paths.get(inbox, "b2.json"), Seq(
      line(2, "2026-01-01T10:00:30Z"),
      line(3, "2026-01-01T10:05:00Z")).mkString("", "\n", "\n"))
    StreamDedup.drainOnce(spark, inbox, table, ckpt)
    val ids = spark.read.parquet(table).select("event_id").as[Long]
      .collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }
}
