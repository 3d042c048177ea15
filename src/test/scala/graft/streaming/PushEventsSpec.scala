package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.Base64

import graft.SparkTestBase

/** S10 exactly-once semantics: two incremental drains land each pushed
  * payload exactly once — the second drain picks up only new payloads
  * and a no-op third drain lands nothing. */
class PushEventsSpec extends SparkTestBase {
  import spark.implicits._

  private def payload(rows: Seq[(String, String, Boolean)]): String = {
    val json = rows.map { case (ts, page, bot) =>
      s"""{"ts":"$ts","page":"$page","referrer":"r","session_id":"s1",""" +
        s""""user_agent":"ua","ip":"1.2.3.4","country":"US","is_bot":$bot}"""
    }.mkString("[", ",", "]")
    Base64.getEncoder.encodeToString(json.getBytes("UTF-8"))
  }

  test("decode parses base64 JSON payloads against the declared schema") {
    val df = PushEvents.decode(
      Seq(payload(Seq(("2026-01-01T10:00:00Z", "/home", false),
        ("2026-01-01T10:00:05Z", "/docs", true)))).toDF("value"))
    assert(df.schema == PushEvents.hitSchema)
    assert(df.count() == 2)
    assert(df.where($"is_bot").select("page").as[String].collect()
      .toSeq == Seq("/docs"))
  }

  test("AvailableNow drains land each payload exactly once across runs") {
    val inbox = tmpDir("inbox")
    val table = tmpDir("hits-table") + "/t"
    val ckpt = tmpDir("ckpt")

    Files.writeString(Paths.get(inbox, "m1.txt"),
      payload(Seq(("2026-01-01T10:00:00Z", "/a", false),
        ("2026-01-01T10:00:01Z", "/b", false))) + "\n")
    PushEvents.drainOnce(spark, inbox, table, ckpt)
    assert(spark.read.parquet(table).count() == 2)

    // second payload arrives; re-drain: batch 1 must NOT re-land
    Files.writeString(Paths.get(inbox, "m2.txt"),
      payload(Seq(("2026-01-01T11:00:00Z", "/c", true))) + "\n")
    PushEvents.drainOnce(spark, inbox, table, ckpt)
    val after2 = spark.read.parquet(table)
    assert(after2.count() == 3)
    assert(after2.select("page").as[String].collect().sorted.toSeq ==
      Seq("/a", "/b", "/c"))

    // nothing new: a third drain is a no-op
    PushEvents.drainOnce(spark, inbox, table, ckpt)
    assert(spark.read.parquet(table).count() == 3)
  }
}
