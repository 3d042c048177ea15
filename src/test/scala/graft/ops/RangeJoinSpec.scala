package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bucketed range-join semantics at the awkward edges: window inclusivity,
  * bucket-boundary crossings, same-timestamp events, key isolation. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toSeq.toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp($"s")).drop("s")

  test("inclusive at ts-W, exclusive at ts, correct across bucket boundaries") {
    val events = ev(
      (1L, 1L, "2026-01-01 10:00:00"),
      (2L, 1L, "2026-01-01 10:04:59"),
      (3L, 1L, "2026-01-01 10:05:00"), // bucket boundary for W=300
      (4L, 1L, "2026-01-01 10:10:00"),
      (5L, 2L, "2026-01-01 10:04:00")) // other user: isolated
    val got = RangeJoin.recentWindowCounts(events, 300L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 0L, // nothing before it
      2L -> 1L, // sees e1 (10:00:00 ∈ [10:00:-01... window [09:59:59, 10:04:59))
      3L -> 2L, // [10:00:00, 10:05:00): e1 inclusive at the lower edge, e2
      4L -> 1L, // [10:05:00, 10:10:00): e3 only — e4's own ts is exclusive
      5L -> 0L))
  }

  test("same-timestamp events never count each other (strict upper bound)") {
    val events = ev(
      (1L, 1L, "2026-01-01 12:00:00"),
      (2L, 1L, "2026-01-01 12:00:00"))
    val got = RangeJoin.recentWindowCounts(events, 300L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }
}
