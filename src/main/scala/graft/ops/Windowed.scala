package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Kit
import graft.sources.Tables

/** Event-time windowed aggregations over the `events` fixture — the
  * streaming-adjacent batch surface (SURVEY §2.8: tumbling/sliding/
  * session windows are absent in the reference; the extension surface
  * uses `window($"ts", …)` / `session_window`). The same expressions run
  * unchanged under `readStream` (see `graft.streaming.EventWindows`);
  * verifying them in batch against the DuckDB oracle is what makes the
  * streaming semantics oracle-checkable at all.
  *
  * Scale notes: a windowed groupBy shuffles on (window, key) — at 100 TB
  * the map-side partial aggregation shrinks each partition to one row per
  * (window, key) before the exchange, and a date/hour-partitioned source
  * prunes the scan. Money sums use the DECIMAL(18,2) pattern (exact,
  * order-independent — see Kit.moneySum).
  */
object Windowed {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Tumbling 10-minute windows × event_type: count + exact value sum. */
  val tumblingWindowCounts: QueryDef = QueryDef.sql(
    "tumbling_window_counts",
    """SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""") { (s, dir) =>
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "10 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"), Kit.moneySum($"value").as("sum_value"))
      .select($"w.start".as("win_start"), $"event_type", $"n_events",
        $"sum_value")
  }

  /** Sliding windows: 10-minute length, 5-minute slide — every event lands
    * in exactly two windows. The oracle replays Spark's window assignment:
    * for k ∈ {0,1}, win_start = 5-min bucket − k·5 min. */
  val slidingWindowCounts: QueryDef = QueryDef.sql(
    "sliding_window_counts",
    """SELECT time_bucket(INTERVAL '5 minutes', ts) - k * INTERVAL '5 minutes' AS win_start,
      |  COUNT(*) AS n_events
      |FROM events, UNNEST([0, 1]) AS t(k)
      |GROUP BY 1""") { (s, dir) =>
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"w.start".as("win_start"), $"n_events")
  }

  /** Session windows per user with a 30-minute inactivity gap. Output is
    * the window-implementation-independent signature (first/last event
    * time + size), so Spark's `session_window` and the oracle's
    * gaps-and-islands (LAG + running break count) agree exactly — the
    * oracle's break condition is `>= gap` because Spark session windows
    * are [start, start+gap): an event exactly at the gap boundary opens a
    * NEW session; ties on ts are ordered by event_id so the running sum
    * is deterministic. */
  val sessionWindowStats: QueryDef = QueryDef.sql(
    "session_window_stats",
    """WITH breaks AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM breaks)
      |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events
      |FROM sessions GROUP BY user_id, sid""") { (s, dir) =>
    import s.implicits._
    events(s, dir)
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"session_start", $"session_end", $"n_events")
  }

  val all: Seq[QueryDef] = Seq(
    tumblingWindowCounts, slidingWindowCounts, sessionWindowStats)
}
