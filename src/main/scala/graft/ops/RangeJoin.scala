package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Range (interval) join — an operator family Spark has no native
  * physical strategy for: `a JOIN b ON key AND b.ts BETWEEN lo AND hi`
  * plans as a BroadcastNestedLoopJoin or a per-key cartesian, both of
  * which are O(n·m) at scale. The engine's formulation is TIME-AXIS
  * BUCKETING: quantize timestamps to fixed buckets of the window width,
  * equi-join on (key, bucket) with the probe side exploded into the only
  * two buckets its window can reach, and apply the exact range predicate
  * as a residual filter. The fan-out is a constant 2×, candidate volume
  * is bounded by per-(key, bucket) activity — never n·m — and the join is
  * an ordinary shuffled equi-join that AQE can skew-split.
  */
object RangeJoin {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** For every event: how many events by the same user landed in the
    * half-open window [ts - windowSec, ts)? The self-range-join shape of
    * rate limiting, fraud velocity checks, and sessionization features.
    *
    * Bucket correctness: ts2 ∈ [ts1 − W, ts1) implies floor(ts2/W) ∈
    * {floor(ts1/W) − 1, floor(ts1/W)}, so probing exactly those two
    * buckets finds every match once (each build row owns one bucket —
    * no dedup step). Zero-match events survive via the left join. */
  def recentWindowCounts(events: DataFrame, windowSec: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val micros = windowSec * 1000000L
    val withB = events
      .select($"event_id", $"user_id", $"ts",
        floor(unix_micros($"ts") / micros).as("b"))
    val probe = withB
      .select($"event_id", $"user_id", $"ts",
        explode(array($"b", $"b" - 1)).as("jb"))
    val build = withB
      .select($"user_id".as("u2"), $"ts".as("ts2"), $"b".as("jb"))
    probe
      .join(build,
        probe("user_id") === build("u2") && probe("jb") === build("jb") &&
          $"ts2" >= $"ts" - expr(s"INTERVAL $windowSec SECONDS") &&
          $"ts2" < $"ts",
        "left")
      .groupBy($"event_id")
      .agg(count($"ts2").as("n_recent"))
  }

  /** The registered form over the events fixture, 5-minute window. The
    * DuckDB oracle runs the textbook O(n·m/keys) correlated range join —
    * different algorithm, same rows, which is the point. */
  val rangeJoinRecent: QueryDef = QueryDef.sql(
    "range_join_recent",
    """SELECT e1.event_id, COUNT(e2.event_id) AS n_recent
      |FROM events e1
      |LEFT JOIN events e2 ON e2.user_id = e1.user_id
      |  AND e2.ts >= e1.ts - INTERVAL 5 MINUTE
      |  AND e2.ts < e1.ts
      |GROUP BY e1.event_id""") { (s, dir) =>
    recentWindowCounts(t(s, dir, "events"), windowSec = 300L)
  }

  /** Interval-OVERLAP join — both sides are intervals, the second shape
    * of the range-join family (the first, [[rangeJoinRecent]], is
    * point-in-window). Per-day user activity intervals [first, last]
    * against per-day event-type burst intervals, matched when they
    * overlap (inclusive: touching endpoints count, overlap 0).
    *
    * Scale shape: the day is the bucket key, so the join is an ordinary
    * equi-join whose candidate volume is Σ_day |users_day|·|types_day| —
    * never |A|·|B| — with the exact overlap predicate as residual. The
    * type side aggregates to (types × days) rows and is broadcast; all
    * interval arithmetic is integer micros (exact, oracle-portable). */
  val intervalOverlapJoin: QueryDef = QueryDef.sql(
    "interval_overlap_join",
    """WITH a AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    MIN(epoch_us(ts)) AS a_start, MAX(epoch_us(ts)) AS a_end
      |  FROM events GROUP BY 1, 2),
      |b AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    MIN(epoch_us(ts)) AS b_start, MAX(epoch_us(ts)) AS b_end
      |  FROM events GROUP BY 1, 2)
      |SELECT a.user_id, b.event_type, a.day,
      |  least(a_end, b_end) - greatest(a_start, b_start) AS overlap_micros
      |FROM a JOIN b ON a.day = b.day
      |  AND a_start <= b_end AND b_start <= a_end""") { (s, dir) =>
    import s.implicits._
    val ev = t(s, dir, "events")
      .select($"user_id", $"event_type", to_date($"ts").as("day"),
        unix_micros($"ts").as("us"))
    val a = ev.groupBy($"user_id", $"day")
      .agg(min($"us").as("a_start"), max($"us").as("a_end"))
    val b = ev.groupBy($"event_type", $"day")
      .agg(min($"us").as("b_start"), max($"us").as("b_end"))
    a.join(broadcast(b), Seq("day"))
      .where($"a_start" <= $"b_end" && $"b_start" <= $"a_end")
      .select($"user_id", $"event_type", $"day",
        (least($"a_end", $"b_end") - greatest($"a_start", $"b_start"))
          .as("overlap_micros"))
  }

  val all: Seq[QueryDef] = Seq(rangeJoinRecent, intervalOverlapJoin)
}
