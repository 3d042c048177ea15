package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Watermarked event-time windowed aggregation as a STREAM — the
  * §2.8 extension surface running under Structured Streaming: the same
  * tumbling-window expression as `graft.ops.Windowed` over an unbounded
  * JSON-lines source, with `withWatermark` bounding state so late data
  * past the threshold is dropped and closed windows are emitted
  * append-only (each window's final count lands exactly once).
  *
  * At scale this is the canonical shape: state per open (window, key)
  * only, watermark-driven eviction, file-sink exactly-once; swap
  * `Trigger.AvailableNow` for `ProcessingTime` to run continuously.
  */
object EventWindows {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Unbounded source of JSON-line events → 10-minute tumbling counts per
    * event_type, with a `delay` lateness allowance. */
  def windowedCounts(spark: SparkSession, inboxDir: String,
                     delay: String = "10 minutes"): DataFrame =
    spark.readStream.schema(eventSchema).json(inboxDir)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n_events"))

  /** Drain pending events, appending CLOSED windows to `tableDir`
    * exactly once. */
  def drainOnce(spark: SparkSession, inboxDir: String, tableDir: String,
                checkpointDir: String): StreamingQuery = {
    Streams.drainOnce(windowedCounts(spark, inboxDir), tableDir, checkpointDir)
  }
}
