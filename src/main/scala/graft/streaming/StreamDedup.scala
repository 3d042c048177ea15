package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming dedup-on-arrival — the unbounded form of the batch
  * `Warehouse.newRowsOnly` anti-join: drop re-deliveries of the same
  * event id while it is still inside the watermark horizon.
  * `dropDuplicatesWithinWatermark` keys the state store by the id and
  * evicts entries once the watermark passes, so state is bounded by the
  * re-delivery window rather than growing with the stream (the
  * correctness/size trade every at-least-once source forces at 100 TB:
  * exact dedup forever needs unbounded state; dedup within the horizon
  * needs O(events-per-horizon)). */
object StreamDedup {

  def deduped(spark: SparkSession, inboxDir: String,
              delay: String = "10 minutes"): DataFrame =
    spark.readStream.schema(EventWindows.eventSchema).json(inboxDir)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  def drainOnce(spark: SparkSession, inboxDir: String, tableDir: String,
                checkpointDir: String): StreamingQuery = {
    Streams.drainOnce(deduped(spark, inboxDir), tableDir, checkpointDir)
  }
}
