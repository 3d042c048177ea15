package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join — the attribution shape (view → click within N
  * seconds) as a real two-stream join, not a batch approximation.
  *
  * Both sides carry watermarks and the join carries an explicit event-
  * time constraint; together they let Spark BOUND THE JOIN STATE: a
  * buffered view can be dropped once the click-side watermark passes
  * `view_ts + window`, a buffered click once the view-side watermark
  * passes `click_ts` — without the constraint, both sides' state grows
  * forever, which is the stream-stream join scale failure mode. State
  * lives in the state store keyed by user_id, so it shards across
  * executors like any keyed state at 100 TB.
  *
  * Inner join only: it emits as soon as both sides arrive, which
  * `Trigger.AvailableNow` drains deterministically. (Outer variants emit
  * unmatched rows only when the watermark passes — deployment-cadence
  * dependent, so they belong to a continuously-running job, not this
  * batch-drain harness.)
  */
object StreamJoin {

  /** Pair every view with the same user's clicks landing in
    * [view_ts, view_ts + windowSec]. `lateness` is the per-side
    * watermark delay (how late events may arrive and still join). */
  def viewClickJoin(views: DataFrame, clicks: DataFrame,
                    windowSec: Long,
                    lateness: String = "10 seconds"): DataFrame = {
    val v = views.withWatermark("view_ts", lateness).as("v")
    val c = clicks.withWatermark("click_ts", lateness).as("c")
    v.join(c,
        col("v.user_id") === col("c.user_id") &&
          col("c.click_ts") >= col("v.view_ts") &&
          col("c.click_ts") <= col("v.view_ts") +
            expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("v.user_id").as("user_id"),
        col("v.view_id"), col("c.click_id"),
        col("v.view_ts"), col("c.click_ts"))
  }
}
