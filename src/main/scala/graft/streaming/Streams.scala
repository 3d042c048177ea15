package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Shared drain mechanics for the streaming paths: append the stream to
  * a checkpointed parquet sink and block until `Trigger.AvailableNow`
  * has consumed everything pending (the incremental-batch deployment
  * mode). One implementation so trigger/sink changes happen in one
  * place. */
object Streams {
  def drainOnce(stream: DataFrame, tableDir: String,
                checkpointDir: String): StreamingQuery = {
    val q = stream.writeStream
      .format("parquet")
      .option("path", tableDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
