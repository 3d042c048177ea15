package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulSessions

/** Streaming throughput + state-boundedness harness — the measured scale
  * point for the §2.8 surface (the specs prove semantics on small
  * fixtures; this measures sustained micro-batch rate and that watermark
  * expiry keeps stateful-session state ∝ ACTIVE KEYS, not total events).
  *
  * Feeds `nBatches` JSONL files (one per micro-batch via
  * maxFilesPerTrigger=1) of `batchRows` events over `nUsers` users into
  * [[StatefulSessions.sessions]]; batch b's events sit in a 5-minute
  * window at base + b·40 min, so every batch closes the previous
  * session of each active user (gap 40 > 30) and the watermark retires
  * its state — steady-state state rows ≈ nUsers regardless of how long
  * the stream runs. Prints one JSON line with events/s, batch-duration
  * stats, and the state-rows trajectory (max vs final).
  *
  * The optional 4th arg picks the sink: `noop` (default — isolates the
  * stateful-operator cost) or `warehouse` — every micro-batch of closed
  * sessions lands through [[graft.pipeline.Warehouse.load]]'s atomic
  * manifest commit, txn-tagged `appId:batchId` (the exactly-once landing
  * path of `Streams.drainInto`), so the delta between the two runs
  * prices exactly-once durability per micro-batch.
  *
  *   sbt 'runMain graft.StreamBench [nBatches] [batchRows] [nUsers] [sink]'
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.length > 0) args(0).toInt else 20
    val batchRows = if (args.length > 1) args(1).toInt else 50000
    val nUsers = if (args.length > 2) args(2).toInt else 10000
    val sink = if (args.length > 3) args(3) else "noop"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // recentProgress keeps only the last 100 updates by default, which
      // silently undercounts every metric below once nBatches > 100
      // (round-8 ADVICE) — retain one progress entry per micro-batch
      .config("spark.sql.streaming.numRecentProgressUpdates",
        (nBatches + 8).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("streambench")
    val inbox = work.resolve("inbox"); java.nio.file.Files.createDirectories(inbox)
    val base = 1767225600000L // 2026-01-01T00:00:00Z, deterministic
    // driver-side JSONL generation: deterministic, ~batchRows events per
    // file, event b,i → user (i % nUsers), ts inside batch b's 5-min slot
    for (b <- 0 until nBatches) {
      val sb = new StringBuilder
      var i = 0
      while (i < batchRows) {
        val ts = base + b * 40L * 60 * 1000 + (i % 300) * 1000L
        val uid = i % nUsers
        sb.append(s"""{"event_id":${b.toLong * batchRows + i},"ts":"${new java.sql.Timestamp(ts).toInstant}","user_id":$uid,"event_type":"e${i % 5}","value":${(i % 100) / 10.0}}""")
          .append('\n')
        i += 1
      }
      java.nio.file.Files.write(inbox.resolve(f"b$b%05d.jsonl"),
        sb.toString.getBytes("UTF-8"))
    }

    // same wiring as StatefulSessions.sessions, plus maxFilesPerTrigger=1
    // (a SOURCE option) so each generated file is one micro-batch
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val sessions = spark.readStream
      .schema(graft.streaming.EventWindows.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .json(inbox.toString)
      .withWatermark("ts", "10 minutes")
      .select($"user_id", $"ts", $"event_type").as[StatefulSessions.Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(StatefulSessions.transition)
    val t0 = System.nanoTime()
    val q = sink match {
      case "warehouse" =>
        val wh = graft.pipeline.Warehouse(spark, work.resolve("wh").toString)
        graft.streaming.Streams.drainInto(sessions.toDF(), wh, "sessions",
          graft.pipeline.SinkPolicy.Append,
          work.resolve("ckpt").toString, appId = "streambench")
      case _ =>
        val q0 = sessions.toDF().writeStream
          .format("noop")
          .option("checkpointLocation", work.resolve("ckpt").toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q0.awaitTermination()
        q0
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val progs = q.recentProgress.filter(_.numInputRows > 0)
    val rows = progs.map(_.numInputRows).sum
    val durs = progs.map(_.batchDuration).sorted
    val stateRows = progs.flatMap(_.stateOperators.map(_.numRowsTotal))
    // empty-progress guard (round-8 ADVICE): a run whose batches all
    // landed empty (or whose progress was dropped) must report, not throw
    if (durs.isEmpty || stateRows.isEmpty) {
      println(s"""{"batches": ${progs.length}, "events": $rows, """ +
        f""""wall_sec": $wall%.1f, "error": "no non-empty progress"}""")
      spark.stop()
      return
    }
    println(f"""{"batches": ${progs.length}, "events": $rows, """ +
      f""""wall_sec": $wall%.1f, "events_per_sec": ${rows / wall}%.0f, """ +
      f""""batch_ms_median": ${durs(durs.length / 2)}, """ +
      f""""batch_ms_max": ${durs.last}, """ +
      f""""state_rows_max": ${stateRows.max}, """ +
      f""""state_rows_final": ${stateRows.last}}""")
    spark.stop()
  }
}
