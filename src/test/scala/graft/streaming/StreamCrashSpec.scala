package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkTestBase
import graft.pipeline.{CrashHooks, SinkPolicy, Warehouse}

/** Crash-window regression pins for the streaming exactly-once landing
  * path — the in-JVM form of `scripts/stream_fault_demo.sh` (the script
  * uses a real `kill -9` of the driver; a spec simulates the same two
  * windows by throwing from [[CrashHooks]], which leaves identical
  * on-disk state: data bytes without a manifest, or a manifest without
  * an advanced checkpoint). Both recoveries must reconverge to the
  * uncrashed baseline table with no duplicate and no missing sessions.
  *
  * The after-commit case additionally pins the consume-and-skip fix:
  * recovery here happens in the SAME JVM whose state-store providers
  * are still active from the crashed run — exactly the condition under
  * which an unconsumed replay batch fails Spark 4.1's
  * STATE_STORE_COMMIT_VALIDATION_FAILED check (the kill -9 demo found
  * this: wh.load's early txn-guard return skipped the stateful
  * operator's tasks, so no state store committed the batch). */
class StreamCrashSpec extends SparkTestBase {
  import spark.implicits._

  private val NBatches = 4
  private val NUsers = 10
  private val RowsPerBatch = 300

  /** Batch b in a 5-min slot at base + b·40 min: every batch closes the
    * previous sessions of its users (40 > the 30-min session gap). */
  private def writeInbox(dir: String): Unit = {
    val inbox = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(inbox)
    val base = 1767225600000L
    for (b <- 0 until NBatches) {
      val sb = new StringBuilder
      for (i <- 0 until RowsPerBatch) {
        val ts = base + b * 40L * 60 * 1000 + (i % 300) * 1000L
        sb.append(s"""{"event_id":${b * RowsPerBatch + i},"ts":"${new java.sql.Timestamp(ts).toInstant}","user_id":${i % NUsers},"event_type":"e${i % 3}","value":1.0}""")
          .append('\n')
      }
      val f = inbox.resolve(f"b$b%05d.jsonl")
      java.nio.file.Files.write(f, sb.toString.getBytes("UTF-8"))
      // FileStreamSource orders files by MODIFICATION TIME; small files
      // written in the same millisecond would arrive in arbitrary order
      // and the watermark would drop whichever batch lands "late"
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(1767225600000L + b * 1000L))
    }
  }

  private def sessionStream(inbox: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    spark.readStream
      .schema(EventWindows.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .json(inbox)
      .withWatermark("ts", "10 minutes")
      .select($"user_id", $"ts", $"event_type").as[StatefulSessions.Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(StatefulSessions.transition)
      .toDF()
  }

  /** Crash (throw) at the given hook on the 2nd non-empty landing, then
    * recover and compare against an uncrashed baseline. */
  private def crashRecoverCompare(
      install: (() => Unit) => Unit): Unit = {
    val inbox = tmpDir("sc-inbox")
    writeInbox(inbox)
    val wh = Warehouse(spark, tmpDir("sc-wh"))
    val ckpt = tmpDir("sc-ckpt")
    val landings = new java.util.concurrent.atomic.AtomicInteger(0)
    install(() =>
      if (landings.getAndIncrement() == 1)
        throw new RuntimeException("injected crash"))
    try {
      intercept[StreamingQueryException] {
        Streams.drainInto(sessionStream(inbox), wh, "sessions",
          SinkPolicy.Append, ckpt, appId = "crash")
      }
    } finally CrashHooks.reset()
    // recovery IN THIS JVM (state stores from the crashed run are still
    // registered) — must complete, not die on commit validation
    Streams.drainInto(sessionStream(inbox), wh, "sessions",
      SinkPolicy.Append, ckpt, appId = "crash")
    val baseWh = Warehouse(spark, tmpDir("sc-base-wh"))
    Streams.drainInto(sessionStream(inbox), baseWh, "sessions",
      SinkPolicy.Append, tmpDir("sc-base-ckpt"), appId = "crash-base")
    val got = wh.read("sessions")
    val want = baseWh.read("sessions")
    assert(want.count() === NUsers.toLong * (NBatches - 1))
    assert(got.exceptAll(want).count() === 0) // no duplicated session
    assert(want.exceptAll(got).count() === 0) // no missing session
  }

  test("crash after data write, before manifest commit: recovery re-lands " +
    "the batch once (orphan bytes stay invisible)") {
    crashRecoverCompare(f => CrashHooks.beforeManifestCommit = _ => f())
  }

  test("crash after manifest commit, before checkpoint advance: recovery " +
    "consumes the replayed batch and skips the landing") {
    crashRecoverCompare(f => CrashHooks.afterCommit = _ => f())
  }
}
