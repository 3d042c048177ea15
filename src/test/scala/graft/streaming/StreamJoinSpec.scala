package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Stream-stream attribution join: clicks attach to the right views
  * within the window, cross-user and out-of-window clicks don't. */
class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val viewSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("view_id", StringType),
    StructField("view_ts", TimestampType)))
  private val clickSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("click_id", StringType),
    StructField("click_ts", TimestampType)))

  test("clicks join their user's views within the window, exactly") {
    val vSrc = tmpDir("sj-views")
    val cSrc = tmpDir("sj-clicks")
    val out = tmpDir("sj-out")
    val ckpt = tmpDir("sj-ckpt")

    Seq((1L, "v1", "2026-01-01 10:00:00"), (1L, "v2", "2026-01-01 10:20:00"),
        (2L, "v3", "2026-01-01 10:00:00"))
      .toDF("user_id", "view_id", "s")
      .withColumn("view_ts", to_timestamp($"s")).drop("s")
      .write.mode("append").parquet(vSrc)
    Seq((1L, "c1", "2026-01-01 10:00:30"),  // → v1 (30s after)
        (1L, "c2", "2026-01-01 10:25:00"),  // → v2 (300s after); v1 is >10min away
        (1L, "c3", "2026-01-01 09:59:00"),  // before any view → no match
        (3L, "c4", "2026-01-01 10:00:10"))  // user without views → no match
      .toDF("user_id", "click_id", "s")
      .withColumn("click_ts", to_timestamp($"s")).drop("s")
      .write.mode("append").parquet(cSrc)

    val joined = StreamJoin.viewClickJoin(
      spark.readStream.schema(viewSchema).parquet(vSrc),
      spark.readStream.schema(clickSchema).parquet(cSrc),
      windowSec = 600L)
    Streams.drainOnce(joined, out, ckpt)

    val got = spark.read.parquet(out)
      .select("view_id", "click_id").as[(String, String)]
      .collect().toSet
    assert(got == Set(("v1", "c1"), ("v2", "c2")))
  }
}
