package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Stream-static enrichment: dimension attributes attach per micro-batch,
  * unknown keys survive with nulls, and a dimension refresh between
  * drains is visible to the next drain without restarting. */
class StreamEnrichSpec extends SparkTestBase {
  import spark.implicits._

  private val factSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("event", StringType)))

  test("facts enrich against the dim; unknown keys pass through with nulls") {
    val src = tmpDir("se-src")
    val out = tmpDir("se-out")
    val ckpt = tmpDir("se-ckpt")
    val dimDir = tmpDir("se-dim")

    Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
      .write.mode("overwrite").parquet(dimDir)
    Seq((1L, "click"), (3L, "view")).toDF("user_id", "event")
      .write.mode("append").parquet(src)

    val dim = spark.read.parquet(dimDir)
    val enriched = StreamEnrich.enrich(
      spark.readStream.schema(factSchema).parquet(src), dim, "user_id")
    Streams.drainOnce(enriched, out, ckpt)

    val got = spark.read.parquet(out)
      .select($"user_id", $"event", $"tier")
      .as[(Long, String, Option[String])].collect().toSet
    assert(got == Set(
      (1L, "click", Some("gold")),
      (3L, "view", None)))
  }

  test("a dimension refresh is visible to the next micro-batch") {
    val src = tmpDir("se2-src")
    val out = tmpDir("se2-out")
    val ckpt = tmpDir("se2-ckpt")
    val dimDir = tmpDir("se2-dim")

    Seq((1L, "gold")).toDF("user_id", "tier")
      .write.mode("overwrite").parquet(dimDir)
    Seq((1L, "click")).toDF("user_id", "event")
      .write.mode("append").parquet(src)

    // deployment shape: each AvailableNow run re-resolves the static
    // side (a path-pinned frame would read the OLD file listing)
    val stream = spark.readStream.schema(factSchema).parquet(src)
    Streams.drainOnce(StreamEnrich.enrich(
      stream, spark.read.parquet(dimDir), "user_id"), out, ckpt)

    // refresh the dimension snapshot AND land a new fact
    Seq((1L, "platinum")).toDF("user_id", "tier")
      .write.mode("overwrite").parquet(dimDir)
    Seq((1L, "buy")).toDF("user_id", "event")
      .write.mode("append").parquet(src)
    Streams.drainOnce(StreamEnrich.enrich(
      stream, spark.read.parquet(dimDir), "user_id"), out, ckpt)

    val got = spark.read.parquet(out)
      .select($"event", $"tier").as[(String, String)].collect().toSet
    // batch 1 saw gold; batch 2 re-planned the static side and saw platinum
    assert(got == Set(("click", "gold"), ("buy", "platinum")))
  }
}
