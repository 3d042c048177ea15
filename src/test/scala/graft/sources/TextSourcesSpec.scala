package graft.sources

import graft.SparkTestBase
import java.nio.file.{Files, Paths}

/** JSONL/CSV ingest edge: schema-enforced reads round-trip the parquet
  * documents table exactly, malformed lines land in the corrupt column
  * (PERMISSIVE) or fail the read (strict), and the clean/quarantine
  * split feeds the downstream operator surface unchanged.
  */
class TextSourcesSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = Tables.load(spark, sfDir, "documents")

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)

  test("jsonl round-trips the parquet documents table") {
    val dir = Files.createTempDirectory("ts-jsonl").toString
    docs.coalesce(2).write.mode("overwrite").json(dir)
    val back = TextSources.readDocumentsJsonl(spark, dir)
    val (clean, bad) = TextSources.partitionCorrupt(back)
    assert(bad.count() == 0)
    assert(sortedRows(clean).toSeq == sortedRows(docs).toSeq)
  }

  test("csv round-trips including embedded commas and quotes") {
    val dir = Files.createTempDirectory("ts-csv").toString
    // planted rows exercise RFC-4180 quoting: commas, quotes, unicode
    val planted = Seq(
      (900001L, "hello, world with \"quotes\" and, commas", "en", "plant", 38L),
      (900002L, "tabs\tand unicode …", "de", "plant", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(planted).coalesce(2)
      .write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(dir)
    val back = TextSources.readDocumentsCsv(spark, dir)
    val (clean, bad) = TextSources.partitionCorrupt(back)
    assert(bad.count() == 0)
    assert(sortedRows(clean).toSeq ==
      sortedRows(docs.unionByName(planted)).toSeq)
  }

  test("malformed jsonl lines are quarantined, not fatal") {
    // hand-written file (not a Spark write): appending to Spark output
    // would invalidate the Hadoop .crc sidecar and fail the read on
    // checksum, not parsing
    val dir = Files.createTempDirectory("ts-bad").toString
    val good = docs.limit(10).toJSON.collect()
    Files.writeString(Paths.get(dir, "docs.json"),
      good.mkString("", "\n", "\n") +
        "{\"doc_id\": broken\nnot json at all\n")
    val (clean, bad) = TextSources.partitionCorrupt(
      TextSources.readDocumentsJsonl(spark, dir))
    assert(clean.count() == 10)
    val badLines = bad.as[String].collect().sorted
    assert(badLines.length == 2 && badLines.exists(_.contains("broken")))
    // strict mode: the same input fails the job
    intercept[org.apache.spark.SparkException] {
      TextSources.readDocumentsJsonl(spark, dir, strict = true).count()
    }
  }

  test("clean jsonl rows feed the downstream operator surface unchanged") {
    val dir = Files.createTempDirectory("ts-op").toString
    docs.coalesce(2).write.mode("overwrite").json(dir)
    val (clean, _) = TextSources.partitionCorrupt(
      TextSources.readDocumentsJsonl(spark, dir))
    // same exact-dedup fingerprints as the parquet path (the
    // dedup_exact_docs aggregation shape)
    def dedup(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(org.apache.spark.sql.functions.md5($"text").as("text_md5"))
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("keep_id"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_copies"))
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(dedup(clean).toSeq == dedup(docs).toSeq)
  }
}
