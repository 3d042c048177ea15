package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.pipeline.{SinkPolicy, Warehouse}

/** Streaming → warehouse landing through the atomic manifest path: each
  * micro-batch is one txn-tagged commit, so external readers see whole
  * batches or nothing, and batch replay cannot double-land. */
class StreamLandSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("user", StringType), StructField("v", LongType)))

  test("each drained micro-batch is one txn-tagged atomic commit") {
    val src = tmpDir("sl-src")
    val ckpt = tmpDir("sl-ckpt")
    val w = Warehouse(spark, tmpDir("sl-wh"))
    def stream = spark.readStream.schema(schema).parquet(src)

    (1 to 5).map(i => (s"u$i", i.toLong)).toDF("user", "v")
      .write.mode("append").parquet(src)
    Streams.drainInto(stream, w, "t", SinkPolicy.Append, ckpt, appId = "app")
    assert(w.read("t").count() == 5)
    assert(w.history("t").flatMap(_.txnId) == Seq("app:0"))

    (6 to 8).map(i => (s"u$i", i.toLong)).toDF("user", "v")
      .write.mode("append").parquet(src)
    Streams.drainInto(stream, w, "t", SinkPolicy.Append, ckpt, appId = "app")
    assert(w.read("t").count() == 8)
    // the checkpoint advanced the batch id — two commits, two txns
    assert(w.history("t").flatMap(_.txnId) == Seq("app:0", "app:1"))

    // nothing pending: a third drain commits nothing
    Streams.drainInto(stream, w, "t", SinkPolicy.Append, ckpt, appId = "app")
    assert(w.history("t").size == 2)
  }
}
