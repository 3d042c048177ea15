package graft.streaming

import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.pipeline.{TxnLog, Warehouse}

/** APPLY CHANGES into the warehouse: streamed keyed updates merge
  * latest-wins per key across AND within micro-batches, txn-tagged so a
  * replayed batch cannot burn versions. */
class StreamUpsertSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType),
    StructField("seq", LongType)))

  test("streamed updates merge latest-wins across drains") {
    val src = tmpDir("su-src")
    val ckpt = tmpDir("su-ckpt")
    val w = Warehouse(spark, tmpDir("su-wh"))
    def stream = spark.readStream.schema(schema).parquet(src)

    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "seq")
      .write.mode("append").parquet(src)
    Streams.drainUpsert(stream, w, "state", Seq("k"), ckpt, "app")
    assert(w.read("state").select("k", "v").as[(Long, String)]
      .collect().toMap === Map(1L -> "a", 2L -> "b"))

    // second drain updates key 1, inserts key 3
    Seq((1L, "a2", 2L), (3L, "c", 1L)).toDF("k", "v", "seq")
      .write.mode("append").parquet(src)
    Streams.drainUpsert(stream, w, "state", Seq("k"), ckpt, "app")
    assert(w.read("state").select("k", "v").as[(Long, String)]
      .collect().toMap === Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    // one txn-tagged commit per drained batch
    assert(w.history("state").flatMap(_.txnId) === Seq("app:0", "app:1"))
  }

  test("seqCol reduces multi-update batches to the within-batch latest") {
    val src = tmpDir("su2-src")
    val ckpt = tmpDir("su2-ckpt")
    val w = Warehouse(spark, tmpDir("su2-wh"))
    def stream = spark.readStream.schema(schema).parquet(src)

    // one batch carries three updates for key 1 — highest seq must win
    Seq((1L, "stale", 1L), (1L, "mid", 2L), (1L, "final", 3L),
      (2L, "x", 1L)).toDF("k", "v", "seq")
      .write.mode("append").parquet(src)
    Streams.drainUpsert(stream, w, "state", Seq("k"), ckpt, "app",
      seqCol = Some("seq"))
    assert(w.read("state").select("k", "v").as[(Long, String)]
      .collect().toMap === Map(1L -> "final", 2L -> "x"))
  }

  test("a replayed micro-batch is recognized and skipped") {
    val src = tmpDir("su3-src")
    val w = Warehouse(spark, tmpDir("su3-wh"))
    def stream = spark.readStream.schema(schema).parquet(src)

    Seq((1L, "a", 1L)).toDF("k", "v", "seq")
      .write.mode("append").parquet(src)
    Streams.drainUpsert(stream, w, "state", Seq("k"), tmpDir("su3-c1"), "app")
    val vBefore = TxnLog.current(
      java.nio.file.Paths.get(w.root, "state")).get.version
    // fresh checkpoint replays batch 0 with the same app id → same txn tag
    Streams.drainUpsert(stream, w, "state", Seq("k"), tmpDir("su3-c2"), "app")
    val vAfter = TxnLog.current(
      java.nio.file.Paths.get(w.root, "state")).get.version
    assert(vAfter === vBefore, "replayed batch must not burn a version")
  }
}
