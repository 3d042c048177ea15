package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Incremental embedding ingest: two drains over two parquet drops — the
  * second drain sees both batches in the stage table but reads ONLY the
  * new batch (no recompute of batch 1), and the quantized values match
  * the batch-side transform exactly. */
class EmbeddingStageSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, Array(i * 0.25f, -i * 0.5f, 1.0f)))
      .toDF("vec_id", "embedding")

  test("two drains: second sees both batches, reads only the new one") {
    val src = tmpDir("emb-src")
    val stage = tmpDir("emb-stage")
    val ckpt = tmpDir("emb-ckpt")

    vecs(1 to 10).write.mode("append").parquet(src)
    val q1 = EmbeddingStage.drainOnce(spark, src, stage, ckpt)
    assert(spark.read.parquet(stage).count() == 10)
    assert(q1.recentProgress.map(_.numInputRows).sum == 10)

    vecs(11 to 15).write.mode("append").parquet(src)
    val q2 = EmbeddingStage.drainOnce(spark, src, stage, ckpt)
    val back = spark.read.parquet(stage)
    assert(back.count() == 15)
    assert(back.select("vec_id").as[Long].collect().toSet == (1L to 15L).toSet)
    // exactly-once: the second drain read only batch 2's 5 rows —
    // batch 1 was not reprocessed
    assert(q2.recentProgress.map(_.numInputRows).sum == 5)
  }

  test("streamed quantization is byte-identical to the batch transform") {
    val src = tmpDir("emb2-src")
    val stage = tmpDir("emb2-stage")
    val ckpt = tmpDir("emb2-ckpt")
    val raw = vecs(1 to 8)
    raw.write.mode("append").parquet(src)
    EmbeddingStage.drainOnce(spark, src, stage, ckpt)
    val streamed = spark.read.parquet(stage)
      .select("vec_id", "qe", "nrm").as[(Long, Seq[Long], Long)]
      .collect().sortBy(_._1).toSeq
    val batch = EmbeddingStage.quantize(raw)
      .select("vec_id", "qe", "nrm").as[(Long, Seq[Long], Long)]
      .collect().sortBy(_._1).toSeq
    assert(streamed == batch)
    // spot-check the quantization contract itself: floor(0.25 * 1e6)
    assert(streamed.head._2 == Seq(250000L, -500000L, 1000000L))
  }
}
