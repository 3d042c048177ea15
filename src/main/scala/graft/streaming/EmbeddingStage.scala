package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.functions.Kit

/** Incremental ingest for the similarity stage table — the streaming
  * proof of `Similarity`'s claim that the quantized form is "written
  * alongside the embeddings" at scale rather than recomputed per query.
  *
  * New embedding batches (parquet drops of `vec_id, embedding`) are
  * picked up by a file stream, quantized to the engine-parity integer
  * form (`floor(x * 1e6)` per element + int64 squared norm — exactly
  * [[graft.ops.Similarity]]'s batch-side transform), and appended to the
  * stage table under `Trigger.AvailableNow` with a checkpoint: each
  * arrival is processed EXACTLY ONCE, so landing batch N never
  * recomputes batches 1..N-1 — at 100 TB the quantize cost is paid once
  * per vector, on arrival, not once per query. */
object EmbeddingStage {

  val rawSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** The quantize transform, usable on a batch or streaming frame:
    * (vec_id, embedding) → (vec_id, qe, nrm). Mirrors
    * `Similarity.quantized` element-for-element so cosines computed off
    * the stage table are byte-identical to the batch path's. */
  def quantize(raw: DataFrame): DataFrame =
    raw.select(
      col("vec_id"),
      expr("transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("qe"))
      .withColumn("nrm", Kit.dotI64(col("qe"), col("qe")))

  /** Drain every pending embedding drop from `srcDir` into the stage
    * table at `stageDir`, incrementally. Returns the finished query (its
    * progress exposes how many rows this drain actually read — the
    * no-recompute proof point). */
  def drainOnce(spark: SparkSession, srcDir: String, stageDir: String,
                checkpointDir: String): StreamingQuery = {
    val raw = spark.readStream.schema(rawSchema).parquet(srcDir)
    Streams.drainOnce(quantize(raw), stageDir, checkpointDir)
  }
}
