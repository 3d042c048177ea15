package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief / SURVEY §2.10): image/audio/
  * video content rides through the engine as an opaque `binary` column
  * with typed metadata; per-item decode / feature-extraction runs as a
  * partition-parallel kernel over a typed Dataset.
  *
  * The DECODE KERNEL IS A STUB — the real image/audio codecs are not in
  * this container (brief: "STUB the decode step ... make the Spark-side
  * plumbing real"). [[StubCodec]] produces deterministic fake features
  * from the bytes, so every piece of real plumbing — binary schema,
  * `mapPartitions` batch shape, per-partition codec init, partitioning
  * for decode parallelism, typed output schema — is exercised and tested
  * end-to-end. Swapping in a real codec changes one object.
  *
  * Scale notes: decode parallelism = partition count of the input
  * (`repartitionForDecode`); the kernel is `mapPartitions`, so per-
  * partition setup (codec contexts, model weights) is paid once per task,
  * not per row — the same reason the reference batches its fetch loops.
  */
object Multimodal {

  /** One media item: opaque bytes + declared type, keyed like documents. */
  final case class MediaRow(doc_id: Long, media_type: String,
                            content: Array[Byte])

  /** Typed decode output: byte metadata + fixed-dim feature vector. */
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Long, header_hex: String,
                                 features: Array[Float])

  /** A per-partition decode kernel: opened once per task. */
  trait Codec extends Serializable {
    def open(): Unit
    def decode(row: MediaRow, dim: Int): Array[Float]
  }

  /** ??? REAL DECODE GOES HERE ??? — deterministic stand-in: features are
    * a rolling byte hash folded into [0,1), so outputs are reproducible
    * across partitionings and runs (decode must be a pure function of the
    * bytes or re-runs corrupt downstream dedup). */
  object StubCodec extends Codec {
    def open(): Unit = ()
    def decode(row: MediaRow, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L // FNV-ish seed
      var i = 0
      while (i < row.content.length) {
        h = h * 31 + (row.content(i) & 0xff)
        val slot = i % dim
        out(slot) = (((h >>> 11) & 0xffffff).toFloat / (1 << 24))
        i += 1
      }
      out
    }
  }

  /** Spread items across `n` tasks for decode. Binary payloads skew (one
    * 4 GB video vs thousands of thumbnails) — keying the repartition by
    * doc_id spreads items uniformly rather than by arrival file. */
  def repartitionForDecode(ds: Dataset[MediaRow], n: Int): Dataset[MediaRow] =
    ds.repartition(n, col("doc_id"))

  /** The decode stage: partition-parallel, codec opened once per task,
    * one typed row out per item in. */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int,
                     codec: Codec = StubCodec): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      codec.open()
      it.map { row =>
        val bytes = row.content
        val header = bytes.take(8).map(b => f"${b & 0xff}%02x").mkString
        MediaFeatures(row.doc_id, row.media_type, bytes.length.toLong,
          header, codec.decode(row, dim))
      }
    }
  }

  /** Frame-sampling shape for video-like payloads: every `stride`-th
    * fixed-size block as one "frame" row (doc_id, frame_no, frame bytes).
    * With a real demuxer the block slicing becomes keyframe extraction;
    * the fan-out shape (one row in → many typed rows out, flatMap) is the
    * production plumbing. */
  def frameSample(ds: Dataset[MediaRow], frameBytes: Int,
                  stride: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { row =>
      row.content.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) => (row.doc_id, i, chunk) }
    }.toDF("doc_id", "frame_no", "frame")
  }

  /** Build a media Dataset from the documents fixture (text bytes as the
    * opaque payload — the schema/partitioning stand-in for real blobs). */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("content")).as[MediaRow]
  }
}
