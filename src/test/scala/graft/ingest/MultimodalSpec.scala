package graft.ingest

import graft.SparkTestBase

/** Multimodal plumbing: typed binary rows through the partition-parallel
  * decode kernel — determinism across partitionings, batch shape, and the
  * frame-sampling fan-out. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._
  import Multimodal._

  private def media(n: Int): org.apache.spark.sql.Dataset[MediaRow] =
    (1 to n).map(i =>
      MediaRow(i.toLong, "image/fake", s"payload-$i-${"x" * i}".getBytes("UTF-8")))
      .toDS()

  test("decodeFeatures emits one typed row per item with byte metadata") {
    val out = decodeFeatures(media(5), dim = 8).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out.size == 5)
    val f1 = out(1L)
    assert(f1.n_bytes == "payload-1-x".getBytes("UTF-8").length.toLong)
    assert(f1.header_hex == "payload-".getBytes("UTF-8")
      .map(b => f"${b & 0xff}%02x").mkString)
    assert(f1.features.length == 8)
    assert(f1.features.forall(v => v >= 0f && v < 1f))
  }

  test("features are deterministic across repartitionings") {
    val a = decodeFeatures(media(20), dim = 4).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    val b = decodeFeatures(repartitionForDecode(media(20), 7), dim = 4)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a == b)
  }

  test("repartitionForDecode sets decode parallelism") {
    assert(repartitionForDecode(media(20), 7).rdd.getNumPartitions == 7)
  }

  test("frameSample fans one payload into strided frame rows") {
    val one = Seq(MediaRow(9L, "video/fake", (0 until 100).map(_.toByte).toArray))
      .toDS()
    val frames = frameSample(one, frameBytes = 10, stride = 3)
      .as[(Long, Int, Array[Byte])].collect().sortBy(_._2)
    // 10 blocks, every 3rd kept: 0,3,6,9
    assert(frames.map(_._2).toSeq == Seq(0, 3, 6, 9))
    assert(frames.head._3.toSeq == (0 until 10).map(_.toByte).toSeq)
  }

  test("fromDocuments lifts the documents fixture into typed media rows") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val ds = fromDocuments(docs)
    assert(ds.head().media_type == "text/plain")
    assert(decodeFeatures(ds.limit(3), dim = 16).count() == 3)
  }
}
