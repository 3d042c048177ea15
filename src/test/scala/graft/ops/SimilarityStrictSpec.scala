package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Kit

/** Planted-vector contract of the strict (production-band) embedding
  * near-dup detector: near-identical copies are found, below-threshold
  * similarity is excluded even when banding surfaces it, sign-scrambled
  * decoys never become candidates, and results are deterministic. */
class SimilarityStrictSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64

  /** Deterministic "embedding": nonzero quantized values with mixed
    * signs, seeded per id. Full splitmix64 avalanche per (seed, i) —
    * linear per-index generators produce shifted (hence correlated)
    * vectors across seeds, which this spec's decoys must not be. */
  private def vec(seed: Int): Seq[Long] =
    (0 until dim).map { i =>
      var h = seed.toLong * 0x9E3779B97F4A7C15L + i.toLong
      h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
      h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
      h = h ^ (h >>> 31)
      val v = (h % 500L)
      (if (v >= 0) v + 1 else v) * 1000L
    }

  /** Same signs, slightly different magnitudes — a re-encoded copy
    * (cos ≈ 0.999, identical sign buckets in every band). */
  private def nearCopy(u: Seq[Long]): Seq[Long] =
    u.zipWithIndex.map { case (x, i) => x + (if (i % 2 == 0) 3000L else -3000L) * (if (x > 0) 1 else -1) }

  private def frame(rows: Seq[(Long, Seq[Long])]) =
    rows.toDF("vec_id", "qe")
      .withColumn("nrm", Kit.dotI64($"qe", $"qe"))

  test("finds the planted near-identical pair with its cosine, once") {
    val u = vec(1)
    val rows = Seq(1L -> u, 2L -> nearCopy(u)) ++
      (3L to 12L).map(i => i -> vec(i.toInt * 17))
    val out = Similarity.embeddingNeardupStrictPairs(frame(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.exists { case (a, b, c) => a == 1L && b == 2L && c > 990000L },
      s"planted pair missing or low cosine: ${out.toSeq}")
  }

  test("below-threshold pairs are excluded even when a band collides") {
    val u = vec(1)
    // flip the sign structure of the back half: front bands still
    // collide (candidate), but cosine drops well below 0.90
    val far = u.zipWithIndex.map { case (x, i) => if (i >= 24) -x else x }
    val out = Similarity.embeddingNeardupStrictPairs(
      frame(Seq(1L -> u, 2L -> far))).collect()
    assert(out.isEmpty, out.toSeq.mkString(","))
  }

  test("sign-scrambled decoys produce no pairs at all") {
    val rows = (1L to 20L).map(i => i -> vec(i.toInt * 97 + 5))
    val out = Similarity.embeddingNeardupStrictPairs(frame(rows)).collect()
    // distinct seeds scramble signs; random 16-bit band collisions are
    // ~2^-16 per band — 20 vectors yield none
    assert(out.isEmpty, out.toSeq.mkString(","))
  }

  test("deterministic across runs") {
    val u = vec(2)
    val rows = Seq(1L -> u, 2L -> nearCopy(u), 3L -> vec(99))
    val a = Similarity.embeddingNeardupStrictPairs(frame(rows)).collect().toSeq
    val b = Similarity.embeddingNeardupStrictPairs(frame(rows)).collect().toSeq
    assert(a == b)
  }
}
