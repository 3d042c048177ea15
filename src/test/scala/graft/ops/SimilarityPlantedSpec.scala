package graft.ops

import java.nio.file.Paths

import graft.SparkTestBase

/** End-to-end planted-pair contract of the REGISTERED embedding
  * near-dup queries — strict, proj, and auto — run exactly as the
  * verification harness runs them (`QueryDef.fn` over a fixture
  * directory), on a corpus where the expected answer is non-empty.
  *
  * Why this exists (round-6 review): the driver fixture's embeddings
  * are random unit vectors, so at sf0.1 these detectors verify against
  * the oracle on ZERO rows — hash-green evidence that never exercises
  * the md5-derived projection weights, the band packing, or the
  * candidate join on a pair that should match. Here the full registered
  * pipelines must FIND planted near-identical copies (and nothing else
  * at the strict threshold) from parquet input. The cross-engine half
  * of the same check — the DuckDB oracle replay on a planted corpus —
  * runs in the stress evidence (scripts/gen_stress.py corpus through
  * Verify + selfcheck; see STRESS_r06.md). */
class SimilarityPlantedSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64

  /** Deterministic unit-ish float vector per seed (splitmix64 avalanche
    * per (seed, i) — distinct seeds give uncorrelated sign patterns). */
  private def fvec(seed: Int): Seq[Float] = {
    val raw = (0 until dim).map { i =>
      var h = seed.toLong * 0x9E3779B97F4A7C15L + i.toLong
      h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
      h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
      h = h ^ (h >>> 31)
      ((h % 1000L) + (if (h % 1000L >= 0) 1L else -1L)).toDouble
    }
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(x => (x / n).toFloat)
  }

  /** A re-encoded copy: same direction, ~2% perturbation that never
    * flips a sign (cos ≈ 0.999 — the planted-duplicate regime). */
  private def nearCopy(u: Seq[Float]): Seq[Float] =
    u.map(x => x + 0.02f * math.abs(x) * (if (x > 0) 1 else -1))

  /** Fixture dir with embeddings.parquet: planted pairs (1,2), (3,4),
    * (5,6) among 24 unrelated vectors. */
  private lazy val fixtureDir: String = {
    val dir = tmpDir("sim-planted")
    val planted = Seq(1L, 3L, 5L).flatMap { a =>
      val u = fvec(a.toInt * 31 + 7)
      Seq((a, u, 0), (a + 1, nearCopy(u), 0))
    }
    val decoys = (10L until 34L).map(i => (i, fvec(i.toInt * 97 + 5), 1))
    (planted ++ decoys).toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(Paths.get(dir, "embeddings.parquet").toString)
    dir
  }

  private val plantedPairs = Set((1L, 2L), (3L, 4L), (5L, 6L))

  private def run(q: QueryDef): Seq[(Long, Long, Long)] =
    q.fn(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("strict finds exactly the planted pairs, with near-1 cosine") {
    val out = run(Similarity.embeddingNeardupStrict)
    assert(out.map(p => (p._1, p._2)).toSet == plantedPairs, out)
    assert(out.forall(_._3 > 990000L), out)
  }

  test("proj (128 hyperplanes) finds exactly the planted pairs") {
    val out = run(Similarity.embeddingNeardupProj)
    assert(out.map(p => (p._1, p._2)).toSet == plantedPairs, out)
    assert(out.forall(_._3 > 990000L), out)
  }

  test("auto (threshold-derived geometry) finds the planted pairs; everything reported clears its verify threshold") {
    val out = run(Similarity.embeddingNeardupAuto)
    assert(plantedPairs.subsetOf(out.map(p => (p._1, p._2)).toSet), out)
    // cos ≥ 0.40 verification contract: chance-tail pairs may appear,
    // but nothing below the threshold ever does
    assert(out.forall(_._3 >= 400000L), out)
  }

  test("auto's derived geometry: the formula reproduces the hand-tuned proj config") {
    assert(Similarity.projBands(0.90, 16, 0.50) == 8)
    // the registered auto geometry: 24-bit bands, ≥99% recall at cos 0.95
    val r = Similarity.projBands(0.95, 24, 0.99)
    assert(r >= 40 && r <= 80, s"unexpected band count $r")
  }
}
