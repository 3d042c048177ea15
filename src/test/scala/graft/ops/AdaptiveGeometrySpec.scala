package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-8 adaptive geometry formulas (Similarity.adaptiveBits /
  * bitStride / ivfModulus) at the exact corpus sizes the fixtures and
  * stress corpora use — the clamp edges are the backward-compatibility
  * contract: every driver fixture scale must keep the pre-adaptive 8-bit
  * geometry (byte-identical results), and only the stress decades move.
  */
class AdaptiveGeometrySpec extends AnyFunSuite {

  test("bucket bits stay at the 8-bit floor for every fixture scale") {
    // sf0.001 / sf0.01 / sf0.1 / 10x-stress embeddings counts
    for (n <- Seq(200L, 2000L, 20000L))
      assert(Similarity.adaptiveBits(n) == 8, s"n=$n")
    // exactly at the floor boundary: n = 256 * 2^8 = 65536
    assert(Similarity.adaptiveBits(65536L) == 8)
  }

  test("bucket bits grow with the corpus and cap at 16") {
    assert(Similarity.adaptiveBits(200000L) == 10) // 100x stress corpus
    assert(Similarity.adaptiveBits(2000000L) == 13)
    assert(Similarity.adaptiveBits(1L << 30) == 16) // cap
    assert(Similarity.adaptiveBits(Long.MaxValue / 2) == 16)
  }

  test("bucket size stays near the 256 target once past the floor") {
    // inside the clamp's working range (floor 8 < bits < cap 16)
    for (n <- Seq(200000L, 2000000L, 8000000L)) {
      val buckets = 1L << Similarity.adaptiveBits(n)
      val perBucket = n.toDouble / buckets
      assert(perBucket <= 256.0 && perBucket > 64.0,
        s"n=$n buckets=$buckets perBucket=$perBucket")
    }
    // past the 16-bit cap bucket size grows again — the documented
    // tested-envelope edge (CosTopK/ann scaladoc), pinned so a future
    // cap change is a conscious decision
    assert(Similarity.adaptiveBits(20000000L) == 16)
    assert(20000000.0 / (1L << 16) > 256.0)
  }

  test("bit stride keeps planes inside the 64-dim vector") {
    for (b <- 8 to 16) {
      val st = Similarity.bitStride(b)
      assert(st * (b - 1) < 64, s"b=$b stride=$st top dim out of range")
    }
    assert(Similarity.bitStride(8) == 8) // original dims 0,8,...,56
  }

  test("ivf modulus is the ceiling square root at the fixture scales") {
    assert(Similarity.ivfModulus(200L) == 15L)
    assert(Similarity.ivfModulus(2000L) == 45L)
    assert(Similarity.ivfModulus(20000L) == 142L)
    assert(Similarity.ivfModulus(200000L) == 448L)
    // perfect square: exact root, no off-by-one from the ceil
    assert(Similarity.ivfModulus(10000L) == 100L)
  }

  test("ivf cell count and membership stay ~sqrt(n)") {
    for (n <- Seq(20000L, 200000L, 2000000L)) {
      val m = Similarity.ivfModulus(n)
      val cells = n / m // vec_id % m == 0 selects ~n/m centroids
      assert(cells <= m + 1 && cells >= m - 2,
        s"n=$n m=$m cells=$cells not ~sqrt(n)")
    }
  }
}
