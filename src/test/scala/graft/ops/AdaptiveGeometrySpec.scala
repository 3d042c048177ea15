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

  test("ceilLog2 is exact at power-of-two boundaries") {
    assert(Similarity.ceilLog2(1L) == 0)
    assert(Similarity.ceilLog2(2L) == 1)
    assert(Similarity.ceilLog2(65535L) == 16)
    assert(Similarity.ceilLog2(65536L) == 16) // 2^16 exactly: ⌈log₂⌉ = 16
    assert(Similarity.ceilLog2(65537L) == 17)
    assert(Similarity.ceilLog2(1L << 40) == 40)
    assert(Similarity.ceilLog2((1L << 40) + 1) == 41)
  }

  test("projection geometry floors at the hand-tuned (8,16) for fixtures") {
    // driver fixtures (with planted copies: n ≈ 2054 at sf0.01) clamp
    // to the proj geometry — results byte-identical to
    // embedding_neardup_planted at every driver scale
    for (n <- Seq(254L, 2054L, 20540L, 204803L))
      assert(Similarity.adaptiveProjGeometry(n) == ((8, 16)), s"n=$n")
    // the 100× stress corpus (n = 205,406 with planted copies) sits
    // just PAST the boundary — the in-protocol 100× run measures a
    // genuinely different geometry, not the floor
    assert(Similarity.adaptiveProjGeometry(205406L) ==
      ((Similarity.projBands(0.90, 17, 0.50), 17)))
  }

  test("projection band width grows ~log2(n) and recall is re-bought") {
    // boundary: bits move to 17 once n·8//25 crosses 2^16 (integer
    // division: the smallest such n is ⌈65537·25/8⌉ = 204804)
    assert(Similarity.adaptiveProjGeometry(204803L) == ((8, 16)))
    val (r17, b17) = Similarity.adaptiveProjGeometry(204804L)
    assert(b17 == 17 && r17 == Similarity.projBands(0.90, 17, 0.50))
    val (r19, b19) = Similarity.adaptiveProjGeometry(1030000L) // ~500× corpus
    assert(b19 == 19 && r19 == Similarity.projBands(0.90, 19, 0.50))
    // R grows with B (the S-curve price of wider bands) but stays ≤ 99
    val rs = (16 to 32).map(Similarity.projBands(0.90, _, 0.50))
    assert(rs == rs.sorted && rs.head == 8 && rs.last <= 99,
      s"R table $rs")
    // cap: any astronomically large corpus stays inside the oracle's
    // 99 × 32 embedded hyperplane table
    val (rCap, bCap) = Similarity.adaptiveProjGeometry(Long.MaxValue / 16)
    assert(bCap == 32 && rCap == Similarity.projBands(0.90, 32, 0.50))
  }

  test("random-collision budget tracks R·25/8, not n (the §9.6 point)") {
    // expected random collisions per vector: n·R/2^B. The rule keeps
    // 2^B ≥ n·8/25, so perVec ≤ R·25/8 — it grows only with R (∝
    // n^0.22 via the S-curve), never with n directly. The fixed 16-bit
    // geometry's perVec would be n·R/2^16 — linear in n.
    for (n <- Seq(300000L, 1000000L, 10000000L, 100000000L)) {
      val (r, b) = Similarity.adaptiveProjGeometry(n)
      val perVec = n.toDouble * r / math.pow(2, b)
      assert(perVec <= r * 25.0 / 8.0 + 1e-9,
        s"n=$n geo=($r,$b) perVec=$perVec")
      val fixedPerVec = n.toDouble * 8 / 65536.0
      assert(n <= 500000L || perVec < fixedPerVec,
        s"n=$n adaptive $perVec not below fixed-16 $fixedPerVec")
    }
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
