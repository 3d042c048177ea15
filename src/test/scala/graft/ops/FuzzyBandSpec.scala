package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Behavioral proof of the banded fuzzy-entity production form — the
  * oracle harness proves Spark==DuckDB on the registered query; this
  * pins the properties the hash check can't see: the plants are
  * actually RECOVERED (banding recall ≥ the designed ~90% floor, not
  * just "both sides agree on some set"), precision is exact by
  * construction, and the candidate volume scales with the corpus, not
  * its square — the claim that makes this the 100 TB form while the
  * nation-blocked exact queries stay designated baselines. */
class FuzzyBandSpec extends SparkTestBase {
  import spark.implicits._

  private def plantsAt(dir: String): (Long, Long, Long) = {
    val out = FuzzyBand.fuzzyBandedEntities.fn(spark, dir)
      .select($"key_a", $"key_b").as[(Long, Long)].collect()
    val names = spark.read.parquet(s"$dir/customer.parquet")
      .where($"c_custkey" % 10 === 0).count()
    // a plant pair is (k, k + 1e8); anything else would be a random
    // md5 collision at JW >= 0.95 — none exist at fixture scale
    val planted = out.count { case (a, b) => b == a + 100000000L }
    (names, planted, out.length.toLong)
  }

  test("plants are recovered at the designed recall floor, nothing else fires") {
    // floor at sf0.01: 150 plants is enough statistics for the J^4
    // model's ~90% (measured 90.2% over 10k plants in DuckDB, round
    // 12); sf0.001's 15 specific ids deterministically recover 9 — a
    // frozen small-sample draw, not a meaningful floor
    val (plants, recovered, total) = plantsAt("/root/testdata/sf0.01")
    assert(plants > 0)
    assert(total == recovered, s"non-plant pairs fired: ${total - recovered}")
    // 1-char-edit plants have gram-Jaccard ~0.82 -> per-band J^4 ~ 0.45
    // with INDEPENDENT per-slot hashes -> >= 1-of-4 collision ~ 0.9; a
    // banding/hashing regression that halves recall fails here
    assert(recovered >= (plants * 7) / 10,
      s"recovered $recovered of $plants plants")
    // precision is exact at the small scale too
    val (p1, r1, t1) = plantsAt("/root/testdata/sf0.001")
    assert(p1 > 0 && t1 == r1, s"non-plant pairs fired at sf0.001: ${t1 - r1}")
  }

  test("candidate volume is linear in the corpus on the planted-name fixture") {
    def candidates(dir: String): (Long, Long) = {
      val names = FuzzyBand.plantedNames(spark, dir).persist()
      try {
        val n = names.count()
        val bands = FuzzyBand.nameBands(names).persist()
        try (n, BandJoin.selfCandidates(bands).count())
        finally { bands.unpersist(); () }
      } finally { names.unpersist(); () }
    }
    val (n1, c1) = candidates("/root/testdata/sf0.001")
    val (n2, c2) = candidates("/root/testdata/sf0.01")
    // 10x the names -> ~10x the candidates (plants dominate; random
    // hex pairs collide at ~J^4 ~ 1e-10/band). A quadratic detector
    // would show ~100x here.
    assert(n2 > 8 * n1)
    assert(c1 > 0)
    assert(c2 <= 20 * c1,
      s"candidates grew superlinearly: $c1 at $n1 names, $c2 at $n2")
    // and the candidate counts sit at plant scale, not pair scale
    assert(c2 < n2, s"candidate volume $c2 not O(n) for $n2 names")
  }
}
