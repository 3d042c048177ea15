package graft.ops

import graft.SparkTestBase

/** Integer PageRank laws on hand-built graphs: symmetry on a 2-cycle,
  * sink dominance on a star, weight sensitivity, mass conservation
  * bound, and run-to-run determinism of the registered query. */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)],
                    rounds: Int = 10): Map[Long, Long] =
    PageRank.pageRank(edges.toDF("src", "dst", "w"), rounds = rounds)
      .as[(Long, Long)].collect().toMap

  test("two-node cycle is symmetric") {
    val r = ranks(Seq((1L, 2L, 1L), (2L, 1L, 1L)))
    assert(r(1L) === r(2L))
    // near the fixpoint of 1.0 despite truncation
    assert(r(1L) > 900000L && r(1L) <= 1000000L)
  }

  test("star center outranks leaves") {
    val r = ranks(Seq((1L, 9L, 1L), (2L, 9L, 1L), (3L, 9L, 1L)))
    assert(r(9L) > r(1L))
    assert(r(1L) === r(2L) && r(2L) === r(3L))
    // leaves receive nothing: exactly the (1-d) base
    assert(r(1L) === 150000L)
  }

  test("heavier edges carry more rank") {
    // A splits rank 9:1 between B and C
    val r = ranks(Seq((1L, 2L, 9L), (1L, 3L, 1L)))
    assert(r(2L) > r(3L))
  }

  test("total rank never exceeds N (truncation only leaks mass)") {
    val edges = (1L to 20L).map(i => (i, i % 20 + 1, (i % 3) + 1L))
    val r = ranks(edges)
    assert(r.size === 20)
    assert(r.values.sum <= 20L * 1000000L)
    assert(r.values.sum >= 20L * 150000L)
  }

  test("local fixpoint is bit-equal to the distributed loop") {
    // the r12 size gate routes small graphs to the driver-side fixpoint;
    // ranks must be IDENTICAL to the distributed rounds on the same edges
    val edges = ((1L to 40L).map(i => (i, i % 40 + 1, (i % 5) + 1L)) ++
      Seq((7L, 3L, 4L), (13L, 7L, 2L), (40L, 1L, 9L))).toDF("src", "dst", "w")
    val local = PageRank.pageRankLocal(edges, 850000L, 10)
      .as[(Long, Long)].collect().toMap
    val dist = PageRank.pageRankDistributed(edges.persist(), 850000L, 10)
      .as[(Long, Long)].collect().toMap
    assert(local === dist)
  }

  test("registered transition query is deterministic and non-empty") {
    val dir = "/root/testdata/sf0.001"
    val r1 = PageRank.pagerankTransitions.fn(spark, dir)
      .as[(String, Long)].collect().toSeq
    val r2 = PageRank.pagerankTransitions.fn(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(r1.nonEmpty && r1 === r2)
    // ranks sorted descending by construction
    assert(r1.map(_._2) === r1.map(_._2).sorted.reverse)
  }
}
