package graft.ops

import graft.SparkTestBase

/** Accuracy contract of the approx distinct variant: within 5% (with a
  * ±1 floor) of the exact per-group counts. At rsd 0.05 this bound holds
  * because the fixture's per-order cardinalities are tiny (≤7), where
  * HLL++'s linear-counting regime is near-exact; for large groups 5%
  * would be a 1-sigma bound, not a guarantee — widen the tolerance if
  * the fixture ever grows high-cardinality groups. */
class RelationalApproxSpec extends SparkTestBase {
  import spark.implicits._

  test("approx_count_distinct tracks exact counts within 5%") {
    val dir = "/root/testdata/sf0.001"
    val exact = Relational.groupedCountDistinct.fn(spark, dir)
      .select($"l_orderkey", $"n_supp").as[(Long, Long)].collect().toMap
    val approx = Relational.groupedCountDistinctApprox.fn(spark, dir)
      .select($"l_orderkey", $"n_supp_approx").as[(Long, Long)].collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e) <= math.max(1L, (e * 0.05).toLong),
        s"order $k: approx $a vs exact $e")
    }
  }
}
