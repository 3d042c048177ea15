package graft.ops

import graft.SparkTestBase

/** Accuracy contract of the approx distinct variant, now emitted as
  * in-query `supp_ok`/`part_ok` flags (round 6: the DuckDB oracle
  * replays them as literal TRUEs, so the driver hash-checks the bound).
  * This spec proves the flag is LIVE, not a tautology: the registered
  * rsd 0.05 / 5%-with-±5-floor config passes everywhere, while a
  * deliberately coarse sketch (rsd 0.39 ⇒ 16 registers) under a
  * zero-tolerance claim must flip flags false — 16-register linear
  * counting collides at per-order cardinalities up to ~13. */
class RelationalApproxSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("registered config: every group's approx is within 5% (±5) of exact") {
    val rows = Relational
      .groupedCountDistinctApproxDf(spark, dir, rsd = 0.05,
        tolerance = 0.05, floor = 5)
      .select($"l_orderkey", $"supp_ok", $"part_ok")
      .as[(Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    val bad = rows.filterNot(r => r._2 && r._3)
    assert(bad.isEmpty, s"accuracy flags false for: ${bad.take(5).toSeq}")
  }

  test("bound check is live: coarse sketch under a zero-tolerance claim fails") {
    // rsd 0.39 is the coarsest Spark admits (p=4, 16 registers); at
    // sf0.01 that sketch miscounts ~half the 15k orders by 1-6 under an
    // exact-match claim (sf0.001's 10-supplier/200-part key space repeats
    // too few hash patterns to guarantee a collision)
    val rows = Relational
      .groupedCountDistinctApproxDf(spark, "/root/testdata/sf0.01",
        rsd = 0.39, tolerance = 0.0, floor = 0)
      .select($"supp_ok", $"part_ok").as[(Boolean, Boolean)].collect()
    assert(rows.exists(r => !r._1 || !r._2),
      "rsd-0.39 HLL matched every exact count exactly — check is vacuous")
  }
}
