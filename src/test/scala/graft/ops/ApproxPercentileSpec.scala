package graft.ops

import graft.SparkTestBase

/** ε-rank contract of the approx percentile variant, now emitted as
  * in-query `p50_rank_ok`/`p90_rank_ok` flags (round 6: the DuckDB
  * oracle replays them as literal TRUEs, so the driver hash-checks the
  * bound). This spec proves the flag is LIVE: the registered
  * accuracy-1000 sketch honors its own ε = 1/1000 rank claim, while a
  * deliberately coarse accuracy-2 sketch under that same tight claim
  * must flip at least one flag false. */
class ApproxPercentileSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("registered config: p50/p90 points sit within rank n/1000 of target") {
    val rows = Advanced
      .percentilesApproxDf(spark, dir, sketchAccuracy = 1000,
        claimedAccuracy = 1000)
      .select($"l_returnflag", $"p50_rank_ok", $"p90_rank_ok")
      .as[(String, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    val bad = rows.filterNot(r => r._2 && r._3)
    assert(bad.isEmpty, s"rank flags false for: ${bad.toSeq}")
  }

  test("rank check is live: an accuracy-2 sketch fails the 1/1000 claim") {
    val rows = Advanced
      .percentilesApproxDf(spark, dir, sketchAccuracy = 2,
        claimedAccuracy = 1000)
      .select($"p50_rank_ok", $"p90_rank_ok")
      .as[(Boolean, Boolean)].collect()
    assert(rows.exists(r => !r._1 || !r._2),
      "accuracy-2 sketch met the 1/1000 rank claim — check is vacuous")
  }
}
