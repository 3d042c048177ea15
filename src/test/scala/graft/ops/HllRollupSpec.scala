package graft.ops

import graft.SparkTestBase

/** HLL sketch rollup: the union-of-fine-grain-sketches estimate honors
  * the ≤5% accuracy contract — now emitted as the in-query `est_ok`
  * flag the DuckDB oracle replays as literal TRUE (round 6) — the
  * rollup is deterministic across runs, and the flag is LIVE: an lgK-4
  * sketch (16 registers, rsd ≈ 26%) under a 0.1% claim must flip it
  * false. */
class HllRollupSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("daily-sketch union estimates within 5% of exact, deterministically") {
    val run1 = Analytics.hllRollup.fn(spark, dir)
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(run1.nonEmpty)
    run1.foreach { case (tpe, nDays, exact, ok) =>
      assert(nDays > 0 && exact > 0)
      assert(ok, s"$tpe: estimate outside the 5% bound of exact=$exact")
    }
    val run2 = Analytics.hllRollup.fn(spark, dir)
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(run1 === run2)
  }

  test("bound check is live: an lgK-4 sketch fails a 0.1% claim") {
    val rows = Analytics.hllRollupDf(spark, dir, lgK = 4, tolerance = 0.001)
      .select($"est_ok").as[Boolean].collect()
    assert(rows.exists(!_),
      "16-register sketch matched exact within 0.1% — check is vacuous")
  }
}
