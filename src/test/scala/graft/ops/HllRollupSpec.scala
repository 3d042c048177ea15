package graft.ops

import graft.SparkTestBase

/** HLL sketch rollup: the union-of-fine-grain-sketches estimate honors
  * the ≤5% accuracy contract against the exact count riding in the same
  * result, and the rollup is deterministic across runs. */
class HllRollupSpec extends SparkTestBase {
  import spark.implicits._

  test("daily-sketch union estimates within 5% of exact, deterministically") {
    val dir = "/root/testdata/sf0.01"
    val run1 = Analytics.hllRollup.fn(spark, dir)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run1.nonEmpty)
    run1.foreach { case (tpe, nDays, est, exact) =>
      assert(nDays > 0)
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"$tpe: est=$est exact=$exact")
    }
    val run2 = Analytics.hllRollup.fn(spark, dir)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run1 === run2)
  }
}
