package graft.ops

import graft.SparkTestBase

/** Accuracy contract of the approx percentile variant vs the exact
  * sort-based percentiles: within 2% relative (±1 floor) per group. At
  * accuracy=1000 over integer-valued quantities the sketch returns an
  * actual data point adjacent to the interpolated exact value, so the
  * bound is comfortably met; it is a contract check, not a tautology —
  * lowering accuracy to ~10 breaks it. */
class ApproxPercentileSpec extends SparkTestBase {
  import spark.implicits._

  test("approx_percentile tracks exact percentiles within 2% (±1)") {
    val dir = "/root/testdata/sf0.001"
    val exact = Advanced.aggPercentiles.fn(spark, dir)
      .select($"l_returnflag", $"p50_q6", $"p90_q6")
      .as[(String, Long, Long)].collect()
      .map { case (k, p50q, p90q) => k -> (p50q / 1e6, p90q / 1e6) }.toMap
    val approx = Advanced.aggPercentilesApprox.fn(spark, dir)
      .select($"l_returnflag", $"p50_approx", $"p90_approx")
      .as[(String, Double, Double)].collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { case (k, a50, a90) =>
      val (e50, e90) = exact(k)
      assert(math.abs(a50 - e50) <= math.max(1.0, e50 * 0.02),
        s"$k p50: approx $a50 vs exact $e50")
      assert(math.abs(a90 - e90) <= math.max(1.0, e90 * 0.02),
        s"$k p90: approx $a90 vs exact $e90")
    }
  }
}
