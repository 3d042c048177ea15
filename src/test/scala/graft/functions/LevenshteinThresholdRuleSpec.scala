package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The optimizer rewrite: naive levenshtein comparisons get the
  * thresholded early-exit form in the optimized plan, with row-identical
  * results (including nulls) across every comparison direction. */
class LevenshteinThresholdRuleSpec extends SparkTestBase {
  import spark.implicits._

  GraftExtensions.register(spark)

  private def pairs: DataFrame = Seq(
    ("kitten", "sitting"),   // dist 3
    ("flaw", "lawn"),        // dist 2
    ("abc", "abc"),          // dist 0
    ("abc", "abd"),          // dist 1
    (null, "x"), ("x", null) // null propagation
  ).toDF("a", "b")

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("lev <= k rewrites to thresholded form with identical rows") {
    // parquet-backed so ConvertToLocalRelation can't pre-evaluate the
    // filter at optimize time and hide the rewritten predicate
    val dir = tmpDir("lev-rule")
    pairs.write.mode("overwrite").parquet(dir)
    val naive = spark.read.parquet(dir)
      .where(levenshtein($"a", $"b") <= 2)
    assert(optimized(naive).contains("levenshtein(a#"), optimized(naive))
    assert(optimized(naive).contains("Some(2)) >= 0"), optimized(naive))
    assert(naive.count() === 3) // dist 0, 1, 2
  }

  test("every comparison direction agrees with the unrewritten semantics") {
    // compute expected with the threshold rule unable to fire (distance
    // projected first, compared as a plain column)
    val dist = pairs.select($"a", $"b",
      levenshtein($"a", $"b").as("d"))
    def expectCount(p: DataFrame => DataFrame, q: String): Unit = {
      val expected = p(dist).count()
      val got = pairs.where(expr(q)).count()
      assert(got === expected, s"$q: got $got expected $expected")
    }
    expectCount(_.where($"d" <= 2), "levenshtein(a, b) <= 2")
    expectCount(_.where($"d" < 2), "levenshtein(a, b) < 2")
    expectCount(_.where($"d" > 1), "levenshtein(a, b) > 1")
    expectCount(_.where($"d" >= 3), "levenshtein(a, b) >= 3")
    expectCount(_.where($"d" <= 0), "levenshtein(a, b) <= 0")
    // mirrored literal-first forms
    expectCount(_.where($"d" <= 2), "2 >= levenshtein(a, b)")
    expectCount(_.where($"d" > 1), "1 < levenshtein(a, b)")
  }

  test("already-thresholded and non-literal comparisons are left alone") {
    val manual = pairs.where(levenshtein($"a", $"b", 2) >= 0)
    assert(manual.count() === 3)
    // non-literal bound: no rewrite (would change the threshold per row)
    val dynamic = pairs
      .withColumn("k", length($"a") - 2)
      .where(levenshtein($"a", $"b") <= $"k")
    val p = optimized(dynamic)
    assert(!p.contains("), k#") || p.contains("levenshtein(a"), p)
    dynamic.count() // executes without error
  }
}
