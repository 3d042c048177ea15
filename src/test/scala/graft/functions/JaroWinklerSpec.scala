package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

/** Native Jaro-Winkler expression: textbook values, the pinned DuckDB
  * conventions (both-empty → 0, integer half-transpositions, 0.7 boost
  * threshold), null handling, and codegen placement. */
class JaroWinklerSpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerAlgo.score(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values match the classic Winkler variant") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-15)
    assert(jw("abc", "abc") === 1.0)
    // below the 0.7 boost threshold the prefix bonus must NOT apply
    assert(math.abs(jw("abcdef", "fedcba") - 0.3888888888888889) < 1e-15)
    // CRATE/TRACE: above threshold but zero common prefix — no bonus
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333333) < 1e-15)
  }

  test("pinned DuckDB conventions: empty sides score 0, including both-empty") {
    // textbook says jaro("","") = 1; DuckDB (rapidfuzz port) returns 0 and
    // cross-engine oracle parity wins — divergence documented on the kernel
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("", "a") === 0.0)
  }

  test("symmetry and range on fixture-shaped names") {
    val names = (1 to 50).map(i => f"Customer#$i%09d")
    for (a <- names.take(10); b <- names.take(10)) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s === jw(b, a))
      if (a == b) assert(s === 1.0)
    }
  }

  test("SQL name via extensions: jaro_winkler callable from spark.sql") {
    GraftExtensions.register(spark)
    val v = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS s")
      .as[Double].collect().head
    assert(math.abs(v - 0.9611111111111111) < 1e-15)
  }

  test("null input yields null") {
    val df = Seq((Some("abc"), Some("abd")), (None, Some("x")), (Some("x"), None))
      .toDF("a", "b")
      .select(Kit.jaroWinkler($"a", $"b").as("s"))
    val got = df.as[Option[Double]].collect().toSeq
    assert(got(1).isEmpty && got(2).isEmpty && got(0).nonEmpty)
  }

  test("the expression runs inside whole-stage codegen") {
    // derive strings from range() so nothing constant-folds away
    val df = spark.range(100)
      .select(concat(lit("Customer#"), lpad($"id".cast("string"), 9, "0")).as("a"),
        concat(lit("Customer#"), lpad(($"id" + 1).cast("string"), 9, "0")).as("b"))
      .select(Kit.jaroWinkler($"a", $"b").as("s"))
    assert(df.agg(sum($"s")).as[Double].collect().head > 0.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("jaro_winkler") && l.trim.startsWith("*(")), plan)
  }
}
