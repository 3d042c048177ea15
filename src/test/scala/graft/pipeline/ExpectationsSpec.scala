package graft.pipeline

import graft.SparkTestBase

/** One-pass data-quality expectations: per-rule violation counts,
  * uniqueness folded into the same aggregate, and the pass/fail gate. */
class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._
  import Expectations._

  private val batch = Seq(
    (1, Some("30301"), 0.5),
    (2, Some("3030x"), 1.5),   // bad zip format, out of range
    (3, None, 0.7),            // null zip
    (3, Some("30060"), 0.2))   // duplicate id
    .toDF("id", "zip", "score")

  test("check counts violations per rule in one pass") {
    val report = check(batch, Seq(
      NotNull("zip"),
      Matches("zip", "^[0-9]{5}$"),
      InRange("score", 0.0, 1.0),
      Holds("positive_id", $"id" > 0),
      Unique("id")))
    assert(report("rows") == 4L)
    assert(report("not_null(zip)") == 1L)
    assert(report("matches(zip)") == 1L)
    assert(report("in_range(score,0.0,1.0)") == 1L)
    assert(report("positive_id") == 0L)
    assert(report("unique(id)") == 1L)
  }

  test("pass gates a pipeline load") {
    assert(!pass(batch, Seq(NotNull("zip"))))
    val clean = batch.where($"zip".isNotNull && $"score" <= 1.0)
      .dropDuplicates("id")
    assert(pass(clean, Seq(NotNull("zip"), InRange("score", 0.0, 1.0),
      Unique("id"))))
  }

  test("an empty batch passes vacuously with zero rows") {
    val empty = batch.limit(0)
    val report = check(empty, Seq(NotNull("zip"), Unique("id")))
    assert(report("rows") == 0L && report("not_null(zip)") == 0L &&
      report("unique(id)") == 0L)
    assert(pass(empty, Seq(NotNull("zip"), Unique("id"))))
  }

  test("Holds treats a null predicate result as a violation") {
    val df = Seq(Some(5), None).toDF("v")
    val report = check(df, Seq(Holds("v_positive", $"v" > 0)))
    assert(report("v_positive") == 1L) // the NULL row is not proven
  }

  test("Unique counts NULL keys as equal (two null ids = one duplicate)") {
    val df = Seq(Some(1), None, None).toDF("id")
    val report = check(df, Seq(Unique("id")))
    assert(report("unique(id)") == 1L)
  }

  test("multiple Unique rules still evaluate in one job") {
    val df = Seq((1, "a"), (1, "b"), (2, "a")).toDF("id", "name")
    val report = check(df, Seq(Unique("id"), Unique("name"),
      Unique("id", "name"), NotNull("name")))
    assert(report("unique(id)") == 1L)
    assert(report("unique(name)") == 1L)
    assert(report("unique(id,name)") == 0L)
    assert(report("not_null(name)") == 0L)
  }
}
