package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Native dot-product expression: parity with the higher-order
  * formulation, null handling, prefix rule, and codegen placement. */
class DotProductI64Spec extends SparkTestBase {
  import spark.implicits._

  test("SQL name via extensions: dot_i64 callable from spark.sql") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT dot_i64(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .as[Long].collect().head
    assert(viaSql === 32L)
    // builder-time hook is the same list — a fresh session constructed
    // with the extensions class resolves the function during analysis
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .getOrCreate()
    // getOrCreate may return the existing session; registration either
    // way must make the function resolvable
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT dot_i64(array(2L), array(3L)) AS d")
      .collect().head.getLong(0) === 6L)
  }

  test("matches the aggregate/zip_with formulation on random vectors") {
    val df = (1 to 100).map { i =>
      ((1 to 64).map(j => (i * 31 + j * 7 % 97).toLong),
        (1 to 64).map(j => (i * 17 + j * 13 % 89).toLong))
    }.toDF("a", "b")
    val both = df.select(
      Kit.dotI64($"a", $"b").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, v) -> s + v)")
        .as("hof"))
    assert(both.where($"native" =!= $"hof").isEmpty)
  }

  test("null input yields null; unequal lengths use the common prefix") {
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),
      (None, Some(Seq(3L, 4L))),
      (Some(Seq(1L, 2L, 100L)), Some(Seq(3L, 4L))))
      .toDF("a", "b")
      .select(Kit.dotI64($"a", $"b").as("d"))
    assert(df.as[Option[Long]].collect().toSeq ==
      Seq(Some(11L), None, Some(11L)))
  }

  test("a null ELEMENT nulls the result, matching null propagation in aggregate") {
    val df = Seq((Seq(Some(1L), None, Some(3L)), Seq(Some(4L), Some(5L), Some(6L))))
      .toDF("a", "b")
      .select(Kit.dotI64($"a", $"b").as("d"))
    assert(df.as[Option[Long]].collect().toSeq == Seq(None))
  }

  test("the expression runs inside whole-stage codegen") {
    // a literal frame would be constant-folded to a LocalTableScan, so
    // derive the arrays from range() to get a real codegen'd stage
    val df = spark.range(100)
      .select(expr("sequence(id, id + 63)").as("a"),
        expr("sequence(id + 1, id + 64)").as("b"))
      .select(Kit.dotI64($"a", $"b").as("d"))
    assert(df.agg(sum($"d")).as[Long].collect().head > 0L)
    // the "*(n)" prefix marks operators inside a whole-stage-codegen
    // stage; the projection carrying dot_i64 must be one of them (an
    // interpreted fallback would print an unstarred Project)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("dot_i64") && l.trim.startsWith("*(")), plan)
  }
}
