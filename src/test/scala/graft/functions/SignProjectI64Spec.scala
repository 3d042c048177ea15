package graft.functions

import org.apache.spark.sql.{GraftExpr, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkTestBase

/** The native sign-projection expression against an independent Scala
  * reference, plus null/shape contracts and codegen placement. */
class SignProjectI64Spec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8; private val bits = 4; private val bands = 3
  private val weights = Array.tabulate(bands * bits * dim)(i =>
    ((i * 2654435761L) % 97L) - 48L)

  private def refBuckets(v: Seq[Long]): Seq[Long] = {
    val out = new Array[Long](bands)
    for (p <- 0 until bands * bits) {
      val dot = (0 until math.min(dim, v.length))
        .map(d => weights(p * dim + d) * v(d)).sum
      if (dot > 0) out(p / bits) |= 1L << (p % bits)
    }
    out.toSeq
  }

  private def run(rows: Seq[Seq[Long]]): Seq[Seq[Long]] = {
    val df = rows.map(Tuple1(_)).toDF("v")
    df.select(GraftExpr.column(SignProjectI64(
        GraftExpr.expression($"v"), weights, dim, bits)).as("b"))
      .collect().map(r => r.getSeq[Long](0)).toSeq
  }

  test("matches the per-hyperplane reference on varied vectors") {
    val vs = Seq(
      Seq.fill(dim)(0L),
      (1 to dim).map(_.toLong * 1000),
      (1 to dim).map(i => if (i % 2 == 0) -i * 500L else i * 500L),
      Seq.fill(dim)(-1L))
    assert(run(vs) == vs.map(refBuckets))
  }

  test("short vectors use their prefix; null input and null elements yield null") {
    assert(run(Seq(Seq(5L, -3L))) == Seq(refBuckets(Seq(5L, -3L))))
    val df = Seq(Tuple1(Option.empty[Seq[Long]]),
      Tuple1(Option(Seq[Long](1L, 2L)))).toDF("v")
    val out = df.select(GraftExpr.column(SignProjectI64(
        GraftExpr.expression($"v"), weights, dim, bits)).as("b"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0))
    // null ELEMENT propagates (matching dot_i64's rule)
    val withNullElem = spark.sql("SELECT array(1L, CAST(NULL AS BIGINT)) AS v")
    val o2 = withNullElem.select(GraftExpr.column(SignProjectI64(
        GraftExpr.expression(col("v")), weights, dim, bits)).as("b"))
      .collect()
    assert(o2(0).isNullAt(0))
  }

  test("stays inside whole-stage codegen over a parquet-backed scan") {
    val p = java.nio.file.Files.createTempDirectory("spj").toString
    (1 to 100).map(i => (i.toLong, (1 to dim).map(_ * i.toLong)))
      .toDF("id", "v").write.mode("overwrite").parquet(p)
    val df = spark.read.parquet(p)
      .select(GraftExpr.column(SignProjectI64(
        GraftExpr.expression(col("v")), weights, dim, bits)).as("b"))
    // `*(n)` is the whole-stage-codegen marker in the simple plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("sign_project_i64"),
      plan)
    assert(df.count() == 100)
  }
}
