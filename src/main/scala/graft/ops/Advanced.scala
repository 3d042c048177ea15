package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Kit
import graft.sources.Tables

/** Operators the reference never performs but a user of this engine gets
  * first-class (SURVEY §2.3/§2.4/§2.6 "absent — engine gets them free"),
  * each with an exact DuckDB oracle: ROLLUP hierarchies, proper
  * INTERSECT/EXCEPT, and an as-of join.
  */
object Advanced {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** ROLLUP over the region→nation hierarchy: per-nation, per-region
    * subtotal, grand total in one pass. Spark plans one Expand + a single
    * aggregation — no multi-query union; at scale this is 3 aggregates
    * for the price of one shuffle. */
  val rollupSales: QueryDef = QueryDef.sql(
    "rollup_sales",
    """SELECT r.r_name AS region, n.n_name AS nation,
      |  COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer c
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |JOIN region r ON r.r_regionkey = n.n_regionkey
      |GROUP BY ROLLUP (r.r_name, n.n_name)""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "customer").as("c")
      .join(broadcast(t(s, dir, "nation").as("n")),
        $"n.n_nationkey" === $"c.c_nationkey")
      .join(broadcast(t(s, dir, "region").as("r")),
        $"r.r_regionkey" === $"n.n_regionkey")
      .rollup($"r.r_name".as("region"), $"n.n_name".as("nation"))
      .agg(count(lit(1)).as("n_cust"), Kit.moneySum($"c_acctbal").as("total_bal"))
  }

  /** Proper INTERSECT / EXCEPT (distinct set semantics) over supplier vs
    * customer nations, tagged in one output so a single query exercises
    * both. */
  val intersectExcept: QueryDef = QueryDef.sql(
    "intersect_except",
    """SELECT 'both' AS side, n_nationkey FROM (
      |  SELECT c_nationkey AS n_nationkey FROM customer
      |  INTERSECT
      |  SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'cust_only' AS side, n_nationkey FROM (
      |  SELECT c_nationkey AS n_nationkey FROM customer
      |  EXCEPT
      |  SELECT s_nationkey FROM supplier)""") { (s, dir) =>
    import s.implicits._
    val c = t(s, dir, "customer").select($"c_nationkey".as("n_nationkey"))
    val sup = t(s, dir, "supplier").select($"s_nationkey".as("n_nationkey"))
    c.intersect(sup).select(lit("both").as("side"), $"n_nationkey")
      .unionByName(
        c.except(sup).select(lit("cust_only").as("side"), $"n_nationkey"))
  }

  /** As-of join: for every click, the latest view by the same user at or
    * before the click. The Spark plan is the SCALE-CORRECT formulation —
    * no join at all: union the two tagged streams, one window pass per
    * user ordered by time carries the last-seen view timestamp forward,
    * then keep clicks. One shuffle on user_id, state is one value per
    * row; a backward range join would be O(clicks × views-per-user).
    * The oracle is DuckDB's native ASOF LEFT JOIN — two engines, two
    * algorithms, must agree row-for-row. Ties (view at the click's exact
    * ts) count as "at or before", so views order before clicks within a
    * timestamp. */
  val asofClickView: QueryDef = QueryDef.sql(
    "asof_click_view",
    """SELECT c.event_id, c.user_id, c.ts, v.ts AS view_ts
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id AND v.ts <= c.ts""") { (s, dir) =>
    import s.implicits._
    val ev = t(s, dir, "events")
      .where($"event_type".isin("click", "view"))
      .select($"event_id", $"user_id", $"ts",
        ($"event_type" === "view").as("is_view"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"is_view".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("view_ts",
        last(when($"is_view", $"ts"), ignoreNulls = true).over(w))
      .where(!$"is_view")
      .select($"event_id", $"user_id", $"ts", $"view_ts")
  }

  val all: Seq[QueryDef] = Seq(rollupSales, intersectExcept, asofClickView)
}
