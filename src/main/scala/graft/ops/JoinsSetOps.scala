package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Kit
import graft.sources.Tables

/** Joins and set operations (SURVEY §2.3, §2.6): the reference's left-join
  * missing-rows detection (J1), its "new rows only" anti-join intent and
  * literal symmetric-difference behavior (J2/U3, `datasources.py:547-552`),
  * the team×year fan-out cross product (J3), union-all accumulation (U1)
  * and dedup (U2).
  *
  * Scale notes: dimension sides (customer vs orders, region) are broadcast
  * candidates — Catalyst auto-broadcasts under the 10 MB default and AQE
  * converts to broadcast at runtime when a side turns out small; the
  * fact-fact joins (orders↔lineitem) shuffle on the join key once, with
  * partial aggregation applied before the join where possible.
  */
object JoinsSetOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** J1 + F19 — left outer join with aggregate + sentinel fill: per-customer
    * order rollup, 'unavail' when the customer never ordered (the
    * reference's coalesce-to-sentinel pattern, `datasources.py:717-720`).
    *
    * Shrink-before-join: orders are pre-aggregated to one row per custkey
    * BEFORE the join, so the join shuffle carries |customers| + |custkeys|
    * rows instead of every customer×order pair — the same discipline as
    * the flagship query, and the shape that survives a 100× scale-up. */
  val leftJoinAgg: QueryDef = QueryDef.sql(
    "left_join_agg",
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
      |  COALESCE(MAX(o_orderstatus), 'unavail') AS last_status
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name""") { (s, dir) =>
    import s.implicits._
    val c = t(s, dir, "customer")
    val oagg = t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(
        count(lit(1)).as("cnt"),
        sum(Kit.money($"o_totalprice")).as("spend_dec"),
        max($"o_orderstatus").as("st"))
    c.join(oagg, c("c_custkey") === oagg("o_custkey"), "left")
      .select(
        $"c_custkey", $"c_name",
        coalesce($"cnt", lit(0L)).as("n_orders"),
        $"spend_dec".cast(DoubleType).as("total_spend"),
        Kit.unavail($"st").as("last_status"))
  }

  /** J2 (intended semantics) — "new rows only" anti-join: orders that have
    * no lineitems yet. left_anti keeps the build side small and never
    * materializes the non-matching rows. */
  val antiJoinNewRows: QueryDef = QueryDef.sql(
    "anti_join_new_rows",
    """SELECT o_orderkey, o_orderdate FROM orders o
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""") { (s, dir) =>
    import s.implicits._
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem").select($"l_orderkey")
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
      .select($"o_orderkey", $"o_orderdate")
  }

  /** Full-outer reconciliation — the audit/diff join completing the join
    * family: rows present on either side survive, tagged by which side
    * they came from. Both sides are AGGREGATED/FILTERED before the join
    * (the shuffle carries keys+one row each, like the flagship); at
    * scale this is the standard "ledger vs detail" consistency check. */
  val fullOuterReconcile: QueryDef = QueryDef.sql(
    "full_outer_reconcile",
    """WITH o AS (
      |  SELECT o_orderkey AS orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      |  FROM orders WHERE year(o_orderdate) = 1997),
      |l AS (
      |  SELECT l_orderkey AS orderkey,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT COALESCE(o.orderkey, l.orderkey) AS orderkey,
      |  o.totalprice, l.sum_qty,
      |  CASE WHEN o.orderkey IS NULL THEN 'line_only'
      |       WHEN l.orderkey IS NULL THEN 'order_only'
      |       ELSE 'both' END AS src
      |FROM o FULL OUTER JOIN l ON o.orderkey = l.orderkey""") { (s, dir) =>
    import s.implicits._
    val o = t(s, dir, "orders")
      .where(year($"o_orderdate") === 1997)
      .select($"o_orderkey".as("o_key"),
        Kit.money($"o_totalprice").cast(DoubleType).as("totalprice"))
    val l = t(s, dir, "lineitem")
      // keyed spread (Tables.loadSpread rationale): the per-order partial
      // sum otherwise runs entirely in the single-split scan task; hashing
      // by the group key keeps this at exactly one shuffle
      .repartition(s.sparkContext.defaultParallelism, $"l_orderkey")
      .groupBy($"l_orderkey".as("l_key"))
      .agg(sum(Kit.money($"l_quantity")).cast(DoubleType).as("sum_qty"))
    o.join(l, $"o_key" === $"l_key", "full_outer")
      .select(coalesce($"o_key", $"l_key").as("orderkey"),
        $"totalprice", $"sum_qty",
        when($"o_key".isNull, "line_only")
          .when($"l_key".isNull, "order_only")
          .otherwise("both").as("src"))
  }

  /** Latest-per-key dedup — the "current snapshot" operator every
    * mutable-entity feed needs (reduce an append-only history to each
    * key's newest record). Window rank partitioned BY KEY with a total
    * tie-break chain, filtered to 1: Spark plans a WindowGroupLimit
    * (per-partition top-1 heaps before the single per-key sort), so no
    * global sort and no driver involvement at any scale. */
  val latestPerKey: QueryDef = QueryDef.sql(
    "latest_per_key",
    """SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders)
      |WHERE rn = 1""") { (s, dir) =>
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderstatus")
  }

  /** Semi join — suppliers that shipped at least one line (EXISTS). */
  val semiJoinActive: QueryDef = QueryDef.sql(
    "semi_join_active",
    """SELECT s_suppkey, s_name FROM supplier s
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)""") { (s, dir) =>
    import s.implicits._
    val sup = t(s, dir, "supplier")
    val l = t(s, dir, "lineitem").select($"l_suppkey")
    sup.join(l, sup("s_suppkey") === l("l_suppkey"), "left_semi")
      .select($"s_suppkey", $"s_name")
  }

  /** U1 + U2 — union-all accumulation then distinct (the reference's
    * per-batch `pd.concat` + `drop_duplicates`, `datasources.py:276,543`):
    * every nation that has a customer or a supplier. */
  val unionDistinct: QueryDef = QueryDef.sql(
    "union_distinct",
    """SELECT DISTINCT nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nationkey FROM supplier) u""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "customer").select($"c_nationkey".as("nationkey"))
      .unionByName(t(s, dir, "supplier").select($"s_nationkey".as("nationkey")))
      .distinct()
  }

  /** U3 — the reference's literal `drop_duplicates(keep=False)` is a
    * symmetric difference (`datasources.py:547-552`, a documented latent
    * bug — SURVEY §4.1): keys on exactly one side. Here: orderkeys present
    * in orders but not lineitem, or vice versa. */
  val symmetricDifference: QueryDef = QueryDef.sql(
    "symmetric_difference",
    """SELECT orderkey FROM (
      |  SELECT orderkey FROM (
      |    SELECT DISTINCT o_orderkey AS orderkey FROM orders
      |    EXCEPT
      |    SELECT DISTINCT l_orderkey AS orderkey FROM lineitem)
      |  UNION ALL
      |  SELECT orderkey FROM (
      |    SELECT DISTINCT l_orderkey AS orderkey FROM lineitem
      |    EXCEPT
      |    SELECT DISTINCT o_orderkey AS orderkey FROM orders)) d""") { (s, dir) =>
    import s.implicits._
    // Single-pass shape: tag each side, union, one groupBy on the key —
    // keys seen on only one side have min(side)=max(side). One wide
    // shuffle (with map-side partial agg) vs the naive two-EXCEPT plan's
    // 4 scans + 2 distinct-joins.
    val a = t(s, dir, "orders").select($"o_orderkey".as("orderkey"))
      .withColumn("side", lit(0))
    val b = t(s, dir, "lineitem").select($"l_orderkey".as("orderkey"))
      .withColumn("side", lit(1))
    a.unionByName(b)
      .groupBy($"orderkey")
      .agg(min($"side").as("lo"), max($"side").as("hi"))
      .where($"lo" === $"hi")
      .select($"orderkey")
  }

  /** U2 — DISTINCT over a projection (`drop_duplicates()`,
    * `datasources.py:543`). */
  val dedupDistinct: QueryDef = QueryDef.sql(
    "dedup_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, dir) =>
    import s.implicits._
    t(s, dir, "lineitem").select($"l_returnflag", $"l_linestatus").distinct()
  }

  /** J3 — small-side cross product: region × distinct order years (the
    * reference's team×year fetch fan-out, `datasources.py:514-516`). Both
    * sides are tiny after dedup, so the cross join is broadcast-safe. */
  val crossJoinFanout: QueryDef = QueryDef.sql(
    "cross_join_fanout",
    """SELECT r_name, yr FROM region CROSS JOIN (
      |  SELECT DISTINCT EXTRACT(YEAR FROM o_orderdate) AS yr FROM orders) y""") { (s, dir) =>
    import s.implicits._
    val years = t(s, dir, "orders")
      .select(year($"o_orderdate").cast(LongType).as("yr")).distinct()
    t(s, dir, "region").select($"r_name").crossJoin(years)
  }

  /** Bag-semantics set operations — INTERSECT ALL / EXCEPT ALL preserve
    * multiplicity (a nation appearing 3× among customers and 2× among
    * suppliers intersects 2×), unlike the distinct set ops in
    * `intersect_except`. Spark plans both as multiplicity-tracking
    * aggregations, one shuffle each. */
  val bagSetOps: QueryDef = QueryDef.sql(
    "bag_set_ops",
    """SELECT 'inter_all' AS side, n_nationkey FROM (
      |  SELECT c_nationkey AS n_nationkey FROM customer WHERE c_custkey <= 200
      |  INTERSECT ALL
      |  SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'except_all' AS side, n_nationkey FROM (
      |  SELECT c_nationkey AS n_nationkey FROM customer WHERE c_custkey <= 200
      |  EXCEPT ALL
      |  SELECT s_nationkey FROM supplier)""") { (s, dir) =>
    import s.implicits._
    val c = t(s, dir, "customer").where($"c_custkey" <= 200)
      .select($"c_nationkey".as("n_nationkey"))
    val sup = t(s, dir, "supplier").select($"s_nationkey".as("n_nationkey"))
    c.intersectAll(sup).select(lit("inter_all").as("side"), $"n_nationkey")
      .unionByName(
        c.exceptAll(sup).select(lit("except_all").as("side"), $"n_nationkey"))
  }

  /** Bloom-filter semi-join reduction — the 100 TB pattern for "fact
    * table vs selective dimension": build a Bloom filter over the
    * dimension keys (one tree-aggregated job, a few KB of sketch), probe
    * it in the fact scan's filter (native codegen'd
    * [[graft.functions.BloomMightContain]]), and let the exact semi join
    * afterwards remove the fpp-bounded false positives. The fact rows
    * that fail the probe — all but ~1% of non-matching rows — never
    * reach the shuffle, so at scale the join moves |matching| + fpp·|fact|
    * rows instead of |fact|. Result is bit-identical to the plain semi
    * join (the oracle): the Bloom stage is pure pruning.
    *
    * (Spark's own runtime row-level filtering does this automatically
    * only for shuffle joins above size thresholds; building it explicitly
    * pins the plan shape and works for broadcast joins too.) */
  val bloomPruneJoin: QueryDef = QueryDef.sql(
    "bloom_prune_join",
    """SELECT l_suppkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_suppkey IN (
      |  SELECT s_suppkey FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name IN ('NATION_7', 'NATION_11'))
      |GROUP BY l_suppkey""") { (s, dir) =>
    import s.implicits._
    val dim = t(s, dir, "supplier")
      .join(
        broadcast(t(s, dir, "nation")
          .where($"n_name".isin("NATION_7", "NATION_11"))),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    // Size the sketch from the dimension itself (one extra small job —
    // the dim is the filtered supplier slice, tiny by construction): a
    // hardcoded `expected` under-sizes at larger scale factors, inflating
    // the effective fpp until the probe stops pruning. Floor of 1000
    // keeps the filter well-formed for near-empty dims.
    val expected = math.max(1000L, dim.count())
    val bloom = graft.functions.BloomMightContain.build(
      dim, "s_suppkey", expected, 0.01)
    t(s, dir, "lineitem")
      .where(Kit.bloomMightContain(bloom, $"l_suppkey"))
      .join(broadcast(dim), $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_suppkey")
      .agg(
        count(lit(1)).as("n_items"),
        Kit.moneySum($"l_extendedprice").as("revenue"))
  }

  val all: Seq[QueryDef] = Seq(
    leftJoinAgg, antiJoinNewRows, semiJoinActive, fullOuterReconcile,
    latestPerKey, unionDistinct,
    symmetricDifference, dedupDistinct, crossJoinFanout, bagSetOps,
    bloomPruneJoin)
}
