package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Kit
import graft.sources.Tables

/** Relational core (SURVEY §2.2–§2.6): every projection/filter/join/agg/
  * set-op the reference performs through embedded BigQuery SQL or pandas,
  * re-expressed as declarative DataFrame plans so Catalyst owns pushdown,
  * join selection (broadcast vs shuffle), and partial aggregation.
  *
  * Scale stance: all queries are shuffle-minimal — aggregates rely on
  * map-side partial aggregation, small dimensions are broadcast, and no
  * query collects to the driver or sorts a large intermediate.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Flagship (SURVEY §7 slice; reference `datasources.py:627-647`):
    * grouped COUNT(DISTINCT) CTE, left join USING key, null-aware filter —
    * "orders with fewer than 2 distinct suppliers or none". At scale the
    * aggregate side is pre-shrunk before the join (group first, join
    * after), so the shuffle carries one row per key, not per lineitem.
    */
  val flagshipMissingStats: QueryDef = QueryDef.sql(
    "flagship_missing_stats",
    """SELECT o_orderkey, o_orderdate, o_orderstatus, cntcheck
      |FROM orders LEFT JOIN (
      |  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS cntcheck
      |  FROM lineitem GROUP BY 1
      |) s ON o_orderkey = s.l_orderkey
      |WHERE cntcheck < 2 OR cntcheck IS NULL""") { (s, dir) =>
    import s.implicits._
    val orders = t(s, dir, "orders")
    val cnts = t(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(countDistinct($"l_suppkey").as("cntcheck"))
    orders
      .join(cnts, orders("o_orderkey") === cnts("l_orderkey"), "left")
      .where($"cntcheck" < 2 || $"cntcheck".isNull)
      .select($"o_orderkey", $"o_orderdate", $"o_orderstatus", $"cntcheck")
  }

  /** TPC-H-Q1-shaped pricing summary — the canonical wide aggregate. All
    * money math in DECIMAL(…,2) (lossless on the 2-dp fixtures, associative
    * → order-independent across 1000 executors), surfaced as double.
    */
  val q1PricingSummary: QueryDef = QueryDef.sql(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""") { (s, dir) =>
    import s.implicits._
    val m12 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(12, 2))
    // spread: 4 result groups means the decimal-heavy partial aggregate is
    // 99.99% of the work, and it runs in the scan task — ONE task on a
    // single-split fixture file (Tables.loadSpread rationale)
    Tables.loadSpread(s, dir, "lineitem")
      .where($"l_shipdate" <= lit("2000-12-01 00:00:00").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast(DoubleType).as("sum_qty"),
        Kit.moneySum($"l_extendedprice").as("sum_base_price"),
        sum(m12($"l_extendedprice") * m12(lit(1) - $"l_discount"))
          .cast(DoubleType).as("sum_disc_price"),
        sum(m12($"l_extendedprice") * m12(lit(1) - $"l_discount") *
            (lit(1) + $"l_tax").cast(DecimalType(8, 2)))
          .cast(DoubleType).as("sum_charge"),
        (sum($"l_quantity").cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(Kit.money($"l_extendedprice")).cast(DoubleType) / count(lit(1)))
          .as("avg_price"),
        (sum(Kit.money($"l_discount")).cast(DoubleType) / count(lit(1)))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** S2/P1/P2 — projected + filtered scan (reference `datasources.py:171-174`
    * `SELECT ZIP_Code FROM US_Zips_Counties WHERE State=…`). Both the
    * predicate and the 3-column projection reach the parquet scan
    * (PushedFilters / ReadSchema), so at 100 TB only the needed column
    * chunks are read. */
  val scanFilterProject: QueryDef = QueryDef.sql(
    "scan_filter_project",
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_mktsegment = 'BUILDING'""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "customer")
      .where($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_name", $"c_acctbal")
  }

  /** P3 — IN-list predicate (`WHERE YEAR IN {...}`, `datasources.py:548`). */
  val filterInList: QueryDef = QueryDef.sql(
    "filter_in_list",
    """SELECT o_orderkey, o_orderpriority FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "orders")
      .where($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .select($"o_orderkey", $"o_orderpriority")
  }

  /** P4/F15 — date-part predicate (`EXTRACT(MONTH FROM Date) = m`,
    * `datasources.py:159`). */
  val filterDatePart: QueryDef = QueryDef.sql(
    "filter_date_part",
    """SELECT o_orderkey, o_orderdate FROM orders
      |WHERE EXTRACT(MONTH FROM o_orderdate) = 3
      |  AND EXTRACT(YEAR FROM o_orderdate) = 1997""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "orders")
      .where(month($"o_orderdate") === 3 && year($"o_orderdate") === 1997)
      .select($"o_orderkey", $"o_orderdate")
  }

  /** A1 — scalar MAX watermark (`SELECT MAX(Date) AS dt`,
    * `datasources.py:140-143`). Partial+final agg; one row out. */
  val watermarkMaxDate: QueryDef = QueryDef.sql(
    "watermark_max_date",
    """SELECT MAX(o_orderdate) AS last_pull,
      |  EXTRACT(YEAR FROM MAX(o_orderdate)) AS last_year,
      |  EXTRACT(MONTH FROM MAX(o_orderdate)) AS last_month
      |FROM orders""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "orders").agg(
      max($"o_orderdate").as("last_pull"),
      year(max($"o_orderdate")).cast(LongType).as("last_year"),
      month(max($"o_orderdate")).cast(LongType).as("last_month"))
  }

  /** A2/F18 — filtered COUNT(*) + budget arithmetic (the 1M-request gate,
    * `datasources.py:159-167`: `1000000 - cnt - len(zips)`). */
  val budgetCheck: QueryDef = QueryDef.sql(
    "budget_check",
    """SELECT COUNT(*) AS pulls_this_month,
      |  1000000 - COUNT(*) - 42 AS budget_left
      |FROM orders
      |WHERE EXTRACT(MONTH FROM o_orderdate) = 6""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "orders")
      .where(month($"o_orderdate") === 6)
      .agg(count(lit(1)).as("pulls_this_month"),
        (lit(1000000L) - count(lit(1)) - lit(42L)).as("budget_left"))
  }

  /** A3 — grouped COUNT(DISTINCT) standalone (`datasources.py:628-634`).
    * Spark plans this as expand + two-phase hash agg; at 100 TB swap in
    * approx_count_distinct when exactness isn't contractual. */
  val groupedCountDistinct: QueryDef = QueryDef.sql(
    "grouped_count_distinct",
    """SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_lines
      |FROM lineitem GROUP BY l_orderkey""") { (s, dir) =>
    import s.implicits._
    // Dedup-branch formulation instead of Catalyst's multi-distinct
    // rewrite (guide §2.3/§2.4): two countDistincts in one groupBy plan
    // as Expand(×3) — 1.8M expanded rows through a (key, value, gid)
    // dedup exchange that no input partitioning can satisfy, THEN a
    // final exchange on the key. Splitting each distinct into its own
    // groupBy((key, value)) → groupBy(key) branch removes the Expand
    // and every post-spread exchange: hash(l_orderkey) satisfies the
    // clustered distribution of BOTH aggregation levels and of the
    // branch join (the key is a subset of each grouping), and the two
    // branches reuse the one spread shuffle (ReuseExchange). count(col)
    // over the (key, value) groups counts non-null values = COUNT
    // (DISTINCT col) exactly; n_lines rides the supp branch as a
    // sum-of-group-counts. Measured (MiniProbe, warm, same window):
    // 1.30 s → 0.68 s; the spread itself was the round-6 win (the
    // Expand otherwise ran inside the one-split scan task).
    val spread = t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_partkey")
      .repartition(s.sparkContext.defaultParallelism, $"l_orderkey")
    val supp = spread.groupBy($"l_orderkey", $"l_suppkey")
      .agg(count(lit(1)).as("c"))
      .groupBy($"l_orderkey")
      .agg(count($"l_suppkey").as("n_supp"), sum($"c").as("n_lines"))
    val part = spread.groupBy($"l_orderkey", $"l_partkey")
      .agg(count(lit(1)).as("cp"))
      .groupBy($"l_orderkey").agg(count($"l_partkey").as("n_part"))
    supp.join(part, Seq("l_orderkey"))
      .select($"l_orderkey", $"n_supp", $"n_part", $"n_lines")
  }

  /** S14 — the fire-and-forget SQL task (`Query.run()`,
    * `datasources.py:86-99`): arbitrary warehouse SQL executed as-is. The
    * engine registers every fixture table as a view and hands the text to
    * `spark.sql`, so the whole relational surface is reachable through
    * raw SQL too — same Catalyst plan as the DataFrame form (this body is
    * byte-identical to the oracle's). Unlike the reference, execution is
    * synchronous and errors surface (SURVEY §4.1). */
  val sqlTask: QueryDef = {
    val body =
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order
        |FROM orders GROUP BY o_orderpriority""".stripMargin
    QueryDef.sql("sql_task", body) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(body)
    }
  }

  /** Shared pipeline for [[groupedCountDistinctApprox]], parameterized so
    * the spec can prove the bound check is live (coarse `rsd` under a
    * zero-`tolerance` claim must flip flags false). `supp_ok`/`part_ok`
    * hold iff |approx − exact| ≤ max(floor, ⌈tolerance·exact⌉) per
    * group — exact counts ride along (the self-auditing pattern
    * `hll_rollup` established), so the DuckDB oracle is just the exact
    * side plus literal TRUEs and the driver's hash compare becomes a
    * machine-checked accuracy bound instead of a rows-only count. */
  def groupedCountDistinctApproxDf(s: SparkSession, dir: String,
      rsd: Double, tolerance: Double, floor: Int): DataFrame = {
    import s.implicits._
    def ok(approx: Column, exact: Column): Column =
      abs(approx - exact) <= greatest(lit(floor.toLong), ceil(exact * tolerance))
    // keyed spread: see groupedCountDistinct — sketch building runs
    // post-shuffle at full width (the aggs' required distribution IS
    // l_orderkey, so both aggregates below ride the spread's partitioning
    // with no further exchange). HLL register-merge is max() —
    // order-independent, so the flags are deterministic under any
    // partitioning.
    //
    // The exact distincts and the sketches are SEPARATE aggregations,
    // deliberately: fused into one groupBy, Catalyst's multi-distinct
    // rewrite (Expand + re-aggregate) attaches the ~0.5 KB-per-sketch
    // HLL buffers to every EXPANDED group — (l_orderkey, distinct-value)
    // pairs, ~3× input rows — inflating aggregation state from
    // #groups × sketch to #input-rows × sketch (~2 GB at sf0.1).
    // Measured consequence under a squeezed pool (verify_constrained):
    // hundreds of tiny spill files per task, and the sort-based merge
    // then OOMs the JVM on its per-file read-ahead buffers — 2 MB of
    // UNMANAGED heap each, all open at once — before any managed
    // allocation can spill. Split, the sketch aggregate holds one buffer
    // per FINAL group and the exact aggregate's expanded state is bare
    // keys; the join is co-partitioned on l_orderkey (zero added
    // exchange — both sides reuse the spread). At 100 TB the same rule
    // holds: never put per-group sketch state behind a distinct-rewrite
    // Expand.
    val spread = t(s, dir, "lineitem")
      .repartition(s.sparkContext.defaultParallelism, $"l_orderkey")
    // exact side: dedup-branch formulation (see groupedCountDistinct —
    // no Expand, and every aggregation level + the joins below ride the
    // spread's hash(l_orderkey) distribution with zero added exchange)
    val supp = spread.groupBy($"l_orderkey", $"l_suppkey")
      .agg(count(lit(1)).as("c"))
      .groupBy($"l_orderkey")
      .agg(count($"l_suppkey").as("n_supp"), sum($"c").as("n_lines"))
    val part = spread.groupBy($"l_orderkey", $"l_partkey")
      .agg(count(lit(1)).as("cp"))
      .groupBy($"l_orderkey").agg(count($"l_partkey").as("n_part"))
    val exact = supp.join(part, Seq("l_orderkey"))
    val approx = spread.groupBy($"l_orderkey")
      .agg(
        approx_count_distinct($"l_suppkey", rsd).as("a_supp"),
        approx_count_distinct($"l_partkey", rsd).as("a_part"))
    exact.join(approx, Seq("l_orderkey"))
      .select($"l_orderkey", $"n_supp", $"n_part", $"n_lines",
        ok($"a_supp", $"n_supp").as("supp_ok"),
        ok($"a_part", $"n_part").as("part_ok"))
  }

  /** The 100 TB form of A3: HyperLogLog++ `approx_count_distinct` — a
    * fixed-size mergeable sketch per group instead of a distinct-value
    * set. Sketch internals are engine-specific, so the ESTIMATE has no
    * cross-engine hash; what IS oracle-checkable is the accuracy
    * contract, and that's what this emits: exact counts plus
    * `supp_ok`/`part_ok` flags asserting |approx − exact| ≤
    * max(5, ⌈5%·exact⌉) per group, which DuckDB replays as literal TRUEs
    * — a hash mismatch now means a measured accuracy violation, not a
    * formatting difference (was rows-only before round 6). rsd 0.05
    * (HLL default): 8× smaller sketch buffers through the shuffle than
    * 0.02. Bound: at per-order cardinalities ≲ 16 the 5% term is moot
    * and the ±5 absolute floor binds; the 512-register linear-counting
    * collision tail measured max |err| = 3 across the ~165k groups of
    * all three fixture sfs, so 5 holds with margin while staying
    * falsifiable (RelationalApproxSpec flips the flags false at rsd
    * 0.39, the coarsest Spark admits, under a zero-tolerance claim). */
  val groupedCountDistinctApprox: QueryDef = QueryDef.sql(
    "grouped_count_distinct_approx",
    """SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_lines,
      |  TRUE AS supp_ok, TRUE AS part_ok
      |FROM lineitem GROUP BY l_orderkey""") { (s, dir) =>
    groupedCountDistinctApproxDf(s, dir, rsd = 0.05, tolerance = 0.05,
      floor = 5)
  }

  /** The flagship over BUCKETED tables — the recurring-join discipline at
    * 100 TB: both sides are landed hash-clustered on the join key
    * ([[graft.pipeline.Warehouse.loadBucketed]], 16 buckets), so the
    * count-distinct aggregate AND the orders⋈counts join plan with ZERO
    * shuffle exchanges — the clustering was paid once at write. The
    * bucketed tables are built on first use in a session (the bench's
    * median-of-3 therefore times the exchange-free query, not the
    * setup); results are identical to `flagship_missing_stats`, which the
    * shared oracle checks. Plan asserted exchange-free in BucketingSpec.
    * The oracle IS `flagshipMissingStats`'s (shared by reference, not
    * copied): the whole contract is "same rows, cheaper plan". */
  val flagshipBucketed: QueryDef = QueryDef(
    "flagship_bucketed",
    (s: SparkSession, dir: String) => {
    import s.implicits._
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val (liT, ordT) = (s"lineitem_bk_$tag", s"orders_bk_$tag")
    if (!s.catalog.tableExists(liT) || !s.catalog.tableExists(ordT)) {
      val wh = graft.pipeline.Warehouse(s,
        s"${System.getProperty("java.io.tmpdir")}/graft-bucketed-$tag")
      wh.loadBucketed(liT,
        t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey"),
        "l_orderkey", 16)
      wh.loadBucketed(ordT,
        t(s, dir, "orders").select($"o_orderkey", $"o_orderdate", $"o_orderstatus"),
        "o_orderkey", 16)
    }
    val cnts = s.table(liT)
      .groupBy($"l_orderkey")
      .agg(countDistinct($"l_suppkey").as("cntcheck"))
    s.table(ordT)
      .join(cnts, $"o_orderkey" === $"l_orderkey", "left")
      .where($"cntcheck" < 2 || $"cntcheck".isNull)
      .select($"o_orderkey", $"o_orderdate", $"o_orderstatus", $"cntcheck")
    },
    flagshipMissingStats.oracle)

  /** Distributed table checksum — the reconciliation primitive for
    * comparing two 100 TB table copies (pre/post migration, cross-region
    * replicas, warehouse vs source) WITHOUT moving either: per-row md5
    * over a canonical '|'-joined rendering, folded with BIT_XOR —
    * commutative, associative, overflow-free — so the aggregate is
    * embarrassingly parallel and partition-order-independent. Grouped by
    * a coarse key so a mismatch localizes to a group instead of one
    * opaque table-level bit. Only integer/string/date columns enter the
    * rendering (double formatting is not engine-portable; the md5-hex →
    * BIGINT parse takes 15 hex digits = 60 bits, positive in both
    * engines). NULL columns are rendered as a chr(0)-prefixed sentinel
    * (not skippable by concat_ws, not producible by a cast) so
    * ('a', NULL, 'b') and ('a', 'b', NULL) hash differently — required
    * for the primitive to stay sound on nullable schemas. */
  val tableChecksum: QueryDef = {
    // Canonical rendering, generated once for both engines: each column
    // coalesced to chr(0)||'NULL' before the '|' join. Only the string
    // type name and the hex→BIGINT parse differ between dialects.
    val cols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "l_returnflag", "l_linestatus", "CAST(CAST(l_shipdate AS DATE) AS %s)")
    def rendering(strTy: String): String = cols
      .map(c => s"coalesce(CAST(${c.format(strTy)} AS $strTy), " +
        s"concat(chr(0), 'NULL'))")
      .mkString("concat_ws('|', ", ", ", ")")
    QueryDef.sql(
      "table_checksum",
      s"""SELECT l_returnflag, COUNT(*) AS n_rows,
         |  BIT_XOR(CAST(concat('0x', substring(md5(
         |    ${rendering("VARCHAR")}), 1, 15))
         |    AS BIGINT)) AS checksum
         |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.loadSpread(s, dir, "lineitem")
      .select($"l_returnflag",
        expr(s"""CAST(conv(substring(md5(
          |  ${rendering("STRING")}), 1, 15), 16, 10)
          |AS BIGINT)""".stripMargin).as("h"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("checksum"))
    }
  }

  /** Multi-way star join (TPC-H Q5 shape) — the plan-selection
    * demonstration the single-join queries can't give: two fact-fact
    * shuffle joins (customer⋈orders⋈lineitem on their natural keys)
    * against a broadcast dimension CHAIN (region→nation→supplier
    * collapses to a few-hundred-row build side before it ever meets the
    * facts), with the cross-dimension c_nationkey = s_nationkey
    * predicate closing the star. Catalyst reorders and AQE re-plans the
    * join tree at runtime; the revenue aggregate is decimal-exact. */
  val q5LocalSupplier: QueryDef = QueryDef.sql(
    "q5_local_supplier",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
      |    AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |             AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""") { (s, dir) =>
    import s.implicits._
    val m12 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(12, 2))
    val dims = t(s, dir, "supplier")
      .join(t(s, dir, "nation"), $"s_nationkey" === $"n_nationkey")
      .join(t(s, dir, "region").where($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_nationkey", $"n_name")
    t(s, dir, "customer").select($"c_custkey", $"c_nationkey")
      .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
        $"c_custkey" === $"o_custkey")
      .join(t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_suppkey", $"l_extendedprice",
            $"l_discount"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(dims),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .groupBy($"n_name")
      .agg(
        sum(m12($"l_extendedprice") * m12(lit(1) - $"l_discount"))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Global top-k over a join + aggregate (TPC-H Q3 shape): the ten
    * highest-revenue orders in a market segment. ORDER BY + LIMIT over
    * an aggregate plans as TakeOrderedAndProject — each partition keeps
    * a 10-row heap and only heaps move to the driver, so the global
    * "sort" touches k·partitions rows regardless of order count. Ties
    * broken by orderkey so the result is total-ordered and
    * engine-stable. */
  val q3TopRevenue: QueryDef = QueryDef.sql(
    "q3_top_revenue",
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
      |    AS revenue,
      |  CAST(o_orderdate AS DATE) AS order_day
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey ASC
      |LIMIT 10""") { (s, dir) =>
    import s.implicits._
    val m12 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(12, 2))
    t(s, dir, "customer")
      .where($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
      .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey",
        $"o_orderdate"), $"c_custkey" === $"o_custkey")
      .join(t(s, dir, "lineitem").select($"l_orderkey", $"l_extendedprice",
        $"l_discount"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(sum(m12($"l_extendedprice") * m12(lit(1) - $"l_discount"))
        .cast(DoubleType).as("revenue"))
      .select($"l_orderkey", $"revenue",
        to_date($"o_orderdate").as("order_day"))
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  val all: Seq[QueryDef] = Seq(
    flagshipMissingStats, q1PricingSummary, scanFilterProject,
    filterInList, filterDatePart, watermarkMaxDate, budgetCheck,
    groupedCountDistinct, sqlTask, groupedCountDistinctApprox,
    flagshipBucketed, tableChecksum, q5LocalSupplier, q3TopRevenue)
}
