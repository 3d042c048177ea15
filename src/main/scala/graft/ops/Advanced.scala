package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

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

  /** CUBE over returnflag × linestatus: all four grouping combinations
    * (cells, both margins, grand total) in one Expand+aggregate pass —
    * the §2.4 "grouping sets / cube" row. */
  val cubeSales: QueryDef = QueryDef.sql(
    "cube_sales",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""") { (s, dir) =>
    import s.implicits._
    // Aggregate BEFORE the cube Expand (guide §2.3 — aggregate before
    // you shuffle, applied to the ×4 row multiplication): COUNT and the
    // exact decimal SUM both decompose over partial aggregates, so the
    // cube runs over the 6-row (flag, status) base — Expand multiplies
    // 6 rows, not 600k — and the only corpus-width pass is one plain
    // map-side-combined groupBy. Values are identical: sum-of-sums over
    // disjoint groups in exact DECIMAL, count-as-sum-of-counts; fixture
    // flags are non-null so value-null vs grouping-null cannot collide
    // (no null flag rows exist for the subtotal rows to alias with).
    // spread (Tables.loadSpread rationale): the base partial agg is the
    // whole query and would otherwise run inside the one-split scan
    val base = Tables.loadSpread(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n0"),
        sum($"l_quantity".cast(DecimalType(18, 2))).as("q0"))
    base.cube($"l_returnflag", $"l_linestatus")
      .agg(sum($"n0").as("n_lines"),
        sum($"q0").cast(DoubleType).as("sum_qty"))
  }

  /** Ranking-function kit over a partitioned window: rank, dense_rank,
    * percent_rank, cume_dist, ntile(4), lead — the §2.5 surface beyond
    * row_number. Quantized percent_rank/cume_dist keep the doubles
    * engine-portable (both are exact small-integer ratios, so FLOOR(x·1e6)
    * agrees across engines); ORDER BY includes the key so ties are
    * deterministic. */
  val windowRankKit: QueryDef = QueryDef.sql(
    "window_rank_kit",
    """SELECT o_orderkey, o_custkey,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  CAST(FLOOR(percent_rank() OVER w * 1000000) AS BIGINT) AS prank_q6,
      |  CAST(FLOOR(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_q6,
      |  ntile(4) OVER w AS quartile,
      |  lead(o_orderkey) OVER w AS next_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey)""") { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    t(s, dir, "orders").select(
      $"o_orderkey", $"o_custkey",
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      Kit.quantize(percent_rank().over(w), 6).as("prank_q6"),
      Kit.quantize(cume_dist().over(w), 6).as("cume_q6"),
      ntile(4).over(w).as("quartile"),
      lead($"o_orderkey", 1).over(w).as("next_order"))
  }

  /** Window VALUE functions — first/last/nth over an explicit running
    * frame, completing the window family beside the rank kit: first and
    * nth are frame-start-anchored (stable from the first row), `last`
    * over the default running frame is the classic "value so far"
    * carry-forward. Same per-key partitioning discipline: no global
    * window anywhere. */
  val windowValueKit: QueryDef = QueryDef.sql(
    "window_value_kit",
    """SELECT o_orderkey, o_custkey,
      |  first_value(o_orderkey) OVER w AS first_order,
      |  last_value(o_orderkey) OVER w AS latest_so_far,
      |  nth_value(o_orderkey, 2) OVER w AS second_order,
      |  lag(o_orderkey, 2) OVER w AS two_back
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""") { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    t(s, dir, "orders").select(
      $"o_orderkey", $"o_custkey",
      first($"o_orderkey").over(w).as("first_order"),
      last($"o_orderkey").over(w).as("latest_so_far"),
      nth_value($"o_orderkey", 2).over(w).as("second_order"),
      lag($"o_orderkey", 2).over(w).as("two_back"))
  }

  /** Blocked fuzzy entity matching — the entity-resolution join: pairs
    * of customer names within Levenshtein distance 2, BLOCKED by nation
    * so candidate volume is Σ(block²)/2, never n²/2 corpus-wide (the
    * same bounding discipline as every near-dup candidate stage; at
    * 100 TB the block key sharpens — nation+prefix — without changing
    * the plan, and block-internal parallelism comes from sub-block pair
    * decomposition, the same triangle enumeration SkewJoin salts with).
    * The distance test lives INSIDE the join condition as the
    * THRESHOLDED `levenshtein(a, b, 2)` (banded O(d·n) DP with early
    * exit, vs full O(n²)); the full-DP projection below it only ever
    * runs on the handful of surviving pairs. `levenshtein` has identical
    * unit-cost semantics in Spark and DuckDB, so distances are
    * hash-exact. */
  val fuzzyMatchEntities: QueryDef = QueryDef.sql(
    "fuzzy_match_entities",
    """SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a
      |JOIN customer b
      |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 2""") { (s, dir) =>
    import s.implicits._
    val c = t(s, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_nationkey")
    // The dimension side broadcasts (15k rows ≪ the 10 MB threshold), so
    // probe-side partitioning alone sets the pair-loop parallelism — a
    // single-split parquet scan would run all Σ(block²) distance tests in
    // ONE task. Hash-spreading the probe by entity key fans the block
    // pairs across every core, here and on a 1000-executor cluster.
    // (explicit count: a column-only repartition of a few-hundred-KB side
    // is an AQE-coalesce target, which would fold the loop back into one
    // task)
    val a = c.toDF("key_a", "name_a", "nation_a")
      .repartition(s.sparkContext.defaultParallelism, $"key_a")
    val b = c.toDF("key_b", "name_b", "nation_b")
    a.join(b,
        $"nation_a" === $"nation_b" && $"key_a" < $"key_b" &&
          levenshtein($"name_a", $"name_b", 2) =!= lit(-1))
      .select($"key_a", $"key_b",
        levenshtein($"name_a", $"name_b").cast("long").as("dist"))
  }

  /** Fuzzy entity matching under Jaro-Winkler — the similarity scorer
    * entity resolution actually ranks by (prefix-weighted, transposition-
    * tolerant), via the engine's second native codegen'd expression
    * ([[graft.functions.JaroWinkler]] — Spark has no built-in JW). Same
    * bounding discipline as [[fuzzyMatchEntities]]: nation-blocked
    * candidates, broadcast dimension, explicitly-spread probe. Scores are
    * quantized ×1e6; the kernel is bit-compatible with DuckDB's
    * `jaro_winkler_similarity` (a rapidfuzz port — convention verified
    * value-by-value in JaroWinklerSpec), so the oracle check is exact. */
  val fuzzyJwEntities: QueryDef = QueryDef.sql(
    "fuzzy_jw_entities",
    """SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
      |  CAST(FLOOR(jaro_winkler_similarity(a.c_name, b.c_name) * 1000000)
      |    AS BIGINT) AS jw_q6
      |FROM customer a
      |JOIN customer b
      |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
      |WHERE jaro_winkler_similarity(a.c_name, b.c_name) >= 0.975""") { (s, dir) =>
    import s.implicits._
    val c = t(s, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_nationkey")
    val a = c.toDF("key_a", "name_a", "nation_a")
      .repartition(s.sparkContext.defaultParallelism, $"key_a")
    val b = c.toDF("key_b", "name_b", "nation_b")
    a.join(b,
        $"nation_a" === $"nation_b" && $"key_a" < $"key_b" &&
          Kit.jaroWinkler($"name_a", $"name_b") >= 0.975)
      .select($"key_a", $"key_b",
        Kit.quantize(Kit.jaroWinkler($"name_a", $"name_b"), 6).as("jw_q6"))
  }

  /** Exact interpolated percentiles per group — Spark's `percentile` and
    * DuckDB's `quantile_cont` both sort and linearly interpolate, so on
    * integer-valued quantities the doubles agree exactly (quantized
    * anyway for hash stability). The 100 TB note: exact percentiles sort
    * each group; prefer approx_percentile when 1e-3 error is acceptable. */
  val aggPercentiles: QueryDef = QueryDef.sql(
    "agg_percentiles",
    """SELECT l_returnflag,
      |  CAST(FLOOR(quantile_cont(l_quantity, 0.5) * 1000000) AS BIGINT) AS p50_q6,
      |  CAST(FLOOR(quantile_cont(l_quantity, 0.9) * 1000000) AS BIGINT) AS p90_q6,
      |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
      |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "lineitem").groupBy($"l_returnflag").agg(
      Kit.quantize(expr("percentile(l_quantity, 0.5)"), 6).as("p50_q6"),
      Kit.quantize(expr("percentile(l_quantity, 0.9)"), 6).as("p90_q6"),
      min($"l_quantity").as("min_qty"),
      max($"l_quantity").as("max_qty"))
  }

  /** Shared pipeline for [[aggPercentilesApprox]], parameterized so the
    * spec can prove the rank check is live: `sketchAccuracy` drives the
    * sketch, `claimedAccuracy` the asserted rank-error bound ε = 1/claimed
    * — a coarse sketch under a tight claim must flip the flags false.
    *
    * The bound is the sketch's own contract, checked by RANK (value
    * distance means nothing for a quantile sketch): approx_percentile
    * guarantees the returned element's exact rank is within ε·n of the
    * target rank, so per group we re-scan and count values <,≤ the
    * returned point — `ok` iff [count(<)+1, count(≤)] overlaps
    * [p·n − ε·n − 1, p·n + ε·n + 1] (±1 absorbs the rank-definition
    * off-by-ones). The second scan is the audit's price, not the
    * operator's: the sketch itself is one pass, mergeable, O(accuracy)
    * memory per group regardless of group size — the reason it replaces
    * sort-based percentile at 100 TB. */
  def percentilesApproxDf(s: SparkSession, dir: String,
      sketchAccuracy: Int, claimedAccuracy: Int): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem").select($"l_returnflag", $"l_quantity")
    val sk = li.groupBy($"l_returnflag").agg(
      expr(s"approx_percentile(l_quantity, 0.5, $sketchAccuracy)").as("a50"),
      expr(s"approx_percentile(l_quantity, 0.9, $sketchAccuracy)").as("a90"),
      count(lit(1)).as("n_lines"))
    // broadcast the tiny per-group sketch results back over the fact
    // table: one extra narrow scan, no extra shuffle beyond the re-agg
    def rankOk(p: Double, cLt: Column, cLe: Column): Column = {
      val eps = ($"n_lines".cast("double") / claimedAccuracy) + 1.0
      val target = $"n_lines".cast("double") * p
      (cLe >= target - eps) && (cLt + 1 <= target + eps)
    }
    li.join(broadcast(sk), "l_returnflag")
      .groupBy($"l_returnflag").agg(
        first($"n_lines").as("n_lines"),
        count_if($"l_quantity" < $"a50").as("lt50"),
        count_if($"l_quantity" <= $"a50").as("le50"),
        count_if($"l_quantity" < $"a90").as("lt90"),
        count_if($"l_quantity" <= $"a90").as("le90"))
      .select($"l_returnflag", $"n_lines",
        rankOk(0.5, $"lt50", $"le50").as("p50_rank_ok"),
        rankOk(0.9, $"lt90", $"le90").as("p90_rank_ok"))
  }

  /** The 100 TB form of exact percentiles: `approx_percentile` keeps a
    * fixed-size mergeable quantile sketch per group instead of sorting
    * the group. Sketch internals (and even the returned element, which
    * can shift with merge order) are engine-specific, so the ESTIMATE has
    * no cross-engine hash; what IS oracle-checkable is the sketch's
    * ε-rank contract, and that's what this emits: per-group flags
    * asserting the returned p50/p90 points sit within rank ε·n (ε =
    * 1/1000) of the true target ranks, which DuckDB replays as literal
    * TRUEs — a hash mismatch now means a measured accuracy violation
    * (was rows-only before round 6). ApproxPercentileSpec proves the
    * flags are live (coarse sketch + tight claim → false). */
  val aggPercentilesApprox: QueryDef = QueryDef.sql(
    "agg_percentiles_approx",
    """SELECT l_returnflag, COUNT(*) AS n_lines,
      |  TRUE AS p50_rank_ok, TRUE AS p90_rank_ok
      |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
    percentilesApproxDf(s, dir, sketchAccuracy = 1000,
      claimedAccuracy = 1000)
  }

  /** Argmin/argmax + conditional aggregates: which order carries the
    * max price per priority (`max_by` / DuckDB `arg_max`), conditional
    * counts and boolean aggregation — one shuffle, all map-side
    * combinable. Ties: the fixture's o_totalprice is distinct per group
    * at 2-decimal granularity, so arg extremes are well-defined. */
  val aggArgminmax: QueryDef = QueryDef.sql(
    "agg_argminmax",
    """SELECT o_orderpriority,
      |  arg_max(o_orderkey, o_totalprice) AS priciest_order,
      |  arg_min(o_orderkey, o_totalprice) AS cheapest_order,
      |  CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
      |  bool_or(o_totalprice > 400000) AS any_huge,
      |  bool_and(o_totalprice > 1000) AS all_over_1k
      |FROM orders GROUP BY o_orderpriority""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "orders").groupBy($"o_orderpriority").agg(
      max_by($"o_orderkey", $"o_totalprice").as("priciest_order"),
      min_by($"o_orderkey", $"o_totalprice").as("cheapest_order"),
      count_if($"o_totalprice" > 100000).as("n_big"),
      bool_or($"o_totalprice" > 400000).as("any_huge"),
      bool_and($"o_totalprice" > 1000).as("all_over_1k"))
  }

  /** Array-function kit over the embedding vectors: length, quantized
    * max element, 1-based position of the max, a slice, and a sorted
    * prefix — the ArrayType manipulation surface (DuckDB list_* mirrors
    * each; Spark array_position is already 1-based like DuckDB). */
  val arrayKit: QueryDef = QueryDef.sql(
    "array_kit",
    """SELECT vec_id,
      |  CAST(len(embedding) AS INT) AS dim,
      |  CAST(FLOOR(CAST(list_max(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS max_q6,
      |  CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS max_pos,
      |  CAST(FLOOR(CAST(embedding[5] AS DOUBLE) * 1000000) AS BIGINT) AS e5_q6,
      |  CAST(FLOOR(CAST(list_sort(embedding[1:8])[1] AS DOUBLE) * 1000000) AS BIGINT) AS min8_q6
      |FROM embeddings""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "embeddings").select(
      $"vec_id",
      size($"embedding").as("dim"),
      Kit.quantize(array_max($"embedding").cast(DoubleType), 6).as("max_q6"),
      array_position($"embedding", array_max($"embedding")).as("max_pos"),
      Kit.quantize($"embedding".getItem(4).cast(DoubleType), 6).as("e5_q6"),
      Kit.quantize(
        array_sort(slice($"embedding", 1, 8)).getItem(0).cast(DoubleType), 6)
        .as("min8_q6"))
  }

  /** Explicit GROUPING SETS with `grouping_id()` — the general form cube
    * and rollup specialize ((nation) alone is expressible by neither).
    * One Expand + one aggregation pass, same as cube/rollup; gid
    * disambiguates which set produced a row when a grouping column is
    * genuinely NULL. Completes the §2.4 grouping family. */
  val groupingSetsSales: QueryDef = QueryDef.sql(
    "grouping_sets_sales",
    """SELECT r.r_name AS region, n.n_name AS nation,
      |  CAST(GROUPING(r.r_name, n.n_name) AS BIGINT) AS gid,
      |  COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer c
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |JOIN region r ON r.r_regionkey = n.n_regionkey
      |GROUP BY GROUPING SETS ((r.r_name, n.n_name), (r.r_name), (n.n_name), ())""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "customer").as("c")
      .join(broadcast(t(s, dir, "nation").as("n")),
        $"n.n_nationkey" === $"c.c_nationkey")
      .join(broadcast(t(s, dir, "region").as("r")),
        $"r.r_regionkey" === $"n.n_regionkey")
      .select($"r.r_name".as("region"), $"n.n_name".as("nation"), $"c_acctbal")
      .groupingSets(
        Seq(Seq($"region", $"nation"), Seq($"region"), Seq($"nation"), Seq.empty),
        $"region", $"nation")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_cust"), Kit.moneySum($"c_acctbal").as("total_bal"))
  }

  /** Skew-salted join as a registered query: events (power-law user_id —
    * the canonical skewed fact) joined to a per-user dimension through
    * [[SkewJoin.saltedJoin]], so the manual skew killer is measured by
    * the bench, not just unit-proven. The salt is invisible in the
    * result (each fact row matches exactly the one replica carrying its
    * salt), so a plain-join oracle checks it exactly. The post-join
    * aggregate keys by event_type — compact output at any scale. */
  val skewSaltedJoin: QueryDef = QueryDef.sql(
    "skew_salted_join",
    """WITH d AS (
      |  SELECT user_id, COUNT(*) AS n_user_events, MIN(ts) AS first_ts
      |  FROM events GROUP BY user_id)
      |SELECT e.event_type, COUNT(*) AS n_events,
      |  CAST(SUM(d.n_user_events) AS BIGINT) AS sum_user_totals,
      |  CAST(count_if(e.ts = d.first_ts) AS BIGINT) AS n_first_events
      |FROM events e JOIN d ON e.user_id = d.user_id
      |GROUP BY e.event_type""") { (s, dir) =>
    import s.implicits._
    val ev = t(s, dir, "events")
    val dim = ev.groupBy($"user_id").agg(
      count(lit(1)).as("n_user_events"), min($"ts").as("first_ts"))
    SkewJoin.saltedJoin(ev, dim, "user_id", buckets = 8)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"n_user_events").as("sum_user_totals"),
        count_if($"ts" === $"first_ts").as("n_first_events"))
  }

  /** Deterministic array AGGREGATION (vs [[arrayKit]]'s scalar array
    * functions): collect_set is partition-order-nondeterministic by
    * itself, so every collected list is sorted before leaving the
    * aggregate — the only way an array-valued result is reproducible
    * across runs, partitionings, and engines. Rendered to a joined
    * string because engines disagree on list literal formatting, not on
    * list content. */
  val arrayAggSorted: QueryDef = QueryDef.sql(
    "array_agg_sorted",
    """SELECT c_nationkey,
      |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',')
      |    AS segments,
      |  COUNT(DISTINCT c_mktsegment) AS n_segments,
      |  COUNT(*) AS n_cust
      |FROM customer GROUP BY c_nationkey""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "customer")
      .groupBy($"c_nationkey")
      .agg(
        array_join(sort_array(collect_set($"c_mktsegment")), ",")
          .as("segments"),
        count_distinct($"c_mktsegment").as("n_segments"),
        count(lit(1)).as("n_cust"))
  }

  /** Statistical mode per group with a TOTAL tie order (count desc,
    * then value asc) — engines' built-in `mode` leaves ties
    * implementation-defined, which is exactly the nondeterminism this
    * engine bans. Two-level aggregate + rank-1 window over the counts
    * (vocabulary-sized, never the raw rows). */
  val modePerGroup: QueryDef = QueryDef.sql(
    "mode_per_group",
    """WITH cnt AS (
      |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS c
      |  FROM customer GROUP BY 1, 2),
      |rk AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |    ORDER BY c DESC, c_mktsegment ASC) AS rn
      |  FROM cnt)
      |SELECT c_nationkey, c_mktsegment AS mode_segment, c AS n_in_mode
      |FROM rk WHERE rn = 1""") { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cnt = t(s, dir, "customer")
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c".desc, $"c_mktsegment".asc)
    cnt.withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"c_nationkey", $"c_mktsegment".as("mode_segment"),
        $"c".as("n_in_mode"))
  }

  val all: Seq[QueryDef] = Seq(rollupSales, intersectExcept, asofClickView,
    cubeSales, windowRankKit, windowValueKit, fuzzyMatchEntities,
    fuzzyJwEntities, aggPercentiles, aggPercentilesApprox,
    aggArgminmax, arrayKit, arrayAggSorted, groupingSetsSales,
    skewSaltedJoin, modePerGroup)
}
