package graft.ops

import graft.SparkTestBase

/** Plan-shape regression pins: the scale properties PLANS.md narrates,
  * asserted against the actual physical plans so a refactor that
  * silently loses a broadcast, a pushed filter, or a group-limit
  * pushdown fails CI instead of only showing up in a 100× run. All at
  * sf0.001 — plan SHAPE, not timing. */
class PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    val d = graft.SparkEntry.defs.find(_.name == name).get
    d.fn(spark, dir).queryExecution.executedPlan.toString
  }

  test("tfidf joins the vocabulary by broadcast, never shuffling the tf stage twice") {
    val p = plan("tfidf_top_terms")
    assert(p.contains("BroadcastHashJoin"), p)
    // the tf stage is a persisted stage table read by both consumers
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("latest_per_key pushes the rank-1 filter into a window group limit") {
    val p = plan("latest_per_key")
    assert(p.contains("WindowGroupLimit"), p)
    // partitioned window — never a global single-partition sort
    assert(!p.contains("Window [") || p.contains("windowspecdefinition(o_custkey"), p)
  }

  test("scan_filter_project reaches the parquet reader with filter and projection") {
    val p = plan("scan_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), p)
  }

  test("similarity_topk broadcasts the query set and never shuffles the corpus") {
    val p = plan("similarity_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("flagship aggregates shrink before the join") {
    val p = plan("flagship_missing_stats")
    // the count-distinct side aggregates below the join: HashAggregate
    // appears before any join operator consumes lineitem
    assert(p.contains("HashAggregate"), p)
  }
}
