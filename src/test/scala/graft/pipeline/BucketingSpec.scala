package graft.pipeline

import graft.SparkTestBase

/** Co-located join proof: two tables bucketed on the join key plan a
  * SortMergeJoin with ZERO exchanges — the write paid the clustering, the
  * join never shuffles. (An in-partition Sort remains: Spark ≥3 ignores
  * bucket sort order at scan time unless the legacy
  * `bucketedTableScan.outputOrdering` conf is set; that sort is pipelined
  * within the task — no data movement — so the thing that matters at
  * scale, the shuffle, is what's asserted.) */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("join of identically-bucketed tables has no exchange") {
    val w = Warehouse(spark, tmpDir("bk-wh"))
    val facts = (1 to 5000).map(i => (i % 500, s"f$i")).toDF("k", "payload")
    val dims = (0 until 500).map(i => (i, s"d$i")).toDF("k", "attr")
    w.loadBucketed("facts_b", facts, "k", 8)
    w.loadBucketed("dims_b", dims, "k", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the join must be SMJ — the exchange-free
      // bucketed read is what's under test
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
      assert(joined.count() == 5000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SelectedBucketsCount: 8 out of 8"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }

  test("flagship_bucketed plans zero shuffle exchanges and matches the unbucketed rows") {
    val dir = "/root/testdata/sf0.001"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    try {
      // forbid broadcast: the exchange-free bucketed SMJ is what's under test
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = graft.ops.Relational.flagshipBucketed.fn(spark, dir)
      val rows = bucketed.count()
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      // identical result to the plain flagship on the same fixtures
      val plain = graft.ops.Relational.flagshipMissingStats.fn(spark, dir)
      assert(rows == plain.count())
      assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS lineitem_bk_$tag")
      spark.sql(s"DROP TABLE IF EXISTS orders_bk_$tag")
    }
  }

  test("bucketed grouping on the bucket key also avoids the exchange") {
    val w = Warehouse(spark, tmpDir("bk2-wh"))
    w.loadBucketed("facts_g", (1 to 1000).map(i => (i % 50, i)).toDF("k", "v"),
      "k", 4)
    try {
      val agg = spark.table("facts_g").groupBy("k").count()
      assert(agg.count() == 50)
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally spark.sql("DROP TABLE IF EXISTS facts_g")
  }
}
