package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Incremental aggregate maintenance: folding deltas forward equals a
  * full recompute, refreshes touch only affected keys' rows, and a
  * replayed refresh applies once. */
class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private def recompute(wh: Warehouse, base: String) =
    wh.read(base).groupBy($"k")
      .agg(count(lit(1)).as("n_rows"), sum($"v").as("sum_v"))

  test("two refreshes equal the full recompute") {
    val w = Warehouse(spark, tmpDir("ia-wh"))
    val b1 = Seq((1L, 10L), (1L, 5L), (2L, 7L)).toDF("k", "v")
    w.load("base", b1, SinkPolicy.Append)
    IncrementalAgg.refreshSumCount(w, "agg", b1, Seq("k"), Seq("v"))

    val b2 = Seq((1L, 1L), (3L, 30L)).toDF("k", "v")
    w.load("base", b2, SinkPolicy.Append)
    IncrementalAgg.refreshSumCount(w, "agg", b2, Seq("k"), Seq("v"))

    val got = w.read("agg").as[(Long, Long, Long)].collect().toSet
    val full = recompute(w, "base").as[(Long, Long, Long)].collect().toSet
    assert(got === full)
    assert(got === Set((1L, 3L, 16L), (2L, 1L, 7L), (3L, 1L, 30L)))
  }

  test("a refresh leaves unaffected keys' stored rows byte-identical") {
    val w = Warehouse(spark, tmpDir("ia2-wh"))
    IncrementalAgg.refreshSumCount(w, "agg",
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), Seq("k"), Seq("v"))
    // delta touches only k=2: k=1's aggregate must survive via
    // copy-on-write, not be recomputed from anywhere
    IncrementalAgg.refreshSumCount(w, "agg",
      Seq((2L, 2L)).toDF("k", "v"), Seq("k"), Seq("v"))
    val got = w.read("agg").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 10L), (2L, 2L, 22L)))
  }

  test("a replayed refresh (same txnId) applies once") {
    val w = Warehouse(spark, tmpDir("ia3-wh"))
    val d = Seq((1L, 10L)).toDF("k", "v")
    IncrementalAgg.refreshSumCount(w, "agg", d, Seq("k"), Seq("v"),
      txnId = Some("r:1"))
    val r2 = IncrementalAgg.refreshSumCount(w, "agg", d, Seq("k"), Seq("v"),
      txnId = Some("r:1"))
    assert(r2.action === "skipped-duplicate-txn")
    val got = w.read("agg").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 10L)))
  }
}
