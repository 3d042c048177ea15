package graft.ops

import graft.SparkTestBase

/** The router's value is dispatch correctness: the registered query must
  * BE the chosen branch (same rows, not same-ish), the thresholds in the
  * Scala dial and the oracle's gating predicates must be the same
  * numbers, and the boundaries must land where the cost model says.
  * Branch internals are pinned by their own suites (PqSpec,
  * SimilarityPlantedSpec) and the oracle harness. */
class AnnRouterSpec extends SparkTestBase {

  test("choose() lands the cost-model boundaries exactly") {
    assert(AnnRouter.choose(1) == "exact")
    assert(AnnRouter.choose(AnnRouter.T1) == "exact")      // 784: last exact
    assert(AnnRouter.choose(AnnRouter.T1 + 1) == "ivf")    // 785: first IVF
    assert(AnnRouter.choose(AnnRouter.T2) == "ivf")        // 500k: last IVF
    assert(AnnRouter.choose(AnnRouter.T2 + 1) == "ivfpq")  // first IVF-PQ
    assert(AnnRouter.choose(2000000) == "ivfpq")           // the measured decade
  }

  test("oracle gating predicates carry the same thresholds as the dial") {
    val sql = AnnRouter.annAutoTopk.oracle.get
    assert(sql.contains(s"<= ${AnnRouter.T1}"))
    assert(sql.contains(s"> ${AnnRouter.T1}"))
    assert(sql.contains(s"<= ${AnnRouter.T2}"))
    assert(sql.contains(s"> ${AnnRouter.T2}"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("sf0.001 (n=500) dispatches to exact and IS the exact branch") {
    val dir = "/root/testdata/sf0.001"
    val base = Similarity.quantized(spark, dir)
    try {
      assert(AnnRouter.choose(base.count()) == "exact")
      val routed = rows(AnnRouter.annAutoTopk.fn(spark, dir))
      assert(routed == rows(Similarity.exactTopkFrom(base, 5)))
      assert(routed.nonEmpty)
    } finally spark.catalog.clearCache()
  }

  test("sf0.1 (n=2000) dispatches to IVF and IS the IVF branch") {
    val dir = "/root/testdata/sf0.1"
    val base = Similarity.quantized(spark, dir)
    try {
      val n = base.count()
      assert(AnnRouter.choose(n) == "ivf")
      val routed = rows(AnnRouter.annAutoTopk.fn(spark, dir))
      assert(routed == rows(Similarity.ivfTopkFrom(base, n)))
      assert(routed.nonEmpty)
    } finally spark.catalog.clearCache()
  }

  test("routedTopk serves from a current stored index and falls back when stale") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.1" // n = 2000: above-T1 regime
    val wh = graft.pipeline.Warehouse(spark, tmpDir("router-idx"))
    val idx = AnnIndex(wh, "emb")
    val base = Similarity.quantized(spark, dir).persist()
    try {
      val n = base.count()
      assert(AnnRouter.choose(n) == "ivf")
      val fresh = rows(Similarity.ivfTopkFrom(base, n))

      // no index built yet: the router must re-derive, not fail
      assert(rows(AnnRouter.routedTopk(idx, base)) == fresh)

      // current index: routed IS the stored path, row for row
      idx.build(base)
      val stored = rows(idx.topk(base.where(col("vec_id") % 25 === 0), base, k = 5)
        .select(col("qid"), col("cid"),
          graft.functions.Kit.quantize(col("cos"), 6).as("cos_q6")))
      val routed = rows(AnnRouter.routedTopk(idx, base))
      assert(routed == stored && routed.nonEmpty)

      // stale index (2x growth): correctness never waits on maintenance
      val clone = wh.read("emb_ann_entries")
        .withColumn("vec_id", col("vec_id") + 7000000L)
      wh.load("emb_ann_entries", clone, graft.pipeline.SinkPolicy.Append)
      assert(idx.needsRebuild())
      assert(rows(AnnRouter.routedTopk(idx, base)) == fresh)
    } finally { base.unpersist(); spark.catalog.clearCache() }
  }

  test("routedTopk never routes the exact regime to the store") {
    val dir = "/root/testdata/sf0.001" // n = 500 <= T1
    val wh = graft.pipeline.Warehouse(spark, tmpDir("router-ex"))
    val idx = AnnIndex(wh, "emb")
    val base = Similarity.quantized(spark, dir)
    try {
      idx.build(base) // even with a current index, brute force wins below T1
      assert(rows(AnnRouter.routedTopk(idx, base)) ==
        rows(Similarity.exactTopkFrom(base, 5)))
    } finally spark.catalog.clearCache()
  }
}
