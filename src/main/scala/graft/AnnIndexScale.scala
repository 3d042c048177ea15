package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, Pq, Similarity}
import graft.pipeline.Warehouse

/** Scale harness for the warehouse-persisted ANN index ([[ops.AnnIndex]])
  * over a `gen_stress.py` corpus — measures the amortization claim the
  * component exists for:
  *
  *   - build wall (paid ONCE per corpus) vs the registered
  *     `ivfpq_rerank_topk` wall (which re-derives the index every run);
  *   - stored-query wall from a COLD cache (the store means nothing has
  *     to be resident between batches) + planted-pair recall@5;
  *   - row-for-row parity of stored vs fresh results at the decade;
  *   - index payload bytes on disk vs the full-width corpus parquet;
  *   - dedup-at-the-door verdict wall at two batch sizes (cost ∝ batch,
  *     never corpus) and one real exactly-once ingest + replay.
  *
  *   sbt 'runMain graft.AnnIndexScale /tmp/sf100_stress [noparity]
  *        [wh=/path/to/existing] [phases=build,query,...]'
  *
  * `wh=` reuses an existing index warehouse (skips build when meta
  * matches the corpus size); `phases=` runs a subset — both exist so a
  * phase can be re-measured in a FRESH JVM: a 9-phase single-session
  * sweep accumulates broadcasts (ContextCleaner reclaims them lazily,
  * `clearCache` doesn't touch them), which is measurement contamination
  * for the later phases at the 1000× decade. */
object AnnIndexScale {

  private def dirBytes(p: Path): Long = {
    val s = Files.walk(p)
    try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.head
    val parity = !args.contains("noparity")
    val whArg = args.collectFirst { case a if a.startsWith("wh=") => a.drop(3) }
    // slice=N overrides dedupArrivals' arrival-batch slice bound —
    // slice=0 disables slicing (the pre-round-12 one-shot shape, for
    // the 12 GiB comparison runs)
    val sliceRows: Long = args
      .collectFirst { case a if a.startsWith("slice=") => a.drop(6).toLong }
      .map(v => if (v <= 0L) Long.MaxValue else v)
      .getOrElse(graft.ops.AnnIndex.DedupSliceRows)
    val phases: String => Boolean =
      args.collectFirst { case a if a.startsWith("phases=") =>
        a.drop(7).split(",").toSet
      }.map(s => (p: String) => s(p)).getOrElse(_ => true)
    // HarnessSession: same protocol confs as the hand-rolled builder it
    // replaces, plus SPARK_GRAFT_MASTER / SPARK_GRAFT_EXTRA_CONF — the
    // extra-conf dial is how the 8 GiB dedup runs set the scan-split
    // geometry (spark.sql.files.maxPartitionBytes) for the wide-array
    // corpus scans; see dedupArrivals' heap-geometry scaladoc
    val spark = HarnessSession.build()
    import spark.implicits._

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val whRoot = whArg.map(java.nio.file.Paths.get(_))
      .getOrElse(Files.createTempDirectory("annidx-scale"))
    val wh = Warehouse(spark, whRoot.toString)
    val idx = AnnIndex(wh, "emb")
    val base = Similarity.quantized(spark, dir)
    val n = base.count()

    // ---- build: the once-per-corpus cost ----
    if (phases("build") && !idx.builtN.contains(n)) {
      val (buildSec, meta) = timed(idx.build(base))
      println(f"""{"phase": "build", "sec": $buildSec%.2f, "n": $n, """ +
        s""""ks": ${meta.ks}, "ivf_modulus": ${meta.ivfModulus}}""")
    }

    // ---- census economics: the maintained √n-row table vs the
    // O(index) entries aggregation it replaced (both return the same
    // scalars; the warm read is what EVERY batch's staleness probe now
    // pays, the aggregation is what it used to pay) ----
    if (phases("census")) {
      spark.catalog.clearCache()
      val (warmSec, (rows, maxCell)) = timed(idx.cellStats)
      val (aggSec, _) = timed {
        val r = wh.read("emb_ann_entries")
          .groupBy($"cell").agg(count(lit(1)).as("c"))
          .agg(sum($"c"), max($"c")).head()
        (r.getLong(0), r.getLong(1))
      }
      println(f"""{"phase": "census", "warm_read_sec": $warmSec%.3f, """ +
        f""""full_agg_sec": $aggSec%.3f, """ +
        s""""rows": $rows, "max_cell": $maxCell}""")
    }

    // ---- footprint: information kept per vector ----
    if (phases("footprint")) {
      val corpusBytes =
        dirBytes(java.nio.file.Paths.get(dir, "embeddings.parquet"))
      val indexBytes = dirBytes(whRoot)
      println(s"""{"phase": "footprint", "corpus_bytes": $corpusBytes, """ +
        s""""index_bytes": $indexBytes}""")
    }

    // ---- stored query, cold cache both runs (no residency assumed) ----
    val queries = base.where($"vec_id" % 25 === 0)
    if (phases("query")) {
      val runs = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        timed(idx.topk(queries, base, k = 5)
          .select("qid", "cid").as[(Long, Long)].collect())
      }
      runs.zipWithIndex.foreach { case ((sec, rows), i) =>
        println(f"""{"phase": "query_${i + 1}", "sec": $sec%.2f, """ +
          s""""rows": ${rows.length}}""")
      }
      val top = runs.last._2.groupBy(_._1)
        .map { case (q, rs) => q -> rs.map(_._2).toSet }

      // planted-pair recall@5 (PqScale's convention: an opportunity is a
      // plant pair with a query-side member; recovered when the partner
      // is in that member's top-k)
      val plantsPath = java.nio.file.Paths.get(dir, "vec_plants.parquet")
      if (Files.exists(plantsPath)) {
        val plants = spark.read.parquet(plantsPath.toString)
          .select("copy_id", "src_id").as[(Long, Long)].collect()
        val opps = plants.flatMap { case (c, s) =>
          Seq((c, s), (s, c)).filter(_._1 % 25 == 0)
        }
        val hit = opps.count { case (q, p) => top.getOrElse(q, Set.empty)(p) }
        println(s"""{"phase": "recall", "hit": $hit, "opps": ${opps.length}}""")
      }

      // ---- parity: stored rows == fresh-pipeline rows, this decade ----
      if (parity) {
        spark.catalog.clearCache()
        val (freshSec, fresh) = timed(
          Pq.ivfpqRerankTopk.fn(spark, dir)
            .select("qid", "cid").as[(Long, Long)].collect())
        println(f"""{"phase": "fresh_end_to_end", "sec": $freshSec%.2f, """ +
          s""""rows": ${fresh.length}, """ +
          s""""equal": ${fresh.toSet == runs.last._2.toSet}}""")
      }
    }

    // ---- routed dispatch (AnnRouter.routedTopk): the production
    // amortization — metadata-only dispatch to the stored index; must
    // run while the index is CURRENT (before ingest grows it) ----
    if (phases("routed")) {
      spark.catalog.clearCache()
      val (sec, rows) = timed(ops.AnnRouter.routedTopk(idx, base)
        .select("qid", "cid").as[(Long, Long)].collect())
      println(f"""{"phase": "routed", "sec": $sec%.2f, """ +
        s""""rows": ${rows.length}, "branch": "${ops.AnnRouter.choose(n)}", """ +
        s""""via_store": ${idx.builtN.contains(n) && !idx.needsRebuild()}}""")
    }

    // ---- dedup-at-the-door: verdict wall ∝ batch, never corpus ----
    // the batch cache follows the corpus's regime rule (deserialized
    // int64-array rows are ~5-8x their parquet bytes as Java objects;
    // at the 8M decade a plain .persist() of the 411k-row batch held
    // multi-GB of heap and tipped the dedup-full phase into reader
    // OOM — the harness's own scratch must not occupy the JVM it
    // measures)
    val arrivals = Pq.ingestArrivals(base)
      .persist(graft.ops.StageLevels.pinnedFor(base, expansion = 3))
    val nArr = arrivals.count()
    if (phases("dedup")) {
      val small = arrivals.where($"vec_id" % 100 === 0).persist()
      val nSmall = small.count()
      for ((label, batch, sz) <- Seq(("small", small, nSmall),
                                     ("full", arrivals, nArr))) {
        spark.catalog.clearCache()
        val (sec, verdicts) = timed(
          idx.dedupArrivals(batch, base, sliceRows = sliceRows)
            .where(!$"is_new").count())
        println(f"""{"phase": "dedup_$label", "sec": $sec%.2f, """ +
          s""""batch": $sz, "dups": $verdicts}""")
      }
      small.unpersist()
    }

    // ---- one real ingest + exactly-once replay ----
    if (phases("ingest")) {
      val (ingSec, r1) = timed(idx.ingest(arrivals, base, "stress-b1"))
      println(f"""{"phase": "ingest", "sec": $ingSec%.2f, """ +
        s""""accepted": ${r1.accepted}, "duplicates": ${r1.duplicates}, """ +
        s""""indexed": ${idx.indexedRows}}""")
      r1.verdicts.unpersist()
    }
    if (phases("replay")) {
      spark.catalog.clearCache()
      // the replay re-verdicts against the POST-FLOOD index (the
      // correlated accepts now sit in one hot cell), so it runs under
      // the production 4×-modulus grind cap — the VectorGate default.
      // The uncapped form's candidate volume is cell²: ~2·10⁹ pairs at
      // 2M (75.4 s, r9) and heap death at 4M (STRESS_r10 §6) — the cap
      // exists precisely for this window, maintenance repairs it.
      val cap = 4L * idx.meta.ivfModulus
      val (repSec, r2) = timed(
        idx.ingest(arrivals, base, "stress-b1", capPerCell = Some(cap)))
      println(f"""{"phase": "ingest_replay", "sec": $repSec%.2f, """ +
        s""""action": "${r2.action}", "duplicates": ${r2.duplicates}, """ +
        s""""cap_per_cell": $cap, "indexed": ${idx.indexedRows}}""")
      r2.verdicts.unpersist()
    }

    // ---- post-ingest skew: INCREMENTAL repair (O(hot cell), not
    // O(corpus)) — the round-10 alternative to the rebuild below ----
    if (phases("repair")) {
      val (rows0, maxCell0) = idx.cellStats
      println(s"""{"phase": "repair_detect", "rows": $rows0, """ +
        s""""max_cell": $maxCell0, "modulus": ${idx.meta.ivfModulus}, """ +
        s""""needs_rebuild": ${idx.needsRebuild()}}""")
      val grown = base.unionByName(
        wh.read("emb_ann_entries").select($"vec_id")
          .where($"vec_id" >= n) // ingested ids (offset rule)
          .join(arrivals, Seq("vec_id")))
      val (rpSec, reassigned) = timed(idx.repairHotCells(grown))
      val (rows1, maxCell1) = idx.cellStats
      println(f"""{"phase": "repair", "sec": $rpSec%.2f, """ +
        s""""reassigned": $reassigned, "rows": $rows1, """ +
        s""""max_cell": $maxCell1, """ +
        s""""needs_rebuild": ${idx.needsRebuild()}}""")
      spark.catalog.clearCache()
      val (sec, dups) = timed(
        idx.dedupArrivals(arrivals, grown, sliceRows = sliceRows)
          .where(!$"is_new").count())
      println(f"""{"phase": "dedup_after_repair", "sec": $sec%.2f, """ +
        s""""batch": $nArr, "dups": $dups}""")
    }

    // ---- post-ingest skew: detect, rebuild, re-verdict ----
    // the correlated "novel" plants flood one stored cell on ingest;
    // needsRebuild(skew) must see it, and a rebuild (which re-samples
    // centroids from the grown corpus, splitting the hot region) must
    // restore the batch-proportional dedup wall
    if (phases("skew")) {
      val (rows0, maxCell0) = idx.cellStats
      println(s"""{"phase": "skew_detect", "rows": $rows0, """ +
        s""""max_cell": $maxCell0, "modulus": ${idx.meta.ivfModulus}, """ +
        s""""needs_rebuild": ${idx.needsRebuild()}}""")
      val grown = base.unionByName(
        wh.read("emb_ann_entries").select($"vec_id")
          .where($"vec_id" >= n) // ingested ids (offset rule)
          .join(arrivals, Seq("vec_id")))
      val (rbSec, meta2) = timed(idx.build(grown))
      val (rows1, maxCell1) = idx.cellStats
      println(f"""{"phase": "rebuild", "sec": $rbSec%.2f, """ +
        s""""rows": $rows1, "max_cell": $maxCell1, """ +
        s""""modulus": ${meta2.ivfModulus}, """ +
        s""""needs_rebuild": ${idx.needsRebuild()}}""")
      spark.catalog.clearCache()
      val (sec, dups) = timed(
        idx.dedupArrivals(arrivals, grown, sliceRows = sliceRows)
          .where(!$"is_new").count())
      println(f"""{"phase": "dedup_after_rebuild", "sec": $sec%.2f, """ +
        s""""batch": $nArr, "dups": $dups}""")
    }
    arrivals.unpersist()
    spark.stop()
  }
}
