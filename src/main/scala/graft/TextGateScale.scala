package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Warehouse
import graft.streaming.TextGate

/** Scale evidence for the TEXT dedup-at-the-door gate
  * ([[streaming.TextGate]]) over a `gen_stress.py` corpus — the claim
  * is COST ∝ BATCH: the corpus's signature work is paid once at its own
  * landing (the persisted band store), so a later batch pays only its
  * own shingling/banding plus band-collision candidates, regardless of
  * how large the corpus has grown.
  *
  *   sbt 'runMain graft.TextGateScale /tmp/sf100_stress'
  *
  * Protocol: the fixture's docs split 90/10 — the 90% lands first (one
  * big seeding drop, which also measures the gate at corpus width),
  * then the 10% re-lands as an arrival batch with fresh ids. The
  * fixture's ~5% planted near-dups give the batch true positives whose
  * sources live in the corpus side. Prints one JSON line per phase:
  * seed wall, batch wall + verdict mix, replay wall. Comparing
  * batch walls across corpus decades is the linearity evidence
  * (STRESS_r10.md). */
object TextGateScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.error("usage: TextGateScale <fixtureDir>"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")
    // FIXED 5k-doc batch at every decade (ids < 50,000, i.e. inside the
    // smallest stress fixture) — the cost ∝ batch claim needs the batch
    // held constant while the corpus grows 10×; everything else seeds
    // the corpus side
    val isBatch = $"doc_id" % 10 === 0 && $"doc_id" < 50000
    val corpus = docs.where(!isBatch)
    val batch = docs.where(isBatch)
      .select(($"doc_id" + 100000000L).as("doc_id"), $"text")

    val wh = Warehouse(spark,
      Files.createTempDirectory("textgate-scale").toString)
    val gate = TextGate(wh, "docs")

    val (seedSec, _) = timed(gate.landBatch(corpus, "seed"))
    val nCorpus = wh.read(gate.stageTable).count()
    println(f"""{"phase": "seed", "sec": $seedSec%.2f, """ +
      s""""staged": $nCorpus}""")

    spark.catalog.clearCache()
    val nb = batch.count()
    val (batchSec, _) = timed(gate.landBatch(batch, "b1"))
    val dups = wh.read(gate.verdictTable)
      .where($"doc_id" >= 100000000L && !$"is_new").count()
    println(f"""{"phase": "gate_batch", "sec": $batchSec%.2f, """ +
      s""""batch": $nb, "dups": $dups, """ +
      s""""staged": ${wh.read(gate.stageTable).count()}}""")

    // exactly-once replay: consume-and-skip, nothing moves
    spark.catalog.clearCache()
    val (repSec, _) = timed(gate.landBatch(batch, "b1"))
    println(f"""{"phase": "gate_replay", "sec": $repSec%.2f, """ +
      s""""staged": ${wh.read(gate.stageTable).count()}}""")

    // fragmentation census BEFORE compaction: seed + one batch = two
    // appended layouts, each covering the bucket range once, so the
    // census should read ≈ the number of uncompacted landings (its
    // manifest arithmetic is the b = 1 point of the opens model the
    // probe phase below measures at b = |batch buckets|)
    println(f"""{"phase": "census_fragmented", """ +
      f""""opens_per_bucket": ${gate.expectedOpensPerBucket}%.2f, """ +
      s""""maintenance_needed": ${gate.maintenanceNeeded()}}""")

    // ---- bucket-pruned probe vs full scan (round-10: the §4 note's
    // "band-store scan breaks ∝-batch" term). Compact the band store
    // into bkt-disjoint files (64 KB target: many files, so the
    // skipping ratio ≈ probes/files is visible at fixture scale — at
    // 100 TB the same ratio comes from 128 MB files at corpus width),
    // then verdict a SMALL batch through the pruned and the full-scan
    // probe over the SAME store. Verdicts are identical by
    // construction; only files opened and wall differ.
    val filesBefore = wh.currentFiles(gate.bandTable).size
    val (compSec, _) = timed(gate.compactBands(targetBytesPerFile = 64L << 10))
    val filesAfter = wh.currentFiles(gate.bandTable).size
    println(f"""{"phase": "compact_bands", "sec": $compSec%.2f, """ +
      s""""files_before": $filesBefore, "files_after": $filesAfter, """ +
      f""""opens_per_bucket": ${gate.expectedOpensPerBucket}%.2f, """ +
      s""""maintenance_needed": ${gate.maintenanceNeeded()}}""")

    // batch-side work (shingles, bands) materialized ONCE outside the
    // timed section — the two timed runs differ only in the probe's
    // corpus-side read. Pruned runs FIRST so OS page-cache warmth
    // favors the full scan: a pruned win is conservative.
    val small = docs.where($"doc_id" % 100 === 5 && $"doc_id" < 5000)
      .select(($"doc_id" + 200000000L).as("doc_id"), $"text").persist()
    val nSmall = small.count()
    val sets = graft.ops.TextOps.shingleSets(small).persist()
    val bands = graft.ops.TextOps.minhashBandsUncached(sets).persist()
    bands.count()
    val bkts = gate.batchBuckets(bands)
    val m = graft.pipeline.TxnLog.current(
      java.nio.file.Paths.get(wh.root, gate.bandTable)).get
    val opened = wh.prunedFilesInSet(m, gate.bandTable, "bkt", bkts).size

    val (prunedSec, prunedRows) =
      timed(gate.verdictsFor(small, sets, bands).where(!$"is_new").count())
    val full = TextGate(wh, "docs", pruneProbe = false)
    val (fullSec, fullRows) =
      timed(full.verdictsFor(small, sets, bands).where(!$"is_new").count())
    println(f"""{"phase": "probe_small_batch", "batch": $nSmall, """ +
      s""""probe_buckets": ${bkts.size}, """ +
      s""""files_opened": $opened, "files_total": ${m.files.size}, """ +
      f""""full_scan_sec": $fullSec%.2f, "pruned_sec": $prunedSec%.2f, """ +
      s""""dups_full": $fullRows, "dups_pruned": $prunedRows}""")
    spark.stop()
  }
}
