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
      sys.error("usage: TextGateScale <fixtureDir> [lifecycle|drain]"))
    val mode = args.lift(1).getOrElse("lifecycle")
    val spark = HarnessSession.build()
    import spark.implicits._

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    if (mode == "drain") { drain(spark, dir); spark.stop(); return }

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

  /** 20-BATCH DRAIN (round-10 verdict #4 done-bar): the same drop
    * sequence through two gates — the production default (auto-compact
    * at bar 4.0) and a maintenance-free one — printing per-batch wall
    * and the fragmentation census. The claim this measures: with
    * auto-compaction the probe's expected opens stay ≈ flat at the bar
    * while the manual gate decays +1 per batch; verdict totals are
    * identical across the two policies. */
  private def drain(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Unit = {
    import spark.implicits._
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")
    // same split discipline as the lifecycle protocol: 90% seeds the
    // corpus, the 10% re-lands — here as 20 successive fixed-size drops
    val isBatch = $"doc_id" % 10 === 0 && $"doc_id" < 50000
    val corpus = docs.where(!isBatch)
    val whA = graft.pipeline.Warehouse(spark,
      Files.createTempDirectory("tg-drain-auto").toString)
    val whM = graft.pipeline.Warehouse(spark,
      Files.createTempDirectory("tg-drain-manual").toString)
    val auto = TextGate(whA, "docs")
    val manual = TextGate(whM, "docs", autoCompactBar = None)
    val (seedA, _) = timed(auto.landBatch(corpus, "seed"))
    val (seedM, _) = timed(manual.landBatch(corpus, "seed"))
    println(f"""{"phase": "seed", "auto_sec": $seedA%.2f, """ +
      f""""manual_sec": $seedM%.2f, """ +
      s""""staged": ${whA.read(auto.stageTable).count()}}""")
    (0 until 20).foreach { i =>
      val b = docs.where(isBatch && $"doc_id" % 200 === (i * 10).toLong)
        .select(($"doc_id" + 100000000L + i * 1000000L).as("doc_id"),
          $"text").persist()
      val nb = b.count()
      spark.catalog.clearCache()
      val (aSec, _) = timed(auto.landBatch(b, s"d:$i"))
      val aOpens = auto.expectedOpensPerBucket
      val (mSec, _) = timed(manual.landBatch(b, s"d:$i"))
      val mOpens = manual.expectedOpensPerBucket
      println(f"""{"phase": "drain", "i": $i, "batch": $nb, """ +
        f""""auto_sec": $aSec%.2f, "auto_opens": $aOpens%.2f, """ +
        f""""manual_sec": $mSec%.2f, "manual_opens": $mOpens%.2f}""")
    }
    val dupsA = whA.read(auto.verdictTable).where(!$"is_new").count()
    val dupsM = whM.read(manual.verdictTable).where(!$"is_new").count()
    println(s"""{"phase": "drain_summary", "dups_auto": $dupsA, """ +
      s""""dups_manual": $dupsM, "parity": ${dupsA == dupsM}}""")
  }
}
