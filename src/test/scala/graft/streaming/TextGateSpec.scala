package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.pipeline.{SinkPolicy, Warehouse}

/** The text dedup-at-the-door lifecycle: MinHash-band verdicts against
  * the persisted band store, accepted-only landing, intra-batch
  * lower-id-wins, and exactly-once across all three tables under replay
  * and partial-crash re-delivery. */
class TextGateSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic 20-word docs over a PER-SEED vocabulary (cross-doc
    * Jaccard is exactly 0 for distinct seeds); `mutate` substitutes one
    * word, perturbing 3 of 18 shingles — Jaccard 15/21 ≈ 0.71, far
    * above the 0.30 report threshold and band-colliding with its
    * source. */
  private def docText(seed: Int, mutate: Boolean = false): String =
    (0 until 20).map { i =>
      if (mutate && i == 3) "mutant" else s"w${seed}x${(i * 7 + seed) % 13}"
    }.mkString(" ")

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def verdicts(wh: Warehouse, gate: TextGate, from: Long)
      : Array[(Long, Long, Option[Long], Boolean)] =
    wh.read(gate.verdictTable).where($"doc_id" >= from)
      .as[(Long, Long, Option[Long], Boolean)].collect().sortBy(_._1)

  test("lifecycle: first drop all new, near-dups verdicted against the corpus, accepted-only landing") {
    val wh = Warehouse(spark, tmpDir("tg-wh"))
    val gate = TextGate(wh, "docs")

    // drop 1: ten distinct docs — an empty band store, everything lands
    gate.landBatch(docs((0L until 10L).map(i => i -> docText(i.toInt)): _*),
      "app:0")
    assert(wh.read(gate.stageTable).count() == 10L)
    assert(wh.read(gate.verdictTable).where($"is_new").count() == 10L)
    assert(wh.read(gate.bandTable).select($"doc_id").distinct().count() == 10L)

    // drop 2: 3 near-dups of corpus docs + 2 novel
    val b2 = docs(
      100L -> docText(0, mutate = true),
      101L -> docText(1, mutate = true),
      102L -> docText(2, mutate = true),
      103L -> docText(50),
      104L -> docText(51))
    gate.landBatch(b2, "app:1")
    val v = verdicts(wh, gate, 100L)
    assert(v.length == 5)
    assert(v.count(!_._4) == 3 && v.count(_._4) == 2)
    // each near-dup names its source (dup_of = MIN matching corpus id)
    assert(v(0)._3.contains(0L) && v(1)._3.contains(1L) && v(2)._3.contains(2L))
    // only the accepted 2 landed, bands grew by exactly those
    assert(wh.read(gate.stageTable).count() == 12L)
    assert(wh.read(gate.bandTable).select($"doc_id").distinct().count() == 12L)
  }

  test("intra-batch duplicates: lower id wins, higher side is dropped in the same drop") {
    val wh = Warehouse(spark, tmpDir("tg2-wh"))
    val gate = TextGate(wh, "docs")
    val b = docs(
      1L -> docText(7),
      2L -> docText(7, mutate = true), // near-dup of 1 within the batch
      3L -> docText(8))
    gate.landBatch(b, "app:0")
    val v = verdicts(wh, gate, 0L)
    assert(v.map(r => (r._1, r._4)).toSeq == Seq((1L, true), (2L, false), (3L, true)))
    assert(v(1)._3.contains(1L))
    assert(wh.read(gate.stageTable).count() == 2L)
  }

  test("crash windows: each table lands exactly once under partial re-delivery") {
    val wh = Warehouse(spark, tmpDir("tg3-wh"))
    val gate = TextGate(wh, "docs")
    gate.landBatch(docs((0L until 10L).map(i => i -> docText(i.toInt)): _*),
      "app:0")

    val b2 = docs(
      100L -> docText(0, mutate = true), // dup of corpus doc 0
      101L -> docText(60),               // novel
      102L -> docText(60, mutate = true) // intra-batch dup of 101
    ).persist()

    // WINDOW A — crash after the verdict append, before bands/stage:
    // land the verdicts alone, then replay the whole batch
    val sets = graft.ops.TextOps.shingleSets(b2).persist()
    val bands = graft.ops.TextOps.minhashBandsUncached(sets).persist()
    val v0 = gate.verdictsFor(b2, sets, bands).persist()
    wh.load(gate.verdictTable, v0, SinkPolicy.Append, Some("app:1"))
    gate.landBatch(b2, "app:1")
    assert(wh.read(gate.verdictTable).count() == 13L, "no double verdicts")
    assert(wh.read(gate.stageTable).count() == 11L)
    assert(wh.read(gate.bandTable).select($"doc_id").distinct().count() == 11L)

    // replay verdicts equal the originally-landed ones
    val replayed = verdicts(wh, gate, 100L)
    val original = v0.as[(Long, Long, Option[Long], Boolean)]
      .collect().sortBy(_._1)
    assert(replayed.toSeq == original.toSeq)
    v0.unpersist(); sets.unpersist(); bands.unpersist()

    // WINDOW B — crash after verdicts + bands, before stage: the
    // batch's stranded bands must not poison its own replay
    val b3 = docs(
      200L -> docText(70),
      201L -> docText(70, mutate = true), // intra-batch dup of 200
      202L -> docText(71)).persist()
    val sets3 = graft.ops.TextOps.shingleSets(b3).persist()
    val bands3 = graft.ops.TextOps.minhashBandsUncached(sets3).persist()
    val v3 = gate.verdictsFor(b3, sets3, bands3).persist()
    wh.load(gate.verdictTable, v3, SinkPolicy.Append, Some("app:2"))
    // stranded bands: ONLY the accepted side, in the gate's stored
    // shape (bkt + clustering), as the real landing does
    wh.load(gate.bandTable,
      gate.storedBandRows(bands3, v3.where($"is_new").select($"doc_id"), 3L),
      SinkPolicy.Append, Some("app:2"))
    gate.landBatch(b3, "app:2")
    val v3r = verdicts(wh, gate, 200L)
    assert(v3r.map(r => (r._1, r._4)).toSeq ==
      Seq((200L, true), (201L, false), (202L, true)),
      s"replay with stranded bands must reproduce the original verdicts: ${v3r.toSeq}")
    assert(wh.read(gate.verdictTable).count() == 16L)
    assert(wh.read(gate.stageTable).count() == 13L)
    // per-doc band rows landed exactly once (8 bands per doc)
    val perDoc = wh.read(gate.bandTable).groupBy($"doc_id").count()
      .select($"count").distinct().as[Long].collect().toSet
    assert(perDoc == Set(8L), s"every doc exactly 8 band rows, got $perDoc")
    v3.unpersist(); sets3.unpersist(); bands3.unpersist()

    // WINDOW C — full replay: nothing moves
    gate.landBatch(b3, "app:2")
    assert(wh.read(gate.verdictTable).count() == 16L)
    assert(wh.read(gate.stageTable).count() == 13L)
    b2.unpersist(); b3.unpersist()
  }

  test("streaming end-to-end: two drains through a checkpointed file source") {
    val src = tmpDir("tg4-src")
    val ckpt = tmpDir("tg4-ckpt")
    val wh = Warehouse(spark, tmpDir("tg4-wh"))
    val gate = TextGate(wh, "docs")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def stream = spark.readStream.schema(schema).parquet(src)

    docs((0L until 10L).map(i => i -> docText(i.toInt)): _*)
      .write.mode("append").parquet(src)
    gate.drain(stream, ckpt, "tg")
    assert(wh.read(gate.stageTable).count() == 10L)

    docs(100L -> docText(3, mutate = true), 101L -> docText(80))
      .write.mode("append").parquet(src)
    gate.drain(stream, ckpt, "tg")
    assert(wh.read(gate.stageTable).count() == 11L)
    assert(wh.read(gate.verdictTable).where(!$"is_new").count() == 1L)

    // a re-drain with nothing pending moves nothing
    gate.drain(stream, ckpt, "tg")
    assert(wh.read(gate.stageTable).count() == 11L)
    assert(wh.read(gate.verdictTable).count() == 12L)
  }

  test("bucket-pruned probe: identical verdicts to an unpruned gate, fewer files opened") {
    // two gates over the same drops: bandBuckets=1 collapses every band
    // to bucket 0, so its probe's readInSet keeps EVERY file — the
    // full-scan reference — while the default gate prunes
    val whP = Warehouse(spark, tmpDir("tg5-wh-pruned"))
    val whF = Warehouse(spark, tmpDir("tg5-wh-full"))
    val pruned = TextGate(whP, "docs")
    val full = TextGate(whF, "docs", bandBuckets = 1)
    val drops = Seq(
      docs((0L until 40L).map(i => i -> docText(i.toInt)): _*),
      docs(100L -> docText(1, mutate = true), 101L -> docText(70),
           102L -> docText(2, mutate = true)),
      docs(200L -> docText(70, mutate = true), 201L -> docText(71),
           202L -> docText(5, mutate = true), 203L -> docText(101)))
    drops.zipWithIndex.foreach { case (d, i) =>
      pruned.landBatch(d, s"app:$i"); full.landBatch(d, s"app:$i")
    }
    val vP = wallVerdicts(whP, pruned)
    val vF = wallVerdicts(whF, full)
    assert(vP.nonEmpty && vP.sameElements(vF))
    // the same near-dups were caught (2 in drop 2, 2 in drop 3)
    assert(vP.count(!_._4) == 4)

    // the probe's driver-side state is bounded by the batch: one doc
    // yields ≤ 8 buckets, and the pruned read is superset-safe — every
    // stored row whose bkt is probed survives the file skip
    val bands = graft.ops.TextOps.minhashBandsUncached(
      graft.ops.TextOps.shingleSets(docs(999L -> docText(7))))
    val bkts = pruned.batchBuckets(bands)
    assert(bkts.nonEmpty && bkts.size <= 8)
    val inSet = whP.readInSet(pruned.bandTable, "bkt", bkts)
    val expect = whP.read(pruned.bandTable)
      .where($"bkt".isin(bkts: _*)).count()
    assert(inSet.where($"bkt".isin(bkts: _*)).count() == expect)
  }

  test("compacted band store: probe prunes across the rewritten layout with verdicts unchanged") {
    val wh = Warehouse(spark, tmpDir("tg6-wh"))
    // manual-maintenance gate: the auto-compactor would fire mid-drop
    // sequence and leave nothing for the explicit compactBands to prove
    val gate = TextGate(wh, "docs", autoCompactBar = None)
    // many small drops fragment the store: one file per drop, each
    // spanning most of the bucket space
    (0 until 12).foreach { i =>
      gate.landBatch(docs((0 until 4).map(j =>
        (i * 10L + j) -> docText(i * 4 + j)): _*), s"app:$i")
    }
    val before = wh.currentFiles(gate.bandTable).size
    assert(before == 12)
    // tiny target → several bkt-disjoint files after the rewrite
    gate.compactBands(targetBytesPerFile = 4L << 10)
    val m = graft.pipeline.TxnLog.current(
      java.nio.file.Paths.get(wh.root, gate.bandTable)).get
    assert(m.files.size > 1, "compaction produced one file — prune test is vacuous")
    // a one-doc probe against the compacted layout opens a strict subset
    val bands = graft.ops.TextOps.minhashBandsUncached(
      graft.ops.TextOps.shingleSets(docs(999L -> docText(3))))
    val opened = wh.prunedFilesInSet(m, gate.bandTable, "bkt",
      gate.batchBuckets(bands))
    assert(opened.size < m.files.size)
    // and the gate still catches a near-dup through the pruned probe
    gate.landBatch(docs(500L -> docText(7, mutate = true),
                        501L -> docText(300)), "app:post")
    val v = wallVerdicts(wh, gate).filter(_._1 >= 500L)
    assert(v.map(r => (r._1, r._4)).toSeq == Seq((500L, false), (501L, true)))
    // seed 7 landed as doc_id 13 (drop 1, j = 3): dup_of names it
    assert(v.find(_._1 == 500L).get._3.contains(13L))
  }

  test("fragmentation census: appends raise expectedOpensPerBucket, compaction restores it") {
    val wh = Warehouse(spark, tmpDir("tg7-wh"))
    val gate = TextGate(wh, "docs", autoCompactBar = None)
    assert(gate.expectedOpensPerBucket == 0.0, "empty store probes nothing")
    assert(!gate.maintenanceNeeded())

    // each drop lands one file spanning most of the bucket range, so the
    // census counts ≈ one open per drop per probed bucket
    (0 until 6).foreach { i =>
      gate.landBatch(docs((0 until 4).map(j =>
        (i * 10L + j) -> docText(i * 4 + j)): _*), s"app:$i")
    }
    val frag = gate.expectedOpensPerBucket
    assert(frag > 4.0 && frag <= 6.0,
      s"six one-file drops must census ≈ 6 opens/bucket, got $frag")
    assert(gate.maintenanceNeeded(), "fragmentation past the bar")

    // out-of-band compaction: bkt-disjoint files telescope the census
    // back to ≈ 1 (strictly ≤ 1 + files — span overlaps only at seams)
    gate.compactBands(targetBytesPerFile = 4L << 10)
    val after = gate.expectedOpensPerBucket
    assert(after < 1.5, s"compacted store must census ≈ 1, got $after")
    assert(!gate.maintenanceNeeded())

    // the census is advisory only: verdicts are identical either side
    // (pinned by the compaction spec above); here just prove the gate
    // still verdicts through the compacted layout
    gate.landBatch(docs(900L -> docText(2, mutate = true)), "app:post")
    assert(wallVerdicts(wh, gate).count(v => v._1 == 900L && !v._4) == 1)
  }

  test("auto-compaction at the door: long drain keeps probe opens at the bar, verdicts unchanged") {
    val whA = Warehouse(spark, tmpDir("tg9-wh-auto"))
    val whM = Warehouse(spark, tmpDir("tg9-wh-manual"))
    val auto = TextGate(whA, "docs") // default bar 4.0
    val manual = TextGate(whM, "docs", autoCompactBar = None)
    // a 12-drop drain, each drop one fragmenting file + one near-dup of
    // an earlier drop from drop 4 on (so verdicts depend on the store
    // layout the probe reads at every stage)
    (0 until 12).foreach { i =>
      val fresh = (0 until 3).map(j => (i * 10L + j) -> docText(i * 3 + j))
      val d =
        if (i >= 4) docs((fresh :+ ((i * 10L + 9L) -> docText(i - 4, mutate = true))): _*)
        else docs(fresh: _*)
      auto.landBatch(d, s"app:$i"); manual.landBatch(d, s"app:$i")
      // the invariant the wiring exists for: the census never walks away
      // (≤ bar fragmented batches + the current batch's own file)
      assert(auto.expectedOpensPerBucket <= 5.5,
        s"drop $i: auto gate censused ${auto.expectedOpensPerBucket}")
    }
    // the manual gate fragmented linearly — the +1/batch decay the auto
    // gate is keeping flat
    assert(manual.expectedOpensPerBucket > 10.0)
    // verdicts are bit-identical across the two maintenance policies
    val vA = wallVerdicts(whA, auto)
    assert(vA.nonEmpty && vA.sameElements(wallVerdicts(whM, manual)))
    assert(vA.count(!_._4) == 8, "every planted near-dup caught")

    // replay-safety around the compaction commit: fragment past the bar,
    // run the compaction that a crashed landBatch would have committed,
    // then replay the batch — it must land exactly once against the
    // rewritten store with the same verdicts
    val b = docs(500L -> docText(5, mutate = true), 501L -> docText(400))
    auto.compactBands()
    auto.landBatch(b, "app:crash")
    val v = wallVerdicts(whA, auto).filter(_._1 >= 500L)
    assert(v.map(r => (r._1, r._4)).toSeq == Seq((500L, false), (501L, true)))
    // and a full replay of the same txn moves nothing
    val counts = (whA.read(auto.verdictTable).count(),
      whA.read(auto.stageTable).count(), whA.read(auto.bandTable).count())
    auto.landBatch(b, "app:crash")
    assert((whA.read(auto.verdictTable).count(),
      whA.read(auto.stageTable).count(),
      whA.read(auto.bandTable).count()) == counts)
  }

  test("legacy band store without a bkt zone map: census reports file count instead of throwing") {
    val wh = Warehouse(spark, tmpDir("tg8-wh"))
    val gate = TextGate(wh, "docs")
    // a pre-declaration store: the gate's own band rows landed WITHOUT
    // the bkt stats declaration (and without the bkt column at all) —
    // the store shape verdictsFor already full-scan-tolerates
    val corpus = docs((0L until 6L).map(i => i -> docText(i.toInt)): _*)
    val bands = graft.ops.TextOps.minhashBandsUncached(
      graft.ops.TextOps.shingleSets(corpus))
    wh.load(gate.bandTable, bands.select($"doc_id", $"band", $"k"),
      SinkPolicy.Append, Some("legacy:0"))
    wh.load(gate.stageTable, corpus, SinkPolicy.Append, Some("legacy:0"))
    assert(wh.statsColsOf(gate.bandTable).isEmpty)
    // the ADVISORY census must degrade to the conservative answer
    // (every file opened per probe), never crash the scheduler
    val opens = gate.expectedOpensPerBucket
    assert(opens == wh.currentFiles(gate.bandTable).size.toDouble)
    assert(!gate.maintenanceNeeded(bar = opens + 1.0))
    // and the verdict path full-scans the same store: a near-dup is caught
    val b = docs(100L -> docText(2, mutate = true))
    val bs = graft.ops.TextOps.shingleSets(b)
    val v = gate.verdictsFor(b, bs,
      graft.ops.TextOps.minhashBandsUncached(bs))
      .as[(Long, Long, Option[Long], Boolean)].collect()
    assert(v.toSeq == Seq((100L, 1L, Some(2L), false)))
  }

  private def wallVerdicts(wh: Warehouse, gate: TextGate)
      : Array[(Long, Long, Option[Long], Boolean)] =
    wh.read(gate.verdictTable)
      .select($"doc_id", $"n_dup_matches", $"dup_of", $"is_new")
      .as[(Long, Long, Option[Long], Boolean)].collect().sortBy(_._1)
}
