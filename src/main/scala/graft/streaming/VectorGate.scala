package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.AnnIndex
import graft.pipeline.{SinkPolicy, Warehouse}

/** STREAMING DEDUP-AT-THE-DOOR — the [[graft.ops.AnnIndex]] lifecycle
  * wired into the micro-batch landing discipline: every embedding drop
  * is verdicted against the stored index BEFORE it lands, accepted
  * vectors join the corpus stage table, duplicates are recorded and
  * dropped.
  *
  * INDEX MAINTENANCE IS OUT-OF-BAND (round-9 verdict #1). A rebuild is
  * O(corpus) — 95.5 s at 2M vectors, hours at 10¹¹ — so running it
  * inline in a micro-batch (round 9's shape) stalls the stream for a
  * full corpus pass while input queues. Instead the index is
  * GENERATIONAL:
  *
  *   - the gate serves generation `g` (index tables `name_g<g>_ann_*`;
  *     the head pointer is one tiny warehouse table, `name_idxgen`);
  *   - [[prepareRebuild]] — a maintenance job, never the stream path —
  *     builds generation `g+1` from a PINNED stage snapshot (version
  *     `v0`) while drains keep verdicting against `g`, then publishes a
  *     `pending` pointer row;
  *   - the next [[landBatch]] cuts over FIRST: it indexes the stage
  *     rows that landed after `v0` into `g+1` (a
  *     [[Warehouse.readAppendedBetween]] CDC read — cost ∝ rows landed
  *     during the build, never the corpus; txn-tagged so a
  *     crash-replay of the cutover is a no-op), then atomically swaps
  *     the head pointer. Old-generation tables stay until vacuum
  *     (readers pinned to them finish on their snapshot).
  *
  * Index work on the stream path is bounded by BATCH-scale cost, never
  * corpus-scale, via a three-tier staleness response:
  *
  *   - GROWTH trips (indexed rows ≥ 2× built_n) wait for the
  *     out-of-band rebuild above — O(corpus), never inline;
  *   - SKEW trips (one cell ≥ 16× the modulus — a correlated batch's
  *     flood) are repaired IN PLACE at the top of the next
  *     [[landBatch]] ([[AnnIndex.repairHotCells]]: split only the hot
  *     cells, O(Σ|hot cell|) ≈ the defect's own size — 12–18 s at the
  *     2M/4M decades vs the 95.5 s rebuild, STRESS_r10 §3/§6);
  *   - residual sub-bar skew (4–16× cells) is thinned by the
  *     bounded-grind cap inside the verdict probe, trading bounded
  *     recall inside those cells for a bounded wall.
  *
  * The round-10 measurement that forced the middle tier: at 4M vectors
  * a post-flood batch OOM'd even UNDER the cap (the capped pipeline's
  * residual working set at local[32]'s 32 tasks/JVM), while repair
  * first + healthy-geometry verdicts ran at baseline (STRESS_r10 §6).
  *
  * Three tables move per micro-batch — the serving generation's
  * entries (via [[AnnIndex.ingest]]), `name_verdicts`, `name_stage` —
  * each append tagged with the same `appId:batchId` txn, each table's
  * log independently idempotent. The STAGE table lands LAST and is the
  * gate's replay guard: once it committed, the whole logical batch did
  * (a replay consumes-and-skips); a crash anywhere earlier re-runs the
  * batch against steps that are each safe to repeat —
  *
  *   - index append: skipped via its own txn tag ([[AnnIndex.ingest]]);
  *     verdict recompute is stable because the self-pair filter hides
  *     the batch's own already-landed entries;
  *   - bootstrap build: an Overwrite of deterministically-derived
  *     artifacts — value-idempotent (the branch is chosen by "is the
  *     stage table empty", and the stage lands last, so a mid-bootstrap
  *     replay re-enters bootstrap);
  *   - verdict append: skipped via its txn tag;
  *   - generation cutover: catch-up append skipped via its
  *     deterministic range txn, pointer swap value-idempotent.
  *
  * The crash-replay × rebuild window (round-9 ADVICE, medium): a batch
  * that died after its index append but before its stage landing,
  * replayed AFTER a rebuild whose snapshot predates the batch, must not
  * lose the accepted arrivals behind the entries table's txn skip. The
  * generational design closes it structurally: the rebuild lands in a
  * NEW generation's entries table, so the replay's ingest against `g+1`
  * sees a fresh txn and appends the arrivals — nothing is orphaned
  * (VectorGateSpec drives exactly this window). The one replay corner
  * that can differ is doc'd at [[AnnIndex.ingest]]: a batch containing
  * accepted intra-batch near-pairs re-verdicts those against each
  * other. The STORE stays exactly-once in every window.
  *
  * Reference anchor: the reference's scrape pipelines land only
  * new-vs-warehouse rows each run (`datasources.py:748-756` delta
  * landing); this is that contract for embedding payloads, with
  * near-duplicate (not just key-equal) arrivals caught at the door. */
final case class VectorGate(wh: Warehouse, name: String) {

  private val spark = wh.spark
  import spark.implicits._

  def stageTable: String = s"${name}_stage"
  def verdictTable: String = s"${name}_verdicts"

  /** Head/pending generation pointers — one tiny table, rows
    * (kind, gen, stage_version). `head` is the generation the gate
    * serves; `pending` (if newer) is a fully-built next generation
    * waiting for its between-batches cutover. */
  def genTable: String = s"${name}_idxgen"

  private def genState: (Option[Long], Option[(Long, Long)]) =
    if (wh.currentFiles(genTable).isEmpty) (None, None)
    else {
      val rows = wh.read(genTable)
        .select($"kind", $"gen", $"stage_version")
        .as[(String, Long, Long)].collect()
      (rows.collectFirst { case ("head", g, _) => g },
        rows.collectFirst { case ("pending", g, v) => (g, v) })
    }

  private def writeGen(rows: Seq[(String, Long, Long)]): Unit = {
    wh.load(genTable, rows.toDF("kind", "gen", "stage_version"),
      SinkPolicy.Overwrite)
    ()
  }

  private def idxAt(gen: Long): AnnIndex = AnnIndex(wh, s"${name}_g$gen")

  /** The generation currently served (0 before any bootstrap). */
  def headGen: Long = genState._1.getOrElse(0L)

  /** The LIVE index — always the last healthy generation; a pending
    * rebuild becomes visible only after a [[landBatch]] cutover. */
  def idx: AnnIndex = idxAt(headGen)

  /** True when the SERVING generation's geometry is stale (growth or
    * hot-cell skew — [[AnnIndex.needsRebuild]]) and a maintenance
    * [[prepareRebuild]] should be scheduled. Never consulted on the
    * stream path: a stale geometry degrades probe cost, it does not
    * block landing. Skew-class trips normally self-heal at the next
    * [[landBatch]] (the door repair), so a PERSISTENT true here means
    * growth — schedule the rebuild. */
  def maintenanceNeeded(): Boolean =
    wh.currentFiles(stageTable).nonEmpty && idx.needsRebuild()

  /** OUT-OF-BAND rebuild — run from a maintenance job (or a background
    * thread), NEVER from the micro-batch path. Builds generation
    * head+1 from a pinned snapshot of the stage table; concurrent
    * [[landBatch]]es keep serving (and appending entries to) the
    * current head meanwhile. Publishes a `pending` pointer on success;
    * the swap itself happens between batches (see [[landBatch]]).
    * Returns the prepared generation, or None when there is nothing to
    * rebuild from (no bootstrap yet). Single-maintainer discipline:
    * run one rebuild at a time per gate (the standard contract for
    * out-of-band compaction/reindex jobs). */
  def prepareRebuild(): Option[Long] = {
    val (headOpt, _) = genState
    for {
      head <- headOpt
      v0 <- wh.currentVersion(stageTable)
    } yield {
      val next = head + 1
      idxAt(next).build(wh.readVersion(stageTable, v0))
      writeGen(Seq(("head", head, -1L), ("pending", next, v0)))
      next
    }
  }

  /** The between-batches half of the rebuild: index the stage rows that
    * landed after the snapshot into the pending generation (CDC read,
    * cost ∝ rows-landed-during-build), then swap the head pointer.
    * Idempotent under crash-replay: the catch-up append's txn encodes
    * its exact version range, and the pointer swap is a value-identical
    * Overwrite. */
  private def cutoverIfPending(): Unit = {
    val (headOpt, pendingOpt) = genState
    for (head <- headOpt; (next, v0) <- pendingOpt if next > head) {
      val v1 = wh.currentVersion(stageTable).getOrElse(v0)
      if (v1 > v0) {
        idxAt(next).indexVectors(
          wh.readAppendedBetween(stageTable, v0, v1),
          s"cutover:g$next:$v0-$v1")
        ()
      }
      writeGen(Seq(("head", next, -1L)))
    }
  }

  /** One logical micro-batch: cut over to a pending generation if one
    * is ready, repair a skew-tripped geometry in place, then verdict,
    * record, land. `batch` carries [[graft.ops.Similarity]]'s quantized
    * shape (vec_id, qe, nrm); vec_ids must be globally unique across
    * all drops (the ingest id-disjointness rule). Exposed publicly so
    * crash replays can be driven deterministically in tests; streaming
    * callers use [[drain]].
    *
    * `autoRepairSkew`: hot cells at-or-past this multiple of the
    * serving index's modulus are split IN PLACE
    * ([[AnnIndex.repairHotCells]]) before the batch verdicts — cost
    * ∝ Σ|hot cell|, batch-scale like the landing itself, NOT the
    * O(corpus) rebuild (which stays out-of-band). Without it the gate's
    * only defenses against a flooded cell were the grind cap (bounded
    * wall, degraded recall — 66 verdicts lost at the 1000× decade) or
    * the cap-less grind (heap death at the 2000× decade, STRESS_r10
    * §6). `None` disables (the measurement harness's stale-geometry
    * baseline); the default equals [[AnnIndex.needsRebuild]]'s skew
    * bar, so the door repairs exactly the geometries maintenance would
    * have flagged. */
  def landBatch(batch: DataFrame, txn: String,
                threshold: Double = 0.90,
                autoRepairSkew: Option[Double] = Some(16.0)): Unit = {
    if (wh.txnLanded(stageTable, txn)) {
      // landed but checkpoint behind: consume-and-skip (see drainInto)
      batch.foreach(_ => ())
      return
    }
    cutoverIfPending()
    if (wh.currentFiles(stageTable).isEmpty) {
      // bootstrap: nothing to dedup against — everything is new
      val b = batch.persist()
      try {
        if (b.count() == 0L) return
        idxAt(0L).build(b)
        writeGen(Seq(("head", 0L, -1L)))
        val verdicts = b.select($"vec_id",
          lit(null).cast("long").as("dup_of"),
          lit(null).cast("long").as("cos_q6"),
          lit(true).as("is_new"))
        wh.load(verdictTable, verdicts, SinkPolicy.Append, Some(txn))
        wh.load(stageTable, b, SinkPolicy.Append, Some(txn))
        ()
      } finally { b.unpersist(); () }
    } else {
      val corpus = wh.read(stageTable)
      // bounded-grind guard: while a stale (hot-cell) geometry waits
      // for out-of-band maintenance, thin any cell past 4× the expected
      // √n size before the probe join, so a correlated batch's
      // per-arrival candidate budget stays at healthy-cell width
      // instead of grinding ~2·10⁹ pairs into the shortlist shuffle
      // (STRESS_r09 §11; a first cut of this cap at 64× sat ABOVE the
      // measured 28× bomb and reproduced the OOM — the calibration is
      // "just past healthy", not "just past staleness": healthy cells
      // measure 2.3–4× post-rebuild, the skew trip is 16×). Dup recall
      // inside a thinned cell degrades until the rebuild lands — a
      // bounded false-accept window beats a stalled stream.
      val liveIdx = idx
      // SELF-HEALING AT THE DOOR (round 10): a correlated earlier batch
      // can flood one cell past the skew bar (the STRESS_r09 §11 bomb —
      // +2.4% growth, invisible to the growth criterion) and every
      // later batch's probe into it pays |cell| candidates. The repair
      // is O(Σ|hot cell|) — 18.2 s for a 41k-member cell at 2M vectors,
      // 12.3 s at 4M (STRESS_r10 §3/§6) — the same cost class as the
      // batch itself, so it belongs ON the stream path, unlike the
      // O(corpus) rebuild it replaces for this defect class. The census
      // that detects it is an O(√n) read of the MAINTAINED cells table
      // (AnnIndex.cellCensus, kept current by CDC merge at each ingest;
      // a full O(index) aggregation is paid only once when rebuilding
      // the census after a disruption); a healthy geometry repairs
      // nothing and pays only that census. Crash
      // replay: the repair is value-idempotent (ranked re-draft is
      // anti-joined against landed centroids; re-running on a healed
      // census is a no-op), and a crash between its centroid append and
      // entries upsert leaves the same boundary-staleness class probe-2
      // already covers — the replayed batch repairs the still-hot cell
      // before verdicting.
      autoRepairSkew.foreach { bar =>
        liveIdx.repairHotCells(corpus, bar)
        ()
      }
      val cap = Some(4L * liveIdx.meta.ivfModulus)
      val res = liveIdx.ingest(batch, corpus, txn, threshold, cap)
      try {
        wh.load(verdictTable, res.verdicts, SinkPolicy.Append, Some(txn))
        val accepted = batch.join(
          res.verdicts.where($"is_new").select($"vec_id"), Seq("vec_id"))
        wh.load(stageTable, accepted, SinkPolicy.Append, Some(txn))
        ()
      } finally { res.verdicts.unpersist(); () }
    }
  }

  /** Drain every pending drop through the gate, exactly-once per
    * micro-batch. `stream` is the quantized embedding stream
    * ([[EmbeddingStage.quantize]] over a file source). `appId` must be
    * stable across restarts of the same logical pipeline. */
  def drain(stream: DataFrame, checkpointDir: String,
            appId: String): StreamingQuery = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, s"$appId:$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
