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
  * dropped, and the index maintains itself (bootstrap on the first
  * batch, skew/growth-triggered rebuild before a verdict pass ever runs
  * against a known-stale geometry — the 1000×-decade hot-cell lesson,
  * STRESS_r09 §11).
  *
  * Three tables move per micro-batch — `name_ann_*` (via
  * [[AnnIndex.ingest]]), `name_verdicts`, `name_stage` — each append
  * tagged with the same `appId:batchId` txn, each table's log
  * independently idempotent. The STAGE table lands LAST and is the
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
  *   - verdict append: skipped via its txn tag.
  *
  * The one replay corner that can differ is doc'd at
  * [[AnnIndex.ingest]]: a batch containing accepted intra-batch
  * near-pairs re-verdicts those against each other. The STORE stays
  * exactly-once in every window; VectorGateSpec drives the windows
  * directly.
  *
  * Reference anchor: the reference's scrape pipelines land only
  * new-vs-warehouse rows each run (`datasources.py:748-756` delta
  * landing); this is that contract for embedding payloads, with
  * near-duplicate (not just key-equal) arrivals caught at the door. */
final case class VectorGate(wh: Warehouse, name: String) {

  private val spark = wh.spark
  import spark.implicits._

  val idx: AnnIndex = AnnIndex(wh, name)
  def stageTable: String = s"${name}_stage"
  def verdictTable: String = s"${name}_verdicts"

  /** One logical micro-batch: verdict, record, land. `batch` carries
    * [[graft.ops.Similarity]]'s quantized shape (vec_id, qe, nrm);
    * vec_ids must be globally unique across all drops (the ingest
    * id-disjointness rule). Exposed publicly so crash replays can be
    * driven deterministically in tests; streaming callers use
    * [[drain]]. */
  def landBatch(batch: DataFrame, txn: String,
                threshold: Double = 0.90): Unit = {
    if (wh.txnLanded(stageTable, txn)) {
      // landed but checkpoint behind: consume-and-skip (see drainInto)
      batch.foreach(_ => ())
      return
    }
    if (wh.currentFiles(stageTable).isEmpty) {
      // bootstrap: nothing to dedup against — everything is new
      val b = batch.persist()
      try {
        if (b.count() == 0L) return
        idx.build(b)
        val verdicts = b.select($"vec_id",
          lit(null).cast("long").as("dup_of"),
          lit(null).cast("long").as("cos_q6"),
          lit(true).as("is_new"))
        wh.load(verdictTable, verdicts, SinkPolicy.Append, Some(txn))
        wh.load(stageTable, b, SinkPolicy.Append, Some(txn))
        ()
      } finally { b.unpersist(); () }
    } else {
      // repair a stale geometry BEFORE verdicting against it: a hot
      // cell (correlated past batch) or 2x growth makes the verdict
      // pass itself the casualty (STRESS_r09 §11's 2e9-pair grind)
      if (idx.needsRebuild()) idx.build(wh.read(stageTable))
      val corpus = wh.read(stageTable)
      val res = idx.ingest(batch, corpus, txn, threshold)
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
