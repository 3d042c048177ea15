package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.TextOps
import graft.pipeline.{SinkPolicy, Warehouse}

/** TEXT NEAR-DUP AT THE DOOR — [[VectorGate]]'s contract for DOCUMENT
  * payloads (round-9 verdict #5): every arriving micro-batch of
  * (doc_id, text) rows is verdicted against the landed corpus BEFORE it
  * lands, via the MinHash band family (`TextOps.minhashBands` /
  * `incrementalNeardup`'s batch-vs-corpus shape) over a PERSISTED band
  * stage table — the signature work for the corpus is paid once at its
  * own landing, never recomputed per batch, so a batch's verdict cost
  * is ∝ batch (its own shingling + banding) + candidates (the band
  * collisions), never ∝ corpus.
  *
  * Three tables move per micro-batch, each append tagged with the same
  * txn, the STAGE landing LAST as the replay guard (the [[VectorGate]]
  * discipline):
  *
  *   - `name_verdicts` (doc_id, n_dup_matches, dup_of, is_new) — the
  *     `incremental_neardup` row shape; dup_of = MIN matching doc_id;
  *   - `name_bands` (doc_id, band, k) — accepted docs' LSH bucket keys,
  *     the index later batches probe;
  *   - `name_stage` (doc_id, text) — accepted docs, the corpus of
  *     record and the authority the verify stage fetches candidate
  *     texts from.
  *
  * Replay windows (each step idempotent, spec-driven):
  *
  *   - verdicts landed, crash before bands/stage: replay recomputes
  *     identical verdicts (band/stage state unchanged), txn-skips the
  *     verdict append, lands the rest;
  *   - verdicts + bands landed, crash before stage: the batch's OWN
  *     stranded bands are invisible to its replay — the corpus band
  *     side anti-joins the batch's doc_ids out (so intra-batch pairs
  *     are judged ONLY by the deterministic lower-id-wins rule, never
  *     against their own half-landed store), and verify fetches texts
  *     from the STAGE, which never saw the batch;
  *   - stage landed, checkpoint behind: consume-and-skip.
  *
  * A candidate whose bands are stored but whose stage row is missing
  * (some OTHER batch's crash window) verifies against nothing and is
  * ignored — safe because foreachBatch serializes: that batch replays
  * (and lands its stage rows) before any later batch runs. Exact
  * Jaccard over full shingle sets verifies every reported pair, so
  * banding bounds recall only, exactly as in the batch family.
  *
  * doc_ids must be globally unique across all drops (the same
  * id-disjointness rule as [[VectorGate]]). No bootstrap special case:
  * an empty band store simply yields no corpus candidates, and
  * intra-batch duplicates are caught from the first drop.
  *
  * Reference anchor: the delta-landing contract the reference applies
  * to scraped rows (`datasources.py:748-756` — land only
  * new-vs-warehouse rows) with near-duplicate (not just key-equal)
  * arrivals caught at the door. */
final case class TextGate(wh: Warehouse, name: String) {

  private val spark = wh.spark
  import spark.implicits._

  def stageTable: String = s"${name}_stage"
  def bandTable: String = s"${name}_bands"
  def verdictTable: String = s"${name}_verdicts"

  /** The verdict computation alone (report threshold: exact Jaccard ≥
    * 0.30 over 3-gram shingle sets — the family's shared constant in
    * `TextOps.jaccardVerify`) — exposed so crash-window tests can
    * land a prefix of the batch's tables and then replay. `b`, `sets`,
    * `bands` must all describe the same batch ([[landBatch]] wires
    * them); reads the CURRENT band/stage stores. */
  private[streaming] def verdictsFor(b: DataFrame, sets: DataFrame,
                                     bands: DataFrame): DataFrame = {
    val batchIds = b.select($"doc_id")
    // corpus side: stored bands, minus any stranded rows of THIS batch
    // (a bands-landed/stage-missing replay must see the store as the
    // original run did — intra-batch pairs go through the lower-id rule)
    val stored =
      if (wh.currentFiles(bandTable).isEmpty) bands.limit(0)
      else wh.read(bandTable)
    val corpusBands = stored.join(batchIds, Seq("doc_id"), "left_anti")
    val corpusCand = bands.select($"doc_id".as("doc_a"), $"band", $"k")
      .join(corpusBands.select($"doc_id".as("doc_b"), $"band", $"k"),
        Seq("band", "k"))
    // intra-batch: lower doc_id wins (stays new), higher side verdicts
    val innerCand = bands.select($"doc_id".as("doc_a"), $"band", $"k")
      .join(bands.select($"doc_id".as("doc_b"), $"band", $"k"),
        Seq("band", "k"))
      .where($"doc_b" < $"doc_a")
    val cand = corpusCand.select($"doc_a", $"doc_b")
      .unionByName(innerCand.select($"doc_a", $"doc_b"))
      .distinct()
    // fetch ONLY the candidate corpus docs' texts (cost ∝ candidates);
    // batch-side sets are already at hand
    val corpusDocs =
      (if (wh.currentFiles(stageTable).isEmpty) b.limit(0)
       else wh.read(stageTable))
        .select($"doc_id", $"text")
        .join(cand.select($"doc_b".as("doc_id")).distinct(), Seq("doc_id"))
    val candSets = sets.unionByName(TextOps.shingleSets(corpusDocs))
    val dups = TextOps.jaccardVerify(cand, candSets)
      .groupBy($"doc_a")
      .agg(count(lit(1)).as("n_dup_matches"), min($"doc_b").as("dup_of"))
      .withColumnRenamed("doc_a", "doc_id")
    b.select($"doc_id")
      .join(dups, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_dup_matches", lit(0L)).as("n_dup_matches"),
        $"dup_of", $"dup_of".isNull.as("is_new"))
  }

  /** One logical micro-batch: verdict against the stored bands, record,
    * land accepted docs + their bands, stage last. Exposed publicly so
    * crash replays can be driven deterministically in tests; streaming
    * callers use [[drain]]. */
  def landBatch(batch: DataFrame, txn: String): Unit = {
    if (wh.txnLanded(stageTable, txn)) {
      // landed but checkpoint behind: consume-and-skip (see drainInto)
      batch.foreach(_ => ())
      return
    }
    val b = batch.persist()
    try {
      if (b.count() == 0L) return
      val sets = TextOps.shingleSets(b).persist()
      val bands = TextOps.minhashBandsUncached(sets).persist()
      try {
        val verdicts = verdictsFor(b, sets, bands).persist()
        try {
          wh.load(verdictTable, verdicts, SinkPolicy.Append, Some(txn))
          val acceptedIds = verdicts.where($"is_new").select($"doc_id")
          wh.load(bandTable, bands.join(acceptedIds, Seq("doc_id")),
            SinkPolicy.Append, Some(txn))
          wh.load(stageTable, b.join(acceptedIds, Seq("doc_id")),
            SinkPolicy.Append, Some(txn))
          ()
        } finally { verdicts.unpersist(); () }
      } finally { sets.unpersist(); bands.unpersist(); () }
    } finally { b.unpersist(); () }
  }

  /** Drain every pending drop through the gate, exactly-once per
    * micro-batch. `stream` carries (doc_id, text); `appId` must be
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
