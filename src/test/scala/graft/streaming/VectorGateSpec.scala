package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.pipeline.Warehouse

/** The streaming dedup-at-the-door lifecycle: bootstrap on the first
  * drop, near-dup verdicts against the stored index on every later one,
  * accepted-only landing, and exactly-once across all three tables
  * under replay and partial-crash re-delivery. */
class VectorGateSpec extends SparkTestBase {
  import spark.implicits._

  private val emb = "/root/testdata/sf0.001/embeddings.parquet"

  /** Quantized slice of the fixture embeddings with ids offset into a
    * private range (the gate's global-uniqueness rule). */
  private def slice(from: Int, until: Int, idBase: Long,
                    perturb: Boolean = false): DataFrame = {
    val raw = spark.read.parquet(emb)
      .where($"vec_id" >= from && $"vec_id" < until)
    val shifted =
      if (!perturb) raw.select(($"vec_id" + idBase).as("vec_id"), $"embedding")
      else raw.select(($"vec_id" + idBase).as("vec_id"),
        expr("transform(embedding, (x, i) -> CASE WHEN i % 7 = 0 " +
          "THEN x + CAST(0.001 AS FLOAT) ELSE x END)").as("embedding"))
    EmbeddingStage.quantize(shifted)
  }

  test("gate lifecycle: bootstrap, near-dup verdicts, accepted-only landing") {
    val wh = Warehouse(spark, tmpDir("vg-wh"))
    val gate = VectorGate(wh, "emb")

    // drop 1 bootstraps: all 40 vectors accepted, index built
    gate.landBatch(slice(0, 40, 1000L), "app:0")
    assert(wh.read(gate.stageTable).count() == 40L)
    assert(wh.read(gate.verdictTable).where($"is_new").count() == 40L)
    assert(gate.idx.builtN.contains(40L))

    // drop 2: 10 near-identical re-arrivals (perturbed copies of drop
    // 1's first ten) + 10 genuinely new vectors
    val nearDups = slice(0, 10, 2000L, perturb = true)
    val novel = slice(40, 50, 2000L)
    gate.landBatch(nearDups.unionByName(novel), "app:1")

    val v2 = wh.read(gate.verdictTable)
      .where($"vec_id" >= 2000L)
      .as[(Long, Option[Long], Option[Long], Boolean)].collect()
    assert(v2.length == 20)
    val (dups, news) = v2.partition(!_._4)
    assert(dups.length == 10 && news.length == 10)
    // each near-dup names its drop-1 source: id 2000+i dups 1000+i
    dups.foreach { case (vid, dupOf, cosQ6, _) =>
      assert(dupOf.contains(vid - 1000L), s"$vid -> $dupOf")
      assert(cosQ6.exists(_ >= 900000L))
    }
    // only the accepted 10 landed; the index grew by exactly those
    assert(wh.read(gate.stageTable).count() == 50L)
    assert(gate.idx.indexedRows == 50L)
  }

  test("replay and partial-crash re-delivery keep all three tables exactly-once") {
    val wh = Warehouse(spark, tmpDir("vg2-wh"))
    val gate = VectorGate(wh, "emb")
    gate.landBatch(slice(0, 40, 1000L), "app:0")

    val batch2 = slice(0, 10, 2000L, perturb = true)
      .unionByName(slice(40, 50, 2000L)).persist()

    // WINDOW A — crash after the index append, before verdicts/stage
    // landed: simulate by running the ingest half alone, then the full
    // re-delivered batch
    val r = gate.idx.ingest(batch2, wh.read(gate.stageTable), "app:1")
    assert(r.accepted == 10L)
    r.verdicts.unpersist()
    gate.landBatch(batch2, "app:1")
    assert(gate.idx.indexedRows == 50L, "no double entries append")
    assert(wh.read(gate.stageTable).count() == 50L)
    assert(wh.read(gate.verdictTable).count() == 60L)

    // WINDOW B — full replay (crash between stage commit and checkpoint
    // advance): everything already landed, nothing may move
    gate.landBatch(batch2, "app:1")
    assert(gate.idx.indexedRows == 50L)
    assert(wh.read(gate.stageTable).count() == 50L)
    assert(wh.read(gate.verdictTable).count() == 60L)
    batch2.unpersist()
  }

  test("out-of-band rebuild: landings proceed during the build, cutover catches up exactly-once") {
    val wh = Warehouse(spark, tmpDir("vg4-wh"))
    val gate = VectorGate(wh, "emb")
    gate.landBatch(slice(0, 40, 1000L), "app:0") // bootstrap gen 0
    assert(gate.headGen == 0L)

    // maintenance runs on a BACKGROUND thread while a drop lands —
    // the decoupling the round-9 verdict asked for: no stream stall
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val rebuild = Future(gate.prepareRebuild())
    gate.landBatch(slice(40, 50, 3000L), "app:1")
    assert(Await.result(rebuild, 5.minutes).contains(1L))

    // next batch cuts over FIRST (catch-up indexes whatever landed
    // after the snapshot), then verdicts against generation 1: a
    // near-dup of an app:1 row proves the catch-up indexed it
    val echo = slice(40, 45, 4000L, perturb = true)
    gate.landBatch(echo, "app:2")
    assert(gate.headGen == 1L)
    val v = wh.read(gate.verdictTable)
      .where($"vec_id" >= 4000L)
      .as[(Long, Option[Long], Option[Long], Boolean)].collect()
    assert(v.length == 5 && v.forall(!_._4))
    v.foreach { case (vid, dupOf, _, _) =>
      assert(dupOf.contains(vid - 1000L), s"$vid -> $dupOf") }
    assert(wh.read(gate.stageTable).count() == 50L)
    assert(gate.idx.indexedRows == 50L,
      "live generation must contain bootstrap + catch-up rows")

    // replay of the cutover batch: nothing moves anywhere
    gate.landBatch(echo, "app:2")
    assert(gate.headGen == 1L)
    assert(wh.read(gate.stageTable).count() == 50L)
    assert(gate.idx.indexedRows == 50L)
  }

  test("crashed ingest replayed after an out-of-band rebuild keeps its arrivals indexed") {
    // the round-9 ADVICE window: batch crashes AFTER its index append,
    // a rebuild whose snapshot predates the batch lands, then the batch
    // replays — the old in-place rebuild lost the accepted arrivals
    // behind the entries table's txn skip; generations close it
    val wh = Warehouse(spark, tmpDir("vg5-wh"))
    val gate = VectorGate(wh, "emb")
    gate.landBatch(slice(0, 40, 1000L), "app:0")

    val batch2 = slice(0, 10, 2000L, perturb = true)
      .unionByName(slice(40, 50, 2000L)).persist()

    // Window A crash: entries appended to gen 0, stage/verdicts not landed
    val r = gate.idx.ingest(batch2, wh.read(gate.stageTable), "app:1")
    assert(r.accepted == 10L)
    r.verdicts.unpersist()

    // out-of-band rebuild from the 40-row stage snapshot (no batch2)
    assert(gate.prepareRebuild().contains(1L))

    // replay: cutover to gen 1, then a FRESH ingest against it — the
    // new generation has no txn history, so the arrivals land
    gate.landBatch(batch2, "app:1")
    assert(gate.headGen == 1L)
    assert(wh.read(gate.stageTable).count() == 50L)
    assert(gate.idx.indexedRows == 50L,
      "accepted arrivals must be present in the live index")
    assert(wh.read(gate.verdictTable).count() == 60L)

    // and a later near-dup of an accepted arrival is caught at the door
    gate.landBatch(slice(40, 45, 4000L, perturb = true), "app:2")
    assert(wh.read(gate.verdictTable)
      .where($"vec_id" >= 4000L && !$"is_new").count() == 5L)
    batch2.unpersist()
  }

  test("cutover crash window: death at the pointer swap replays exactly-once") {
    import graft.pipeline.CrashHooks
    val wh = Warehouse(spark, tmpDir("vg6-wh"))
    val gate = VectorGate(wh, "emb")
    gate.landBatch(slice(0, 40, 1000L), "app:0")

    // maintenance concurrent with a landing, as in production: whether
    // app:1 lands before or after the rebuild's snapshot read is racy,
    // so the cutover may or may not have catch-up rows — the
    // exactly-once invariants below hold either way
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val rebuild = Future(gate.prepareRebuild())
    gate.landBatch(slice(40, 50, 3000L), "app:1")
    assert(Await.result(rebuild, 5.minutes).contains(1L))

    // the next batch performs the cutover — kill it ON the pointer-swap
    // commit (any catch-up append has already committed by then)
    CrashHooks.beforeManifestCommit = t =>
      if (t == gate.genTable)
        throw new RuntimeException("injected: die on pointer swap")
    val crashed = intercept[RuntimeException] {
      gate.landBatch(slice(0, 5, 5000L, perturb = true), "app:2")
    }
    assert(crashed.getMessage.contains("injected"))
    CrashHooks.reset()
    assert(gate.headGen == 0L,
      "swap did not commit — the gate still serves the old generation")

    // replay: the catch-up append txn-skips if it committed, the swap
    // lands, the batch verdicts against gen 1 — everything exactly once
    gate.landBatch(slice(0, 5, 5000L, perturb = true), "app:2")
    assert(gate.headGen == 1L)
    assert(wh.read(gate.stageTable).count() == 50L, "all 5 echoes dropped")
    assert(gate.idx.indexedRows == 50L,
      "live index rows == stage rows after the crashed cutover replays")
    val v = wh.read(gate.verdictTable).where($"vec_id" >= 5000L)
      .as[(Long, Option[Long], Option[Long], Boolean)].collect()
    assert(v.length == 5 && v.forall(!_._4))
  }

  test("skew trip is repaired at the door: the next batch splits the hot cell before verdicting") {
    val wh = Warehouse(spark, tmpDir("vg7-wh"))
    val gate = VectorGate(wh, "emb")
    // bootstrap with the whole 500-vector fixture: the flood below must
    // trip the SKEW bar while staying under the GROWTH bar (16·⌈√500⌉+8
    // = 376 < 500), because repair clears only skew-class staleness
    gate.landBatch(slice(0, 500, 1000L), "app:0")
    val m = gate.idx.meta

    // manufacture the post-flood state a correlated accepted batch
    // leaves (the STRESS_r09 §11 bomb in miniature — the AnnIndexSpec
    // construction): near-copies of one bootstrapped vector, all
    // assigned to its cell, landed as entries + stage rows
    val v0 = wh.read(gate.stageTable).where($"vec_id" === 1000L)
      .select($"qe").as[Seq[Long]].head()
    val nFlood = (16 * m.ivfModulus).toInt + 8
    assert(500L + nFlood < 2L * m.builtN, "stay under the growth bar")
    val flood = spark.range(nFlood.toLong)
      .select(($"id" + 8000000L).as("vec_id"), typedLit(v0).as("qe0"))
      .select($"vec_id", expr(
        "transform(qe0, (x, i) -> x + CASE WHEN i % 8 = CAST(vec_id % 8 AS INT) " +
          "THEN CAST(500 + (vec_id % 29) * 100 AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END)").as("qe"))
      .withColumn("nrm", graft.functions.Kit.dotI64($"qe", $"qe"))
      .persist()
    assert(gate.idx.indexVectors(flood, "app:1") == nFlood.toLong)
    wh.load(gate.stageTable, flood, graft.pipeline.SinkPolicy.Append,
      Some("app:1"))
    assert(gate.maintenanceNeeded(), "the flood must trip the skew bar")

    def echoOf(ids: Seq[Long], offset: Long) = flood
      .where($"vec_id".isin(ids: _*))
      .select(($"vec_id" + offset).as("vec_id"),
        expr("transform(qe, (x, i) -> x + CASE WHEN i % 7 = 0 " +
          "THEN CAST(3000 AS BIGINT) ELSE CAST(0 AS BIGINT) END)").as("qe"))
      .withColumn("nrm", graft.functions.Kit.dotI64($"qe", $"qe"))
    val targets = Seq(8000001L, 8000017L, 8000040L, 8000063L, 8000088L,
      8000105L)

    // the harness dial: with auto-repair OFF the geometry stays stale
    // after a landing (the grind cap bounds the wall, nothing heals);
    // the batch re-delivers bootstrap vectors — exact dups in healthy
    // cells, so its outcome is deterministic under the cap
    gate.landBatch(slice(40, 45, 8100000L), "app:2",
      autoRepairSkew = None)
    assert(gate.maintenanceNeeded(),
      "without auto-repair the skew trip must persist")

    // the production default: the NEXT batch repairs the hot cell in
    // place before verdicting — O(|cell|), entries rewritten not added,
    // and every echo of a reassigned flood member is caught (no
    // grind-cap recall loss)
    val n0 = gate.idx.indexedRows
    gate.landBatch(echoOf(targets, 200000L), "app:3")
    assert(!gate.maintenanceNeeded(),
      "the door repair must clear the skew trip")
    assert(gate.idx.indexedRows == n0,
      "repair rewrites assignments, never adds or drops entries")
    val v = wh.read(gate.verdictTable).where($"vec_id" >= 8200000L)
      .as[(Long, Option[Long], Option[Long], Boolean)].collect()
    assert(v.length == targets.length && v.forall(!_._4),
      s"every echo must be flagged against the repaired geometry: ${v.toSeq}")
    // each names a flood member (usually its exact source; a k=1 tie
    // can pick a sibling of the mutually-near flood — both prove the
    // reassigned entries stayed findable through the split centroids)
    v.foreach { case (vid, dupOf, _, _) =>
      assert(dupOf.exists(d => d >= 8000000L && d < 8000000L + nFlood),
        s"$vid -> $dupOf") }
    assert(wh.read(gate.stageTable).count() == 500L + nFlood,
      "no echo may land (bootstrap + the flood; app:2 was all-dup)")

    // a replay of the repairing batch moves nothing anywhere
    gate.landBatch(echoOf(targets, 200000L), "app:3")
    assert(gate.idx.indexedRows == n0)
    assert(wh.read(gate.stageTable).count() == 500L + nFlood)
    flood.unpersist()
  }

  test("streaming end-to-end: two drains through a checkpointed file source") {
    val src = tmpDir("vg3-src")
    val ckpt = tmpDir("vg3-ckpt")
    val wh = Warehouse(spark, tmpDir("vg3-wh"))
    val gate = VectorGate(wh, "emb")
    def stream = EmbeddingStage.quantize(
      spark.readStream.schema(EmbeddingStage.rawSchema).parquet(src))

    spark.read.parquet(emb).where($"vec_id" < 40)
      .select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
      .write.mode("append").parquet(src)
    gate.drain(stream, ckpt, "vg")
    assert(wh.read(gate.stageTable).count() == 40L)

    // second drop: 5 perturbed re-arrivals + 5 new
    spark.read.parquet(emb).where($"vec_id" < 5)
      .select(($"vec_id" + 2000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> CASE WHEN i % 7 = 0 " +
          "THEN x + CAST(0.001 AS FLOAT) ELSE x END)").as("embedding"))
      .unionByName(
        spark.read.parquet(emb).where($"vec_id" >= 40 && $"vec_id" < 45)
          .select(($"vec_id" + 2000L).as("vec_id"), $"embedding"))
      .write.mode("append").parquet(src)
    gate.drain(stream, ckpt, "vg")

    assert(wh.read(gate.stageTable).count() == 45L)
    assert(wh.read(gate.verdictTable).where(!$"is_new").count() == 5L)
    // a re-drain with nothing pending moves nothing
    gate.drain(stream, ckpt, "vg")
    assert(wh.read(gate.stageTable).count() == 45L)
    assert(wh.read(gate.verdictTable).count() == 50L)
  }
}
