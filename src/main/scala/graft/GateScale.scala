package graft

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Pq, Similarity}
import graft.pipeline.Warehouse
import graft.streaming.VectorGate

/** Scale evidence for the DECOUPLED VectorGate rebuild (round-9 verdict
  * #1) at the decade that exposed the inline design: 2M vectors, where
  * a correlated arrival batch builds a 28× hot cell and the round-9
  * gate would stall the stream for a 95.5 s inline rebuild — or, worse,
  * the NEXT correlated batch would grind ~2·10⁹ candidate pairs through
  * the hot cell (the STRESS_r09 §11 OOM). Phases:
  *
  *   1. bootstrap — the corpus lands through the gate (build + stage);
  *   2. correlated — the `ingestArrivals` batch lands, flooding one
  *      cell (needsRebuild trips, but the BATCH WALL contains no
  *      rebuild — the decoupling claim);
  *   3. stale — an echo batch verdicts against the hot geometry with
  *      the 4×-modulus bounded-grind cap: the wall that used to OOM
  *      is now bounded (dup recall inside the hot cell is the cost,
  *      printed);
  *   4. concurrent — another echo lands WHILE prepareRebuild runs on a
  *      background thread (no stream stall: both walls printed);
  *   5. cutover — the next batch swaps generations (catch-up append ∝
  *      rows landed during the build) and verdicts at the healthy wall.
  *
  * A second mode, `autorepair` (round 10), measures the DOOR-REPAIR
  * tier instead: bootstrap → the correlated bomb → an echo batch landed
  * with the production default, which splits the hot cell in place
  * (O(Σ|hot cell|)) before verdicting — the wall to compare against
  * `lifecycle`'s stale_capped grind (134.0 s at 2M, with 66 verdicts
  * lost to the cap) and the 2000×-decade capped OOM (STRESS_r10 §6).
  * The `lifecycle` phases pass `autoRepairSkew = None` so the
  * stale-geometry baselines those decades recorded stay reproducible.
  *
  *   sbt 'runMain graft.GateScale /tmp/sf1000_stress [lifecycle|autorepair]'
  */
object GateScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.error("usage: GateScale <fixtureDir> [lifecycle|autorepair]"))
    val mode = args.lift(1).getOrElse("lifecycle")
    val spark = HarnessSession.build()
    import spark.implicits._

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // size the corpus cache like AnnIndexScale (r10 fifth-decade fix):
    // deserialized int64-array rows are ~5-8x their parquet bytes; a
    // plain MEMORY_AND_DISK persist of the 8M-row corpus would hold
    // ~5 GB of heap in the JVM the harness is measuring
    val base = {
      val b = Similarity.quantized(spark, dir)
      b.persist(graft.ops.StageLevels.pinnedFor(b, expansion = 3))
    }
    val n = base.count()
    val wh = Warehouse(spark,
      Files.createTempDirectory("gate-scale").toString)
    val gate = VectorGate(wh, "emb")

    def echoOf(src: org.apache.spark.sql.DataFrame, offset: Long) = src
      .select(($"vec_id" + offset).as("vec_id"),
        expr("transform(qe, (x, i) -> x + CASE WHEN i % 9 = 0 " +
          "THEN CAST(2000 AS BIGINT) ELSE CAST(0 AS BIGINT) END)").as("qe"))
      .withColumn("nrm", graft.functions.Kit.dotI64($"qe", $"qe"))

    // 1e9-spaced windows: at the 2000× decade the old +10M/+20M echo
    // offsets overlapped (arrival ids reach ~12M, echo1 ids ~22M), so
    // dupsOf(20M) double-counted part of echo1's verdicts — an
    // accounting artifact, caught by dups > batch in the 4M steady row.
    // That guard is now ASSERTED per phase (a window can only hold one
    // batch's verdicts, so dups > batch means windows overlapped again
    // — e.g. past n ≈ 333M, where echo ids outgrow the 1e9 spacing).
    def dupsOf(idBase: Long, batch: Long): Long = {
      val d = wh.read(gate.verdictTable)
        .where($"vec_id" >= idBase && $"vec_id" < idBase + 1000000000L &&
          !$"is_new").count()
      require(d <= batch,
        s"dup window [$idBase, +1e9) counted $d verdicts for a $batch-row " +
          "batch: echo-id windows overlap — widen the offset spacing " +
          "past 10 * max arrival id")
      d
    }

    // 1. bootstrap
    val (bootSec, _) = timed(gate.landBatch(base, "g:0"))
    println(f"""{"phase": "bootstrap", "sec": $bootSec%.2f, "n": $n}""")

    // 2. the correlated batch (the r9 hot-cell bomb); NO rebuild inside
    val arrivals = Pq.ingestArrivals(base).persist()
    val nArr = arrivals.count()
    spark.catalog.clearCache()
    val (b1Sec, _) = timed(
      gate.landBatch(arrivals, "g:1", autoRepairSkew = None))
    val (_, maxCell1) = gate.idx.cellStats
    println(f"""{"phase": "correlated", "sec": $b1Sec%.2f, """ +
      s""""batch": $nArr, "dups": ${dupsOf(n, nArr)}, """ +
      s""""max_cell": $maxCell1, "modulus": ${gate.idx.meta.ivfModulus}, """ +
      s""""maintenance_needed": ${gate.maintenanceNeeded()}}""")

    if (mode == "autorepair") {
      // 3'. the production default: the echo batch REPAIRS the hot cell
      // at the door (O(|cell|)) and verdicts at healthy geometry — no
      // grind, no capped recall loss, no stream stall
      val echo0 = echoOf(arrivals, 1000000000L).persist()
      spark.catalog.clearCache()
      val (bSec, _) = timed(gate.landBatch(echo0, "g:2"))
      val (_, maxCellR) = gate.idx.cellStats
      println(f"""{"phase": "echo_autorepair", "sec": $bSec%.2f, """ +
        s""""batch": $nArr, "dups": ${dupsOf(1000000000L, nArr)}, """ +
        s""""max_cell": $maxCellR, """ +
        s""""maintenance_needed": ${gate.maintenanceNeeded()}}""")
      // 4'. steady state: the next batch finds a healthy census (the
      // repair inside it is a no-op) and pays only the normal verdict
      // wall — the door repair is a one-batch event, not a per-batch tax
      val echoS = echoOf(arrivals, 2000000000L).persist()
      spark.catalog.clearCache()
      val (sSec, _) = timed(gate.landBatch(echoS, "g:3"))
      println(f"""{"phase": "echo_steady", "sec": $sSec%.2f, """ +
        s""""batch": $nArr, "dups": ${dupsOf(2000000000L, nArr)}, """ +
        s""""maintenance_needed": ${gate.maintenanceNeeded()}}""")
      spark.stop()
      return
    }

    // 3. echo against the STALE hot geometry — bounded by the cap
    val echo1 = echoOf(arrivals, 1000000000L).persist()
    spark.catalog.clearCache()
    val (b2Sec, _) = timed(
      gate.landBatch(echo1, "g:2", autoRepairSkew = None))
    println(f"""{"phase": "stale_capped", "sec": $b2Sec%.2f, """ +
      s""""batch": $nArr, "dups": ${dupsOf(1000000000L, nArr)}}""")

    // 4. another echo lands WHILE the rebuild runs — no stream stall
    val echo2 = echoOf(arrivals, 2000000000L).persist()
    spark.catalog.clearCache()
    val rebuild = Future(timed(gate.prepareRebuild()))
    val (b3Sec, _) = timed(
      gate.landBatch(echo2, "g:3", autoRepairSkew = None))
    val (rbSec, gen) = Await.result(rebuild, 60.minutes)
    println(f"""{"phase": "concurrent", "batch_sec": $b3Sec%.2f, """ +
      f""""rebuild_sec": $rbSec%.2f, "prepared_gen": ${gen.getOrElse(-1L)}, """ +
      s""""dups": ${dupsOf(2000000000L, nArr)}, "head_gen": ${gate.headGen}}""")

    // 5. cutover + healthy-geometry verdicts
    val echo3 = echoOf(arrivals, 3000000000L).persist()
    spark.catalog.clearCache()
    val (b4Sec, _) = timed(
      gate.landBatch(echo3, "g:4", autoRepairSkew = None))
    val (_, maxCell2) = gate.idx.cellStats
    println(f"""{"phase": "cutover", "sec": $b4Sec%.2f, """ +
      s""""head_gen": ${gate.headGen}, "dups": ${dupsOf(3000000000L, nArr)}, """ +
      s""""max_cell": $maxCell2, """ +
      s""""maintenance_needed": ${gate.maintenanceNeeded()}}""")
    spark.stop()
  }
}
