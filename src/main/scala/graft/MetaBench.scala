package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.LongType

import graft.pipeline.{Manifest, ManifestCheckpoint, TxnLog, Warehouse}

/** Metadata-plane microbench at ~10^6 files: fabricates a table whose
  * MANIFEST (not data — the parquet files never exist) lists `n` files
  * with per-file zone-map stats over a disjoint key space, through the
  * REAL format writers (text snapshot via `TxnLog.tryCommit`, parquet
  * checkpoint via `ManifestCheckpoint.write`, delta chain on top), then
  * measures both pruning paths of a selective box query:
  *
  *   - DISTRIBUTED: checkpoint-parquet + folded deltas filtered in
  *     executors ([[Warehouse.pruneBox]]) — the driver sees only the
  *     surviving paths, so its retained heap stays O(survivors);
  *   - DRIVER: full text-chain resolution + manifest-string walk — the
  *     pre-checkpoint design, whose resolved list + stats map is the
  *     ~100 MB-at-10^6-files envelope documented in [[TxnLog]].
  *
  * Prints one JSON line. Run: `sbt 'runMain graft.MetaBench [nFiles]'`
  * (the forked JVM's -Xmx must fit the DRIVER path's resolved manifest;
  * the distributed path itself needs none of it). */
object MetaBench {

  private def gcUsedMb(): Double = {
    System.gc(); System.gc(); Thread.sleep(200)
    val r = Runtime.getRuntime
    (r.totalMemory() - r.freeMemory()) / 1e6
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // CosTopK-family aggregations hold 10^3-10^5 groups per task; the
      // 128-row default falls back to sort-based aggregation (and its
      // spill cascade) on every such query - see CosTopK scaladoc
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("metabench").toString
    val dir = Paths.get(root, "t")

    // file i covers k ∈ [i*100, i*100+99] — the append-ordered monotonic
    // column shape zone maps exist for — and lives in partition
    // p = i mod NParts (a date-ish low-cardinality identity: ~nFiles/1024
    // files per partition), so the fabricated table exercises BOTH
    // metadata-prune dimensions: partition identity ∩ zone map
    val NParts = 1024
    def stats(i: Int) = Seq(((i * 100L).toString, (i * 100L + 99).toString))
    def fname(i: Int) = f"data/p=${i % NParts}/f$i%08d.parquet"
    val files = (0 until nFiles).map(fname)
    val fileStats = files.zipWithIndex
      .map { case (f, i) => f -> stats(i) }.toMap

    var t0 = System.nanoTime()
    val m10 = Manifest(10L, Seq("p"), files, None, Seq("k"), fileStats)
    require(TxnLog.tryCommit(dir, m10))
    val snapSec = (System.nanoTime() - t0) / 1e9
    val snapBytes = Files.size(
      TxnLog.logDir(dir).resolve(f"v${10L}%012d.manifest"))

    t0 = System.nanoTime()
    ManifestCheckpoint.write(spark, dir, m10)
    val ckptSec = (System.nanoTime() - t0) / 1e9
    val ckptBytes = scala.util.Using.resource(
      Files.walk(TxnLog.checkpointDir(dir, 10L))) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.filter(Files.isRegularFile(_))
        .map(Files.size).sum
    }

    // three deltas on top: each removes 2 files and adds 3 — the O(change)
    // commits the chain walk must fold over the checkpoint
    var prev = m10
    var serial = nFiles
    (11L to 13L).foreach { v =>
      val removed = prev.files.take(2)
      // name and stats generated TOGETHER per file: each added file's
      // zone map matches ITS serial (a frozen serial would stamp all
      // three with the last one's range — internally inconsistent
      // metadata that could mask pruning differences)
      val added = (1 to 3).map { _ =>
        serial += 1; (fname(serial), stats(serial))
      }
      val next = Manifest(v, Seq("p"),
        prev.files.drop(2) ++ added.map(_._1), None, Seq("k"),
        (prev.fileStats -- removed) ++ added.map { case (f, s) => f -> s })
      require(TxnLog.tryCommit(dir, next, Some(prev)))
      prev = next
    }

    val w = Warehouse(spark, root)
    val lo = (nFiles / 2 * 100L).toString
    val hi = (nFiles / 2 * 100L + 550).toString
    val types = Map("k" -> (LongType: org.apache.spark.sql.types.DataType))

    // DISTRIBUTED path (checkpoint + deltas; cold then warm)
    val heapBase = gcUsedMb()
    t0 = System.nanoTime()
    val distSurvivors = w.pruneBox("t", Seq(("k", lo, hi)), types)
    val distColdSec = (System.nanoTime() - t0) / 1e9
    val distHeapMb = gcUsedMb() - heapBase
    t0 = System.nanoTime()
    val dist2 = w.pruneBox("t", Seq(("k", lo, hi)), types)
    val distWarmSec = (System.nanoTime() - t0) / 1e9
    // combined partition ∩ zone-map prune: same executor-side filter,
    // one more conjunct — of the zone survivors only those inside the
    // named partition remain (here exactly one file by construction)
    val part = ((nFiles / 2) % NParts).toString
    t0 = System.nanoTime()
    val distCombined = w.pruneBox("t", Seq(("k", lo, hi)), types,
      Seq(("p", part)))
    val distCombinedSec = (System.nanoTime() - t0) / 1e9

    // DRIVER path: full text resolution + list walk (the contrast number).
    // Hide the checkpoint so pruneBox takes the text branch.
    val ckptDir = TxnLog.checkpointDir(dir, 10L)
    val hidden = ckptDir.resolveSibling(ckptDir.getFileName.toString + ".off")
    Files.move(ckptDir, hidden)
    val heapBase2 = gcUsedMb()
    t0 = System.nanoTime()
    val resolved = TxnLog.readVersion(dir, 13L)
    val driverResolveSec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val driverSurvivors = w.pruneBox("t", Seq(("k", lo, hi)), types)
    val driverPruneSec = (System.nanoTime() - t0) / 1e9
    val driverHeapMb = gcUsedMb() - heapBase2 // retains `resolved`
    val driverCombined = w.pruneBox("t", Seq(("k", lo, hi)), types,
      Seq(("p", part)))
    Files.move(hidden, ckptDir)

    require(distSurvivors.toSet == driverSurvivors.toSet &&
      dist2.toSet == distSurvivors.toSet,
      s"pruning paths disagree: dist=${distSurvivors.size} driver=${driverSurvivors.size}")
    require(distCombined.toSet == driverCombined.toSet &&
      distCombined.toSet.subsetOf(distSurvivors.toSet) &&
      distCombined.size == 1,
      s"combined prune disagrees: dist=${distCombined.size} driver=${driverCombined.size}")
    require(resolved.files.size == nFiles + 3)

    println(Seq(
      s""""metric": "metadata_prune"""",
      s""""n_files": ${nFiles + 3}""",
      f""""snapshot_write_sec": $snapSec%.2f""",
      s""""snapshot_bytes": $snapBytes""",
      f""""ckpt_write_sec": $ckptSec%.2f""",
      s""""ckpt_bytes": $ckptBytes""",
      f""""dist_prune_cold_sec": $distColdSec%.2f""",
      f""""dist_prune_warm_sec": $distWarmSec%.2f""",
      s""""dist_survivors": ${distSurvivors.size}""",
      f""""dist_combined_prune_sec": $distCombinedSec%.2f""",
      s""""combined_survivors": ${distCombined.size}""",
      f""""dist_retained_heap_mb": $distHeapMb%.1f""",
      f""""driver_resolve_sec": $driverResolveSec%.2f""",
      f""""driver_prune_sec": $driverPruneSec%.2f""",
      f""""driver_retained_heap_mb": $driverHeapMb%.1f""")
      .mkString("{", ", ", "}"))
    spark.stop()
  }
}
