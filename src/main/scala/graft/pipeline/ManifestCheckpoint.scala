package graft.pipeline

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One row of a columnar manifest checkpoint: a data file's
  * table-relative path, on-disk size, `col=value` partition identity,
  * and per-column zone-map bounds keyed BY COLUMN NAME (unlike the text
  * manifest's positional pairs, so a checkpoint row stays
  * self-describing across stats-column changes). Files without stats
  * carry empty maps and are never pruned. */
private[graft] final case class CheckpointEntry(
    path: String, size: Option[Long], partition: Map[String, String],
    mins: Map[String, String], maxs: Map[String, String])

/** Columnar (parquet) manifest checkpoints — the metadata-plane scale
  * lever on top of [[TxnLog]]'s text manifests (Delta Lake's
  * `n.checkpoint.parquet` design, scaled to this log).
  *
  * The text log alone resolves any version correctly, but a SNAPSHOT at
  * ~10^6 files is ~100 MB of text the DRIVER must parse and hold —
  * fine to write occasionally, hostile to read per query. So every
  * [[TxnLog.SnapshotEvery]]-th commit (and every vacuum checkpoint)
  * additionally publishes the resolved state as a parquet directory
  * `_log/v<N>.checkpoint`: one row per data file with path, size,
  * partition identity, and per-column min/max. Readers that only need
  * file-skipping ([[Warehouse.readBox]]) then resolve
  * checkpoint-parquet + small text deltas as a DATAFRAME — pruning runs
  * in executors, and only the SURVIVING paths ever materialize on the
  * driver. The text manifest remains the commit protocol's source of
  * truth; a checkpoint is derived, its absence only costs the fallback
  * to driver-side resolution.
  *
  * Publication is write-to-temp + atomic directory rename, so a
  * checkpoint directory either exists completely or not at all — the
  * same visibility contract as the text manifests' link(2) publish.
  *
  * (Reference counterpart: BigQuery's internal metadata service, which
  * is what makes `datasources.py:55-58` load jobs metadata-cheap at any
  * table size — here made explicit, the way an open table format must.)
  */
object ManifestCheckpoint {

  def exists(tableDir: Path, version: Long): Boolean =
    TxnLog.hasCheckpoint(tableDir, version)

  /** `col=value` directory segments of a relative path as a map. */
  private[graft] def partitionMap(relPath: String): Map[String, String] =
    TxnLog.partitionSegments(relPath).map { s =>
      val Array(k, v) = s.split("=", 2); k -> v
    }.toMap

  private[graft] def entriesOf(tableDir: Path,
      statsCols: Seq[String], files: Seq[String],
      fileStats: Map[String, Seq[(String, String)]]): Seq[CheckpointEntry] =
    files.map { f =>
      val pairs = fileStats.get(f)
      CheckpointEntry(f,
        scala.util.Try(Files.size(tableDir.resolve(f))).toOption,
        partitionMap(f),
        pairs.map(ps => statsCols.zip(ps.map(_._1)).toMap).getOrElse(Map.empty),
        pairs.map(ps => statsCols.zip(ps.map(_._2)).toMap).getOrElse(Map.empty))
    }

  /** Publish the parquet checkpoint for an already-committed manifest.
    * Idempotent: an existing checkpoint for the version wins. The rows
    * are built from the driver-resolved manifest (checkpoint WRITING
    * inherits the text envelope — it happens once per
    * [[TxnLog.SnapshotEvery]] commits; it is the READ path that must
    * stay driver-cheap). File sizes come from one `stat` per file at
    * write time; on a remote object store, carry them forward from the
    * previous checkpoint instead. */
  def write(spark: SparkSession, tableDir: Path, m: Manifest): Unit = {
    if (exists(tableDir, m.version)) return
    import spark.implicits._
    val entries = entriesOf(tableDir, m.statsCols, m.files, m.fileStats)
    // ~500k rows per part file keeps each part well under typical task
    // memory while avoiding a small-file spray for ordinary tables
    val nPart = math.max(1, entries.size / 500000)
    publishRaw(spark, tableDir, m.version,
      spark.createDataset(entries).repartition(nPart).toDF())
  }

  /** Low-level publisher (also the metadata-bench fabrication hook): the
    * DataFrame must have the [[CheckpointEntry]] schema. */
  private[graft] def publishRaw(spark: SparkSession, tableDir: Path,
                                version: Long, df: DataFrame): Unit = {
    val target = TxnLog.checkpointDir(tableDir, version)
    if (Files.isDirectory(target)) return
    val tmp = TxnLog.logDir(tableDir).resolve(
      s".ckpt-tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      df.write.parquet(tmp.toString)
      try Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        // another writer of the SAME version raced us (or a replay):
        // contents are identical by construction, first one wins
        case _: java.nio.file.FileAlreadyExistsException => ()
        case _: java.nio.file.DirectoryNotEmptyException => ()
      }
    } finally if (Files.isDirectory(tmp))
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  /** The checkpoint of one version as a DataFrame (schema =
    * [[CheckpointEntry]]). */
  def read(spark: SparkSession, tableDir: Path, version: Long): DataFrame =
    spark.read.parquet(TxnLog.checkpointDir(tableDir, version).toString)
}
