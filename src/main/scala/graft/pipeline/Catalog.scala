package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import java.time.{Instant, LocalDate, ZoneOffset}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Catalog introspection over a parquet warehouse directory — the engine
  * analogue of the reference's `__TABLES__` metadata scans:
  *
  *   - table existence (S3): `SELECT table_id FROM __TABLES__` + membership
  *     test (`functions/utils/datasources.py:136-139,309-312,390-393`)
  *   - last-modified (S4): `DATE(TIMESTAMP_MILLIS(last_modified_time))`
  *     (`functions/utils/datasources.py:394-396`)
  *
  * A "table" is a directory of parquet part-files under the warehouse
  * root. On a real cluster these calls would go through
  * `spark.catalog.tableExists` / Delta history; the filesystem mtime walk
  * below is the exact parity for a path-addressed parquet warehouse and
  * is O(#files-in-one-table), never O(warehouse). Directory streams are
  * closed eagerly (Using) — a polling orchestrator calls these per
  * schedule check, and GC-reclaimed handles would accumulate toward the
  * fd ulimit.
  */
final case class Catalog(root: String) {

  private def tableDir(table: String): Path = Paths.get(root, table)

  /** S3: does the table exist (any committed version, or — for a
    * pre-manifest legacy layout — any externally-written parquet data)?
    * Crashed-commit artifacts (staging dirs, txn-prefixed orphans) do
    * NOT count: an uncommitted write must be invisible here too. */
  def tableExists(table: String): Boolean = {
    val dir = tableDir(table)
    Files.isDirectory(dir) &&
      (TxnLog.current(dir).isDefined || TxnLog.legacyFiles(dir).nonEmpty)
  }

  /** All table names present in the warehouse (the `__TABLES__` scan). */
  def listTables(): Seq[String] =
    if (!Files.isDirectory(Paths.get(root))) Seq.empty
    else Using.resource(Files.list(Paths.get(root))) { stream =>
      stream.iterator().asScala
        .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted
    }

  /** S4: last-modified instant of a table = commit time of its current
    * manifest — more faithful than a part-file mtime walk, since it marks
    * when the version became VISIBLE (and is O(1), not O(#files)).
    * Pre-manifest legacy layouts fall back to max part-file mtime. */
  def lastModified(table: String): Option[Instant] = {
    val dir = tableDir(table)
    if (!Files.isDirectory(dir)) None
    else TxnLog.lastCommitTime(dir).orElse {
      val times = TxnLog.legacyFiles(dir)
        .map(f => Files.getLastModifiedTime(dir.resolve(f)).toInstant)
      if (times.isEmpty) None else Some(times.max)
    }
  }

  /** S4 as the reference consumes it: the last-modified *date*
    * (`DATE(TIMESTAMP_MILLIS(last_modified_time))`). */
  def lastModifiedDate(table: String): Option[LocalDate] =
    lastModified(table).map(_.atOffset(ZoneOffset.UTC).toLocalDate)
}
