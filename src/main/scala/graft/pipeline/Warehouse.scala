package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** How a batch lands in its target table — the reference's write
  * dispositions re-expressed for a parquet warehouse:
  *
  *   - [[SinkPolicy.Append]]: `WRITE_APPEND` + `ALLOW_FIELD_ADDITION`
  *     (`functions/utils/datasources.py:55-59,554-563,754-767,799-805`).
  *     New columns are allowed; readers see them via `mergeSchema`.
  *   - [[SinkPolicy.Overwrite]]: truncate-replace (`WRITE_TRUNCATE`,
  *     `datasources.py:362-366,440-444`). The reference truncates twice
  *     (explicit `TRUNCATE TABLE` + `WRITE_TRUNCATE`, SURVEY §4.1) — here
  *     a single atomic overwrite.
  *   - [[SinkPolicy.RelandByDate]]: delete-by-date idempotent re-land
  *     (`DELETE FROM t WHERE Date='{overwrite}'` then append,
  *     `datasources.py:50-53`). Implemented as DYNAMIC PARTITION
  *     OVERWRITE on a date-partitioned layout: only the partitions
  *     present in the incoming batch are replaced, which is both the
  *     idempotency delete and the append in one atomic commit — and the
  *     only shape of this operation that scales (a predicate delete that
  *     rewrites a 100 TB unpartitioned table per re-land does not).
  */
sealed trait SinkPolicy
object SinkPolicy {
  case object Append extends SinkPolicy
  case object Overwrite extends SinkPolicy
  /** @param dateCol partition column the re-land is keyed by */
  final case class RelandByDate(dateCol: String) extends SinkPolicy
}

/** One landed batch, for the pipeline run report. */
final case class LoadResult(source: String, action: String, rows: Long)

/** A parquet warehouse rooted at `root`: land/read/catalog in one place.
  *
  * Fixes two reference quirks deliberately (SURVEY §4.1): sink errors
  * SURFACE (the reference's idempotency `DELETE` was fire-and-forget with
  * no `.result()`, silently swallowing failures — here every write is
  * synchronous and throws), and the delete-by-date only ever fires for an
  * explicitly re-landed batch (the reference could issue
  * `DELETE ... WHERE Date='None'` on normal runs).
  */
final case class Warehouse(spark: SparkSession, root: String) {

  val catalog: Catalog = Catalog(root)

  private def path(table: String): String = s"$root/$table"

  /** Read a table back. `mergeSchema` makes column additions from later
    * appends visible — the read-side half of `ALLOW_FIELD_ADDITION`. */
  def read(table: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path(table))

  /** Land `df` into `table` under `policy`. Returns what happened.
    *
    * Empty batches are skipped (the reference's `df.shape[0] > 0` guard,
    * `datasources.py:756`) — checked with `isEmpty` (one lazy task), not
    * `count()`.
    */
  def load(table: String, df: DataFrame, policy: SinkPolicy): LoadResult = {
    // one evaluation of the batch plan serves both the empty check and
    // the landed-rows count (a separate isEmpty would run the plan twice)
    val cached = df.cache()
    try {
      val n = cached.count()
      if (n == 0) return LoadResult(table, "skipped-empty", 0L)
      policy match {
        case SinkPolicy.Append =>
          write(cached, SaveMode.Append, None, table)
        case SinkPolicy.Overwrite =>
          write(cached, SaveMode.Overwrite, None, table)
        case SinkPolicy.RelandByDate(dateCol) =>
          // Dynamic mode: only partitions present in df are replaced —
          // re-landing the same date twice keeps exactly one copy, other
          // dates are untouched.
          write(cached, SaveMode.Overwrite, Some(dateCol), table)
      }
      LoadResult(table, policy.toString, n)
    } finally cached.unpersist()
  }

  /** Dedup-on-arrival: keep only rows of `df` not already present in
    * `table` (the reference's intended "new rows only" semantics,
    * `datasources.py:547-552` — implemented as the anti-join SURVEY §4.1
    * prescribes, not the literal `keep=False` symmetric difference).
    *
    * The match is NULL-SAFE (`<=>`): a plain equality anti-join treats
    * NULL as never-equal, so every NULL-bearing row would be re-ingested
    * as "new" on every run — accumulating exactly the duplicates this
    * dedup exists to prevent. Matching is on the columns both sides
    * share, so a batch widened by field addition still dedups on the
    * established columns instead of failing to resolve the new one. */
  def newRowsOnly(table: String, df: DataFrame): DataFrame =
    if (!catalog.tableExists(table)) df
    else {
      val existing = read(table)
      val shared = df.columns.filter(existing.columns.contains(_))
      require(shared.nonEmpty, s"no shared columns with $table")
      val cond = shared.map(c => df(c) <=> existing(c)).reduce(_ && _)
      df.join(existing.select(shared.map(existing(_)): _*), cond, "left_anti")
    }

  /** S2-style secret lookup: `SELECT API_KEY FROM <keysTable> WHERE
    * TBL_NM = '<forTable>'` (`functions/utils/pipeline.py:28-29`). */
  def secret(keysTable: String, forTable: String): Option[String] =
    if (!catalog.tableExists(keysTable)) None
    else read(keysTable).where(col("TBL_NM") === forTable)
      .select(col("API_KEY")).limit(1).collect()
      .headOption.map(_.getString(0))

  /** Land `df` as a BUCKETED catalog table: rows are hash-clustered (and
    * sorted) by `bucketCol` into `nBuckets` files per write. Two tables
    * bucketed the same way join with NO exchange and no sort — the
    * co-located join discipline for recurring large-table joins at 100 TB
    * (pay the clustering once at write, never shuffle at read). Requires
    * the session catalog (`saveAsTable`), so it lives beside the
    * path-addressed sinks rather than inside [[load]]. */
  def loadBucketed(table: String, df: DataFrame, bucketCol: String,
                   nBuckets: Int): LoadResult = {
    val cached = df.cache()
    try {
      val n = cached.count() // landed rows, without re-scanning the table
      // repartition to the bucket layout first: HashPartitioning matches
      // the bucket hash, so each task holds exactly one bucket → one file
      // per bucket. That both avoids small-file explosion and lets readers
      // trust the per-bucket sort order (multi-file buckets force a
      // re-sort).
      cached.repartition(nBuckets, col(bucketCol))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(nBuckets, bucketCol)
        .sortBy(bucketCol)
        .option("path", path(table))
        .saveAsTable(table)
      LoadResult(table, s"bucketed($bucketCol,$nBuckets)", n)
    } finally cached.unpersist()
  }

  /** Compaction — the small-file maintenance op every streaming/append
    * warehouse needs at scale: years of micro-batch appends leave
    * thousands of KB-sized part-files, and scan cost becomes file-open
    * dominated. Rewrites the table into ~`targetBytesPerFile` files
    * (floor of current on-disk size / target, min 1), PRESERVING a
    * date/partition layout (partition dirs are detected and the rewrite
    * re-partitions by the same columns — flattening them would break
    * RelandByDate and partition discovery). Bucketed CATALOG tables are
    * refused: their files carry bucket ids the path-level rewrite cannot
    * reproduce; re-land them with [[loadBucketed]] instead.
    *
    * The swap is write-to-temp + two directory renames: readers see the
    * old layout until the first rename and the new one after the second;
    * the window in between is not atomic (POSIX offers no two-directory
    * swap) — run compaction when the table has no concurrent readers.
    * Crash-safe: leftover temp dirs are cleaned on entry, and a crash
    * between the renames is recovered on the next call (the displaced
    * old layout is restored before re-compacting). */
  def compact(table: String, targetBytesPerFile: Long = 128L << 20): LoadResult = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    require(!spark.catalog.tableExists(table),
      s"$table is a catalog table (possibly bucketed) — rewrite it with loadBucketed, not compact")
    val dir = Paths.get(root, table)
    val tmp = Paths.get(root, s".compact-$table")
    val old = Paths.get(root, s".old-$table")
    // recover from a crash between the two renames of a previous run
    if (!Files.isDirectory(dir) && Files.isDirectory(old))
      Files.move(old, dir, StandardCopyOption.ATOMIC_MOVE)
    Seq(tmp, old).foreach(p => if (Files.exists(p))
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
    val (bytes, partitionCols) = scala.util.Using.resource(Files.walk(dir)) { st =>
      val files = st.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
      val b = files.filter(_.toString.endsWith(".parquet")).map(Files.size).sum
      // partition dirs look like  <table>/col=value/...  — recover the
      // column chain from any leaf file's relative path
      val cols = files.headOption.map { f =>
        dir.relativize(f).iterator().asScala.toSeq.dropRight(1)
          .map(_.toString).takeWhile(_.contains("="))
          .map(_.split("=", 2)(0))
      }.getOrElse(Seq.empty)
      (b, cols)
    }
    val nFiles = math.max(1, (bytes / targetBytesPerFile).toInt)
    val df = read(table)
    val writer =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
          .write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
      else df.repartition(nFiles).write.mode(SaveMode.Overwrite)
    writer.parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    Files.move(dir, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
    LoadResult(table, s"compacted(${if (partitionCols.nonEmpty) "per-partition" else s"$nFiles files"})", n)
  }

  private def write(df: DataFrame, mode: SaveMode, partitionCol: Option[String],
                    table: String): Unit = {
    val w = df.write.mode(mode)
    partitionCol match {
      case Some(c) =>
        // writer-local option, not a session-conf mutation — concurrent
        // writers with different policies can't race on global state
        w.option("partitionOverwriteMode", "dynamic")
          .partitionBy(c).parquet(path(table))
      case None => w.parquet(path(table))
    }
  }
}
