package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Mirrors the reference's warehouse-table scans (S1/S2 in SURVEY §2.1;
  * reference: `functions/utils/datasources.py:496-498,650-655` — `SELECT *
  * FROM <table>` against BigQuery). Here a "table" is a parquet directory;
  * Catalyst pushes filters/projections into the vectorized parquet reader,
  * so callers should express predicates on the returned DataFrame rather
  * than materializing it.
  *
  * Scale note: at 100 TB these would be partitioned/bucketed table paths
  * (e.g. `orders` date-partitioned for partition pruning); the API shape —
  * lazily-planned scans keyed by logical name — stays identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Lazy scan of one fixture table.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Sessions must be
    * built with `spark.sql.legacy.parquet.nanosAsLong=true` (every entry
    * point in this repo does — Verify/Bench/Plans/SparkTestBase); the
    * nanos then arrive as raw longs and are converted to a microsecond
    * TimestampType here — integer `div` so the 1.7e18-scale nanos never
    * round-trip through a double. Fixture timestamps are whole
    * microseconds, so this is lossless and oracle-parity-safe. (No
    * session-conf mutation in this hot path: a reader that mutates
    * global conf races against concurrent planners.)
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** One fixture table spread across the session's full parallelism —
    * for callers whose NEXT stage is CPU-heavy per input row (shingling,
    * regex kits, per-pair distance probes, wide partial aggregates).
    *
    * Why it exists: a small table is one parquet split, so everything up
    * to the first shuffle — including the expensive map-side work — runs
    * in ONE task regardless of cores. The explicit-count round-robin
    * repartition costs one narrow shuffle of the pruned columns and buys
    * full-width execution of the stage above it. At 100 TB the scan is
    * already thousands of splits and a spread would be a pure extra
    * shuffle — so this is opt-in per call site, never the default read
    * path, and only where the stage above is compute-bound. (Explicit
    * count: a column-only or count-free repartition of a few-hundred-KB
    * side is an AQE-coalesce target, which would fold the stage back
    * into one task.) */
  def loadSpread(spark: SparkSession, sfDir: String, name: String): DataFrame =
    load(spark, sfDir, name)
      .repartition(spark.sparkContext.defaultParallelism)

  /** Register every fixture table as a temp view so `spark.sql` works
    * against the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
