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

  /** Register every fixture table as a temp view so `spark.sql` works
    * against the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
