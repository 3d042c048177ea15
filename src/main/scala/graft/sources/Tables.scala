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

  /** Inferred-schema cache per (table path, nanosAsLong mode): schema
    * INFERENCE — not the scan — dominated every `load` call (~70 ms of
    * driver-side DataSource resolution + footer read, measured
    * MiniProbe r12; a schema-supplied read plans in ~6 ms), and a bench
    * sweep re-loads each fixture table hundreds of times. Fixture
    * tables are immutable by contract (TESTDATA.md), so the inferred
    * StructType is a constant of the path; caching it is the guide-§6
    * listing/metadata-cache discipline (what a catalog table or
    * manifest format gives you for free). The cache holds METADATA
    * only — every action still scans the parquet — and is keyed by the
    * session's `nanosAsLong` flag because that conf changes what
    * inference returns for TIMESTAMP(NANOS) columns. */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), org.apache.spark.sql.types.StructType]

  /** Lazy scan of one fixture table.
    *
    * `events.ts` has shipped in two physical layouts across driver
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — sessions set `spark.sql.legacy.parquet
    * .nanosAsLong=true` so the nanos arrive as raw longs, converted here
    * with integer `div` so the 1.7e18-scale nanos never round-trip
    * through a double) and plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ). Both are normalized
    * to a session-zone `TimestampType` column — sessions run UTC, so the
    * NTZ→LTZ cast is value-identical and oracle-parity-safe. The
    * dispatch is on the READ schema, not an assumed generation, so
    * either fixture vintage (and the gen_stress 10× corpora) loads
    * unchanged. (No session-conf mutation in this hot path: a reader
    * that mutates global conf races against concurrent planners.)
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    val path = s"$sfDir/$name.parquet"
    val nanosMode = spark.conf
      .get("spark.sql.legacy.parquet.nanosAsLong", "false")
    val schema = schemaCache.getOrElseUpdate((path, nanosMode),
      spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampType}
      df.schema("ts").dataType match {
        case LongType      => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampType => df
        case _             => df.withColumn("ts", col("ts").cast(TimestampType))
      }
    } else df
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
