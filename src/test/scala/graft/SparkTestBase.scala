package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites — one JVM-wide session
  * (getOrCreate) so `sbt test` doesn't pay Spark startup per suite. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    // CosTopK-family aggregations hold 10^3-10^5 groups per task; the
    // 128-row default falls back to sort-based aggregation (and its
    // spill cascade) on every such query - see CosTopK scaladoc
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-sql-wh").toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }
}
