package graft.pipeline

import graft.SparkTestBase

/** Scale-mechanics proofs on the warehouse: compaction collapses
  * append-accumulated small files without changing the data, and a
  * date-partitioned layout prunes partitions at scan time. */
class WarehouseScaleSpec extends SparkTestBase {
  import spark.implicits._

  private def hits(d: String, n: Int) =
    (1 to n).map(i => (s"u$i", d)).toDF("user", "event_date")
      .withColumn("event_date", $"event_date".cast("date"))

  test("compact collapses many append part-files into few, data intact") {
    val w = Warehouse(spark, tmpDir("cp-wh"))
    (1 to 8).foreach(i => w.load("t", hits(f"2026-01-$i%02d", 10),
      SinkPolicy.Append))
    def partFiles: Int = {
      val d = new java.io.File(w.root + "/t")
      d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    val before = partFiles
    assert(before >= 8)
    val r = w.compact("t")
    assert(partFiles < before)
    assert(r.rows == 80L)
    val back = w.read("t")
    assert(back.count() == 80)
    assert(back.select("event_date").distinct().count() == 8)
  }

  test("date-partitioned reland layout prunes partitions at scan time") {
    val w = Warehouse(spark, tmpDir("pp-wh"))
    val p = SinkPolicy.RelandByDate("event_date")
    (1 to 6).foreach(i => w.load("t", hits(f"2026-02-$i%02d", 5), p))
    val q = w.read("t").where($"event_date" === "2026-02-03")
    assert(q.count() == 5)
    val plan = q.queryExecution.executedPlan.toString
    // the date predicate must land in PartitionFilters (metadata pruning),
    // not as a row-level data filter over a full scan
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"), plan)
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    assert(scanned <= 2, s"scanned $scanned files for one partition")
  }
}
