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
    val before = w.currentFiles("t").size
    assert(before >= 8)
    val r = w.compact("t")
    assert(w.currentFiles("t").size < before)
    assert(r.rows == 80L)
    val back = w.read("t")
    assert(back.count() == 80)
    assert(back.select("event_date").distinct().count() == 8)
  }

  test("compact preserves a reland partition layout; re-land still replaces its date") {
    val w = Warehouse(spark, tmpDir("cpp-wh"))
    val p = SinkPolicy.RelandByDate("event_date")
    (1 to 4).foreach(i => w.load("t", hits(f"2026-03-$i%02d", 6), p))
    w.compact("t")
    // every committed file still lives under an event_date=… partition dir
    val parts = w.currentFiles("t")
      .flatMap(TxnLog.partitionSegments).distinct.sorted
    assert(parts.length == 4 && parts.forall(_.startsWith("event_date=")))
    assert(w.read("t").count() == 24)
    // and the idempotent re-land semantics still hold after compaction
    w.load("t", hits("2026-03-02", 2), p)
    val back = w.read("t")
    assert(back.count() == 20)
    assert(back.where($"event_date" === "2026-03-02").count() == 2)
  }

  test("compact refuses a bucketed catalog table") {
    val w = Warehouse(spark, tmpDir("cpb-wh"))
    w.loadBucketed("bk_t", hits("2026-01-01", 10), "user", 2)
    try {
      intercept[IllegalArgumentException](w.compact("bk_t"))
    } finally spark.sql("DROP TABLE IF EXISTS bk_t")
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
