package graft.pipeline

import graft.SparkTestBase

/** Change data capture over the manifest log: appended-rows-between-
  * versions is exact for append-only history and REFUSED (not silently
  * wrong) once any commit rewrote or removed files. */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def kv(lo: Long, n: Int) =
    (lo until lo + n).map(i => (i, s"v$i")).toDF("k", "v")

  test("appended rows between versions are exactly the new rows") {
    val w = Warehouse(spark, tmpDir("cdc-wh"))
    w.load("t", kv(0, 3), SinkPolicy.Append)  // v1: 0,1,2
    w.load("t", kv(3, 2), SinkPolicy.Append)  // v2: 3,4
    w.load("t", kv(5, 1), SinkPolicy.Append)  // v3: 5
    def keys(from: Long, to: Long): Set[Long] =
      w.readAppendedBetween("t", from, to)
        .select("k").as[Long].collect().toSet
    assert(keys(1, 3) === Set(3L, 4L, 5L))
    assert(keys(2, 3) === Set(5L))
    assert(keys(1, 2) === Set(3L, 4L))
    // from == to → empty change set with the table's schema
    val same = w.readAppendedBetween("t", 3, 3)
    assert(same.count() === 0)
    assert(same.columns.toSeq === Seq("k", "v"))
  }

  test("an incremental consumer drains each version once, no loss, no dup") {
    val w = Warehouse(spark, tmpDir("cdc2-wh"))
    var cursor = 0L // consumer checkpoint: last version fully consumed
    val seen = scala.collection.mutable.Set[Long]()
    for (batchNo <- 0 until 4) {
      w.load("t", kv(batchNo * 10L, 5), SinkPolicy.Append)
      val head = TxnLog.current(java.nio.file.Paths.get(w.root, "t")).get.version
      if (cursor == 0L) {
        // first drain bootstraps from the full snapshot
        seen ++= w.read("t").select("k").as[Long].collect()
      } else {
        val inc = w.readAppendedBetween("t", cursor, head)
          .select("k").as[Long].collect()
        assert(inc.length === 5) // exactly the new batch
        inc.foreach(k => assert(!seen.contains(k), s"duplicate $k"))
        seen ++= inc
      }
      cursor = head
    }
    assert(seen.size === 20)
  }

  test("non-additive history (compaction) is refused, not silently wrong") {
    val w = Warehouse(spark, tmpDir("cdc3-wh"))
    w.load("t", kv(0, 3).coalesce(1), SinkPolicy.Append)   // v1
    w.load("t", kv(3, 3).coalesce(1), SinkPolicy.Append)   // v2
    w.compact("t")                                          // v3: rewrite
    val err = intercept[IllegalArgumentException] {
      w.readAppendedBetween("t", 1, 3)
    }
    assert(err.getMessage.contains("not append-only"))
    // but the post-compaction segment is additive again
    w.load("t", kv(6, 2).coalesce(1), SinkPolicy.Append)   // v4
    assert(w.readAppendedBetween("t", 3, 4)
      .select("k").as[Long].collect().toSet === Set(6L, 7L))
  }

  test("changedFiles reports adds and removes across an overwrite") {
    val w = Warehouse(spark, tmpDir("cdc4-wh"))
    w.load("t", kv(0, 2).coalesce(1), SinkPolicy.Append)
    val v1Files = w.currentFiles("t")
    w.load("t", kv(9, 2).coalesce(1), SinkPolicy.Overwrite)
    val (added, removed) = w.changedFiles("t", 1, 2)
    assert(removed.toSet === v1Files.toSet)
    assert(added.nonEmpty && added.toSet === w.currentFiles("t").toSet)
  }
}
