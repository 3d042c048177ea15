package graft.ops

import org.apache.spark.storage.StorageLevel

import graft.SparkTestBase

/** The two scale guards the stress decades forced into existence
  * (STRESS_r10 §5/§6): group-bounded corpus folds and the disk-regime
  * cache-batch tune. Their BIG-corpus behavior is measured in the scale
  * harnesses; these pin the driver-side arithmetic and the
  * respect-explicit-settings contract at fixture scale. */
class ScaleGuardsSpec extends SparkTestBase {
  import spark.implicits._

  test("boundedGroups widens a narrow frame to hold map-side groups under the hash bar") {
    val df = (0L until 1000L).map(i => (i, i * 2)).toDF("vec_id", "x")
      .coalesce(2)
    // 480k projected rows / 60k per task → at least 8 partitions
    val widened = Similarity.boundedGroups(df, 480000L)
    assert(widened.rdd.getNumPartitions == 8)
    // identical rows, just redistributed
    assert(widened.as[(Long, Long)].collect().sorted.toSeq ==
      df.as[(Long, Long)].collect().sorted.toSeq)
    // already-wide frames pass through untouched (no extra exchange)
    val wide = df.repartition(16)
    assert(Similarity.boundedGroups(wide, 480000L) eq wide)
    assert(Similarity.boundedGroups(df, 100L) eq df)
  }

  test("tuneCacheBatchFor lowers only the DEFAULT cache batch, only in the disk regime") {
    val key = "spark.sql.inMemoryColumnarStorage.batchSize"
    val before = spark.conf.get(key, "10000")
    try {
      // memory regime: never touched
      spark.conf.set(key, "10000")
      StageLevels.tuneCacheBatchFor(spark, StorageLevel.MEMORY_AND_DISK)
      assert(spark.conf.get(key) == "10000")
      // disk regime at the default: lowered
      StageLevels.tuneCacheBatchFor(spark, StorageLevel.DISK_ONLY)
      assert(spark.conf.get(key) == "1024")
      // an EXPLICIT setting is respected, disk regime or not
      spark.conf.set(key, "5000")
      StageLevels.tuneCacheBatchFor(spark, StorageLevel.DISK_ONLY)
      assert(spark.conf.get(key) == "5000")
    } finally { spark.conf.set(key, before); () }
  }
}
