package graft.ops

import graft.SparkTestBase

/** Salted join correctness: identical result multiset to the plain join,
  * and hot keys actually spread across salt buckets. */
class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join on a skewed input") {
    // 90% of fact rows share one key
    val facts = ((1 to 900).map(_ => (1, "hot")) ++
      (1 to 100).map(i => (i % 7 + 2, s"cold$i"))).toDF("k", "payload")
    val dims = (1 to 10).map(i => (i, s"attr$i")).toDF("k", "attr")
    val plain = facts.join(dims, "k")
      .select("k", "payload", "attr").as[(Int, String, String)]
      .collect().sorted.toSeq
    val salted = SkewJoin.saltedJoin(facts, dims, "k", buckets = 8)
      .select("k", "payload", "attr").as[(Int, String, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
  }

  test("salting bounds the hot key's largest task input to ~2x the median share") {
    import org.apache.spark.sql.functions._
    // without salting, one task owns all 900 hot rows; with salting, the
    // hot key's input per task is its (k, salt) bucket — assert the
    // largest bucket is within 2x the median bucket (binomial spread),
    // i.e. no task sees a disproportionate share of the hot key
    val hot = (1 to 900).map(_ => (1, "hot")).toDF("k", "payload")
    val bucketSizes = hot
      .withColumn("__salt", (rand(seed = 0) * 8).cast("int"))
      .groupBy("__salt").count()
      .select("count").as[Long].collect().toSeq.sorted
    assert(bucketSizes.size == 8, s"expected 8 salt buckets: $bucketSizes")
    val median = bucketSizes(bucketSizes.size / 2)
    assert(bucketSizes.max <= 2 * median,
      s"hot-key buckets still skewed: $bucketSizes")
    // and the max task input really dropped vs the unsalted single task
    assert(bucketSizes.max * 2 < 900,
      s"salting didn't reduce the hot task: $bucketSizes")
  }

  test("hot key rows spread across multiple salt buckets") {
    val facts = (1 to 1000).map(_ => (1, "x")).toDF("k", "v")
    val spread = facts
      .withColumn("__salt",
        (org.apache.spark.sql.functions.rand(seed = 0) * 8).cast("int"))
      .groupBy("__salt").count().count()
    assert(spread >= 6) // 1000 draws over 8 buckets hit nearly all
  }
}
