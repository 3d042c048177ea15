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

  test("hot key rows spread across multiple salt buckets") {
    val facts = (1 to 1000).map(_ => (1, "x")).toDF("k", "v")
    val spread = facts
      .withColumn("__salt",
        (org.apache.spark.sql.functions.rand(seed = 0) * 8).cast("int"))
      .groupBy("__salt").count().count()
    assert(spread >= 6) // 1000 draws over 8 buckets hit nearly all
  }
}
