package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.SparkTestBase

/** Bloom probe expression: no false negatives, bounded false positives,
  * null handling, codegen placement, and the end-to-end prune-then-exact
  * join law (pruned result == unpruned result). */
class BloomMightContainSpec extends SparkTestBase {
  import spark.implicits._

  private def bloomOf(keys: Seq[Long]): Array[Byte] = {
    val bf = BloomFilter.create(math.max(keys.size.toLong, 1L), 0.01)
    keys.foreach(bf.putLong)
    BloomMightContain.serialize(bf)
  }

  test("every inserted key probes true (no false negatives)") {
    val keys = (1L to 500L).map(_ * 7)
    val bytes = bloomOf(keys)
    val hits = keys.toDF("k")
      .where(Kit.bloomMightContain(bytes, $"k"))
      .count()
    assert(hits === keys.size)
  }

  test("false-positive rate is near the configured fpp") {
    val keys = (1L to 1000L)
    val bytes = bloomOf(keys)
    // probe a disjoint key space 100× the inserted size
    val fp = (100001L to 200000L).toDF("k")
      .where(Kit.bloomMightContain(bytes, $"k"))
      .count()
    assert(fp < 5000, s"fp=$fp of 100000 probes at fpp=0.01")
  }

  test("null key yields null, filtered out by where()") {
    val bytes = bloomOf(Seq(1L, 2L))
    val got = Seq(Some(1L), None, Some(2L)).toDF("k")
      .where(Kit.bloomMightContain(bytes, $"k"))
      .as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("SQL name via extensions is registered") {
    GraftExtensions.register(spark)
    val bytes = bloomOf(Seq(42L))
    val v = spark.range(41, 44).toDF("id")
      .select(call_function(
        "bloom_might_contain", lit(bytes), $"id").as("m"))
      .as[Boolean].collect()
    assert(v(1) === true) // 42 inserted; neighbors may or may not collide
  }

  test("the probe runs inside whole-stage codegen") {
    val bytes = bloomOf((1L to 100L))
    val df = spark.range(1000).toDF("id")
      .where(Kit.bloomMightContain(bytes, $"id"))
    assert(df.count() >= 99) // 1..99 of range hit, plus any false positives
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("bloom_might_contain") && l.trim.startsWith("*(")), plan)
  }

  test("empty dimension builds an inserted-nothing filter, not a crash") {
    val dim = spark.range(10).toDF("d").where($"d" < 0)
    val bytes = BloomMightContain.build(dim, "d", 100L, 0.01)
    val hits = spark.range(1000).toDF("k")
      .where(Kit.bloomMightContain(bytes, $"k")).count()
    assert(hits === 0)
  }

  test("prune-then-exact-join equals the plain semi join") {
    val fact = spark.range(0, 20000).toDF("k")
    val dim = spark.range(0, 20000, 37).toDF("d")
    val plain = fact.join(dim, $"k" === $"d", "left_semi")
      .as[Long].collect().sorted.toSeq
    val bytes = bloomOf((0L until 20000L by 37).toSeq)
    val pruned = fact.where(Kit.bloomMightContain(bytes, $"k"))
      .join(dim, $"k" === $"d", "left_semi")
      .as[Long].collect().sorted.toSeq
    assert(pruned === plain)
  }
}
