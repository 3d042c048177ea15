package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[BandJoin.selfCandidates]] must be a pure REDISTRIBUTION of the
  * naive band self-join: identical pair membership on any input, with
  * hot buckets enumerated across salt² join keys instead of one. */
class BandJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(bands: Seq[(Long, Long, String)]): Set[(Long, Long)] = {
    val byBucket = bands.groupBy(b => (b._2, b._3))
    byBucket.values.flatMap { ms =>
      val ids = ms.map(_._1)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
  }

  private def salted(bands: Seq[(Long, Long, String)], hotThreshold: Long,
                     salts: Int): Set[(Long, Long)] =
    BandJoin.selfCandidates(bands.toDF("id", "band", "k"), hotThreshold,
        salts, dedup = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("hot bucket: salted pairs equal the naive join's, exactly once each") {
    // one hot bucket (20 members > threshold 4), two cold ones, a
    // singleton, and a doc appearing in two buckets via two bands
    val bands =
      (1L to 20L).map(i => (i, 0L, "hot")) ++
        Seq((30L, 0L, "cold1"), (31L, 0L, "cold1"), (32L, 0L, "cold1"),
          (40L, 1L, "cold2"), (41L, 1L, "cold2"),
          (50L, 1L, "lonely"),
          // cross-band dup pair: same pair from band 0 AND band 1 must
          // still appear once (distinct contract)
          (30L, 1L, "x"), (31L, 1L, "x"))
    val expected = naive(bands)
    assert(salted(bands, hotThreshold = 4L, salts = 3) == expected)
    // degenerate salts=1 (hot path with no splitting) stays correct
    assert(salted(bands, hotThreshold = 4L, salts = 1) == expected)
    // threshold high enough that nothing is hot: pure cold path
    assert(salted(bands, hotThreshold = 1000L, salts = 3) == expected)
  }

  test("seeded random band table: salted == naive at several geometries") {
    val rnd = new scala.util.Random(20260813L)
    val bands = Seq.tabulate(400) { i =>
      (rnd.nextInt(60).toLong, rnd.nextInt(3).toLong, s"b${rnd.nextInt(12)}")
    }.distinct.map { case (id, band, k) => (id, band, k) }
    val expected = naive(bands)
    for (thr <- Seq(2L, 8L, 64L); s <- Seq(2, 5))
      assert(salted(bands, thr, s) == expected, s"thr=$thr salts=$s")
  }

  test("dedup=false on a single-band table equals the deduped result") {
    // one band per id: a pair can collide at most once, so skipping the
    // distinct must not change membership OR introduce duplicates
    val bands = (1L to 30L).map(i => (i, 0L, s"b${i % 4}"))
    val rows = BandJoin.selfCandidates(
      bands.toDF("id", "band", "k"), 8L, 3, dedup = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.size == rows.distinct.size, "dup pairs leaked")
    assert(rows.toSet == naive(bands))
  }

  test("hot-bucket enumeration spreads over salt-pair join keys") {
    // direct check of the salting arithmetic with the IMPLEMENTATION's
    // salt expression (xxhash64(id) mod S, not an unrelated hash): with
    // 20 hot members and 3 salts, no salt cell may hold more than
    // ~(m/S + slack) members, so no (sa, sb) join key sees more than
    // ~that² pairs — the bound the straggler-task claim rests on
    val ids = (1L to 20L).toSeq
    val salts = 3
    val cells = ids.toDF("id")
      .select(pmod(xxhash64($"id"), lit(salts)).as("salt"))
      .groupBy($"salt").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cells.keySet.subsetOf((0L until salts.toLong).toSet))
    assert(cells.values.max <= ids.size / salts + 3)
  }

  test("cold corpus: pre-probe skips the guard and caches nothing") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val bands = (1L to 30L).map(i => (i, 0L, s"b${i % 5}"))
    val (pairs, release) = BandJoin.selfCandidatesManaged(
      bands.toDF("id", "band", "k"), hotThreshold = 1024L, salts = 8,
      dedup = true)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive(bands))
    // no hot bucket existed, so the sized stage table was never built
    assert(sc.getPersistentRDDs.keySet == before, "cold path persisted a stage table")
    release() // must be a harmless no-op on the cold path
    assert(got == naive(bands))
  }

  test("hot corpus: managed release unpersists the sized stage table") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val bands = (1L to 20L).map(i => (i, 0L, "hot")) ++
      Seq((30L, 0L, "cold"), (31L, 0L, "cold"))
    val (pairs, release) = BandJoin.selfCandidatesManaged(
      bands.toDF("id", "band", "k"), hotThreshold = 4L, salts = 3,
      dedup = true)
    assert(sc.getPersistentRDDs.keySet != before, "hot path should cache the sized table")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive(bands))
    release()
    assert(sc.getPersistentRDDs.keySet == before, "release() must unpersist the stage table")
  }
}
