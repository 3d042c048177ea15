package graft.ops

import graft.SparkTestBase

/** Behavioral proof of the dedup cascade on planted documents — the
  * oracle harness only proves Spark==DuckDB; this proves the detectors
  * actually find near-duplicates and don't invent them. Deterministic
  * corpus: a base document, a light perturbation (one word of sixty
  * changed), an exact copy, and an unrelated document. */
class NeardupCascadeSpec extends SparkTestBase {
  import spark.implicits._

  // 60 deterministic pseudo-words
  private val baseWords = (1 to 60).map(i => s"w${(i * 37) % 101}")
  private val docs = Seq(
    (1L, baseWords.mkString(" ")),                                  // base
    (2L, baseWords.updated(30, "CHANGED").mkString(" ")),           // near-dup
    (3L, baseWords.mkString(" ")),                                  // exact copy
    (4L, (1 to 60).map(i => s"z${(i * 53) % 97}").mkString(" ")))   // unrelated
    .toDF("doc_id", "text")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  private val dupPairs = Set((1L, 2L), (1L, 3L), (2L, 3L))

  test("exact Jaccard finds all planted pairs and nothing else") {
    val p = TextOps.jaccardNeardupPairs(docs)
    assert(pairs(p) == dupPairs)
    // the exact copy scores Jaccard 1.0
    val exact = p.where($"doc_a" === 1L && $"doc_b" === 3L)
      .select("jaccard_q6").as[Long].collect().head
    assert(exact == 1000000L)
  }

  test("MinHash banding recalls the planted pairs at high Jaccard") {
    assert(pairs(TextOps.minhashNeardupPairs(docs)) == dupPairs)
  }

  test("SimHash finds the planted pairs with small Hamming distance") {
    val p = TextOps.simhashNeardupPairs(docs)
    assert(pairs(p) == dupPairs)
    val h13 = p.where($"doc_a" === 1L && $"doc_b" === 3L)
      .select("hamming").as[Long].collect().head
    assert(h13 == 0L) // identical text → identical fingerprint
  }

  test("containment finds subset duplication that Jaccard misses") {
    // doc 6 = doc 5 verbatim plus 4× more unrelated text: containment of
    // 5 in 6 is ~1.0 while Jaccard is ~|A|/|B| ≈ 0.2 < 0.30 — the case
    // that motivates the containment family existing at all
    val small = (1 to 40).map(i => s"w${(i * 37) % 101}")
    val filler = (1 to 160).map(i => s"f${(i * 59) % 211}")
    val subsetDocs = Seq(
      (5L, small.mkString(" ")),
      (6L, (small ++ filler).mkString(" ")),
      (7L, (1 to 40).map(i => s"z${(i * 53) % 97}").mkString(" ")))
      .toDF("doc_id", "text")
    assert(pairs(TextOps.containmentNeardupPairs(subsetDocs)) == Set((5L, 6L)))
    assert(pairs(TextOps.jaccardNeardupPairs(subsetDocs)).isEmpty)
    // and on the standard planted corpus it agrees with the other
    // detectors (near-identical docs contain each other)
    assert(pairs(TextOps.containmentNeardupPairs(docs)) == dupPairs)
  }

  test("shingleSets: fewer than 3 tokens yields an empty set, 3 yields one") {
    val tiny = Seq((1L, "one two"), (2L, "one two three"), (3L, "a"))
      .toDF("doc_id", "text")
    val sets = TextOps.shingleSets(tiny)
      .select($"doc_id", org.apache.spark.sql.functions.size($"sset").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(sets == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("shingleHashSets is set-isomorphic to the string shingle sets") {
    // the r12 exact-family stage table hashes token triples directly
    // (xxhash64(w1,w2,w3) — by design NOT the same VALUES as
    // xxhash64 of the joined string); what the df counts and
    // intersections rest on is the SET STRUCTURE: same per-doc set
    // sizes, and same cross-doc intersection sizes, as the string sets
    val tiny = Seq((1L, "one two"), (2L, "one two three four"),
      (3L, "pad one two three pad one two three"), (4L, "a"),
      (5L, "one two three four five"))
      .toDF("doc_id", "text")
    val sSets = TextOps.shingleSets(tiny)
      .as[(Long, Seq[String])].collect().toMap.view.mapValues(_.toSet)
    val hSets = TextOps.shingleHashSets(tiny)
      .as[(Long, Seq[Long])].collect().toMap.view.mapValues(_.toSet)
    assert(hSets.keySet == sSets.keySet)
    for (k <- sSets.keys) assert(hSets(k).size == sSets(k).size)
    for (a <- sSets.keys; b <- sSets.keys if a < b)
      assert(hSets(a).intersect(hSets(b)).size ==
        sSets(a).intersect(sSets(b)).size, s"pair ($a,$b)")
  }

  test("incremental dedup-on-ingest: batch vs corpus and within-batch") {
    val other = (1 to 60).map(i => s"q${(i * 41) % 103}")
    val staged = Seq(
      (1L, "corpus", baseWords.mkString(" ")),                 // existing
      (2L, "corpus", other.mkString(" ")),                     // existing
      (10L, "batch", baseWords.updated(7, "NEW").mkString(" ")), // dups corpus 1
      (11L, "batch", (1 to 60).map(i => s"f${(i * 59) % 89}").mkString(" ")), // fresh
      (12L, "batch", (1 to 60).map(i => s"f${(i * 59) % 89}").mkString(" ")) // dup of 11 within batch
    ).toDF("doc_id", "source", "text")
    val r = TextOps.incrementalNeardupReport(staged, Seq("batch"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(10L, 11L, 12L)) // only the batch is reported
    assert(!r(10L).getAs[Boolean]("is_new"))
    assert(r(10L).getAs[Long]("dup_of") === 1L)
    assert(r(11L).getAs[Boolean]("is_new")) // first of the pair survives
    assert(!r(12L).getAs[Boolean]("is_new")) // second resolves to the first
    assert(r(12L).getAs[Long]("dup_of") === 11L)
  }
}
