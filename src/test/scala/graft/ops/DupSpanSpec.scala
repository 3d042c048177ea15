package graft.ops

import graft.SparkTestBase

/** Behavioral proof of [[TextOps.dupSpanCoverage]] on planted documents:
  * a shared 8-token span between two otherwise-unrelated documents, an
  * exact-copy pair (full coverage), a document too short to window (zero
  * pass-through), and a WITHIN-document repetition (the case document-
  * level dedup cannot represent at all). Expected rows are computed by
  * hand from the operator's contract — coverage is the union of the
  * duplicated windows, Σ min(w, nextₚ − p) with the last window w. */
class DupSpanSpec extends SparkTestBase {
  import spark.implicits._

  private val span = (1 to 8).map(i => s"shared$i")         // the planted 8-gram
  private val innerSpan = (1 to 8).map(i => s"inner$i")     // within-doc repeat
  private val docs = Seq(
    // doc 1: 30 tokens, the span at positions 10..17
    (1L, ((1 to 9).map(i => s"a$i") ++ span ++ (1 to 13).map(i => s"b$i"))
      .mkString(" ")),
    // doc 2: 18 tokens, the same span at positions 6..13
    (2L, ((1 to 5).map(i => s"c$i") ++ span ++ (1 to 5).map(i => s"d$i"))
      .mkString(" ")),
    // docs 3 + 4: exact 12-token copies — every window duplicated
    (3L, (1 to 12).map(i => s"e$i").mkString(" ")),
    (4L, (1 to 12).map(i => s"e$i").mkString(" ")),
    // doc 5: 5 tokens — shorter than the window, zero pass-through
    (5L, (1 to 5).map(i => s"f$i").mkString(" ")),
    // doc 6: 20 tokens, the SAME 8-token span at positions 1..8 and
    // 13..20 — within-document duplication, shared with no other doc
    (6L, (innerSpan ++ (1 to 4).map(i => s"g$i") ++ innerSpan)
      .mkString(" "))).toDF("doc_id", "text")

  test("coverage is the exact union of duplicated windows, including within-doc repeats") {
    val out = TextOps.dupSpanCoverageOf(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (1L, 30L, 1L, 8L, (8.0 / 30 * 1e6).toLong),   // 266666
      (2L, 18L, 1L, 8L, (8.0 / 18 * 1e6).toLong),   // 444444
      (3L, 12L, 5L, 12L, 1000000L),                 // overlapping windows union to the whole doc
      (4L, 12L, 5L, 12L, 1000000L),
      (5L, 5L, 0L, 0L, 0L),
      (6L, 20L, 2L, 16L, 800000L))                  // two disjoint repeats of the same span
    assert(out == expected)
  }

  test("a corpus with no repeated window reports zero coverage everywhere") {
    val unique = Seq(
      (1L, (1 to 20).map(i => s"p$i").mkString(" ")),
      (2L, (1 to 20).map(i => s"q$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.dupSpanCoverageOf(unique)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 20L, 0L, 0L, 0L), (2L, 20L, 0L, 0L, 0L)))
  }

  test("the disk-regime Bloom-pruned probe reproduces the default plan bit-for-bit") {
    // the Bloom branch engages with the DISK_ONLY stage decision (the
    // fifth-decade scratch fix, STRESS_r10.md §5) — force it through
    // the documented override and pin row parity against the default
    // two-sided join on the same planted corpus
    val expected = TextOps.dupSpanCoverageOf(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    spark.conf.set("spark.graft.pinnedLevel", "disk_only")
    try {
      val pruned = TextOps.dupSpanCoverageOf(docs)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(pruned == expected)
    } finally spark.conf.unset("spark.graft.pinnedLevel")
  }
}
