package graft.ops

import graft.SparkTestBase

/** Planted-corpus contract of the structured-PII scrub — the fixture
  * documents carry no PII (the oracle there pins schema and zeroes), so
  * the operator's semantics live here: typed placeholders, per-type
  * counts, innermost-first ordering (an email's digits are never
  * double-reported as a digit run), and clean text passing through
  * untouched. */
class PiiScrubSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: (Long, String, String)*) =
    TextOps.piiScrubDocs(rows.toList.toDF("doc_id", "lang", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap // doc_id -> (scrubbed, n_email, n_ipv4, n_phone, n_digitrun)

  test("each PII type is replaced with its typed placeholder and counted") {
    val out = run(
      (1L, "en", "contact bob.smith+x@corp-mail.example.com for details"),
      (2L, "en", "server at 10.0.255.3 and backup 192.168.1.10"),
      (3L, "en", "call 555-867-5309 or 020 7946 0958 anytime"),
      (4L, "en", "account 123456789012 was closed"))
    assert(out(1L)._1 == "contact <EMAIL> for details")
    assert(out(1L)._2 == 1)
    assert(out(2L)._1 == "server at <IP> and backup <IP>")
    assert(out(2L)._3 == 2)
    assert(out(3L)._1 == "call <PHONE> or <PHONE> anytime")
    assert(out(3L)._4 == 2)
    assert(out(4L)._1 == "account <NUM> was closed")
    assert(out(4L)._5 == 1)
  }

  test("innermost-first: an email's digits never double-report as a digit run") {
    val out = run((1L, "en", "id 123456789@example.org sent"))
    // email wins the span; the 9-digit local part is NOT a digit run
    assert(out(1L)._1 == "id <EMAIL> sent")
    assert(out(1L)._2 == 1)
    assert(out(1L)._5 == 0, s"digit run double-counted: ${out(1L)}")
  }

  test("IP wins over phone/digit-run interpretations of its octets") {
    val out = run((1L, "en", "node 123.456.789.012 down"))
    assert(out(1L)._1 == "node <IP> down")
    assert(out(1L)._3 == 1)
    assert(out(1L)._4 == 0)
    assert(out(1L)._5 == 0)
  }

  test("NULL text yields zero counts, never size(NULL) = -1") {
    val out = TextOps.piiScrubDocs(
      Seq((1L, "en", null: String), (2L, "en", "a@b.co"))
        .toDF("doc_id", "lang", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out(1L) == ((0L, 0L, 0L, 0L)), s"null doc skewed counts: $out")
    assert(out(2L)._1 == 1L)
  }

  test("clean text passes through byte-identical with zero counts") {
    val text = "a perfectly ordinary sentence with numbers like 42 and 1999"
    val out = run((1L, "en", text))
    assert(out(1L) == ((text, 0L, 0L, 0L, 0L)))
  }
}
