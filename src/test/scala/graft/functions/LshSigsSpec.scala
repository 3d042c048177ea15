package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Slot-for-slot parity of the r12 native one-pass LSH signature
  * kernels against the SQL formulations every oracle replays — the
  * native expressions exist purely as plan-shape optimizations
  * (no explode / no aggregate / no exchange), so their VALUES must be
  * bit-identical to the exploded-aggregate originals. */
class LshSigsSpec extends SparkTestBase {
  import spark.implicits._

  private val P = 2147483647L
  private val AB: Seq[(Long, Long)] = (1 to 16).map { i =>
    ((1103515245L * i + 12345L) % P, (69069L * i + 1013904223L) % P)
  }

  // deterministic shingle-ish string sets, including unicode and
  // single-element and larger sets
  private val sets = Seq(
    (1L, Seq("a b c", "b c d", "c d e")),
    (2L, Seq("x y z")),
    (3L, (1 to 200).map(i => s"w${(i * 37) % 101} v$i t${i % 7}")),
    (4L, Seq("šžę ūü ñ", "plain one two")))
    .toDF("doc_id", "sset")

  test("MinHashSig equals the MIN((a*h+b)%P) SQL formulation") {
    val sqlSlots = AB.zipWithIndex.map { case ((a, b), i) =>
      expr(s"MIN(($a * h + $b) % $P)").as(s"m$i")
    }
    val viaSql = sets
      .select($"doc_id", explode($"sset").as("s"))
      .select($"doc_id",
        expr(s"CAST(conv(substr(md5(s), 1, 12), 16, 10) AS BIGINT) % $P")
          .as("h"))
      .groupBy($"doc_id").agg(sqlSlots.head, sqlSlots.tail: _*)
      .select($"doc_id", array((0 until 16).map(i => col(s"m$i")): _*)
        .as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val native = sets
      .select($"doc_id", Kit.minhashSig($"sset", AB, P).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == viaSql)
  }

  test("SimHashFp equals the vote-sum/sign-fold SQL formulation") {
    val bits = 48
    val sumCols = (0 until bits).map(b =>
      sum(expr(s"CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END")).as(s"s$b"))
    val fpExpr = (0 until bits).map(b =>
      s"CASE WHEN s$b > 0 THEN CAST(1 AS BIGINT) << $b ELSE 0 END")
      .mkString(" + ")
    val viaSql = sets
      .select($"doc_id", explode($"sset").as("s"))
      .select($"doc_id",
        expr("CAST(conv(substr(md5(s), 1, 12), 16, 10) AS BIGINT)").as("h"))
      .groupBy($"doc_id").agg(sumCols.head, sumCols.tail: _*)
      .select($"doc_id", expr(fpExpr).as("fp"))
      .as[(Long, Long)].collect().toMap
    val native = sets
      .select($"doc_id", Kit.simhashFp($"sset", bits).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(native == viaSql)
  }

  test("FuzzyBandSig equals the chunked-md5 SQL formulation") {
    def slotSql(i: Int): String =
      s"MIN(CAST(conv(substr(md5(concat(g, '|${i / 4}')), " +
        s"${8 * (i % 4) + 1}, 8), 16, 10) AS BIGINT))"
    val slots = (0 until 16).map(i => expr(slotSql(i)).as(s"m$i"))
    val viaSql = sets
      .select($"doc_id", explode($"sset").as("g"))
      .groupBy($"doc_id").agg(slots.head, slots.tail: _*)
      .select($"doc_id", array((0 until 16).map(i => col(s"m$i")): _*)
        .as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val native = sets
      .select($"doc_id", Kit.fuzzyBandSig($"sset", 4, 4).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == viaSql)
  }

  test("empty set yields null (callers filter; absent-group parity)") {
    val withEmpty = Seq((1L, Seq("a")), (2L, Seq.empty[String]))
      .toDF("doc_id", "sset")
    val sig = withEmpty
      .select($"doc_id", Kit.minhashSig($"sset", AB, P).as("sig"),
        Kit.simhashFp($"sset", 48).as("fp"),
        Kit.fuzzyBandSig($"sset", 4, 4).as("fsig"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!sig(1L).isNullAt(1) && !sig(1L).isNullAt(2) && !sig(1L).isNullAt(3))
    assert(sig(2L).isNullAt(1) && sig(2L).isNullAt(2) && sig(2L).isNullAt(3))
  }
}
