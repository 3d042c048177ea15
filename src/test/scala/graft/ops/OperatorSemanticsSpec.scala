package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Kit

/** Literal-frame semantics tests for the core operators — the cases the
  * oracle harness can't isolate: the J2 anti-join vs literal
  * `keep=False` divergence (SURVEY §4.1), null-aware filters, and the
  * scalar kit edge cases. */
class OperatorSemanticsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- boilerplate chunk scrub ----

  test("boilerplate scrub drops cross-doc chunks, keeps unique ones in order") {
    // 10-token boilerplate block shared by docs 1 and 2; unique tails
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler u1a u1b u1c"),
      (2L, s"$boiler u2a u2b"),
      (3L, "short unique doc")).toDF("doc_id", "text")
    val got = TextOps.boilerplateScrubDocs(docs)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // docs 1/2: the shared first chunk is dropped, unique tail survives
    assert(got(0) == ((1L, "u1a u1b u1c", 2L, 1L)))
    assert(got(1) == ((2L, "u2a u2b", 2L, 1L)))
    // doc 3 is a single sub-chunk-size unique doc — untouched
    assert(got(2) == ((3L, "short unique doc", 1L, 0L)))
  }

  test("boilerplate scrub preserves multi-chunk order and full scrub yields ''") {
    val c1 = (1 to 10).map(i => s"x$i").mkString(" ")
    val c2 = (1 to 10).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, s"$c1 $c2"), // both chunks shared → fully scrubbed
      (2L, s"$c1 $c2 tail words here"),
      (3L, s"alone $c1".replace("x", "z"))).toDF("doc_id", "text")
    val got = TextOps.boilerplateScrubDocs(docs)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got(0)._2 == "" && got(0)._4 == 2L)
    assert(got(1)._2 == "tail words here" && got(1)._4 == 2L)
    assert(got(2)._4 == 0L) // z-chunks unique → nothing dropped
  }

  // ---- J2: intended anti-join vs literal symmetric difference ----

  test("anti-join and keep=False symmetric difference diverge on db-only rows") {
    // scrape returns rows A,B; warehouse already has B,C.
    val scrape = Seq(("A", 1), ("B", 2)).toDF("game", "score")
    val db = Seq(("B", 2), ("C", 3)).toDF("game", "score")
    // intended "new rows only": just A
    val anti = scrape.join(db, Seq("game", "score"), "left_anti")
    assert(anti.as[(String, Int)].collect().toSet == Set(("A", 1)))
    // literal pandas concat + drop_duplicates(keep=False): A AND C —
    // re-appending C would duplicate it in the warehouse (the latent bug
    // the reference carries, documented not adopted)
    val symm = scrape.exceptAll(db).unionAll(db.exceptAll(scrape))
    assert(symm.as[(String, Int)].collect().toSet ==
      Set(("A", 1), ("C", 3)))
  }

  test("flagship null-aware filter keeps both under-counted and unmatched keys") {
    val games = Seq("g1", "g2", "g3").toDF("game_id")
    val stats = Seq(("g1", "t1"), ("g1", "t2"), ("g2", "t1"))
      .toDF("game_id", "team")
    val cnt = stats.groupBy($"game_id")
      .agg(countDistinct($"team").as("cntcheck"))
    val missing = games.join(cnt, Seq("game_id"), "left")
      .where($"cntcheck" < 2 || $"cntcheck".isNull)
    // g1 has both teams → excluded; g2 has one; g3 has none (NULL)
    assert(missing.select("game_id").as[String].collect().toSet ==
      Set("g2", "g3"))
  }

  // ---- scalar kit edges ----

  test("removeSuffix strips only a trailing match") {
    val df = Seq("Fulton County", "County Line", "Cobb").toDF("s")
      .select(Kit.removeSuffix($"s", " County").as("r"))
    assert(df.as[String].collect().toSeq ==
      Seq("Fulton", "County Line", "Cobb"))
  }

  test("base64 roundtrip and millis->date") {
    val df = Seq(("aGVsbG8=", 86400000L)).toDF("b", "m")
      .select(Kit.b64ToString($"b").as("s"), Kit.millisToDate($"m").as("d"))
    assert(df.as[(String, java.sql.Date)].collect().head ==
      (("hello", java.sql.Date.valueOf("1970-01-02"))))
  }

  test("inSeasonMonday matches the calendar gate") {
    val df = Seq("2026-01-05", "2026-01-06", "2026-06-01", "2025-11-03")
      .toDF("d").select(Kit.inSeasonMonday(to_date($"d")).as("g"))
    assert(df.as[Boolean].collect().toSeq ==
      Seq(true, false, false, true))
  }

  test("unavail fills only nulls") {
    val df = Seq(Some("7"), None).toDF("v")
      .select(Kit.unavail($"v").as("r"))
    assert(df.as[String].collect().toSeq == Seq("7", "unavail"))
  }

  test("quantize floors toward negative infinity (engine-portable)") {
    val df = Seq(1.2345678, -1.2345678).toDF("x")
      .select(Kit.quantize($"x", 6).as("q"))
    assert(df.as[Long].collect().toSeq == Seq(1234567L, -1234568L))
  }

  test("money decimal sum is exact where double sum drifts") {
    val df = (1 to 1000).map(_ => 0.1).toDF("v")
    val exact = df.agg(Kit.moneySum($"v")).as[Double].collect().head
    assert(exact == 100.0)
  }

  // ---- registered-query invariants ----

  test("every QueryDef name is unique and every oracle references fixture tables") {
    val names = SparkEntry_defs.map(_.name)
    assert(names.distinct.size == names.size)
    val tables = graft.sources.Tables.names
    SparkEntry_defs.flatMap(d => d.oracle.map(d.name -> _)).foreach {
      case (n, sql) =>
        assert(tables.exists(t => sql.contains(t)), s"$n oracle cites no fixture table")
    }
  }

  private def SparkEntry_defs = graft.SparkEntry.defs
}
