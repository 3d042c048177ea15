package graft.ingest

import graft.SparkTestBase

/** Offline tests of the S5–S9 ingestion shapes: partition-parallel fetch
  * with retry/skip against a fake fetcher, and each scrape parser over
  * literal page bodies. */
class IngestSpec extends SparkTestBase {
  import spark.implicits._

  // ---- S5: fetch with retry / skip-and-continue ----

  private object FlakyFetcher extends Fetcher {
    def get(url: String): Either[String, String] = url match {
      case u if u.contains("ok")    => Right(s"""body-of-$u""")
      case u if u.contains("flaky") =>
        // fails on first attempt per JVM-wide counter keyed by url
        if (FlakyState.firstTime(u)) Left("timeout") else Right(s"recovered-$u")
      case u => Left(s"404 $u")
    }
  }

  test("fetchPartitioned retries flaky urls once and records hard failures as rows") {
    val keys = Seq(("a", "http://x/ok/1"), ("b", "http://x/flaky/2"),
      ("c", "http://x/dead/3")).toDF("key", "url")
    val out = Fetch.fetchPartitioned(keys, "key", "url", FlakyFetcher).collect()
      .map(f => f.key -> f).toMap
    assert(out("a").body == "body-of-http://x/ok/1" && out("a").attempts == 1)
    assert(out("b").body == "recovered-http://x/flaky/2" && out("b").attempts == 2)
    assert(out("c").body == null && out("c").error.startsWith("404") &&
      out("c").attempts == 2)
    assert(Fetch.ok(Fetch.fetchPartitioned(keys, "key", "url", FlakyFetcher))
      .count() == 2)
  }

  // ---- S5: weather JSON parse ----

  test("weatherRows traverses the nested forecast path") {
    val body =
      """{"forecast":{"forecastday":[{"date":"2026-01-09",""" +
        """"day":{"totalprecip_in":0.42,"avgtemp_f":51.3}}]}}"""
    val rows = Parsers.weatherRows(Seq(("30301", body)).toDF("key", "body"))
      .as[(String, java.sql.Date, Double)].collect().toSeq
    assert(rows == Seq(("30301", java.sql.Date.valueOf("2026-01-09"), 0.42)))
  }

  // ---- S6: zips page ----

  test("zipRows pairs zip/county lists and strips the County suffix") {
    val body =
      """<ul><li class="zip">30301</li><li class="county">Fulton County</li>
        |<li class="zip">30060</li><li class="county">Cobb County</li></ul>""".stripMargin
    val rows = Parsers.zipRows(Seq(("GA", body)).toDF("key", "body"))
    assert(rows.as[(String, String, String)].collect().toSet ==
      Set(("30301", "Fulton", "GA"), ("30060", "Cobb", "GA")))
    assert(Parsers.zipRowsShapeOk(rows))
  }

  test("zipRows surfaces a skewed page via the shape check instead of mis-pairing") {
    val skewed = """<li class="zip">30301</li><li class="zip">30060</li>""" +
      """<li class="county">Fulton County</li>"""
    val rows = Parsers.zipRows(Seq(("GA", skewed)).toDF("key", "body"))
    assert(!Parsers.zipRowsShapeOk(rows))
  }

  // ---- S7: teams page ----

  test("teamRows extracts team, url and regex-group team id") {
    val body =
      """<h2>SEC</h2><a href="/team/_/id/57/florida-gators">Florida</a>
        |<a href="/team/_/id/61/georgia-bulldogs"> Georgia </a>""".stripMargin
    val rows = Parsers.teamRows(Seq(("SEC", body)).toDF("key", "body"))
      .select("conference", "team", "team_id")
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(("SEC", "Florida", "57"), ("SEC", "Georgia", "61")))
  }

  // ---- S8: schedule page ----

  test("scheduleRows split-extracts gameIds from the team|year key fan-out") {
    val body =
      """<a href="/game/_/gameId/401520281">vs UGA</a>
        |<a href="/game/_/gameId/401520999">at LSU</a>
        |<a href="/game/_/gameId/401520281">dup</a>""".stripMargin
    val rows = Parsers.scheduleRows(
      Seq(("Florida|2025", body)).toDF("key", "body"))
      .as[(String, Int, String)].collect().toSet
    assert(rows == Set(("Florida", 2025, "401520281"),
      ("Florida", 2025, "401520999")))
  }

  // ---- S9 + F20: matchup stats parse, sentinel fill, pivot routing ----

  test("matchupRows emits home/away rows with unavail fill; pivotStats routes columns") {
    val body =
      """<table><tr>1st Downs|22|</tr><tr> Total Yards |451|388</tr></table>"""
    val long = Parsers.matchupRows(Seq(("G1", body)).toDF("key", "body"))
    assert(long.count() == 4)
    val wide = Parsers.pivotStats(long,
      Map("1st Downs" -> "first_downs", "Total Yards" -> "total_yards"))
    val rows = wide.select("game_id", "is_home", "first_downs", "total_yards")
      .as[(String, Boolean, String, String)].collect().toSet
    assert(rows == Set(("G1", true, "22", "451"),
      ("G1", false, "unavail", "388")))
  }
}

/** JVM-wide first-attempt tracker for the flaky fetcher (executors share
  * the JVM in local mode). */
object FlakyState {
  private val seen = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
  def firstTime(url: String): Boolean = seen.putIfAbsent(url, true) == null
}
